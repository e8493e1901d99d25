package graft

import java.sql.Timestamp

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** P15 — Structured Streaming pipeline: watermarked dedup + windowed agg
 * over a MemoryStream, with batch-parity assertions against the batch
 * twins. */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private val rows = Seq(
    (1L, ts(0), 1L, "view", 1.0, "{}"),
    (2L, ts(10), 1L, "click", 2.0, "{}"),
    (2L, ts(10), 1L, "click", 2.0, "{}"), // duplicate event_id
    (3L, ts(70), 2L, "view", 3.0, "{}"),
    (4L, ts(80), 2L, "view", 4.0, "{}")
  )

  private def runStream(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                        outputMode: String, name: String,
                        data: Seq[(Long, Timestamp, Long, String, Double, String)] = rows)
      : org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    mem.addData(data: _*)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = f(src).writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("file-source streaming over the real events parquet matches the batch twin") {
    // The driver-generated events table has shipped ts as both
    // TIMESTAMP(NANOS) and TIMESTAMP_NTZ-micros across rounds; the
    // auto-detecting read path must produce the same windows as batch.
    val dir = "/root/testdata/sf0.001"
    // file streaming sources need a DIRECTORY; link the single file in
    val streamDir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.createSymbolicLink(
      streamDir.resolve("events.parquet"),
      java.nio.file.Path.of(s"$dir/events.parquet"))
    val stream = EventStream.windowedCounts(
      EventStream.read(spark, streamDir.toString))
    val q = stream.writeStream.format("memory").queryName("file_win")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()
    val s = spark.table("file_win")
      .select("window_start", "event_type", "n_events", "total_value")
      .orderBy("window_start", "event_type").collect().map(_.toSeq)

    val batchEvents = EventStream.readBatch(spark, s"$dir/events.parquet")
    val b = graft.operators.Sessionize.tumblingAgg(batchEvents, widthMinutes = 60)
      .select("window_start", "event_type", "n_events", "total_value")
      .orderBy("window_start", "event_type").collect().map(_.toSeq)
    assert(s.nonEmpty)
    assert(s.toSeq == b.toSeq)
  }

  test("streaming dedup drops duplicate event ids") {
    val out = runStream(EventStream.deduped(_), "append", "dedup_out")
    assert(out.count() == 4)
    assert(out.select("event_id").distinct().count() == 4)
  }

  test("streaming windowed counts match the batch twin after dedup") {
    val out = runStream(EventStream.windowedCounts(_, widthMinutes = 60), "complete",
      "window_out", data = rows.distinct)
    val batch = graft.operators.Sessionize.tumblingAgg(
      rows.distinct.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      widthMinutes = 60)
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("n_users"), col("total_value"))
    val s = out.orderBy("window_start", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("window_start", "event_type").collect().map(_.toSeq)
    // compare windows, types and exact counts; n_users is HLL-approximate
    // in the streaming twin so it is excluded from parity.
    assert(s.map(_.take(3)).toSeq == b.map(_.take(3)).toSeq)
  }

  test("streaming sessionize: in-batch gap closes a session matching the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    // user 1: events at 0,10 then 70,80 — the 60-min gap closes session 1
    // within the batch; session 2 stays open in state (NoTimeout mode).
    val data = Seq(
      (1L, ts(0), 1L, "view", 1.0, "{}"),
      (2L, ts(10), 1L, "click", 2.0, "{}"),
      (3L, ts(70), 1L, "view", 3.0, "{}"),
      (4L, ts(80), 1L, "view", 4.0, "{}"))
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    mem.addData(data: _*)
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = EventStream.sessionize(spark, src, gapMinutes = 30,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out").collect()
    assert(out.length == 1)
    val s = out(0)
    assert(s.getAs[Long]("user_id") == 1L)
    assert(s.getAs[Long]("session_idx") == 1L)
    assert(s.getAs[Long]("n_events") == 2L)
    assert(s.getAs[Double]("total_value") == 3.0)
    assert(s.getAs[Timestamp]("session_start") == ts(0))
    assert(s.getAs[Timestamp]("session_end") == ts(10))
    // identical to the batch twin's first session for user 1
    val b = graft.operators.Sessionize.sessions(
      data.toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      gapMinutes = 30).where(col("session_idx") === 1).collect()(0)
    assert(b.getAs[Long]("n_events") == 2L && b.getAs[Double]("total_value") == 3.0)
  }

  test("sessionizer runs identically under the RocksDB state store (production large-state config)") {
    // RocksDB is the memory-bounded store for BIG state (per-event-id
    // dedup at corpus scale). The corpus-state drains (p58/p75/p81)
    // run under it in the registry too; this case pins the
    // mapGroupsWithState path and proves via the query's state-operator
    // custom metrics that the provider actually took effect.
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val data = Seq(
        (1L, ts(0), 1L, "view", 1.0, "{}"),
        (2L, ts(10), 1L, "click", 2.0, "{}"),
        (3L, ts(70), 1L, "view", 3.0, "{}"))
      val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      mem.addData(data: _*)
      val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val q = EventStream.sessionize(spark, src, gapMinutes = 30,
          timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
        .writeStream.format("memory").queryName("sess_rocks").outputMode("append").start()
      q.processAllAvailable()
      // the provider is engaged, not merely configured: RocksDB's
      // state-operator custom metrics appear in the progress report
      val rocksMetrics = q.lastProgress.stateOperators.flatMap(
        _.customMetrics.keySet().toArray(Array.empty[String]))
      assert(rocksMetrics.exists(_.startsWith("rocksdb")),
        s"expected rocksdb* custom metrics, got: ${rocksMetrics.mkString(",")}")
      q.stop()
      val out = spark.table("sess_rocks").collect()
      assert(out.length == 1)
      assert(out(0).getAs[Long]("n_events") == 2L)
      assert(out(0).getAs[Double]("total_value") == 3.0)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("update-mode dedup drain: per-batch deltas fold to the batch state, multi-update proven") {
    import graft.operators.Corpus
    import org.apache.spark.sql.streaming.Trigger
    // Four files, drained one per micro-batch; the duplicate text spans
    // ALL of them, so its hash group is updated in every batch — update
    // mode must emit a delta each time, and the fold must recover the
    // final (min id, total count) state.
    val srcDir = java.nio.file.Files.createTempDirectory("graft-upd").toString
    // texts must clear the full stage chain: one prose line of >= 5
    // words ending in '.', 50+ words total, both stopwords present
    val dupText = "the shared paragraph " +
      (1 to 52).map(j => s"dup$j").mkString(" ") + " a fine end."
    for (part <- 0 until 4) {
      Seq.tabulate(10) { i =>
        val id = part * 10 + i
        val text = if (i == 0) dupText
          else s"the document doc$id " +
            (1 to 52).map(j => s"team$j").mkString(" ") + " a good end."
        (id.toLong, text)
      }.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$srcDir/part-$part")
    }
    // flatten: move each part's file into srcDir so FileStreamSource
    // sees 4 sibling files
    val root = java.nio.file.Paths.get(srcDir)
    for (part <- 0 until 4) {
      val sub = root.resolve(s"part-$part")
      val f = java.nio.file.Files.list(sub).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(f, root.resolve(s"file-$part.parquet"))
      java.nio.file.Files.walk(sub).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val schema = spark.read.parquet(s"$srcDir/file-0.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val out = Corpus.curationDedupAgg(
      Corpus.curationStages(stream, stopwords = Seq("the", "a")))
    val q = out.writeStream.format("memory").queryName("upd_spec")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val raw = spark.table("upd_spec").collect()
    // the dup group was re-emitted across batches: more update rows than
    // distinct groups — update mode did incremental work, not a re-dump
    val nGroups = raw.map(_.getAs[String]("content_hash")).distinct.length
    assert(raw.length > nGroups, s"no multi-update rows (${raw.length} rows, $nGroups groups)")
    // fold: last update per group (largest n_dups) == the batch pipeline
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("content_hash").orderBy(col("n_dups").desc)
    val folded = spark.table("upd_spec")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .collect().map(_.toString).sorted.toSeq
    val batch = Corpus.curationPipeline(
      spark.read.parquet(s"$srcDir/file-*.parquet"), stopwords = Seq("the", "a"))
      .select("id", "content_hash", "n_tokens", "n_dups", "final_text")
      .collect().map(_.toString).sorted.toSeq
    assert(folded == batch)
    // and the dup group's final count is the cross-batch total
    val dupRow = spark.table("upd_spec").orderBy(col("n_dups").desc).head()
    assert(dupRow.getAs[Long]("n_dups") == 4L)
  }

  test("streaming URL dedup: update-mode keep-best folds to the batch state across batches") {
    import graft.operators.UrlOps
    import org.apache.spark.sql.streaming.Trigger
    // Two files, one per micro-batch. Page 'site.com/x' is captured in
    // BOTH batches — the second capture is longer, so the streamed
    // keep-best state must be REVISED across batches (not just counted
    // up), and update mode must emit the group twice.
    val srcDir = java.nio.file.Files.createTempDirectory("graft-urlupd")
    Seq(
      (1L, 10L, "https://site.com/x?a=1"),
      (2L, 20L, "https://other.com/y")
    ).toDF("doc_id", "n_chars", "url")
      .coalesce(1).write.parquet(srcDir.resolve("b0").toString)
    Seq(
      (3L, 30L, "http://www.site.com:80/x/?a=1&utm_source=s"),
      (4L, 20L, "https://third.com/z")
    ).toDF("doc_id", "n_chars", "url")
      .coalesce(1).write.parquet(srcDir.resolve("b1").toString)
    for (part <- 0 until 2) {
      val sub = srcDir.resolve(s"b$part")
      val f = java.nio.file.Files.list(sub).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(f, srcDir.resolve(s"file-$part.parquet"))
      java.nio.file.Files.walk(sub).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val schema = spark.read.parquet(srcDir.resolve("file-0.parquet").toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
    val q = UrlOps.urlDedup(stream).writeStream.format("memory")
      .queryName("url_upd_spec").outputMode("update")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val raw = spark.table("url_upd_spec").collect()
    val nGroups = raw.map(_.getAs[String]("canonical_url")).distinct.length
    assert(raw.length > nGroups, s"no multi-update rows (${raw.length} rows, $nGroups groups)")
    // fold last update per group == the batch operator on the union
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("canonical_url").orderBy(col("n_dups").desc)
    val folded = spark.table("url_upd_spec")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .collect().map(_.toString).sorted.toSeq
    val batch = UrlOps.urlDedup(
      spark.read.parquet(srcDir.resolve("file-*.parquet").toString))
      .collect().map(_.toString).sorted.toSeq
    assert(folded == batch)
    // the cross-batch group revised its champion: doc 3's longer capture
    // displaced doc 1, and the count reflects both batches
    val site = folded.map(_.toString).find(_.contains("site.com/x")).get
    assert(site.contains("3") && site.contains("2"), site)
  }

  test("streaming URL dedup: checkpointed restart resumes state without reprocessing") {
    import graft.operators.UrlOps
    import org.apache.spark.sql.streaming.Trigger
    // The production restart contract: a checkpointed query that stops
    // and restarts must (a) NOT reprocess already-committed files and
    // (b) resume its keep-best state, so a batch-2 capture of a
    // batch-1 page updates the RESTORED group, not a fresh one.
    val root = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val srcDir = root.resolve("src"); java.nio.file.Files.createDirectory(srcDir)
    val ckpt = root.resolve("ckpt").toString
    def writeFile(n: String, rows: Seq[(Long, Long, String)]): Unit = {
      val tmp = root.resolve("tmp-" + n)
      rows.toDF("doc_id", "n_chars", "url").coalesce(1)
        .write.parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(f, srcDir.resolve(n))
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val schema = Seq((0L, 0L, "x")).toDF("doc_id", "n_chars", "url").schema
    // the memory sink refuses checkpoint recovery (not fault-tolerant);
    // foreachBatch is the recoverable sink shape — each run appends its
    // update batches to its OWN parquet dir, so run 2's emissions are
    // observable in isolation
    def drain(outName: String): Unit = {
      val outPath = root.resolve(outName).toString
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir.toString)
      val q = UrlOps.urlDedup(stream).writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(outPath)
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: one file, two pages
    writeFile("f0.parquet", Seq(
      (1L, 10L, "https://site.com/x"), (2L, 20L, "https://other.com/y")))
    drain("out1")
    assert(spark.read.parquet(root.resolve("out1").toString).count() == 2)
    // run 2, SAME checkpoint: a new file with a longer capture of page
    // x and one new page
    writeFile("f1.parquet", Seq(
      (3L, 30L, "https://www.site.com/x"), (4L, 5L, "https://third.com/z")))
    drain("out2")
    val run2 = spark.read.parquet(root.resolve("out2").toString)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // only the groups batch 2 touched are emitted (no f0 reprocessing:
    // other.com/y does NOT reappear), and site.com/x resumed its state —
    // count 2 spans both runs, champion revised to doc 3
    assert(run2 == Set(("site.com/x", 3L, 2L), ("third.com/z", 4L, 1L)), run2)
  }

  test("streaming sessionize: EventTimeTimeout closes a session as the watermark advances") {
    implicit val sqlCtx = spark.sqlContext
    // user 1's events have NO in-batch gap — the session can only close by
    // event-time timeout, once later batches advance the watermark past
    // last-event + gap (the production path for idle sessions).
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val src = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withWatermark("ts", "10 minutes")
    val q = EventStream.sessionize(spark, src, gapMinutes = 30,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout())
      .writeStream.format("memory").queryName("sess_ett").outputMode("append").start()
    mem.addData((1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(10), 1L, "click", 2.0, "{}"))
    q.processAllAvailable()
    assert(spark.table("sess_ett").isEmpty) // still open: no gap, watermark behind
    // batch 2 advances the watermark to ts(80) > ts(10) + 30min gap...
    mem.addData((3L, ts(90), 2L, "view", 3.0, "{}"))
    q.processAllAvailable()
    // ...and batch 3 evicts user 1's timed-out state, emitting the session.
    mem.addData((4L, ts(95), 2L, "view", 4.0, "{}"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_ett").where(col("user_id") === 1L).collect()
    assert(out.length == 1)
    val s = out(0)
    assert(s.getAs[Long]("session_idx") == 1L)
    assert(s.getAs[Long]("n_events") == 2L)
    assert(s.getAs[Double]("total_value") == 3.0)
    assert(s.getAs[Timestamp]("session_start") == ts(0))
    assert(s.getAs[Timestamp]("session_end") == ts(10))
    // parity: the batch twin computes the same session from user 1's events
    val b = graft.operators.Sessionize.sessions(
      Seq((1L, ts(0), 1L, "view", 1.0, "{}"), (2L, ts(10), 1L, "click", 2.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"),
      gapMinutes = 30).collect()(0)
    assert(b.getAs[Long]("n_events") == 2L && b.getAs[Double]("total_value") == 3.0)
    assert(b.getAs[Timestamp]("session_start") == ts(0))
    assert(b.getAs[Timestamp]("session_end") == ts(10))
  }
}
