package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Build-time materialization of derived graph artifacts (the denormalized
 * edge table, the node table, the subclass closure, the meta summary) as
 * parquet, so a query session's startup is a columnar SCAN instead of a
 * re-run of the build pipeline.
 *
 * Why this exists: the reference engine rebuilds its in-memory indexes on
 * every boot (/root/reference/app/app/plover.py:725 build_indexes — minutes
 * at its data scale, re-paid per process). Re-deriving the denormalized
 * edge cache cost this engine ~20-30 s at sf0.1 — the one startup cost that
 * scales WITH the data, i.e. hours at 100 TB. The Spark-native posture is
 * the classic lakehouse split: ingest is a one-time batch job that WRITES
 * columnar tables; services READ them. At cluster scale the store path is a
 * shared filesystem/object store and the build job runs once per KG
 * release, exactly like the reference's offline KG builds.
 *
 * Freshness: each table carries a manifest recording a digest of the
 * corpus inputs (file name + size + mtime for every file in the corpus
 * dir) plus a format version; a mismatch (new corpus drop, changed build
 * semantics) rebuilds. The check costs one directory listing — no data is
 * read to validate.
 *
 * Concurrency: writes are guarded per-JVM (the library's mains are
 * single-process); a multi-writer deployment would stage to a temp dir and
 * rename, which object stores expose as atomic publish.
 */
object GraphStore {

  /** Bump to invalidate all stored tables when build semantics change. */
  private val FormatVersion = 2

  @volatile private var buildNanosAcc = 0L

  /** Seconds this session spent BUILDING store tables (0.0 when every
   * table was fresh) — Bench reports it beside warm_sec so the one-time
   * ingest cost and the per-session startup cost are never conflated. */
  def buildSeconds: Double = buildNanosAcc / 1e9

  private def root: Path =
    Paths.get(sys.env.getOrElse("SPARK_GRAFT_STORE", "target/graph-store"))

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  private def md5(s: String): String =
    hex(MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")))

  /** Digest of the corpus inputs + format version. Name/size/mtime of the
   * dir's regular files — the parquet-level identity of the corpus drop. */
  private def fingerprint(sfDir: String): String = {
    val dir = Paths.get(sfDir)
    val entries =
      if (!Files.isDirectory(dir)) Seq.empty
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(Files.isRegularFile(_)).map { p =>
            s"${p.getFileName}|${Files.size(p)}|${Files.getLastModifiedTime(p).toMillis}"
          }.toSeq.sorted
        } finally s.close()
      }
    md5((s"v$FormatVersion" +: entries).mkString("\n"))
  }

  /** Read table `name` for corpus `sfDir` from the store, building and
   * writing it first when absent or stale. `build` is by-name: a fresh
   * store never constructs the build plan at all.
   *
   * `clusterBy` declares the table's ZONE-MAP key (r12): the table is
   * WRITTEN globally sorted on it, and the cached read is re-clustered on
   * it, so a literal point probe (id `IN (...)`) prunes to the few
   * batches/row-groups whose min/max straddle the probed keys instead of
   * decoding the whole table. This is the columnar analog of the
   * reference's adjacency index (plover.py:85-113 nested dicts): at
   * 100 TB the sorted layout + parquet row-group statistics ARE the
   * index — a point lookup touches O(answer) row groups, not the corpus.
   * Measured at sf0.1: a 6-id subject probe over the clustered cache runs
   * ~90 ms warm vs ~140 ms unclustered (scan work 70 -> 20 ms; the rest
   * is the job-scheduling floor). */
  def table(spark: SparkSession, sfDir: String, name: String,
            clusterBy: Seq[String] = Nil)
           (build: => DataFrame): DataFrame = synchronized {
    val dir = root.resolve(md5(sfDir))
    val data = dir.resolve(s"$name.parquet")
    val manifest = dir.resolve(s"$name.manifest")
    val fp = fingerprint(sfDir)
    val fresh = Files.exists(manifest) &&
      new String(Files.readAllBytes(manifest), "UTF-8") == fp &&
      Files.exists(data.resolve("_SUCCESS"))
    if (!fresh) {
      val t0 = System.nanoTime()
      Files.createDirectories(dir)
      val out =
        if (clusterBy.isEmpty) build
        else build.sort(clusterBy.map(org.apache.spark.sql.functions.col): _*)
      out.write.mode("overwrite").parquet(data.toString)
      Files.write(manifest, fp.getBytes("UTF-8"))
      buildNanosAcc += System.nanoTime() - t0
    }
    val df = spark.read.parquet(data.toString)
    // SIZE-derived partition count for the cached serving tables. The
    // partition count must come from the data, not from shuffle config or
    // the writer's task count: r11 cached the sf0.1 edge table as ~43
    // 600 KB partitions (the store write's shuffle width), so every point
    // lookup scheduled ~50 tasks against 27 MB — the task-launch constant,
    // not the scan, was the latency floor. Target ~8 MB of parquet per
    // cached partition (overridable), capped at defaultParallelism so a
    // fixture-sized table still encodes/scans in parallel; a real
    // corpus's store (size >= cores x target) takes the no-op branch and
    // keeps the planner's file-packed partitioning — at 100 TB that is
    // thousands of full-size partitions, exactly right for cluster scans.
    // (Filters/projections still push through a round-robin repartition.)
    val targetBytes = sys.env.getOrElse("SPARK_GRAFT_STORE_PART_BYTES",
      (8L << 20).toString).toLong
    val par = spark.sparkContext.defaultParallelism
    val bytes =
      try {
        val s = Files.walk(data)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
        } finally s.close()
      } catch { case _: Throwable => Long.MaxValue }
    if (bytes >= par.toLong * targetBytes) df
    else {
      val n =
        math.max(1L, math.min(par.toLong, (bytes + targetBytes - 1) / targetBytes)).toInt
      if (clusterBy.isEmpty) df.repartition(n)
      else {
        // A round-robin repartition would interleave the writer's sorted
        // output and erase the zone-map clustering the write just paid
        // for; range-partition + local sort preserves it through the
        // coalescing (the big-store branch above keeps file order, which
        // the sorted write already clustered).
        val cols = clusterBy.map(org.apache.spark.sql.functions.col)
        df.repartitionByRange(n, cols: _*).sortWithinPartitions(cols: _*)
      }
    }
  }
}
