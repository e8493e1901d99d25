package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main for the point-lookup fast path: warms the fixture,
  * then runs the named queries repeatedly, printing per-run wall time and
  * (with "explain") the executed plan's join/exchange/generate skeleton —
  * so a per-query-floor movement is attributable to a plan shape instead
  * of re-running the whole bench. Args: <sfDir> <keySubstr[,keySubstr..]>
  * [repeats] [explain]. */
object LookupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args(1).split(",").toSeq
    val repeats = if (args.length > 2) args(2).toInt else 5
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // serving-config experiments: SPARK_GRAFT_SHUFFLE / SPARK_GRAFT_AQE
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      // deployment sizing shared with Bench (see comment there)
      .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Fixture.ensureStore(spark, sfDir)
    val g = Fixture.graph(spark, sfDir)
    g.nodes.count(); g.edges.count()
    Fixture.closure(spark, sfDir); Fixture.metaSummary(spark, sfDir).count()
    Fixture.closureIndex(spark, sfDir)
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if keys.exists(name.contains)) {
      val times = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-26s " +
        times.map(t => f"$t%6.3f").mkString(" "))
      if (explain) {
        val df = fn(spark, sfDir)
        df.count() // let AQE finalize
        println(df.queryExecution.executedPlan.toString.linesIterator
          .map(_.takeWhile(_ != '[')).filter(l =>
            Seq("Join", "Exchange", "Generate", "Scan", "Sort", "Aggregate",
              "Filter", "Project", "AdaptiveSparkPlan", "Union")
              .exists(l.contains))
          .mkString(s"[probe] $name plan:\n", "\n", ""))
      }
    }
    spark.stop()
  }
}
