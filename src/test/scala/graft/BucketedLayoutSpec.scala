package graft

import org.apache.spark.sql.functions._

/**
 * Bucketed-table layout: the storage-side half of the 100 TB story.
 * Writing the edge table bucketed by `subject` means a subject-keyed join
 * or aggregation reads co-located data and needs NO Exchange — the
 * cluster-scale equivalent of the reference's in-memory adjacency index.
 */
class BucketedLayoutSpec extends SparkSpec {

  test("subject-bucketed edge table joins without a shuffle Exchange") {
    // warehouse dir is configured at session build (SparkSpec)
    val edges = graft.sources.TpchGraph(spark, "/root/testdata/sf0.001")
      .edges.select("edge_id", "subject", "object", "predicate")
    spark.sql("DROP TABLE IF EXISTS edges_bucketed")
    edges.write.bucketBy(8, "subject").sortBy("subject")
      .saveAsTable("edges_bucketed")

    // disable auto-broadcast so the planner must choose between a shuffle
    // and the bucketed layout (at real scale neither side broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("edges_bucketed")
      // per-subject aggregation over the bucketed layout: no shuffle
      val agg = t.groupBy("subject").agg(count(lit(1)).as("degree"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange hashpartitioning"),
        s"bucketed aggregation still shuffles:\n$aggPlan")

      // self-join on the bucket key: neither side re-shuffles
      val a = t.select(col("subject"), col("object").as("o1"))
      val b = t.select(col("subject"), col("object").as("o2"))
      val joined = a.join(b, Seq("subject"))
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange hashpartitioning"),
        s"bucketed self-join still shuffles:\n$joinPlan")
      assert(joinPlan.contains("Bucketed: true"), joinPlan)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS edges_bucketed")
    }
  }
}
