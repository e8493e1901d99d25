package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.model.{Ontology, PropertyGraph}

/**
 * Transitive concept-subclass closure — Spark-native replacement for the
 * reference's recursive in-memory subclass index
 * (ref: /root/reference/app/app/plover.py:1620-1720 `_build_subclass_index`,
 * :552-630 `_get_descendants`).
 *
 * Semantics preserved:
 *  - built from graph edges whose (canonical) predicate is subclass_of
 *    (superclass_of edges arrive here already flipped by GraphBuilder);
 *  - bounded depth (default 20) — deeper lineages are truncated;
 *  - "hub" ancestors with more than `hubCutoff` descendants are dropped
 *    entirely, as are ancestors whose id starts with a configured prefix
 *    (the reference drops "biolink:"-prefixed ids);
 *  - output is PROPER (ancestor, descendant) pairs, ancestor != descendant.
 *
 * Implementation is iterative BFS frontier-joining with fixpoint early-exit:
 * each round shuffles only the (small) frontier against the direct-pairs
 * table, and already-known pairs are anti-joined away, so cyclic inputs
 * terminate. The closure table is node-pairs only — orders of magnitude
 * smaller than the edge table at scale.
 */
object SubclassClosure {

  val SubclassPredicate = "graft:subclass_of"
  val SuperclassPredicate = "graft:superclass_of"

  /**
   * Direct subclass pairs from an EXTERNAL subclass-edge file — the
   * reference's separate-file path (ref: plover.py:1521-1619
   * `_get_subclass_edges`): keep only edges whose BOTH endpoints are
   * known identifiers (node ids or their equivalent ids), remap both to
   * the preferred ids, optionally filter by a primary-knowledge-source
   * allowlist (`kg_config["subclass_sources"]`), flip superclass_of to
   * the canonical direction, and deduplicate triples. The known-id map
   * is node-table-bounded, so both joins broadcast; the file is scanned
   * once. Feed the result to `compute`.
   */
  def directFromFile(spark: org.apache.spark.sql.SparkSession, path: String,
                     format: String, nodes: DataFrame,
                     allowedSources: Set[String] = Set.empty,
                     cfg: graft.sources.KgxSource.KgxConfig =
                       graft.sources.KgxSource.KgxConfig()): DataFrame = {
    val known = Normalizer.preferredIdMap(nodes)
      .unionByName(nodes.select(col("id").as("equiv_id"), col("id").as("preferred_id")))
    val edges = graft.sources.KgxSource.readEdges(spark, path, format, cfg)
      .where(col("predicate").isin(SubclassPredicate, SuperclassPredicate))
    val sourced =
      if (allowedSources.isEmpty) edges
      else edges.where(
        col("primary_knowledge_source").isin(allowedSources.toSeq: _*))
    sourced
      .join(broadcast(known.select(col("equiv_id").as("subject"),
        col("preferred_id").as("subj_pref"))), Seq("subject"))
      .join(broadcast(known.select(col("equiv_id").as("object"),
        col("preferred_id").as("obj_pref"))), Seq("object"))
      .select(
        when(col("predicate") === SuperclassPredicate, col("subj_pref"))
          .otherwise(col("obj_pref")).as("ancestor"),
        when(col("predicate") === SuperclassPredicate, col("obj_pref"))
          .otherwise(col("subj_pref")).as("descendant"))
      .where(col("ancestor") =!= col("descendant"))
      .distinct()
  }

  /** Eagerly local-checkpoint a frame and rebuild it from the checkpointed
   * RDD: materializes the round AND hands back a constraint-free leaf plan
   * (checkpointed LogicalRDDs can carry constraints referencing
   * pre-checkpoint attribute ids, which breaks Union's constraint
   * rewriting when rounds are chained). */
  private def materialize(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  def fromGraph(graph: PropertyGraph, ont: Ontology,
                maxDepth: Int = 20, hubCutoff: Int = 5000,
                dropAncestorPrefixes: Seq[String] = Nil): DataFrame = {
    val direct = graph.edges
      .where(col("predicate") === SubclassPredicate)
      .select(col("object").as("ancestor"), col("subject").as("descendant"))
      .where(col("ancestor") =!= col("descendant"))
      .distinct()
    compute(direct, maxDepth, hubCutoff, dropAncestorPrefixes)
  }

  /** `direct`: (ancestor, descendant) direct pairs. Returns proper closure.
   *
   * Each round LOCAL-CHECKPOINTS the new frontier and the merged closure:
   * the checkpoint both materializes the round (what the old persist+count
   * did) and truncates lineage, so round N's anti-join plans against a
   * materialized table instead of a 2N-deep DAG of joins. On a
   * fault-tolerant cluster job, swap localCheckpoint for reliable
   * `checkpoint` with a checkpoint dir — localCheckpoint trades
   * executor-loss recovery for speed. */
  def compute(direct: DataFrame, maxDepth: Int = 20, hubCutoff: Int = 5000,
              dropAncestorPrefixes: Seq[String] = Nil): DataFrame = {
    val d = direct.persist(StorageLevel.MEMORY_AND_DISK)
    var closure = d
    var frontier = d
    var depth = 1
    var done = false
    while (!done && depth < maxDepth) {
      val next = materialize(
        frontier.alias("f")
          .join(d.alias("d"), col("f.descendant") === col("d.ancestor"))
          .select(col("f.ancestor").as("ancestor"), col("d.descendant").as("descendant"))
          .where(col("ancestor") =!= col("descendant"))
          .distinct()
          .join(closure, Seq("ancestor", "descendant"), "left_anti"))
      if (next.isEmpty) { done = true }
      else {
        closure = materialize(closure.unionAll(next))
        frontier = next
        depth += 1
      }
    }

    var result = closure
    if (hubCutoff > 0) {
      val hubs = closure.groupBy("ancestor").count()
        .where(col("count") > hubCutoff).select("ancestor")
      result = result.join(broadcast(hubs), Seq("ancestor"), "left_anti")
    }
    for (p <- dropAncestorPrefixes)
      result = result.where(!col("ancestor").startsWith(p))
    result
  }
}
