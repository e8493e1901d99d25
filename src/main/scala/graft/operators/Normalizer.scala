package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Identifier normalization + duplicate-edge merging — Spark-native twin of
 * the reference's `normalize` ingest path
 * (ref: /root/reference/app/app/plover.py:880-920 preferred-id map build,
 * :1092-1115 edge remap + merge).
 *
 * - `preferredIdMap`: node equivalent-identifier lists -> (equiv_id,
 *   preferred_id) pairs, used to canonicalize incoming edge endpoints.
 * - `normalize`: remap edge subject/object through the map (identity when
 *   unknown), rebuild the edge id as
 *   "subject--predicate--object--primary_knowledge_source", and merge
 *   edges that collapse onto the same id: scalar properties keep the
 *   first value (min-edge_id edge for determinism; the reference keeps
 *   the first seen), list properties are concatenated.
 *
 * Both steps are joins/aggregations on the edge table keyed by
 * high-cardinality ids — no skew, no driver loops.
 */
object Normalizer {

  /** (equiv_id, preferred_id) from a nodes frame with an `equiv_ids`
   * array column. */
  def preferredIdMap(nodes: DataFrame): DataFrame =
    nodes.select(explode(col("equiv_ids")).as("equiv_id"),
      col("id").as("preferred_id"))

  /**
   * Air-gapped twin of the SRI node-normalization lookup (ref:
   * plover.py:429 `_get_equiv_id_map_from_sri`): build the same
   * (equiv_id, preferred_id) map from a node-normalization DUMP file
   * instead of the live service — real deployments batch-download the
   * dump with the KG drop. Formats: "jsonl" (one
   * `{"id": ..., "equivalent_identifiers": [...]}` object per line) or
   * "tsv" (header `id<TAB>equivalent_identifiers`, equivalents
   * pipe-joined). Like the reference, every preferred id also maps to
   * itself; unlike the reference's last-response-wins dict overlay, an
   * equiv id claimed by several clusters resolves to the MIN preferred
   * id, so the map is deterministic under any read order. The output
   * feeds `normalize` directly (same shape as `preferredIdMap`), and at
   * scale it is a distributed read + one bounded groupBy — never a
   * driver-side dict.
   */
  def equivMapFromDump(spark: org.apache.spark.sql.SparkSession, path: String,
                       format: String): DataFrame = {
    val raw = format match {
      case "jsonl" =>
        spark.read.json(path)
          .select(col("id"), col("equivalent_identifiers").as("equivs"))
      case "tsv" =>
        spark.read.option("sep", "\t").option("header", "true").csv(path)
          .select(col("id"),
            split(col("equivalent_identifiers"), "\\|").as("equivs"))
      case other => throw new IllegalArgumentException(
        s"unsupported node-norm dump format: $other (expected jsonl or tsv)")
    }
    raw
      .select(col("id").as("preferred_id"),
        explode(array_union(array(col("id")),
          coalesce(col("equivs"), array()))).as("equiv_id"))
      .where(col("equiv_id").isNotNull && col("equiv_id") =!= "")
      .groupBy("equiv_id").agg(min(col("preferred_id")).as("preferred_id"))
  }

  def normalize(edges: DataFrame, prefMap: DataFrame): DataFrame = {
    val bySubj = prefMap.select(col("equiv_id").as("subject"),
      col("preferred_id").as("subj_pref"))
    val byObj = prefMap.select(col("equiv_id").as("object"),
      col("preferred_id").as("obj_pref"))
    val remapped = edges
      .join(bySubj, Seq("subject"), "left")
      .join(byObj, Seq("object"), "left")
      .withColumn("subject", coalesce(col("subj_pref"), col("subject")))
      .withColumn("object", coalesce(col("obj_pref"), col("object")))
      .drop("subj_pref", "obj_pref")
      .withColumn("orig_edge_id", col("edge_id"))
      .withColumn("edge_id", concat_ws("--",
        col("subject"), col("predicate"), col("object"),
        coalesce(col("primary_knowledge_source"), lit(""))))

    // Merge list attributes across collapsed edges: explode map entries,
    // concatenate per key (sorted for determinism), re-assemble the map.
    val mergedLists = remapped
      .select(col("edge_id"), explode(col("list_attrs")))
      .groupBy("edge_id", "key")
      .agg(array_sort(flatten(collect_list(col("value")))).as("value"))
      .groupBy("edge_id")
      .agg(map_from_entries(collect_list(struct(col("key"), col("value"))))
        .as("merged_list_attrs"))

    val mergedCore = remapped
      .groupBy("edge_id")
      .agg(
        min_by(struct(remapped.columns.map(col): _*), col("orig_edge_id")).as("e"),
        count(lit(1)).as("n_merged"))
      .select(col("e.subject").as("subject"), col("e.object").as("object"),
        col("e.predicate").as("predicate"),
        col("e.qualified_predicate").as("qualified_predicate"),
        col("e.object_direction").as("object_direction"),
        col("e.object_aspect").as("object_aspect"),
        col("e.primary_knowledge_source").as("primary_knowledge_source"),
        col("e.attrs").as("attrs"), col("e.num_attrs").as("num_attrs"),
        col("edge_id"), col("n_merged"))

    mergedCore.join(mergedLists, Seq("edge_id"), "left")
      .withColumn("list_attrs",
        coalesce(col("merged_list_attrs"), typedLit(Map.empty[String, Seq[String]])))
      .drop("merged_list_attrs")
  }
}
