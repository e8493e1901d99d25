package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.{Ontology, PropertyGraph}

/**
 * Ingest transforms — the Spark-native analog of the reference's
 * build_indexes edge/node streaming pass
 * (ref: /root/reference/app/app/plover.py:725-1380).
 *
 * Everything is a single narrow projection over the raw frames: the
 * ontology is tiny, so ancestor/canonical lookups become literal map
 * expressions (`typedLit`) evaluated inside whole-stage codegen — no UDFs,
 * no shuffles, no driver loops. At 100 TB this pass stays embarrassingly
 * parallel.
 */
object GraphBuilder {

  /**
   * Keep only most-specific categories: drop any category that is a proper
   * non-mixin ancestor of another category on the same node
   * (ref: plover.py:835-880 — mixin ancestors are NOT dropped, because the
   * reference computes proper ancestors with include_mixins=False).
   */
  def pruneToMostSpecific(nodes: DataFrame, ont: Ontology): DataFrame = {
    val properAnc: Map[String, Seq[String]] =
      ont.terms.map(t => t -> (ont.ancestors(t, includeMixins = false) - t).toSeq.sorted).toMap
    val ancMap = typedLit(properAnc)
    nodes.withColumn(
      "categories",
      filter(col("categories"), c =>
        !exists(col("categories"), o =>
          o =!= c && coalesce(array_contains(element_at(ancMap, o), c), lit(false))))
    )
  }

  /**
   * Flip edges whose predicate is non-canonical: swap subject/object and
   * replace predicate (and qualified predicate) with the canonical form
   * (ref: plover.py:1060-1090).
   */
  def canonicalizeEdges(edges: DataFrame, ont: Ontology): DataFrame = {
    if (ont.canonicalOf.isEmpty) return edges
    val canonMap = typedLit(ont.canonicalOf)
    val canon = element_at(canonMap, col("predicate"))
    val flipped = canon.isNotNull
    val qpCanon = element_at(canonMap, col("qualified_predicate"))
    edges.withColumns(Map(
      "subject" -> when(flipped, col("object")).otherwise(col("subject")),
      "object" -> when(flipped, col("subject")).otherwise(col("object")),
      "predicate" -> when(flipped, canon).otherwise(col("predicate")),
      "qualified_predicate" ->
        when(flipped, coalesce(qpCanon, col("qualified_predicate")))
          .otherwise(col("qualified_predicate"))
    ))
  }

  /** Drop empty-string/null entries from the string-attribute map
   * (ref: plover.py:1047-1051 empty pruning). */
  def pruneEmptyAttrs(edges: DataFrame): DataFrame =
    edges.withColumn("attrs",
      map_filter(col("attrs"), (_, v) => v.isNotNull && v =!= lit("")))

  /** Full build: raw frames -> canonical PropertyGraph. */
  def build(rawNodes: DataFrame, rawEdges: DataFrame, ont: Ontology): PropertyGraph =
    PropertyGraph(
      nodes = pruneToMostSpecific(rawNodes, ont),
      edges = pruneEmptyAttrs(canonicalizeEdges(rawEdges, ont))
    )
}
