package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Config-driven TRAPI attribute rendering — the Spark-native twin of the
 * reference's attribute construction
 * (ref: /root/reference/app/app/plover.py:1424-1448
 * `load_trapi_attribute_map`, :2299-2321 `_get_trapi_edge_attribute`).
 *
 * A shell map assigns each property name an attribute_type_id (default:
 * the property name itself), optional value_type_id, optional
 * attribute_source template (`{kp_infores_curie}` -> the KP's curie;
 * `{primary_knowledge_source}` -> that edge column), and optional
 * value_url template (`{value}` substituted).
 *
 * The reference renders attributes per edge in Python at response time;
 * here rendering is one explode + literal-map lookups (codegen'd, no
 * shuffle), producing a flat (edge_id, attribute) frame that response
 * assembly can re-group or stream out directly.
 */
object TrapiAttributes {

  final case class AttributeShell(
      attributeTypeId: String,
      valueTypeId: Option[String] = None,
      attributeSource: Option[String] = None,
      valueUrl: Option[String] = None)

  /** Validate that no property is claimed by two shells (the reference
   * raises on duplicate property_names, plover.py:1435-1440). */
  def buildShellMap(entries: Seq[(Seq[String], AttributeShell)]): Map[String, AttributeShell] = {
    val flat = entries.flatMap { case (names, shell) => names.map(_ -> shell) }
    val dups = flat.groupBy(_._1).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate property_names in attribute map: ${dups.mkString(", ")}")
    flat.toMap
  }

  /**
   * Flatten every non-core attribute of every edge into one row:
   * (edge_id, name, attribute_type_id, value, value_type_id,
   * attribute_source, value_url). Numeric values render via double
   * cast; list values join on ",".
   */
  def render(edges: DataFrame, shells: Map[String, AttributeShell],
             kpInforesCurie: String): DataFrame = {
    val typeMap = typedLit(shells.map { case (k, s) => k -> s.attributeTypeId })
    val vtMap = typedLit(shells.collect { case (k, s) if s.valueTypeId.nonEmpty =>
      k -> s.valueTypeId.get })
    val srcMap = typedLit(shells.collect { case (k, s) if s.attributeSource.nonEmpty =>
      k -> s.attributeSource.get })
    val urlMap = typedLit(shells.collect { case (k, s) if s.valueUrl.nonEmpty =>
      k -> s.valueUrl.get })

    def rendered(kv: DataFrame): DataFrame = {
      val key = col("name")
      val srcTemplate = element_at(srcMap, key)
      kv.select(
        col("edge_id"), key,
        coalesce(element_at(typeMap, key), key).as("attribute_type_id"),
        col("value"),
        element_at(vtMap, key).as("value_type_id"),
        when(srcTemplate === "{kp_infores_curie}", lit(kpInforesCurie))
          .when(srcTemplate === "{primary_knowledge_source}",
            col("primary_knowledge_source"))
          .otherwise(srcTemplate).as("attribute_source"),
        when(element_at(urlMap, key).isNotNull,
          replace(element_at(urlMap, key), lit("{value}"), col("value")))
          .as("value_url"))
    }

    val base = edges.select(col("edge_id"), col("primary_knowledge_source"),
      col("attrs"), col("num_attrs"), col("list_attrs"))
    val strKv = base.select(col("edge_id"), col("primary_knowledge_source"),
      explode(col("attrs")).as(Seq("name", "value")))
    val numKv = base.select(col("edge_id"), col("primary_knowledge_source"),
      explode(col("num_attrs")).as(Seq("name", "raw")))
      .withColumn("value", col("raw").cast("string")).drop("raw")
    val listKv = base.select(col("edge_id"), col("primary_knowledge_source"),
      explode(col("list_attrs")).as(Seq("name", "raw")))
      .withColumn("value", concat_ws(",", col("raw"))).drop("raw")

    rendered(strKv).unionByName(rendered(numKv)).unionByName(rendered(listKv))
  }
}
