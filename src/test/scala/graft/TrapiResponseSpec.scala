package graft

import graft.model.PropertyGraph
import graft.operators.{OneHop, TrapiAttributes, TrapiResponse}
import org.apache.spark.sql.functions._

/** TRAPI envelope assembly: qualifier rendering, sources, binding shape,
 * and the folded single-document envelope (valid JSON, reference shape). */
class TrapiResponseSpec extends SparkSpec {

  import spark.implicits._

  private val nodes = Seq(
    ("ORD:1", "Order#1", Seq("graft:Order")),
    ("PART:1", "part one", Seq("graft:Part", "graft:Tradeable"))
  ).toDF("id", "name", "categories")

  private val edges = Seq(
    ("E1", "ORD:1", "PART:1", "graft:contains_item",
      Option("graft:ships"), Option("graft:returned"), Option.empty[String],
      "infores:logistics"),
    ("E2", "ORD:1", "PART:1", "graft:contains_item",
      Option.empty[String], Option.empty[String], Option.empty[String],
      "infores:logistics")
  ).toDF("edge_id", "subject", "object", "predicate", "qualified_predicate",
      "object_direction", "object_aspect", "primary_knowledge_source")
    .withColumn("attrs", typedLit(Map("shipdate" -> "1994-01-01")))
    .withColumn("num_attrs", typedLit(Map.empty[String, Double]))
    .withColumn("list_attrs", typedLit(Map.empty[String, Seq[String]]))

  private val matches = edges
    .withColumn("input_id", col("subject"))
    .withColumn("output_id", col("object"))
    .withColumn("input_query_id", lit("ORD:0").cast("string"))
    .withColumn("output_query_id", lit(null).cast("string"))

  private val res = OneHop.Result(matches, "n_in", "n_out")
  private val graph = PropertyGraph(nodes, edges)

  test("edge JSON: qualifiers only when present, sources chain, default attribute shell") {
    val parts = TrapiResponse.edgeParts(matches, Map.empty, "infores:graft")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val e1 = parts("E1")
    assert(e1.contains(""""qualifiers":[{"qualifier_type_id":"biolink:qualified_predicate","qualifier_value":"graft:ships"},{"qualifier_type_id":"biolink:object_direction_qualifier","qualifier_value":"graft:returned"}]"""))
    assert(!e1.contains("object_aspect_qualifier")) // null aspect filtered
    assert(e1.contains(""""sources":[{"resource_id":"infores:logistics","resource_role":"primary_knowledge_source"},{"resource_id":"infores:graft","resource_role":"aggregator_knowledge_source","upstream_resource_ids":["infores:logistics"]}]"""))
    // un-mapped property falls back to attribute_type_id = property name
    assert(e1.contains(""""attributes":[{"attribute_type_id":"shipdate","value":"1994-01-01"}]"""))
    val e2 = parts("E2")
    assert(!e2.contains("qualifiers")) // fully unqualified edge: key omitted
  }

  test("per-predicate sources template overrides crafted sources, with default fallback") {
    import graft.operators.TrapiResponse.TrapiSource
    val tmpl = Map(
      "graft:contains_item" -> Seq(
        TrapiSource("infores:special", "primary_knowledge_source")),
      "default" -> Seq(
        TrapiSource("infores:fallback", "primary_knowledge_source",
          Some(Seq("infores:up")))))
    // E1 keeps contains_item (template hit); E2 gets an unmapped predicate
    // (default fallback)
    val withPred = matches.withColumn("predicate",
      when(col("edge_id") === "E1", lit("graft:contains_item"))
        .otherwise(lit("graft:other")))
    val parts = TrapiResponse.edgeParts(withPred, Map.empty, "infores:graft", tmpl)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(parts("E1").contains(
      """"sources":[{"resource_id":"infores:special","resource_role":"primary_knowledge_source"}]"""))
    assert(parts("E2").contains(
      """"sources":[{"resource_id":"infores:fallback","resource_role":"primary_knowledge_source","upstream_resource_ids":["infores:up"]}]"""))
  }

  test("result JSON: query_id on expanded bindings, is_set collapse") {
    val one = TrapiResponse.resultParts(res, "infores:graft")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one.keySet == Set("ORD:1--PART:1"))
    assert(one("ORD:1--PART:1").contains(
      """"n_in":[{"id":"ORD:1","attributes":[],"query_id":"ORD:0"}]"""))
    assert(one("ORD:1--PART:1").contains(
      """"n_out":[{"id":"PART:1","attributes":[]}]"""))
    assert(one("ORD:1--PART:1").contains(
      """"edge_bindings":{"e1":[{"id":"E1","attributes":[]},{"id":"E2","attributes":[]}]"""))
    val collapsed = TrapiResponse.resultParts(res, "infores:graft",
      inputIsSet = true, outputIsSet = true).collect()
    assert(collapsed.length == 1 && collapsed(0).getString(0) == "*--*")
  }

  test("slim: positional tuples with first category, query-id list, legacy edge shape") {
    val rows = TrapiResponse.slim(res, graph)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    // node tuple: name, FIRST stored category (not sorted, not all), query ids
    assert(rows(("slim_node:n_in", "ORD:1")) == """["Order#1","graft:Order",["ORD:0"]]""")
    // un-expanded node: empty query-id list; Part keeps its first category
    assert(rows(("slim_node:n_out", "PART:1")) == """["part one","graft:Part",[]]""")
    // edge tuple: 8 strings, absent qualifiers as "", literal trailing "False"
    assert(rows(("slim_edge:e1", "E1")) ==
      """["ORD:1","PART:1","graft:contains_item","infores:logistics","graft:ships","graft:returned","","False"]""")
    assert(rows(("slim_edge:e1", "E2")) ==
      """["ORD:1","PART:1","graft:contains_item","infores:logistics","","","","False"]""")
    // ids-only rows carry null json, one per distinct id
    assert(rows(("ids_node:n_in", "ORD:1")) == null)
    assert(rows(("ids_node:n_out", "PART:1")) == null)
    assert(rows(("ids_edge:e1", "E1")) == null && rows(("ids_edge:e1", "E2")) == null)
    assert(rows.size == 8)
  }

  test("envelope folds parts into one valid reference-shaped document") {
    val parts = TrapiResponse.assemble(res, graph, Map.empty, "infores:graft")
    // non-empty QG: Spark's JSON schema inference drops empty-object fields
    val doc = TrapiResponse.envelope(parts,
      """{"nodes":{"n_in":{"ids":["ORD:0"]},"n_out":{}},"edges":{"e1":{"subject":"n_in","object":"n_out"}}}""")
      .collect()(0).getString(0)
    val parsed = spark.read.json(Seq(doc).toDS)
    assert(!parsed.columns.contains("_corrupt_record"))
    val msg = parsed.select("message.*").columns.toSet
    assert(msg == Set("query_graph", "knowledge_graph", "results"))
    val kgEdges = parsed.select("message.knowledge_graph.edges.*").columns.toSet
    assert(kgEdges == Set("E1", "E2"))
    assert(parsed.select(size(col("message.results"))).collect()(0).getInt(0) == 1)
  }
}
