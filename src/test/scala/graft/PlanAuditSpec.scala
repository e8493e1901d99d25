package graft

import graft.model.{GraftOntology => O}
import graft.operators._
import graft.sources.TpchGraph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Physical-plan audits: the properties that decide 100 TB viability,
 * asserted so they can't silently regress.
 *  - lookups broadcast the small query-side set and never shuffle the
 *    edge table;
 *  - literal predicate filters reach the scan;
 *  - no cartesian products anywhere in the operator suite;
 *  - narrow projections prune the parquet read schema.
 */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val graph = TpchGraph(spark, sfDir)
  private val ont = O.ontology

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("one-hop: broadcast joins only, no shuffle of the edge table") {
    val res = OneHop.answer(spark, graph, ont, QueryGraph.oneHop(
      QNode("n0", ids = Seq("NAT:1", "NAT:2")),
      QNode("n1", categories = Seq(O.Customer)),
      QEdge("n0", "n1", predicates = Seq(O.LocatedIn))),
      closure = None, expandSubclasses = false)
    val p = plan(res.matches)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin"), s"edge table got shuffled:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("one-hop: predicate filter is a literal pushed to the scan") {
    val res = OneHop.answer(spark, graph, ont, QueryGraph.oneHop(
      QNode("n0", ids = Seq("NAT:1")),
      QNode("n1"),
      QEdge("n0", "n1", predicates = Seq(O.PartOf))),
      closure = None, expandSubclasses = false)
    // The predicate restriction must appear as a literal IN/equals filter
    // (expanded driver-side from the ontology), not as a join.
    val p = res.matches.queryExecution.optimizedPlan.toString
    assert(p.contains("graft:part_of"))
  }

  test("batch ops and meta summary avoid cartesian products") {
    val frames = Seq(
      GraphOps.getEdges(spark, graph, Seq(("NAT:0", "REG:0"))),
      GraphOps.getNeighbors(spark, graph, ont, Seq("NAT:0"), Seq(O.Customer),
        Seq(O.RelatedTo)),
      GraphOps.metaSummary(graph))
    frames.foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("meta summary uses denormalized categories (no node-table join)") {
    val p = plan(GraphOps.metaSummary(graph))
    // a single aggregate over generate/explode, reading the cached edge
    // table; no join ABOVE the cache scan (the denormalization join lives
    // in the cached build plan, rendered inside InMemoryRelation).
    val queryPart = p.split("InMemoryTableScan").head
    assert(!queryPart.contains("Join"),
      s"meta summary re-joined the node table:\n$queryPart")
    assert(queryPart.contains("explode"))
  }

  test("narrow projection prunes the parquet read schema") {
    val scan = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val scans = scan.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.head.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_partkey"))
  }

  test("dedup pair generation is join-based, never all-pairs") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e"), (2L, "b c d e f")).toDF("doc_id", "text")
    val p = plan(Dedup.jaccardPairs(docs, n = 2, threshold = 0.1))
    assert(!p.contains("CartesianProduct"), p)
    val p2 = plan(Dedup.minhashLshPairs(docs, k = 8, bands = 4, shingleN = 2,
      minAgree = 1))
    assert(!p2.contains("CartesianProduct"), p2)
  }

  test("one-hop output-category filter is a scan predicate, not a join (r2 g07 regression)") {
    val res = OneHop.answer(spark, graph, ont, QueryGraph.oneHop(
      QNode("n_out", categories = Seq(O.Customer, O.Nation)),
      QNode("n_in", ids = Seq("NAT:0", "NAT:1")),
      QEdge("n_out", "n_in", predicates = Seq(O.LocatedIn, O.AdjacentTo))),
      closure = None, expandSubclasses = false)
    val opt = res.matches.queryExecution.optimizedPlan.toString
    // denormalized endpoint categories: the filter is arrays_overlap on
    // the edge row itself — no semi-join against the node table
    assert(opt.contains("arrays_overlap"), opt)
    assert(!opt.contains("LeftSemi"), s"category filter became a join again:\n$opt")
    assert(!plan(res.matches).contains("SortMergeJoin"))
  }

  test("category-hierarchy expansion (g08 shape): broadcast-only, category filter at the scan") {
    // The r4 bench recorded g08 at ~4.9s p50 (vs 0.7s on an idle machine —
    // external load, not plan structure). This pins the structural
    // invariants so a REAL plan regression can't hide behind that noise:
    // subclass-expanded pinned input stays a broadcast, the edge table is
    // never shuffled, and the output-category filter stays a denormalized
    // arrays_overlap predicate rather than a node-table join.
    val closure = SubclassClosure.fromGraph(graph, ont)
    val res = OneHop.answer(spark, graph, ont, QueryGraph.oneHop(
      QNode("n_out", categories = Seq(O.Actor)),
      QNode("n_in", ids = Seq("NAT:3")),
      QEdge("n_out", "n_in", predicates = Seq(O.AffiliatedWith))),
      closure = Some(closure), expandSubclasses = true)
    val p = plan(res.matches)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"edge table got shuffled:\n$p")
    assert(!p.contains("CartesianProduct"))
    val opt = res.matches.queryExecution.optimizedPlan.toString
    assert(opt.contains("arrays_overlap"), opt)
    assert(!opt.contains("LeftSemi"), s"category filter became a join:\n$opt")
  }

  test("bucketed embedding dedup joins on the bucket key, never all-pairs") {
    import spark.implicits._
    val vecs = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * 4 + d).toFloat / 32f)))
      .toDF("vec_id", "embedding")
    val p = plan(Dedup.embeddingPairs(vecs, threshold = 0.1, bucketed = true,
      nPlanes = 4, dim = 4, nTables = 2))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("TRAPI envelope assembly is join-light: no cartesian, no edge-table shuffle join") {
    val res = OneHop.answer(spark, graph, ont, QueryGraph.oneHop(
      QNode("n_out"),
      QNode("n_in", ids = Seq("NAT:0", "NAT:1")),
      QEdge("n_out", "n_in", predicates = Seq(O.LocatedIn))),
      closure = None, expandSubclasses = false)
    val parts = TrapiResponse.assemble(res, graph, Map.empty, "infores:graft")
    val p = plan(parts)
    assert(!p.contains("CartesianProduct"), p)
  }
}
