package graft

import graft.model.{GraftOntology => O}
import graft.operators._
import graft.sources.TpchGraph

/** One-hop edge cases the SQL oracle can't isolate: the edge-count cutoff
 * guard (G22, ref plover.py:2011-2120) and input-side is_set binding. */
class OneHopSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val graph = TpchGraph(spark, sfDir)
  private val ont = O.ontology

  private def openQuery = QueryGraph.oneHop(
    QNode("n0", ids = Seq("NAT:7")),
    QNode("n1"),
    QEdge("n0", "n1"))

  test("maxEdges cutoff: throws above the limit, passes just under") {
    val n = OneHop.answer(spark, graph, ont, openQuery, closure = None,
      expandSubclasses = false).matches.select("edge_id").distinct().count()
    assert(n > 1)
    val e = intercept[IllegalStateException] {
      OneHop.answer(spark, graph, ont, openQuery, closure = None,
        expandSubclasses = false, maxEdges = Some(n - 1))
    }
    assert(e.getMessage.contains("cutoff"))
    // exactly at the limit: no error
    OneHop.answer(spark, graph, ont, openQuery, closure = None,
      expandSubclasses = false, maxEdges = Some(n))
  }

  test("result bindings: input-side is_set collapses the input group") {
    val res = OneHop.answer(spark, graph, ont, QueryGraph.oneHop(
      QNode("n_out"),
      QNode("n_in", ids = Seq("NAT:0", "NAT:1")),
      QEdge("n_out", "n_in", predicates = Seq(O.LocatedIn))),
      closure = None, expandSubclasses = false)

    val bothSet = GraphOps.resultBindings(res, inputIsSet = true, outputIsSet = true)
      .collect()
    assert(bothSet.length == 1) // single fully-collapsed result row

    val inSetOnly = GraphOps.resultBindings(res, inputIsSet = true, outputIsSet = false)
    // one result row per distinct output node
    val outs = res.matches.select("output_id").distinct().count()
    assert(inSetOnly.count() == outs)

    val neither = GraphOps.resultBindings(res, inputIsSet = false, outputIsSet = false)
    val pairsN = res.matches.select("input_id", "output_id").distinct().count()
    assert(neither.count() == pairsN)
  }

  test("literal fast path == broadcast-join path, row for row") {
    // The serving fast path (ids as literal set probes, fwd/bwd explode)
    // must reproduce the join path EXACTLY — including the two rows an
    // edge contributes when it matches both directions of a symmetric
    // predicate, and the subclass-expansion query_id mapping.
    val closure = SubclassClosure.fromGraph(graph, ont).cache()
    val ix = ClosureIndex.fromClosure(closure)
    assert(ix.isDefined)
    // Pick a real adjacency from the data so the doubly-pinned symmetric
    // shape (both endpoints in both id sets -> an edge matches BOTH
    // directions and must contribute two rows) is non-vacuous.
    val adj = graph.edges
      .where(org.apache.spark.sql.functions.col("predicate") === O.AdjacentTo)
      .select("subject", "object").head()
    val (a, b) = (adj.getString(0), adj.getString(1))
    val shapes = Seq(
      // subclass-expanded pinned object (g13 shape)
      QueryGraph.oneHop(QNode("n_out"), QNode("n_in", ids = Seq("REG:3")),
        QEdge("n_out", "n_in", predicates = Seq(O.LocatedIn))),
      // symmetric predicate, open output (g10 shape)
      QueryGraph.oneHop(QNode("n0", ids = Seq(a)), QNode("n1"),
        QEdge("n0", "n1", predicates = Seq(O.AdjacentTo))),
      // doubly-pinned symmetric: both endpoints in both id sets
      QueryGraph.oneHop(
        QNode("n0", ids = Seq(a, b, "NAT:99999")),
        QNode("n1", ids = Seq(a, b)),
        QEdge("n0", "n1", predicates = Seq(O.AdjacentTo))))
    for (qg <- shapes) {
      def rows(maxLit: Int) = OneHop.answer(spark, graph, ont, qg,
          closure = Some(closure), expandSubclasses = true, index = ix,
          maxLiteralIds = maxLit)
        .matches
        .select("edge_id", "input_id", "input_query_id", "output_id",
          "output_query_id")
        .collect().map(_.toString).sorted.toSeq
      val fast = rows(OneHop.DefaultMaxLiteralIds)
      val join = rows(0)
      assert(fast.nonEmpty, s"empty result for $qg")
      assert(fast == join, s"path divergence for $qg")
    }
  }

  test("serving session lifecycle: prepared plans survive reuse, closeServing retires") {
    val sfDir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("g03_onehop_fwd")
    val sv1 = Fixture.serving(spark)
    assert(Fixture.serving(spark) eq sv1) // stable across calls
    val df1 = q(spark, sfDir)
    assert(q(spark, sfDir) eq df1) // prepared-plan hit: same instance
    assert(df1.count() > 0)
    Fixture.closeServing(spark)
    val sv2 = Fixture.serving(spark)
    assert(!(sv2 eq sv1)) // a fresh serving session after retirement
    val df2 = q(spark, sfDir)
    assert(!(df2 eq df1)) // evicted: rebuilt against the new session
    assert(df2.count() == df1.count())
  }

  test("requires at least one pinned qnode") {
    val e = intercept[IllegalArgumentException] {
      OneHop.answer(spark, graph, ont,
        QueryGraph.oneHop(QNode("a"), QNode("b"), QEdge("a", "b")),
        closure = None, expandSubclasses = false)
    }
    assert(e.getMessage.contains("ids"))
  }

  test("rangeConjunct: superset of every member, bounded outside the window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val probe = Seq("PART:1", "PART:5", "PART:30", "PART:40")
    val universe = "CUST:3" +: "REG:1" +: (1 to 9999).map("PART:" + _)
    val kept = universe.toDF("id")
      .where(OneHop.rangeConjunct(col("id"), probe))
      .collect().map(_.getString(0)).toSet
    assert(probe.forall(kept), "a member id must never be pruned")
    // coarse by design (see the negative result in the scaladoc): the
    // window is [PART:1, PART:5] in byte order — other prefixes and
    // everything past PART:5 lexicographically stay out
    assert(!kept("CUST:3") && !kept("REG:1") && !kept("PART:6") &&
      !kept("PART:9999") && kept("PART:40") && kept("PART:2222"))
  }
}
