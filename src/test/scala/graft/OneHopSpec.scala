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

  test("requires at least one pinned qnode") {
    val e = intercept[IllegalArgumentException] {
      OneHop.answer(spark, graph, ont,
        QueryGraph.oneHop(QNode("a"), QNode("b"), QEdge("a", "b")),
        closure = None, expandSubclasses = false)
    }
    assert(e.getMessage.contains("ids"))
  }
}
