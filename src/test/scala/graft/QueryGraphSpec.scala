package graft

import graft.model.{GraftOntology => O}
import graft.operators._
import org.scalatest.funsuite.AnyFunSuite

/** Canonical-predicate forcing (ref: /root/reference/app/app/plover.py:
 * 2662-2695 `_force_qedge_to_canonical_predicates`). */
class QueryGraphSpec extends AnyFunSuite {

  private val ont = O.ontology

  test("all-canonical qedge is unchanged") {
    val qe = QEdge("a", "b", predicates = Seq(O.LocatedIn, O.PartOf))
    assert(QueryGraph.forceCanonical(qe, ont) eq qe)
  }

  test("all-non-canonical qedge flips subject/object and canonicalizes") {
    val qe = QEdge("a", "b", predicates = Seq(O.LocationOf, O.HasPart))
    val f = QueryGraph.forceCanonical(qe, ont)
    assert(f.subjectKey == "b" && f.objectKey == "a")
    assert(f.predicates == Seq(O.LocatedIn, O.PartOf))
  }

  test("mixed canonical/non-canonical predicates is an error") {
    val qe = QEdge("a", "b", predicates = Seq(O.LocatedIn, O.HasPart))
    val e = intercept[IllegalArgumentException](QueryGraph.forceCanonical(qe, ont))
    assert(e.getMessage.contains("non-canonical"))
  }

  test("qualified predicates take precedence over regular predicates") {
    // regular predicate canonical but qualified predicate non-canonical =>
    // flip driven by the qualified predicate
    val qe = QEdge("a", "b", predicates = Seq(O.LocatedIn),
      qualifierConstraints = Seq(QualifierConstraint(qualifiedPredicate = Some(O.PlacedBy))))
    val f = QueryGraph.forceCanonical(qe, ont)
    assert(f.subjectKey == "b" && f.objectKey == "a")
    assert(f.qualifierConstraints.head.qualifiedPredicate.contains(O.Placed))
    // regular predicates preserved as-is on the qualified path
    assert(f.predicates == Seq(O.LocatedIn))
  }

  test("no predicates => unchanged") {
    val qe = QEdge("a", "b")
    assert(QueryGraph.forceCanonical(qe, ont) eq qe)
  }

  test("duplicate non-canonical predicates dedup after canonicalization") {
    val qe = QEdge("a", "b", predicates = Seq(O.LocationOf, O.LocationOf))
    assert(QueryGraph.forceCanonical(qe, ont).predicates == Seq(O.LocatedIn))
  }
}
