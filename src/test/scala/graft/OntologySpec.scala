package graft

import graft.model.{GraftOntology => O, Ontology}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Ontology closure semantics (ref: /root/reference/app/app/plover.py
 * biolink usage at :2629-2654, :2704-2743). */
class OntologySpec extends AnyFunSuite {

  /** Run a scalacheck property and fail the test on falsification. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val ont = O.ontology

  test("ancestors include self and are transitive") {
    assert(ont.ancestors(O.Customer).contains(O.Customer))
    assert(ont.ancestors(O.Customer).contains(O.Actor))
    assert(ont.ancestors(O.Customer).contains(O.Entity))
    assert(!ont.ancestors(O.Customer).contains(O.Place))
  }

  test("descendants mirror ancestors (duality)") {
    for (t <- ont.terms; d <- ont.descendants(t))
      assert(ont.ancestors(d).contains(t), s"$d in desc($t) but $t not in anc($d)")
  }

  test("mixin filtering keeps self even when self is a mixin") {
    assert(ont.ancestors(O.Tradeable, includeMixins = false).contains(O.Tradeable))
    assert(ont.descendants(O.ConnectedTo, includeMixins = false).contains(O.ConnectedTo))
    // located_in's mixin parent connected_to excluded without mixins
    assert(!ont.ancestors(O.LocatedIn, includeMixins = false).contains(O.ConnectedTo))
    assert(ont.ancestors(O.LocatedIn, includeMixins = true).contains(O.ConnectedTo))
  }

  test("replaceMixinsWithDirectMappings substitutes only mapped mixins") {
    assert(ont.replaceMixinsWithDirectMappings(Set(O.Tradeable, O.Nation)) ==
      Set(O.Part, O.Nation))
  }

  test("canonical mapping: identity for canonical, mapped for inverse") {
    assert(ont.canonical(O.LocatedIn) == O.LocatedIn)
    assert(ont.canonical(O.LocationOf) == O.LocatedIn)
    assert(ont.isCanonical(O.LocatedIn) && !ont.isCanonical(O.LocationOf))
  }

  // Bidirectionality decision table (ref: plover.py:2629-2654):
  test("considerBidirectional: direct symmetric predicate") {
    assert(ont.considerBidirectional(O.AdjacentTo, Set(O.AdjacentTo)))
  }
  test("considerBidirectional: direct non-symmetric predicate") {
    assert(!ont.considerBidirectional(O.LocatedIn, Set(O.LocatedIn)))
  }
  test("considerBidirectional: all direct preds symmetric => everything bidirectional") {
    assert(ont.considerBidirectional(O.LocatedIn, Set(O.AdjacentTo, O.RelatedTo)))
  }
  test("considerBidirectional: descendant of a symmetric ancestor not in QG") {
    // located_in under related_to (symmetric) — but related_to IS in QG
    assert(ont.considerBidirectional(O.LocatedIn, Set(O.RelatedTo)))
    // QG lists affiliated_with (not symmetric): located_in stays directed
    assert(!ont.considerBidirectional(O.LocatedIn, Set(O.AffiliatedWith)))
  }
  test("considerBidirectional: conglomerate strings use the predicate component") {
    assert(ont.considerBidirectional(s"${O.AdjacentTo}--x--y", Set(s"${O.AdjacentTo}--x--y")))
    assert(!ont.considerBidirectional(s"${O.LocatedIn}--x--y", Set(s"${O.LocatedIn}--x--y")))
  }

  // ---- property-based checks over random DAGs -------------------------
  private val termGen = Gen.choose(0, 19).map(i => s"t$i")
  private val dagGen: Gen[Ontology] =
    Gen.listOfN(30, for {
      c <- Gen.choose(1, 19)
      p <- Gen.choose(0, c - 1) // parent index < child index => acyclic
    } yield (s"t$c", s"t$p")).map { edges =>
      Ontology(parents = edges.groupBy(_._1).map { case (c, ps) =>
        c -> ps.map(_._2).toSet
      })
    }

  test("property: closure is transitive (anc of anc is anc)") {
    check(Prop.forAll(dagGen, termGen) { (ont, t) =>
      ont.ancestors(t).forall(a => ont.ancestors(a).subsetOf(ont.ancestors(t)))
    })
  }

  test("property: descendants/ancestors duality on random DAGs") {
    check(Prop.forAll(dagGen, termGen) { (ont, t) =>
      ont.descendants(t).forall(d => ont.ancestors(d).contains(t)) &&
        ont.ancestors(t).forall(a => ont.descendants(a).contains(t))
    })
  }
}
