package graft

import graft.operators.{AttributeConstraint, AttributeConstraints}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Operator-matrix semantics vs the reference's `_meets_constraint`
 * (ref: /root/reference/app/app/plover.py:2471-2584). */
class AttributeConstraintsSpec extends SparkSpec {

  import spark.implicits._

  // One-row edge frames with controlled attribute maps.
  private def edge(attrs: Map[String, String] = Map.empty,
                   num: Map[String, Double] = Map.empty,
                   lists: Map[String, Seq[String]] = Map.empty,
                   source: String = "infores:src") = {
    Seq(1).toDF("x")
      .withColumn("attrs", typedLit(attrs))
      .withColumn("num_attrs", typedLit(num))
      .withColumn("list_attrs", typedLit(lists))
      .withColumn("primary_knowledge_source", lit(source))
  }

  private def survives(df: org.apache.spark.sql.DataFrame,
                       cs: AttributeConstraint*): Boolean =
    df.where(AttributeConstraints.compileAll(cs)).count() == 1

  test("scalar == on string attribute") {
    val e = edge(attrs = Map("seg" -> "AUTO"))
    assert(survives(e, AttributeConstraint("seg", "==", strValues = Seq("AUTO"))))
    assert(!survives(e, AttributeConstraint("seg", "==", strValues = Seq("TRUCK"))))
  }

  test("list-valued constraint ==: any match (scalar=false)") {
    val e = edge(attrs = Map("seg" -> "AUTO"))
    assert(survives(e, AttributeConstraint("seg", "==",
      strValues = Seq("TRUCK", "AUTO"), scalar = false)))
  }

  test("numeric inequalities, any-vs-any over value list") {
    val e = edge(num = Map("bal" -> 100.0))
    assert(survives(e, AttributeConstraint("bal", ">", numValues = Seq(50.0))))
    assert(!survives(e, AttributeConstraint("bal", ">", numValues = Seq(150.0))))
    assert(survives(e, AttributeConstraint("bal", ">",
      numValues = Seq(150.0, 50.0), scalar = false)))
    assert(survives(e, AttributeConstraint("bal", "<=", numValues = Seq(100.0))))
    assert(survives(e, AttributeConstraint("bal", ">=", numValues = Seq(100.0))))
    assert(!survives(e, AttributeConstraint("bal", "<", numValues = Seq(100.0))))
  }

  test("=== strict equality: scalar-vs-scalar only") {
    val e = edge(attrs = Map("seg" -> "AUTO"))
    assert(survives(e, AttributeConstraint("seg", "===", strValues = Seq("AUTO"))))
    assert(!survives(e, AttributeConstraint("seg", "===",
      strValues = Seq("AUTO", "TRUCK"), scalar = false)))
  }

  test("=== on list attribute requires exact list equality") {
    val e = edge(lists = Map("tags" -> Seq("a", "b")))
    assert(survives(e, AttributeConstraint("tags", "===",
      strValues = Seq("a", "b"), scalar = false)))
    assert(!survives(e, AttributeConstraint("tags", "===",
      strValues = Seq("b", "a"), scalar = false)))
    assert(!survives(e, AttributeConstraint("tags", "===", strValues = Seq("a"))))
  }

  test("list attribute ==: contains (scalar) / overlap (list)") {
    val e = edge(lists = Map("tags" -> Seq("x", "y")))
    assert(survives(e, AttributeConstraint("tags", "==", strValues = Seq("x"))))
    assert(survives(e, AttributeConstraint("tags", "==",
      strValues = Seq("z", "y"), scalar = false)))
    assert(!survives(e, AttributeConstraint("tags", "==", strValues = Seq("z"))))
  }

  test("list attribute inequality: any element vs any value") {
    val e = edge(lists = Map("v" -> Seq("3", "9")))
    assert(survives(e, AttributeConstraint("v", ">", strValues = Seq("8"))))
    assert(!survives(e, AttributeConstraint("v", ">", strValues = Seq("9"))))
  }

  test("not negates a PRESENT attribute; missing attribute never fulfills") {
    val e = edge(attrs = Map("seg" -> "AUTO"))
    assert(survives(e, AttributeConstraint("seg", "==", strValues = Seq("TRUCK"),
      negated = true)))
    assert(!survives(e, AttributeConstraint("seg", "==", strValues = Seq("AUTO"),
      negated = true)))
    // absent attribute: fails both plain and negated forms
    assert(!survives(e, AttributeConstraint("zzz", "==", strValues = Seq("x"))))
    assert(!survives(e, AttributeConstraint("zzz", "==", strValues = Seq("x"),
      negated = true)))
  }

  test("knowledge_source alias matches primary_knowledge_source") {
    val e = edge(source = "infores:crm")
    assert(survives(e, AttributeConstraint("knowledge_source", "==",
      strValues = Seq("infores:crm"))))
    assert(survives(e, AttributeConstraint("primary_knowledge_source", "==",
      strValues = Seq("infores:crm"))))
    assert(!survives(e, AttributeConstraint("knowledge_source", "==",
      strValues = Seq("infores:geo"))))
  }

  test("all constraints must hold (conjunction)") {
    val e = edge(attrs = Map("a" -> "1"), num = Map("b" -> 2.0))
    assert(survives(e,
      AttributeConstraint("a", "==", strValues = Seq("1")),
      AttributeConstraint("b", ">", numValues = Seq(1.0))))
    assert(!survives(e,
      AttributeConstraint("a", "==", strValues = Seq("1")),
      AttributeConstraint("b", ">", numValues = Seq(5.0))))
  }

  test("trial-phase enum strings compare as numbers against numeric constraints") {
    val e = edge(attrs = Map("phase" -> "clinical_trial_phase_3"))
    assert(survives(e, AttributeConstraint("phase", ">=", numValues = Seq(2.0))))
    assert(!survives(e, AttributeConstraint("phase", ">", numValues = Seq(3.0))))
    // unmapped string vs number = reference TypeError -> never matches
    val u = edge(attrs = Map("phase" -> "3.5"))
    assert(!survives(u, AttributeConstraint("phase", ">=", numValues = Seq(2.0))))
    // list attribute elements reverse-map too
    val l = edge(lists = Map("phases" -> Seq("not_provided", "clinical_trial_phase_4")))
    assert(survives(l, AttributeConstraint("phases", ">=", numValues = Seq(4.0))))
    assert(!survives(l, AttributeConstraint("phases", "==", numValues = Seq(2.0))))
  }

  test("zipped subattributes: remaining constraints must hold in the SAME element") {
    import AttributeConstraints.ZipSpec
    import org.apache.spark.sql.functions.{array, struct, lit => l}
    val zips = Seq(ZipSpec("tagged", "tags", Seq("tags", "tag_scores")))
    // element 1: (tier1, s0); element 2: (tier2, q1)
    val e = edge().withColumn("tagged", array(
      struct(l("tier1").as("tags"), l("s0").as("tag_scores")),
      struct(l("tier2").as("tags"), l("q1").as("tag_scores"))))
    def passes(cs: AttributeConstraint*) =
      e.where(AttributeConstraints.compileAll(cs, zips)).count() == 1
    // leader constraint alone: top-level via any element's leader value
    assert(passes(AttributeConstraint("tags", "==", strValues = Seq("tier1"))))
    // subattribute constraint alone: fulfilled in element 2
    assert(passes(AttributeConstraint("tag_scores", "==", strValues = Seq("q1"))))
    // leader (top-level, element 1) + subattribute (element 2): the leader
    // being top-level means it doesn't constrain WHICH element fulfills
    // the rest (reference: remaining = non-top constraints only)
    assert(passes(
      AttributeConstraint("tags", "==", strValues = Seq("tier1")),
      AttributeConstraint("tag_scores", "==", strValues = Seq("q1"))))
    // two subattribute constraints that only hold in DIFFERENT elements
    // must fail (same-attribute rule) — tag_scores s0 and q1 never co-occur
    assert(!passes(
      AttributeConstraint("tag_scores", "==", strValues = Seq("s0")),
      AttributeConstraint("tag_scores", "==", strValues = Seq("q1"))))
    // absent subattribute never fulfills a negated constraint
    val withNull = edge().withColumn("tagged", array(
      struct(l("tier1").as("tags"), l(null).cast("string").as("tag_scores"))))
    assert(withNull.where(AttributeConstraints.compileAll(Seq(
      AttributeConstraint("tag_scores", "==", strValues = Seq("q1"),
        negated = true)), zips)).count() == 0)
  }
}
