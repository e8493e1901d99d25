package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * TRAPI attribute-constraint filtering compiled to native Column
 * expressions (ref: /root/reference/app/app/plover.py:2418-2584
 * `_filter_edges_by_attribute_constraints` / `_meets_constraint`).
 *
 * Semantics preserved:
 *  - operators `== < > <= >= ===` with list/scalar broadcast behavior
 *    (`==` on two lists = non-empty intersection; inequality ops are
 *    any-vs-any; `===` is strict equality);
 *  - `not` negates a *present* attribute's verdict — a missing attribute
 *    never fulfills a constraint, negated or not;
 *  - edge "sources" are matched as pseudo-attributes, and a constraint id
 *    of `knowledge_source` is fulfilled by any knowledge-source-role
 *    property (aliasing, plover.py:2474-2479);
 *  - trial-phase enum strings compare as their NUMBERS against numeric
 *    constraint values (`trial_phases_map_reversed`, plover.py:2487-2500 —
 *    an unmapped string vs a number is a TypeError → never matches);
 *  - zipped properties: a constraint not fulfilled by any top-level
 *    attribute may be fulfilled by SUBATTRIBUTES, but then all such
 *    remaining constraints must hold within the SAME zipped element
 *    (plover.py:2440-2454); the zipped leader value itself counts as a
 *    top-level attribute;
 *  - an edge must fulfill ALL constraints to survive.
 *
 * The reference walks Python dicts per edge; here each constraint becomes
 * one codegen'd boolean expression over the attrs/num_attrs/list_attrs
 * maps (plus `exists` over zipped struct arrays), so filtering is a
 * narrow scan at any scale.
 */
object AttributeConstraints {

  val KnowledgeSourceRoles: Set[String] = Set(
    "primary_knowledge_source", "aggregator_knowledge_source",
    "supporting_data_source")

  /** A zipped property (GraphBuilder.zipListAttrs output): array<struct>
   * column `zipped`, whose `leader` member renders as the top-level
   * attribute and whose other members become its subattributes
   * (ref: plover.py:2274-2297 zip rendering). */
  final case class ZipSpec(zipped: String, leader: String, members: Seq[String])

  /** enum string -> phase number (the reference's reversed map). */
  val TrialPhasesReversed: Map[String, Double] =
    graft.sources.GraphBuilder.TrialPhasesMap.map(_.swap)

  /** Boolean Column: does an edge row fulfill all `constraints`? */
  def compileAll(constraints: Seq[AttributeConstraint]): Column =
    constraints.map(compile).reduceOption(_ && _).getOrElse(lit(true))

  /**
   * Constraint fulfillment with zipped-subattribute semantics: every
   * constraint holds top-level, OR some single zipped element fulfills
   * all the constraints that don't (ref: plover.py:2418-2462).
   */
  def compileAll(constraints: Seq[AttributeConstraint],
                 zips: Seq[ZipSpec]): Column = {
    if (constraints.isEmpty) return lit(true)
    def top(c: AttributeConstraint): Column = {
      val leaderTops = zips.filter(_.leader == c.id).map { z =>
        coalesce(exists(col(z.zipped), e => meetsScalar(c, e.getField(c.id))),
          lit(false))
      }
      (compile(c) +: leaderTops).reduce(_ || _)
    }
    val allTop = constraints.map(c => coalesce(top(c), lit(false))).reduce(_ && _)
    val nested = zips.map { z =>
      val subMembers = z.members.filterNot(_ == z.leader).toSet
      coalesce(exists(col(z.zipped), e =>
        constraints.map { c =>
          val sub =
            if (subMembers(c.id)) meetsScalar(c, e.getField(c.id)) else lit(false)
          coalesce(top(c) || sub, lit(false))
        }.reduce(_ && _)), lit(false))
    }
    (allTop +: nested).reduce(_ || _)
  }

  /** Present scalar string value (an attribute or zipped member) meets
   * the constraint — with per-attribute `not` inversion and trial-phase
   * reverse mapping for numeric constraints. An ABSENT value never
   * fulfills, negated or not (the reference only builds attributes for
   * present values). */
  private def meetsScalar(c: AttributeConstraint, v: Column): Column =
    v.isNotNull && applyNot(c, scalarStrCond(c, v))

  /** String value vs constraint: direct string compare when the
   * constraint carries strings; via the reversed trial-phase map when it
   * carries numbers (unmapped string -> no match, like the TypeError). */
  private def scalarStrCond(c: AttributeConstraint, v: Column): Column =
    if (c.strValues.nonEmpty) strCond(c, v)
    else if (c.numValues.nonEmpty) {
      val r = element_at(typedLit(TrialPhasesReversed), v)
      r.isNotNull && numCond(c, r)
    } else lit(false)

  def compile(c: AttributeConstraint): Column = {
    val candidates = scala.collection.mutable.ArrayBuffer.empty[Column]

    // String attribute (scalar) — numeric constraints compare through the
    // reversed trial-phase map
    val sVal = element_at(col("attrs"), c.id)
    candidates += (sVal.isNotNull && applyNot(c, scalarStrCond(c, sVal)))
    // Numeric attribute (scalar)
    val nVal = element_at(col("num_attrs"), c.id)
    candidates += (nVal.isNotNull && applyNot(c, numCond(c, nVal)))
    // List attribute
    val lVal = element_at(col("list_attrs"), c.id)
    candidates += (lVal.isNotNull && applyNot(c, listCond(c, lVal)))
    // Sources as pseudo-attributes, with knowledge_source aliasing
    if (c.id == "knowledge_source" || KnowledgeSourceRoles.contains(c.id)) {
      val ks = col("primary_knowledge_source")
      if (c.id == "knowledge_source" || c.id == "primary_knowledge_source")
        candidates += (ks.isNotNull && applyNot(c, strCond(c, ks)))
    }
    candidates.map(cd => coalesce(cd, lit(false))).reduce(_ || _)
  }

  private def applyNot(c: AttributeConstraint, cond: Column): Column =
    if (c.negated) !coalesce(cond, lit(false)) else coalesce(cond, lit(false))

  /** Scalar string attribute vs (possibly list) constraint value. */
  private def strCond(c: AttributeConstraint, v: Column): Column = {
    val vals = c.strValues
    if (vals.isEmpty) return lit(false)
    c.op match {
      case "==" =>
        if (c.scalar) v === lit(vals.head) else v.isin(vals: _*)
      case "===" =>
        if (c.scalar) v === lit(vals.head) else lit(false) // scalar vs list never strictly equal
      case op => vals.map(x => ineq(op, v, lit(x))).reduce(_ || _)
    }
  }

  /** Scalar numeric attribute vs (possibly list) constraint value. */
  private def numCond(c: AttributeConstraint, v: Column): Column = {
    val vals = c.numValues
    if (vals.isEmpty) return lit(false)
    c.op match {
      case "==" =>
        if (c.scalar) v === lit(vals.head) else v.isin(vals: _*)
      case "===" =>
        if (c.scalar) v === lit(vals.head) else lit(false)
      case op => vals.map(x => ineq(op, v, lit(x))).reduce(_ || _)
    }
  }

  /** List (array<string>) attribute vs scalar-or-list constraint value.
   * Numeric constraints compare each element through the reversed
   * trial-phase map (plover.py:2487-2492 reverses list elements too). */
  private def listCond(c: AttributeConstraint, v: Column): Column = {
    val vals = c.strValues
    if (vals.isEmpty) {
      if (c.numValues.isEmpty) return lit(false)
      val rev = (e: Column) => element_at(typedLit(TrialPhasesReversed), e)
      return c.op match {
        case "==" =>
          if (c.scalar) exists(v, e => rev(e) === lit(c.numValues.head))
          else exists(v, e => rev(e).isin(c.numValues: _*))
        case "===" => lit(false) // list attribute never strictly equals numbers
        case op => c.numValues.map(x =>
          exists(v, e => rev(e).isNotNull && ineq(op, rev(e), lit(x)))).reduce(_ || _)
      }
    }
    c.op match {
      case "==" =>
        if (c.scalar) array_contains(v, vals.head)
        else arrays_overlap(v, lit(vals.toArray))
      case "===" =>
        if (c.scalar) lit(false) else v === lit(vals.toArray)
      case op =>
        // any attribute element <op> any constraint value
        vals.map(x => exists(v, e => ineq(op, e, lit(x)))).reduce(_ || _)
    }
  }

  private def ineq(op: String, a: Column, b: Column): Column = op match {
    case "<" => a < b
    case ">" => a > b
    case "<=" => a <= b
    case ">=" => a >= b
    case other => throw new IllegalArgumentException(s"Unsupported operator: $other")
  }
}
