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
 *  - an edge must fulfill ALL constraints to survive.
 *
 * The reference walks Python dicts per edge; here each constraint becomes
 * one codegen'd boolean expression over the attrs/num_attrs/list_attrs
 * maps, so filtering is a narrow scan at any scale.
 */
object AttributeConstraints {

  val KnowledgeSourceRoles: Set[String] = Set(
    "primary_knowledge_source", "aggregator_knowledge_source",
    "supporting_data_source")

  /** Boolean Column: does an edge row fulfill all `constraints`? */
  def compileAll(constraints: Seq[AttributeConstraint]): Column =
    constraints.map(compile).reduceOption(_ && _).getOrElse(lit(true))

  def compile(c: AttributeConstraint): Column = {
    val candidates = scala.collection.mutable.ArrayBuffer.empty[Column]

    // String attribute (scalar)
    val sVal = element_at(col("attrs"), c.id)
    candidates += (sVal.isNotNull && applyNot(c, strCond(c, sVal)))
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

  /** List (array<string>) attribute vs scalar-or-list constraint value. */
  private def listCond(c: AttributeConstraint, v: Column): Column = {
    val vals = c.strValues
    if (vals.isEmpty) return lit(false)
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
