package graft.operators

import graft.model.Ontology

/**
 * TRAPI-style single-hop query graph model
 * (ref: /root/reference/app/app/plover.py:1790-1917 `answer_query`).
 * Node order matters for input-qnode tie-breaking, so nodes are a Seq.
 */
final case class QNode(
    key: String,
    ids: Seq[String] = Nil,
    categories: Seq[String] = Nil,
    isSet: Boolean = false)

/** One qualifier_constraint's qualifier_set, flattened
 * (ref: plover.py:2744-2777). */
final case class QualifierConstraint(
    qualifiedPredicate: Option[String] = None,
    objectDirection: Option[String] = None,
    objectAspect: Option[String] = None)

/** TRAPI attribute constraint (ref: plover.py:2471-2584).
 * `value` is a list of strings and/or `numValue` a list of doubles;
 * single-valued constraints are 1-element lists with `scalar=true`. */
final case class AttributeConstraint(
    id: String,
    op: String, // == < > <= >= ===
    strValues: Seq[String] = Nil,
    numValues: Seq[Double] = Nil,
    scalar: Boolean = true,
    negated: Boolean = false)

final case class QEdge(
    subjectKey: String,
    objectKey: String,
    predicates: Seq[String] = Nil,
    qualifierConstraints: Seq[QualifierConstraint] = Nil,
    attributeConstraints: Seq[AttributeConstraint] = Nil)

final case class QueryGraph(nodes: Seq[QNode], edge: Option[QEdge]) {
  def node(key: String): QNode = nodes.find(_.key == key).get
}

object QueryGraph {

  def oneHop(subject: QNode, obj: QNode, edge: QEdge): QueryGraph =
    QueryGraph(Seq(subject, obj), Some(edge))

  def singleNode(n: QNode): QueryGraph = QueryGraph(Seq(n), None)

  /**
   * Force the qedge to canonical predicate form
   * (ref: plover.py:2662-2695 `_force_qedge_to_canonical_predicates`):
   * if every user predicate (qualified predicates take precedence when
   * qualifier constraints carry them) is non-canonical, flip the qedge's
   * subject/object and canonicalize the predicates; a canonical/
   * non-canonical mix is an error.
   */
  def forceCanonical(qedge: QEdge, ont: Ontology): QEdge = {
    val qualPreds = qedge.qualifierConstraints.flatMap(_.qualifiedPredicate).toSet
    val regularPreds = qedge.predicates.toSet
    val userPreds = if (qualPreds.nonEmpty) qualPreds else regularPreds
    if (userPreds.isEmpty) return qedge
    val (nonCanon, canon) = userPreds.partition(p => !ont.isCanonical(p))
    if (nonCanon.nonEmpty && canon.nonEmpty)
      throw new IllegalArgumentException(
        s"QueryGraph uses both canonical ($canon) and non-canonical ($nonCanon) predicates")
    if (nonCanon.isEmpty) qedge
    else {
      val flipped = qedge.copy(subjectKey = qedge.objectKey, objectKey = qedge.subjectKey)
      if (qualPreds.nonEmpty)
        flipped.copy(qualifierConstraints = qedge.qualifierConstraints.map(qc =>
          qc.copy(qualifiedPredicate = qc.qualifiedPredicate.map(ont.canonical))))
      else
        flipped.copy(predicates = qedge.predicates.map(ont.canonical).distinct)
    }
  }
}
