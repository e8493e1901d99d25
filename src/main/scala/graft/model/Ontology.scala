package graft.model

/**
 * A small in-driver ontology (category + predicate DAGs) with the semantic
 * features the reference engine derives from the Biolink model:
 *
 *  - ancestor/descendant closure, with or without mixins
 *    (ref: /root/reference/app/app/plover.py:2704-2743, biolink_helper usage)
 *  - mixin -> direct proper-term mappings
 *    (ref: plover.py `replace_mixins_with_direct_mappings` call sites)
 *  - symmetric predicates (bidirectional matching, plover.py:2629-2654)
 *  - canonical predicate form + inverse mapping (plover.py:1060-1090)
 *
 * Ontologies are tiny (Biolink has O(10^3) terms) so the closure lives on
 * the driver and query expansion emits literal predicate/category lists
 * that Catalyst pushes into parquet scans. Nothing here touches a
 * DataFrame: the distributed side only ever sees expanded literal sets.
 *
 * @param parents            term -> direct parents (proper DAG edges; mixin
 *                           parentage included, flagged via `mixins`)
 * @param mixins             terms that are mixins
 * @param mixinDirectMap     mixin -> proper terms that directly realize it
 * @param symmetric          symmetric predicates
 * @param canonicalOf        non-canonical predicate -> its canonical form
 * @param inverseOf          canonical predicate -> non-canonical inverse
 */
final case class Ontology(
    parents: Map[String, Set[String]],
    mixins: Set[String] = Set.empty,
    mixinDirectMap: Map[String, Set[String]] = Map.empty,
    symmetric: Set[String] = Set.empty,
    canonicalOf: Map[String, String] = Map.empty,
    inverseOf: Map[String, String] = Map.empty,
    rootCategory: String = "graft:Entity",
    rootPredicate: String = "graft:related_to"
) {

  /** All terms mentioned anywhere in the DAG. */
  lazy val terms: Set[String] =
    parents.keySet ++ parents.values.flatten

  private def close(start: String, next: String => Set[String]): Set[String] = {
    var seen = Set(start)
    var frontier = next(start)
    while (frontier.nonEmpty) {
      seen ++= frontier
      frontier = frontier.flatMap(next).diff(seen)
    }
    seen
  }

  private lazy val childrenMap: Map[String, Set[String]] = {
    val pairs = for ((c, ps) <- parents.toSeq; p <- ps) yield (p, c)
    pairs.groupBy(_._1).map { case (p, cs) => p -> cs.map(_._2).toSet }
  }

  /** Ancestors of `term`, including itself (matches BiolinkHelper.get_ancestors). */
  def ancestors(term: String, includeMixins: Boolean = true): Set[String] = {
    val all = close(term, t => parents.getOrElse(t, Set.empty))
    if (includeMixins) all else all.filter(t => t == term || !mixins(t))
  }

  /** Descendants of `term`, including itself. */
  def descendants(term: String, includeMixins: Boolean = true): Set[String] = {
    val all = close(term, t => childrenMap.getOrElse(t, Set.empty))
    if (includeMixins) all else all.filter(t => t == term || !mixins(t))
  }

  def descendantsOfAll(ts: Iterable[String], includeMixins: Boolean = true): Set[String] =
    ts.flatMap(t => descendants(t, includeMixins)).toSet

  /**
   * Replace mixins that have direct proper mappings with those mappings,
   * keeping everything else (ref: BiolinkHelper.replace_mixins_with_direct_mappings
   * as used at plover.py:2614-2628 and :2704-2743 — the raw terms are also
   * retained by the predicate path; category path replaces them).
   */
  def replaceMixinsWithDirectMappings(ts: Set[String]): Set[String] =
    ts.flatMap { t =>
      if (mixins(t) && mixinDirectMap.contains(t)) mixinDirectMap(t) else Set(t)
    }

  def isSymmetric(p: String): Boolean = symmetric(p)

  /** Canonical form of a predicate (identity when already canonical/unknown). */
  def canonical(p: String): String = canonicalOf.getOrElse(p, p)

  def isCanonical(p: String): Boolean = !canonicalOf.contains(p)

  /**
   * Whether matching for `predicate` should ignore qedge direction, given the
   * predicates the query directly listed (ref: plover.py:2629-2654
   * `_consider_bidirectional`). `predicate` and entries of
   * `directQgPredicates` may be conglomerate strings "pred--dir--aspect".
   */
  def considerBidirectional(predicate: String, directQgPredicates: Set[String]): Boolean = {
    val p = Ontology.usedPredicate(predicate)
    val direct = directQgPredicates.map(Ontology.usedPredicate)
    if (direct.contains(p)) isSymmetric(p)
    else if (direct.nonEmpty && direct.forall(isSymmetric)) true
    else {
      val anc = ancestors(p, includeMixins = true) - p
      if (anc.intersect(direct).exists(isSymmetric)) true
      else isSymmetric(p)
    }
  }
}

object Ontology {
  /** Extract the predicate component of a conglomerate predicate string
   * (ref: plover.py:2655-2661 `_get_used_predicate`). */
  def usedPredicate(conglomerate: String): String = conglomerate.split("--")(0)
}
