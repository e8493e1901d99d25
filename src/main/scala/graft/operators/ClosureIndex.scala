package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Driver-side ancestor -> descendants index over the subclass-closure
 * table, powering the point-lookup fast path: expanding a pinned id set
 * becomes a hash-map probe instead of a closure join + groupBy (two Spark
 * jobs per query on the serving path).
 *
 * Scale posture: the closure is ONTOLOGY-shaped (subclass edges bounded
 * by the hub cutoff, see SubclassClosure), not corpus-shaped, and the
 * reference holds exactly this structure in process memory for every
 * request (plover.py:1521-1619, :1835-1867). `fromClosure` still guards
 * with a row cap so a degenerate closure falls back to the distributed
 * broadcast-join expansion in `OneHop.expandIds` rather than OOMing the
 * driver.
 */
final class ClosureIndex private (private val desc: Map[String, Array[String]])
    extends Serializable {

  /** Number of (ancestor, descendant) entries indexed. */
  def size: Int = desc.valuesIterator.map(_.length).sum

  /**
   * Expand pinned query ids exactly like `OneHop.expandIds`: returns the
   * full id list (originals first, then proper descendants sorted) and
   * the descendant -> query-id map (min ancestor tie-break; ids the user
   * listed directly never appear in the map — their query_id is null).
   */
  def expand(ids: Seq[String]): (Seq[String], Map[String, String]) = {
    val direct = ids.distinct
    val directSet = direct.toSet
    val qid = scala.collection.mutable.HashMap.empty[String, String]
    for (a <- direct; d <- desc.getOrElse(a, ClosureIndex.noDesc) if !directSet(d))
      if (!qid.get(d).exists(_ <= a)) qid(d) = a
    (direct ++ qid.keysIterator.toSeq.sorted, qid.toMap)
  }
}

object ClosureIndex {
  private val noDesc = Array.empty[String]

  /**
   * Collect the closure into a driver index when it is small enough
   * (one bounded job on the — typically cached — closure frame); None
   * beyond `maxRows`, which keeps huge closures on the distributed path.
   */
  def fromClosure(closure: DataFrame, maxRows: Int = 4000000): Option[ClosureIndex] = {
    val rows = closure.select("ancestor", "descendant")
      .limit(maxRows + 1).collect()
    if (rows.length > maxRows) None
    else {
      val m = rows.iterator
        .map(r => (r.getString(0), r.getString(1)))
        .toSeq.groupBy(_._1)
        .map { case (a, ds) => a -> ds.map(_._2).toArray }
      Some(new ClosureIndex(m))
    }
  }
}
