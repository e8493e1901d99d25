package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Ontology, PropertyGraph}

/**
 * One-hop query answering — the Spark-native core of the reference engine
 * (ref: /root/reference/app/app/plover.py:1790-1917 `answer_query`,
 * :2011-2120 `_lookup_answers`).
 *
 * The reference walks a nested node->category->predicate->direction map per
 * input curie. Here the whole lookup is two broadcast joins against the
 * columnar edge table plus literal `isin` predicate filters (computed from
 * the driver-side ontology), so Catalyst pushes everything into the scan
 * and there is no per-curie loop — the same plan serves 1 or 10^6 input
 * ids, and at 100 TB the big table is never shuffled.
 *
 * Semantics preserved:
 *  - canonical-predicate forcing of the qedge (flip when all predicates are
 *    non-canonical; mixed is an error);
 *  - input qnode = the pinned node with the most ids; query ids expanded to
 *    subclass descendants with a descendant->query-id mapping;
 *  - predicate expansion: descendants incl. mixins, mixin->direct mappings
 *    kept alongside, root predicate default;
 *  - per-predicate bidirectionality (`_consider_bidirectional`);
 *  - qualified queries match via conglomerate semantics with None-wildcard
 *    components and component-hierarchy expansion;
 *  - output-category filter only when no output ids were pinned; category
 *    match is against most-specific node categories;
 *  - attribute-constraint filtering;
 *  - optional result-size guard (`num_edges_per_answer_cutoff`).
 */
object OneHop {

  /** Pinned-id sets at or below this size answer through the literal fast
   * path: ids (and their driver-side subclass expansion, see ClosureIndex)
   * are embedded as `isin` literals and the whole lookup is ONE pass over
   * the edge table — no joins, no broadcast builds, no shuffles, so the
   * per-query cost is a single scan-stage job. Larger id sets keep the
   * broadcast-join path, which is the right plan when the pinned side is
   * itself data-sized. 64k strings stay cheap plan-side because both
   * probes are hash tables, not unrolled literals: isin compiles to an
   * InSet set probe, and the query-id map goes through the native
   * MapProbe expression (a typedLit map would LINEAR-scan per row).
   *
   * Threshold justification (ScaleSmoke `lookup` sweep, sf0.1, r12;
   * re-measured r13 with the coarse range conjunct — literal gains
   * further: one-hop 16k ids 0.31 s vs 0.59 s join, 262k 1.91 vs
   * 2.69): the literal probe matches or beats the broadcast join at
   * EVERY measured size — so 64k is not a latency crossover but a
   * MEMORY bound:
   * the probe set rides inside the serialized task binary on every
   * call (~tens of MB at 10^6 ids), where the join path ships the ids
   * once as broadcast DATA. Batches past the cap take the join path,
   * whose plan cost is flat in the pair count. */
  val DefaultMaxLiteralIds = 65536

  /** Coarse zone-map range conjunct for a literal probe set: ONE
   * [min,max] pair in UTF-8 byte order (Spark's binary string
   * comparison — Java's UTF-16 order differs outside the BMP, and a
   * range conjunct must stay a SUPERSET test for every member id).
   * Cached-batch min/max stats can't see through SetProbe, so this
   * plain range predicate over the clustering column does the batch
   * pruning. A per-length multi-range refinement (tight windows for
   * numeric-suffix CURIEs of mixed digit count, each class guarded by
   * a length conjunct) was tried in r14: A/B runs on the same machine
   * showed NO improvement on any key — g15's residue included — with
   * the Or-of-ranges adding per-row cost on every surviving row, so
   * the simpler single range was kept (negative result recorded).
   * Shared by answer(), answerBatch and getEdges so the three
   * literal-probe paths can't diverge. */
  private[graft] def rangeConjunct(c: Column, ids: Iterable[String]): Column = {
    val utf8Order: Ordering[String] = new Ordering[String] {
      def compare(a: String, b: String): Int = java.util.Arrays.compareUnsigned(
        a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    }
    c >= lit(ids.min(utf8Order)) && c <= lit(ids.max(utf8Order))
  }

  /** Matched edges with binding columns:
   * input_id/output_id (which endpoint fulfilled which qnode) and
   * input_query_id/output_query_id (non-null when the endpoint was reached
   * via subclass expansion of a pinned query id). `guardCount` carries the
   * distinct answer-edge count the maxEdges guard already computed, so a
   * caller that just passed the guard never pays a second count job. */
  final case class Result(matches: DataFrame, inputKey: String, outputKey: String,
                          guardCount: Option[Long] = None)

  /** A pinned id set resolved driver-side: expanded ids + the
   * descendant -> query-id map (empty when no subclass expansion). */
  private final case class LocalIds(ids: Seq[String], queryIds: Map[String, String])

  def answer(spark: SparkSession, graph: PropertyGraph, ont: Ontology, qg: QueryGraph,
             closure: Option[DataFrame] = None,
             expandSubclasses: Boolean = true,
             maxEdges: Option[Long] = None,
             index: Option[ClosureIndex] = None,
             maxLiteralIds: Int = DefaultMaxLiteralIds): Result = {
    val qedge = QueryGraph.forceCanonical(qg.edge.get, ont)
    val subjQ = qg.node(qedge.subjectKey)
    val objQ = qg.node(qedge.objectKey)
    require(subjQ.ids.nonEmpty || objQ.ids.nonEmpty,
      "At least one qnode must have ids")

    // Input qnode = first (in qnode order) with strictly the most ids
    // (plover.py:2594-2613)
    val inputQ = qg.nodes.foldLeft(Option.empty[QNode]) { (best, qn) =>
      if (qn.ids.size > best.map(_.ids.size).getOrElse(0)) Some(qn) else best
    }.get
    val outputQ = if (inputQ.key == subjQ.key) objQ else subjQ
    val inputIsSubject = inputQ.key == qedge.subjectKey

    // Driver-side expansion of a pinned id set, when resolvable without a
    // Spark job: trivially when no subclass expansion applies, via the
    // ClosureIndex when one is provided. None -> the distributed
    // expandIds/broadcast-join path must be used for that side.
    def local(ids: Seq[String]): Option[LocalIds] = {
      val resolved =
        if (!expandSubclasses || closure.isEmpty) Some(LocalIds(ids.distinct, Map.empty))
        else index.map { ix =>
          val (all, qid) = ix.expand(ids); LocalIds(all, qid)
        }
      resolved.filter(_.ids.size <= maxLiteralIds)
    }
    val inLocalOpt = local(inputQ.ids)
    val outLocalOpt = if (outputQ.ids.nonEmpty) local(outputQ.ids) else None

    // ---- predicate + direction conditions (literal, driver-computed) ----
    // staticBidir = Some(false) folds the dead direction's condition to
    // a literal false, so Catalyst prunes that scan branch entirely
    // (the qualified twin of the plain path's literal-set folding).
    val (matchCond, bidirCond) =
      if (qedge.qualifierConstraints.nonEmpty) {
        val (m, b, _) = qualifiedConds(qedge, ont); (m, b)
      } else plainConds(qedge, ont)

    val fwdCond = matchCond && (bidirCond || lit(inputIsSubject))
    val bwdCond = matchCond && (bidirCond || lit(!inputIsSubject))

    val edges = graph.edges

    def queryIdCol(m: Map[String, String], id: Column): Column =
      if (m.isEmpty) lit(null).cast("string")
      else graft.functions.HashExpressions.mapProbe(id, m)

    // Small sets keep isin (literal InSet: trivial plan cost, and cached-
    // batch stats pruning can use it); large expansions go through the
    // native SetProbe so the id set is ONE plan object however many times
    // the condition is referenced — PLUS the zone-map range conjunct
    // (rangeConjunct below): SetProbe is opaque to the cached batches'
    // min/max stats (r12's g15 scanned all 1.3M rows twice for a 40-id
    // probe), but plain range predicates over the clustering column
    // prune batches like isin does. Ordered range -> probe -> rest so
    // the cheap checks still short-circuit the expensive match
    // conditions.
    def memberOf(c: Column, ids: Seq[String]): Column =
      if (ids.size <= 16) c.isin(ids: _*)
      else rangeConjunct(c, ids) &&
        graft.functions.HashExpressions.setProbe(c, ids.toSet)

    // ---- input-side matching ----
    // Literal fast path (pinned sets small, expansion driver-resolvable):
    // each direction is its own filtered pass over the replica CLUSTERED
    // on the column it probes — fwd probes `subject` against the
    // subject-clustered primary, bwd probes `object` against the
    // object-clustered replica — so zone-map batch pruning serves both
    // (see PropertyGraph.reverseEdges). Zero joins and zero shuffles; an
    // edge matching both directions yields both binding rows, exactly as
    // the previous single-scan conditional explode did, and a direction
    // whose condition folds to false (a non-symmetric pinned-side query)
    // prunes to an empty relation at optimization time, leaving ONE scan.
    // Fallback: the broadcast-join shape (two filtered scans joined to the
    // broadcast expansion frame), the right plan for data-sized id sets.
    var matched = inLocalOpt match {
      case Some(in) if outputQ.ids.isEmpty || outLocalOpt.isDefined =>
        // Membership probe FIRST in the conjunction: codegen evaluates
        // And left-to-right, so the O(1) id hash probe short-circuits
        // before the match condition — which for qualified queries is a
        // conglomerate of map lookups per row (the r12 g15 profile: the
        // conglomerate ran on all 1.3M rows before the 40-id probe cut
        // them to thousands).
        val fwdHit = memberOf(col("subject"), in.ids) && fwdCond
        val bwdHit = memberOf(col("object"), in.ids) && bwdCond
        val fwd = edges.where(fwdHit)
          .withColumn("input_id", col("subject"))
          .withColumn("output_id", col("object"))
        val bwd = graph.reverseEdges.where(bwdHit)
          .withColumn("input_id", col("object"))
          .withColumn("output_id", col("subject"))
        fwd.unionByName(bwd)
          .withColumn("input_query_id", queryIdCol(in.queryIds, col("input_id")))
      case _ =>
        val inputExp = expandIds(spark, inputQ.ids, closure, expandSubclasses)
        val inFwd = inputExp
          .withColumnRenamed("node_id", "subject")
          .withColumnRenamed("query_id", "input_query_id")
        val fwd = edges.where(fwdCond)
          .join(broadcast(inFwd), Seq("subject"))
          .withColumn("input_id", col("subject"))
          .withColumn("output_id", col("object"))
        val inBwd = inputExp
          .withColumnRenamed("node_id", "object")
          .withColumnRenamed("query_id", "input_query_id")
        val bwd = edges.where(bwdCond)
          .join(broadcast(inBwd), Seq("object"))
          .withColumn("input_id", col("object"))
          .withColumn("output_id", col("subject"))
        fwd.unionByName(bwd)
    }

    // ---- output-side filtering ----
    matched =
      if (outputQ.ids.nonEmpty) outLocalOpt match {
        case Some(out) if inLocalOpt.isDefined =>
          // Pinned output ids, literal (categories are ignored in this
          // case, plover.py:2045-2049)
          matched.where(memberOf(col("output_id"), out.ids))
            .withColumn("output_query_id", queryIdCol(out.queryIds, col("output_id")))
        case _ =>
          val outExp = expandIds(spark, outputQ.ids, closure, expandSubclasses)
            .withColumnRenamed("node_id", "output_id")
            .withColumnRenamed("query_id", "output_query_id")
          matched.join(broadcast(outExp), Seq("output_id"))
      } else {
        val withNull = matched.withColumn("output_query_id", lit(null).cast("string"))
        if (outputQ.categories.isEmpty) withNull
        else {
          val cats = expandCategories(outputQ.categories, ont)
          val catsLit = lit(cats.toArray)
          if (edges.columns.contains("object_categories")) {
            // Build-time denormalized endpoint categories: the output-side
            // category filter is a pure column predicate on the matched
            // edges themselves — no node join, nothing to broadcast, and at
            // 100 TB no second table is touched. (output_id equals `object`
            // on the forward branch and `subject` on the backward one; for
            // self-loops both arrays coincide, so the comparison is safe.)
            withNull.where(arrays_overlap(
              when(col("output_id") === col("object"), col("object_categories"))
                .otherwise(col("subject_categories")), catsLit))
          } else {
            // Fallback for graphs built without denormalization: the
            // category-filtered node list is bounded by the node dimension,
            // so force the broadcast rather than leaving AQE to guess (an
            // unforced plan shuffled both union branches — the r2 g07
            // regression).
            val catNodes = graph.nodes
              .where(arrays_overlap(col("categories"), catsLit))
              .select(col("id").as("output_id"))
            withNull.join(broadcast(catNodes), Seq("output_id"), "left_semi")
          }
        }
      }

    if (qedge.attributeConstraints.nonEmpty)
      matched = matched.where(AttributeConstraints.compileAll(qedge.attributeConstraints))

    var guardCount: Option[Long] = None
    maxEdges.foreach { limit =>
      // Persist before guarding so the guard's count and the caller's
      // subsequent action share one evaluation of the matched set (an
      // unguarded query pays nothing; a guarded one scans once, not twice).
      matched = matched.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = matched.select("edge_id").distinct().count()
      if (n > limit) {
        matched.unpersist()
        throw new IllegalStateException(
          s"Query would produce $n answer edges, more than the cutoff of $limit")
      }
      guardCount = Some(n)
    }

    Result(matched, inputQ.key, outputQ.key, guardCount)
  }

  /** Query category list -> expanded literal set
   * (ref: plover.py:2614-2628 `_get_expanded_output_category_ids`). */
  def expandCategories(categories: Seq[String], ont: Ontology): Set[String] = {
    val raw = if (categories.nonEmpty) categories.toSet else Set(ont.rootCategory)
    val proper = ont.replaceMixinsWithDirectMappings(raw)
    ont.descendantsOfAll(proper, includeMixins = false)
  }

  /** Driver-side plain-predicate expansion shared by the per-query and
   * batch paths: (all matching predicates, the bidirectional subset).
   * One copy so the batch path can never drift from `answer`'s
   * semantics (ref: plover.py:2704-2743). */
  private[operators] def plainPredSets(qedge: QEdge, ont: Ontology)
      : (Set[String], Set[String]) = {
    val raw = if (qedge.predicates.nonEmpty) qedge.predicates.toSet else Set(ont.rootPredicate)
    val qgPreds = raw ++ ont.replaceMixinsWithDirectMappings(raw)
    val expanded = ont.descendantsOfAll(qgPreds, includeMixins = true)
    val bidirPreds = expanded.filter(p => ont.considerBidirectional(p, qgPreds))
    (expanded, bidirPreds)
  }

  /** Non-qualified predicate match + bidirectionality conditions
   * (ref: plover.py:2704-2743). */
  private def plainConds(qedge: QEdge, ont: Ontology): (Column, Column) = {
    val (expanded, bidirPreds) = plainPredSets(qedge, ont)
    val dirPreds = expanded.diff(bidirPreds)
    val matchCond = col("predicate").isin(expanded.toSeq: _*)
    val bidirCond =
      if (dirPreds.isEmpty) lit(true)
      else if (bidirPreds.isEmpty) lit(false)
      else col("predicate").isin(bidirPreds.toSeq: _*)
    (matchCond, bidirCond)
  }

  /**
   * Qualified-query (conglomerate) match condition
   * (ref: plover.py:1486-1520 conglomerate descendant index, :2744-2777
   * `_get_conglomerate_predicates_from_qedge`). An edge matches a
   * qualifier constraint iff it carries SOME qualifier info and each
   * non-None query component is an ancestor-or-self of the edge's
   * component; the predicate component may be fulfilled by either the
   * edge's qualified predicate or its regular predicate.
   */
  private def qualifiedConds(qedge: QEdge, ont: Ontology)
      : (Column, Column, Option[Boolean]) = {
    val isQualified = col("qualified_predicate").isNotNull ||
      col("object_direction").isNotNull || col("object_aspect").isNotNull

    val perConstraint = qedge.qualifierConstraints.map { qc =>
      val predComponents: Seq[Option[String]] =
        if (qc.qualifiedPredicate.isEmpty && qedge.predicates.nonEmpty)
          qedge.predicates.map(Some(_))
        else Seq(qc.qualifiedPredicate)
      val predConds = predComponents.map {
        case Some(p) =>
          val d = ont.descendants(p, includeMixins = true).toSeq
          col("qualified_predicate").isin(d: _*) || col("predicate").isin(d: _*)
        case None =>
          // all-None conglomerates never match (plover.py:1516 difference
          // with {"None--None--None"})
          if (qc.objectDirection.isEmpty && qc.objectAspect.isEmpty) lit(false)
          else lit(true)
      }
      val dirCond = qc.objectDirection match {
        case Some(d) =>
          col("object_direction").isin(ont.descendants(d, includeMixins = true).toSeq: _*)
        case None => lit(true)
      }
      val aspCond = qc.objectAspect match {
        case Some(a) =>
          col("object_aspect").isin(ont.descendants(a, includeMixins = true).toSeq: _*)
        case None => lit(true)
      }
      predConds.map(pc => pc && dirCond && aspCond).reduce(_ || _)
    }
    val matchCond = isQualified && perConstraint.reduce(_ || _)

    // Direct QG "used predicates" for bidirectionality (plover.py:2629-2654):
    // the qualified predicate when given, else the regular predicates.
    val direct: Set[String] = qedge.qualifierConstraints.flatMap { qc =>
      qc.qualifiedPredicate.map(Seq(_)).getOrElse(
        if (qedge.predicates.nonEmpty) qedge.predicates else Seq.empty)
    }.toSet
    val edgeUsed = coalesce(col("qualified_predicate"), col("predicate"))
    val directSym = direct.filter(ont.isSymmetric)
    // Driver-decidable bidirectionality (r13 verdict #10): Some(true)
    // when every direct predicate is symmetric (the reference's
    // all-symmetric early return, plover.py:2644); Some(false) when NO
    // row can satisfy the per-row condition — it only ever admits a
    // used predicate through `directSym` or the ontology-wide symmetric
    // set, so both empty proves the dead direction statically. (The
    // symmetric-set check cannot be narrowed to the constraint's
    // descendant cone: a row may match via `predicate` while carrying
    // an arbitrary `qualified_predicate`, which is the used predicate.)
    // None -> per-row, both directions live.
    val staticBidir: Option[Boolean] =
      if (direct.nonEmpty && direct.forall(ont.isSymmetric)) Some(true)
      else if (directSym.isEmpty && ont.symmetric.isEmpty) Some(false)
      else None
    val bidirCond = staticBidir match {
      case Some(b) => lit(b)
      case None =>
        val descOfDirectSym = ont.descendantsOfAll(directSym, includeMixins = true)
        val inDirect = if (direct.isEmpty) lit(false) else edgeUsed.isin(direct.toSeq: _*)
        val inDirectSym =
          if (directSym.isEmpty) lit(false) else edgeUsed.isin(directSym.toSeq: _*)
        val fallback = edgeUsed.isin(
          (ont.symmetric ++ descOfDirectSym).toSeq: _*)
        when(inDirect, inDirectSym).otherwise(fallback)
    }
    (matchCond, bidirCond, staticBidir)
  }

  /**
   * Batched lookup serving — ONE Spark job answering N tagged one-hop
   * probes (r12 verdict #2: amortize the per-job scheduling floor across
   * a request batch, the TRAPI-batch analog of the reference's own batch
   * endpoints — plover.py:1934 `get_edges` takes a pair LIST and
   * :1982 `get_neighbors` an id list).
   *
   * Scale shape: the batch rides the plan as DATA, not as N plan
   * branches. Each direction is ONE probe-filtered pass over the replica
   * clustered on the probed column; a row fans out to the tags whose
   * probe set contains its endpoint (map_probe -> split -> explode, all
   * codegen'd), then per-tag predicate / pinned-output / category
   * checks are O(1) hash probes on "tag<sep>value" pair keys. Plan size,
   * stage count and shuffle count are CONSTANT in the batch size — 1000
   * probes cost the same two scan stages as one — and the driver-built
   * probe tables are bounded by the request itself (sum of expanded id
   * sets), not the corpus.
   *
   * Semantics: per tag, identical to `answer` on the literal fast path
   * (spec-pinned row-for-row in BatchLookupSpec): canonical forcing,
   * input-qnode selection, subclass expansion with query-id mapping,
   * per-predicate bidirectionality, pinned-output ids (categories
   * ignored then, plover.py:2045-2049), output-category filtering
   * against most-specific categories. Qualified (conglomerate) and
   * attribute-constrained probes are supported through per-tag GATED
   * conjuncts (`tag = t && <condition_t>` folded into the branch
   * filter): they cost plan size linear in the number of such probes —
   * where plain probes are pure data — but still run inside the same
   * single job and both scans. A qualified probe's ids enter both
   * direction maps (its bidirectionality condition is per-row, so
   * neither branch can be proven dead driver-side); the gate filters
   * the wrong-direction rows.
   *
   * Bounds, by design: every pinned side must resolve driver-side (the
   * ClosureIndex literal regime), and the WHOLE batch's expanded ids
   * ride the serialized task binary together — so the per-call
   * `maxLiteralIds` cap applies to the batch TOTAL, not per probe. A
   * data-sized id set belongs on `answer`'s broadcast-join path, not
   * in a point-probe batch.
   *
   * Output: `answer`'s binding projection plus the probe `tag`:
   * (tag, edge_id, subject, object, predicate, input_id, output_id,
   * input_query_id, output_query_id).
   */
  def answerBatch(spark: SparkSession, graph: PropertyGraph, ont: Ontology,
                  probes: Seq[(String, QueryGraph)],
                  closure: Option[DataFrame] = None,
                  expandSubclasses: Boolean = true,
                  index: Option[ClosureIndex] = None,
                  maxLiteralIds: Int = DefaultMaxLiteralIds): DataFrame = {
    import graft.functions.{HashExpressions => HE}
    val SEP = "" // never occurs in CURIEs (same invariant as getEdges)
    val TSEP = ""
    require(probes.map(_._1).distinct.size == probes.size, "probe tags must be unique")
    require(probes.forall(p => !p._1.contains(SEP) && !p._1.contains(TSEP)),
      "probe tags must not contain \\u0001/\\u0002")

    // ---- driver-side probe compilation (bounded by the request) ----
    val fwdTags = scala.collection.mutable.Map.empty[String, List[String]]
    val bwdTags = scala.collection.mutable.Map.empty[String, List[String]]
    val fwdPredPairs = Set.newBuilder[String]
    val bwdPredPairs = Set.newBuilder[String]
    val inQid = Map.newBuilder[String, String]
    val outQid = Map.newBuilder[String, String]
    var outPinnedTags = Set.empty[String]
    val outPairs = Set.newBuilder[String]
    var catTags = Set.empty[String]
    val catPairs = Set.newBuilder[String]
    val fwdQual = Seq.newBuilder[(String, Column)]
    val bwdQual = Seq.newBuilder[(String, Column)]
    val attrGates = Seq.newBuilder[(String, Column)]
    var totalIds = 0

    for ((tag, qg) <- probes) {
      val qedge = QueryGraph.forceCanonical(qg.edge.get, ont)
      val subjQ = qg.node(qedge.subjectKey)
      val objQ = qg.node(qedge.objectKey)
      require(subjQ.ids.nonEmpty || objQ.ids.nonEmpty,
        s"probe '$tag': at least one qnode must have ids")
      val inputQ = qg.nodes.foldLeft(Option.empty[QNode]) { (best, qn) =>
        if (qn.ids.size > best.map(_.ids.size).getOrElse(0)) Some(qn) else best
      }.get
      val outputQ = if (inputQ.key == subjQ.key) objQ else subjQ
      val inputIsSubject = inputQ.key == qedge.subjectKey

      def expand(ids: Seq[String]): LocalIds = {
        val li =
          if (!expandSubclasses || closure.isEmpty) LocalIds(ids.distinct, Map.empty)
          else index match {
            case Some(ix) => val (all, qid) = ix.expand(ids); LocalIds(all, qid)
            case None => throw new IllegalArgumentException(
              s"probe '$tag': subclass expansion in a batch needs a ClosureIndex")
          }
        totalIds += li.ids.size
        require(totalIds <= maxLiteralIds,
          s"batch ships $totalIds+ expanded ids inside one task binary, " +
            s"over the $maxLiteralIds cap (probe '$tag') — split the " +
            "batch, or run oversized probes through answer()'s " +
            "broadcast-join path")
        li
      }
      val in = expand(inputQ.ids)
      if (qedge.qualifierConstraints.nonEmpty) {
        // qualified probe: the conglomerate match is a per-tag GATED
        // conjunct. Ids enter a direction map only when that direction
        // can match: usually bidirectionality is per-row so both are
        // live, but a driver-decidable verdict (qualifiedConds'
        // staticBidir — e.g. a symmetric-free ontology) keeps the ids
        // and the gate out of the dead direction, dropping the probe
        // from 2 plan gates to 1 (r13 verdict #10).
        val (matchCond, bidirCond, staticBidir) = qualifiedConds(qedge, ont)
        val fwdLive = staticBidir.getOrElse(true) || inputIsSubject
        val bwdLive = staticBidir.getOrElse(true) || !inputIsSubject
        if (fwdLive) {
          in.ids.foreach(id => fwdTags(id) = tag :: fwdTags.getOrElse(id, Nil))
          fwdQual += tag -> (matchCond && (bidirCond || lit(inputIsSubject)))
        }
        if (bwdLive) {
          in.ids.foreach(id => bwdTags(id) = tag :: bwdTags.getOrElse(id, Nil))
          bwdQual += tag -> (matchCond && (bidirCond || lit(!inputIsSubject)))
        }
      } else {
        val (expanded, bidirPreds) = plainPredSets(qedge, ont)
        val fwdPreds = if (inputIsSubject) expanded else bidirPreds
        val bwdPreds = if (!inputIsSubject) expanded else bidirPreds
        if (fwdPreds.nonEmpty) {
          in.ids.foreach(id => fwdTags(id) = tag :: fwdTags.getOrElse(id, Nil))
          fwdPreds.foreach(p => fwdPredPairs += tag + SEP + p)
        }
        if (bwdPreds.nonEmpty) {
          in.ids.foreach(id => bwdTags(id) = tag :: bwdTags.getOrElse(id, Nil))
          bwdPreds.foreach(p => bwdPredPairs += tag + SEP + p)
        }
      }
      if (qedge.attributeConstraints.nonEmpty)
        attrGates += tag -> AttributeConstraints.compileAll(qedge.attributeConstraints)
      in.queryIds.foreach { case (id, q) => inQid += (tag + SEP + id) -> q }
      if (outputQ.ids.nonEmpty) {
        val out = expand(outputQ.ids)
        outPinnedTags += tag
        out.ids.foreach(id => outPairs += tag + SEP + id)
        out.queryIds.foreach { case (id, q) => outQid += (tag + SEP + id) -> q }
      } else if (outputQ.categories.nonEmpty) {
        catTags += tag
        expandCategories(outputQ.categories, ont)
          .foreach(c => catPairs += tag + SEP + c)
      }
    }

    val fwdTagMap = fwdTags.iterator.map { case (k, v) => k -> v.mkString(TSEP) }.toMap
    val bwdTagMap = bwdTags.iterator.map { case (k, v) => k -> v.mkString(TSEP) }.toMap
    val inQidMap = inQid.result()
    val outQidMap = outQid.result()
    val fwdPairSet = fwdPredPairs.result()
    val bwdPairSet = bwdPredPairs.result()
    val outPairSet = outPairs.result()
    val catPairSet = catPairs.result()
    val fwdQualGates = fwdQual.result()
    val bwdQualGates = bwdQual.result()

    // ---- the one-job plan ----
    def branch(rel: DataFrame, probeCol: String, otherCol: String,
               tagMap: Map[String, String], predPairs: Set[String],
               qualGates: Seq[(String, Column)]): Option[DataFrame] =
      if (tagMap.isEmpty) None
      else Some {
        // predicate check: plain probes are an O(1) pair-key hash probe;
        // qualified probes are per-tag gated conjuncts OR'd behind it
        val pairHit =
          if (predPairs.isEmpty) lit(false)
          else HE.setProbe(concat_ws(SEP, col("tag"), col("predicate")), predPairs)
        val qualHit = qualGates.foldLeft(lit(false)) {
          case (acc, (t, c)) => acc || (col("tag") === t && c)
        }
        // per-length range conjuncts first — the zone-map-prunable part
        // (see rangeConjunct); the probe set itself is opaque to
        // cached-batch stats
        rel.where(rangeConjunct(col(probeCol), tagMap.keys) &&
            HE.setProbe(col(probeCol), tagMap.keySet))
          .withColumn("tag",
            explode(split(HE.mapProbe(col(probeCol), tagMap), TSEP)))
          .where(pairHit || qualHit)
          .withColumn("input_id", col(probeCol))
          .withColumn("output_id", col(otherCol))
      }
    val fwd = branch(graph.edges, "subject", "object", fwdTagMap, fwdPairSet,
      fwdQualGates)
    val bwd = branch(graph.reverseEdges, "object", "subject", bwdTagMap,
      bwdPairSet, bwdQualGates)
    var matched = (fwd, bwd) match {
      case (Some(f), Some(b)) => f.unionByName(b)
      case (Some(f), None) => f
      case (None, Some(b)) => b
      case _ => throw new IllegalArgumentException("empty probe batch")
    }
    matched = matched
      .withColumn("input_query_id",
        if (inQidMap.isEmpty) lit(null).cast("string")
        else HE.mapProbe(concat_ws(SEP, col("tag"), col("input_id")), inQidMap))
      .withColumn("output_query_id",
        if (outQidMap.isEmpty) lit(null).cast("string")
        else HE.mapProbe(concat_ws(SEP, col("tag"), col("output_id")), outQidMap))
    if (outPinnedTags.nonEmpty)
      matched = matched.where(!HE.setProbe(col("tag"), outPinnedTags) ||
        HE.setProbe(concat_ws(SEP, col("tag"), col("output_id")), outPairSet))
    if (catTags.nonEmpty) {
      val tagHasCats = HE.setProbe(col("tag"), catTags)
      def catHit(cats: Column): Column =
        exists(cats, c => HE.setProbe(concat_ws(SEP, col("tag"), c), catPairSet))
      matched =
        if (matched.columns.contains("object_categories"))
          // denormalized endpoint categories: pure column predicate
          matched.where(!tagHasCats || catHit(
            when(col("output_id") === col("object"), col("object_categories"))
              .otherwise(col("subject_categories"))))
        else {
          // fallback for graphs without denormalization: one broadcast of
          // the node dimension's (id, categories) — still one job
          val nodeCats = graph.nodes
            .select(col("id").as("output_id"), col("categories").as("__out_cats"))
          matched.join(broadcast(nodeCats), Seq("output_id"), "left")
            .where(!tagHasCats || catHit(col("__out_cats")))
            .drop("__out_cats")
        }
    }
    locally {
      val gates = attrGates.result()
      if (gates.nonEmpty) {
        // attribute constraints: per-tag gated conjuncts, same contract
        // as answer()'s post-match AttributeConstraints filter
        val inAttr = HE.setProbe(col("tag"), gates.map(_._1).toSet)
        val gate = gates.foldLeft(lit(false)) {
          case (acc, (t, c)) => acc || (col("tag") === t && c)
        }
        matched = matched.where(!inAttr || gate)
      }
    }
    matched.select(col("tag"), col("edge_id"), col("subject"), col("object"),
      col("predicate"), col("input_id"), col("output_id"),
      col("input_query_id"), col("output_query_id"))
  }

  /**
   * Expand pinned query ids to subclass descendants, keeping a
   * descendant -> query-id mapping (null for ids the user listed directly;
   * min() tie-break when a node descends from several query ids).
   * Ref: plover.py:1835-1867.
   */
  def expandIds(spark: SparkSession, ids: Seq[String], closure: Option[DataFrame],
                expand: Boolean): DataFrame = {
    import spark.implicits._
    val idsDF = ids.toDF("node_id")
    val originals = idsDF.withColumn("query_id", lit(null).cast("string"))
    closure match {
      case Some(c) if expand =>
        val descendants = c
          .join(broadcast(ids.toDF("ancestor")), Seq("ancestor"))
          .select(col("descendant").as("node_id"), col("ancestor").as("query_id"))
          .join(broadcast(idsDF), Seq("node_id"), "left_anti")
          .groupBy("node_id").agg(min("query_id").as("query_id"))
        originals.unionByName(descendants)
      case _ => originals
    }
  }
}
