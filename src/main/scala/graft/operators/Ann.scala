package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (SURVEY.md §2 P6-P7, P17, P26-P27).
 *
 * Scale design:
 *  - `bruteForceTopK` broadcasts the (small) probe set against the corpus —
 *    the corpus is scanned once, never shuffled, and the per-probe top-k is
 *    a window over (probe, cosine). This is the exact baseline: at 100 TB
 *    it is one full scan per probe batch, which is the right cost model
 *    when probes are few and recall must be 1.0.
 *  - `ivfTopK`/`ivfPqTopK` are the inverted-file scale paths. The coarse
 *    quantizer is trained on a bounded sample and embedded as LITERALS, so
 *    list assignment is a pure per-row argmax projection over the corpus
 *    scan — NO shuffle, no crossJoin row blow-up (the r5 form shuffled a
 *    nCenters×corpus intermediate through a window just to pick each
 *    vector's nearest centroid; at 100 TB that shuffle IS the build cost).
 *  - `lshTopK` hashes both sides to sign-LSH buckets and only scores
 *    same-bucket candidates; multi-table probing recovers recall.
 *
 * Ties are broken by candidate id so results are deterministic and
 * oracle-comparable.
 */
object Ann {

  /** Exact cosine top-k per probe. Probes = (probe_id, probe vector).
   * Returns (probe_id, rank, neighbor_id, cosine), rank 1..k. */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int = 10,
                     vecCol: String = "embedding", idCol: String = "vec_id",
                     probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
    val p = probes.select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
    val scored = c.crossJoin(broadcast(p))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.dot(col("pv"), col("cv")) / (col("pn") * col("cn")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  // ------------------------------------------------------- driver helpers

  /** Seeded index-order fold — bit-identical to VF.dot / the oracle's
   * list_reduce (0.0 + x == x for IEEE doubles). */
  private def vdot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  /** Floored like VF.norm (cosine-denominator twin, same `NormFloor`): a
   * zero vector gets cosine 0.0 on both engines instead of NaN
   * driver-side and an ANSI divide-by-zero error SQL-side. */
  private def vnrm(a: Array[Double]): Double =
    math.max(math.sqrt(vdot(a, a)), VF.NormFloor)

  /** Bounded deterministic training sample: the first `sampleN` vectors in
   * id order. `orderBy(id).limit(n)` (TakeOrdered — no full sort) rather
   * than `id < n` so a corpus with opaque / non-dense ids still yields a
   * full-size sample instead of a silently empty or skewed one; on dense
   * 0-based ids the two are identical. Driver cost O(sampleN · dim). */
  private def collectSample(corpus: DataFrame, sampleN: Int, vecCol: String,
                            idCol: String): Array[(Long, Array[Double])] =
    corpus.select(col(idCol).cast("long"), VF.toDouble(col(vecCol)))
      .orderBy(col(idCol)).limit(sampleN)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Driver-side nearest-centroid assignment by cosine, iterating cents in
   * ascending-cid order with strict > so exact ties keep the LOWEST
   * centroid id — the same ordering the per-row `nearestIdx` expression
   * and the oracle's `ORDER BY cos DESC, cid ASC` produce. A degenerate
   * (zero-norm) vector scores cosine 0.0 against every centroid — the
   * floored `vnrm` mirrors the expression's floored `VF.norm` — so both
   * engines tie-break it to index 0 and training can't crash. The -1
   * guard is belt-and-braces for an empty centroid list upstream. */
  private def assignDriver(v: Array[Double],
                           cents: Seq[(Long, Array[Double], Double)]): Int = {
    val vn = vnrm(v)
    var bestI = -1; var bestCos = Double.NegativeInfinity; var i = 0
    cents.foreach { case (_, cv, cn) =>
      val cos = vdot(v, cv) / (vn * cn)
      if (cos > bestCos) { bestCos = cos; bestI = i }
      i += 1
    }
    if (bestI < 0) 0 else bestI
  }

  /**
   * Deterministic k-means training for the IVF coarse quantizer —
   * FAISS-style nlist/nprobe semantics (public knowledge): the quantizer
   * is trained on a bounded SAMPLE and the trained centroids are embedded
   * as literals, so training cost is independent of corpus size (the
   * 100 TB posture; the sample collect is O(sampleN * dim) driver bytes).
   *
   * Everything is fixed so an external SQL oracle reproduces the exact
   * doubles: sample = first sampleN vectors in id order; init = the
   * first `nCenters` of them (centroid_id = source vector id); `iters`
   * fixed iterations of { assign by cosine, lower-centroid-id tie-break;
   * centroid = element-wise mean folded in id order }; an emptied cluster
   * keeps its previous centroid. No RNG anywhere. Returned cents are in
   * ascending centroid_id order.
   */
  def trainCentroids(corpus: DataFrame, nCenters: Int, sampleN: Int = 256,
                     iters: Int = 2, vecCol: String = "embedding",
                     idCol: String = "vec_id"): Seq[(Long, Seq[Double])] = {
    val sample = collectSample(corpus, sampleN, vecCol, idCol)
    require(sample.length >= nCenters, s"sample (${sample.length}) < nCenters ($nCenters)")
    trainFromSample(sample, nCenters, iters)
  }

  /** The k-means loop over an already-collected sample (callers guarantee
   * 0 < nCenters <= sample.length). */
  private def trainFromSample(sample: Array[(Long, Array[Double])], nCenters: Int,
                              iters: Int): Seq[(Long, Seq[Double])] = {
    val dim = sample.head._2.length
    var cents: Array[(Long, Array[Double])] = sample.take(nCenters)
    for (_ <- 0 until iters) {
      val withNorms = cents.toSeq.map { case (cid, cv) => (cid, cv, vnrm(cv)) }
      val assigned = sample.map { case (id, v) =>
        (cents(assignDriver(v, withNorms))._1, id, v)
      }
      val byCent = assigned.groupBy(_._1)
      cents = cents.map { case (cid, old) =>
        byCent.get(cid) match {
          case Some(members) =>
            val inIdOrder = members.sortBy(_._2)
            val mean = Array.tabulate(dim) { d =>
              inIdOrder.foldLeft(0.0)((acc, m) => acc + m._3(d)) / members.length
            }
            (cid, mean)
          case None => (cid, old) // emptied cluster keeps its centroid
        }
      }
    }
    cents.map { case (cid, v) => (cid, v.toSeq) }.toSeq
  }

  // ----------------------------------------- per-row centroid assignment

  /** Trained centroids embedded as literal columns (cid-ascending), plus
   * driver-precomputed norms — the same seeded index-order fold that
   * produced the centroids, so both engines compare identical doubles. */
  private final case class CentLits(ids: Column, vecs: Column, norms: Column, n: Int)
  private def centLits(cents: Seq[(Long, Seq[Double])]): CentLits = {
    val sorted = cents.sortBy(_._1)
    CentLits(
      typedLit(sorted.map(_._1)),
      typedLit(sorted.map(_._2)),
      typedLit(sorted.map(c => vnrm(c._2.toArray))),
      sorted.length)
  }

  /** Sample-once quantizer for the IVF entry points. `None` when the
   * corpus is empty (callers return an empty result — the library's
   * return-empty-not-crash contract); `nCenters` is clamped to the
   * sample size so a corpus smaller than nCenters gets a degenerate but
   * working quantizer instead of a crash. The strict `require` lives
   * only on the explicit `trainCentroids` API. */
  private def centLitsOpt(corpus: DataFrame, nCenters: Int, trainIters: Int,
                          trainSample: Int, vecCol: String,
                          idCol: String): Option[CentLits] = {
    val sampleN = if (trainIters > 0) trainSample else nCenters
    val sample = collectSample(corpus, sampleN, vecCol, idCol)
    if (sample.isEmpty) None
    else Some(centLits(trainFromSample(sample,
      math.min(nCenters, sample.length), trainIters)))
  }

  /** Empty (probe_id, rank, neighbor_id, score) frame preserving the
   * input id types — what the top-k entry points return when the corpus
   * is empty. */
  private def emptyTopK(corpus: DataFrame, probes: DataFrame, scoreName: String,
                        idCol: String, probeIdCol: String): DataFrame =
    probes.select(col(probeIdCol).as("probe_id")).limit(0)
      .crossJoin(corpus.select(col(idCol).as("neighbor_id")).limit(0))
      .select(col("probe_id"), lit(0L).as("rank"), col("neighbor_id"),
        lit(0.0).as(scoreName))

  /** Evaluate `e` ONCE per row and bind the result as a lambda variable
   * for `f`. Catalyst's projection collapse re-inlines a single-referenced
   * project column into its consumer — harmless usually, but here the
   * consumer is a per-centroid lambda, so an inlined norm would be
   * recomputed nCenters times per row. A 1-element transform is a
   * collapse-proof binding (the lambda body reads a lambda variable,
   * which is always a cheap slot read). */
  private def bindOnce(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), f), 1)

  /** (-cosine, index) structs against every centroid — the per-row
   * assignment primitive. struct ordering gives cosine DESC with ties to
   * the lowest index (= lowest centroid id, cents are cid-ascending),
   * mirroring the oracle's `ORDER BY cos DESC, cid ASC`. */
  private def negCosIdx(v: Column, vn: Column, cl: CentLits): Column =
    zip_with(
      zip_with(cl.vecs, cl.norms, (cv, cn) => -(VF.dot(v, cv) / (vn * cn))),
      sequence(lit(0), lit(cl.n - 1)),
      (d, i) => struct(d.as("d"), i.as("i")))

  /** 0-based index of the nearest centroid — a pure projection (argmax as
   * `array_min` over (-cos, idx) structs, the same pattern `pqCodesExpr`
   * uses), replacing the r5 crossJoin+window which shuffled an
   * nCenters×corpus intermediate. Zero shuffle, codegen-friendly. */
  private def nearestIdx(v: Column, vn: Column, cl: CentLits): Column =
    array_min(negCosIdx(v, vn, cl)).getField("i")

  /** The `nProbe` nearest centroid indices in rank order (cos DESC, cid
   * ASC) — the probe-side list selection as a pure projection. */
  private def nearestIdxs(v: Column, vn: Column, cl: CentLits, nProbe: Int): Column =
    transform(slice(array_sort(negCosIdx(v, vn, cl)), 1, nProbe),
      s => s.getField("i"))

  /** `nearestIdx` with the vector norm computed once per row inside a
   * collapse-proof binding — for projections where the norm has no other
   * consumer (a bare column would be re-inlined into the lambda). */
  private def nearestIdxSelfNorm(v: Column, cl: CentLits): Column =
    bindOnce(VF.norm(v))(vn => nearestIdx(v, vn, cl))

  /** Mark a corpus-side join-key expression non-nullable. The list join
   * infers `isnotnull(centroid_id)` on its keys and pushes it BELOW the
   * encode projection, re-inlining the whole argmax(+codes) expression
   * into a Filter — every corpus row then pays the encode twice
   * (measured ~2x on the residual path). A coalesce against a literal is
   * nullable=false, so no null-check is inferred and the encode runs
   * once. The argmax can't actually be null (literal centroid table,
   * in-range index); the sentinel matches no probe list. */
  private def nonNullKey(e: Column): Column = coalesce(e, lit(-1L))

  /** Corpus rows with their nearest-centroid cluster id — the shared
   * "fit a bounded-sample k-means quantizer, assign every row by a pure
   * per-row argmax projection" primitive behind IVF list assignment and
   * semantic dedup (Dedup.semDedup). Returns (id, v, vn, centroid_id,
   * ccos) where v/vn are the double vector and its floored norm (so
   * callers scoring within-cluster cosines don't recompute them) and
   * ccos is the cosine to the assigned centroid (SemDeDup's
   * keep-farthest survivor rule orders on it) — both derived from ONE
   * argmin over the centroid table. None when the corpus is empty
   * (callers return an empty frame — the library's
   * return-empty-not-crash contract). One narrow scan, zero shuffle. */
  private[operators] def encodedAssignOpt(corpus: DataFrame, nCenters: Int,
                                          trainIters: Int, trainSample: Int,
                                          vecCol: String, idCol: String): Option[DataFrame] =
    centLitsOpt(corpus, nCenters, trainIters, trainSample, vecCol, idCol)
      .map { cl =>
        corpus
          .select(col(idCol).cast("long").as("id"), VF.toDouble(col(vecCol)).as("v"))
          .withColumn("vn", VF.norm(col("v")))
          .withColumn("best", array_min(negCosIdx(col("v"), col("vn"), cl)))
          .select(col("id"), col("v"), col("vn"),
            nonNullKey(element_at(cl.ids, col("best").getField("i") + 1))
              .as("centroid_id"),
            (-col("best").getField("d")).as("ccos"))
      }

  /** Inverted-list sizes of the IVF assignment (diagnostic: list balance
   * decides how much of the corpus a probe of nProbe lists actually
   * scans — skewed sampled centroids can make "nProbe/nCenters" a big
   * underestimate). One narrow scan + a 16-key aggregation.
   * Returns (centroid_id, n). */
  def ivfListSizes(corpus: DataFrame, nCenters: Int = 16,
                   vecCol: String = "embedding", idCol: String = "vec_id",
                   trainIters: Int = 0, trainSample: Int = 256): DataFrame =
    centLitsOpt(corpus, nCenters, trainIters, trainSample, vecCol, idCol) match {
      case None =>
        corpus.select(col(idCol).as("centroid_id"), lit(0L).as("n")).limit(0)
      case Some(cl) =>
        corpus.select(VF.toDouble(col(vecCol)).as("cv"))
          .select(element_at(cl.ids, nearestIdxSelfNorm(col("cv"), cl) + 1)
            .as("centroid_id"))
          .groupBy("centroid_id").agg(count(lit(1)).as("n"))
    }

  /**
   * IVF-flat top-k (the inverted-file scale path): a deterministic coarse
   * quantizer partitions the corpus into lists by nearest-centroid
   * cosine; a probe searches only its `nProbe` nearest lists. A probe
   * touches nProbe/nCenters of the corpus; recall < 1 for points assigned
   * away from the probe's lists — the standard IVF trade.
   * `trainIters > 0` trains the quantizer with `trainCentroids` (better
   * list balance); 0 uses the first `nCenters` corpus vectors directly.
   *
   * Plan shape: list assignment and probe-list selection are BOTH pure
   * projections over literal centroids; the only joins are broadcasts of
   * the tiny probe-list set, and the only Exchange is the per-probe rank
   * window. The corpus is scanned once and never shuffled (PlanAuditSpec
   * pins this).
   * Returns (probe_id, rank, neighbor_id, cosine).
   */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int = 10,
              nCenters: Int = 16, nProbe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id",
              probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec",
              trainIters: Int = 0, trainSample: Int = 256): DataFrame = {
    val clOpt = centLitsOpt(corpus, nCenters, trainIters, trainSample, vecCol, idCol)
    if (clOpt.isEmpty)
      return emptyTopK(corpus, probes, "cosine", idCol, probeIdCol)
    val cl = clOpt.get
    ivfProbeLists(ivfAssigned(corpus, cl, vecCol, idCol), cl, probes, k,
      nProbe, probeIdCol, probeVecCol)
  }

  /** The corpus half of the IVF index: every vector assigned to its
   * nearest trained centroid — (neighbor_id, cv, cn, centroid_id). */
  private def ivfAssigned(corpus: DataFrame, cl: CentLits, vecCol: String,
                          idCol: String): DataFrame =
    corpus
      .select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
      .withColumn("centroid_id",
        nonNullKey(element_at(cl.ids, nearestIdx(col("cv"), col("cn"), cl) + 1)))

  /** The probe half: each probe fans out to its nProbe nearest lists,
   * joins the assigned corpus on centroid_id, exact-ranks inside the
   * probed lists. */
  private def ivfProbeLists(assigned: DataFrame, cl: CentLits,
                            probes: DataFrame, k: Int, nProbe: Int,
                            probeIdCol: String,
                            probeVecCol: String): DataFrame = {
    val probeLists = probes
      .select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
      .select(col("probe_id"), col("pv"), col("pn"),
        explode(transform(nearestIdxs(col("pv"), col("pn"), cl, nProbe),
          i => element_at(cl.ids, i + 1))).as("centroid_id"))
    val wRank = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probeLists), Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", VF.dot(col("pv"), col("cv")) / (col("pn") * col("cn")))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /**
   * PUBLISH the IVF index: train-once centroids applied to the corpus,
   * yielding the (neighbor_id, cv, cn, centroid_id) table a serving
   * layer persists (parquet, ideally partitioned/sorted by centroid_id
   * so a probe's nProbe lists prune to their files). This is the
   * build-side artifact of streaming ANN serving: the index is built
   * ONCE, probes arrive forever.
   */
  def ivfIndex(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
               vecCol: String = "embedding",
               idCol: String = "vec_id"): DataFrame =
    ivfAssigned(corpus, centLits(cents), vecCol, idCol)

  /**
   * SERVE probes against a published [[ivfIndex]] — the query half of
   * ivfTopK with training factored out, so a probe STREAM is served
   * batch-by-batch against the static index (each probe's top-k needs
   * only its own row plus the index: stateless stream-static shape,
   * exact same rows as the batch path — the p73/p67 batch≡streaming
   * convention, proven by hash-matching p17's oracle).
   */
  def ivfProbe(index: DataFrame, cents: Seq[(Long, Seq[Double])],
               probes: DataFrame, k: Int = 10, nProbe: Int = 4,
               probeIdCol: String = "probe_id",
               probeVecCol: String = "probe_vec"): DataFrame =
    ivfProbeLists(index, centLits(cents), probes, k, nProbe,
      probeIdCol, probeVecCol)

  // ------------------------------------------------- product quantization

  /** Shared per-subspace k-means loop (used for both raw and residual
   * codebooks): init = first `nCodes` sample subvectors, fixed `iters`
   * iterations, L2 assignment with lowest-cid ties, id-ordered mean
   * folds, emptied clusters keep their centroid — no RNG,
   * bit-reproducible by a SQL oracle. */
  private def subspaceKMeans(sample: Array[(Long, Array[Double])], m: Int,
                             nCodes: Int, iters: Int, dim: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val dsub = dim / m
    require(sample.length >= nCodes, s"sample (${sample.length}) < nCodes ($nCodes)")
    def l2(a: Array[Double], b: Array[Double]): Double =
      (0 until dsub).foldLeft(0.0)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
    (0 until m).map { s =>
      val subs = sample.map { case (id, v) => (id, v.slice(s * dsub, (s + 1) * dsub)) }
      var cents: Array[(Long, Array[Double])] = subs.take(nCodes)
      for (_ <- 0 until iters) {
        val assigned = subs.map { case (id, v) =>
          var bestCid = -1L; var bestD = Double.PositiveInfinity
          cents.foreach { case (cid, cv) =>
            val d = l2(v, cv)
            if (d < bestD) { bestD = d; bestCid = cid }
          }
          (bestCid, id, v)
        }
        val byCent = assigned.groupBy(_._1)
        cents = cents.map { case (cid, old) =>
          byCent.get(cid) match {
            case Some(members) =>
              val inIdOrder = members.sortBy(_._2)
              val mean = Array.tabulate(dsub) { d =>
                inIdOrder.foldLeft(0.0)((acc, mm) => acc + mm._3(d)) / members.length
              }
              (cid, mean)
            case None => (cid, old)
          }
        }
      }
      cents.sortBy(_._1).map(_._2.toSeq).toSeq
    }
  }

  /**
   * Deterministic per-subspace codebook training for product quantization
   * (PQ — Jégou et al., "Product Quantization for Nearest Neighbor
   * Search", TPAMI 2011; public knowledge). The vector is split into `m`
   * subspaces of dim/m dims; each subspace gets an independent k-means
   * codebook of `nCodes` centroids trained by L2 on the same bounded
   * id-ordered sample discipline as `trainCentroids`.
   *
   * Choosing (m, nCodes) — the measured 64-dim-fixture frontier
   * (ScaleSmoke, raw ADC recall@10 at fixed bit budget m·log2(nCodes)):
   * 32 bits 0.18, 64 bits 0.38 (best geometry = the FAISS-standard
   * 8×256 — fewer, better-trained subspaces beat finer splits at equal
   * bits), 96 bits 0.48, 128 bits 0.57. An OPQ-style rotation (Ge et
   * al. 2013) is deliberately NOT layered in: it raises recall only by
   * exploiting covariance structure, and the uniform fixture is
   * rotation-invariant, so the honest levers here are bits and
   * `pqTopKReranked` (0.26 → 0.84 at 0.5% re-read). Train with
   * sampleN ≥ ~16·nCodes so every centroid sees enough sample mass.
   * Returns cb(s)(cid) = centroid subvector, positional by centroid id.
   */
  def trainPqCodebooks(corpus: DataFrame, m: Int = 8, nCodes: Int = 16,
                       sampleN: Int = 256, iters: Int = 2, dim: Int = 64,
                       vecCol: String = "embedding",
                       idCol: String = "vec_id"): Seq[Seq[Seq[Double]]] =
    subspaceKMeans(collectSample(corpus, sampleN, vecCol, idCol), m, nCodes,
      iters, dim)

  /**
   * Residual codebook training for IVF+PQ (classical FAISS IVFPQ
   * semantics, public knowledge): codebooks quantize the RESIDUAL
   * `v − centroid(v)` of each sample vector w.r.t. its nearest coarse
   * centroid (cosine assignment, lowest-cid ties — identical to the
   * per-row assignment expression), so codes spend their bits on the
   * within-list geometry instead of re-encoding the coarse position —
   * the standard-quality variant at scale.
   */
  def trainPqCodebooksResidual(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                               m: Int = 8, nCodes: Int = 16, sampleN: Int = 256,
                               iters: Int = 2, dim: Int = 64,
                               vecCol: String = "embedding",
                               idCol: String = "vec_id"): Seq[Seq[Seq[Double]]] = {
    val sorted = cents.sortBy(_._1).map { case (cid, cv) =>
      (cid, cv.toArray, vnrm(cv.toArray)) }
    val residuals = collectSample(corpus, sampleN, vecCol, idCol).map {
      case (id, v) =>
        val cv = sorted(assignDriver(v, sorted))._2
        (id, Array.tabulate(v.length)(i => v(i) - cv(i)))
    }
    subspaceKMeans(residuals, m, nCodes, iters, dim)
  }

  /** Ordered-fold squared L2 between two double-array columns —
   * bit-identical to the oracle's `[0.0] || list` reduce. */
  private def l2Col(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** The m PQ codes of vector column `v` as one array — per-subspace
   * (distance, index) struct-min: lowest distance, ties to the lowest
   * code. A pure projection; encoding is one narrow scan, no shuffle. */
  private def pqCodesExpr(cb: Seq[Seq[Seq[Double]]], dim: Int, v: Column): Column = {
    val m = cb.length
    val dsub = dim / m
    array((0 until m).map { s =>
      val sub = slice(v, s * dsub + 1, dsub)
      val dl = transform(typedLit(cb(s)), c => l2Col(sub, c))
      array_min(zip_with(dl, sequence(lit(0), lit(cb(s).length - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))).getField("i")
    }: _*)
  }

  /** Per-subspace ADC distance tables for probe vector column `v` (the
   * probe's subvector L2 against every codebook centroid). */
  private def adcTables(cb: Seq[Seq[Seq[Double]]], dim: Int, v: Column): Column = {
    val m = cb.length
    val dsub = dim / m
    array((0 until m).map { s =>
      transform(typedLit(cb(s)), c => l2Col(slice(v, s * dsub + 1, dsub), c))
    }: _*)
  }

  /** ADC distance = ORDERED fold of m table lookups over the row's codes
   * (never a multi-row SUM — FP order must match the oracle). */
  private def adcCol(m: Int): Column =
    aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(col("dt"), s + 1),
        element_at(col("codes"), s + 1) + 1))

  /**
   * PQ encode: each vector compresses to `m` small codes (the nearest
   * codebook centroid per subspace). The code table is m bytes/vector
   * (the 100 TB artifact: 64-dim float32 -> 8 codes is a 32x working-set
   * reduction). Returns (vec_id, codes array<int>).
   */
  def pqEncode(corpus: DataFrame, cb: Seq[Seq[Seq[Double]]], dim: Int = 64,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    corpus.select(col(idCol).as("vec_id"),
      pqCodesExpr(cb, dim, VF.toDouble(col(vecCol))).as("codes"))

  /**
   * PQ top-k via asymmetric distance computation (ADC): the probe builds
   * one tiny distance table per subspace (probe subvector vs every
   * centroid), and each corpus vector's approximate distance is an
   * ORDERED fold of m table lookups over its codes — no per-row vector
   * math on the corpus side and no cross-partition double summation, so
   * results are deterministic and oracle-comparable. Corpus scan cost =
   * the compressed code table; probes (with their tables) broadcast.
   * Guarantee: a probe identical to a corpus vector always finds it at
   * the ADC minimum (its codes minimize every per-subspace lookup).
   * Returns (probe_id, rank, neighbor_id, adc_dist), rank 1..k by
   * ascending approximate distance.
   */
  def pqTopK(corpus: DataFrame, probes: DataFrame, cb: Seq[Seq[Seq[Double]]],
             k: Int = 10, dim: Int = 64,
             vecCol: String = "embedding", idCol: String = "vec_id",
             probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val m = cb.length
    val codes = pqEncode(corpus, cb, dim, vecCol, idCol)
    val p = probes.select(col(probeIdCol).as("probe_id"),
      adcTables(cb, dim, VF.toDouble(col(probeVecCol))).as("dt"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    codes.withColumnRenamed("vec_id", "neighbor_id")
      .crossJoin(broadcast(p))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("adc", adcCol(m))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("adc"), 6).as("adc_dist"))
  }

  // ---------------------------------------------------- scalar quantization

  /**
   * SQ8 range training (FAISS ScalarQuantizer QT_8bit semantics, public
   * knowledge): per-dimension [min, max] over the bounded deterministic
   * sample. Min/max are exact comparisons — no FP arithmetic at all — so
   * an external oracle recomputes identical ranges from the same sample
   * rule. Returns (mins, maxs), each of length `dim`.
   */
  def trainSqRanges(corpus: DataFrame, sampleN: Int = 256, dim: Int = 64,
                    vecCol: String = "embedding",
                    idCol: String = "vec_id"): (Seq[Double], Seq[Double]) = {
    val sample = collectSample(corpus, sampleN, vecCol, idCol)
    require(sample.nonEmpty, "empty SQ training sample")
    (Seq.tabulate(dim)(d => sample.iterator.map(_._2(d)).min),
      Seq.tabulate(dim)(d => sample.iterator.map(_._2(d)).max))
  }

  /** 8-bit SQ codes of vector column `v`: per-dimension affine
   * quantization floor((x − min_d)·255/(max_d − min_d)) clamped to
   * [0, 255]; a degenerate dimension (max == min) codes 0. Pure
   * projection over literal ranges — one narrow scan, no shuffle. */
  private def sqCodesExpr(mins: Seq[Double], maxs: Seq[Double], v: Column): Column = {
    val mn = typedLit(mins)
    val mx = typedLit(maxs)
    transform(v, (x, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi > lo,
        least(greatest(floor((x - lo) * 255.0 / (hi - lo)), lit(0.0)), lit(255.0))
          .cast("long"))
        .otherwise(lit(0L))
    })
  }

  /** Dequantized vector from SQ codes: each code maps to its cell
   * center min_d + (c + 0.5)·(max_d − min_d)/255 (degenerate dimension
   * → min_d) — the asymmetric-distance convention: the probe stays
   * full-precision, only the corpus side pays quantization error. */
  private def sqDequantExpr(mins: Seq[Double], maxs: Seq[Double], codes: Column): Column = {
    val mn = typedLit(mins)
    val mx = typedLit(maxs)
    transform(codes, (c, i) => {
      val lo = element_at(mn, i + 1)
      val hi = element_at(mx, i + 1)
      when(hi > lo, lo + (c.cast("double") + 0.5) * (hi - lo) / 255.0)
        .otherwise(lo)
    })
  }

  /**
   * SQ8 top-k — the 4x-compression member of the quantized-ANN family
   * (PQ is 32x but loses per-dimension fidelity; SQ8 keeps every
   * dimension at byte precision, the standard first step before PQ at
   * scale). Codes are a pure projection over literal trained ranges;
   * scoring dequantizes on the fly and L2-ranks against the
   * full-precision probe (asymmetric distance). Plan shape = brute
   * force over a 4x-smaller working set: one corpus scan, broadcast
   * probes, the per-probe rank window is the only Exchange.
   * Returns (probe_id, rank, neighbor_id, sq_dist).
   */
  def sqTopK(corpus: DataFrame, probes: DataFrame,
             ranges: (Seq[Double], Seq[Double]), k: Int = 10,
             vecCol: String = "embedding", idCol: String = "vec_id",
             probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val (mins, maxs) = ranges
    val codes = corpus.select(col(idCol).as("neighbor_id"),
      sqCodesExpr(mins, maxs, VF.toDouble(col(vecCol))).as("codes"))
    val p = probes.select(col(probeIdCol).as("probe_id"),
      VF.toDouble(col(probeVecCol)).as("pv"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sq").asc, col("neighbor_id").asc)
    codes
      .withColumn("dq", sqDequantExpr(mins, maxs, col("codes")))
      .crossJoin(broadcast(p))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("sq", l2Col(col("pv"), col("dq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("sq"), 6).as("sq_dist"))
  }

  /**
   * IVF + SQ8 composition: the coarse quantizer's inverted lists
   * restrict WHICH vectors a probe scans (nProbe/nCenters of the
   * corpus), SQ8 codes compress WHAT is scanned (4x, per-dimension
   * byte fidelity) — the middle point between IVF-flat (full-precision
   * scan) and IVF+PQ (32x but coarser). List id and codes are computed
   * in ONE projection over the corpus scan (the r6 IVF+PQ discipline —
   * never two corpus scans joined on id); probe lists broadcast; the
   * per-probe rank window is the only Exchange.
   * Returns (probe_id, rank, neighbor_id, sq_dist).
   */
  def ivfSqTopK(corpus: DataFrame, probes: DataFrame,
                ranges: (Seq[Double], Seq[Double]), k: Int = 10,
                nCenters: Int = 16, nProbe: Int = 4,
                trainIters: Int = 2, trainSample: Int = 256,
                vecCol: String = "embedding", idCol: String = "vec_id",
                probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val (mins, maxs) = ranges
    val clOpt = centLitsOpt(corpus, nCenters, trainIters, trainSample, vecCol, idCol)
    if (clOpt.isEmpty)
      return emptyTopK(corpus, probes, "sq_dist", idCol, probeIdCol)
    val cl = clOpt.get
    val enc = corpus
      .select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
      .select(col("neighbor_id"),
        nonNullKey(element_at(cl.ids, nearestIdx(col("cv"), col("cn"), cl) + 1))
          .as("centroid_id"),
        sqCodesExpr(mins, maxs, col("cv")).as("codes"))
    val probeLists = probes
      .select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
      .select(col("probe_id"), col("pv"),
        explode(transform(nearestIdxs(col("pv"), col("pn"), cl, nProbe),
          i => element_at(cl.ids, i + 1))).as("centroid_id"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("sq").asc, col("neighbor_id").asc)
    enc.join(broadcast(probeLists), Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("dq", sqDequantExpr(mins, maxs, col("codes")))
      .withColumn("sq", l2Col(col("pv"), col("dq")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("sq"), 6).as("sq_dist"))
  }

  /**
   * IVF + PQ composition — the big-corpus serving shape: the coarse
   * quantizer's inverted lists restrict WHICH vectors a probe scans
   * (nProbe/nCenters of the corpus) and PQ codes compress WHAT is
   * scanned (m bytes each, ADC lookups) — together, a probe reads
   * ~nProbe/nCenters of an already-32x-compressed table. This is the
   * non-residual variant (codes quantize raw vectors, not v - centroid):
   * one probe distance-table set serves all lists, keeping the oracle
   * compositional; `ivfPqResidualTopK` is the classical refinement.
   *
   * Plan shape (r6): list id and codes are computed in ONE projection
   * over the corpus scan (the r5 form computed them as two corpus scans
   * joined on id — a corpus×corpus shuffle join), and the probe side
   * (lists + ADC tables) is a single broadcast. The only Exchange is the
   * per-probe rank window.
   * Returns (probe_id, rank, neighbor_id, adc_dist).
   */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, cb: Seq[Seq[Seq[Double]]],
                k: Int = 10, nCenters: Int = 16, nProbe: Int = 4,
                trainIters: Int = 2, trainSample: Int = 256, dim: Int = 64,
                vecCol: String = "embedding", idCol: String = "vec_id",
                probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val m = cb.length
    val clOpt = centLitsOpt(corpus, nCenters, trainIters, trainSample, vecCol, idCol)
    if (clOpt.isEmpty)
      return emptyTopK(corpus, probes, "adc_dist", idCol, probeIdCol)
    val cl = clOpt.get
    val enc = corpus
      .select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .select(col("neighbor_id"),
        nonNullKey(element_at(cl.ids, nearestIdxSelfNorm(col("cv"), cl) + 1))
          .as("centroid_id"),
        pqCodesExpr(cb, dim, col("cv")).as("codes"))
    val probeLists = probes
      .select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
      .select(col("probe_id"), adcTables(cb, dim, col("pv")).as("dt"),
        explode(transform(nearestIdxs(col("pv"), col("pn"), cl, nProbe),
          i => element_at(cl.ids, i + 1))).as("centroid_id"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    enc.join(broadcast(probeLists), Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("adc", adcCol(m))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("adc"), 6).as("adc_dist"))
  }

  /**
   * Residual IVF+PQ (classical FAISS IVFPQ, public semantics): corpus
   * codes quantize `v − centroid(v)` with residual-trained codebooks
   * (`trainPqCodebooksResidual`), and each (probe, probed list) gets its
   * OWN ADC table set computed from the probe's residual against that
   * list's centroid — ADC then approximates
   * ||p − (c + q(v−c))||² = l2(p−c, q(v−c)). Codes spend their bits on
   * within-list geometry, the standard quality win over the non-residual
   * variant at the same m.
   *
   * Plan shape: identical to `ivfPqTopK` — centroid id, residual and
   * codes are ONE projection over the corpus scan, with the argmax index
   * lambda-bound so it is evaluated once per row (see `bindOnce`); the
   * broadcast probe side carries nProbe table-sets per probe.
   * Returns (probe_id, rank, neighbor_id, adc_dist).
   */
  def ivfPqResidualTopK(corpus: DataFrame, probes: DataFrame,
                        cents: Seq[(Long, Seq[Double])], cb: Seq[Seq[Seq[Double]]],
                        k: Int = 10, nProbe: Int = 4, dim: Int = 64,
                        vecCol: String = "embedding", idCol: String = "vec_id",
                        probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val m = cb.length
    val cl = centLits(cents)
    // Bind the argmax index once per row (centroid id AND residual both
    // derive from it), then bind the RESIDUAL once too: pqCodesExpr
    // slices its input per subspace and compares each slice against
    // every codebook entry, so an unbound residual expression would be
    // re-inlined and recomputed m x nCodes times per row (measured 2.7x
    // slower in ScaleSmoke before the binding).
    val encRow = bindOnce(nearestIdxSelfNorm(col("cv"), cl))(idx =>
      struct(
        element_at(cl.ids, idx + 1).as("centroid_id"),
        bindOnce(zip_with(col("cv"), element_at(cl.vecs, idx + 1),
          (x, c) => x - c))(res => pqCodesExpr(cb, dim, res))
          .as("codes")))
    val enc = corpus
      .select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .select(col("neighbor_id"), encRow.as("er"))
      .select(col("neighbor_id"),
        nonNullKey(col("er.centroid_id")).as("centroid_id"),
        col("er.codes").as("codes"))
    val probeLists = probes
      .select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
      .select(col("probe_id"), col("pv"),
        explode(nearestIdxs(col("pv"), col("pn"), cl, nProbe)).as("cidx"))
      .select(col("probe_id"),
        element_at(cl.ids, col("cidx") + 1).as("centroid_id"),
        adcTables(cb, dim,
          zip_with(col("pv"), element_at(cl.vecs, col("cidx") + 1),
            (x, c) => x - c)).as("dt"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    enc.join(broadcast(probeLists), Seq("centroid_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("adc", adcCol(m))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("adc"), 6).as("adc_dist"))
  }

  /**
   * PQ retrieve + exact re-rank — the standard production PQ shape: ADC
   * over the compressed codes retrieves `rerank` candidates per probe
   * (the cheap 32x-compressed scan), then ONLY those candidates' full
   * vectors are fetched and exactly re-ranked by L2. Final quality =
   * ADC's recall@rerank (≫ its recall@k), at the cost of re-reading
   * `rerank` full vectors per probe instead of the whole corpus.
   * Returns (probe_id, rank, neighbor_id, l2_dist), rank 1..k.
   */
  def pqTopKReranked(corpus: DataFrame, probes: DataFrame,
                     cb: Seq[Seq[Seq[Double]]], k: Int = 10, rerank: Int = 100,
                     dim: Int = 64, vecCol: String = "embedding",
                     idCol: String = "vec_id", probeIdCol: String = "probe_id",
                     probeVecCol: String = "probe_vec"): DataFrame = {
    val cand = pqTopK(corpus, probes, cb, rerank, dim, vecCol, idCol,
      probeIdCol, probeVecCol).select("probe_id", "neighbor_id")
    val c = corpus.select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
    val p = probes.select(col(probeIdCol).as("probe_id"),
      VF.toDouble(col(probeVecCol)).as("pv"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("d").asc, col("neighbor_id").asc)
    cand.join(c, Seq("neighbor_id"))
      .join(broadcast(p), Seq("probe_id"))
      .withColumn("d", l2Col(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("d"), 6).as("l2_dist"))
  }

  /**
   * Sign-LSH bucketed top-k: probes only score candidates sharing a bucket
   * in at least one of `nTables` independent hyperplane tables.
   * Returns (probe_id, rank, neighbor_id, cosine) ranked within the
   * candidate set (rank 1..<=k; fewer when the buckets are sparse).
   */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int = 10,
              nPlanes: Int = 8, nTables: Int = 2, dim: Int = 64,
              vecCol: String = "embedding", idCol: String = "vec_id",
              probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
    val p = probes.select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))

    // Plane index offset per table makes the tables independent while
    // keeping every hyperplane deterministic.
    def buckets(v: Column) = array((0 until nTables).map { t =>
      struct(lit(t).as("table"),
        VF.lshBucket(v, nPlanes, dim, planeOffset = t * nPlanes).as("bucket"))
    }: _*)

    val cb = c.select(col("neighbor_id"), col("cv"), col("cn"),
      explode(buckets(col("cv"))).as("tb"))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("tb.table"), col("tb.bucket"))
    val pb = p.select(col("probe_id"), col("pv"), col("pn"),
      explode(buckets(col("pv"))).as("tb"))
      .select(col("probe_id"), col("pv"), col("pn"), col("tb.table"), col("tb.bucket"))

    val candidates = cb.join(broadcast(pb), Seq("table", "bucket"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "pv", "pn", "neighbor_id", "cv", "cn")
      .dropDuplicates("probe_id", "neighbor_id") // a pair may collide in several tables
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    candidates
      .withColumn("cosine", VF.dot(col("pv"), col("cv")) / (col("pn") * col("cn")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  // -------------------------------- random projection (sign JL, P82)

  /** The deterministic ±1 sign for output dim `j`, input dim `i` —
   * md5-derived so the oracle regenerates the identical matrix with
   * SQL alone: sign = +1 iff the first 8 hex chars of md5("j:i"),
   * read as an integer, are even. */
  def projSign(j: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$j:$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /**
   * Sign random projection (Achlioptas 2003 / JL with ±1 entries) —
   * the dimensionality-reduction step a 100 TB embedding pipeline runs
   * BEFORE SemDeDup / IVF training when the raw dimension makes the
   * quadratic-in-d steps dominate: project d-dim float vectors to
   * `outDim` doubles through a deterministic ±1 matrix. Angles are
   * approximately preserved (JL), so downstream cosine thresholds and
   * centroid assignments survive with tunable distortion.
   *
   * Scale shape: the matrix is outDim x d doubles — a driver-derived
   * LITERAL artifact (like the LM vocabularies), so projection is ONE
   * narrow codegen scan: per output dim a `zip_with` multiply and a
   * left-fold `aggregate` in a FIXED order (IEEE addition isn't
   * associative; the fixed fold makes every output bit-reproducible,
   * oracle-mirrored operation-for-operation). No shuffle, no join, no
   * UDF; output long-format (id, dim, proj) to stay pivot-free in
   * both engines.
   */
  def signProject(embs: DataFrame, outDim: Int = 8,
                  vecCol: String = "embedding", idCol: String = "vec_id")
      : DataFrame = {
    require(outDim >= 1, "outDim must be positive")
    // the matrix dimension comes from the DATA: max over the corpus (a
    // first-row peek read null/short vectors as the corpus dim and
    // silently null-projected every row — review-caught); rows whose
    // vector is null or of a different dimension are DROPPED like
    // imageDHashes drops undecodables — they have nothing to project
    projExprs(embs, outDim, vecCol) match {
      case None =>
        // empty corpus (or all-null vectors): nothing to derive a
        // matrix from — empty result, same schema (the
        // empty-partition-date robustness contract)
        embs.select(col(idCol), lit(0L).as("dim"),
          lit(0.0).as("proj")).limit(0)
      case Some((dim, projCols)) =>
        embs.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
          .select(col(idCol),
            posexplode(array(projCols: _*)).as(Seq("dim", "proj")))
          .withColumn("dim", col("dim").cast("long"))
    }
  }

  /** Shared core of the two projection surfaces: the data-derived
   * input dim (max over the corpus; None when nothing projects) and
   * one rounded dot-product expression per output dim. */
  private def projExprs(embs: DataFrame, outDim: Int, vecCol: String)
      : Option[(Int, Seq[Column])] = {
    val dimRow = embs.agg(max(size(col(vecCol)))).head()
    if (dimRow.isNullAt(0)) None
    else {
      val dim = dimRow.getInt(0)
      Some((dim, (0 until outDim).map { j =>
        val signs = array((0 until dim).map(i => lit(projSign(j, i))): _*)
        round(aggregate(
          zip_with(col(vecCol), signs, (x, s) => x.cast("double") * s),
          lit(0.0), (acc, v) => acc + v), 6)
      }))
    }
  }

  /**
   * `signProject` emitting the projected VECTOR per row (float array,
   * same column name as the input) — the shape the downstream
   * consumers (`Dedup.semDedup`, the IVF family) take directly, so
   * "reduce dims, then dedup/index" composes shuffle-free: the array
   * is built in the same narrow scan, no explode/pivot. The
   * long-format twin exists for the oracle; this one is the pipeline
   * surface.
   */
  def signProjectVec(embs: DataFrame, outDim: Int = 8,
                     vecCol: String = "embedding", idCol: String = "vec_id")
      : DataFrame =
    projExprs(embs, outDim, vecCol) match {
      case None =>
        embs.select(col(idCol), col(vecCol)).limit(0)
      case Some((dim, projCols)) =>
        embs.where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
          .select(col(idCol),
            array(projCols.map(_.cast("float")): _*).as(vecCol))
    }
}
