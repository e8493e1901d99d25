package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VectorFunctions => VF}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (SURVEY.md §2 P6-P7).
 *
 * Scale design:
 *  - `bruteForceTopK` broadcasts the (small) probe set against the corpus —
 *    the corpus is scanned once, never shuffled, and the per-probe top-k is
 *    a window over (probe, cosine). This is the exact baseline: at 100 TB
 *    it is one full scan per probe batch, which is the right cost model
 *    when probes are few and recall must be 1.0.
 *  - `lshTopK` is the scale path: both sides hash to sign-LSH buckets
 *    (deterministic hyperplanes, VectorFunctions.lshBucket) and only
 *    same-bucket candidates are scored. The corpus side can be
 *    pre-bucketed/bucketed-by-layout so a probe touches 1/2^nPlanes of the
 *    data. Recall < 1 for borderline neighbors — the classic IVF/LSH
 *    trade — and multi-table probing (`nTables`) recovers recall by
 *    unioning independent hyperplane sets.
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

  /**
   * Deterministic k-means training for the IVF coarse quantizer —
   * FAISS-style nlist/nprobe semantics (public knowledge): the quantizer
   * is trained on a bounded SAMPLE and the trained centroids are
   * broadcast, so training cost is independent of corpus size (the
   * 100 TB posture; the sample collect is O(sampleN * dim) driver bytes).
   *
   * Everything is fixed so an external SQL oracle reproduces the exact
   * doubles: sample = vectors with id < sampleN in id order; init = the
   * first `nCenters` of them (centroid_id = source vector id); `iters`
   * fixed iterations of { assign by cosine, lower-centroid-id tie-break;
   * centroid = element-wise mean folded in id order }; an emptied cluster
   * keeps its previous centroid. No RNG anywhere.
   */
  def trainCentroids(corpus: DataFrame, nCenters: Int, sampleN: Int = 256,
                     iters: Int = 2, vecCol: String = "embedding",
                     idCol: String = "vec_id"): Seq[(Long, Seq[Double])] = {
    val sample: Array[(Long, Array[Double])] = corpus
      .where(col(idCol) < sampleN)
      .select(col(idCol).cast("long"), VF.toDouble(col(vecCol)))
      .orderBy(col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    require(sample.length >= nCenters, s"sample (${sample.length}) < nCenters ($nCenters)")
    val dim = sample.head._2.length
    // left folds seeded at 0.0, index order — bit-identical to the oracle's
    // [0.0] || list ordered reduces (0.0 + x == x for IEEE doubles)
    def dot(a: Array[Double], b: Array[Double]): Double =
      (0 until dim).foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def nrm(a: Array[Double]): Double = math.sqrt(dot(a, a))

    var cents: Array[(Long, Array[Double])] = sample.take(nCenters)
    for (_ <- 0 until iters) {
      val withNorms = cents.map { case (cid, cv) => (cid, cv, nrm(cv)) }
      val assigned = sample.map { case (id, v) =>
        val vn = nrm(v)
        // strict > keeps the LOWEST centroid id on exact cosine ties,
        // mirroring ORDER BY cos DESC, cid ASC
        var bestCid = -1L; var bestCos = Double.NegativeInfinity
        withNorms.foreach { case (cid, cv, cn) =>
          val cos = dot(v, cv) / (vn * cn)
          if (cos > bestCos) { bestCos = cos; bestCid = cid }
        }
        (bestCid, id, v)
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

  /** Inverted-list sizes of the IVF assignment (diagnostic: list balance
   * decides how much of the corpus a probe of nProbe lists actually
   * scans — skewed sampled centroids can make "nProbe/nCenters" a big
   * underestimate). Returns (centroid_id, n). */
  def ivfListSizes(corpus: DataFrame, nCenters: Int = 16,
                   vecCol: String = "embedding", idCol: String = "vec_id",
                   trainIters: Int = 0, trainSample: Int = 256): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
    val cents =
      if (trainIters > 0) {
        val spark = corpus.sparkSession
        import spark.implicits._
        trainCentroids(corpus, nCenters, trainSample, trainIters, vecCol, idCol)
          .toDF("centroid_id", "centv")
          .withColumn("centn", VF.norm(col("centv")))
      } else corpus.where(col(idCol) < nCenters)
        .select(col(idCol).as("centroid_id"), VF.toDouble(col(vecCol)).as("centv"))
        .withColumn("centn", VF.norm(col("centv")))
    val wAssign = Window.partitionBy("neighbor_id")
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    c.crossJoin(broadcast(cents))
      .withColumn("ccos", VF.dot(col("cv"), col("centv")) / (col("cn") * col("centn")))
      .withColumn("arank", row_number().over(wAssign))
      .where(col("arank") === 1)
      .groupBy("centroid_id").agg(count(lit(1)).as("n"))
  }

  /**
   * IVF-flat top-k (the inverted-file scale path): a deterministic coarse
   * quantizer partitions the corpus into lists by nearest-centroid
   * cosine; a probe searches only its `nProbe` nearest lists. A probe
   * touches nProbe/nCenters of the corpus; recall < 1 for points assigned
   * away from the probe's lists — the standard IVF trade.
   * `trainIters > 0` trains the quantizer with `trainCentroids` (better
   * list balance); 0 uses the first `nCenters` corpus vectors directly
   * (the fully scan-free fallback).
   * Returns (probe_id, rank, neighbor_id, cosine).
   */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, k: Int = 10,
              nCenters: Int = 16, nProbe: Int = 4,
              vecCol: String = "embedding", idCol: String = "vec_id",
              probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec",
              trainIters: Int = 0, trainSample: Int = 256): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
    val p = probes.select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
    val cents =
      if (trainIters > 0) {
        val spark = corpus.sparkSession
        import spark.implicits._
        trainCentroids(corpus, nCenters, trainSample, trainIters, vecCol, idCol)
          .toDF("centroid_id", "centv")
          .withColumn("centn", VF.norm(col("centv")))
      } else corpus.where(col(idCol) < nCenters)
        .select(col(idCol).as("centroid_id"), VF.toDouble(col(vecCol)).as("centv"))
        .withColumn("centn", VF.norm(col("centv")))

    // corpus -> nearest centroid (ties to the lower centroid id)
    val wAssign = Window.partitionBy("neighbor_id")
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("ccos", VF.dot(col("cv"), col("centv")) / (col("cn") * col("centn")))
      .withColumn("arank", row_number().over(wAssign))
      .where(col("arank") === 1)
      .select("centroid_id", "neighbor_id", "cv", "cn")

    // probe -> nProbe nearest lists
    val wProbe = Window.partitionBy("probe_id")
      .orderBy(col("pcos").desc, col("centroid_id").asc)
    val probeLists = p.crossJoin(broadcast(cents))
      .withColumn("pcos", VF.dot(col("pv"), col("centv")) / (col("pn") * col("centn")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nProbe)
      .select("probe_id", "pv", "pn", "centroid_id")

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
   * Deterministic per-subspace codebook training for product quantization
   * (PQ — Jégou et al., "Product Quantization for Nearest Neighbor
   * Search", TPAMI 2011; public knowledge). The vector is split into `m`
   * subspaces of dim/m dims; each subspace gets an independent k-means
   * codebook of `nCodes` centroids trained by L2 on the same bounded
   * id-ordered sample discipline as `trainCentroids` (init = first
   * `nCodes` sample subvectors, fixed iterations, id-ordered mean folds,
   * strict-< assignment keeps the lowest centroid id, emptied clusters
   * keep their centroid — no RNG, bit-reproducible by a SQL oracle).
   * Returns cb(s)(cid) = centroid subvector, positional by centroid id.
   */
  def trainPqCodebooks(corpus: DataFrame, m: Int = 8, nCodes: Int = 16,
                       sampleN: Int = 256, iters: Int = 2, dim: Int = 64,
                       vecCol: String = "embedding",
                       idCol: String = "vec_id"): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"m ($m) must divide dim ($dim)")
    val dsub = dim / m
    val sample: Array[(Long, Array[Double])] = corpus
      .where(col(idCol) < sampleN)
      .select(col(idCol).cast("long"), VF.toDouble(col(vecCol)))
      .orderBy(col(idCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
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

  /** Ordered-fold squared L2 between two double-array columns —
   * bit-identical to the oracle's `[0.0] || list` reduce. */
  private def l2Col(a: org.apache.spark.sql.Column,
                    b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /**
   * PQ encode: each vector compresses to `m` small codes (the nearest
   * codebook centroid per subspace). Pure per-row expressions — ties to
   * the lowest code via struct-min — so encoding is one narrow scan, no
   * shuffle, and the code table is m bytes/vector (the 100 TB artifact:
   * 64-dim float32 -> 8 codes is a 32x working-set reduction).
   * Returns (vec_id, codes array<int>).
   */
  def pqEncode(corpus: DataFrame, cb: Seq[Seq[Seq[Double]]], dim: Int = 64,
               vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val m = cb.length
    val dsub = dim / m
    val codeCols = (0 until m).map { s =>
      val sub = slice(VF.toDouble(col(vecCol)), s * dsub + 1, dsub)
      val dl = transform(typedLit(cb(s)), c => l2Col(sub, c))
      // (distance, index) struct-min: lowest distance, ties to lowest code
      array_min(zip_with(dl, sequence(lit(0), lit(cb(s).length - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))).getField("i")
    }
    corpus.select(col(idCol).as("vec_id"), array(codeCols: _*).as("codes"))
  }

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
    val dsub = dim / m
    val codes = pqEncode(corpus, cb, dim, vecCol, idCol)
    val dtables = array((0 until m).map { s =>
      transform(typedLit(cb(s)),
        c => l2Col(slice(VF.toDouble(col(probeVecCol)), s * dsub + 1, dsub), c))
    }: _*)
    val p = probes.select(col(probeIdCol).as("probe_id"), dtables.as("dt"))
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(col("dt"), s + 1),
        element_at(col("codes"), s + 1) + 1))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    codes.withColumnRenamed("vec_id", "neighbor_id")
      .crossJoin(broadcast(p))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("adc", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("adc"), 6).as("adc_dist"))
  }

  /**
   * IVF + PQ composition — the big-corpus serving shape: the coarse
   * quantizer's inverted lists restrict WHICH vectors a probe scans
   * (nProbe/nCenters of the corpus) and PQ codes compress WHAT is
   * scanned (m bytes each, ADC lookups) — together, a probe reads
   * ~nProbe/nCenters of an already-32x-compressed table. This is the
   * non-residual variant (codes quantize raw vectors, not v - centroid):
   * one codebook serves all lists, keeping the oracle compositional;
   * residual encoding is the classical refinement and would add a
   * per-list probe distance table.
   * Returns (probe_id, rank, neighbor_id, adc_dist).
   */
  def ivfPqTopK(corpus: DataFrame, probes: DataFrame, cb: Seq[Seq[Seq[Double]]],
                k: Int = 10, nCenters: Int = 16, nProbe: Int = 4,
                trainIters: Int = 2, trainSample: Int = 256, dim: Int = 64,
                vecCol: String = "embedding", idCol: String = "vec_id",
                probeIdCol: String = "probe_id", probeVecCol: String = "probe_vec"): DataFrame = {
    val m = cb.length
    val dsub = dim / m
    val c = corpus.select(col(idCol).as("neighbor_id"), VF.toDouble(col(vecCol)).as("cv"))
      .withColumn("cn", VF.norm(col("cv")))
    val p = probes.select(col(probeIdCol).as("probe_id"), VF.toDouble(col(probeVecCol)).as("pv"))
      .withColumn("pn", VF.norm(col("pv")))
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = trainCentroids(corpus, nCenters, trainSample, trainIters, vecCol, idCol)
      .toDF("centroid_id", "centv")
      .withColumn("centn", VF.norm(col("centv")))

    val wAssign = Window.partitionBy("neighbor_id")
      .orderBy(col("ccos").desc, col("centroid_id").asc)
    val assigned = c.crossJoin(broadcast(cents))
      .withColumn("ccos", VF.dot(col("cv"), col("centv")) / (col("cn") * col("centn")))
      .withColumn("arank", row_number().over(wAssign))
      .where(col("arank") === 1)
      .select("centroid_id", "neighbor_id")

    val wProbe = Window.partitionBy("probe_id")
      .orderBy(col("pcos").desc, col("centroid_id").asc)
    val probeLists = p.crossJoin(broadcast(cents))
      .withColumn("pcos", VF.dot(col("pv"), col("centv")) / (col("pn") * col("centn")))
      .withColumn("prank", row_number().over(wProbe))
      .where(col("prank") <= nProbe)
      .select("probe_id", "centroid_id")

    val codes = pqEncode(corpus, cb, dim, vecCol, idCol)
      .withColumnRenamed("vec_id", "neighbor_id")
    val dtables = array((0 until m).map { s =>
      transform(typedLit(cb(s)),
        cc => l2Col(slice(VF.toDouble(col(probeVecCol)), s * dsub + 1, dsub), cc))
    }: _*)
    val pdt = probes.select(col(probeIdCol).as("probe_id"), dtables.as("dt"))
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, s) => acc + element_at(element_at(col("dt"), s + 1),
        element_at(col("codes"), s + 1) + 1))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    codes.join(assigned, Seq("neighbor_id"))
      .join(broadcast(probeLists), Seq("centroid_id"))
      .join(broadcast(pdt), Seq("probe_id"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("adc", adc)
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
    def buckets(v: org.apache.spark.sql.Column) = array((0 until nTables).map { t =>
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
}
