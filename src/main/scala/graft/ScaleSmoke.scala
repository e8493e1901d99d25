package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Bpe, Corpus, Dedup, TextAnalysis}

/**
 * Scale harness: replicates the corpus N-fold (each copy's near-dup
 * structure preserved, ids offset) and times the pairing operators, to
 * verify the join topologies scale like their analysis says (linear in
 * corpus + candidates, never quadratic). Run:
 *
 *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SCALE=20 sbt "runMain graft.ScaleSmoke"
 */
object ScaleSmoke {

  def replicate(docs: DataFrame, n: Int): DataFrame =
    docs.select(explode(sequence(lit(0), lit(n - 1))).as("copy"),
        col("doc_id"), col("text"))
      // perturb each copy's text with a distinct token so copies don't
      // collapse into one giant duplicate cluster
      .select((col("doc_id") * n + col("copy")).as("doc_id"),
        concat(col("text"), lit(" copytoken"), col("copy").cast("string")).as("text"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // deployment sizing shared with Bench (see comment there)
      .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_SECTIONS=docs,ann (default both) — re-measuring one
    // side after a change shouldn't pay the other's minutes.
    val sections = sys.env.getOrElse("SPARK_GRAFT_SECTIONS", "docs,ann")
      .split(",").map(_.trim).toSet

    // SPARK_GRAFT_OPS=<substring[,substring...]>: re-measure one row
    // after a change without paying the quadratic ground-truth twins
    // (same loop-tightener as Bench's SPARK_GRAFT_ONLY).
    val onlyOps = sys.env.get("SPARK_GRAFT_OPS")
      .map(_.split(",").map(_.trim).toSet)
    def time(name: String)(f: => Long): Unit = {
      if (!onlyOps.forall(_.exists(name.contains))) return
      val t0 = System.nanoTime()
      val rows = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s   $rows%9d rows")
    }

    if (sections.contains("docs")) {
    val docs = replicate(
      spark.read.parquet(s"$sfDir/documents.parquet"), n)
      .repartition(cpus.toInt).cache()
    val total = docs.count()
    println(s"corpus: $total docs (${n}x replication of $sfDir)")

    time("exact")(Dedup.exact(docs).count())
    time("jaccard(df-cutoff)")(
      Dedup.jaccardPairs(docs, n = 3, threshold = 0.8, maxShingleFreq = 1000).count())
    time("minhash-lsh")(
      Dedup.minhashLshPairs(docs, k = 16, bands = 4, minAgree = 8).count())
    time("simhash")(Dedup.simhashPairs(docs, maxHamming = 3).count())
    // The production ordering: LSH candidates + exact verification on
    // candidates only — compare directly against the raw jaccard row above
    // (same exactness guarantee per returned pair, candidate-bounded cost).
    time("lsh-verified jaccard")(
      Dedup.lshVerifiedPairs(docs, k = 16, bands = 4, threshold = 0.8).count())
    time("clusters") {
      Dedup.clusters(
        Dedup.jaccardPairs(docs, n = 3, threshold = 0.8, maxShingleFreq = 1000))
        .count()
    }
    // Same clustering fed by the production pair path: at scale the pair
    // derivation should be LSH-verified, not the raw inverted-index join.
    time("clusters(lsh-verified)") {
      Dedup.clusters(
        Dedup.lshVerifiedPairs(docs, k = 16, bands = 4, threshold = 0.8))
        .count()
    }

    // Corpus-construction operators at the replicated scale. Worst case
    // for stratified sampling is ONE dominant stratum (here ~99% of docs):
    // the hash-threshold prefilter must bound the rank window's input to
    // ~overSample x perStratum rows per stratum regardless of stratum
    // size, so the window never sees the full dominant stratum.
    val skewed = docs.select(col("doc_id"),
      when(col("doc_id") % 100 === 0,
        concat(lit("rare"), (col("doc_id") % 7).cast("string")))
        .otherwise(lit("dominant")).as("lang"))
    time("stratified skewed")(
      Corpus.stratifiedSample(skewed, "lang", perStratum = 1000).count())
    // token mixing under the same skew: the dominant stratum's budget is
    // reached from a hash-prefiltered sliver, never a full-stratum window
    val skewedText = docs.select(col("doc_id"), col("text"),
      when(col("doc_id") % 100 === 0, lit("rare")).otherwise(lit("dominant"))
        .as("lang"))
    time("token mixture skewed")(
      Corpus.tokenMixture(skewedText,
        Map("dominant" -> 0.7, "rare" -> 0.3), totalTokens = 500000L,
        strataCol = "lang").count())
    time("pack sequences")(
      Corpus.packSequences(docs, maxTokens = 2048, nShards = cpus.toInt * 4).count())
    time("dedup apply") {
      Corpus.dedupApply(docs,
        Dedup.clusters(
          Dedup.jaccardPairs(docs, n = 3, threshold = 0.8, maxShingleFreq = 1000)))
        .count()
    }
    // Sub-document curation at the replicated scale. Paragraph dedup's
    // worst case is exactly this corpus: replication makes every
    // paragraph ~n-fold duplicated, so nearly the whole exploded set
    // collapses into rank>1 rows of a few hash groups.
    time("c4 line filter")(
      TextAnalysis.lineFilter(docs).count())
    time("paragraph dedup")(
      Dedup.paragraphDedup(docs).count())
    time("gopher rules")(
      TextAnalysis.gopherRules(docs, stopwords = Seq("the", "a")).count())
    // Trained on a bounded sample once; encoding is the corpus-scan cost.
    val bpeMerges = Bpe.trainMerges(docs, numMerges = 64, sampleN = 64)
    time("bpe encode")(Bpe.stats(docs, bpeMerges).count())
    // Production merge-list scale: encode cost must be ~flat in the
    // merge count (the rank-heap path's lookup is O(1) per pair; the
    // replay twin would pay one pass per merge). The fixture vocabulary
    // exhausts real merges early, so the list is padded to 8k entries
    // with synthetic pairs — rank-map size is what's being stressed.
    val bigMerges = bpeMerges ++ (bpeMerges.size until 8192).map(i =>
      (s"pad$i", s"pad$i"))
    time("bpe encode 8k merges")(Bpe.stats(docs, bigMerges).count())
    // Worst case by construction: replication makes EVERY window of
    // every doc corpus-duplicated, so the join-back carries the full
    // exploded set (n_tokens x corpus rows of (id, hash) longs).
    time("dup spans")(
      Dedup.dupSpans(docs, w = 20).count())
    // Excision at the same worst case: with every window duplicated,
    // each doc's covered starts fold into ONE merged interval, so the
    // token filter is O(n) per doc — the merged-interval guarantee is
    // exactly what this corpus stresses.
    time("span dedup apply")(
      Dedup.spanDedupApply(docs, w = 20).count())
    // Continual refresh at scale: the batch is one replica (1/n of the
    // corpus), the curated corpus is the rest — the realistic shape
    // (big corpus, small increment). ids are doc_id*n+copy, so copy 0
    // is a full original corpus.
    val corpusPart = docs.where(col("doc_id") % n =!= 0)
    val batchPart = docs.where(col("doc_id") % n === 0)
    time("incremental exact")(
      Dedup.incrementalExact(corpusPart, batchPart).count())
    time("incremental near-dup")(
      Dedup.incrementalNearDup(corpusPart, batchPart).count())
    // The fused end-to-end chain: one scan + one dedup window at any
    // scale. The replicated corpus needs terminal punctuation to get
    // past the line filter (the raw generator text ends mid-air, so
    // every doc would be dropped at stage 1 and the downstream window
    // would go unmeasured); with it, replication still exercises the
    // dedup stage via the generator's own exact-dup docs.
    time("curation pipeline")(
      Corpus.curationPipeline(docs.withColumn("text",
        concat(col("text"), lit("."))), stopwords = Seq("the", "a")).count())
    time("bigram score")(
      TextAnalysis.bigramScore(docs).count())
    time("trigram score")(
      TextAnalysis.trigramScore(docs).count())
    // production-vocab point: the native hash-probe scorer's cost must
    // stay flat as V grows (the element_at literal-map twin is O(V) per
    // gram and was measured at 30 s for bigrams even at V=4096)
    time("bigram score 64k V")(
      TextAnalysis.bigramScore(docs, vocabSize = 65536).count())
    time("weighted sample")(
      Corpus.qualityWeightedSample(TextAnalysis.quality(docs), idCol = "id")
        .count())
    // stupid backoff at a production vocab: three trained tables + one
    // hash-probe scan — cost should track the trigram row, not 3×
    time("backoff score 64k V")(
      TextAnalysis.backoffScore(docs, vocabSize = 65536).count())
    // interpolated rung: same artifact bound; adds the bounded context
    // probes and the exact-rational lambda pass (driver-side, O(V))
    time("interp score 64k V")(
      TextAnalysis.interpolatedScore(docs, vocabSize = 65536).count())
    // Bloom frontier vs the exact join: same split, corpus never
    // shuffled at all (the distinct() exchange disappears)
    time("incremental bloom")(
      Dedup.incrementalExactBloom(corpusPart, batchPart).count())
    // DSIR: training pass (bounded bucket groupBy) + shuffle-free
    // scoring scan — linear in the corpus whatever the replication
    time("dsir sample")(
      Corpus.dsirSample(docs.withColumn("lang",
          when(col("doc_id") % 3 === 0, lit("en")).otherwise(lit("zz"))),
        isTarget = col("lang") === "en").count())
    // tf-idf: two uniform groupBys + the term join + per-doc top-k; the
    // zipfian term head is the stress (every copy shares the vocabulary)
    time("tfidf keywords")(
      TextAnalysis.tfidfKeywords(docs, k = 5).count())
    // percentile cut: histogram job + a fused filter scan
    time("quality percentile")(
      Corpus.qualityPercentileFilter(TextAnalysis.quality(docs),
        keepFrac = 0.5).count())
    // sketches: the corpus ships only (bucket, rho) / (row, col) pairs
    // into bounded aggregations — the scale path exact counting can't take
    val shingles = docs.select(explode(
      graft.functions.TextFunctions.shingles(
        graft.functions.TextFunctions.tokens(col("text")), 3)).as("v"))
    time("hll distinct sketch")(
      operators.Sketches.hllDistinct(shingles, "v").count())
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("v"))
    time("cms build+estimate")(
      operators.Sketches.cmsEstimate(operators.Sketches.cmsBuild(toks, "v"),
        toks.distinct(), "v").count())
    time("shard manifest")(Corpus.shardManifest(docs, nShards = 64).count())
    }

    if (sections.contains("ann")) {
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bigEmbs = embs.select(explode(sequence(lit(0), lit(n - 1))).as("copy"),
        col("vec_id"), col("embedding"))
      .select((col("vec_id") * n + col("copy")).as("vec_id"), col("embedding"))
      .repartition(cpus.toInt).cache()
    println(s"embeddings: ${bigEmbs.count()} vectors")
    val probes = embs.limit(5)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    time("ann brute-force")(Ann.bruteForceTopK(bigEmbs, probes, k = 10).count())
    time("ann lsh")(Ann.lshTopK(bigEmbs, probes, k = 10, nTables = 2).count())
    time("ann ivf")(Ann.ivfTopK(bigEmbs, probes, k = 10, nCenters = 64,
      nProbe = 8).count())
    time("ann ivf trained")(Ann.ivfTopK(bigEmbs, probes, k = 10, nCenters = 64,
      nProbe = 8, trainIters = 2, trainSample = 1024).count())
    val pqCb = Ann.trainPqCodebooks(bigEmbs, m = 8, nCodes = 16,
      sampleN = 1024, iters = 2)
    time("ann pq adc")(Ann.pqTopK(bigEmbs, probes, pqCb, k = 10).count())
    time("ann ivf+pq")(Ann.ivfPqTopK(bigEmbs, probes, pqCb, k = 10,
      nCenters = 64, nProbe = 8, trainIters = 2, trainSample = 1024).count())
    val coarseBig = Ann.trainCentroids(bigEmbs, nCenters = 64, sampleN = 1024,
      iters = 2)
    val pqCbRes = Ann.trainPqCodebooksResidual(bigEmbs, coarseBig, m = 8,
      nCodes = 16, sampleN = 1024, iters = 2)
    time("ann ivf+pq residual")(Ann.ivfPqResidualTopK(bigEmbs, probes,
      coarseBig, pqCbRes, k = 10, nProbe = 8).count())
    // Replication worst case for SemDeDup: every vector has n-1 exact
    // copies in its cluster, so the within-cluster pair join carries
    // maximal above-threshold pairs. k scales with the corpus (the
    // paper's N/2000 rule) to bound per-cluster membership.
    time("semdedup")(Dedup.semDedup(bigEmbs, threshold = 0.4,
      nCenters = 64, trainIters = 2, trainSample = 1024).count())
    // The paper's own operating point: k = N/2000, so mean cluster size
    // stays ~2000 as the corpus grows — plus the rank-window pair cap
    // that bounds the worst CLUSTER (a dense mode) at O(m·w): the
    // quantizer shapes sizes, the cap bounds them.
    val paperK = math.max(16, (bigEmbs.count() / 2000L).toInt)
    time(s"semdedup paper-k=$paperK capped")(
      Dedup.semDedup(bigEmbs, threshold = 0.4, nCenters = paperK,
        trainIters = 2, trainSample = math.max(1024, paperK * 8),
        pairRankWindow = Some(64)).count())
    // The p82 payoff: project 64d -> 8d in the same narrow scan, then
    // run the SAME SemDeDup on 1/8th the vector bytes — every
    // downstream shuffle (train sample, per-cluster pair join) ships
    // 8 floats instead of 64.
    time("project to 8d")(
      Ann.signProjectVec(bigEmbs, outDim = 8).count())
    val proj8 = Ann.signProjectVec(bigEmbs, outDim = 8)
    time("semdedup on 8d projection")(
      Dedup.semDedup(proj8, threshold = 0.4,
        nCenters = 64, trainIters = 2, trainSample = 1024).count())
    // Cluster-balanced sampling at the same paper-k: assignment is the
    // zero-shuffle argmax; the rank window only sees the prefiltered
    // ~overSample*perCluster sliver per cluster
    time(s"cluster-balanced k=$paperK")(
      Corpus.clusterBalancedSample(bigEmbs, perCluster = 100,
        nClusters = paperK, trainIters = 2,
        trainSample = math.max(1024, paperK * 8)).count())

    // Recall@10 of each approximate path vs exact brute force — the
    // quality side of the speed/recall trade. Measured on the
    // UN-replicated corpus: on the replicated one every probe's true
    // top-10 are its exact copies, which any bucketing finds (recall
    // trivially 1.0).
    val baseEmbs = embs.cache()
    val exact = Ann.bruteForceTopK(baseEmbs, probes, k = 10)
      .select("probe_id", "neighbor_id").cache()
    val nExact = exact.count().toDouble
    def recall(df: DataFrame): Double =
      df.select("probe_id", "neighbor_id").intersect(exact).count() / nExact
    val rLsh = recall(Ann.lshTopK(baseEmbs, probes, k = 10, nTables = 2))
    val rLsh4 = recall(Ann.lshTopK(baseEmbs, probes, k = 10, nTables = 4))
    val rIvf = recall(Ann.ivfTopK(baseEmbs, probes, k = 10, nCenters = 64, nProbe = 8))
    val rTrained = recall(Ann.ivfTopK(baseEmbs, probes, k = 10, nCenters = 64,
      nProbe = 8, trainIters = 2, trainSample = 1024))
    println(f"recall@10 vs exact (unreplicated): lsh2t=$rLsh%.3f lsh4t=$rLsh4%.3f " +
      f"ivf=$rIvf%.3f ivf-trained=$rTrained%.3f")
    // PQ ranks by (squared) L2, so its recall baseline is the exact-L2
    // top-10, not the cosine one the bucketing paths use.
    val dbl = (c: String) => transform(col(c), x => x.cast("double"))
    val pEmb = embs.where(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), dbl("embedding").as("pv"))
    val cEmb = baseEmbs.select(col("vec_id").as("neighbor_id"), dbl("embedding").as("cv"))
    val wL2 = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("d").asc, col("neighbor_id").asc)
    val exactL2 = cEmb.crossJoin(broadcast(pEmb))
      .where(col("probe_id") =!= col("neighbor_id"))
      .withColumn("d", aggregate(zip_with(col("pv"), col("cv"),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
      .withColumn("rk", row_number().over(wL2))
      .where(col("rk") <= 10).select("probe_id", "neighbor_id").cache()
    val nL2 = exactL2.count().toDouble
    val cbBase = Ann.trainPqCodebooks(baseEmbs, m = 8, nCodes = 16,
      sampleN = 1024, iters = 2)
    val rPq = Ann.pqTopK(baseEmbs, probes, cbBase, k = 10)
      .select("probe_id", "neighbor_id").intersect(exactL2).count() / nL2
    val rPqRr = Ann.pqTopKReranked(baseEmbs, probes, cbBase, k = 10, rerank = 200)
      .select("probe_id", "neighbor_id").intersect(exactL2).count() / nL2
    println(f"pq recall@10 vs exact-L2 (unreplicated, 32x compression): " +
      f"adc=$rPq%.3f adc+rerank200=$rPqRr%.3f")
    // Raw-ADC recall frontier at fixed bit budgets (50 probes for stable
    // numbers; 500 ground-truth pairs). The isotropic fixture is PQ's
    // worst case — i.i.d. uniform dims have no covariance structure, so
    // an OPQ-style rotation is provably a no-op (the distribution is
    // rotation-invariant) and the only levers are subspace geometry and
    // bits. Measured wall: the best TRUE-64-bit (32x) geometry is the
    // FAISS-standard PQ8x8 at ~0.38 raw; >=0.5 raw needs ~128 bits
    // (16x). On real (anisotropic) embeddings the same machinery lands
    // higher; on this fixture the production answer at 32x remains
    // ADC + re-rank (0.84 at 0.5% re-read).
    locally {
      val np = 50
      val pEmbF = embs.where(col("vec_id") < np)
        .select(col("vec_id").as("probe_id"), dbl("embedding").as("pv"))
      val probesF = embs.where(col("vec_id") < np)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
      val exactF = cEmb.crossJoin(broadcast(pEmbF))
        .where(col("probe_id") =!= col("neighbor_id"))
        .withColumn("d", aggregate(zip_with(col("pv"), col("cv"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
        .withColumn("rk", row_number().over(wL2))
        .where(col("rk") <= 10).select("probe_id", "neighbor_id").cache()
      val nF = exactF.count().toDouble
      for ((m, nc) <- Seq((8, 16), (8, 256), (16, 64), (16, 256))) {
        val cb = Ann.trainPqCodebooks(baseEmbs, m = m, nCodes = nc,
          sampleN = 4096, iters = 3)
        val r = Ann.pqTopK(baseEmbs, probesF, cb, k = 10)
          .select("probe_id", "neighbor_id").intersect(exactF).count() / nF
        val bits = (m * math.log(nc) / math.log(2)).round
        println(f"pq frontier m=$m%2d nCodes=$nc%3d bits=$bits%3d " +
          f"(${256.0 * 8 / bits}%.0fx): raw recall@10=$r%.3f")
      }
      exactF.unpersist()
    }
    val sqRng = Ann.trainSqRanges(bigEmbs, sampleN = 1024)
    time("ann sq8")(Ann.sqTopK(bigEmbs, probes, sqRng, k = 10).count())
    val rSq = Ann.sqTopK(baseEmbs, probes, sqRng, k = 10)
      .select("probe_id", "neighbor_id").intersect(exactL2).count() / nL2
    println(f"sq8 recall@10 vs exact-L2 (unreplicated, 4x compression): $rSq%.3f")
    time("ann ivf+sq")(Ann.ivfSqTopK(bigEmbs, probes, sqRng, k = 10,
      nCenters = 64, nProbe = 8, trainIters = 2, trainSample = 1024).count())
    // Residual vs non-residual IVFPQ at identical settings (same coarse
    // quantizer, same m/nCodes, same nProbe): both scan the same lists,
    // so the recall difference isolates what residual encoding buys —
    // codes spending their bits on within-list geometry.
    val coarseBase = Ann.trainCentroids(baseEmbs, nCenters = 64,
      sampleN = 1024, iters = 2)
    val cbResBase = Ann.trainPqCodebooksResidual(baseEmbs, coarseBase, m = 8,
      nCodes = 16, sampleN = 1024, iters = 2)
    val rIvfPq = Ann.ivfPqTopK(baseEmbs, probes, cbBase, k = 10, nCenters = 64,
      nProbe = 8, trainIters = 2, trainSample = 1024)
      .select("probe_id", "neighbor_id").intersect(exactL2).count() / nL2
    val rIvfPqRes = Ann.ivfPqResidualTopK(baseEmbs, probes, coarseBase,
      cbResBase, k = 10, nProbe = 8)
      .select("probe_id", "neighbor_id").intersect(exactL2).count() / nL2
    println(f"ivfpq recall@10 vs exact-L2 (unreplicated): " +
      f"nonres=$rIvfPq%.3f residual=$rIvfPqRes%.3f")
    // List balance explains the ivf-vs-trained recall gap: skewed sampled
    // lists make a probe scan far more than nProbe/nCenters of the corpus.
    def balance(trainIters: Int): (Long, Double) = {
      val sizes = Ann.ivfListSizes(baseEmbs, nCenters = 64,
        trainIters = trainIters, trainSample = 1024)
        .agg(max("n"), avg("n")).collect()(0)
      (sizes.getLong(0), sizes.getDouble(1))
    }
    val (maxS, meanS) = balance(0)
    val (maxT, meanT) = balance(2)
    println(f"ivf list balance (max/mean): sampled=${maxS / meanS}%.1f " +
      f"trained=${maxT / meanT}%.1f")
    time("embed pairs bucketed")(
      Dedup.embeddingPairs(bigEmbs, threshold = 0.4, bucketed = true).count())
    time("embed pairs 4-table")(
      Dedup.embeddingPairs(bigEmbs, threshold = 0.4, bucketed = true,
        nTables = 4).count())
    }

    // Crossover sweep for the serving fast path: at what pinned-id-set
    // size does the driver-built literal probe (SetProbe/MapProbe scan
    // filter, zero join) lose to the broadcast hash join? The literal
    // path's cost grows with probe-set build + task serialization (the
    // whole set ships inside the task binary, on every call); the join
    // path pays a fixed broadcast-build job but streams the id set as
    // DATA. DefaultMaxLiteralIds (64k) is the claimed crossover — this
    // sweep is its measurement. Sizes straddle the threshold; each row
    // is (forced-literal, forced-join) on identical inputs, min of 2
    // runs to shed scheduling noise.
    if (sections.contains("lookup")) {
      val ont = graft.model.GraftOntology.ontology
      Fixture.ensureStore(spark, sfDir)
      val g = Fixture.graph(spark, sfDir)
      g.nodes.count(); g.edges.count(); g.reverseEdges.count()
      def timed2(f: => Long): (Double, Long) = {
        val r = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        (r.map(_._1).min, r.head._2)
      }
      for (sz <- Seq(4096, 16384, 65536, 131072, 262144)) {
        val ids = (1 to sz).map("CUST:" + _)
        val qg = operators.QueryGraph.oneHop(
          operators.QNode("n0", ids = ids),
          operators.QNode("n1"),
          operators.QEdge("n0", "n1"))
        def hop(maxLit: Int): Long =
          operators.OneHop.answer(spark, g, ont, qg, closure = None,
            expandSubclasses = false, maxLiteralIds = maxLit).matches.count()
        val (tLit, rows) = timed2(hop(Int.MaxValue))
        val (tJoin, _) = timed2(hop(0))
        println(f"onehop ids=$sz%7d   literal ${tLit}%6.2f s   " +
          f"join ${tJoin}%6.2f s   $rows%9d rows")
        val pairs = (1 to sz).map(i => (s"CUST:$i", s"NAT:${i % 25}"))
        def edges(maxLit: Int): Long =
          operators.GraphOps.getEdges(spark, g, pairs, maxLiteralPairs = maxLit)
            .count()
        val (teLit, erows) = timed2(edges(Int.MaxValue))
        val (teJoin, _) = timed2(edges(0))
        println(f"edges  pairs=$sz%6d   literal ${teLit}%6.2f s   " +
          f"join ${teJoin}%6.2f s   $erows%9d rows")
      }
    }

    // Web-curation ops (r13): URL dedup and domain cap over the
    // replicated corpus with synthesized messy URLs — the canonical-
    // ization regexp chain runs inside the scan, so the measurement is
    // dominated by the aggregation (url dedup: one exchange + partial
    // combine) and the WindowGroupLimit-pruned rank (domain cap).
    if (sections.contains("web")) {
      val docs = replicate(
        spark.read.parquet(s"$sfDir/documents.parquet"), n)
      val urls = docs
        .withColumn("n_chars", length(col("text")))
        .withColumn("grp", expr("doc_id DIV 3"))
        .withColumn("h", pmod(col("grp"), lit(5000)))
        .withColumn("url", concat(lit("https://"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("www.")).otherwise(lit("blog.")),
          lit("Example-"), col("h"),
          when(pmod(col("h"), lit(4)) === 0, lit(".co.uk")).otherwise(lit(".com")),
          lit("/Pg/"), col("grp"),
          lit("/?b=2&a=1&utm_source=s"), col("doc_id")))
        .select(col("doc_id"), col("n_chars"), col("url"))
      time("url dedup")(operators.UrlOps.urlDedup(urls).count())
      time("domain cap k=100")(
        operators.UrlOps.domainCap(urls, k = 100).count())
      // boilerplate: every doc of a domain shares a planted header and
      // footer (worst case: the template set is 2 lines x 5000 domains)
      val withDomain = docs
        .withColumn("domain", concat(lit("d"), pmod(col("doc_id"), lit(5000))))
        .withColumn("text", concat(lit("HEADER "), col("domain"), lit("\n"),
          col("text"), lit("\nFOOTER "), col("domain")))
      time("boilerplate remove")(
        operators.TextAnalysis.boilerplateRemove(withDomain, "domain").count())
      // WARC round-trip at corpus scale: executor-side segment write,
      // one parse task per .warc.gz file (the Common Crawl shape)
      val warcDir = java.nio.file.Files.createTempDirectory("graft-warc-smoke").toString
      time("warc export")(
        { sources.WarcSource.export(docs, warcDir, docsPerFile = 2000); 0L })
      time("warc ingest")(
        sources.WarcSource.records(spark, warcDir)
          .where(col("warc_type") === "response").count())
      // CDX index over the same segments: field derivation rides the
      // parse tasks; the urlkey range-sort is the only exchange
      time("cdx index")(
        sources.WarcSource.cdxIndex(sources.WarcSource.records(spark, warcDir))
          .orderBy("urlkey").count())
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warcDir))
      // HTML extraction + link graph at corpus scale: each doc becomes
      // a page with chrome, entities, and two hrefs (one root-relative)
      val pages = docs
        .withColumn("url", concat(lit("https://www.Example-"),
          pmod(col("doc_id"), lit(5000)), lit(".com/Pg/"), col("doc_id"),
          lit("/?b=2&a=1")))
        .withColumn("html", concat(
          lit("<html><head><title>Doc "), col("doc_id"),
          lit("</title><script>var x=\"<p>no</p>\";</script></head>"),
          lit("<body><h1>Doc "), col("doc_id"), lit("</h1><p>"), col("text"),
          lit("</p><p>Visit &amp; enjoy &lt;deals&gt;&nbsp;now.</p>"),
          lit("<div><a href=\"https://Example-"),
          pmod(col("doc_id") + 1, lit(5000)), lit(".com/Pg/"),
          col("doc_id") + 1, lit("?b=2&a=1&utm_source=x\">n</a> <a href='/Pg/"),
          col("doc_id") * 7 + 3, lit("'>r</a></div></body></html>")))
      // the length-sum filter defeats column pruning so the whole
      // extraction chain genuinely runs per page
      time("html extract")(
        pages.select(operators.Html.htmlToText(col("html")).as("t"))
          .where(length(col("t")) >= 0).count())
      time("link graph")(operators.Html.linkGraph(pages).count())
      // SFT rendering: span arithmetic per turn, explode, no shuffle
      val convs = docs.select(col("doc_id"), array(
        struct(lit("system").as("role"),
          lit("You are a helpful assistant.").as("content")),
        struct(lit("user").as("role"),
          substring(col("text"), 1, 200).as("content")),
        struct(lit("assistant").as("role"),
          substring(col("text"), 201, 400).as("content"))).as("turns"))
      time("sft render")(
        operators.Corpus.sftRender(convs, idCol = "doc_id")
          .agg(sum(col("span_end"))).count())
      // PageRank at a 100k-node graph: quadratic-residue edges give
      // non-uniform degrees; the loop is 10 joins + 10 aggregations
      // with per-round localCheckpoint lineage truncation
      val prEdges = docs.select(
        pmod(col("doc_id"), lit(100000)).as("src"),
        pmod(col("doc_id") * col("doc_id") + 1, lit(100000)).as("dst"))
        .where(col("src") =!= col("dst")).distinct()
      time("pagerank 10 iters")(
        operators.Html.pageRank(prEdges, iterations = 10)
          .agg(sum(col("rank"))).count())
      // robots filtering at 5000 hosts x ~3 rules: one host-equi
      // anti-join with the startsWith residual
      val robots = docs.select(pmod(col("doc_id"), lit(5000)).as("h"))
        .distinct()
        .select(concat(lit("example-"), col("h"), lit(".com")).as("host"),
          concat(lit("User-agent: *\nDisallow: /private\nDisallow: /Pg/"),
            col("h"), lit("\nDisallow: /tmp\n")).as("body"))
      val docsWithUrls = docs.withColumn("url",
        concat(lit("https://www.Example-"), pmod(col("doc_id"), lit(5000)),
          lit(".com/Pg/"), col("doc_id"), lit("/?b=2&a=1")))
      time("robots filter")(
        operators.UrlOps.robotsFilter(docsWithUrls, robots).count())
      // main-content extraction over the same chrome-bearing pages:
      // block split + density lambdas, one codegen'd projection
      time("main content")(
        operators.Html.mainContent(pages)
          .where(length(col("main_text")) >= 0)
          .agg(sum(col("n_kept"))).count())
      // PDF generate + extract at corpus scale: per-row deflate-encode
      // and inflate-decode CPU inside mapPartitions, zero shuffle
      locally {
        import spark.implicits._
        val pdfs = docs.select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, t) =>
            (id, operators.Pdf.fixturePdf(id, t)) })
          .toDF("id", "payload")
        time("pdf extract")(
          operators.Pdf.extractTexts(pdfs)
            .agg(sum(col("n_chars"))).count())
      }
      // frontier scheduling over ~1M sitemap-discovered urls: one
      // window per host (the politeness domain), 5000 hosts
      val entries = docs.select(
        lit("urlset").as("kind"),
        concat(lit("https://example-"), pmod(col("doc_id"), lit(5000)),
          lit(".com/page/"), col("doc_id")).as("loc"),
        when(pmod(col("doc_id"), lit(2)) === 0, lit("2024-01-05"))
          .otherwise(lit(null: String)).as("lastmod"),
        when(pmod(col("doc_id"), lit(3)) === 0, lit("0.8"))
          .otherwise(lit(null: String)).as("priority"))
      time("frontier schedule")(
        operators.UrlOps.frontierSchedule(entries, perRound = 8)
          .agg(sum(col("fetch_round"))).count())
    }

    // Batched lookup amortization (r12 verdict #2): k mixed point probes
    // answered as ONE answerBatch job vs k sequential answer() jobs.
    // Each sequential call pays the full per-job scheduling floor
    // (~110 ms measured idle), so the sequential line grows as k x floor
    // while the batch line stays one job of constant plan size — the
    // target is batch <= a few single-call latencies at k=100.
    if (sections.contains("batch")) {
      val ont = graft.model.GraftOntology.ontology
      Fixture.ensureStore(spark, sfDir)
      val g = Fixture.graph(spark, sfDir)
      g.nodes.count(); g.edges.count(); g.reverseEdges.count()
      import operators.{OneHop, QueryGraph, QNode, QEdge}
      val O = graft.model.GraftOntology
      def mixedProbes(k: Int): Seq[(String, QueryGraph)] =
        (0 until k).map { i =>
          val qg = i % 4 match {
            case 0 => QueryGraph.oneHop( // forward pinned -> category
              QNode("n0", ids = (1 to 3).map(j => s"CUST:${i * 13 + j}")),
              QNode("n1", categories = Seq(O.Nation)),
              QEdge("n0", "n1", predicates = Seq(O.LocatedIn)))
            case 1 => QueryGraph.oneHop( // reverse pinned <- category
              QNode("n_out", categories = Seq(O.Customer)),
              QNode("n_in", ids = Seq(s"NAT:${i % 25}")),
              QEdge("n_out", "n_in", predicates = Seq(O.LocatedIn)))
            case 2 => QueryGraph.oneHop( // doubly pinned
              QNode("n0", ids = Seq(s"NAT:${i % 25}")),
              QNode("n1", ids = Seq(s"REG:${i % 5}")),
              QEdge("n0", "n1", predicates = Seq(O.PartOf)))
            case _ => QueryGraph.oneHop( // symmetric, open output
              QNode("n0", ids = Seq(s"NAT:${i % 25}")),
              QNode("n1"),
              QEdge("n0", "n1", predicates = Seq(O.AdjacentTo)))
          }
          s"q$i" -> qg
        }
      // warm both paths' code once so JIT/codegen novelty isn't timed
      OneHop.answerBatch(spark, g, ont, mixedProbes(4)).count()
      OneHop.answer(spark, g, ont, mixedProbes(1).head._2,
        closure = None, expandSubclasses = false).matches.count()
      for (k <- Seq(10, 100, 500)) {
        val probes = mixedProbes(k)
        val t0 = System.nanoTime()
        val batchRows = OneHop.answerBatch(spark, g, ont, probes).count()
        val tBatch = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        var seqRows = 0L
        probes.foreach { case (_, qg) =>
          seqRows += OneHop.answer(spark, g, ont, qg,
            closure = None, expandSubclasses = false).matches.count()
        }
        val tSeq = (System.nanoTime() - t1) / 1e9
        println(f"batch k=$k%4d   one-job ${tBatch}%6.2f s   " +
          f"sequential ${tSeq}%7.2f s (${tSeq / k}%5.3f s/call)   " +
          f"speedup ${tSeq / tBatch}%5.1fx   $batchRows%8d rows (seq $seqRows%8d)")
      }
      // CONCURRENT serving: N independent answer() calls submitted
      // simultaneously against the SHARED session (the multi-client
      // shape the reference's burst tests exercise over HTTP). Spark's
      // scheduler interleaves the jobs; results must match the
      // sequential run exactly and the wall clock should amortize the
      // per-job floor across callers.
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.DurationInt
        import java.util.concurrent.Executors
        val probes = mixedProbes(32)
        val seqT0 = System.nanoTime()
        val seqCounts = probes.map { case (_, qg) =>
          OneHop.answer(spark, g, ont, qg,
            closure = None, expandSubclasses = false).matches.count()
        }
        val tSeq = (System.nanoTime() - seqT0) / 1e9
        val pool = Executors.newFixedThreadPool(16)
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        val parT0 = System.nanoTime()
        val parCounts = Await.result(Future.sequence(probes.map {
          case (_, qg) => Future(OneHop.answer(spark, g, ont, qg,
            closure = None, expandSubclasses = false).matches.count())
        }), 10.minutes)
        val tPar = (System.nanoTime() - parT0) / 1e9
        pool.shutdown()
        require(parCounts == seqCounts,
          s"concurrent results diverged: $parCounts vs $seqCounts")
        println(f"concurrent n=32 (16 threads)   wall ${tPar}%6.2f s   " +
          f"sequential ${tSeq}%6.2f s   speedup ${tSeq / tPar}%5.1fx   " +
          "results identical")
      }
    }

    // CDX point-lookup pruning (r16, p135): the urlkey-sorted published
    // index is range-partitioned into disjoint sorted files, so a point
    // probe's pushed filters (In / [min,max] range) let the parquet
    // reader skip row groups by min/max stats. Measured, not just
    // plan-pinned: the probe must run in a small constant-ish time
    // while the full-column scan grows with the index.
    if (sections.contains("cdx")) {
      import graft.sources.WarcSource
      val mult = n * 20
      val big = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(explode(sequence(lit(0), lit(mult - 1))).as("copy"),
          col("doc_id"))
        .select((col("doc_id") * mult + col("copy")).as("id"))
      val index = big.select(
        concat(lit("org,example)/doc/"), col("id")).as("urlkey"),
        concat(lit("example.org/doc/"), col("id")).as("url"),
        lit(200L).as("status"),
        md5(col("id").cast("string")).as("digest"),
        lit(100L).as("n_bytes"))
      val dir = "/root/repo/target/scale-cdx-index"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      index.repartitionByRange(32, col("urlkey"))
        .sortWithinPartitions("urlkey").write.parquet(dir)
      val idx = spark.read.parquet(dir)
      val total = idx.count()
      println(s"cdx index: $total rows, ${idx.inputFiles.length} sorted files")
      // full-column scan baseline (octet_length defeats stats shortcuts)
      time("cdx full scan") {
        idx.agg(sum(octet_length(col("digest")))).collect(); total
      }
      // warm the canonicalize/surt codegen once — a serving process
      // pays it at startup, not per probe
      WarcSource.cdxLookup(idx, Seq("https://example.org/doc/1")).count()
      time("cdx probe 10 (In)") {
        WarcSource.cdxLookup(idx, (0 until 10).map(i =>
          s"https://example.org/doc/${i * (total / 11)}")).count()
      }
      // the >16 path: a CLUSTERED request batch (one domain's pages —
      // the realistic bulk-probe shape) keeps the [min,max] range
      // conjunct tight, so row groups outside it prune; a batch spread
      // across the whole key space degrades the range to the full
      // index by design (the r14 multi-range negative result)
      time("cdx probe 40 clustered") {
        WarcSource.cdxLookup(idx, (0 until 40).map(i =>
          s"https://example.org/doc/${total / 2 + i}")).count()
      }
    }

    // Connected-components worst case (r16 verdict task #2): a single
    // long PATH — the template-drift chain shape where min-label
    // propagation needed O(diameter) rounds and the old silent
    // maxIter=20 returned unconverged labels. Star contraction must
    // converge in O(log n) rounds: chain length 100k converges in ~17
    // and the wall-clock is round-count-bound, not diameter-bound.
    if (sections.contains("cc")) {
      for (len <- Seq(1000L, 100000L)) {
        val chain = spark.range(len - 1)
          .select((col("id") + 1).as("id_a"), col("id").as("id_b"))
        time(s"cc chain $len") {
          // localEdges = 0: this section MEASURES the star-contraction
          // round scaling; the default small-graph fast path would
          // short-circuit it
          val labels = Dedup.clusters(chain, localEdges = 0)
          val bad = labels.where(col("cluster_rep") =!= 0L).count()
          require(bad == 0, s"unconverged: $bad of $len off-root")
          labels.count()
        }
        graft.operators.OperatorCaches.drainMaterialized()
      }
    }

    // Per-execution cost decomposition for one serving key (g15 churn
    // forensics, r14 verdict #4): time each repeat of the PREPARED plan
    // alongside the JVM's cumulative JIT time and Spark's Janino
    // compilation count — tells JIT warmup from codegen-cache misses
    // from planning overhead.
    if (sections.contains("g15")) {
      Fixture.ensureStore(spark, sfDir)
      val cmp = java.lang.management.ManagementFactory.getCompilationMXBean
      import org.apache.spark.metrics.source.CodegenMetrics
      for (key <- Seq("g16_attr_constraint", "g15_qualified")) {
        val fn = SparkEntry.queries(key)
        for (r <- 1 to 8) {
          val j0 = cmp.getTotalCompilationTime
          val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          println(f"$key%-20s run$r ${t * 1000}%7.1f ms   " +
            f"jit +${cmp.getTotalCompilationTime - j0}%5d ms   " +
            f"janino +${CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0}%3d")
        }
      }
    }

    // Multi-graph co-hosting at N>2 (r14 verdict #8): does per-graph
    // warm-probe latency stay flat as one session hosts 1 -> 8 graphs?
    // Each graph is the full store-backed fixture under its own name —
    // the frames share ONE cache copy, but every (graph, key) compiles
    // its own prepared plan, so N=8 exercises 8x the generated-class
    // population (the co-hosting cost that COULD inflate: codegen
    // cache pressure, not data). Warm pass builds plans; the timed
    // pass measures steady-state serving.
    if (sections.contains("multigraph")) {
      val ont = graft.model.GraftOntology.ontology
      Fixture.ensureStore(spark, sfDir)
      val g = Fixture.graph(spark, sfDir)
      g.nodes.count(); g.edges.count(); g.reverseEdges.count()
      import operators.{QueryGraph, QNode, QEdge}
      import graft.serving.{HostedGraph, MultiGraph}
      val O = graft.model.GraftOntology
      def probeShape(p: Int): QueryGraph = p % 4 match {
        case 0 => QueryGraph.oneHop(
          QNode("n0", ids = Seq(s"NAT:${p % 25}")), QNode("n1"),
          QEdge("n0", "n1", predicates = Seq(O.LocatedIn)))
        case 1 => QueryGraph.oneHop(
          QNode("n_out", categories = Seq(O.Customer)),
          QNode("n_in", ids = Seq(s"NAT:${p % 25}")),
          QEdge("n_out", "n_in", predicates = Seq(O.LocatedIn)))
        case 2 => QueryGraph.oneHop(
          QNode("n0", ids = Seq(s"NAT:${p % 25}")),
          QNode("n1", ids = Seq(s"REG:${p % 5}")),
          QEdge("n0", "n1", predicates = Seq(O.PartOf)))
        case _ => QueryGraph.oneHop(
          QNode("n0", ids = Seq(s"NAT:${p % 25}")), QNode("n1"),
          QEdge("n0", "n1", predicates = Seq(O.AdjacentTo)))
      }
      def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      val probesPerGraph = 12
      for (nGraphs <- Seq(1, 2, 4, 8)) {
        val mg = new MultiGraph(spark, ont)
        (0 until nGraphs).foreach(i => mg.register(f"g$i%02d", HostedGraph(g)))
        // warm: build + execute every (graph, key) plan once
        for (i <- 0 until nGraphs; p <- 0 until probesPerGraph)
          mg.answer(s"k$p", probeShape(p), Some(f"g$i%02d")).count()
        val lat = for (i <- 0 until nGraphs; p <- 0 until probesPerGraph) yield {
          val t0 = System.nanoTime()
          mg.answer(s"k$p", probeShape(p), Some(f"g$i%02d")).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"cohost n=$nGraphs%2d   warm p50 ${p50(lat) * 1000}%7.1f ms   " +
          f"max ${lat.max * 1000}%7.1f ms   " +
          f"(${nGraphs * probesPerGraph}%3d calls, ${nGraphs * probesPerGraph} plans)")
        if (nGraphs == 8) {
          // release footprint: g07 gets an owned cached slice; retiring
          // it must drain its plans + cache and leave g00 serving at
          // the same latency from the SAME prepared plans
          val slice = g.edges.where(col("predicate") === O.LocatedIn).cache()
          mg.register("g07", HostedGraph(
            graft.model.PropertyGraph(g.nodes, slice), owned = Seq(slice)))
          mg.answer("k0", probeShape(0), Some("g07")).count()
          val before = (0 until probesPerGraph).map { p =>
            val t0 = System.nanoTime()
            mg.answer(s"k$p", probeShape(p), Some("g00")).count()
            (System.nanoTime() - t0) / 1e9
          }
          mg.release("g07")
          val drained = mg.preparedCount("g07") == 0 &&
            slice.storageLevel == org.apache.spark.storage.StorageLevel.NONE
          val after = (0 until probesPerGraph).map { p =>
            val t0 = System.nanoTime()
            mg.answer(s"k$p", probeShape(p), Some("g00")).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"release g07: plans+cache drained=$drained   " +
            f"neighbor g00 p50 ${p50(before) * 1000}%6.1f -> ${p50(after) * 1000}%6.1f ms")
        }
        mg.releaseAll()
      }
    }

    // Graph-side incremental refresh (G33, r19): the claim a weekly KG
    // drop banks on — applying a delta-sized change costs delta-scale
    // work, NOT a wholesale rebuild. Measures (a) from-scratch build of
    // the post-delta corpus (nodes + denorm edges + closure + meta, all
    // materialized) vs (b) GraphDelta.apply on an ALREADY-BUILT base
    // (closure untouched by this delta — the common case), same outputs
    // materialized. At 100 TB (a) scales with the corpus while (b)
    // scales with the delta + the touched partitions.
    if (sections.contains("delta")) {
      import graft.sources.{GraphBuilder, GraphDelta, TpchGraph}
      val O = graft.model.GraftOntology
      val base = TpchGraph.build(spark, sfDir)
      base.nodes.cache().count(); base.edges.cache().count()
      val baseClosure = operators.SubclassClosure
        .fromGraph(base, O.ontology).cache()
      baseClosure.count() // base artifacts warm: the serving state
      def mat(nodes: DataFrame, edges: DataFrame, closure: DataFrame): Long = {
        val g = graft.model.PropertyGraph(nodes, edges)
        nodes.count() + edges.count() + closure.count() +
          operators.GraphOps.metaSummary(g).count()
      }
      time("delta: fresh rebuild") {
        val (n, e) = TpchGraph.postDeltaRawFrames(spark, sfDir)
        val g = GraphBuilder.build(n, e, O.ontology)
        mat(g.nodes, g.edges,
          operators.SubclassClosure.fromGraph(g, O.ontology))
      }
      time("delta: apply") {
        val a = GraphDelta.apply(base, baseClosure,
          TpchGraph.fixtureDelta(spark, sfDir), O.ontology)
        require(!a.closureRebuilt)
        mat(a.graph.nodes, a.graph.edges, a.closure)
      }
      // WRITE-path pruning — the second half of the G33 claim: at write
      // level only the touched partition files rewrite (the untouched
      // ones carry over physically; the reference re-streams everything
      // per boot, plover.py:725, so it has no write level to prune).
      // Both arms land the SAME post-delta zone-map table; the rebuild
      // arm pays a full sorted write, the apply arm pays footer reads +
      // the touched-subset rewrite.
      locally {
        import graft.sources.GraphStore
        val storeDir = java.nio.file.Paths.get("target/scale-delta-store")
        org.apache.commons.io.FileUtils.deleteQuietly(storeDir.toFile)
        java.nio.file.Files.createDirectories(storeDir)
        val tdir = storeDir.resolve("edges.parquet")
        base.edges.sort(org.apache.spark.sql.functions.col("subject"))
          .write.parquet(tdir.toString)
        val stored = graft.model.PropertyGraph(
          base.nodes, spark.read.parquet(tdir.toString))
        val delta = TpchGraph.fixtureDelta(spark, sfDir)
        val a = GraphDelta.apply(stored, baseClosure, delta, O.ontology)
        val t0 = System.nanoTime()
        val touched = GraphDelta.touchedEdgeKeys(
          stored, delta, O.ontology, "subject")
        val stats = GraphStore.deltaRewrite(
          spark, tdir, "subject", touched, a.graph.edges)
        val applySec = (System.nanoTime() - t0) / 1e9
        val rdir = storeDir.resolve("edges_rebuild.parquet")
        val t1 = System.nanoTime()
        val (n2, e2) = TpchGraph.postDeltaRawFrames(spark, sfDir)
        val g2 = GraphBuilder.build(n2, e2, O.ontology)
        g2.edges.sort(org.apache.spark.sql.functions.col("subject"))
          .write.parquet(rdir.toString)
        val rebuildSec = (System.nanoTime() - t1) / 1e9
        def dirBytes(p: java.nio.file.Path): Long = {
          val s = java.nio.file.Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_))
              .map(java.nio.file.Files.size).sum
          } finally s.close()
        }
        println(f"delta write: apply rewrote ${stats.filesRewritten}/" +
          f"${stats.filesTotal} files ${stats.bytesWritten / 1e6}%.2f MB " +
          f"(carried ${stats.bytesCarried / 1e6}%.2f MB) $applySec%.2f s; " +
          f"rebuild wrote ${dirBytes(rdir) / 1e6}%.2f MB $rebuildSec%.2f s")
      }
    }
    spark.stop()
  }
}
