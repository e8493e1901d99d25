package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Dedup operators on a controlled corpus with known duplicate structure. */
class DedupSpec extends SparkSpec {

  import spark.implicits._

  // 0/1 exact dups; 2/3 near-dups (one token changed); 4 unrelated.
  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (4L, "completely different words about spark catalyst tungsten engines")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id and counts duplicates") {
    val res = Dedup.exact(docs).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(res.toSeq == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("jaccard pairs find exact and near dups, not unrelated docs") {
    val res = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(res.contains((0L, 1L)))
    assert(res.contains((2L, 3L)))
    assert(!res.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard of exact dup is 1.0") {
    val j = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5)
      .where(col("id_a") === 0 && col("id_b") === 1)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("hot-shingle cutoff only lowers jaccard (conservative)") {
    val base = Dedup.jaccardPairs(docs, n = 1, threshold = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val pruned = Dedup.jaccardPairs(docs, n = 1, threshold = 0.0, maxShingleFreq = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for ((k, v) <- pruned) assert(v <= base(k) + 1e-12, s"pair $k grew: $v > ${base(k)}")
  }

  test("minhash-LSH candidates include true near-dups with full-band agreement") {
    val res = Dedup.minhashLshPairs(docs, k = 16, bands = 4, shingleN = 2,
      minAgree = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(res.keySet.contains((0L, 1L)))
    assert(res((0L, 1L)) == 4L) // identical docs agree on all 4 bands
    assert(!res.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("lsh-verified pairs: exact scores, subset of exact jaccard, finds the dups") {
    val verified = Dedup.lshVerifiedPairs(docs, k = 16, bands = 4, shingleN = 2,
      threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val exact = Dedup.jaccardPairs(docs, n = 2, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // precision: every verified pair exists in the exact output with the
    // SAME jaccard (verification is exact, not the signature estimate)
    for ((k, v) <- verified) assert(exact.get(k).contains(v), s"pair $k: $v vs ${exact.get(k)}")
    // the planted duplicates collide in some band and survive verification
    assert(verified.contains((0L, 1L)) && verified((0L, 1L)) == 1.0)
    assert(verified.contains((2L, 3L)))
    assert(!verified.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs hash identically; near-dups within distance") {
    val sh = Dedup.simhashes(docs, shingleN = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(java.lang.Long.bitCount(sh(2L) ^ sh(3L)) <=
      java.lang.Long.bitCount(sh(2L) ^ sh(4L)))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("clusters: connected components with min representative") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (7L, 9L))
      .toDF("id_a", "id_b")
    val res = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, // chain 1-2-3
      5L -> 5L, 6L -> 5L,
      7L -> 7L, 8L -> 7L, 9L -> 7L)) // 8-9, 7-9 merge via 9
  }

  test("clusters: a 60-node path graph converges (diameter >> old 20-round cap)") {
    // the r16 min-label implementation needed O(diameter) rounds and
    // SILENTLY returned unconverged labels past maxIter=20 — a 100-TB
    // template-drift chain is exactly this shape. Star contraction
    // must converge in O(log n) rounds; 60 nodes, worst-case ordering
    // (descending ids, so min-labels would have to travel the whole
    // chain), every node must land on rep 0.
    val n = 60L
    val chain = (0L until n - 1).map(i => (n - 1 - i, n - 2 - i))
      .toDF("id_a", "id_b")
    // localEdges = 0 forces the DISTRIBUTED star-contraction path —
    // this test pins ITS convergence; the default-path twin is below
    val res = Dedup.clusters(chain, localEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(res.length == n)
    assert(res.forall(_._2 == 0L),
      s"unconverged labels: ${res.filter(_._2 != 0L).take(5).toSeq}")
    // and the loud cap actually throws instead of returning bad labels
    val ex = intercept[IllegalStateException] {
      Dedup.clusters(chain, maxIter = 1, localEdges = 0).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // the LOCAL union-find fast path (the default at this size) must
    // agree with the distributed result row-for-row
    val local = Dedup.clusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(local.sorted.toSeq == res.sorted.toSeq)
  }

  test("paragraph dedup: first occurrence survives, docs reassemble in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique one.\nshared footer text.\nunique two."),
      (2L, "different body here.\nshared footer text."),
      (3L, "shared footer text.")  // every paragraph seen earlier
    ).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(docs).orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // doc 1 holds the first occurrence of the footer: keeps everything
    assert(r(0).getAs[Long]("n_paragraphs") == 3L && r(0).getAs[Long]("n_kept") == 3L)
    assert(r(0).getAs[String]("text_deduped") ==
      "unique one.\nshared footer text.\nunique two.")
    // doc 2 loses only the footer, order preserved
    assert(r(1).getAs[Long]("n_kept") == 1L)
    assert(r(1).getAs[String]("text_deduped") == "different body here.")
    // doc 3 is fully deduplicated away but still present
    assert(r(2).getAs[Long]("n_kept") == 0L)
    assert(r(2).getAs[String]("text_deduped") == "")
  }

  test("dupSpans finds an unaligned shared run and ignores shorter overlaps") {
    // docs 1 and 2 share a verbatim 6-token run at DIFFERENT offsets
    // (stride-1 windows make detection alignment-free); doc 3 shares
    // only a 3-token prefix of it, which can never fill a 5-token window.
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val docs = Seq(
      (1L, s"intro words here $shared tail"),                           // 10 toks
      (2L, s"$shared completely different ending follows now"),         // 11 toks
      (3L, "alpha beta gamma unrelated continuation of words here today"), // 9
      (4L, "nothing in common with anybody else at all")                // 8
    ).toDF("doc_id", "text")
    val r = Dedup.dupSpans(docs, w = 5).orderBy("id").collect()
    // a 6-token shared run holds 6-5+1 = 2 windows in each carrier
    assert(r(0).getAs[Long]("n_dup_windows") == 2L)
    assert(r(1).getAs[Long]("n_dup_windows") == 2L)
    assert(r(2).getAs[Long]("n_dup_windows") == 0L)
    assert(r(3).getAs[Long]("n_dup_windows") == 0L)
    // window counts are n_tokens - w + 1
    assert(r.map(_.getAs[Long]("n_windows")).toSeq == Seq(6L, 7L, 5L, 4L))
    assert(math.abs(r(0).getAs[Double]("dup_window_frac") - 2.0 / 6.0) < 1e-6)
  }

  test("incrementalExact drops corpus hits and within-batch dups, keeps the rest") {
    val corpus = Seq((10L, "existing doc alpha"), (11L, "existing doc beta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "existing doc alpha"),  // corpus hit -> dropped
      (2L, "fresh content one"),   // first holder -> kept
      (3L, "fresh content one"),   // within-batch dup -> dropped
      (4L, "fresh content two")    // unique -> kept
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalExact(corpus, batch).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (1L, true, false, false),
      (2L, false, false, true),
      (3L, false, true, false),
      (4L, false, false, true)))
  }

  test("incrementalExactBloom: no false negatives vs exact, batch_dup identical, empty corpus") {
    val corpus = Seq((10L, "existing doc alpha"), (11L, "existing doc beta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, "existing doc alpha"),
      (2L, "fresh content one"),
      (3L, "fresh content one"),
      (4L, "fresh content two")
    ).toDF("doc_id", "text")
    val exact = Dedup.incrementalExact(corpus, batch).orderBy("id").collect()
    val bloom = Dedup.incrementalExactBloom(corpus, batch).orderBy("id").collect()
    assert(exact.length == bloom.length)
    exact.zip(bloom).foreach { case (e, b) =>
      assert(e.getLong(0) == b.getLong(0))
      // flagged is a SUPERSET of true corpus membership (no false negatives)
      if (e.getBoolean(1)) assert(b.getBoolean(1), s"false negative id ${e.getLong(0)}")
      // the within-batch tie-break is exact in both
      assert(e.getBoolean(2) == b.getBoolean(2), s"batch_dup id ${e.getLong(0)}")
      // kept can only shrink (over-drop by FP), never grow
      if (b.getBoolean(3)) assert(e.getBoolean(3), s"kept not subset id ${e.getLong(0)}")
    }
    // at this scale/bit budget the FP rate is ~0: results match exactly
    assert(bloom.map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(3))).toSeq ==
      exact.map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(3))).toSeq)
    // empty corpus -> null Bloom aggregate -> nothing flagged, dedup still exact
    val none = Dedup.incrementalExactBloom(corpus.limit(0), batch).orderBy("id")
      .collect().map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(3)))
    assert(none.toSeq == Seq((1L, false, true), (2L, false, true),
      (3L, false, false), (4L, false, true)))
  }

  test("incrementalNearDup flags near matches across the corpus frontier, not unrelated docs") {
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "totally separate corpus content about query engines and planners")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of corpus 10
      // 2/3 differ only in the final token of a 14-token sentence
      // (jaccard 11/13): high enough that the fixed hash family bands
      // them together — LSH recall is probabilistic in general, so the
      // fixture leans far inside the collision curve
      (2L, "fresh unrelated words describing storage formats and codecs used by modern analytics engines today"),
      (3L, "fresh unrelated words describing storage formats and codecs used by modern analytics engines now"), // near-dup of batch 2
      (4L, "nothing like anything else in either collection at all")
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalNearDup(corpus, batch).orderBy("id").collect()
      .map(x => (x.getLong(0), x.getBoolean(1), x.getBoolean(2), x.getBoolean(3)))
    assert(r.toSeq == Seq(
      (1L, true, false, false),
      (2L, false, false, true),
      (3L, false, true, false),
      (4L, false, false, true)))
  }

  test("spanDedupApply excises covered tokens and leaves the rest in order") {
    val shared = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val docs = Seq(
      (1L, s"intro words here $shared tail"),
      (2L, s"$shared completely different ending follows now"),
      (3L, "alpha beta gamma unrelated continuation of words here today"),
      (4L, "nothing in common with anybody else at all")
    ).toDF("doc_id", "text")
    val r = Dedup.spanDedupApply(docs, w = 5).orderBy("id").collect()
    // the shared run's 2 dup windows each cover [s, s+5) and merge into
    // one 6-token interval; everything outside survives in order
    assert(r(0).getAs[String]("clean_text") == "intro words here tail")
    assert(r(0).getAs[Long]("n_removed") == 6L)
    assert(r(1).getAs[String]("clean_text") ==
      "completely different ending follows now")
    assert(r(2).getAs[Long]("n_removed") == 0L)
    assert(r(3).getAs[String]("clean_text") ==
      "nothing in common with anybody else at all")
  }

  test("spanDedupApply removes a fully-duplicated doc to empty text") {
    val t = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, t), (2L, t), (3L, "unique standalone content here today"))
      .toDF("doc_id", "text")
    val r = Dedup.spanDedupApply(docs, w = 5).orderBy("id").collect()
    // every window of docs 1/2 is duplicated -> ONE merged interval
    // covering all 10 tokens; doc 3 is untouched
    assert(r(0).getAs[String]("clean_text") == "")
    assert(r(0).getAs[Long]("n_removed") == 10L)
    assert(r(1).getAs[String]("clean_text") == "")
    assert(r(2).getAs[Long]("n_removed") == 0L)
  }

  test("semDedup drops within-cluster near-dups keep-first, across-cluster dups survive") {
    // 0/1 near-identical (same cluster whatever the quantizer does);
    // 2 orthogonal to both; 3 the negation of 0 (cosine -1, same or
    // different cluster — never above threshold either way).
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = Dedup.semDedup(vecs, threshold = 0.9, nCenters = 2,
      trainIters = 1, trainSample = 4)
      .orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // keep-first: 0 survives, 1 is dropped with dup_of = 0
    assert(r(0).getAs[Boolean]("kept"))
    assert(!r(1).getAs[Boolean]("kept") && r(1).getAs[Long]("dup_of") == 0L)
    assert(r(2).getAs[Boolean]("kept") && r(3).getAs[Boolean]("kept"))
    // every vector appears exactly once with a cluster assignment
    assert(r.forall(row => !row.isNullAt(1)))
  }

  test("semDedup keep-farthest keeps the cluster outlier (the paper's rule)") {
    // trainIters = 0, nCenters = 1: the centroid IS vector 0, so vector
    // 0 has centroid-cosine 1.0 and vector 1 (cos 0.8 to it) is the
    // outlier. Keep-first drops 1; keep-farthest drops 0 instead —
    // SemDeDup preserves the diverse edge of each duplicate
    // neighborhood, not the redundant center.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val first = Dedup.semDedup(vecs, threshold = 0.75, nCenters = 1,
      trainIters = 0, trainSample = 2).orderBy("id").collect()
    assert(first(0).getAs[Boolean]("kept") && !first(1).getAs[Boolean]("kept"))
    val farthest = Dedup.semDedup(vecs, threshold = 0.75, nCenters = 1,
      trainIters = 0, trainSample = 2, keepFarthest = true)
      .orderBy("id").collect()
    assert(!farthest(0).getAs[Boolean]("kept") &&
      farthest(1).getAs[Boolean]("kept"))
    assert(farthest(0).getAs[Long]("dup_of") == 1L)
  }

  test("semDedup misses near-dups split across clusters (the documented trade)") {
    // trainIters = 0 pins the centroids to vectors 0 and 1. Vectors 2
    // and 3 are a near-dup pair (cosine ~0.98) but sit on opposite sides
    // of the 0/1 bisector, so the quantizer separates them and the
    // within-cluster search can never compare them — both survive even
    // though the global exact search (embeddingPairs) finds the pair.
    // Verifies the search really is within-cluster only (the paper's
    // cost model) rather than a hidden global quadratic.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.55f, 0.65f, 0.0f, 0.0f)), // nearer 1 (cos .76 vs .65)
      (3L, Array(0.70f, 0.55f, 0.0f, 0.0f))  // nearer 0 (cos .79 vs .62)
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairs(vecs, threshold = 0.8, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((2L, 3L)))
    val r = Dedup.semDedup(vecs, threshold = 0.8, nCenters = 2,
      trainIters = 0, trainSample = 4).orderBy("id").collect()
    assert(r.forall(_.getAs[Boolean]("kept")))
    assert(r(2).getAs[Long]("centroid_id") != r(3).getAs[Long]("centroid_id"))
  }

  test("semDedup pair-rank cap: window covers = same answer, window misses = documented cost") {
    // One cluster (trainIters = 0, nCenters = 1 pins the centroid to
    // vector 0). Members sort by centroid cosine: 0 (1.0), 1 (cos30),
    // 2 (cos33), 3 (cos36), 4 (cos40) -> ranks 1..5. The only pair
    // above threshold 0.9 is (1,4): both lie at angle 10 deg of each
    // other in the SAME plane (cos10 = .985), while the two fillers
    // between them in rank point into orthogonal dims (all other
    // cosines <= .87). Rank distance of the dup pair = 3.
    val vecs = Seq(
      (0L, Array(1.0f, 0f, 0f, 0f)),
      (1L, Array(0.8660254f, 0.5f, 0f, 0f)),        // C, rank 2
      (2L, Array(0.8386706f, 0f, 0.5446390f, 0f)),  // filler, rank 3
      (3L, Array(0.8090170f, 0f, 0f, 0.5877853f)),  // filler, rank 4
      (4L, Array(0.7660444f, 0.6427876f, 0f, 0f))   // D ~ C, rank 5
    ).toDF("vec_id", "embedding")
    def run(w: Option[Int]) =
      Dedup.semDedup(vecs, threshold = 0.9, nCenters = 1,
        trainIters = 0, trainSample = 8, pairRankWindow = w)
        .orderBy("id").collect()
    val uncapped = run(None)
    assert(!uncapped(4).getAs[Boolean]("kept") &&
      uncapped(4).getAs[Long]("dup_of") == 1L)
    assert(uncapped.take(4).forall(_.getAs[Boolean]("kept")))
    // w >= cluster size: bit-identical to uncapped
    val wide = run(Some(8))
    assert(wide.map(_.toSeq).toSeq == uncapped.map(_.toSeq).toSeq)
    // w = 3 covers the pair's rank distance: still dropped
    val covering = run(Some(3))
    assert(!covering(4).getAs[Boolean]("kept"))
    // w = 2 < rank distance 3: the pair is forfeited — the documented
    // cost that buys the O(m*w) bound on a giant cluster
    val missing = run(Some(2))
    assert(missing.forall(_.getAs[Boolean]("kept")))
  }

  test("OperatorCaches.drainMaterialized drops every operator-materialized frame") {
    // Long-running-service lifecycle: distinct queries each leave
    // plan-keyed cached frames behind; the drain must return the
    // persistent-RDD count to its pre-query level (other suites' shared
    // fixture caches are constant background, asserted by DELTA so this
    // test never touches caches it does not own).
    import org.apache.spark.sql.graftglue.Bridge
    graft.operators.OperatorCaches.drainMaterialized()
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "unrelated words entirely different content here")
    ).toDF("doc_id", "text")
    // the frame jaccardPairs materializes for its self-join — observe
    // its cache-manager entry appear with the query and die with drain
    val probe = Dedup.shingleSets(docs, n = 2, "text", "doc_id")
    assert(!Bridge.isCached(probe))
    Dedup.jaccardPairs(docs, n = 2, threshold = 0.5).count()
    Dedup.minhashLshPairs(docs, shingleN = 2).count()
    assert(Bridge.isCached(probe), "operators should have materialized frames")
    val n = graft.operators.OperatorCaches.drainMaterialized()
    assert(n >= 2, s"expected at least 2 registered frames, drained $n")
    assert(!Bridge.isCached(probe),
      "session-lifetime cache growth survived the drain")
    // a second drain is a no-op
    assert(graft.operators.OperatorCaches.drainMaterialized() == 0)
  }

  test("embedding pairs: exact vs bucketed recall relationship") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)), // near 0
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingPairs(vecs, threshold = 0.9, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((0L, 1L)))
    val bucketed = Dedup.embeddingPairs(vecs, threshold = 0.9, bucketed = true,
      nPlanes = 4, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // bucketing can only lose pairs, never invent them
    assert(bucketed.subsetOf(exact))
  }

  test("clusters: self-pair-only ids come back as their own singleton cluster") {
    // the contract: every id appearing in pairs gets a row — an id
    // seen ONLY as (x, x) must map to itself, not vanish (the star
    // edge set drops self-loops; review-caught). Pinned on BOTH paths.
    for (le <- Seq(100000L, 0L)) {
      val pairs = Seq((5L, 5L), (1L, 2L), (2L, 2L)).toDF("id_a", "id_b")
      val res = Dedup.clusters(pairs, localEdges = le).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(res == Map(5L -> 5L, 1L -> 1L, 2L -> 1L), s"le=$le $res")
      // all-self-pairs input: every id its own cluster, no iteration
      val selfOnly = Seq((7L, 7L), (9L, 9L)).toDF("id_a", "id_b")
      val r2 = Dedup.clusters(selfOnly, localEdges = le).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(r2 == Map(7L -> 7L, 9L -> 9L), s"le=$le $r2")
    }
  }

  test("clusters: local fast path matches the distributed path on string ids") {
    // string ids order by UTF-8 bytes in Spark (least/greatest on
    // UTF8String); the local union-find must agree — including on a
    // multi-byte id that Java's UTF-16 compare would order the same
    // but a careless numeric cast would break
    val pairs = Seq(
      ("b", "aa"), ("aa", "a"), ("z", "é"), ("m", "m2"), ("M", "m")
    ).toDF("id_a", "id_b")
    val dist = Dedup.clusters(pairs, localEdges = 0).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    val local = Dedup.clusters(pairs).collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(local == dist, s"local=$local dist=$dist")
    assert(local.toMap.apply("é") == "z") // 'é' UTF-8 > 'z'
  }
}
