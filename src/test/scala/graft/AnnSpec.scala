package graft

import graft.functions.VectorFunctions
import graft.operators.Ann
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.9f, 0.1f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  private lazy val probes = corpus.where(col("vec_id") === 0)
    .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))

  test("brute-force top-k ranks by cosine desc, excludes self") {
    val res = Ann.bruteForceTopK(corpus, probes, k = 3)
      .orderBy("rank").collect()
    assert(res.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L)) // by cosine to e0
    assert(res.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L)) // ranks 1..3
    assert(!res.exists(_.getLong(2) == 0L))
  }

  test("cosine values are in [-1, 1] and ordered") {
    val cs = Ann.bruteForceTopK(corpus, probes, k = 4)
      .orderBy("rank").select("cosine").as[Double].collect()
    assert(cs.forall(c => c >= -1.0001 && c <= 1.0001))
    assert(cs.sameElements(cs.sorted.reverse))
  }

  test("lsh top-k returns a subset of brute-force candidates, correctly ranked") {
    val bf = Ann.bruteForceTopK(corpus, probes, k = 4)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val lsh = Ann.lshTopK(corpus, probes, k = 4, nPlanes = 2, nTables = 2, dim = 4)
      .orderBy("rank").collect()
    // every LSH result appears in brute force with the identical cosine
    for (r <- lsh) assert(bf(r.getLong(2)) == r.getDouble(3))
    // ranks are dense from 1
    assert(lsh.map(_.getLong(1)).toSeq == (1L to lsh.length).toSeq)
  }

  test("ivf top-k: full-coverage probe set equals brute force") {
    // with nCenters = corpus size and nProbe = nCenters, IVF degenerates
    // to exact search — results must equal brute force
    val bf = Ann.bruteForceTopK(corpus, probes, k = 4)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ivf = Ann.ivfTopK(corpus, probes, k = 4, nCenters = 5, nProbe = 5)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("ivf top-k: restricted probes return a correctly-ranked subset") {
    val bf = Ann.bruteForceTopK(corpus, probes, k = 4)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    val ivf = Ann.ivfTopK(corpus, probes, k = 4, nCenters = 2, nProbe = 1)
      .orderBy("rank").collect()
    for (r <- ivf) assert(bf(r.getLong(2)) == r.getDouble(3))
    assert(ivf.map(_.getLong(1)).toSeq == (1L to ivf.length).toSeq)
  }

  test("trained quantizer balances inverted lists better than sampled centroids") {
    // Two tight clusters; the first-N init lands BOTH seed centroids in
    // cluster A — the worst case for sampled centroids. Two k-means
    // iterations must migrate one centroid toward cluster B.
    val skewed = (
      (0 until 10).map(i => (i.toLong, Array(1.0f, 0.01f * i, 0.0f, 0.0f))) ++
      (10 until 20).map(i => (i.toLong, Array(0.01f * (i - 10), 1.0f, 0.0f, 0.0f)))
    ).toDF("vec_id", "embedding")
    val vecs = skewed.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def maxListSize(cents: Seq[(Long, Seq[Double])]): Int = {
      val cn = cents.map { case (cid, cv) =>
        (cid, cv.toArray, math.sqrt(dot(cv.toArray, cv.toArray))) }
      vecs.map { case (_, v) =>
        val vn = math.sqrt(dot(v, v))
        cn.maxBy { case (cid, cv, n) => (dot(v, cv) / (vn * n), -cid) }._1
      }.groupBy(identity).values.map(_.length).max
    }
    val sampled = vecs.take(2).map { case (id, v) => (id, v.toSeq) }.toSeq
    val trained = Ann.trainCentroids(skewed, nCenters = 2, sampleN = 20, iters = 2)
    assert(maxListSize(trained) < maxListSize(sampled))
    assert(maxListSize(trained) == 10) // perfectly balanced on this fixture
    // deterministic: retraining yields identical centroids
    assert(trained == Ann.trainCentroids(skewed, nCenters = 2, sampleN = 20, iters = 2))
    // full-coverage IVF with a trained quantizer still equals brute force
    val p = skewed.where(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val bf = Ann.bruteForceTopK(skewed, p, k = 5)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    val ivf = Ann.ivfTopK(skewed, p, k = 5, nCenters = 2, nProbe = 2,
        trainIters = 2, trainSample = 20)
      .orderBy("rank").collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(ivf.toSeq == bf.toSeq)
  }

  test("hyperplanes are deterministic") {
    val h1 = VectorFunctions.hyperplane(3, 8)
    val h2 = VectorFunctions.hyperplane(3, 8)
    assert(h1 == h2)
    assert(h1.forall(v => v >= -0.5 && v < 0.5))
    assert(VectorFunctions.hyperplane(4, 8) != h1)
  }
}
