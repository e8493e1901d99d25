package graft

import graft.functions.{HashExpressions => HE, TextFunctions => TF}
import org.apache.spark.sql.functions._

/** The native single-pass hash expressions must be bit-identical to the
 * composable Column versions (same md5 code, same hash family) — the
 * DuckDB oracles mirror the Column versions, so this equivalence is what
 * keeps the oracle valid after the fast path swap. */
class HashExpressionsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "alpha beta gamma delta epsilon zeta eta"),
    (2L, "a b a b a b a b"), // heavy duplication -> exercises distinct
    (3L, "unique words only appear once here today friends")
  ).toDF("doc_id", "text")
    .select(col("doc_id"),
      array_distinct(TF.shingles(TF.tokens(col("text")), 2)).as("shingles"))

  test("native simhash == Column-composed simhash") {
    val both = docs.select(col("doc_id"),
      HE.shingleSimhash(col("shingles")).as("native"),
      TF.simhash(TF.tokenCodes(col("shingles"))).as("composed")).collect()
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("native minhash == Column-composed minhash") {
    val both = docs.select(col("doc_id"),
      HE.shingleMinhash(col("shingles"), 16).as("native"),
      TF.minhashSignature(TF.tokenCodes(col("shingles")), 16).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1).toList == r.getSeq[Long](2).toList,
        s"doc ${r.getLong(0)}")
    }
  }

  test("native expressions handle null input") {
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("shingles")
    val r = df.select(HE.shingleSimhash(col("shingles")),
      HE.shingleMinhash(col("shingles"), 4)).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
