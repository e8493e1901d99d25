package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic streaming sketches — the bounded-memory primitives a
 * 100 TB pipeline uses where exact state would be corpus-sized:
 * cardinality estimation (how many distinct shingles/URLs/users) and
 * heavy-hitter counting (which tokens dominate) in O(sketch) memory.
 *
 * Both are built on md5-derived integer hashing (the engine-portable
 * house convention), and both deliberately use EXACT INTEGER
 * arithmetic end to end — the estimate itself is bit-reproducible and
 * DuckDB-hash-checkable, unlike library HLL/CMS implementations whose
 * float corrections and platform hashes never match across engines.
 *
 * Reference analog: the pipeline-stats family (ref `plover.py` keeps
 * exact dict counts — viable in one process, not at corpus scale).
 */
object Sketches {

  /** 32-bit integer from an md5 prefix (house `tokenCode` convention),
   * salted so independent hash rows stay independent. */
  private def code(salt: String, v: Column): Column =
    conv(substring(md5(concat(lit(salt), v)), 1, 8), 16, 10).cast("long")

  /** Flajolet-Martin rho: (trailing zero bits of h) + 1, capped at 33
   * (h == 0). P(rho = k) = 2^-k for uniform h. A 32-step when-chain —
   * branchy but literal, codegen'd, and expressible as the identical
   * CASE chain in SQL (no bit-scan builtin is portable). */
  private def rho(h: Column): Column =
    (1 to 32).foldLeft(when(h === 0L, lit(33L))) { (acc, k) =>
      acc.when(pmod(h, lit(1L << k)) === lit(1L << (k - 1)), lit(k.toLong))
    }

  /**
   * HLL-shaped distinct-count estimate over a value column: values
   * hash into `m` buckets, each bucket keeps max rho of a second
   * independent hash, and the harmonic-mean estimate
   *
   *   E = floor(709 * m^2 * 2^34 / (1000 * S)),
   *   S = Σ_buckets 2^(34 - r_j)   (empty bucket: r_j = 0)
   *
   * is computed in exact integer math (alpha_64 ≈ 0.709 as the
   * rational 709/1000; S ≤ m·2^34 stays int64, the numerator rides a
   * plan-time DECIMAL(38,0) literal past int64 — see
   * `hllEstimateFromRegisters` — so any m ≤ 2^19 is safe). RAW
   * estimate only — the standard small/large-range corrections need
   * ln() and are deliberately omitted for cross-engine exactness;
   * accuracy is the usual ~1.04/sqrt(m) rsd away from the degenerate
   * ends (spec-demonstrated against the exact count).
   *
   * Scale shape: ONE hash-keyed aggregation to at most `m` register
   * rows, then a scalar fold — the corpus ships nothing but (bucket,
   * rho) pairs into a map-side-combined max. The exact count beside
   * it (for the honesty read) is the expensive path the sketch
   * replaces at scale; callers drop it in production.
   * Output: one row (m, hll_estimate, n_exact).
   */
  /** The register table of the HLL sketch — (bucket, r) with at most
   * `m` rows. Exposed because registers are the MERGEABLE form:
   * sketch(A ∪ B) == max-merge(sketch(A), sketch(B)) exactly, which
   * is what lets every shard sketch independently and a reducer
   * combine O(m) rows instead of re-scanning the corpus. */
  def hllRegisters(values: DataFrame, valueCol: String, m: Int = 64)
      : DataFrame = {
    require(m >= 2 && m <= (1 << 19), "m out of the supported range")
    val v = col(valueCol)
    values
      .select(pmod(code("hb:", v), lit(m.toLong)).as("bucket"),
        rho(code("hr:", v)).as("r"))
      .groupBy("bucket").agg(max(col("r")).as("r"))
  }

  /** Merge register tables (bucket-wise max) — exact: the merged
   * sketch IS the sketch of the union, to the bit. */
  def hllMerge(regTables: DataFrame*): DataFrame =
    regTables.reduce(_ unionAll _)
      .groupBy("bucket").agg(max(col("r")).as("r"))

  /** Estimate from a register table (see `hllDistinct` for the
   * formula and its exactness/accuracy trades). The numerator
   * 709·m²·2^34 exceeds int64 for m ≳ 870, so it is folded at PLAN
   * time into one BigInt literal carried as DECIMAL(38,0) (22 digits
   * at m = 2^19 — exact); the integral divide stays exact and the
   * result re-fits int64 because E ≤ 709·m·2^34/1000 < 2^63 for
   * every admissible m. */
  def hllEstimateFromRegisters(regs: DataFrame, m: Int): DataFrame = {
    require(m >= 2 && m <= (1 << 19), "m out of the supported range")
    val numer = BigInt(709) * m * m * (BigInt(1) << 34)
    regs.agg(
      (coalesce(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(34 - r AS INT))")),
        lit(0L)) +
        (lit(m.toLong) - count(lit(1))) * lit(1L << 34)).as("s"))
      .select(lit(m.toLong).as("m"),
        expr(s"CAST(CAST('$numer' AS DECIMAL(38,0)) DIV (1000 * s) AS BIGINT)")
          .as("hll_estimate"))
  }

  def hllDistinct(values: DataFrame, valueCol: String, m: Int = 64)
      : DataFrame = {
    val v = col(valueCol)
    val regs = hllRegisters(values, valueCol, m)
    val est = hllEstimateFromRegisters(regs, m)
    val exact = values.agg(countDistinct(v).as("n_exact"))
    est.crossJoin(exact) // 1x1 rows: the documented scalar-assembly case
  }

  /** Merge count-min sketches (cell-wise add) — exact: counters are
   * linear, so cms(A) + cms(B) == cms(A ⊎ B) cell for cell; shards
   * sketch independently and a reducer combines O(depth·width) rows. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy("row", "col").agg(sum(col("cnt")).as("cnt"))

  /** Count-min sketch depth (independent hash rows) and width. 4x256
   * bounds the overestimate at ~e/256 of the total mass with
   * probability 1 - e^-4 — plenty to separate heavy hitters. */
  val CmsDepth = 4
  val CmsWidth = 256

  /**
   * Count-min sketch of a value column: `CmsDepth` independent
   * md5-salted hash rows of `CmsWidth` counters. Returned as the
   * (row, col, cnt) table — at most depth*width rows, the BOUNDED
   * ARTIFACT that replaces a corpus-sized exact count table.
   *
   * Scale shape: one explode by depth (a constant), one uniform
   * (row, col)-keyed aggregation with map-side combine absorbing the
   * zipfian head — the sketch never exceeds depth*width rows no
   * matter the corpus.
   */
  def cmsBuild(values: DataFrame, valueCol: String): DataFrame = {
    val v = col(valueCol)
    val cells = array((0 until CmsDepth).map(i =>
      struct(lit(i).as("row"),
        pmod(code(s"cms$i:", v), lit(CmsWidth.toLong)).as("col"))): _*)
    values.select(explode(cells).as("c"))
      .groupBy(col("c.row").as("row"), col("c.col").as("col"))
      .agg(count(lit(1)).as("cnt"))
  }

  /**
   * Heavy-hitter estimates: for each candidate value, the count-min
   * point estimate min_i CMS[i][hash_i(v)] — NEVER an underestimate
   * (every counter the value touches includes all its occurrences;
   * collisions only add). The sketch collects into an O(depth*width)
   * literal map, so scoring any candidate stream is a narrow
   * zero-join scan (the ANN-quantizer artifact pattern).
   * Output: (value, cms_estimate) per candidate.
   */
  def cmsEstimate(cms: DataFrame, candidates: DataFrame,
                  valueCol: String): DataFrame = {
    val table: Map[String, String] = cms.collect()
      .map(r => s"${r.getInt(0)}:${r.getLong(1)}" -> r.getLong(2).toString)
      .toMap
    val v = col(valueCol)
    val lookups = (0 until CmsDepth).map { i =>
      // empty sketch (empty corpus): every counter reads 0
      if (table.isEmpty) lit(0L)
      else coalesce(
        graft.functions.HashExpressions.mapProbe(
          concat(lit(s"$i:"),
            pmod(code(s"cms$i:", v), lit(CmsWidth.toLong))), table)
          .cast("long"),
        lit(0L))
    }
    candidates.select(v.as("value"), least(lookups: _*).as("cms_estimate"))
  }
}
