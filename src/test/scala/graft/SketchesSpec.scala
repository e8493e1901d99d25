package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  import spark.implicits._

  test("hllDistinct: estimate lands near exact, duplicates don't move it") {
    val vals = (1 to 10000).map(i => s"val-$i").toDF("v")
    val one = Sketches.hllDistinct(vals, "v", m = 64).collect().head
    val est = one.getLong(1)
    val exact = one.getLong(2)
    assert(exact == 10000L)
    // ~1.04/sqrt(64) rsd => 13%; 30% is a 2.3-sigma deterministic bound
    // for THIS fixed hash (the value is reproducible, not random)
    assert(math.abs(est - exact) <= 3000, s"est $est")
    // registers saturate on max: replicating every value 3x changes nothing
    val dup = vals.unionAll(vals).unionAll(vals)
    val two = Sketches.hllDistinct(dup, "v", m = 64).collect().head
    assert(two.getLong(1) == est)
  }

  test("hllEstimateFromRegisters: large m (numerator past int64) stays exact vs BigInt formula") {
    // m = 16384: 709*m^2*2^34 ~ 3.3e21, far beyond int64 — the estimate
    // must equal the BigInt-evaluated formula bit-for-bit (no silent wrap)
    val m = 1 << 14
    val vals = (1 to 20000).map(i => s"big-$i").toDF("v")
    val regs = Sketches.hllRegisters(vals, "v", m = m)
    val est = Sketches.hllEstimateFromRegisters(regs, m).collect().head.getLong(1)
    val collected = regs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val s = collected.map { case (_, r) => BigInt(1) << (34 - r.toInt) }.sum +
      BigInt(m - collected.length) * (BigInt(1) << 34)
    val expected = (BigInt(709) * m * m * (BigInt(1) << 34)) / (BigInt(1000) * s)
    assert(BigInt(est) == expected, s"est $est vs $expected")
    // sanity only: n ~ 1.2m sits in the small-range regime where the
    // RAW estimator (no linear-counting correction — deliberately
    // omitted for cross-engine exactness) is biased high; the point of
    // this spec is the bit-exact BigInt match above, not accuracy
    assert(est > 20000L && est < 2 * 20000L, s"est $est")
  }

  test("hllDistinct: documented raw-estimate bias floor on empty input") {
    val empty = Seq.empty[String].toDF("v")
    val row = Sketches.hllDistinct(empty, "v", m = 64).collect().head
    // no small-range correction (needs ln, breaks exactness): all-zero
    // registers give floor(709*m/1000) = 45, the documented degenerate end
    assert(row.getLong(1) == 45L)
    assert(row.getLong(2) == 0L)
  }

  test("merge exactness: hll max-merge == single pass, cms add == union build") {
    val a = (1 to 3000).map(i => s"val-$i").toDF("v")
    val b = (2000 to 6000).map(i => s"val-$i").toDF("v") // overlaps a
    // HLL: merged shard registers == whole-corpus registers, to the row
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, "v"), Sketches.hllRegisters(b, "v"))
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    val whole = Sketches.hllRegisters(a.unionAll(b), "v")
      .orderBy("bucket").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(merged.toSeq == whole.toSeq)
    // CMS: cell-wise add == sketch of the bag union, to the cell
    val cm = Sketches.cmsMerge(
      Sketches.cmsBuild(a, "v"), Sketches.cmsBuild(b, "v"))
      .orderBy("row", "col").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val cw = Sketches.cmsBuild(a.unionAll(b), "v")
      .orderBy("row", "col").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(cm.toSeq == cw.toSeq)
  }

  test("cms: never underestimates; zipfian head stays exact; absent reads collisions only") {
    // 5000 distinct values over 4x256 counters forces collisions, plus a
    // planted heavy hitter at 2000 occurrences
    val tail = (1 to 5000).flatMap(i => Seq.fill(1 + i % 3)(s"t-$i"))
    val all = (tail ++ Seq.fill(2000)("HEAVY")).toDF("v")
    val cms = Sketches.cmsBuild(all, "v")
    assert(cms.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val cands = all.distinct().unionAll(Seq("absent-x").toDF("v"))
    val exact = all.groupBy("v").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.cmsEstimate(cms, cands, "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // THE count-min guarantee: every counter a value touches includes all
    // its occurrences, so the min over rows can only overestimate
    est.foreach { case (v, e) =>
      assert(e >= exact.getOrElse(v, 0L), s"underestimate for $v")
    }
    // the heavy hitter dwarfs per-cell collision mass: estimate stays
    // within (total mass / width) of exact even in the worst row
    val total = all.count()
    assert(est("HEAVY") >= 2000L &&
      est("HEAVY") <= 2000L + total / Sketches.CmsWidth,
      s"HEAVY ${est("HEAVY")}")
    // absent value: pure collision mass, bounded the same way
    assert(est("absent-x") <= total / Sketches.CmsWidth)
  }
}
