package graft

import graft.operators.SubclassClosure

/** Closure semantics: transitivity, cycle termination, depth bound, hub
 * cutoff (ref: /root/reference/app/app/plover.py:1620-1720). */
class SubclassClosureSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(rows: (String, String)*) =
    rows.toDF("ancestor", "descendant")

  private def result(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("transitive closure of a chain") {
    val closure = SubclassClosure.compute(pairs("a" -> "b", "b" -> "c", "c" -> "d"))
    assert(result(closure) == Set("a" -> "b", "b" -> "c", "c" -> "d",
      "a" -> "c", "b" -> "d", "a" -> "d"))
  }

  test("cycles terminate and self-pairs are dropped") {
    val closure = SubclassClosure.compute(pairs("a" -> "b", "b" -> "a", "b" -> "c"))
    assert(result(closure) == Set("a" -> "b", "b" -> "a", "a" -> "c", "b" -> "c"))
  }

  test("maxDepth truncates deep lineages") {
    val chain = (0 until 6).map(i => s"n$i" -> s"n${i + 1}")
    val closure = SubclassClosure.compute(pairs(chain: _*), maxDepth = 3)
    val res = result(closure)
    assert(res.contains("n0" -> "n3")) // depth 3 reachable
    assert(!res.contains("n0" -> "n4")) // depth 4 truncated
  }

  test("hub ancestors with more than hubCutoff descendants are dropped entirely") {
    val hubEdges = (1 to 10).map(i => "hub" -> s"d$i")
    val closure = SubclassClosure.compute(
      pairs((hubEdges :+ ("small" -> "x")): _*), hubCutoff = 5)
    val res = result(closure)
    assert(!res.exists(_._1 == "hub"))
    assert(res.contains("small" -> "x"))
  }

  test("dropAncestorPrefixes removes configured namespaces") {
    val closure = SubclassClosure.compute(
      pairs("biolink:a" -> "x", "other:b" -> "y"),
      dropAncestorPrefixes = Seq("biolink:"))
    assert(result(closure) == Set("other:b" -> "y"))
  }
}
