package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .as[String].collect().toSeq

  test("canonicalizeUrl: scheme, www, default ports, fragment, trailing slash") {
    // every spelling of the same page collapses to one form
    val variants = Seq(
      "https://Example.com/A/b",
      "http://example.com/A/b",
      "example.com/A/b",
      "https://www.example.com/A/b",
      "https://example.com:443/A/b",
      "http://example.com:80/A/b/",
      "HTTPS://WWW.EXAMPLE.COM/A/b",
      "https://example.com/A/b#section-3",
      "  https://example.com/A/b  ")
    assert(canon(variants: _*).toSet == Set("example.com/A/b"))
    // path case is PRESERVED (only the host lowercases)
    assert(canon("https://example.com/a/B") == Seq("example.com/a/B"))
    // a NON-default port is kept
    assert(canon("https://example.com:8443/x") == Seq("example.com:8443/x"))
    // root path collapses to the bare host
    assert(canon("https://example.com/", "https://example.com").toSet ==
      Set("example.com"))
  }

  test("canonicalizeUrl: tracking params dropped, survivors sorted, empty query elided") {
    assert(canon("https://e.com/p?b=2&a=1") == Seq("e.com/p?a=1&b=2"))
    assert(canon("https://e.com/p?utm_source=x&a=1&fbclid=abc&gclid=1&ref=hn")
      == Seq("e.com/p?a=1"))
    // all params tracking -> the '?' itself goes away
    assert(canon("https://e.com/p?utm_campaign=c&utm_medium=m") == Seq("e.com/p"))
    // a bare 'utm_source' with no '=' is still tracking; 'utmx=1' is NOT
    assert(canon("https://e.com/p?utm_source&utmx=1") == Seq("e.com/p?utmx=1"))
    // 'refresh=1' must not be caught by the 'ref' rule
    assert(canon("https://e.com/p?refresh=1") == Seq("e.com/p?refresh=1"))
    // empty fragments of the query ('a=1&&b=2') don't leave holes
    assert(canon("https://e.com/p?a=1&&b=2") == Seq("e.com/p?a=1&b=2"))
  }

  test("urlDedup: one row per canonical URL, longest capture kept, ties to min id") {
    val docs = Seq(
      // group 1: three spellings, lengths 10/30/20 -> doc 11 kept
      (10L, 10L, "https://site.com/x?a=1"),
      (11L, 30L, "http://www.site.com:80/x/?a=1&utm_source=s"),
      (12L, 20L, "site.com:443/x?a=1#frag"),
      // group 2: equal lengths -> smallest id kept
      (20L, 15L, "https://other.com/y"),
      (21L, 15L, "https://other.com/y/"),
      // group 3: singleton
      (30L, 9L, "https://solo.com/z?b=2&a=1")
    ).toDF("doc_id", "n_chars", "url")
    val out = UrlOps.urlDedup(docs).orderBy("canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("other.com/y", 20L, 2L),
      ("site.com/x?a=1", 11L, 3L),
      ("solo.com/z?a=1&b=2", 30L, 1L)))
  }

  test("urlDedup plan: one aggregation pass, map-side partial combine, one exchange, no window") {
    val docs = Seq((1L, 5L, "https://a.com/1")).toDF("doc_id", "n_chars", "url")
    val plan = UrlOps.urlDedup(docs).queryExecution.executedPlan.toString
    // struct-argmax aggregates (SortAggregate — struct buffers aren't
    // hash-aggregable); what matters at scale: a partial combine BEFORE
    // the single exchange, and no Window (which would ship every
    // capture and sort without combining)
    assert(plan.contains("partial_min"), plan)
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Window"), plan)
  }
}
