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
    // userinfo never distinguishes a page (scraped hrefs carry it)
    assert(canon("https://user:pw@example.com/A/b",
      "https://bot@example.com/A/b").toSet == Set("example.com/A/b"))
    assert(domains("https://crawler@shop.example.co.uk/x") ==
      Seq("example.co.uk"))
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
    // param-name case is insignificant in the wild: UTM_SOURCE= drops
    // too (the host is case-normalized, the filter must be as well)
    assert(canon("https://e.com/p?UTM_SOURCE=x&a=1&FbClId=z") == Seq("e.com/p?a=1"))
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

  test("canonicalizeUrl/registeredDomain: junk crawl inputs never throw") {
    // the canonicalizer sees arbitrary scraped strings — every one of
    // these must produce SOME deterministic string, never an error
    val junk = Seq("", "   ", "???", "http://", "https://", "//", "#",
      "?a=1", "mailto:x@y.z", "javascript:void(0)",
      "http://[::1]:8080/x", "a" * 5000,
      "https://example.com/" + ("p/" * 500),
      "http://.../x", "http:///nohost", "％ｆｕｌｌｗｉｄｔｈ")
    val out = junk.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"),
        UrlOps.registeredDomain(col("url")).as("d"))
      .collect()
    assert(out.length == junk.size)
    out.foreach(r => { assert(r.getString(0) != null); assert(r.getString(1) != null) })
    // and determinism: same input, same canonical
    val again = junk.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url"))).collect().map(_.getString(0))
    assert(again.toSeq == out.map(_.getString(0)).toSeq)
  }

  private def domains(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.registeredDomain(col("url")).as("d"))
      .as[String].collect().toSeq

  test("registeredDomain: subdomains cut, two-level suffixes keep three labels, ports ignored") {
    assert(domains(
      "https://example.com/x",
      "https://www.example.com/x",
      "https://blog.example.com/x",
      "https://a.b.c.example.com/x",
      "https://EXAMPLE.com:8443/x").toSet == Set("example.com"))
    assert(domains(
      "https://shop.example.co.uk/x",
      "https://example.co.uk/x",
      "https://a.b.example.co.uk/x").toSet == Set("example.co.uk"))
    // a host that IS a two-label name under a normal TLD stays whole
    assert(domains("https://couk.uk/x") == Seq("couk.uk"))
    // 'co.jp' et al. from the suffix set
    assert(domains("https://www.shop.maker.co.jp/x") == Seq("maker.co.jp"))
    // bare single-label host (intranet style) passes through
    assert(domains("http://localhost:8080/x") == Seq("localhost"))
  }

  test("domainCap: at most k per registered domain, best quality first, deterministic ties") {
    val docs = Seq(
      // domain a.com: 4 docs, cap 2 -> ids 3 (len 50) and 1 (len 40)
      (1L, 40L, "https://a.com/1"),
      (2L, 30L, "https://www.a.com/2"),
      (3L, 50L, "https://blog.a.com/3"),
      (4L, 30L, "https://a.com/4"),
      // domain b.co.uk: 3 docs all tied -> smallest ids 10, 11
      (10L, 20L, "https://b.co.uk/1"),
      (11L, 20L, "https://shop.b.co.uk/2"),
      (12L, 20L, "https://b.co.uk/3")
    ).toDF("doc_id", "n_chars", "url")
    val out = UrlOps.domainCap(docs, k = 2).orderBy("domain", "domain_rank")
      .as[(Long, String, Int)].collect().toSeq
    assert(out == Seq(
      (3L, "a.com", 1), (1L, "a.com", 2),
      (10L, "b.co.uk", 1), (11L, "b.co.uk", 2)))
  }

  test("domainCap plan: WindowGroupLimit prunes to k per partition before the shuffle") {
    // a parquet source, not a LocalRelation — the InferWindowGroupLimit
    // rule skips relations whose row count is statically known-small
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .withColumn("url", concat(lit("https://e-"), pmod(col("doc_id"), lit(7)),
        lit(".com/d/"), col("doc_id")))
    val plan = UrlOps.domainCap(docs, k = 3).queryExecution.executedPlan.toString
    // Partial BEFORE the exchange (map-side k-pruning), Final after
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"), plan)
  }

  test("urlDecontaminate: canonical matching across spellings, benchmark broadcasts") {
    val train = Seq(
      (1L, "https://x.com/p"),
      (2L, "https://x.com/q?a=1"),
      (3L, "https://safe.com/r")
    ).toDF("doc_id", "url")
    // the eval set records the SAME pages under different spellings —
    // string matching would miss both
    val bench = Seq(
      "http://www.x.com/p/?utm_source=s",
      "X.COM:443/q?utm_campaign=c&a=1#frag"
    ).toDF("url")
    val kept = UrlOps.urlDecontaminate(train, bench)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    // and the helper column does not leak into the output
    assert(UrlOps.urlDecontaminate(train, bench).columns.toSeq ==
      Seq("doc_id", "url"))
    val plan = UrlOps.urlDecontaminate(train, bench)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")), plan)
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

  test("robotsRules: Allow and Disallow lines, empty directives ignored") {
    val robots = Seq(("a.com",
      "User-agent: *\nAllow: /ok\nDisallow:\nDisallow: /private\n" +
        "disallow:\t/Mixed/Case\nCrawl-delay: 5\nAllow:\nDisallow: /tmp"))
      .toDF("host", "body")
    val rules = UrlOps.robotsRules(robots).orderBy("rule_prefix")
      .as[(String, String, Boolean)].collect().toSeq
    // case-insensitive directive, tab after colon, last line without \n;
    // the EMPTY Disallow/Allow must NOT swallow the next line's directive
    assert(rules == Seq(("a.com", "/Mixed/Case", false),
      ("a.com", "/ok", true), ("a.com", "/private", false),
      ("a.com", "/tmp", false)))
  }

  test("robotsFilter: host-scoped prefix drop, unknown hosts keep all") {
    val docs = Seq(
      (1L, "https://www.A.com/private/x?q=1"), // blocked: /private prefix
      (2L, "https://a.com/privateer"),         // blocked: PREFIX semantics
      (3L, "https://a.com/public/private"),    // kept: not a path prefix
      (4L, "https://b.com/private/x"))         // kept: no robots for b.com
      .toDF("doc_id", "url")
    val robots = Seq(("a.com", "User-agent: *\nDisallow: /private\n"))
      .toDF("host", "body")
    val kept = UrlOps.robotsFilter(docs, robots).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(3L, 4L))
  }

  test("robotsFilter: RFC 9309 longest-match, Allow carve-outs, tie breaks to allow") {
    val docs = Seq(
      (1L, "https://a.com/x"),            // Disallow / wins (only match)
      (2L, "https://a.com/public/page"),  // Allow /public (7) > Disallow / (1)
      (3L, "https://a.com/public/secret/k"), // Disallow /public/secret (14) > Allow /public (7)
      (4L, "https://a.com/"),             // host root: Disallow / matches "" + "/"
      (5L, "https://b.com/dup"),          // equal length /dup vs /dup: allow wins
      (6L, "https://b.com/other"))        // no matching rule at all: kept
      .toDF("doc_id", "url")
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /\nAllow: /public\n" +
        "Disallow: /public/secret\n"),
      ("b.com", "Disallow: /dup\nAllow: /dup\n"))
      .toDF("host", "body")
    val kept = UrlOps.robotsFilter(docs, robots).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(2L, 5L, 6L))
  }

  test("robotsRulesForAgent: RFC 9309 group selection — prefix match, longest token, * fallback") {
    val body =
      "User-agent: *\nDisallow: /all\n" +
        "User-agent: graft\nDisallow: /short\n" +
        "User-agent: GRAFTBOT\nDisallow: /long\n" + // longest match wins (case-insensitive)
        "User-agent: otherbot\nDisallow: /other\n"  // never matches GraftBot
    val robots = Seq(("a.com", body)).toDF("host", "body")
    def rulesFor(agent: String) =
      UrlOps.robotsRulesForAgent(robots, agent)
        .select("rule_prefix").as[String].collect().toSeq.sorted
    // graftbot (8) beats graft (5) beats * (0); otherbot is out
    assert(rulesFor("GraftBot/1.0") == Seq("/long"))
    // an agent only `graft` prefixes falls to that group
    assert(rulesFor("graftling") == Seq("/short"))
    // no named token matches → the * group binds
    assert(rulesFor("unrelatedbot") == Seq("/all"))
  }

  test("robotsRulesForAgent: UA clumps share rules; tied-token groups combine; pre-group rules drop") {
    val body =
      "Disallow: /orphan\n" +                       // before any group: invalid, dropped
        "User-agent: alpha\nUser-agent: graftbot\nDisallow: /a\n" + // clump: one group, two tokens
        "User-agent: beta\nDisallow: /b\n" +
        "User-agent: graftbot\nDisallow: /c\nAllow: /c/ok\n" // same winning token: combines
    val robots = Seq(("a.com", body)).toDF("host", "body")
    val rules = UrlOps.robotsRulesForAgent(robots, "graftbot")
      .select("rule_prefix", "rule_allow").as[(String, Boolean)]
      .collect().toSeq.sorted
    assert(rules == Seq(("/a", false), ("/c", false), ("/c/ok", true)))
  }

  test("robotsFilter with agent: the crawler's own group binds, not every group") {
    val docs = Seq(
      (1L, "https://a.com/starblocked/x"), // * says block — but graftbot's group binds: kept
      (2L, "https://a.com/mine/x"),        // graftbot's own Disallow: blocked
      (3L, "https://b.com/anything"),      // b.com selects graftbot's EMPTY group: kept
      (4L, "https://c.com/starblocked/x")) // c.com has only *: its rules bind
      .toDF("doc_id", "url")
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /starblocked\n" +
        "User-agent: graftbot\nDisallow: /mine\n"),
      // an empty Disallow ends the clump AND yields no rule — the
      // selected group then keeps everything, like a 404
      ("b.com", "User-agent: graftbot\nDisallow:\n" +
        "User-agent: *\nDisallow: /\n"),
      ("c.com", "User-agent: *\nDisallow: /starblocked\n"))
      .toDF("host", "body")
    val kept = UrlOps.robotsFilter(docs, robots, agent = Some("GraftBot/1.0"))
      .orderBy("doc_id").select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 3L))
    // without an agent the conservative all-groups reading still
    // holds: every Disallow above binds, so nothing survives
    val conservative = UrlOps.robotsFilter(docs, robots)
      .orderBy("doc_id").select("doc_id").as[Long].collect().toSeq
    assert(conservative == Seq())
  }

  test("robotsFilter: directory rules match their slash-stripped root page") {
    // canonicalizeUrl strips the trailing slash, so /private/ (the page)
    // canonicalizes to path /private — a `Disallow: /private/` directory
    // rule must still drop it, while NOT touching /privateer
    val docs = Seq(
      (1L, "https://a.com/private/"),  // directory root page: blocked
      (2L, "https://a.com/private/x"), // inside the directory: blocked
      (3L, "https://a.com/privateer")) // not under /private/: kept
      .toDF("doc_id", "url")
    val robots = Seq(("a.com", "Disallow: /private/\n")).toDF("host", "body")
    val kept = UrlOps.robotsFilter(docs, robots).orderBy("doc_id")
      .select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(3L))
  }

  test("parseSitemaps: urlset entries, optional fields, entity decoding") {
    val body =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://a.com/p?x=1&amp;y=2</loc>
        |    <lastmod> 2024-03-05 </lastmod>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |  </url>
        |  <URL><LOC>https://a.com/only-loc&amp;lt;</LOC></URL>
        |</urlset>""".stripMargin
    val out = UrlOps.parseSitemaps(Seq(("a.com", body)).toDF("site", "body"))
      .orderBy("entry_idx").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("kind") == "urlset"))
    val r0 = out(0)
    // entity-decoded loc, trimmed lastmod, all optionals present
    assert(r0.getAs[String]("loc") == "https://a.com/p?x=1&y=2")
    assert(r0.getAs[String]("lastmod") == "2024-03-05")
    assert(r0.getAs[String]("changefreq") == "daily")
    assert(r0.getAs[String]("priority") == "0.8")
    val r1 = out(1)
    // mixed-case tags parse; double-escape resolves ONE level; absent
    // optionals are null, never ""
    assert(r1.getAs[String]("loc") == "https://a.com/only-loc&lt;")
    assert(r1.isNullAt(r1.fieldIndex("lastmod")) &&
      r1.isNullAt(r1.fieldIndex("changefreq")) &&
      r1.isNullAt(r1.fieldIndex("priority")))
  }

  test("parseSitemaps: sitemapindex routes to child-sitemap entries") {
    val body =
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <sitemap><loc>https://a.com/sitemap-0.xml</loc>
        |    <lastmod>2024-01-01</lastmod></sitemap>
        |  <sitemap><loc>https://a.com/sitemap-1.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val df = Seq(("a.com", body), ("b.com", "<urlset></urlset>"))
      .toDF("site", "body")
    val out = UrlOps.parseSitemaps(df).orderBy("site", "entry_idx").collect()
    // the empty urlset yields zero rows, not a null row
    assert(out.length == 2 && out.forall(_.getAs[String]("site") == "a.com"))
    assert(out.forall(_.getAs[String]("kind") == "sitemapindex"))
    assert(out.map(_.getAs[String]("loc")).toSeq ==
      Seq("https://a.com/sitemap-0.xml", "https://a.com/sitemap-1.xml"))
    assert(out(0).getAs[String]("lastmod") == "2024-01-01" &&
      out(1).isNullAt(out(1).fieldIndex("lastmod")))
    // bodies stay where they landed: generator only, zero exchanges
    val plan = UrlOps.parseSitemaps(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("frontierSchedule: per-host politeness rounds, priority defaulting, ties") {
    val entries = Seq(
      // host a: four fetchables with mixed priority/lastmod presence
      ("s", "urlset", 0L, "https://A.com/low", null, null, "0.1"),
      ("s", "urlset", 1L, "https://a.com/high", null, null, "0.9"),
      ("s", "urlset", 2L, "https://a.com/default-new", "2024-06-01", null, null),
      ("s", "urlset", 3L, "https://a.com/default-old", "2023-01-01", null, null),
      // host b: a single entry, and an index row that must NOT be fetched
      ("s", "urlset", 4L, "https://b.com/only", null, null, null),
      ("s", "sitemapindex", 5L, "https://b.com/sitemap.xml", null, null, null)
    ).toDF("site", "kind", "entry_idx", "loc", "lastmod", "changefreq",
      "priority")
    val out = UrlOps.frontierSchedule(entries, perRound = 2)
      .orderBy("host", "fetch_round", "loc").collect()
    // index pointer filtered; host parsed from loc and LOWERCASED
    assert(out.length == 5 && out.map(_.getAs[String]("host")).distinct.toSeq
      == Seq("a.com", "b.com"))
    // a.com order: 0.9 > default(0.5, newer lastmod first) > default > 0.1,
    // folded into rounds of 2
    val a = out.filter(_.getAs[String]("host") == "a.com")
      .map(r => (r.getAs[String]("loc"), r.getAs[Long]("priority_milli"),
        r.getAs[Long]("fetch_round")))
    // (display sort is by loc STRING within a round: 'A' < 'a')
    assert(a.toSeq == Seq(
      ("https://a.com/default-new", 500L, 1L),
      ("https://a.com/high", 900L, 1L),
      ("https://A.com/low", 100L, 2L),
      ("https://a.com/default-old", 500L, 2L)))
    assert(out.filter(_.getAs[String]("host") == "b.com")
      .map(_.getAs[Long]("fetch_round")).toSeq == Seq(1L))
  }

  test("robotsCrawlDelays: conservative max across groups, absent-safe") {
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n" +
        "User-agent: bot\ncrawl-delay: 10\n"), // max of 2 and 10, any case
      ("b.com", "User-agent: *\nDisallow: /\n"), // no directive: no row
      ("c.com", "CRAWL-DELAY: 7\n"))
      .toDF("host", "body")
    val out = UrlOps.robotsCrawlDelays(robots).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a.com", 10L), ("c.com", 7L)))
  }

  test("robotsSitemaps: case-insensitive, group-independent, empty-safe") {
    val robots = Seq(
      // directive above, inside, and below UA groups — ALL surface
      // (RFC 9309 §2.2.4: Sitemap is a non-group record); case varies
      ("a.com", "Sitemap: https://a.com/sm1.xml\n" +
        "User-agent: *\nDisallow: /private\n" +
        "sitemap: https://a.com/sm2.xml\n" +
        "User-agent: bot\nDisallow: /\n" +
        "SITEMAP: https://a.com/sm3.xml"),
      // an empty Sitemap: line (no URL) yields no row
      ("b.com", "User-agent: *\nAllow: /\nSitemap:\n"),
      // no directive at all
      ("c.com", "User-agent: *\nDisallow: /tmp\n"))
      .toDF("host", "body")
    val out = UrlOps.robotsSitemaps(robots)
      .orderBy("host", "sitemap_url")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("a.com", "https://a.com/sm1.xml"),
      ("a.com", "https://a.com/sm2.xml"),
      ("a.com", "https://a.com/sm3.xml")))
    // one narrow scan: no joins, no exchanges before the sort
    val plan = UrlOps.robotsSitemaps(robots)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("robotsCrawlDelays: fractional delays round UP, never truncate to zero") {
    val robots = Seq(
      // the common 'Crawl-delay: 0.5' used to parse its integer PREFIX
      // as 0 — pacing the host with NO delay, faster than the 1 s
      // default for hosts with no directive at all
      ("a.com", "User-agent: *\nCrawl-delay: 0.5\n"),
      ("b.com", "Crawl-delay: 2.25\n"), // ceil -> 3
      ("c.com", "Crawl-delay: 3\nCrawl-delay: 1.5\n")) // max(3, ceil 2)
      .toDF("host", "body")
    val out = UrlOps.robotsCrawlDelays(robots).orderBy("host")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a.com", 1L), ("b.com", 3L), ("c.com", 3L)))
  }

  test("robots wildcards: *, trailing-$ anchor, pattern-length precedence") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "https://a.com/p/1.pdf"),      // dropped: /*.pdf$
      (2L, "https://a.com/p/2.pdf"),      // kept: longer Allow /p/2*.pdf$
      (3L, "https://a.com/p/3.html"),     // kept: anchor must not over-match
      (4L, "https://a.com/p/3.pdf.html"), // kept: $ anchors at END
      (5L, "https://a.com/mid/x/deep/z"), // dropped: mid-pattern wildcard
      (6L, "https://a.com/a+b/x"),        // dropped: '+' escapes as literal
      (7L, "https://a.com/aab/x")         // kept: '+' is NOT a regex repeat
    ).toDF("doc_id", "url")
    // the '+' rule carries a '*' so it takes the WILDCARD/regex arm —
    // a broken escape class would match /aab via the regex repeat
    // (review-caught: a plain /a+b rule tests only the prefix arm)
    val robots = Seq(("a.com",
      "User-agent: *\nDisallow: /*.pdf$\nAllow: /p/2*.pdf$\n" +
        "Disallow: /mid/*/deep\nDisallow: /a+b*\n")).toDF("host", "body")
    val kept = UrlOps.robotsFilter(docs, robots).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L, 7L), kept)
    // a trailing-$ directory rule still drops its canonicalized root
    // page (the "/"-append applies to the wildcard arm too)
    val d2 = Seq((1L, "https://b.com/dir/"), (2L, "https://b.com/dirx"))
      .toDF("doc_id", "url")
    val r2 = Seq(("b.com", "User-agent: *\nDisallow: /dir/$\n"))
      .toDF("host", "body")
    val k2 = UrlOps.robotsFilter(d2, r2).collect().map(_.getLong(0)).toSet
    assert(k2 == Set(2L), k2)
  }

  test("collapseRedirects: chains land on terminals, cycles terminate") {
    // a -> b -> c -> F plus a lone x -> Y: every hop maps to the end
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "F"), ("x", "Y"))
      .toDF("src_url", "dst_url")
    val got = UrlOps.collapseRedirects(edges).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got == Map("a" -> "F", "b" -> "F", "c" -> "F", "x" -> "Y"), got)
    // a chain LONGER than maxHops collapses deterministically to the
    // node 2^ceil(log2 maxHops) hops in, never loops forever
    val long = (0 until 12).map(i => (s"n$i", s"n${i + 1}"))
      .toDF("src_url", "dst_url")
    val l = UrlOps.collapseRedirects(long, maxHops = 4).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(l("n0") == "n4", l) // 4 hops in (2 doublings)
    // a 2-cycle terminates deterministically (every real web has one)
    val cyc = Seq(("p", "q"), ("q", "p")).toDF("src_url", "dst_url")
    val c = UrlOps.collapseRedirects(cyc).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(c == Map("p" -> "p", "q" -> "q"), c)
    // DUPLICATE captures of the same redirect (the real-crawl norm)
    // must not fan out through the doubling joins (review-caught):
    // 3 copies per hop would otherwise give 3^8 rows per source
    val dup = Seq.fill(3)(Seq(("a", "b"), ("b", "c"))).flatten
      .toDF("src_url", "dst_url")
    val d = UrlOps.collapseRedirects(dup).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(d.length == 2 && d.toMap == Map("a" -> "c", "b" -> "c"),
      d.toSeq)
  }
}
