package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization + URL-level dedup — the first curation step of
 * every web-crawl pipeline (C4 / CCNet / RefinedWeb dedupe by
 * canonical URL before any content hash is computed: a crawl sees the
 * same page under http/https, with/without `www.`, with tracking
 * params, fragments, default ports, and trailing slashes).
 *
 * Reference analog: the corpus-curation family (ref `plover.py` has no
 * web layer; this extends the pipeline surface the way p23/p32 do).
 *
 * Everything is native `functions._` (regexp on codegen'd UTF8String —
 * no UDF), so the canonical form is computed inside the one scan that
 * reads the corpus and the dedup is a single hash aggregation with
 * map-side partial combine. At 100 TB: one shuffle keyed by canonical
 * URL (near-uniform — hot hosts spread across paths), no window/sort.
 */
object UrlOps {

  /** Query params that never identify content: per-campaign tracking
   * ids. Dropped BEFORE sorting so `?utm_source=a` == bare. */
  val TrackingParams = "utm_[^=&]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid"

  /**
   * Canonical form of a URL, all in one codegen'd expression tree:
   *   1. strip the fragment (`#...`) and any `scheme://` prefix
   *      (http vs https vs scheme-less never distinguishes a page);
   *   2. host: strip userinfo (`user:pw@` — scraped hrefs carry it,
   *      the page is the same), lowercase, strip a leading `www.`,
   *      strip an explicit DEFAULT port (`:80`/`:443` — non-default
   *      ports are kept);
   *   3. path: strip trailing `/`s (so `/a/` == `/a`, and the root
   *      path collapses to the bare host); case is PRESERVED (paths
   *      are case-sensitive, hosts are not);
   *   4. query: drop tracking params, sort the survivors bytewise
   *      (param order never identifies a page), drop the `?` when
   *      nothing survives.
   *
   * r21: served by the native expression `canonicalize_url` (ONE plan
   * node — guide §7.2: the composed ~15-primitive tree internally
   * references its sub-results ~6x, so every Catalyst substitution
   * re-embedded the whole regex chain per reference; as a single node
   * the fan-out is structurally impossible). The composed builder below
   * is kept as the spec'd equivalence twin — UrlExpressionsSpec asserts
   * native == composed bit-for-bit, and the DuckDB oracles (which
   * mirror the composed tree) are untouched.
   */
  def canonicalizeUrl(url: Column): Column =
    graft.functions.UrlExpressions.canonicalizeUrl(url)

  private[graft] def canonicalizeUrlComposed(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[a-zA-Z][a-zA-Z0-9+.\\-]*://", "")
    val rawHost = regexp_extract(noScheme, "^([^/?]*)", 1)
    val host = regexp_replace(regexp_replace(
      regexp_replace(lower(rawHost), "^[^@]*@", ""),
      "^www\\.", ""), ":(80|443)$", "")
    val rest = substring(noScheme, length(rawHost) + 1, lit(1 << 30))
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    // (?i): param names are case-insensitive in the wild (UTM_SOURCE=)
    // — matching must be, since the host is case-normalized too
    val kept = array_sort(filter(split(query, "&"), p =>
      !(p.rlike(s"(?i)^($TrackingParams)(=|$$)") || p === "")))
    concat(host, path,
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit("")))
  }

  /**
   * SURT urlkey of a URL — the sort key of the CDX index every crawl
   * publishes (Common Crawl's cc-index): the canonical host's labels
   * REVERSED and comma-joined, a `)`, then the lowercased path+query.
   * Reversing the host groups a domain's pages contiguously
   * (`com,example)/a` and `com,example)/b` sort together however many
   * subdomains sit in front), which is what makes a urlkey-sorted
   * index binary-searchable by domain prefix. Ports are dropped
   * (capture identity, not lookup identity); unlike the canonical
   * form, SURT lowercases the PATH too — CDX lookup keys are
   * case-folded end to end.
   */
  def surtKey(url: Column): Column = surtKeyOfCanonical(canonicalizeUrl(url))

  /** `surtKey` over an ALREADY-canonical URL — the staging companion of
   * `registeredDomainOfCanonical` (r20): the key derivation references
   * its canonical input 3x, so composing `canonicalizeUrl` in directly
   * re-embeds the whole dozen-regex chain per reference. Producers that
   * already computed the canonical form (cdxIndex emits BOTH the urlkey
   * and the canonical url per capture) stage it as a column and derive
   * the key from the attribute. Idempotence of canonicalizeUrl makes
   * this result-identical on canonical input. */
  private[graft] def surtKeyOfCanonical(canon: Column): Column = {
    val host = regexp_replace(
      regexp_extract(canon, "^([^/?]*)", 1), ":[0-9]+$", "")
    val rest = substring(canon,
      length(regexp_extract(canon, "^([^/?]*)", 1)) + 1, lit(1 << 30))
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"),
      lower(rest))
  }

  /** Two-level public suffixes under which the registered domain is
   * THREE labels (`shop.example.co.uk` -> `example.co.uk`). A tiny,
   * documented subset of the public-suffix list — enough for the
   * common crawl TLDs; extend the set, not the algorithm. */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "co.in", "com.br",
    "com.cn", "com.mx", "co.za", "com.sg", "com.tr")

  /**
   * Registered (pay-level) domain of a URL: canonical host cut down to
   * the last two labels — three when the last two are a listed
   * two-level public suffix. Ports are stripped (a domain quota should
   * not split on :8080). Native expressions only: the suffix test is a
   * single regexp alternation over `TwoLevelSuffixes`.
   */
  def registeredDomain(url: Column): Column =
    registeredDomainOfCanonical(canonicalizeUrl(url))

  /** `registeredDomain` over an ALREADY-canonical URL (what linkGraph
   * emits): skips the re-canonicalization. canonicalizeUrl is
   * idempotent, so on canonical input this is result-identical — but
   * the canonicalize chain is a dozen regexp nodes, and a consumer
   * that derives per-edge domains from canonical edge lists (p98 pays
   * it once per union side per edge) wants the host cut alone (r20,
   * guide §2.3: don't re-compute what the producer already
   * normalized). */
  private[operators] def registeredDomainOfCanonical(canon: Column): Column = {
    val host = regexp_replace(
      regexp_extract(canon, "^([^/?]*)", 1), ":[0-9]+$", "")
    val twoLevel = TwoLevelSuffixes.map(_.replace(".", "\\.")).mkString("|")
    val labels = when(host.rlike(s"\\.($twoLevel)$$"), 3).otherwise(2)
    // keep the last `labels` dot-separated labels of the host
    val parts = split(host, "\\.")
    when(size(parts) <= labels, host)
      .otherwise(array_join(slice(parts, -labels, labels), "."))
  }

  /**
   * Domain balancing — the RefinedWeb/FineWeb anti-dominance step: no
   * registered domain may contribute more than `k` documents; within a
   * domain the BEST docs win (quality desc, ties -> smallest id, so
   * the kept set is deterministic). Emits the kept rows with their
   * (domain, domain_rank).
   *
   * Scale shape: rank-within-group with `row_number <= k` — Spark
   * plans this as WindowGroupLimit, which keeps a bounded top-k heap
   * per partition BEFORE the shuffle (map-side k-pruning, the window
   * analog of a partial aggregate), so the exchange carries at most
   * k rows per (partition, domain), not the whole crawl.
   */
  def domainCap(docs: DataFrame, k: Int, urlCol: String = "url",
                idCol: String = "doc_id", qualityCol: String = "n_chars")
      : DataFrame = {
    require(k >= 1, "domain cap must keep at least one doc")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain")
      .orderBy(col(qualityCol).desc, col(idCol).asc)
    docs
      // canonical form staged before the domain cut (r20): the cut
      // references its canonical input several times, so the composed
      // registeredDomain re-embedded the canonicalize chain per
      // reference (30 copies in p79's plan); staged, it evaluates once
      .withColumn("__canon", canonicalizeUrl(col(urlCol)))
      .withColumn("domain", registeredDomainOfCanonical(col("__canon")))
      .withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= k)
      .select(col(idCol), col("domain"), col("domain_rank"))
  }

  /**
   * URL-level decontamination — the benchmark-leakage guard that runs
   * at the URL grain (The Pile / FineWeb drop any training page whose
   * canonical URL appears in an eval set, BEFORE the n-gram checks):
   * both sides canonicalize, the benchmark set (small by nature)
   * broadcasts, and the corpus anti-joins — one scan, no corpus
   * shuffle. Matching is CANONICAL, so an eval page recorded as
   * `http://www.x.com/p/?utm_source=s` still kills the training
   * capture spelled `https://x.com/p`.
   */
  def urlDecontaminate(docs: DataFrame, benchmark: DataFrame,
                       urlCol: String = "url"): DataFrame = {
    val bench = benchmark
      .select(canonicalizeUrl(col(urlCol)).as("__bench_canonical"))
      .distinct()
    docs.withColumn("__canonical", canonicalizeUrl(col(urlCol)))
      .join(broadcast(bench),
        col("__canonical") === col("__bench_canonical"), "left_anti")
      .drop("__canonical")
  }

  /**
   * Allow/Disallow rules from raw robots.txt bodies: one
   * (rule_host, rule_prefix, rule_allow) row per directive line. A
   * documented SUBSET of the robots exclusion protocol (RFC 9309) —
   * every rule is honored regardless of its User-agent group (the
   * conservative reading a bulk-crawl consumer takes), wildcards and
   * crawl-delay are ignored, an empty `Disallow:`/`Allow:` (= no
   * rule) yields no row. `(?im)` inline flags work in both Java regex
   * and RE2, so the extraction is oracle-portable.
   */
  def robotsRules(robots: DataFrame, hostCol: String = "host",
                  bodyCol: String = "body"): DataFrame = {
    // horizontal whitespace ONLY after the colon: \s would eat the
    // newline of an empty `Disallow:` line and capture the NEXT
    // line's directive name as a prefix (found the hard way)
    def extract(directive: String, allow: Boolean) =
      robots.select(col(hostCol).as("rule_host"),
        explode(regexp_extract_all(col(bodyCol),
          lit(s"(?im)^$directive:[ \\t]*(\\S+)"), lit(1))).as("rule_prefix"),
        lit(allow).as("rule_allow"))
    extract("disallow", allow = false) unionAll extract("allow", allow = true)
  }

  /**
   * `Sitemap:` directives from raw robots.txt bodies — the discovery
   * pointer that links crawl governance's permission half (robots
   * rules) to its discovery half (sitemap parsing): real crawlers
   * find a site's sitemaps from its OWN robots file. Per RFC 9309
   * §2.2.4 the directive is a non-group record — it applies
   * host-scoped to every crawler regardless of where in the file it
   * appears — so there is deliberately no User-agent group selection
   * here, and the case-insensitive line match picks it up inside or
   * outside UA groups alike. One (host, sitemap_url) row per
   * directive line.
   *
   * Scale shape: one narrow scan over the robots table (KB-bounded
   * row per host, never the corpus), zero joins, zero shuffles — the
   * output is robots-table-bounded, small enough to BROADCAST into
   * whatever sitemap-fetch join consumes it.
   */
  def robotsSitemaps(robots: DataFrame, hostCol: String = "host",
                     bodyCol: String = "body"): DataFrame =
    robots.select(col(hostCol).as("host"),
      // horizontal whitespace only after the colon (the robotsRules
      // lesson: \s eats the newline of an empty directive line)
      explode(regexp_extract_all(col(bodyCol),
        lit("(?im)^sitemap:[ \\t]*(\\S+)"), lit(1))).as("sitemap_url"))

  /**
   * Per-host `Crawl-delay` from raw robots.txt bodies — NOT in RFC
   * 9309 (the RFC deliberately omits it) but ubiquitous in the wild
   * and honored by most crawlers, which makes it a crawl-governance
   * input a frontier scheduler must read. The conservative reading:
   * the MAX delay across every group in the file binds (a crawler
   * that can't attribute a group errs slow). Integer seconds; hosts
   * without the directive get no row (callers default — frontier
   * pacing uses 1 s).
   *
   * Scale shape: same as robotsSitemaps — one narrow scan over the
   * KB-bounded robots table plus one host-keyed max with map-side
   * combine; output is robots-bounded, broadcastable.
   */
  def robotsCrawlDelays(robots: DataFrame, hostCol: String = "host",
                        bodyCol: String = "body"): DataFrame =
    robots.select(col(hostCol).as("host"),
      // fractional delays are common ("Crawl-delay: 0.5") — capture
      // the full decimal and CEIL it: truncating to the integer
      // prefix would read 0.5 as 0, pacing that host with NO delay
      // (faster than the 1 s default for hosts with no directive at
      // all), the opposite of the conservative reading
      explode(regexp_extract_all(col(bodyCol),
        lit("(?im)^crawl-delay:[ \\t]*([0-9]+(?:\\.[0-9]+)?)"),
        lit(1))).as("__d"))
      .groupBy("host")
      .agg(max(ceil(col("__d").cast("double")).cast("long"))
        .as("crawl_delay_sec"))

  /**
   * Allow/Disallow rules of the group a SPECIFIC crawler must obey,
   * per RFC 9309 §2.2.1 group selection: lines parse into groups (a
   * clump of consecutive `User-agent:` lines names one group; the
   * rules that follow, up to the next clump, belong to it), a named
   * token matches when it is a case-insensitive PREFIX of the
   * crawler's product token, the MOST SPECIFIC match wins (longest
   * matching token; `*` matches everything at specificity 0, so any
   * named match beats it), and ALL groups at the winning specificity
   * combine — two `User-agent: graftbot` groups in one file merge
   * their rules, as the RFC requires. Rules before the first
   * `User-agent:` line belong to no group and are dropped (invalid
   * per the RFC). A selected group with no matching rules keeps
   * everything downstream, exactly like a missing robots record.
   *
   * Scale shape: the line walk (posexplode + one window for the
   * group ids + one (host, group) aggregation) runs over the ROBOTS
   * table only — one KB-bounded row per host, millions of hosts at
   * crawl scale but never the corpus — so its one small shuffle is
   * noise next to the corpus scan, which stays broadcast-joined and
   * shuffle-free in [[robotsFilter]]. Output shape matches
   * [[robotsRules]] so both feed the same filter tail.
   */
  def robotsRulesForAgent(robots: DataFrame, agent: String,
                          hostCol: String = "host",
                          bodyCol: String = "body"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lines = robots.select(col(hostCol).as("rule_host"),
      posexplode(split(col(bodyCol), "\r?\n")).as(Seq("__i", "__line")))
    val isUa = col("__ua") =!= ""
    val classified = lines.select(col("rule_host"), col("__i"),
      regexp_extract(col("__line"),
        "(?i)^user-agent:[ \\t]*(\\S+)", 1).as("__ua"),
      lower(regexp_extract(col("__line"),
        "(?i)^(allow|disallow):", 1)).as("__dir"),
      regexp_extract(col("__line"),
        "(?i)^(?:allow|disallow):[ \\t]*(\\S*)", 1).as("__prefix"))
      // directive lines only; an EMPTY Disallow:/Allow: still ends a
      // user-agent clump (it is a rule line), it just emits no rule
      .where(isUa || col("__dir") =!= "")
    val w = Window.partitionBy("rule_host").orderBy("__i")
    val groups = classified
      .withColumn("__grp", sum(
        when(isUa && coalesce(lag(isUa.cast("int"), 1).over(w),
          lit(0)) === 0, 1).otherwise(0)).over(w))
      .where(col("__grp") >= 1)
      .groupBy("rule_host", "__grp")
      .agg(
        collect_list(when(isUa, lower(col("__ua")))).as("__uas"),
        collect_list(when(!isUa && col("__prefix") =!= "",
          struct(col("__prefix").as("p"),
            (col("__dir") === "allow").as("a")))).as("__rules"))
    // specificity: longest named token that prefixes the agent; `*`
    // scores 0; non-matching tokens are out. Groups tie at the host's
    // best specificity → their rules combine.
    val score = array_max(transform(col("__uas"), t =>
      when(t === "*", lit(0))
        .when(lit(agent.toLowerCase(java.util.Locale.ROOT)).startsWith(t),
          length(t))
        .otherwise(lit(-1))))
    val wh = Window.partitionBy("rule_host")
    groups
      .withColumn("__score", score)
      .where(col("__score") >= 0)
      .withColumn("__best", max(col("__score")).over(wh))
      .where(col("__score") === col("__best"))
      .select(col("rule_host"), explode(col("__rules")).as("__r"))
      .select(col("rule_host"), col("__r.p").as("rule_prefix"),
        col("__r.a").as("rule_allow"))
  }

  /**
   * Robots-aware filtering — the crawl-governance step (a pipeline
   * re-filtering a bulk crawl against CURRENT robots rules drops pages
   * whose canonical path now falls under a Disallow): per RFC 9309, of
   * all rules whose prefix matches the canonical path+query the
   * LONGEST wins, and an equal-length tie breaks to Allow — so
   * `Allow: /public` carves its subtree out of a broader
   * `Disallow: /`. Hosts with no robots record (or no matching rule)
   * keep everything, as crawlers treat a 404. With `agent` set, only
   * the rules of the crawler's OWN RFC 9309 group bind
   * ([[robotsRulesForAgent]] — most-specific User-agent match, `*`
   * fallback); without it, every group's rules are honored (the
   * conservative bulk-crawl reading). The match appends "/"
   * to the doc path before the prefix compare: canonicalization
   * strips trailing slashes, so a directory rule `Disallow: /private/`
   * must still match its root page `/private` (and `Disallow: /` the
   * host root) without ever matching `/privateer`.
   *
   * Scale shape: rules group to ONE row per host (a robots file is
   * KB-bounded, so the per-host rule array is too) and BROADCAST into
   * a left join; the longest-match verdict is a narrow codegen'd
   * expression — array_max over the matching (length, allow) structs —
   * so the corpus is scanned ONCE and never shuffles at all (the old
   * any-match version already avoided a corpus shuffle; this keeps
   * that while adding precedence).
   */
  def robotsFilter(docs: DataFrame, robots: DataFrame,
                   urlCol: String = "url", hostCol: String = "host",
                   bodyCol: String = "body",
                   agent: Option[String] = None): DataFrame = {
    val canon = canonicalizeUrl(col(urlCol))
    val host = regexp_extract(canon, "^([^/?]*)", 1)
    // agent given → RFC 9309 group selection picks WHICH rules bind
    // this crawler; agent absent → the conservative every-group
    // reading (the bulk-crawl consumer default)
    val rules = agent match {
      case Some(a) => robotsRulesForAgent(robots, a, hostCol, bodyCol)
      case None    => robotsRules(robots, hostCol, bodyCol)
    }
    // RFC 9309 REQUIRES `*` (any char run) and `$` (end-of-path
    // anchor, meaningful only at pattern end) in path patterns (r18 —
    // rules like `Disallow: /*.pdf$` are everywhere). Wildcard rules
    // translate ONCE per rule (a robots file is KB-bounded) to an
    // anchored regex — every other regex special escaped, `*` → `.*`,
    // a TRAILING `$` restored as the anchor — and match via
    // regexp_like; plain rules keep the cheap prefix compare.
    // Precedence stays pattern-LENGTH (RFC: most octets wins).
    val isWild = col("rule_prefix").contains("*") ||
      col("rule_prefix").endsWith("$")
    val ruleRegex = concat(lit("^"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("rule_prefix"),
            "([\\\\.\\[\\]{}()+?^$|])", "\\\\$1"),
          "\\*", ".*"),
        "\\\\\\$$", "\\$"))
    // only patterns that END at a path-segment boundary can gain
    // anything from the "/"-appended retry (review-caught: running it
    // for every wild rule doubled the per-doc regex evaluations —
    // regexp_like with a per-rule column pattern recompiles per
    // evaluation, a bounded-but-real cost since rules per host are
    // KB-bounded)
    val needsSlashArm = col("rule_prefix").endsWith("/") ||
      col("rule_prefix").endsWith("/$")
    val hostRules = rules
      .groupBy("rule_host")
      .agg(collect_list(struct(
        length(col("rule_prefix")).as("l"),
        col("rule_allow").cast("int").as("a"),
        col("rule_prefix").as("p"),
        isWild.as("w"),
        needsSlashArm.as("sa"),
        ruleRegex.as("rx"))).as("__rules"))
    docs
      .withColumn("__host", host)
      .withColumn("__path",
        substring(canon, length(col("__host")) + 1, lit(1 << 30)))
      .join(broadcast(hostRules),
        col("__host") === col("rule_host"), "left")
      // (path + "/") startsWith p subsumes the plain prefix test AND
      // lets directory rules match their slash-stripped root page
      // (same "/"-append applies to the wildcard arm, so a
      // `Disallow: /dir/$` still drops its canonicalized root page);
      // struct order (l, a) makes array_max the longest-match winner
      // with the equal-length tie falling to allow (a: 1 > 0)
      .withColumn("__best", array_max(filter(col("__rules"),
        r => when(r.getField("w"),
          regexp_like(col("__path"), r.getField("rx")) ||
            (r.getField("sa") &&
              regexp_like(concat(col("__path"), lit("/")),
                r.getField("rx"))))
          .otherwise(
            concat(col("__path"), lit("/")).startsWith(r.getField("p"))))))
      .where(col("__best").isNull || col("__best").getField("a") === 1)
      .drop("__host", "__path", "rule_host", "__rules", "__best")
  }

  /**
   * URL-level dedup: one row per canonical URL, keeping the BEST
   * capture — longest content, ties to the smallest doc id (crawls
   * prefer the fullest fetch; the tie rule makes the kept id
   * deterministic). A single aggregation via struct-argmax:
   * `min(struct(-len, id))` gives the argmax row in ONE pass with a
   * map-side partial combine and ONE exchange. The struct buffer makes
   * Spark pick SortAggregate over HashAggregate — the sort is
   * per-partition on the grouping key only (no extra shuffle, no
   * global sort), still strictly cheaper than the window-rank
   * alternative, which pays the same sort WITHOUT the map-side
   * combine and ships every capture across the wire.
   *
   * Output: (canonical_url, kept_doc_id, n_dups) — `n_dups` is the
   * capture count, the signal URL-frequency filters consume.
   */
  /**
   * Redirect-chain collapse — the companion of
   * [[graft.sources.WarcSource.redirectEdges]]: (src_url, final_url)
   * mapping every redirect SOURCE to the end of its chain (a → b → c
   * yields a → c AND b → c), which is what URL-level dedup keys on —
   * a crawl captures every hop of a moved page as its own record.
   *
   * Scale shape: POINTER DOUBLING — ⌈log₂ maxHops⌉ self-joins keyed
   * on url, each halving the remaining chain depth (the subclass
   * closure's discipline; a naive per-hop loop would pay one shuffle
   * PER HOP). Chains longer than `maxHops` collapse to the node
   * 2^⌈log₂ maxHops⌉ hops in — deterministic, never an infinite loop;
   * a redirect CYCLE (a ↔ b, which real webs do contain) likewise
   * lands on a fixed element instead of hanging. The edge list is
   * DEDUPED up front and each round materializes (review-caught): a
   * real crawl captures the same redirect many times, and without the
   * distinct, k copies of each hop fan out as k^2^rounds rows; without
   * the per-round materialization the plan tree doubles every round.
   * A src with SEVERAL distinct targets (the page moved between
   * captures) keeps one row per chain — both histories are real.
   */
  def collapseRedirects(edges: DataFrame, maxHops: Int = 8): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64, "maxHops out of range")
    var f = SelfJoinMaterialize(
      edges.select(col("src_url"), col("dst_url").as("final_url"))
        .distinct())
    var hops = 1
    while (hops < maxHops) {
      val next = SelfJoinMaterialize(
        f.as("a").join(
          f.select(col("src_url").as("b_src"),
            col("final_url").as("b_final")),
          col("a.final_url") === col("b_src"), "left")
          .select(col("a.src_url").as("src_url"),
            coalesce(col("b_final"), col("a.final_url")).as("final_url"))
          .distinct())
      f.unpersist()
      f = next
      hops *= 2
    }
    f
  }

  def urlDedup(docs: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id", lenCol: String = "n_chars")
      : DataFrame =
    docs
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy("canonical_url")
      .agg(
        min(struct((-col(lenCol)).as("neg_len"), col(idCol).as("id")))
          .as("best"),
        count(lit(1)).as("n_dups"))
      .select(col("canonical_url"), col("best.id").as("kept_doc_id"),
        col("n_dups"))

  // ------------------------------------------------ sitemaps (P122)

  /**
   * Sitemap parser (sitemaps.org protocol) — the discovery half of
   * crawl governance: robots.txt (p101) says what a crawler MAY
   * fetch, the sitemap says what the site WANTS fetched, with the
   * freshness/priority metadata a frontier scheduler consumes. A site
   * publishes either a `<urlset>` of `<url>` entries (`<loc>` required;
   * `<lastmod>`, `<changefreq>`, `<priority>` optional) or a
   * `<sitemapindex>` of child `<sitemap>` references — real crawls
   * must take both, and large sites are index-first.
   *
   * Subset (regex extraction, the p92/p114 house approach — a
   * conforming-document parser, not a recovering one): tag matching is
   * case-insensitive and whitespace-tolerant, values are trimmed,
   * `<loc>` is entity-decoded per the spec's requirement that URLs be
   * entity-escaped (`&amp;` handled LAST so double-escapes resolve one
   * level, as in htmlToText); absent optional tags yield null, never
   * empty string. CDATA sections and XML namespaces-as-prefixes are
   * out of subset.
   *
   * Input: one row per fetched sitemap document (`siteCol`,
   * `bodyCol`). Output: one row per ENTRY —
   *   (site, kind 'urlset'|'sitemapindex', entry_idx, loc, lastmod,
   *    changefreq, priority)
   * — index entries carry their child-sitemap loc (+ optional
   * lastmod) with changefreq/priority null.
   *
   * Scale shape: regexp extraction runs where the body landed; ONE
   * positional generator per document; zero shuffles, zero UDFs.
   * Bodies never cross an exchange — the output is narrow metadata.
   */
  /**
   * Crawl-frontier scheduling over parsed sitemap entries — the step
   * between discovery (parseSitemaps) and fetching: a crawler must be
   * POLITE (at most `perRound` concurrent fetches per host) while
   * honoring the site's own priority hints, so the frontier is a
   * per-host queue ordered by (priority desc, lastmod desc, loc) with
   * the queue position folded into a fetch ROUND. The sitemap spec's
   * default priority is 0.5; values parse as exact DECIMAL milli-units
   * (never IEEE — 0.7*1000 must be 700 on both engines).
   *
   * Input: parseSitemaps output (urlset rows; index rows are pointers,
   * not fetchables, and are filtered here). Output:
   *   (host, loc, priority_milli, fetch_round) — round r holds each
   * host's fetches (r-1)*perRound+1 .. r*perRound, so `max(fetch_round)
   * per host` is the host's crawl depth and `count per round` the
   * global fetch-rate profile.
   *
   * Scale shape: ONE window partitioned by host — the politeness
   * domain is the natural partitioning key, and per-host sequencing is
   * inherent to the problem (a global sort would be both wrong and
   * unscalable). Skew = one giant host's queue, bounded by that host's
   * OWN sitemap size, never the corpus.
   */
  def frontierSchedule(entries: DataFrame, perRound: Int = 1): DataFrame = {
    require(perRound >= 1, "perRound must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val host = lower(regexp_extract(col("loc"), "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val prio = (coalesce(col("priority").cast("decimal(5,3)"),
      lit(BigDecimal("0.5"))) * 1000).cast("long")
    val w = Window.partitionBy("host")
      .orderBy(col("priority_milli").desc,
        col("lastmod").desc_nulls_last, col("loc"))
    entries
      .where(col("kind") === "urlset")
      .select(host.as("host"), col("loc"), col("lastmod"),
        prio.as("priority_milli"))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("fetch_round",
        expr(s"(__rn + ${perRound - 1}) div $perRound"))
      .select("host", "loc", "priority_milli", "fetch_round")
  }

  def parseSitemaps(sitemaps: DataFrame, siteCol: String = "site",
                    bodyCol: String = "body"): DataFrame = {
    val body = col(bodyCol)
    val isIndex = body.rlike("(?is)<sitemapindex[\\s>]")
    val blocks = when(isIndex,
        regexp_extract_all(body,
          lit("(?is)<sitemap\\b[^>]*>(.*?)</sitemap>"), lit(1)))
      .otherwise(
        regexp_extract_all(body,
          lit("(?is)<url\\b[^>]*>(.*?)</url>"), lit(1)))
    def field(tag: String): Column = {
      val v = trim(regexp_extract(col("__e"),
        s"(?is)<$tag\\b[^>]*>(.*?)</$tag>", 1))
      when(v =!= "", v)
    }
    def decode(c: Column): Column =
      replace(
        replace(
          replace(
            replace(
              replace(c, lit("&lt;"), lit("<")),
              lit("&gt;"), lit(">")),
            lit("&quot;"), lit("\"")),
          lit("&apos;"), lit("'")),
        lit("&amp;"), lit("&"))
    sitemaps
      .select(col(siteCol).as("site"),
        when(isIndex, "sitemapindex").otherwise("urlset").as("kind"),
        posexplode(blocks))
      .withColumnsRenamed(Map("pos" -> "entry_idx", "col" -> "__e"))
      .select(col("site"), col("kind"), col("entry_idx").cast("long"),
        decode(field("loc")).as("loc"), field("lastmod").as("lastmod"),
        field("changefreq").as("changefreq"), field("priority").as("priority"))
  }
}
