package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * HTML-to-text extraction + link-graph construction — the step BEFORE
 * everything the corpus pipeline does: a crawl's response records hold
 * raw HTML, and the extracted text (Common Crawl's WET form, which
 * `WarcSource.export(wet = true)` writes and p91 consumes) is produced
 * by exactly this operator. The link extractor feeds the other derived
 * artifact of a crawl: the host/page web graph behind PageRank-style
 * quality signals.
 *
 * Reference analog: the corpus-ingest family (ref `plover.py` has no
 * web layer; this extends the pipeline surface the way WarcSource and
 * UrlOps do).
 *
 * The extractor is a DETERMINISTIC regex chain (a documented
 * simplification of trafilatura/jusText: no DOM, no per-node
 * classifier) chosen so every step is a codegen'd native expression
 * that runs inside the one scan that reads the page — and so the same
 * chain is expressible in ANSI SQL for the DuckDB oracle. The
 * STRUCTURAL patterns (block breaks, href/base extraction) are
 * RE2-safe (no backreferences, no lookaround); the tag-strip and
 * anchor-element patterns use Java-only constructs (a tempered
 * lookahead, possessive-style walks) — fine because the oracles
 * re-derive expected text from the fixture formulas closed-form and
 * never execute these patterns. At 100 TB: a narrow projection, zero
 * shuffles; the link graph adds one explode + one distinct keyed by
 * (src, dst).
 */
object Html {

  /** Browser-consistent attribute walk for STRIP and ELEMENT patterns:
   * quoted values matter only immediately after `=` (HTML5's rule —
   * a `>` inside `="..."`/`='...'` does not end the tag), a lone
   * quote anywhere else is a plain character (`alt=John's`,
   * `<p 'x>y'>` — browsers end the tag at that `>`, and so does
   * this), unquoted values run to whitespace or `>` whatever
   * characters they contain. NOT used by hrefPattern, whose stricter
   * walk is what makes href-in-quoted-value phantoms impossible; a
   * lone-quote-tolerant walk there would re-open them.
   *
   * Backtracking discipline (this is load-bearing, not style): every
   * unit is POSSESSIVE and plain characters are consumed as RUNS
   * (`[^>=<]++`), not one alternation iteration each. java.util.regex
   * recurses once per alternation iteration, so the old per-char walk
   * threw StackOverflowError — an Error, which KILLS the Spark task —
   * on a ~3 KB tag region (long unquoted attribute soup, or a stray
   * `<name` followed by kilobytes of prose before the next `>`), even
   * on a successful match. Possessive units also make the walk
   * atomic: a failed parse is never re-explored, so the old
   * exponential blowup (an unclosed `<a>` followed by nested
   * `<b c="d">` tags doubled the match time per tag — `='d'` parsed
   * as a quote unit, as `=[^\s>]*` at four lengths, or char-by-char)
   * cannot occur; alternatives are disjoint on their first character,
   * so the possessive walk never changes what matches, only how.
   * Possessive GROUP loops also run iteratively in java.util.regex
   * (measured: 8000 units, default stack, fine) where lazy ones
   * recurse per unit — which is why AnchorElemPattern's inner loop is
   * possessive too. The `{0,10000}+` bound is a sanity cap on units
   * per tag (10000 attribute/`<`/run units in ONE tag is far past any
   * real page): past it the region simply stops matching as a tag. */
  private val AttrWalk: String =
    "(?:[^>=<]++|<|=\\s*+\"[^\"]*+\"|=\\s*+'[^']*+'|=[^\\s>]*+){0,10000}+"

  /** Tags whose CLOSE (or the void br/hr) ends a text block — each
   * becomes a newline so block structure survives tag stripping. */
  private val BlockBreak =
    "(?i)(?:<(?:br|hr)\\s*/?>|</(?:p|div|h[1-6]|li|tr|title|ul|ol|table|blockquote|pre|section|article|header|footer)\\s*>)"

  /**
   * Extracted text of an HTML page, all in one codegen'd expression
   * tree:
   *   1. drop `<script>`/`<style>` elements WITH their contents
   *      (non-greedy to the first matching close — script bodies may
   *      contain other tags) and HTML comments;
   *   2. turn block-level closes (and `<br>`/`<hr>`) into newlines so
   *      paragraphs stay separate lines;
   *   3. strip every remaining tag;
   *   4. decode character references in ONE native pass
   *      (`HashExpressions.decodeHtmlEntities`, r18 — the full
   *      practical set: numeric `&#ddd;`/`&#xhh;`, the HTML 4
   *      Latin-1 table, typographic/symbol names; previously only the
   *      core five decoded and every `&eacute;`/`&#233;` leaked into
   *      the corpus as source text). The linear pass never rescans
   *      its output, so double-encoded `&amp;lt;` correctly yields
   *      the literal text `&lt;`;
   *   5. normalize whitespace: collapse runs of spaces/tabs/CRs/
   *      no-break spaces (`&nbsp;` decodes to U+00A0 — text analysis
   *      wants a plain space), trim each line, drop empty lines, join
   *      with `\n`.
   */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val broken = regexp_replace(noComment, BlockBreak, "\n")
    val stripped = regexp_replace(broken, AnyTagPattern, "")
    val decoded =
      graft.functions.HashExpressions.decodeHtmlEntities(stripped)
    val collapsed = regexp_replace(decoded, "[ \\t\\r\\u00a0]+", " ")
    array_join(
      filter(transform(split(collapsed, "\n"), l => trim(l)), l => l =!= ""),
      "\n")
  }

  /** The attribute-walking prefix shared by extractLinks/extractBase:
   * from the tag name, repeatedly consume either a plain character
   * (anything but `>`, a quote, or `=`) or a whole `=value` unit —
   * quoted values consumed ATOMICALLY — so an `href=` substring
   * INSIDE a quoted attribute value (`title="see href=foo"`,
   * `onclick="go href=evil"`) can never be matched as the href
   * attribute, whatever whitespace the value carries. The value
   * capture then takes either quote style (quote kept, stripped by
   * the caller) or an unquoted run to the first
   * whitespace/quote/`>`; fragments are cut at extraction (`#...`
   * never distinguishes a page — the canonicalizer would drop them
   * anyway). */
  // Same backtracking discipline as AttrWalk (possessive units, runs
  // not chars, bounded iterations): the old reluctant per-char walk
  // recursed once per character and overflowed the stack on a ~3 KB
  // attribute region before the href. Determinism needs the walk to
  // STOP at the href attribute instead of relying on reluctant
  // expansion, so each unit is (optional ws +) an `=value` unit, a
  // word run that is NOT `href[ ]*=` (the lookahead), or a stray `<`;
  // the walk therefore halts exactly at the ws before a real href and
  // the possessive tail consumes it. Quotes stay EXCLUDED from plain
  // runs (the strict walk) — that strictness is what makes
  // href-in-quoted-value phantoms impossible.
  private def hrefPattern(tag: String): String =
    strictAttrPattern(tag, "href", valueStops = "#")

  /** ONE builder for both strict single-attribute extractors (the
   * backtracking discipline above is load-bearing and must not be
   * maintained in two drifting copies): `valueStops` adds chars that
   * END an attribute value — href passes "#" so fragments never enter
   * link targets; generic attributes pass none. */
  private def strictAttrPattern(tag: String, attr: String,
                                valueStops: String): String =
    "(?is)<" + tag + "\\b(?:\\s*+(?:=\\s*+\"[^\"]*+\"|=\\s*+'[^']*+'" +
      "|=[^\\s>'\"]*+|(?!" + attr + "\\s*+=)[^\\s>'\"=<]++|<)){0,10000}+" +
      "\\s++" + attr + "\\s*+=\\s*+" +
      // quoted alternatives terminate ONLY on the matching quote (plus
      // valueStops): a legal quoted value may contain '>' or the OTHER
      // quote char (content="a > 'b', noindex") and truncating there
      // dropped governance tokens after it (advice-caught). This is
      // the HTML5 tokenizer's reading — a quoted value runs to its
      // matching quote even across '>', including the malformed
      // unterminated-quote case, where browsers swallow to the next
      // quote too. Two damage bounds (review-caught): the lookahead
      // REQUIRES the terminator to exist (a quote unterminated to EOF
      // fails the match and degrades locally), and the run is capped
      // at 4096 chars — legal attribute values live far below it, so
      // a pathological document degrades instead of swallowing
      // megabytes. Unquoted values still stop at whitespace/quote/'>'.
      "(\"[^\"" + valueStops + "]{0,4096}+(?=[\"" + valueStops + "])" +
      "|'[^'" + valueStops + "]{0,4096}+(?=['" + valueStops + "])" +
      "|[^\\s\"'>" + valueStops + "]++)"

  /** Raw `href` targets of every `<a>` tag — quoted (either style) or
   * UNQUOTED (`<a href=/page>`, legal HTML and common on old pages),
   * one per tag in document order, extracted by the quote-skipping
   * attribute walk (`hrefPattern`) so neither a `data-href` attribute
   * nor an `href=` substring inside a quoted value yields a phantom
   * link. */
  def extractLinks(html: Column): Column =
    transform(
      regexp_extract_all(html, lit(hrefPattern("a")), lit(1)),
      v => regexp_replace(v, "^[\"']", ""))

  /** Generic single-attribute extractor in hrefPattern's strict-walk
   * style (quoted values atomic, attr-name lookahead halts the walk),
   * minus href's `#` fragment stop — a generic attribute value (`rel`,
   * `name`, `content`) may legitimately contain `#`. Capture keeps the
   * opening quote (strip with `^["']` like hrefPattern consumers). */
  private def attrPattern(tag: String, attr: String): String =
    strictAttrPattern(tag, attr, valueStops = "")

  private def attrOf(tag: Column, tagName: String, attr: String): Column =
    regexp_replace(regexp_extract(tag, attrPattern(tagName, attr), 1),
      "^[\"']", "")

  // --------------------------------------- meta-robots governance (P143)

  private val MetaTagPattern: String = "(?is)<meta\\b" + AttrWalk + "/?>"
  private val AnchorOpenPattern: String = "(?is)<a\\b" + AttrWalk + ">"

  /** Page-level robots META directives (the governance half robots.txt
   * p101 can't see — the PAGE's own `<meta name=robots>`): struct
   * (noindex, nofollow), each true iff any `<meta>` whose `name` is
   * `robots` (case-insensitive, either attribute order, any quote
   * style) carries the token — or `none`, which per the original
   * robots-meta convention means both — in its comma/space-separated
   * `content` list. Token match is exact (`noindexfoo` doesn't count;
   * a `description` meta whose content says "noindex" doesn't
   * either). X-Robots-Tag, the HTTP-header twin, rides WARC headers
   * and is out of this parser's scope. Pure codegen'd Column work. */
  def metaRobots(html: Column): Column = {
    val metas = regexp_extract_all(html, lit(MetaTagPattern), lit(0))
    val robots = filter(metas, m =>
      lower(attrOf(m, "meta", "name")) === "robots")
    val contents = transform(robots, m =>
      lower(attrOf(m, "meta", "content")))
    def has(tok: String): Column = exists(contents, c =>
      c.rlike("(^|[\\s,])(" + tok + "|none)([\\s,]|$)"))
    struct(has("noindex").as("noindex"), has("nofollow").as("nofollow"))
  }

  // ----------------------------------- canonical link + OpenGraph (P169)

  private val LinkTagPattern: String = "(?is)<link\\b" + AttrWalk + "/?>"

  /**
   * Canonical-URL + OpenGraph metadata (P169 — what URL-level dedup
   * SHOULD key on: a page's own `<link rel=canonical>` collapses the
   * print/mobile/tracking variants the fetch URL cannot, which is why
   * C4/CCNet-class pipelines prefer it; og:title/og:description are
   * the page's self-description — prime quality and near-dup
   * signals):
   *  - `canonical_url`: the FIRST `<link rel=canonical href=...>` in
   *    document order (as indexers take it), `rel` matched as an
   *    exact token in its space-separated list, the href resolved
   *    through the SAME base-aware chain + canonicalization as the
   *    link graph so every URL key lives in one space; null when
   *    absent or unresolvable.
   *  - `og_title` / `og_description`: the first
   *    `<meta property="og:...">` content — the `name=` spelling is
   *    honored too (real pages carry both).
   *  - `effective_key`: canonical when present else the page's own
   *    canonicalized URL — the key canonical-aware dedup groups on.
   * Plan shape: linkGraph's discipline — the link/meta walks land as
   * `__canon_href`/`__og_*` in their OWN select (the CollapseProject
   * cost guard then keeps each regexp walk evaluated once even though
   * `__canon_href` is referenced three times above it), no generator
   * needed (all four outputs are firsts, not explosions), no shuffle.
   */
  def canonicalMeta(pages: DataFrame, idCol: String = "doc_id",
                    urlCol: String = "url",
                    htmlCol: String = "html"): DataFrame = {
    def firstOrNull(arr: Column): Column = get(arr, lit(0))
    val links = regexp_extract_all(col("__html"), lit(LinkTagPattern), lit(0))
    val canonHref = firstOrNull(transform(
      filter(links, t => lower(attrOf(t, "link", "rel"))
        .rlike("(^|\\s)canonical(\\s|$)")),
      t => attrOf(t, "link", "href")))
    val metas = regexp_extract_all(col("__html"), lit(MetaTagPattern), lit(0))
    def og(prop: String): Column = firstOrNull(transform(
      filter(metas, m =>
        lower(attrOf(m, "meta", "property")) === s"og:$prop" ||
          lower(attrOf(m, "meta", "name")) === s"og:$prop"),
      m => attrOf(m, "meta", "content")))
    pages
      .select(col(idCol).cast("long").as("id"),
        UrlOps.canonicalizeUrl(col(urlCol)).as("page_url"),
        extractBase(col(htmlCol)).as("__base"),
        col(htmlCol).as("__html"))
      .select(col("id"), col("page_url"),
        basePartsOfStaged(col("page_url"), col("__base")).as("__bp"),
        col("__html"))
      .select(col("id"), col("page_url"), col("__bp"),
        canonHref.as("__canon_href"),
        og("title").as("og_title"),
        og("description").as("og_description"))
      .select(col("id"), col("page_url"),
        when(col("__canon_href").isNotNull && col("__canon_href") =!= "",
          UrlOps.canonicalizeUrl(resolveWithDir(
            col("__bp").getField("bhost"), col("__bp").getField("bdir"),
            col("page_url"), col("__canon_href")))).as("canonical_url"),
        col("og_title"), col("og_description"))
      .withColumn("effective_key",
        coalesce(nullif(col("canonical_url"), lit("")), col("page_url")))
  }

  /** Followable hrefs of a page: every `<a>` OPEN tag (same per-tag
   * coverage as `extractLinks` — unclosed anchors still count), minus
   * those whose `rel` list carries `nofollow` (exact token, either
   * attribute order relative to href). Raw targets in document
   * order. */
  def governedLinks(html: Column): Column = {
    val tags = regexp_extract_all(html, lit(AnchorOpenPattern), lit(0))
    val followed = filter(tags, t =>
      !lower(attrOf(t, "a", "rel"))
        .rlike("(^|[\\s,])nofollow([\\s,]|$)"))
    filter(
      transform(followed, t =>
        regexp_replace(regexp_extract(t, hrefPattern("a"), 1), "^[\"']", "")),
      h => h =!= "")
  }

  /**
   * Robots-governed page-level link graph: `linkGraph` semantics (same
   * base-aware resolution, canonicalization, self-loop drop, distinct)
   * under BOTH meta-robots rules — a page whose meta says `nofollow`
   * (or `none`) contributes NO edges, and an individual anchor whose
   * `rel` says `nofollow` contributes none either. Same plan
   * discipline as linkGraph: per-page derivations land below the
   * Generate, per-edge columns reference plain attributes above it;
   * one scan, one explode, one distinct.
   */
  def governedLinkGraph(pages: DataFrame, urlCol: String = "url",
                        htmlCol: String = "html"): DataFrame =
    pages
      .where(!metaRobots(col(htmlCol)).getField("nofollow"))
      .select(UrlOps.canonicalizeUrl(col(urlCol)).as("src_url"),
        extractBase(col(htmlCol)).as("__base"),
        col(htmlCol).as("__html"))
      .select(col("src_url"),
        basePartsOfStaged(col("src_url"), col("__base")).as("__bp"),
        col("__html"))
      .select(col("src_url"), col("__bp"),
        explode(governedLinks(col("__html"))).as("__href"))
      .select(col("src_url"),
        UrlOps.canonicalizeUrl(resolveWithDir(
          col("__bp").getField("bhost"), col("__bp").getField("bdir"),
          col("src_url"), col("__href"))).as("dst_url"))
      // same barrier-before-filter discipline as linkGraph (r20)
      .transform(RowBarrier(_))
      .where(col("dst_url") =!= col("src_url") && col("dst_url") =!= "")
      .distinct()

  /** The page's `<base href>` target — the document-wide resolution
   * base browsers honor for every relative reference; first occurrence
   * wins in DOCUMENT ORDER (as in browsers), either quote style or
   * unquoted (one alternation, so a later quoted base never beats an
   * earlier unquoted one), null when absent. May itself be relative:
   * resolve it against the page URL before use (resolveHref's 3-arg
   * overload and linkGraph do). */
  def extractBase(html: Column): Column = {
    val raw = regexp_replace(
      regexp_extract(html, hrefPattern("base"), 1), "^[\"']", "")
    when(raw =!= "", raw).otherwise(lit(null).cast("string"))
  }

  /**
   * Resolve an extracted href against its page URL:
   *   - protocol-relative (`//host/p`) drops the slashes (the
   *     canonicalizer ignores scheme);
   *   - root-relative (`/p`) prepends the page's canonical host;
   *   - schemeful (`https://...`) is absolute;
   *   - anything else is PATH-relative (per RFC 3986 — an href
   *     without scheme or leading slash resolves against the page
   *     path's directory): `page2`, `./c`, `../other/x`. Dot-segment
   *     folding is a bounded rewrite chain (4 `../` levels and 2 `./`
   *     per href — beyond real-page depth; RE2-safe, no lookaround),
   *     with `../` past the host clamped to the root as browsers do.
   */
  def resolveHref(pageUrl: Column, href: Column): Column =
    resolveHrefFromCanonical(UrlOps.canonicalizeUrl(pageUrl), href)

  /** `resolveHref` over an ALREADY-canonical page URL (r20 staging
   * companion — see surtKeyOfCanonical): the resolution references its
   * canonical page 4x, so composing canonicalizeUrl in re-embeds the
   * chain per reference; producers that staged the canonical form as a
   * column resolve from the attribute. */
  private[graft] def resolveHrefFromCanonical(canonPage: Column,
                                              href: Column): Column =
    resolveWithDir(regexp_extract(canonPage, "^([^/?]*)", 1),
      dirOf(regexp_extract(canonPage, "^([^?]*)", 1)), canonPage, href)

  /** `resolveHref` honoring a page-level `<base href>` (extractBase):
   * when non-null, the base — itself resolved against the page, since
   * a relative base is legal — replaces the page as the host/directory
   * source for host- and path-relative hrefs, exactly as browsers
   * treat the document base URI. An empty href still resolves to the
   * PAGE (the self-reference contract downstream self-loop filtering
   * relies on). */
  def resolveHref(pageUrl: Column, href: Column, baseHref: Column): Column = {
    val canon = UrlOps.canonicalizeUrl(pageUrl)
    val (host, dir) = baseParts(canon, baseHref)
    resolveWithDir(host, dir, canon, href)
  }

  /** (host, directory) of the page's effective resolution base: the
   * page itself, or its `<base href>` resolved against it when one is
   * present. A base ending in `/` names a DIRECTORY (RFC 3986: `y`
   * against `/assets/` is `/assets/y`), but directory-dropping would
   * demote its last segment to a leaf — so a dummy leaf is planted
   * before resolution; only host/directory are ever read. The base is
   * deliberately NOT run through full URL canonicalization: the final
   * canonicalization of every RESOLVED reference lowercases the host
   * and strips scheme/www/port/params anyway, and keeping these
   * expressions small is load-bearing — predicate pushdown inlines a
   * projected dst_url into filter conjuncts wholesale, so anything
   * that rides inside it multiplies (the r14 regression: a 16M-char
   * plan and a 100x slowdown on the link-graph keys from composing
   * canonicalizeUrl over an already-composed base expression). */
  private[graft] def baseParts(canonPage: Column, baseHref: Column)
      : (Column, Column) = {
    val pageHost = regexp_extract(canonPage, "^([^/?]*)", 1)
    val pageDir = dirOf(regexp_extract(canonPage, "^([^?]*)", 1))
    val dirSafe = regexp_replace(baseHref, "/(\\?[^#]*)?$", "/x$1")
    val resolved = resolveWithDir(pageHost, pageDir, canonPage, dirSafe)
    val noScheme = regexp_replace(resolved,
      "^[a-zA-Z][a-zA-Z0-9+.\\-]*://", "")
    val hasBase = baseHref.isNotNull && baseHref =!= ""
    (when(hasBase, regexp_extract(noScheme, "^([^/?]*)", 1))
       .otherwise(pageHost),
     when(hasBase, dirOf(regexp_extract(noScheme, "^([^?]*)", 1)))
       .otherwise(pageDir))
  }

  /** Directory of a query-less path: drop the last segment; a bare
   * host (root page) is its own directory. */
  private def dirOf(noQuery: Column): Column =
    when(noQuery.contains("/"),
      regexp_replace(noQuery, "/[^/]*$", "")).otherwise(noQuery)

  /** The resolution core over a pre-derived (host, directory) pair:
   * shared between `resolveHref`, `baseParts`, and `linkGraph`'s
   * per-edge path, so they can't diverge. Taking the DIRECTORY (not
   * the path) lets linkGraph pre-compute it once per page as a plain
   * column below the Generate barrier. */
  private def resolveWithDir(host: Column, dir: Column,
                             self: Column, href: Column): Column = {
    val joined = concat(dir, lit("/"), href)
    // fold /./ then /seg/../ (segment not starting with '.', so a
    // "../" is never consumed as the folded segment), innermost first
    val dotFolded = (1 to 2).foldLeft(joined)((c, _) =>
      regexp_replace(c, "/\\./", "/"))
    val folded = (1 to 4).foldLeft(dotFolded)((c, _) =>
      regexp_replace(c, "/[^/.][^/]*/\\.\\./", "/"))
    val clamped = regexp_replace(folded, "^([^/]*)/(?:\\.\\./)+", "$1/")
    // empty href (or a cut pure-fragment href) is a SELF-reference per
    // RFC 3986 - resolve to the page so the self-loop filter drops it
    when(href === "", self)
      .when(href.rlike("^//"), regexp_replace(href, "^//", ""))
      .when(href.startsWith("/"), concat(host, href))
      .when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.\\-]*://"), href)
      .otherwise(clamped)
  }

  /**
   * Page-level link graph of a crawl: one row per distinct
   * (src_url, dst_url) canonical pair, self-loops dropped (intra-page
   * anchors and tracking-param variants of the page itself resolve to
   * the page's own canonical URL — they carry no graph information).
   *
   * Scale shape: one scan of the pages (extraction + resolution are
   * narrow expressions), one explode, one distinct keyed by the pair —
   * the single shuffle a 100 TB edge list genuinely needs. No driver
   * involvement; host-level rollups hang off this with one more
   * aggregation.
   */
  def linkGraph(pages: DataFrame, urlCol: String = "url",
                htmlCol: String = "html"): DataFrame =
    pages
      // canonicalize the page and derive the effective base's
      // (host, directory) ONCE PER PAGE, inside the projection that
      // carries the explode. The per-edge resolution and the self-loop
      // filter then reference plain ATTRIBUTES: the filter's condition
      // mentions the generator output, so predicate pushdown stops at
      // the Generate and only ever inlines the small attribute-based
      // dst chain — never the per-page base derivation. (Composing the
      // base expression into the per-edge chain instead let pushdown
      // inline it into both filter conjuncts with canonicalizeUrl's
      // internal fan-out compounding on top: a 16M-character plan and
      // a 100x slowdown on p95/p98 — the r14 regression.)
      .select(UrlOps.canonicalizeUrl(col(urlCol)).as("src_url"),
        extractBase(col(htmlCol)).as("__base"),
        col(htmlCol).as("__html"))
      .select(col("src_url"),
        basePartsOfStaged(col("src_url"), col("__base")).as("__bp"),
        col("__html"))
      // the explode rides a SEPARATE select so the per-page columns sit
      // BELOW the Generate (a select that carries the explode parks its
      // other aliases in a Project ABOVE it, back in pushdown reach)
      .select(col("src_url"), col("__bp"),
        explode(extractLinks(col("__html"))).as("__href"))
      .select(col("src_url"),
        UrlOps.canonicalizeUrl(resolveWithDir(
          col("__bp").getField("bhost"), col("__bp").getField("bdir"),
          col("src_url"), col("__href"))).as("dst_url"))
      // barrier before the self-loop filter (r20): a filter over the
      // dst_url ALIAS pushes down by substituting the whole
      // resolve+canonicalize chain into each conjunct — the formatted
      // plan carried the chain in the Filter (2x) AND the Project (1x),
      // i.e. up to 3 evaluations per edge. Above the barrier the filter
      // references generator output, which pushdown cannot cross: the
      // chain evaluates once per edge.
      .transform(RowBarrier(_))
      .where(col("dst_url") =!= col("src_url") && col("dst_url") =!= "")
      .distinct()

  /** baseParts-as-struct over PRE-STAGED columns — the canonical page URL and
   * the raw `<base href>` as plain attributes (r20): baseParts
   * references its canonPage argument ~8x and its baseHref ~3x, so
   * composing the canonicalize/extract trees in directly re-embeds
   * them per reference (the one-select basePartsOf projection measured
   * 156 host-extract markers / 88 KB of plan for p95). Staged, the
   * producer select computes each tree once, the CollapseProject cost
   * guard keeps the multi-referenced non-cheap aliases in their own
   * projection, and this struct fans out over cheap attributes. */
  private def basePartsOfStaged(canonPage: Column, baseHref: Column): Column = {
    val (h, d) = baseParts(canonPage, baseHref)
    struct(h.as("bhost"), d.as("bdir"))
  }

  /** Whole `<a ...>...</a>` elements: the open tag consumed by the
   * same quote-skipping attribute walk as hrefPattern (so a `>`
   * inside a quoted attribute value never ends the tag early), then
   * the inner run to the close tag GUARDED against crossing another
   * `<a` — an UNCLOSED anchor (malformed HTML real crawls are full
   * of) must not swallow the next anchor element and steal its text;
   * it simply contributes no labeled edge (linkGraph still emits the
   * bare edge from its per-href extraction). The inner run consumes
   * nested NON-anchor tags ATOMICALLY through the same quote-aware
   * walk, so a literal `<a href=...>` embedded in a QUOTED attribute
   * of a nested tag (Bootstrap-popover-style data-content HTML) can
   * neither abort the real anchor nor surface as a phantom element. */
  // The inner run is a POSSESSIVE loop, not the old reluctant one —
  // measured, not stylistic: java.util.regex runs lazy group loops
  // recursively (one stack frame per unit, StackOverflowError — a
  // task-killing Error — near ~1000 units, i.e. one long malformed
  // anchor on a real page) but possessive group loops iteratively
  // (100k nested tags in ~50 ms). The two accept the SAME language
  // here: no unit can consume `</a>` ([^<]++ stops at `<`, the
  // nested-tag alternative's lookahead blocks `/a`), so greedy
  // consumption stops exactly at the first close tag — where the
  // reluctant walk stopped. An unclosed anchor fails in linear time
  // (atomic units are never re-explored; the old walk was exponential
  // in the nested tags it scanned).
  private val AnchorElemPattern: String =
    "(?is)<a\\b" + AttrWalk + ">" +
      "(?:[^<]++|<(?!a\\b|/a\\b)" + AttrWalk + ">)*+" +
      "</a>"

  /** Quote-aware strip of ALL tags — the naive `<[^>]*>` both ends at
   * a `>` INSIDE a quoted attribute value (leaking attribute text into
   * extracted output) and over-eagerly DELETES non-tag text like
   * "x < 5 > 3". This walk only matches real tags (name-led, quoted
   * values consumed atomically, self-closing slash) plus `<!...>`
   * declarations (doctype) and `<?...?>` processing instructions
   * (XHTML prologs), so stray angle brackets in prose survive.
   * Shared by htmlToText, mainContent, table cells, and anchor
   * labels: every place tag-stripped text becomes OUTPUT. */
  private val AnyTagPattern: String =
    "(?is)(?:</?[a-zA-Z][a-zA-Z0-9]*\\b" + AttrWalk + "/?>" +
      "|<!(?:[^>'\"]++|\"[^\"]*+\"|'[^']*+'){0,10000}+>" +
      "|<\\?(?:[^>'\"]++|\"[^\"]*+\"|'[^']*+'){0,10000}+>)"

  /** Inline-text clean shared by anchor labels, main-content blocks,
   * and table cells — the SAME chain as htmlToText's step 3-5
   * (verdict-caught: these surfaces kept a 6-entity replace chain
   * after p158 gave htmlToText full character-reference decoding, so
   * `&eacute;` decoded in body text but stayed raw in anchors/blocks/
   * cells — the same visible text hashed two ways across surfaces,
   * forking dedup): strip tags, decode ALL character references in
   * one native pass, collapse whitespace (incl. the U+00A0 that
   * `&nbsp;` now decodes to — inline surfaces flatten newlines too),
   * trim. */
  private def cleanInline(c: Column): Column =
    trim(regexp_replace(
      graft.functions.HashExpressions.decodeHtmlEntities(
        regexp_replace(c, AnyTagPattern, "")),
      "[\\s\\u00A0]+", " "))

  /**
   * Anchor-text signals — what the web says ABOUT a page (the classic
   * off-page quality/topic signal search corpora and quality
   * classifiers aggregate; the link graph p95 keeps only the edge,
   * this keeps the label): one row per `<a>` occurrence with a
   * resolvable href and non-empty cleaned inner text, the href
   * resolved through the SAME base-aware chain as linkGraph (shared
   * helpers, so the two can't diverge) and the anchor cleaned like a
   * mainContent block (cleanInline: tag strip, full character-
   * reference decode, whitespace collapse). Output:
   * (src_url, dst_url, anchor).
   *
   * Scale shape: linkGraph's exact plan discipline — per-page base
   * derivation computed ONCE below the Generate, per-anchor columns
   * referencing plain attributes above it; one narrow scan, one
   * explode, no shuffle (the aggregation that rolls anchors up per
   * target is the CALLER's one dst-keyed groupBy, the only shuffle
   * the problem genuinely needs).
   */
  def anchorTexts(pages: DataFrame, urlCol: String = "url",
                  htmlCol: String = "html"): DataFrame = {
    val href = regexp_replace(
      regexp_extract(col("__a"), hrefPattern("a"), 1), "^[\"']", "")
    pages
      .select(UrlOps.canonicalizeUrl(col(urlCol)).as("src_url"),
        extractBase(col(htmlCol)).as("__base"),
        col(htmlCol).as("__html"))
      .select(col("src_url"),
        basePartsOfStaged(col("src_url"), col("__base")).as("__bp"),
        col("__html"))
      .select(col("src_url"), col("__bp"),
        explode(regexp_extract_all(col("__html"),
          lit(AnchorElemPattern), lit(0))).as("__a"))
      .select(col("src_url"),
        UrlOps.canonicalizeUrl(resolveWithDir(
          col("__bp").getField("bhost"), col("__bp").getField("bdir"),
          col("src_url"), href)).as("dst_url"),
        cleanInline(col("__a")).as("anchor"))
      // same barrier-before-filter discipline as linkGraph (r20): the
      // where over the dst_url and anchor ALIASES otherwise re-inlines
      // the resolve+canonicalize chain (2x) and the cleanInline chain
      // (1x) into the pushed filter condition
      .transform(RowBarrier(_))
      .where(col("dst_url") =!= col("src_url") && col("dst_url") =!= "" &&
        col("anchor") =!= "")
  }

  /**
   * Table extraction from raw HTML — tables are among the most
   * valuable pretraining content in a crawl and the first thing a
   * text-only extractor destroys (htmlToText flattens cells into an
   * undifferentiated line). One row per `<tr>`: the cells (`<td>` or
   * `<th>`, cleaned by the shared cleanInline chain — tags stripped,
   * ALL character references decoded, whitespace collapsed, trimmed)
   * joined by `|`, positionally indexed by (table, row) within the
   * page.
   *
   * Scale shape: two generators over narrow per-page expressions —
   * page → tables (posexplode keeps the index), table → rows — with
   * all parsing in codegen'd regexp work where the page landed; no
   * shuffle, no driver involvement. Pages without tables contribute
   * nothing (posexplode drops empty arrays).
   *
   * Output: (id, table_idx, row_idx, n_cells, cells), both indexes
   * 0-based longs.
   */
  /** Block boundaries for main-content extraction: OPEN and CLOSE tags
   * of block-level elements (jusText's segmentation grain) plus
   * br/hr — unlike BlockBreak, open tags break too, so `<nav>x</nav>`
   * and the following paragraph never merge into one block. */
  // the open-tag body uses the quote-aware attribute walk, not [^>]*:
  // a '>' inside a quoted attribute (<p title="x>y">) must not end the
  // block boundary early and leak attribute text into a block
  private val BlockTag =
    "(?i)(?:<(?:br|hr)\\s*/?>|</?(?:p|div|h[1-6]|li|tr|td|th|title|ul|ol" +
      "|table|blockquote|pre|section|article|header|footer|nav|aside" +
      "|main|body|html)\\b" + AttrWalk + ">)"

  /**
   * Main-content extraction by block-level link-density scoring — the
   * boilerplate-vs-content step (jusText / trafilatura / Arc90
   * readability all reduce to it) that turns a crawled page into
   * training text WITHOUT nav menus, link farms, and footers: the page
   * splits into blocks at block-level tags, each block is scored by
   * its cleaned text length and the fraction of that text living
   * inside `<a>` tags, and only long-enough low-link-density blocks
   * survive into `main_text`.
   *
   * Decision rule (exact integers, no division): keep a block iff
   *   text_len >= minChars  AND  link_len * 10000 <= maxLinkBp * text_len.
   * `cleanInline` = strip tags, decode ALL character references
   * (the shared htmlToText chain), collapse whitespace, trim —
   * applied identically to block text and to the concatenated `<a>`
   * bodies, so the density compares like with like. This is the documented heuristic grain: block
   * segmentation by tag boundaries, not DOM depth (the p92/p114 regex
   * house approach).
   *
   * Output: (id, n_blocks, n_kept, main_text) — n_blocks counts
   * non-empty cleaned blocks, main_text joins kept blocks with \n in
   * page order.
   *
   * Scale shape: one narrow scan — split + per-block lambda metrics +
   * one filtered join, zero shuffles, zero UDFs, pages never cross an
   * exchange.
   */
  def mainContent(pages: DataFrame, idCol: String = "doc_id",
                  htmlCol: String = "html", minChars: Int = 25,
                  maxLinkBp: Int = 3000, stopwords: Seq[String] = Nil,
                  minStopwordBp: Int = 0): DataFrame = {
    val noScript = regexp_replace(col(htmlCol),
      "(?is)<script\\b[^>]*>.*?</script>", "")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", "")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", "")
    val blocks = filter(
      transform(split(regexp_replace(noComment, BlockTag, "\n"), "\n"),
        b => struct(
          cleanInline(b).as("text"),
          // quote-aware open tag: a '>' inside an anchor attribute
          // must not count attribute soup as link text and inflate
          // the density of a genuine prose block
          cleanInline(array_join(regexp_extract_all(b,
            lit("(?is)<a\\b" + AttrWalk + ">(.*?)</a>"), lit(1)), ""))
            .as("link"))),
      s => s.getField("text") =!= "")
    // both lengths widened to long BEFORE multiplying: a single block
    // with >~214k chars of anchor text would overflow Int negative and
    // wrongly pass the density screen — exactly the giant link farms
    // this filter exists to drop
    //
    // Third screen (jusText's signal — Pomikálek 2011: boilerplate has
    // LOW stopword density; prose has high): per-block stopword ratio
    // in exact basis points over the cleaned text's single-space
    // tokens. Off by default (empty stopwords or bp 0) to keep the
    // two-screen behavior.
    val swLit = typedLit(stopwords.map(_.toLowerCase(java.util.Locale.ROOT)))
    def stopwordPass(text: Column): Column =
      if (stopwords.isEmpty || minStopwordBp <= 0) lit(true)
      else {
        val toks = split(text, " ")
        size(filter(toks, t => array_contains(swLit, lower(t))))
          .cast("long") * 10000 >=
          size(toks).cast("long") * minStopwordBp
      }
    def keptOf(bs: Column): Column = filter(bs, s =>
      length(s.getField("text")) >= minChars &&
        length(s.getField("link")).cast("long") * 10000 <=
          length(s.getField("text")).cast("long") * maxLinkBp &&
        stopwordPass(s.getField("text")))
    // the block array and the kept filter each materialize ONCE per
    // row behind their own projection boundary: composed into the
    // final select, `blocks` (the expensive split+clean tree) inlined
    // into all three consumers and `kept` into two — 3x the scan work
    // per page, caught by the PlanAuditSpec board sweep when the r19
    // cleanInline swap made the duplication visible as repeated
    // decode_html_entities nodes. CollapseProject's cost guard keeps a
    // multiply-referenced non-cheap alias materialized.
    pages
      .select(col(idCol).cast("long").as("id"), blocks.as("__blocks"))
      .select(col("id"), col("__blocks"),
        keptOf(col("__blocks")).as("__kept"))
      .select(
        col("id"),
        size(col("__blocks")).cast("long").as("n_blocks"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(transform(col("__kept"), s => s.getField("text")), "\n")
          .as("main_text"))
  }

  def extractTables(pages: DataFrame, idCol: String = "doc_id",
                    htmlCol: String = "html"): DataFrame = {
    // quote-aware open tags throughout: a '>' inside a table/tr/td
    // attribute must not truncate the element and leak attribute text
    // into cells
    val tables = regexp_extract_all(col(htmlCol),
      lit("(?is)<table\\b" + AttrWalk + ">(.*?)</table>"), lit(1))
    val rows = regexp_extract_all(col("__t"),
      lit("(?is)<tr\\b" + AttrWalk + ">(.*?)</tr>"), lit(1))
    val cells = transform(
      regexp_extract_all(col("__r"),
        lit("(?is)<t[dh]\\b" + AttrWalk + ">(.*?)</t[dh]>"), lit(1)),
      c => cleanInline(c))
    pages
      .select(col(idCol).cast("long").as("id"), posexplode(tables))
      .withColumnsRenamed(Map("pos" -> "table_idx", "col" -> "__t"))
      .select(col("id"), col("table_idx").cast("long"), posexplode(rows))
      .withColumnsRenamed(Map("pos" -> "row_idx", "col" -> "__r"))
      .select(col("id"), col("table_idx"), col("row_idx").cast("long"),
        size(cells).cast("long").as("n_cells"),
        array_join(cells, "|").as("cells"))
  }

  /**
   * Markdown rendering of extracted tables — the textual form table
   * content actually enters an LLM training corpus in (GFM pipe
   * tables): the first row becomes the header line, a `---` alignment
   * line follows, data rows after. One row per OUTPUT LINE, so the
   * result concatenates per (id, table_idx) by line_idx into a ready
   * corpus fragment. Built on extractTables' output in the same
   * single pass (the header row fans out to two lines via one
   * generator); cells containing a literal `|` are ambiguous after
   * the join — the documented limitation of the pipe format itself.
   */
  def tablesToMarkdown(pages: DataFrame, idCol: String = "doc_id",
                       htmlCol: String = "html"): DataFrame = {
    val fmt = concat(lit("| "),
      replace(col("cells"), lit("|"), lit(" | ")), lit(" |"))
    val sep = concat(lit("|"),
      array_join(transform(sequence(lit(1), col("n_cells").cast("int")),
        _ => lit(" --- ")), "|"), lit("|"))
    extractTables(pages, idCol, htmlCol)
      .select(col("id"), col("table_idx"), col("row_idx"),
        posexplode(when(col("row_idx") === 0, array(fmt, sep))
          .otherwise(array(fmt))))
      .select(col("id"), col("table_idx"),
        when(col("row_idx") === 0, col("pos").cast("long"))
          .otherwise(col("row_idx") + 1).as("line_idx"),
        col("col").as("line"))
  }

  /**
   * Registered-domain web-graph signals from a page-level edge list —
   * the aggregate behind link-based quality priors (a page on a
   * domain nothing links to is a different prior than one under a
   * well-referenced host): per domain, the crawled page count, the
   * out-degree, and the in-degree. Domains that only ever appear as
   * link TARGETS still get a row (n_pages = 0, the "referenced but
   * never crawled" frontier a crawler's scheduler feeds on).
   *
   * Scale shape: both endpoints tag into ONE union (src rows carry
   * the page for the distinct count, dst rows carry null — count
   * distinct ignores it), then a single domain-keyed aggregation.
   * No join, no window; the edge list never materializes twice.
   */
  /** Input contract: `edges` carries CANONICAL URLs (linkGraph output —
   * its only production source); the domain cut therefore skips
   * re-canonicalization (idempotent on canonical input, and the
   * canonicalize chain is a dozen regexp nodes per reference).
   *
   * Plan shape (r20, guide §2.4): the src-side and dst-side rows are
   * emitted by ONE 2-element explode per edge, not a union of two
   * selects over the edge derivation — a union re-EXECUTES the whole
   * child per branch (no exchange reuse across re-analyzed branches),
   * which for p98 meant the entire linkGraph regex pipeline ran twice
   * per execution (verified in the formatted plan: two full
   * Scan→Generate→distinct subtrees under the Union; now one). */
  def domainSignals(edges: DataFrame, srcCol: String = "src_url",
                    dstCol: String = "dst_url"): DataFrame =
    edges
      .select(explode(array(
        struct(UrlOps.registeredDomainOfCanonical(col(srcCol)).as("domain"),
          col(srcCol).as("page"), lit(1L).as("out_e"), lit(0L).as("in_e")),
        struct(UrlOps.registeredDomainOfCanonical(col(dstCol)).as("domain"),
          lit(null).cast("string").as("page"),
          lit(0L).as("out_e"), lit(1L).as("in_e")))).as("__r"))
      .select(col("__r.domain").as("domain"), col("__r.page").as("page"),
        col("__r.out_e").as("out_e"), col("__r.in_e").as("in_e"))
      .groupBy("domain")
      .agg(countDistinct(col("page")).as("n_pages"),
        sum(col("out_e")).as("out_degree"),
        sum(col("in_e")).as("in_degree"))

  /** Fixed-point scale for `pageRank`: ranks are int64 micro-units of
   * this (1.0 == 1e12), so every arithmetic step is exact integer
   * division — bit-identical across engines, no float summation-order
   * dependence. Headroom: 85 * 1e12 << 2^63. */
  val RankScale = 1000000000000L

  /**
   * PageRank over a (src, dst) edge list — the link-based quality
   * prior (a page's weight flows from who links to it; the web-graph
   * signal FineWeb-era pipelines cite). DETERMINISTIC fixed-point
   * integer arithmetic replaces the usual floats: with damping d =
   * dampNum/dampDen, each iteration computes per node
   *
   *   r' = teleport + (dampNum * Σ_in floor(r_src / outdeg(src)))
   *                   floor-div dampDen
   *   teleport = floor(floor(RankScale * (dampDen-dampNum) / dampDen)
   *              / N)
   *
   * — every division a floor, in a FIXED order, so Spark and the SQL
   * oracle agree to the last unit (float PageRank sums in shuffle
   * order and never hash-matches). Floor losses mean Σr drifts a few
   * units below RankScale per iteration (bounded by N·iters) — the
   * price of exactness, documented. Dangling nodes (out-degree 0)
   * leak their mass by default: acceptable for quality-prior use.
   * `redistributeDangling = true` adds the classic correction — each
   * iteration spreads floor(D / N) of the danglers' total mass D to
   * every node inside the damping term — making Σr conservation a
   * testable property (spec-pinned to within the floor-loss bound);
   * it costs one bounded scalar aggregation per iteration (the
   * dangling mass, a 1-row collect — the standard accumulator shape).
   *
   * Scale shape: the classic Spark PageRank loop — per iteration one
   * src-keyed join of ranks to the (pre-joined, checkpointed)
   * edge+outdeg table, ONE dst-keyed aggregation, and a left join
   * back to the node list that re-admits nodes with no in-links for
   * their teleport share (two joins total, the second against the
   * already-materialized node list); `localCheckpoint` truncates the
   * lineage each round so the plan stays O(1) deep at any iteration
   * count (the discipline a 10^9-node graph needs — without it the
   * DAG doubles per round).
   */
  def pageRank(edges: DataFrame, iterations: Int = 10,
               dampNum: Long = 85, dampDen: Long = 100,
               srcCol: String = "src", dstCol: String = "dst",
               redistributeDangling: Boolean = false): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    // empty graph: no nodes to rank (and RankScale/n would divide by 0)
    if (n == 0) return nodes.select(col("node"), lit(0L).as("rank"))
    // out-degree rides WITH each edge (one pre-join, checkpointed) so
    // every iteration pays ONE src-keyed join, not two
    val eDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint()
    // dangling = nodes with no outgoing edge; materialized ONCE — per
    // iteration only their current rank mass (one scalar) is re-read
    val dangling = if (redistributeDangling)
      nodes.join(e.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti").localCheckpoint()
    else null
    val teleport = (RankScale * (dampDen - dampNum) / dampDen) / n
    var ranks = nodes.withColumn("r", lit(RankScale / n)).localCheckpoint()
    for (_ <- 1 to iterations) {
      // per-node share of the danglers' mass, a plan-time literal this
      // round (floor BEFORE the damping multiply, fixed order)
      val dangShare: Long = if (redistributeDangling)
        ranks.join(dangling, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("r")), lit(0L))).collect()(0).getLong(0) / n
      else 0L
      val contrib = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst").as("node"),
          expr("r DIV outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("cin"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNum * (coalesce(cin, 0L) + $dangShare)) DIV $dampDen"))
            .as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank"))
  }
}
