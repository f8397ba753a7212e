package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots exclusion (RFC 9309) for the crawl frontier: parse each
  * host's `robots.txt` into the `User-agent: *` group's rules, then
  * decide every candidate URL by the standard's longest-match rule
  * (the most-specific — longest — matching rule wins; an `Allow`
  * beats a `Disallow` of equal length, RFC 9309 §2.2.2).
  *
  * Wildcard rules are FULLY supported (RFC 9309 §2.2.3 REQUIRES
  * them, and real robots.txt files use them pervasively — the
  * `*.pdf$`-under-root and `*?sessionid=`-style rules): `*` matches any
  * run of characters and a TRAILING `$` anchors the rule at the end
  * of the path-and-query. Each rule value translates once (host-side,
  * rule-table-sized) into an anchored regex in the Java ∩ RE2 subset
  * ([[rulePattern]]); rule specificity is the rule value's length in
  * octets, `*`/`$` included — the tie-break order of Google's
  * published reference parser. A `$` anywhere but last is literal
  * (documented approximation — non-trailing `$` has no defined
  * meaning and effectively never occurs).
  *
  * Host identity: the rule and delay tables key by CANONICAL host —
  * lowercased, trailing root-dot and `www.` stripped, the same
  * normalization [[Crawl.urlParts]] applies to `link_host` — so a
  * robots table scraped under `www.x.com` matches candidates
  * canonicalized to `x.com`. (If both forms exist with different
  * bodies their `*`-group rules union; the politest reading wins for
  * delays.)
  *
  * Both faces are engine-idiomatic: the parse is a row-local
  * split/extract over the robots table (host-count rows — tiny), and
  * the decision JOINS the grouped rule-array table onto the URL table
  * (broadcast by default) and evaluates the longest match INSIDE the
  * row with `filter`/`aggregate` higher-order functions — no per-rule
  * row explosion on the URL side, no URL-side shuffle, and no
  * row-identity grouping (URL rows pass through 1:1 whatever their
  * key shape).
  *
  * Documented approximations (the regex-subset stance of [[Crawl]]):
  *  - rules attach to the LAST `User-agent` line of a multi-agent
  *    group (splitting at each agent line), where the RFC attaches
  *    them to every agent of the group — `*` listed last is the
  *    overwhelmingly common form;
  *  - non-`*` groups are out of scope ([[crawlDelays]] covers the
  *    `Crawl-delay` extension; [[sitemapDirectives]] covers the
  *    group-independent `Sitemap` directive).
  */
object Robots {

  /** Group boundary: each `User-agent:` line starts a segment whose
    * first characters are the agent token. */
  val AgentSplitPat = "(?im)^[ \\t]*user-agent:[ \\t]*"

  /** Rule lines inside a group (value ends at EOL or a `#` comment). */
  val DisallowPat = "(?im)^[ \\t]*disallow:[ \\t]*([^\\r\\n#]*)"
  val AllowPat = "(?im)^[ \\t]*allow:[ \\t]*([^\\r\\n#]*)"

  /** Trailing whitespace on a rule value (CR of CRLF files included). */
  val RuleTrimPat = "[ \\t\\r]+$"

  /** `Crawl-delay` lines inside a group (de-facto extension most
    * crawlers honor; seconds, fractional allowed). */
  val CrawlDelayPat = "(?im)^[ \\t]*crawl-delay:[ \\t]*([0-9]{1,6}(?:\\.[0-9]{1,6})?)"

  /** `Sitemap:` lines — group-INDEPENDENT per RFC 9309, matched over
    * the whole file (value ends at EOL or a `#` comment, like the
    * rule lines; a fragment-bearing sitemap URL would lose its
    * fragment to canonicalization anyway). */
  val SitemapDirPat = "(?im)^[ \\t]*sitemap:[ \\t]*([^\\r\\n#]*)"

  /** Path-and-query of a canonical URL — what RFC 9309 matches rules
    * against (scheme://authority stripped). */
  val PathQueryPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Regex-metacharacter escapes for the wildcard-rule translation —
    * a FOLD SPEC shared with the DuckDB twin (each pair is one
    * `replace` call, applied in order): backslash FIRST (so later
    * escapes cannot double up), `*` → `.*` LAST (so the `.` it
    * introduces is never re-escaped; `.` excludes newline in both
    * Java and RE2, and a canonical URL cannot contain one). */
  val PatternEscapes: Seq[(String, String)] = Seq(
    "\\" -> "\\\\", "." -> "\\.", "+" -> "\\+", "?" -> "\\?",
    "(" -> "\\(", ")" -> "\\)", "[" -> "\\[", "]" -> "\\]",
    "{" -> "\\{", "}" -> "\\}", "|" -> "\\|", "^" -> "\\^", "$" -> "\\$",
    "*" -> ".*")

  /** Translate one rule value into its anchored match regex:
    * `^` + escaped body (with `*` → `.*`) + (`$` if the rule ends in
    * `$`). An unanchored rule matches any PREFIX of the path-query
    * (the regex needs no trailing `.*` — `rlike` is a find, the `^`
    * alone pins the start); a `$`-anchored rule must consume the
    * whole path-query (which is why `Allow: /p/1$` does NOT allow
    * `/p/1?x=1` — the query is part of the match text, RFC 9309
    * §2.2.3). */
  private[graft] def rulePattern(p: Column): Column = {
    val anch = p.substr(length(p), lit(1)) === "$"
    val body = when(anch, p.substr(lit(1), length(p) - lit(1))).otherwise(p)
    val escaped = PatternEscapes.foldLeft(body) {
      case (c, (from, to)) => replace(c, lit(from), lit(to))
    }
    concat(lit("^"), escaped, when(anch, lit("$")).otherwise(lit("")))
  }

  /** Canonical host key — [[Crawl.urlParts]]' host normalization
    * (lowercase, trailing root-dot, `www.`) applied to the robots
    * table's host column, so rule/delay tables join `link_host`
    * directly. */
  private def canonHost(h: Column): Column =
    regexp_replace(
      regexp_replace(lower(coalesce(h, lit(""))), Crawl.TrailingDotPat, ""),
      Crawl.WwwPat, "")

  /** The `*` group's segments, one row per group: `(host, seg)` —
    * seg 0 is the pre-agent preamble (dropped); a group applies to
    * this op iff its agent token is `*`. */
  private def starSegments(
      robots: DataFrame, hostCol: String, textCol: String): DataFrame =
    graft.core.Parallelism.ensure(robots)
      .select(canonHost(col(hostCol)).as("host"),
        posexplode(split(coalesce(col(textCol), lit("")), AgentSplitPat))
          .as(Seq("seg_idx", "seg")))
      .where(col("seg_idx") > 0 && col("seg").rlike("^\\*"))

  /** Parse a robots table `(hostCol, textCol)` into the `*` group's
    * rules: `(host, rule ∈ allow|disallow, prefix)`, distinct, with
    * `host` canonicalized and `prefix` the rule value VERBATIM —
    * wildcards included (the decision face translates them). Empty
    * values (the `Disallow:` = allow-everything idiom) drop — the
    * decision face's default-allow covers them. */
  def robotsRules(
      robots: DataFrame,
      hostCol: String = "host",
      textCol: String = "robots_txt"): DataFrame = {
    val segs = starSegments(robots, hostCol, textCol)
    def rulesOf(kind: String, pat: String): DataFrame = segs
      .select(col("host"), lit(kind).as("rule"),
        explode(regexp_extract_all(col("seg"), lit(pat), lit(1))).as("raw"))
    rulesOf("disallow", DisallowPat)
      .unionByName(rulesOf("allow", AllowPat))
      .select(col("host"), col("rule"),
        regexp_replace(col("raw"), RuleTrimPat, "").as("prefix"))
      .where(col("prefix") =!= "")
      .distinct()
  }

  /** Per-host politeness budget: the MINIMUM `Crawl-delay` of the `*`
    * group (politest wins when a file repeats the line) —
    * `(host, crawl_delay)` seconds as double, `host` canonicalized;
    * hosts without the line are absent (the caller's default
    * applies). Joins onto [[graft.ops.Crawl.politeFrontier]] output
    * the way [[graft.ops.Crawl.rankPrior]] does. */
  def crawlDelays(
      robots: DataFrame,
      hostCol: String = "host",
      textCol: String = "robots_txt"): DataFrame =
    starSegments(robots, hostCol, textCol)
      .select(col("host"),
        explode(regexp_extract_all(col("seg"), lit(CrawlDelayPat), lit(1))).as("raw"))
      .groupBy(col("host"))
      .agg(min(col("raw").cast("double")).as("crawl_delay"))

  /** `Sitemap:` directives of the robots file — the third parse face,
    * and the crawl loop's SEED DISCOVERY channel: robots.txt is where
    * a host declares its sitemaps (sitemaps.org's own discovery
    * mechanism), and [[graft.ops.Crawl.sitemapUrls]] consumes the
    * fetched bodies. Per RFC 9309 the directive is INDEPENDENT of
    * groups — it applies file-wide wherever it appears — so the parse
    * runs over the whole text, not the `*` segments. Output one row
    * per directive: `(host, sitemap_idx, loc, sitemap_url,
    * sitemap_host)` — `loc` the trimmed declared value verbatim,
    * `sitemap_url`/`sitemap_host` its canonicalization
    * ([[graft.ops.Crawl.urlParts]] — NULL for relative/invalid
    * declarations, which the standard forbids but the web contains;
    * the row stays, total-function stance). Empty values drop.
    * Row-local over the host-sized robots table — zero shuffle. */
  def sitemapDirectives(
      robots: DataFrame,
      hostCol: String = "host",
      textCol: String = "robots_txt"): DataFrame =
    graft.core.Parallelism.ensure(robots)
      .select(canonHost(col(hostCol)).as("host"),
        posexplode(regexp_extract_all(coalesce(col(textCol), lit("")),
          lit(SitemapDirPat), lit(1))).as(Seq("sitemap_idx", "raw")))
      .select(col("host"), col("sitemap_idx"),
        regexp_replace(col("raw"), RuleTrimPat, "").as("loc"))
      .where(col("loc") =!= "")
      .select(col("host"), col("sitemap_idx"), col("loc"),
        Crawl.urlParts(col("loc")).as("lp"))
      .select(col("host"), col("sitemap_idx"), col("loc"),
        col("lp.canon_url").as("sitemap_url"),
        col("lp.host").as("sitemap_host"))

  /** The REPORT face: `urls` (any schema carrying `urlCol` +
    * `hostCol`) plus `robots_allowed` — RFC 9309 longest-match over
    * the host's rules, TRUE when the host has no rules, no rule
    * matches, or the URL is NULL (nothing to fetch ⇒ nothing to
    * forbid). `rules` is [[robotsRules]] output (or any
    * `(host, rule, prefix)` table keyed by canonical host). Rule
    * tables are host-sized — broadcast by default; each rule value
    * compiles ONCE ([[rulePattern]], rule-table-sized work) and the
    * longest-match fold runs inside each URL row over the host's rule
    * array (order-independent: strictly better = longer rule value in
    * octets, or equal length upgrading to allow). */
  def robotsFilter(
      urls: DataFrame,
      rules: DataFrame,
      urlCol: String = "link_url",
      hostCol: String = "link_host",
      broadcastRules: Boolean = true): DataFrame = {
    val sets = rules
      .groupBy(col("host").as(hostCol))
      .agg(collect_list(struct(col("rule"), col("prefix"),
        rulePattern(col("prefix")).as("pat"))).as("_rs"))
    val rhs = if (broadcastRules) broadcast(sets) else sets
    val pathq = regexp_replace(col(urlCol), PathQueryPat, "")
    val matching = filter(col("_rs"),
      r => regexp_like(pathq, r.getField("pat")))
    val best = aggregate(matching,
      struct(lit(-1).as("l"), lit(true).as("a")),
      (acc, r) => {
        val rl = octet_length(r.getField("prefix")).cast("int")
        val ra = r.getField("rule") === "allow"
        when(rl > acc.getField("l") ||
            (rl === acc.getField("l") && ra && !acc.getField("a")),
          struct(rl.as("l"), ra.as("a"))).otherwise(acc)
      })
    urls.join(rhs, Seq(hostCol), "left")
      .withColumn("robots_allowed",
        when(col("_rs").isNull || col(urlCol).isNull, lit(true))
          .otherwise(best.getField("a")))
      .drop("_rs")
  }

  /** The STRIP face: only fetchable candidates survive — compose
    * after [[Crawl.crawlFrontier]] for the polite next-fetch list. */
  def allowedOnly(
      urls: DataFrame,
      rules: DataFrame,
      urlCol: String = "link_url",
      hostCol: String = "link_host",
      broadcastRules: Boolean = true): DataFrame =
    robotsFilter(urls, rules, urlCol, hostCol, broadcastRules)
      .where(col("robots_allowed")).drop("robots_allowed")
}
