package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robots exclusion (RFC 9309) for the crawl frontier: parse each
  * host's `robots.txt` into the `User-agent: *` group's rules, then
  * decide every candidate URL by the standard's longest-match rule
  * (longest matching prefix wins; an `Allow` beats a `Disallow` of
  * equal length).
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
  *  - `*`/`$` wildcard rules are SKIPPED (not mis-matched literally);
  *  - `Crawl-delay`/`Sitemap` and non-`*` groups are out of scope.
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

  /** Path-and-query of a canonical URL — what RFC 9309 matches rules
    * against (scheme://authority stripped). */
  val PathQueryPat = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** Parse a robots table `(hostCol, textCol)` into the `*` group's
    * rules: `(host, rule ∈ allow|disallow, prefix)`, distinct. Empty
    * values (the `Disallow:` = allow-everything idiom) and wildcard
    * rules drop — the decision face's default-allow covers both. */
  /** The `*` group's segments, one row per group: `(host, seg)` —
    * seg 0 is the pre-agent preamble (dropped); a group applies to
    * this op iff its agent token is `*`. */
  private def starSegments(
      robots: DataFrame, hostCol: String, textCol: String): DataFrame =
    graft.core.Parallelism.ensure(robots)
      .select(col(hostCol).as("host"),
        posexplode(split(coalesce(col(textCol), lit("")), AgentSplitPat))
          .as(Seq("seg_idx", "seg")))
      .where(col("seg_idx") > 0 && col("seg").rlike("^\\*"))

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
      .where(col("prefix") =!= "" && !col("prefix").rlike("[*$]"))
      .distinct()
  }

  /** Per-host politeness budget: the MINIMUM `Crawl-delay` of the `*`
    * group (politest wins when a file repeats the line) —
    * `(host, crawl_delay)` seconds as double; hosts without the line
    * are absent (the caller's default applies). Joins onto
    * [[graft.ops.Crawl.crawlFrontier]] output the way
    * [[graft.ops.Crawl.rankPrior]] does. */
  def crawlDelays(
      robots: DataFrame,
      hostCol: String = "host",
      textCol: String = "robots_txt"): DataFrame =
    starSegments(robots, hostCol, textCol)
      .select(col("host"),
        explode(regexp_extract_all(col("seg"), lit(CrawlDelayPat), lit(1))).as("raw"))
      .groupBy(col("host"))
      .agg(min(col("raw").cast("double")).as("crawl_delay"))

  /** The REPORT face: `urls` (any schema carrying `urlCol` +
    * `hostCol`) plus `robots_allowed` — RFC 9309 longest-match over
    * the host's rules, TRUE when the host has no rules, no rule
    * matches, or the URL is NULL (nothing to fetch ⇒ nothing to
    * forbid). `rules` is [[robotsRules]] output (or any
    * `(host, rule, prefix)` table). Rule tables are host-sized —
    * broadcast by default; the longest-match fold runs inside each
    * URL row over the host's rule array (order-independent: strictly
    * better = longer prefix, or equal length upgrading to allow). */
  def robotsFilter(
      urls: DataFrame,
      rules: DataFrame,
      urlCol: String = "link_url",
      hostCol: String = "link_host",
      broadcastRules: Boolean = true): DataFrame = {
    val sets = rules
      .groupBy(col("host").as(hostCol))
      .agg(collect_list(struct(col("rule"), col("prefix"))).as("_rs"))
    val rhs = if (broadcastRules) broadcast(sets) else sets
    val pathq = regexp_replace(col(urlCol), PathQueryPat, "")
    val matching = filter(col("_rs"),
      r => startswith(pathq, r.getField("prefix")))
    val best = aggregate(matching,
      struct(lit(-1).as("l"), lit(true).as("a")),
      (acc, r) => {
        val rl = length(r.getField("prefix")).cast("int")
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
