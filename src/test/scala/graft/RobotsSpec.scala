package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Robots
import SparkSpec.spark.implicits._

class RobotsSpec extends SparkSpec {

  private val body =
    "# preamble comment\nDisallow: /ignored-preamble\n" +
      "User-agent: googlebot\nDisallow: /\n\n" +
      "User-agent: *\n" +
      "Disallow: /private/\n" +
      "Allow: /private/ok\n" +
      "Disallow: /tmp # trailing comment\n" +
      "Disallow:\n" +            // empty = allow-everything idiom -> dropped
      "Disallow: /wild/*/x\n" +  // wildcard -> kept VERBATIM (RFC 9309 §2.2.3)
      "allow: /CASE\n"           // field names case-insensitive

  private def rulesOf(rows: (String, String)*): DataFrame =
    Robots.robotsRules(rows.toDF("host", "robots_txt"))

  test("robotsRules: * group only, trims, drops empties, keeps wildcards, case-insensitive fields") {
    val got = rulesOf("h.org" -> body)
      .as[(String, String, String)].collect().toSet
    assert(got === Set(
      ("h.org", "disallow", "/private/"),
      ("h.org", "allow", "/private/ok"),
      ("h.org", "disallow", "/tmp"),
      ("h.org", "disallow", "/wild/*/x"),
      ("h.org", "allow", "/CASE")))
    // no * group / empty file -> no rules
    assert(rulesOf("a.org" -> "User-agent: bot\nDisallow: /\n", "b.org" -> "").count() === 0)
  }

  test("robotsRules/crawlDelays: host keys canonicalize (case, www., trailing root-dot)") {
    val raw = Seq(("WWW.H.Example.ORG.", "User-agent: *\nDisallow: /x\nCrawl-delay: 7\n"))
      .toDF("host", "robots_txt")
    assert(Robots.robotsRules(raw).as[(String, String, String)].collect().toSet ===
      Set(("h.example.org", "disallow", "/x")))
    assert(Robots.crawlDelays(raw).as[(String, Double)].collect().toMap ===
      Map("h.example.org" -> 7.0))
  }

  test("robotsFilter wildcards: Google's published * and $ examples decide correctly") {
    // the reference examples from Google's robots.txt documentation:
    // /fish* matches /fish.html and /fishheads/x; /*.php matches any
    // path containing .php after any prefix; /*.php$ matches only
    // paths ENDING in .php (the query string defeats it); /fish*.php
    // needs .php after a fish prefix
    val rules = rulesOf("g.org" ->
      ("User-agent: *\nDisallow: /fish*\nDisallow: /*.php$\nDisallow: /a/*.gif\n" +
        "Allow: /fish/ok*\n"))
    val urls = Seq(
      (1L, "https://g.org/fish.html", "g.org"),        // /fish* -> blocked
      (2L, "https://g.org/fishheads/yes", "g.org"),    // /fish* -> blocked
      (3L, "https://g.org/Fish.html", "g.org"),        // match is case-sensitive -> allowed
      (4L, "https://g.org/filename.php", "g.org"),     // /*.php$ -> blocked
      (5L, "https://g.org/filename.php?p=1", "g.org"), // $ defeated by query -> allowed
      (6L, "https://g.org/a/pic.gif", "g.org"),        // /a/*.gif mid-path -> blocked
      (7L, "https://g.org/a/deep/pic.gif?x=1", "g.org"), // * spans segments -> blocked
      (8L, "https://g.org/fish/ok-anything", "g.org")) // longer allow (9) beats /fish* (6)
      .toDF("id", "link_url", "link_host")
    val got = Robots.robotsFilter(urls, rules)
      .select(col("id"), col("robots_allowed")).as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> false, 3L -> true, 4L -> false,
      5L -> true, 6L -> false, 7L -> false, 8L -> true))
  }

  test("robotsFilter wildcards: regex metacharacters in rule values match literally") {
    val rules = rulesOf("m.org" ->
      "User-agent: *\nDisallow: /a.b\nDisallow: /q?x=(1)\nDisallow: /br[ck]\n")
    val urls = Seq(
      (1L, "https://m.org/a.b/page", "m.org"),    // literal dot -> blocked
      (2L, "https://m.org/aXb/page", "m.org"),    // dot must NOT be a regex any -> allowed
      (3L, "https://m.org/q?x=(1)", "m.org"),     // ?() literal -> blocked
      (4L, "https://m.org/br[ck]/z", "m.org"),    // brackets literal -> blocked
      (5L, "https://m.org/brc/z", "m.org"))       // NOT a character class -> allowed
      .toDF("id", "link_url", "link_host")
    val got = Robots.robotsFilter(urls, rules)
      .select(col("id"), col("robots_allowed")).as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false, 4L -> false, 5L -> true))
  }

  test("robotsFilter wildcards: specificity is rule-value octets; equal-length allow still wins") {
    // allow /p/ok (5 octets) beats disallow /p/* (4); disallow
    // /p/any* (7) beats both the 4-octet tie (/p/* dis vs /p/a allow)
    val rules = rulesOf("t.org" ->
      "User-agent: *\nDisallow: /p/*\nAllow: /p/ok\nDisallow: /p/any*\nAllow: /p/a\n")
    val got = Robots.robotsFilter(Seq(
      (1L, "https://t.org/p/ok-page", "t.org"),
      (2L, "https://t.org/p/anything", "t.org"),
      (3L, "https://t.org/p/zzz", "t.org"))
      .toDF("id", "link_url", "link_host"), rules)
      .select(col("id"), col("robots_allowed")).as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("robotsFilter: specificity compares OCTETS, not characters (multibyte rule values)") {
    // allow "/aé" = 3 chars but 4 UTF-8 octets; disallow "/a*z" = 4
    // chars, 4 octets. Both match /aéz. Character-length specificity
    // would rank the disallow longer (4 > 3) and block; the RFC 9309 /
    // Google reference tie-break is octets: 4 == 4, tie -> allow wins.
    val rules = rulesOf("m.org" -> "User-agent: *\nDisallow: /a*z\nAllow: /aé\n")
    val got = Robots.robotsFilter(
      Seq((1L, "https://m.org/aéz", "m.org")).toDF("id", "link_url", "link_host"),
      rules)
      .select(col("robots_allowed")).as[Boolean].head()
    assert(got === true,
      "octet specificity must tie the 4-octet rules and let allow win")
  }

  test("robotsFilter: longest match wins, allow beats disallow on ties, default allow") {
    val rules = rulesOf(
      "h.org" -> ("User-agent: *\nDisallow: /p/\nAllow: /p/ok\n" +
        "Disallow: /tie\nAllow: /tie\n"))
    val urls = Seq(
      (1L, "https://h.org/p/blocked", "h.org"),
      (2L, "https://h.org/p/ok-extra?q=1", "h.org"),     // allow /p/ok (6) > disallow /p/ (3)
      (3L, "https://h.org/tie", "h.org"),                // equal length -> allow wins
      (4L, "https://h.org/elsewhere", "h.org"),          // no match -> allow
      (5L, "https://other.net/p/anything", "other.net"), // no rules -> allow
      (6L, null.asInstanceOf[String], "h.org"))          // null url -> allow
      .toDF("id", "link_url", "link_host")
    val got = Robots.robotsFilter(urls, rules)
      .select(col("id"), col("robots_allowed")).as[(Long, Boolean)].collect().toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> true, 6L -> true))
    // the strip face keeps only fetchable candidates, schema unchanged
    assert(Robots.allowedOnly(urls, rules).select("id").as[Long].collect().toSet ===
      Set(2L, 3L, 4L, 5L, 6L))
  }

  test("robots decision matches against path AND query; rows pass through 1:1") {
    val rules = rulesOf("h.org" -> "User-agent: *\nDisallow: /search?q=\n")
    val urls = Seq(
      ("https://h.org/search?q=x", "h.org"),
      ("https://h.org/search", "h.org"),
      // duplicate rows must BOTH survive (no row-identity collapse)
      ("https://h.org/dup", "h.org"),
      ("https://h.org/dup", "h.org"))
      .toDF("link_url", "link_host")
    val got = Robots.robotsFilter(urls, rules)
      .select("link_url", "robots_allowed").as[(String, Boolean)].collect()
    assert(got.count(_ == (("https://h.org/dup", true))) === 2)
    assert(got.toMap.apply("https://h.org/search?q=x") === false)
    assert(got.toMap.apply("https://h.org/search") === true)
  }

  test("crawlDelays: minimum Crawl-delay of the * group; other groups and delay-free hosts absent") {
    val got = Robots.crawlDelays(Seq(
      ("a.org", "User-agent: *\nCrawl-delay: 10\nDisallow: /x\nCrawl-delay: 2.5\n"),
      ("b.org", "User-agent: gptbot\nCrawl-delay: 99\n"),
      ("c.org", "User-agent: *\nDisallow: /\n")).toDF("host", "robots_txt"))
      .as[(String, Double)].collect().toMap
    assert(got === Map("a.org" -> 2.5))
  }

  test("robots TVF parity: graft_robots_rules / graft_robots_filter") {
    val s = SparkSpec.spark
    graft.plans.GraftExtensions.install(s)
    Seq(("h.org", "User-agent: *\nDisallow: /p/\n")).toDF("host", "robots_txt")
      .createOrReplaceTempView("robots_bodies")
    assert(s.sql("SELECT * FROM graft_robots_rules('robots_bodies')").collect().toSet ===
      Robots.robotsRules(s.table("robots_bodies")).collect().toSet)
    Robots.robotsRules(s.table("robots_bodies")).createOrReplaceTempView("robots_rules")
    Seq(("https://h.org/p/x", "h.org"), ("https://h.org/ok", "h.org"))
      .toDF("link_url", "link_host").createOrReplaceTempView("robots_urls")
    assert(s.sql("SELECT * FROM graft_robots_filter('robots_urls', 'robots_rules')")
      .collect().toSet ===
      Robots.robotsFilter(s.table("robots_urls"), s.table("robots_rules"))
        .collect().toSet)
    Seq(("h.org", "User-agent: *\nCrawl-delay: 3\n")).toDF("host", "robots_txt")
      .createOrReplaceTempView("robots_bodies2")
    assert(s.sql("SELECT * FROM graft_crawl_delays('robots_bodies2')").collect().toSet ===
      Robots.crawlDelays(s.table("robots_bodies2")).collect().toSet)
    Seq((1L, "https://h.org/src", "<a href=\"https://h.org/dst\">d</a>"))
      .toDF("doc_id", "url", "text").createOrReplaceTempView("pf_pages")
    Seq(("h.org", 0.5)).toDF("node", "rank").createOrReplaceTempView("pf_ranks")
    Robots.robotsRules(s.table("robots_bodies2")).createOrReplaceTempView("pf_rules")
    Robots.crawlDelays(s.table("robots_bodies2")).createOrReplaceTempView("pf_delays")
    assert(s.sql(
      "SELECT * FROM graft_polite_frontier('pf_pages', 'pf_ranks', 'pf_rules', 'pf_delays', 3)")
      .collect().toSet ===
      graft.ops.Crawl.politeFrontier(s.table("pf_pages"), s.table("pf_ranks"),
        s.table("pf_rules"), s.table("pf_delays"), perHostCap = 3).collect().toSet)
    // the default-delay knob threads through the 6-arg form
    assert(s.sql(
      "SELECT * FROM graft_polite_frontier('pf_pages', 'pf_ranks', 'pf_rules', 'pf_delays', 3, 7.5)")
      .collect().toSet ===
      graft.ops.Crawl.politeFrontier(s.table("pf_pages"), s.table("pf_ranks"),
        s.table("pf_rules"), s.table("pf_delays"), perHostCap = 3,
        defaultDelay = 7.5).collect().toSet)
  }

  test("sitemapDirectives: file-wide (preamble and non-* groups), trimmed, comment-cut, canonicalized; invalid keeps NULL") {
    val robots = Seq(
      // preamble + inside a non-* group + trailing comment form
      ("WWW.A.example.org",
        "Sitemap: https://a.example.org/s1.xml\n" +
          "User-agent: googlebot\nDisallow: /\nSitemap: https://WWW.A.example.org/S2.xml # alt\n" +
          "User-agent: *\nAllow: /\n"),
      // relative (standard-forbidden): row kept with NULL canon
      ("b.example.org", "User-agent: *\nSitemap: /rel.xml\nSitemap:\n"),
      ("c.example.org", "User-agent: *\nDisallow: /x\n"))
      .toDF("host", "robots_txt")
    val got = Robots.sitemapDirectives(robots)
      .as[(String, Int, String, Option[String], Option[String])].collect().toSet
    assert(got === Set(
      ("a.example.org", 0, "https://a.example.org/s1.xml",
        Some("https://a.example.org/s1.xml"), Some("a.example.org")),
      ("a.example.org", 1, "https://WWW.A.example.org/S2.xml",
        Some("https://a.example.org/S2.xml"), Some("a.example.org")),
      ("b.example.org", 0, "/rel.xml", None, None)))
    // SQL face parity
    val s = SparkSpec.spark
    graft.plans.GraftExtensions.install(s)
    robots.createOrReplaceTempView("robots_sm")
    assert(s.sql("SELECT * FROM graft_robots_sitemaps('robots_sm')").collect().toSet ===
      Robots.sitemapDirectives(robots).collect().toSet)
  }
}
