package graft

import org.apache.spark.sql.DataFrame
import graft.ops.Html
import SparkSpec.spark.implicits._

class HtmlSpec extends SparkSpec {

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val page =
    "<!DOCTYPE html><html><head><title>A Probe Page</title>" +
      "<style>body { color: red; }</style></head><body><h1>Main Heading</h1>" +
      "<p>First paragraph with <b>bold</b> text &amp; an entity.</p>" +
      "<script>var x = \"</p>\"; alert(1);</script>" +
      "<p>Links to <a href=\"https://example.com\">a fine site</a> now.</p>" +
      "<!-- hidden comment --><ul><li>Item one</li><li>Item two</li></ul>" +
      "</body></html>"

  test("htmlToText: head/style/script/comment dropped, block closes break lines, entities decode") {
    val got = Html.htmlToText(docs(1L -> page)).as[(Long, String)].head()._2
    assert(got ===
      "Main Heading\nFirst paragraph with bold text & an entity.\n" +
        "Links to a fine site now.\nItem one\nItem two")
    // the script payload — including its fake "</p>" string — is gone
    assert(!got.contains("alert") && !got.contains("color"))
    // the title is metadata, not prose
    assert(!got.contains("Probe Page"))
  }

  test("htmlToText: malformed markup is text; entities decode AFTER tag strip; double-encoding survives one level") {
    val got = Html.htmlToText(docs(
      1L -> "Unclosed <b bold stays and a stray < stays. An escaped &lt;tag&gt; survives.",
      2L -> "Double encoded &amp;lt; stays encoded once.")).as[(Long, String)]
      .collect().toMap
    // no closing '>' => not a tag => kept verbatim
    assert(got(1L).contains("<b bold stays") && got(1L).contains("stray <"))
    // &lt;tag&gt; decodes to literal <tag> text (strip already ran)
    assert(got(1L).contains("<tag>"))
    // &amp; decodes LAST: &amp;lt; -> &lt; (NOT <)
    assert(got(2L) === "Double encoded &lt; stays encoded once.")
  }

  test("htmlToText is total: plain text passes through (whitespace-normalized), null is the empty page") {
    val got = Html.htmlToText(docs(
        1L -> "Plain first line.\r\nPlain\tsecond  line.\n\nPlain third line.")
      .unionByName(Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text")))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "Plain first line.\nPlain second line.\nPlain third line.")
    assert(got(2L) === "")
  }

  test("htmlSignals: counts, link density, yield, title; plain text scores looks_html false") {
    val farm = "<body><p><a href=\"/a\">Nav one</a> <a href=\"/b\">Nav two</a>" +
      " <a href=\"/c\">Nav three</a></p></body>"
    val got = Html.htmlSignals(docs(1L -> page, 2L -> farm, 3L -> "Just prose here."))
      .as[(Long, Boolean, Long, Long, Long, Long, Long, Long,
        Option[Double], Option[Double], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    val (_, looks1, nTags1, nAnchors1, scriptChars1, anchorChars1, _, _, ld1, tr1, title1) = got(1L)
    assert(looks1 && nAnchors1 === 1L && title1 === Some("A Probe Page"))
    assert(scriptChars1 > 0 && anchorChars1 === "a fine site".length.toLong)
    assert(nTags1 > 20 && ld1.get > 0 && tr1.get > 0 && tr1.get < 0.5)
    // the nav farm's anchor text dominates its extracted text
    val (_, _, _, nAnchors2, _, anchorChars2, _, nText2, ld2, _, title2) = got(2L)
    assert(nAnchors2 === 3L && title2 === None)
    assert(ld2.get > 0.8 && anchorChars2 <= nText2 + 2)
    // plain prose: no markup signals at all
    val (_, looks3, nTags3, _, _, _, _, _, _, tr3, _) = got(3L)
    assert(!looks3 && nTags3 === 0L && tr3 === Some(1.0))
  }

  test("htmlToText composes with the C4 line rules: extract then clean") {
    val html = (1 to 6).map(i =>
      s"<p>Sentence number $i carries enough words to survive.</p>")
      .mkString("<html><body>", "<ul><li>nav</li></ul>", "</body></html>")
    val cleaned = graft.ops.TextAnalysis.c4Clean(Html.htmlToText(docs(1L -> html)))
      .as[(Long, String)].collect().toMap
    // six full sentences survive; the one-word nav items drop
    assert(cleaned(1L).split("\n").length === 6)
    assert(!cleaned(1L).contains("nav"))
  }

  test("graft_html_text / graft_html_signals TVF parity") {
    graft.plans.GraftExtensions.install(SparkSpec.spark)
    docs(1L -> page, 2L -> "Just prose here.").createOrReplaceTempView("html_docs")
    assert(SparkSpec.spark.sql("SELECT * FROM graft_html_text('html_docs')")
      .collect().toSet ===
      Html.htmlToText(SparkSpec.spark.table("html_docs")).collect().toSet)
    assert(SparkSpec.spark.sql("SELECT * FROM graft_html_signals('html_docs')")
      .collect().toSet ===
      Html.htmlSignals(SparkSpec.spark.table("html_docs")).collect().toSet)
  }

  test("htmlLines: visual-line classes — link density and length drive the flag; idx pre-filter") {
    val page2 = "<body><p>A full content sentence with plenty of words here.</p>" +
      "<p><a href=\"/x\">Nav link one</a> <a href=\"/y\">Nav link two</a> also</p>" +
      "<ul><li></li></ul>" + // tag-only segments: never lines
      "<p>tiny</p></body>"
    val rows = Html.htmlLines(docs(1L -> page2))
      .as[(Long, Int, String, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(_._2)
    // 3 non-empty lines survive of the visual segments
    assert(rows.length === 3)
    val (_, _, t0, w0, a0, _, ld0, b0) = rows(0)
    assert(t0 === "A full content sentence with plenty of words here." &&
      w0 === 9L && a0 === 0L && ld0 === 0.0 && !b0)
    val (_, _, _, _, a1, _, ld1, b1) = rows(1)
    assert(a1 === "Nav link oneNav link two".length.toLong && ld1 > 0.3 && b1)
    val (_, _, t2, w2, _, _, _, b2) = rows(2)
    assert(t2 === "tiny" && w2 === 1L && b2) // short, not linky
    // line_idx numbers pre-filter segments: the two kept after idx 0
    // are NOT 1,2 (empty segments between them were filtered)
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted)
  }

  test("htmlMainText: content lines rejoin; face parity with htmlLines; dials move the boundary") {
    val page2 = "<body><p>A full content sentence with plenty of words here.</p>" +
      "<p><a href=\"/x\">Nav link one</a> <a href=\"/y\">Nav link two</a> also</p>" +
      "<p>Second content sentence closes the page nicely.</p></body>"
    val d = docs(1L -> page2, 2L -> "<ul><li><a href=\"/a\">x</a></li></ul>")
    val main = Html.htmlMainText(d).as[(Long, String)].collect().toMap
    assert(main(1L) ===
      "A full content sentence with plenty of words here.\nSecond content sentence closes the page nicely.")
    assert(main(2L) === "") // all boilerplate -> empty page, row kept
    // face parity: main == content lines of htmlLines, rejoined
    val fromLines = Html.htmlLines(d).where(!org.apache.spark.sql.functions.col("boilerplate"))
      .orderBy("doc_id", "line_idx")
      .as[(Long, Int, String, Long, Long, Long, Double, Boolean)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._3).mkString("\n")).toMap
    assert(fromLines.getOrElse(1L, "") === main(1L))
    // dial: admit everything -> the nav line comes back
    val loose = Html.htmlMainText(d, maxLinkDensity = 1.0, minWords = 0)
      .as[(Long, String)].collect().toMap
    assert(loose(1L).split("\n").length === 3)
  }

  test("graft_html_lines / graft_html_main TVF parity") {
    graft.plans.GraftExtensions.install(SparkSpec.spark)
    docs(1L -> page).createOrReplaceTempView("htmll_docs")
    assert(SparkSpec.spark.sql("SELECT * FROM graft_html_lines('htmll_docs')")
      .collect().toSet ===
      Html.htmlLines(SparkSpec.spark.table("htmll_docs")).collect().toSet)
    assert(SparkSpec.spark.sql("SELECT * FROM graft_html_main('htmll_docs')")
      .collect().toSet ===
      Html.htmlMainText(SparkSpec.spark.table("htmll_docs")).collect().toSet)
  }
}
