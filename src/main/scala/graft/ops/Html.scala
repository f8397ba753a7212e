package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PlanSeal.seal

/** HTML → text extraction and markup signals — the step BEFORE every
  * other operator in a crawl pipeline (C4/CCNet consume pre-extracted
  * WET text, but RefinedWeb/FineWeb-class corpora extract from raw
  * markup themselves; without this stage the engine's cleaning ladder
  * ([[TextAnalysis.c4Clean]] → [[Dedup.sentenceSpanDedup]] →
  * [[Dedup.stripDuplicateSpans]]) cannot start from what a crawler
  * actually stores).
  *
  * Extraction is REGEX-ONLY, by design: a full HTML5 tree parser
  * neither exists as a Catalyst expression nor survives the oracle
  * discipline, and the quantity that matters at 100 TB — visible
  * prose, with enough line structure for the line-level rules — is
  * recoverable with a fixed replace chain (the same O(header)
  * "parse just enough" stance as [[Multimodal]]). Documented
  * approximations: a literal `</script>` inside a script STRING ends
  * the block early; only the named entities below decode (numeric
  * character references pass through). Every pattern sticks to the
  * Java-regex ∩ RE2 common subset — inline `(?is)` flags, lazy
  * quantifiers, plain classes, NO backreferences — so the DuckDB twin
  * runs the byte-identical patterns (public constants, interpolated).
  *
  * Both faces are pure row-local column algebra: zero shuffle at any
  * corpus size, scan-cost like the tokenizer.
  */
object Html {

  /** `<!-- ... -->` comments ((?s): a comment may span lines). */
  val CommentPat = "(?s)<!--.*?-->"

  /** Invisible-content blocks dropped whole: script/style/noscript,
    * and head (title/meta are metadata, not page prose — the title is
    * surfaced separately by [[htmlSignals]]). Alternation instead of
    * a backreference: RE2 has no backreferences. */
  val InvisiblePat =
    "(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|" +
      "<noscript[^>]*>.*?</noscript>|<head[^>]*>.*?</head>"

  /** Tags that end a visual line: `<br>` plus CLOSING block-level
    * tags. Replaced by `\n` so the extracted text keeps the line
    * structure the C4 line rules operate on. */
  val LineBreakPat =
    "(?i)<br[ \t]*/?>|</(p|div|h1|h2|h3|h4|h5|h6|li|tr|ul|ol|table|" +
      "blockquote|section|article|header|footer|pre)[ \t]*>"

  /** Any remaining tag — replaced by a SPACE (a tag boundary is a
    * word boundary more often than not; the collapse pass absorbs the
    * extra). */
  val TagPat = "<[^>]*>"

  /** The named entities decoded, in application order (`&amp;` LAST,
    * per the standard double-decode rule) — each is a PLAIN substring
    * replace. `&#39;`/`&apos;` decode to the apostrophe; `&nbsp;` to
    * a regular space. Numeric references beyond these pass through
    * (documented approximation). */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Horizontal whitespace collapsed to one space (the [[TextAnalysis.C4TrimChars]]
    * set — `\n` excluded, it is the line structure). */
  val HWsPat = s"[${TextAnalysis.C4TrimChars}]+"

  /** Anchor inner text, for the link-density signal (group 1). */
  val AnchorPat = "(?is)<a\\b[^>]*>(.*?)</a>"

  /** An anchor OPENER, for the anchor count. */
  val AnchorOpenPat = "(?i)<a\\b"

  /** First `<title>` content (group 1). */
  val TitlePat = "(?is)<title[^>]*>(.*?)</title>"

  /** A tag-ish opener: the cheap looks-like-markup tell. */
  val LooksHtmlPat = "(?i)<[a-z!/]"

  /** The extraction chain as column algebra — ONE fixed order, shared
    * by both faces and mirrored step-for-step by the oracle twin. */
  private def extract(raw: Column): Column = {
    val noComment = regexp_replace(raw, CommentPat, " ")
    val noBlocks = regexp_replace(noComment, InvisiblePat, " ")
    val withBreaks = regexp_replace(noBlocks, LineBreakPat, "\n")
    val noTags = regexp_replace(withBreaks, TagPat, " ")
    val decoded = Entities.foldLeft(noTags) {
      // plain substring replace — the twin's replace() exactly
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    val collapsed = regexp_replace(decoded, HWsPat, " ")
    array_join(
      filter(transform(split(collapsed, "\n"), l => trim(l, " ")),
        l => length(l) > lit(0)),
      "\n")
  }

  /** The REWRITE face: `text` replaced by the markup-stripped prose —
    * what a crawl pipeline feeds into [[TextAnalysis.c4Clean]] and
    * the dedup ladder. Pages without markup pass through (modulo
    * whitespace normalization — the chain is total, not HTML-gated).
    * NULL text behaves as the empty page. All other input columns
    * pass through unchanged (streaming callers carry `source`). */
  def htmlToText(docs: DataFrame): DataFrame = {
    val keep = docs.columns.toSeq
      .filter(c => c != "doc_id" && c != "text").map(col)
    graft.core.Parallelism.ensure(docs)
      .select(col("doc_id") +: keep :+
        extract(coalesce(col("text"), lit(""))).as("text"): _*)
  }

  /** Per-segment extraction for the line faces: strip/decode/collapse
    * WITHOUT the line-break pass (the segment IS a visual line) and
    * without the page-level block removal (already applied). */
  /** Strip/decode/collapse for a SUB-DOCUMENT fragment (a visual line,
    * an anchor element's inner markup): no line-break pass — the
    * fragment IS the unit. Shared with [[Crawl.anchorTexts]]. */
  def extractSegment(seg: Column): Column = {
    val noTags = regexp_replace(seg, TagPat, " ")
    val decoded = Entities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, HWsPat, " "), " ")
  }

  /** Visual-line boilerplate classification — the jusText/trafilatura
    * family's core move, simplified to its two dominant features: a
    * visual line (a `<br>`/closing-block-tag segment) is BOILERPLATE
    * when its link density exceeds `maxLinkDensity` or it carries
    * fewer than `minWords` words; otherwise content. (The published
    * jusText classifier adds stopword density and context smoothing;
    * link density + length carry most of its discrimination, and both
    * survive the cross-engine oracle discipline. Stopword density is
    * already available doc-level via [[TextAnalysis.qualityScore]].)
    *
    * Order matters and is page-level first: comments and invisible
    * blocks can SPAN visual lines, so they are removed before the
    * line split; then each segment strips/decodes independently.
    * Only segments with non-empty extracted text emit (tag-only
    * segments are not lines); `line_idx` numbers the VISUAL segments
    * (pre-filter), so consumers can align against the raw page.
    *
    * Row-local explode — no shuffle; output rows ~ lines. */
  def htmlLines(docs: DataFrame, maxLinkDensity: Double = 0.3,
      minWords: Int = 3): DataFrame = {
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity=$maxLinkDensity must be in [0, 1]")
    require(minWords >= 0, s"minWords=$minWords must be >= 0")
    graft.core.Parallelism.ensure(docs)
      .select(col("doc_id"),
        seal(struct(lineStructs(coalesce(col("text"), lit("")))
          .as("ls"))).as("sx"))
      .select(col("doc_id"), posexplode(col("sx.ls")).as(Seq("line_idx", "s")))
      .where(length(col("s.txt")) > 0)
      .select(col("doc_id"), col("line_idx"),
        col("s.txt").as("text"),
        col("s.n_words").as("n_words"),
        col("s.anchor_chars").as("anchor_chars"),
        length(col("s.txt")).cast("long").as("n_chars"),
        round(col("s.anchor_chars").cast("double") / length(col("s.txt")), 6)
          .as("link_density"))
      .withColumn("boilerplate",
        col("link_density") > lit(maxLinkDensity) ||
          col("n_words") < lit(minWords.toLong))
  }

  /** The main-content REWRITE face: [[htmlLines]]' content lines
    * rejoined with `\n` — pages reduced to their prose, nav/footer
    * chrome gone. Computed entirely at the ARRAY level (no explode,
    * no regroup — the per-doc line array never leaves its row), so
    * it composes with [[TextAnalysis.c4Clean]] and the dedup ladder
    * at pure scan cost. All non-text input columns pass through. */
  def htmlMainText(docs: DataFrame, maxLinkDensity: Double = 0.3,
      minWords: Int = 3): DataFrame = {
    require(maxLinkDensity >= 0 && maxLinkDensity <= 1,
      s"maxLinkDensity=$maxLinkDensity must be in [0, 1]")
    require(minWords >= 0, s"minWords=$minWords must be >= 0")
    val keep = docs.columns.toSeq
      .filter(c => c != "doc_id" && c != "text").map(col)
    graft.core.Parallelism.ensure(docs)
      .select(col("doc_id") +: keep :+
        seal(struct(lineStructs(coalesce(col("text"), lit("")))
          .as("ls"))).as("sx"): _*)
      .select(col("doc_id") +: keep :+
        array_join(
          transform(
            filter(col("sx.ls"), s =>
              length(s.getField("txt")) > lit(0) &&
                // the SAME round-6 comparison as htmlLines' flag, so
                // the two faces can never disagree at the boundary
                !(round(s.getField("anchor_chars").cast("double") /
                    length(s.getField("txt")), 6) > lit(maxLinkDensity) ||
                  s.getField("n_words") < lit(minWords.toLong))),
            s => s.getField("txt")),
          "\n").as("text"): _*)
  }

  /** Per-visual-line structs (txt, n_words, anchor_chars) from a raw
    * page — the shared machinery of both line faces. */
  private def lineStructs(raw: Column): Column = {
    val pre = regexp_replace(regexp_replace(raw, CommentPat, " "),
      InvisiblePat, " ")
    transform(split(pre, LineBreakPat), seg => {
      val txt = extractSegment(seg)
      struct(
        txt.as("txt"),
        size(filter(split(txt, HWsPat), w => length(w) > lit(0)))
          .cast("long").as("n_words"),
        aggregate(
          transform(regexp_extract_all(seg, lit(AnchorPat), lit(1)),
            a => length(regexp_replace(a, TagPat, "")).cast("long")),
          lit(0L), (acc, x) => acc + x).as("anchor_chars"))
    })
  }

  /** The SIGNALS face: markup statistics a curation gate thresholds
    * BEFORE paying for downstream stages — tag/anchor counts, script
    * payload size, the link-density signal (anchor chars over
    * extracted chars — boilerplate/nav pages score high; the jusText/
    * trafilatura family's core discriminator, lifted to doc level),
    * extraction yield (`text_ratio`), and the page title.
    *
    * `anchor_chars` measures tag-stripped anchor inner text BEFORE
    * entity decode / collapse, so `link_density` can exceed 1 on
    * pathological markup — it is a ranking signal, not a fraction.
    * Ratios are NULL where their denominator is 0.
    */
  def htmlSignals(docs: DataFrame): DataFrame =
    graft.core.Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("raw"))
      .select(col("doc_id"), col("raw"),
        seal(struct(
          extract(col("raw")).as("txt"),
          aggregate(
            transform(regexp_extract_all(col("raw"), lit(AnchorPat), lit(1)),
              a => length(regexp_replace(a, TagPat, "")).cast("long")),
            lit(0L), (acc, x) => acc + x).as("anchor_chars"))).as("sx"))
      .select(col("doc_id"),
        col("raw").rlike(LooksHtmlPat).as("looks_html"),
        size(regexp_extract_all(col("raw"), lit(TagPat), lit(0)))
          .cast("long").as("n_tags"),
        size(regexp_extract_all(col("raw"), lit(AnchorOpenPat), lit(0)))
          .cast("long").as("n_anchors"),
        aggregate(
          transform(regexp_extract_all(col("raw"), lit(InvisiblePat), lit(0)),
            b => length(b).cast("long")),
          lit(0L), (acc, x) => acc + x).as("script_chars"),
        col("sx.anchor_chars").as("anchor_chars"),
        length(col("raw")).cast("long").as("n_chars_raw"),
        length(col("sx.txt")).cast("long").as("n_chars_text"),
        when(length(col("sx.txt")) > 0,
          round(col("sx.anchor_chars").cast("double") / length(col("sx.txt")), 6))
          .as("link_density"),
        when(length(col("raw")) > 0,
          round(length(col("sx.txt")).cast("double") / length(col("raw")), 6))
          .as("text_ratio"),
        nullif(regexp_extract(col("raw"), TitlePat, 1), lit("")).as("title"))
}
