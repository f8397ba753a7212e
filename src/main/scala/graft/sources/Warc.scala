package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) scan — the container format web crawls actually
  * ship (Common Crawl distributes its corpus as WARC). A WARC file is
  * a sequence of records, each a header block (`WARC/1.x` version
  * line + `Name: value` headers) and a content block, separated by a
  * blank line and terminated by two CRLFs; `response` records carry
  * the HTTP response (status line + headers + entity body) as
  * content.
  *
  * The read is PURE COLUMN ALGEBRA over a `wholetext` scan — record
  * split at the mandated two-CRLF + version-marker boundary, header
  * fields by anchored multiline regex, the HTTP entity body after the
  * response's own blank line. No mapPartitions, no custom Hadoop
  * InputFormat: tasks stay codegen-friendly and the operator composes
  * lazily with the crawl front ([[graft.ops.Html.htmlToText]] →
  * C4 rules → dedup ladder) in one plan.
  *
  * Documented approximations:
  *  - UNCOMPRESSED WARCs only. Common Crawl's `.warc.gz` uses a gzip
  *    member per record; `wholetext` decompresses whole-file gzip
  *    transparently (Hadoop codec), which concatenated members ARE —
  *    but a 1 GB gzip file is one task, so re-shard or gunzip first
  *    for parallelism.
  *  - Content-Length is not used to bound the content block (that
  *    needs byte-offset iteration — a mapPartitions rung this scan
  *    deliberately avoids). A BINARY payload that happens to contain
  *    the record marker splits early; the orphaned fragment then
  *    fails the version-line check and is dropped. The text pipelines
  *    this engine feeds tolerate that loss; a byte-exact archival
  *    reader would not, and should use a dedicated InputFormat.
  *  - `wholetext` is per-file memory: fine for the ~1 GB shard files
  *    crawls write, wrong for one giant archive.
  */
object Warc {

  /** Record boundary: two CRLFs followed by the next version line
    * (lookahead keeps the marker with its record). Java regex only —
    * sources have no DuckDB twin, so the ∩ RE2 restriction the
    * oracle-gated operators carry does not bind here. */
  val RecordSplitPat = "\\r\\n\\r\\n(?=WARC/\\d)"

  /** `Name: value` WARC header fields (case-insensitive, multiline). */
  val TypePat = "(?im)^WARC-Type:[ \\t]*([^\\r\\n]+)"
  val RecordIdPat = "(?im)^WARC-Record-ID:[ \\t]*<([^>\\r\\n]+)>"
  val TargetUriPat = "(?im)^WARC-Target-URI:[ \\t]*([^\\r\\n]+)"
  val DatePat = "(?im)^WARC-Date:[ \\t]*([^\\r\\n]+)"
  val VersionPat = "^WARC/(\\d[^\\r\\n]*)"

  /** HTTP response grammar inside a `response` record's content. */
  val HttpStatusPat = "^HTTP/[0-9.]+[ \\t]+([0-9]{3})"
  val HttpHeaderEndPat = "(?s)^HTTP/.*?\\r\\n\\r\\n"
  val LocationPat = "(?im)^Location:[ \\t]*([^\\r\\n]+)"

  private def field(block: Column, pat: String): Column =
    nullif(regexp_extract(block, pat, 1), lit(""))

  /** Every record of every WARC file under `path`:
    * `(warc_file, record_idx, warc_version, warc_type, record_id,
    * target_uri, warc_date, content)` — header fields NULL when
    * absent, `content` the raw block (HTTP bytes included for
    * responses). Fragments that do not start with a version line
    * (marker collision inside a binary payload) are dropped. */
  def readRecords(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("wholetext", "true").text(path)
      .select(
        regexp_extract(input_file_name(), "[^/]+$", 0).as("warc_file"),
        col("value"))
    val recs = raw
      .select(col("warc_file"),
        posexplode(split(col("value"), RecordSplitPat)).as(Seq("record_idx", "rec")))
      .where(col("rec").rlike(VersionPat))
    val header = substring_index(col("rec"), "\r\n\r\n", 1)
    // content = everything after the header block's blank line; the
    // final record's file-terminating CRLFs trim off
    val content = regexp_replace(
      regexp_replace(col("rec"), "(?s)^.*?\r\n\r\n", ""), "[\\r\\n]+$", "")
    recs.select(
      col("warc_file"), col("record_idx"),
      field(header, VersionPat).as("warc_version"),
      field(header, TypePat).as("warc_type"),
      field(header, RecordIdPat).as("record_id"),
      field(header, TargetUriPat).as("target_uri"),
      field(header, DatePat).as("warc_date"),
      content.as("content"))
  }

  /** The crawl-pipeline entry point: `response` records only, HTTP
    * envelope stripped — `(doc_id, url, fetched_at, http_status,
    * text)` with `doc_id` = the WARC record id and `text` the entity
    * body (raw markup — feed [[graft.ops.Html.htmlToText]] /
    * `startJsonl(htmlExtract = true)` next; `url` feeds
    * [[graft.ops.Crawl.urlCanon]] and the URL-dedup gate). Records
    * whose content carries no HTTP envelope keep their content
    * verbatim with NULL status (some writers store bare bodies). */
  /** WET shards (Common Crawl's extracted-text sibling of WARC): the
    * SAME container with `conversion` records whose content is the
    * already-extracted plain text — `(doc_id, url, fetched_at, text)`.
    * Feed the C4 rules / dedup ladder directly (no HTML extraction
    * stage needed). */
  def readConversions(spark: SparkSession, path: String): DataFrame =
    readRecords(spark, path)
      .where(lower(col("warc_type")) === "conversion")
      .select(
        col("record_id").as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetched_at"),
        col("content").as("text"))

  def readResponses(spark: SparkSession, path: String): DataFrame =
    readRecords(spark, path)
      .where(lower(col("warc_type")) === "response")
      .select(
        col("record_id").as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetched_at"),
        nullif(regexp_extract(col("content"), HttpStatusPat, 1), lit(""))
          .cast("int").as("http_status"),
        when(col("content").rlike("^HTTP/"),
          regexp_replace(col("content"), HttpHeaderEndPat, ""))
          .otherwise(col("content")).as("text"))

  /** The redirect map of a crawl archive: `response` records with a
    * 3xx status — `(doc_id, url, http_status, location, redirect_to)`
    * where `redirect_to` is the Location header resolved against the
    * record's own URL and canonicalized
    * ([[graft.ops.Crawl.resolveHref]] — relative Locations are
    * common). Feed into [[graft.ops.Crawl.urlDuplicates]]-style
    * identity: a page reached via redirect IS its target. */
  def redirects(spark: SparkSession, path: String): DataFrame =
    readRecords(spark, path)
      .where(lower(col("warc_type")) === "response")
      .select(
        col("record_id").as("doc_id"),
        col("target_uri").as("url"),
        nullif(regexp_extract(col("content"), HttpStatusPat, 1), lit(""))
          .cast("int").as("http_status"),
        nullif(regexp_extract(col("content"), LocationPat, 1), lit(""))
          .as("location"))
      .where(col("http_status").between(300, 399))
      .withColumn("redirect_to",
        graft.ops.Crawl.resolveHref(col("location"), col("url")))
}
