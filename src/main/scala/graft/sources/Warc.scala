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
  * response's own blank line. No custom Hadoop InputFormat: tasks
  * stay codegen-friendly and the operator composes lazily with the
  * crawl front ([[graft.ops.Html.htmlToText]] → C4 rules → dedup
  * ladder) in one plan. [[readRecordsGz]] adds the one genuinely
  * imperative rung — per-member gunzip of `.warc.gz` (gzip member per
  * record, the Common Crawl wire format) — and feeds the SAME column
  * algebra.
  *
  * Documented approximations:
  *  - Content-Length is not used to bound the content block (that
  *    needs byte-offset iteration — a per-record byte walk this scan
  *    deliberately avoids). A BINARY payload that happens to contain
  *    the record marker splits early; the orphaned fragment then
  *    fails the version-line check and is dropped. The text pipelines
  *    this engine feeds tolerate that loss; a byte-exact archival
  *    reader would not, and should use a dedicated InputFormat.
  *  - Each record's content strips AT MOST ONE trailing `\r\n\r\n`:
  *    the record terminator survives the boundary split only on the
  *    file's FINAL record, but the strip is applied uniformly, so an
  *    interior record whose body GENUINELY ends with a blank CRLF
  *    line loses that blank line. Other trailing newlines (a WET
  *    conversion text ending in `\n`) pass through untouched.
  *  - `wholetext`/`binaryFile` are per-file memory: fine for the
  *    ~1 GB shard files crawls write, wrong for one giant archive;
  *    split granularity is file-per-task for both readers (gzip
  *    members do not expose Hadoop split points without an index).
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

  /** The shared record parse over a `(warc_file, value)` table —
    * both the plain and the gzip reader end here, so they are
    * record-identical by construction. */
  private def recordsFrom(raw: DataFrame): DataFrame = {
    val recs = raw
      .select(col("warc_file"),
        posexplode(split(col("value"), RecordSplitPat)).as(Seq("record_idx", "rec")))
      .where(col("rec").rlike(VersionPat))
    val header = substring_index(col("rec"), "\r\n\r\n", 1)
    // content = everything after the header block's blank line, minus
    // AT MOST ONE trailing \r\n\r\n record terminator (present only on
    // the file's final record — see the scaladoc approximation)
    val content = regexp_replace(
      regexp_replace(col("rec"), "(?s)^.*?\r\n\r\n", ""), "\\r\\n\\r\\n$", "")
    recs.select(
      col("warc_file"), col("record_idx"),
      field(header, VersionPat).as("warc_version"),
      field(header, TypePat).as("warc_type"),
      field(header, RecordIdPat).as("record_id"),
      field(header, TargetUriPat).as("target_uri"),
      field(header, DatePat).as("warc_date"),
      content.as("content"))
  }

  /** Every record of every UNCOMPRESSED WARC file under `path`:
    * `(warc_file, record_idx, warc_version, warc_type, record_id,
    * target_uri, warc_date, content)` — header fields NULL when
    * absent, `content` the raw block (HTTP bytes included for
    * responses). Fragments that do not start with a version line
    * (marker collision inside a binary payload) are dropped. */
  def readRecords(spark: SparkSession, path: String): DataFrame =
    recordsFrom(spark.read.option("wholetext", "true").text(path)
      .select(
        regexp_extract(input_file_name(), "[^/]+$", 0).as("warc_file"),
        col("value")))

  /** [[readRecords]] for `.warc.gz` shards — gzip MEMBER PER RECORD,
    * the format Common Crawl actually distributes. `binaryFile` scan
    * + one imperative map per file (the engine's rung-d contract, cf.
    * [[graft.ops.Multimodal]]): walk the gzip container member by
    * member with exact boundaries (header parse + raw-deflate inflate
    * + CRC32/ISIZE trailer check), QUARANTINE corrupt members (CRC
    * mismatch, truncation, bad header) by resynchronizing at the next
    * member magic — a bad member never fails the task and never
    * poisons its neighbors — then feed the identical record parse.
    * One task per file (members don't expose split points); re-shard
    * upstream for parallelism, exactly as with `wholetext`. */
  def readRecordsGz(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.format("binaryFile").load(path)
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("warc_file"),
        col("content"))
      .as[(String, Array[Byte])]
      .map { case (f, bytes) => (f, gunzipMembers(bytes)) }
      .toDF("warc_file", "value")
    recordsFrom(raw)
  }

  /** Decompress a concatenated-gzip-member byte stream, skipping
    * corrupt members. Exact member walk: parse each member's header
    * (RFC 1952 — fixed 10 bytes + optional EXTRA/NAME/COMMENT/HCRC
    * per FLG), inflate the raw-deflate body with [[java.util.zip.Inflater]]
    * (which reports the exact compressed length consumed), verify the
    * CRC32 + ISIZE trailer, and step to the next member. Any failure
    * discards THAT member's output and resynchronizes at the next
    * `1f 8b 08` magic. Decoded as UTF-8 with replacement — the same
    * stance as the `wholetext` text scan. */
  private[graft] def gunzipMembers(bytes: Array[Byte]): String = {
    val n = bytes.length
    val out = new java.io.ByteArrayOutputStream(math.max(64, n * 3))
    def isMagic(i: Int): Boolean =
      i + 2 < n && bytes(i) == 0x1f.toByte && bytes(i + 1) == 0x8b.toByte &&
        bytes(i + 2) == 0x08.toByte
    def nextMagic(from: Int): Int = {
      var i = math.max(from, 0)
      while (i < n && !isMagic(i)) i += 1
      i
    }
    var off = nextMagic(0)
    while (off < n) {
      try {
        off = inflateMember(bytes, off, out)
        if (off < n && !isMagic(off)) off = nextMagic(off + 1)
      } catch {
        case scala.util.control.NonFatal(_) =>
          off = nextMagic(off + 3) // quarantine this member, resync
      }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Inflate ONE gzip member starting at `off` (must be at the magic),
    * append its payload to `out` only if the whole member verifies,
    * and return the offset just past its trailer. Throws on any
    * malformation — the caller quarantines. */
  private def inflateMember(
      bytes: Array[Byte], off: Int, out: java.io.ByteArrayOutputStream): Int = {
    val n = bytes.length
    var p = off
    if (n - p < 18) throw new java.io.EOFException("member shorter than minimum")
    val flg = bytes(p + 3) & 0xff
    p += 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte little-endian length + payload
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2 + xlen
    }
    if ((flg & 8) != 0) { while (bytes(p) != 0) p += 1; p += 1 }  // FNAME (NUL-terminated)
    if ((flg & 16) != 0) { while (bytes(p) != 0) p += 1; p += 1 } // FCOMMENT
    if ((flg & 2) != 0) p += 2                                    // FHCRC
    if (p >= n) throw new java.io.EOFException("header ran past end")
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, n - p)
      val buf = new Array[Byte](65536)
      val tmp = new java.io.ByteArrayOutputStream(65536)
      val crc = new java.util.zip.CRC32
      while (!inf.finished()) {
        val k = inf.inflate(buf)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          throw new java.util.zip.DataFormatException("truncated deflate stream")
        tmp.write(buf, 0, k); crc.update(buf, 0, k)
      }
      val end = p + inf.getBytesRead.toInt
      if (n - end < 8) throw new java.io.EOFException("missing gzip trailer")
      def le32(i: Int): Long =
        ((bytes(i) & 0xffL)) | ((bytes(i + 1) & 0xffL) << 8) |
          ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
      if (le32(end) != crc.getValue)
        throw new java.util.zip.ZipException("CRC32 mismatch")
      if (le32(end + 4) != (tmp.size().toLong & 0xffffffffL))
        throw new java.util.zip.ZipException("ISIZE mismatch")
      tmp.writeTo(out) // commit only after the trailer verifies
      end + 8
    } finally inf.end()
  }

  /** WET shards (Common Crawl's extracted-text sibling of WARC): the
    * SAME container with `conversion` records whose content is the
    * already-extracted plain text — `(doc_id, url, fetched_at, text)`.
    * Feed the C4 rules / dedup ladder directly (no HTML extraction
    * stage needed). `gz = true` reads `.wet.gz` via [[readRecordsGz]]. */
  def readConversions(spark: SparkSession, path: String, gz: Boolean = false): DataFrame =
    (if (gz) readRecordsGz(spark, path) else readRecords(spark, path))
      .where(lower(col("warc_type")) === "conversion")
      .select(
        col("record_id").as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetched_at"),
        col("content").as("text"))

  /** The crawl-pipeline entry point: `response` records only, HTTP
    * envelope stripped — `(doc_id, url, fetched_at, http_status,
    * text)` with `doc_id` = the WARC record id and `text` the entity
    * body (raw markup — feed [[graft.ops.Html.htmlToText]] /
    * `startJsonl(htmlExtract = true)` next; `url` feeds
    * [[graft.ops.Crawl.urlCanon]] and the URL-dedup gate). Records
    * whose content carries no HTTP envelope keep their content
    * verbatim with NULL status (some writers store bare bodies).
    * `gz = true` reads `.warc.gz` via [[readRecordsGz]]. */
  def readResponses(spark: SparkSession, path: String, gz: Boolean = false): DataFrame =
    (if (gz) readRecordsGz(spark, path) else readRecords(spark, path))
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

  /** The WET SINK — the write half of the crawl round-trip: emit a
    * `(doc_id, url, fetched_at, text)` table as spec-shaped WET
    * `conversion` records (ISO 28500 header block + entity + the
    * two-CRLF terminator), one shard file per non-empty partition,
    * gzip MEMBER PER RECORD under `gz = true` (the Common Crawl wire
    * format [[readRecordsGz]] consumes). This closes the loop the
    * engine could previously only enter: re-distribution and
    * inter-pipeline handoff round-trip through WET, and
    * `readConversions(writeConversions(x)) ≡ x` on clean input (the
    * parity spec pins header fields and text; "clean" = text carrying
    * neither a trailing CRLF blank line nor an embedded record
    * marker — the reader's two documented approximations).
    *
    * Header-value hygiene: record id / URI / date are header-line
    * values, so embedded CR/LF would corrupt the framing — they are
    * stripped (total-function stance; clean values pass verbatim).
    * NULL url/date omit their header line (the reader yields NULL
    * back). `Content-Length` is written in octets per the spec even
    * though the reader does not bound by it (scaladoc approximation).
    *
    * Scale shape: one row-parallel pass; each task streams its
    * partition straight to its own shard via the Hadoop FS API — no
    * driver collection, no shuffle; shard sizing = upstream
    * partitioning (repartition to target shard count first). Returns
    * the written shard names (task-count-sized). */
  def writeConversions(
      docs: DataFrame, dir: String, gz: Boolean = false): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val clean = (c: Column) => regexp_replace(c.cast("string"), "[\\r\\n]", "")
    val rows = docs.select(
      coalesce(clean(col("doc_id")), lit("")).as("id"),
      clean(col("url")).as("url"),
      clean(col("fetched_at")).as("dt"),
      coalesce(col("text"), lit("")).as("text"))
      .as[(String, String, String, String)]
    val dirStr = dir
    val useGz = gz
    rows.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val name = f"part-$pid%05d.warc.wet" + (if (useGz) ".gz" else "")
        val p = new org.apache.hadoop.fs.Path(dirStr, name)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        try {
          it.foreach { case (id, url, dt, text) =>
            val body = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val h = new StringBuilder(256)
            h.append("WARC/1.0\r\n")
            h.append("WARC-Type: conversion\r\n")
            h.append("WARC-Record-ID: <").append(id).append(">\r\n")
            if (url != null) h.append("WARC-Target-URI: ").append(url).append("\r\n")
            if (dt != null) h.append("WARC-Date: ").append(dt).append("\r\n")
            h.append("Content-Length: ").append(body.length).append("\r\n\r\n")
            val rec = new java.io.ByteArrayOutputStream(body.length + 300)
            rec.write(h.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            rec.write(body)
            rec.write("\r\n\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
            if (useGz) {
              // one gzip member per record — the Common Crawl framing
              // readRecordsGz's member walk expects; built in memory so
              // close() releases the Deflater's native state per member
              val member = new java.io.ByteArrayOutputStream(rec.size() / 2 + 64)
              val gzOut = new java.util.zip.GZIPOutputStream(member)
              rec.writeTo(gzOut)
              gzOut.close()
              member.writeTo(out)
            } else rec.writeTo(out)
          }
        } finally out.close()
        Iterator.single(name)
      }
    }.collect().toSeq.sorted
  }

  /** The redirect map of a crawl archive: `response` records with a
    * 3xx status — `(doc_id, url, http_status, location, redirect_to)`
    * where `redirect_to` is the Location header resolved against the
    * record's own URL and canonicalized
    * ([[graft.ops.Crawl.resolveHref]] — relative Locations are
    * common). Feed into [[graft.ops.Crawl.urlDuplicatesWithRedirects]]:
    * a page reached via redirect IS its target. */
  def redirects(spark: SparkSession, path: String, gz: Boolean = false): DataFrame =
    (if (gz) readRecordsGz(spark, path) else readRecords(spark, path))
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
