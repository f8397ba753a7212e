package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus sources/sinks mirroring the reference's storage formats.
  *
  * The reference's corpus is a folder of `.txt` blobs, document
  * identity = base filename (`mapper/main.py:63`); its intermediates
  * are header'd CSV tuple files (`mapper/main.py:67-74`) and nested
  * JSON. Spark subsumes the intermediates entirely (shuffle files),
  * so the CSV codec here exists only for interop with artifacts a
  * reference deployment already produced.
  *
  * Scale: `spark.read.text` is splittable per file and packs many
  * small files per task under `spark.sql.files.maxPartitionBytes` —
  * this replaces the reference's greedy LPT file assignment
  * (`master/main.py:33-47`) with no custom scheduler.
  */
object TextCorpus {

  private def docIdCol = regexp_extract(input_file_name(), "[^/]+$", 0).as("doc_id")

  /** File-per-document scan: one row per file, whole contents as
    * `text` — the reference's read path (`master/main.py:12-15`).
    * NOTE wholetext files are not splittable; fine for documents,
    * wrong for one giant file (use [[readLines]]). */
  def readDocuments(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .select(docIdCol, col("value").as("text"))

  /** Line-per-row scan: the reference's single-big-file split path
    * (`master/main.py:21-31`) — block-based splits, no line counting,
    * no degenerate `lines < M` case. */
  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.text(dir)
      .select(docIdCol, col("value").as("line"))

  /** Write the (word, doc, cnt) tuple stream in the reference's mapper
    * CSV shape: header `Word,Document,Count` (`mapper/main.py:69`). */
  def writeTupleCsv(index: DataFrame, path: String): Unit =
    index.select(
      col("word").as("Word"),
      col("doc_id").cast("string").as("Document"),
      col("cnt").as("Count"))
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Read the reference's mapper CSV back into the canonical flat
    * shape (`create_json_file/main.py:35-42` — but with an explicit
    * schema instead of pandas inference). */
  def readTupleCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .schema("Word STRING, Document STRING, Count BIGINT")
      .csv(path)
      .select(
        col("Word").as("word"),
        col("Document").as("doc_id"),
        col("Count").as("cnt"))

  /** Name of the corrupt-record column [[readJsonl]] surfaces. */
  val CorruptCol = "_corrupt_record"

  /** JSONL corpus scan — the interchange format most large text corpora
    * ship in (one JSON object per line, `{"doc_id": ..., "text": ...}`
    * plus arbitrary extra fields, which are preserved). The schema is
    * EXPLICIT: inference would scan the data twice and silently widen
    * types between drops. JSONL is line-splittable, so a 100 TB corpus
    * scans with normal block parallelism — unlike wholetext files.
    *
    * Corrupt-record contract: a 100 TB crawl WILL contain malformed
    * lines, and dropping them silently (or turning them into all-null
    * rows, the old behavior) loses data without a trace. The scan runs
    * PERMISSIVE with [[CorruptCol]] declared: a malformed line keeps
    * its parseable fields, nulls the rest, and carries the RAW line in
    * [[CorruptCol]]; clean lines carry null there. Callers route rows
    * with `col(CorruptCol).isNotNull` to a quarantine sink and drop the
    * column for processing ([[cleanJsonl]]). Spark restriction: a query
    * whose required schema is ONLY the corrupt column is disallowed
    * (SPARK-21610) — always select it alongside at least one data
    * column.
    *
    * @param extraFields additional `name DDL-type` column declarations,
    *   e.g. `Seq("lang STRING", "source STRING")`.
    */
  def readJsonl(spark: SparkSession, path: String,
      extraFields: Seq[String] = Nil): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(("doc_id BIGINT" +: "text STRING" +: extraFields :+ s"$CorruptCol STRING")
        .mkString(", "))
      .json(path)

  /** The clean rows of a [[readJsonl]] scan, corrupt column dropped —
    * what the processing pipeline consumes. */
  def cleanJsonl(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** The malformed rows of a [[readJsonl]] scan: (raw line) plus any
    * fields that did parse — what a quarantine sink persists for
    * inspection/replay. */
  def corruptJsonl(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)

  /** JSONL corpus sink (one object per line, UTF-8) — the export twin
    * of [[readJsonl]]. */
  def writeJsonl(docs: DataFrame, path: String): Unit =
    docs.write.mode("overwrite").json(path)
}
