package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TextNorm

/** Parquet persistence for the inverted index, laid out for serving:
  * partitioned by the word's first character, so a point lookup
  * (`main/app.py:72` — the reference's only read query) prunes to one
  * partition directory and pushes `word = ?` into the parquet scan.
  *
  * At 100 TB the layout generalizes: partition by a hash-prefix of the
  * word (2 hex chars → 256 dirs) instead of the raw first letter; the
  * mechanics below are identical. The canonical in-flight shape stays
  * the flat (word, doc_id, cnt) — see [[InvertedIndex]].
  */
object IndexStore {

  private val PrefixCol = "word_pfx"

  /** Persist, partitioned by first character (empty-safe: '_' for the
    * degenerate empty word, which normalize() can produce upstream of
    * the tokenizer filter). */
  def save(index: DataFrame, path: String): Unit =
    index
      .withColumn(PrefixCol, coalesce(nullif(substring(col("word"), 1, 1), lit("")), lit("_")))
      .write.mode("overwrite")
      .partitionBy(PrefixCol)
      .parquet(path)

  /** Load the canonical flat index (partition column dropped). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("word", "doc_id", "cnt")

  /** Served point lookup: prefix predicate prunes partitions, word
    * predicate pushes into the parquet row-group scan; postings sorted
    * cnt desc / doc_id asc (the reference UI's result table,
    * `main/app.py:73-77`, with deterministic ties). */
  def lookup(spark: SparkSession, path: String, word: String): DataFrame = {
    val key = TextNorm.normalizeKey(word)
    val pfx = if (key.isEmpty) "_" else key.substring(0, 1)
    spark.read.parquet(path)
      .filter(col(PrefixCol) === pfx && col("word") === key)
      .select(col("doc_id"), col("cnt"))
      .orderBy(col("cnt").desc, col("doc_id").asc)
  }
}
