package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.TextNorm

/** The reference's batch entry point, shape-for-shape: a request naming
  * the corpus files and an EXPLICIT mapper/reducer count
  * (`master/main.py:137-142` — `{"filenames": [...],
  * "number_of_mappers": M, "number_of_reducers": R}`).
  *
  * Spark mapping (SURVEY §3.3):
  *   - `number_of_mappers` → parallelism of the tokenize stage: the
  *     scan is round-robin repartitioned to exactly M splits (the
  *     reference's greedy LPT file assignment, `master/main.py:33-47`,
  *     becomes one repartition).
  *   - `number_of_reducers` → partition count of the counting shuffle:
  *     set as `spark.sql.shuffle.partitions` on a CLONED session
  *     (`spark.newSession()` shares catalog/state but owns its SQLConf),
  *     so the caller's session conf is never mutated (round-1 ADVICE
  *     pattern) and map-side partial aggregation is preserved — unlike
  *     a manual `repartition(R, keys)`, which would move raw tuples.
  *
  * This wrapper exists for migration fidelity: normal users should call
  * [[graft.index.InvertedIndex.build]] and let Spark pick both numbers
  * (input splits from file sizes, reducers from AQE coalescing) — on a
  * 100 TB corpus hand-picked constants are strictly worse.
  */
object BatchJob {

  /** Run the reference pipeline over `filenames` under `corpusDir` with
    * the explicit topology; returns the flat (word, doc_id, cnt) index.
    */
  def run(
      spark: SparkSession,
      corpusDir: String,
      filenames: Seq[String],
      numberOfMappers: Int,
      numberOfReducers: Int): DataFrame = {
    require(filenames.nonEmpty, "filenames must be non-empty")
    require(numberOfMappers > 0 && numberOfReducers > 0,
      s"mapper/reducer counts must be positive, got $numberOfMappers/$numberOfReducers")
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", numberOfReducers)
    // the caller asked for EXACTLY R reducers; AQE would coalesce the
    // counting shuffle below that on a small corpus (cloned session
    // only — normal queries keep adaptive coalescing)
    session.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val paths = filenames.map(f => s"$corpusDir/$f")
    val docs = session.read.option("wholetext", "true").text(paths: _*)
      .select(regexp_extract(input_file_name(), "[^/]+$", 0).as("doc_id"),
        col("value").as("text"))
      .repartition(numberOfMappers) // the explicit mapper fan-out
    // inline index pipeline (no Parallelism.ensure — the caller asked
    // for exactly M mapper splits, honor it)
    docs
      .select(col("doc_id"), explode(TextNorm.tokens(col("text"))).as("word"))
      .groupBy("word", "doc_id")
      .agg(count(lit(1)).as("cnt"))
  }
}
