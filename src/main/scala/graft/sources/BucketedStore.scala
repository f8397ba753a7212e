package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed parquet table layout — the Spark-native answer to "this
  * join shuffles both sides every time": write a table pre-hashed into
  * `buckets` files per partition on its join/aggregation key, and
  * every subsequent equi-join or groupBy on that key plans WITHOUT an
  * Exchange on that side (the scan's `outputPartitioning` already IS
  * `HashPartitioning(key, buckets)`). At 100 TB this is the layout
  * decision that turns the fact-to-fact join from "shuffle 100 TB
  * twice, every query" into "shuffle once, at write time, amortized
  * over every query after" — the one co-location tool `broadcast()`
  * cannot cover because neither side fits an executor.
  *
  * Mechanics and contracts:
  *
  *  - tables are EXTERNAL (caller-owned `path`); the catalog entry
  *    carries the bucket spec, which is what the planner reads — the
  *    files alone don't advertise their layout.
  *  - both sides of a co-located join must share the bucket COLUMN and
  *    COUNT; mismatched counts re-shuffle the smaller side only
  *    (still a win, priced by the spec).
  *  - `sortBy` additionally orders rows inside each bucket file —
  *    with one file per bucket the scan's `outputOrdering` feeds
  *    sort-merge join without a Sort node. [[write]] repartitions onto
  *    the bucket key before writing, giving exactly one file per
  *    bucket per write — both for the sorted-scan contract and
  *    because bucketed writers otherwise emit (input partitions ×
  *    buckets) files, the small-file explosion that kills object-store
  *    listings at scale.
  *  - re-registering an existing name is an overwrite (layout changes
  *    included): the catalog entry is dropped first, so a stale spec
  *    can never describe fresh files.
  *
  * The speedup is plan-shape, not value-shape: results are
  * byte-identical to the unbucketed join, which is exactly what the
  * q_bucketed_join oracle pins (DuckDB joins the plain parquet).
  */
object BucketedStore {

  /** Write `df` as a bucketed (optionally bucket-sorted) external
    * parquet table registered as `tableName`. */
  def write(
      df: DataFrame,
      tableName: String,
      path: String,
      bucketCol: String,
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(buckets >= 1, s"buckets=$buckets must be >= 1")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val w = df
      .repartition(buckets, df(bucketCol)) // one file per bucket
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet")
      .saveAsTable(tableName)
  }

  /** The registered bucketed table — reads carry the bucket spec, so
    * joins/aggregations on the bucket key plan exchange-free. */
  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Shuffle-exchange count in the executed plan — the cost the layout
    * exists to remove; specs assert with it. String-matched because an
    * AdaptiveSparkPlanExec wrapper hides its inner plan from tree
    * walks (`collect`/`exists` see one opaque node) while printing it
    * in full; `BroadcastExchange` never matches the pattern. */
  def shuffleCount(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  /** True iff the plan contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean = shuffleCount(df) > 0
}
