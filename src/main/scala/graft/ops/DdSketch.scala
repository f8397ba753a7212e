package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches (Masson, Rim & Lee, VLDB '19 —
  * "DDSketch: a fast and fully-mergeable quantile sketch with
  * relative-error guarantees") as ENGINE-PORTABLE BUCKET TABLES — the
  * quantile member of the sketch family next to [[Hll]] (distinct) and
  * the CMS heavy hitters: percentiles over 100 TB without holding or
  * re-scanning values, with sketches that MERGE across shards/days by
  * plain per-bucket SUM.
  *
  * Why not `approx_percentile`/`percentile_approx`: Spark's GK-family
  * sketch is inline-only (no persisted, mergeable table form), carries
  * RANK error (a p99 answer can be the p97 value in a heavy tail —
  * exactly where training-data length/latency distributions live), and
  * its internal state is engine-opaque. DDSketch guarantees RELATIVE
  * VALUE error: the p99 estimate is within `alpha` of the true p99
  * VALUE, tails included, and the bucket table below is recomputable
  * by any engine — the DuckDB twin pins every bucket byte-identical.
  *
  * Construction (deterministic in both engines):
  *
  *  - `gamma = (1 + alpha) / (1 − alpha)`; a positive value lands in
  *    bucket `idx = ceil(ln(x) / ln(gamma))` — both engines produce
  *    the same IEEE doubles for `ln` and the division, so the same
  *    value always lands in the same bucket;
  *  - sign split: `sgn = 1` for x > 0, `0` for x = 0 (its own bucket,
  *    idx 0), `−1` for x < 0 (mirrored on `−x`) — the full-real-line
  *    extension the paper describes;
  *  - the sketch is `(group…, sgn, idx, n)`; buckets per group are
  *    bounded by the DATA RANGE, not the row count (~1,150 buckets
  *    per decade-spanning sign at alpha = 0.01), so the table is
  *    model-sized at any scale;
  *  - merge = groupBy(bucket) SUM; quantile = cumulative walk in
  *    `(sgn asc, sgn·idx asc)` order to rank `q·(n−1)`, estimate
  *    `sgn · 2·gamma^idx / (gamma + 1)` (the bucket's geometric
  *    midpoint; 0 for the zero bucket).
  *
  * Scale shape: [[sketch]] is one scan + one combinable
  * groupBy((group, sgn, idx)) — map-side partials reduce each
  * partition to bucket form before the exchange. [[quantiles]] runs a
  * cumulative Window over the SKETCH — a deliberate exception to the
  * no-Window discipline, because the frame is the model-sized bucket
  * table (≤ ~2.3k rows per group at alpha 0.01), never data.
  */
object DdSketch {

  /** Default relative-error guarantee: estimates within 1% of the
    * true quantile VALUE. */
  val DefaultAlpha = 0.01

  private def gammaOf(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  private def requireAlpha(alpha: Double): Unit =
    require(alpha > 0 && alpha < 1, s"alpha=$alpha must be in (0, 1)")

  /** Bucket a value column: `(sgn, idx)`. */
  private def bucketCols(v: Column, gamma: Double): (Column, Column) = {
    val sgn = when(v > 0, lit(1)).when(v < 0, lit(-1)).otherwise(lit(0))
    val mag = abs(v).cast("double")
    val idx = when(v === 0, lit(0L))
      .otherwise(ceil(log(mag) / log(lit(gamma))).cast("long"))
    (sgn, idx)
  }

  /** Build per-group sketches `(groupCols…, sgn, idx, n)` over
    * `valueCol`. NULLs are skipped (aggregate semantics). */
  def sketch(
      df: DataFrame, valueCol: Column, groupCols: Seq[Column],
      alpha: Double = DefaultAlpha): DataFrame = {
    requireAlpha(alpha)
    val (sgn, idx) = bucketCols(valueCol, gammaOf(alpha))
    graft.core.Parallelism.ensure(df)
      .where(valueCol.isNotNull)
      .select(groupCols ++ Seq(sgn.as("sgn"), idx.as("idx")): _*)
      .groupBy(groupCols ++ Seq(col("sgn"), col("idx")): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Union sketches by re-aggregating to `groupCols` — per-bucket SUM
    * is exactly DDSketch merge, so `merge(daily, coarser)` equals the
    * sketch built directly over the union'd data (the q_dd_merge
    * oracle pins the identity). */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy((groupCols ++ Seq("sgn", "idx")).map(col): _*)
      .agg(sum("n").as("n"))

  /** Quantile estimates from a sketch: one row per (group, q) —
    * `(groupCols…, q, est)`. Rank `q·(n−1)` against the cumulative
    * count in value order (`sgn asc, sgn·idx asc` — negative buckets
    * grow DOWNWARD in value as idx grows); the chosen bucket is the
    * first with `cum > rank`; estimate = the bucket's geometric
    * midpoint, 6dp-rounded. The Window runs over the model-sized
    * bucket table (see object doc). */
  def quantiles(
      sketches: DataFrame, groupCols: Seq[String], qs: Seq[Double],
      alpha: Double = DefaultAlpha): DataFrame = {
    requireAlpha(alpha)
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"qs=$qs must be within [0, 1]")
    val gamma = gammaOf(alpha)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("sgn").asc, (col("sgn") * col("idx")).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCols.map(col): _*)
    // merge first: an UNMERGED bucket dir (duplicate (group, sgn, idx)
    // rows across batch partitions) would break the cumulative walk's
    // "first bucket with cum > rank" selection; on merged input the
    // per-bucket SUM is an identity over a range-bounded table
    val cum = merge(
        sketches.select(groupCols.map(col) ++
          Seq(col("sgn"), col("idx"), col("n")): _*),
        groupCols)
      .withColumn("cum", sum("n").over(w))
      .withColumn("total", sum("n").over(tot))
    val est = lit(2.0) * pow(lit(gamma), col("idx").cast("double")) / lit(gamma + 1)
    cum.crossJoin(broadcast(
        sketches.sparkSession.createDataFrame(qs.map(Tuple1(_))).toDF("q")))
      .where(col("cum") > col("q") * (col("total") - 1) &&
        (col("cum") - col("n")) <= col("q") * (col("total") - 1))
      .select(groupCols.map(col) ++ Seq(col("q"),
        round(when(col("sgn") === 0, lit(0.0))
          .otherwise(col("sgn") * est), 6).as("est")): _*)
  }
}
