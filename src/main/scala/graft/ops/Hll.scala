package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable HyperLogLog distinct-count sketches (Flajolet, Fusy,
  * Gandouet & Meunier, AofA '07) as ENGINE-PORTABLE REGISTER TABLES —
  * the persisted, incrementally-mergeable face of distinct counting
  * that an inline `approx_count_distinct` (q_approx_distinct) cannot
  * give: a sketch built today unions with a sketch built next month
  * without rescanning either month's data, because HLL's registers
  * merge by plain per-bucket MAX, and `max` is exactly the algebra a
  * relational engine already has.
  *
  * Why not Spark's binary `hll_sketch_agg`/`hll_union` (present since
  * 3.5, and the right choice when both writer and reader are Spark):
  * the register-TABLE form is readable by ANY engine — the DuckDB twin
  * recomputes every register and the driver's hash gate pins them
  * byte-identical, which no opaque sketch blob can offer — and the
  * construction below is deterministic to the bit, so daily sketch
  * partitions are reproducible artifacts, diffable across reruns.
  *
  * Register construction (all integer-exact, both engines):
  *
  *  - `h1` = first 8 md5 hex digits of the value's canonical string,
  *    `h2` = the next 8 — two independent 32-bit halves of one hash
  *    (the [[Curation.importanceWeights]] bucket-hash recipe);
  *  - bucket `j = h1 mod m` with `m = 2^p` registers;
  *  - `rho` = leading-zero count of `h2` as a 32-bit word, plus 1:
  *    `rho = 33 − bitlength(h2)`, and 33 when `h2 = 0` — via the
  *    engines' shared `bin()` (binary string without leading zeros),
  *    never floating log2;
  *  - register `M_j = max(rho)` over the bucket's values; the sketch
  *    is the SPARSE `(group…, bucket, r)` table (absent bucket ⇒ 0).
  *
  * Estimation keeps the indicator sum exact: `Z = Σ_j 2^(−M_j)` is
  * held as the INTEGER `zsc = Z · 2^33 = Σ_sparse 2^(33−r) +
  * V · 2^33` (V = zero registers; every term a Long, total < 2^42 at
  * p ≤ 16) so the only floating step is the final
  * `alpha_m · m² · 2^33 / zsc` — one IEEE division both engines round
  * identically — plus the published small-range (linear counting when
  * `E ≤ 2.5m` and V > 0) and large-range 32-bit corrections.
  *
  * Scale shape at 100 TB: [[sketch]] is one scan + one combinable
  * groupBy((group, bucket)) whose shuffle carries at most
  * `groups × m` rows — map-side partials reduce every partition to
  * register form before the exchange, so the wire cost is independent
  * of row count. [[merge]] and [[estimate]] read only sketch tables
  * (group × m rows), never data.
  */
object Hll {

  /** Default precision: 2^9 = 512 registers, ~4.6% standard error —
    * register table of at most 512 rows per group. */
  val DefaultP = 9

  private def m(p: Int): Int = 1 << p

  /** The published bias-correction constant. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1 + 1.079 / m)
  }

  private def requireP(p: Int): Unit =
    require(p >= 4 && p <= 16, s"p=$p must be in [4, 16]")

  /** First/second 32-bit halves of md5 over the canonical string. */
  private def h32(v: Column, off: Int): Column =
    conv(substring(md5(v.cast("string").cast("binary")), off, 8), 16, 10).cast("long")

  /** Build per-group sparse register tables `(groupCols…, bucket, r)`
    * for the distinct count of `valueCol`. NULL values are skipped
    * (COUNT DISTINCT semantics). */
  def sketch(
      df: DataFrame, valueCol: Column, groupCols: Seq[Column],
      p: Int = DefaultP): DataFrame = {
    requireP(p)
    val w = h32(valueCol, 9)
    graft.core.Parallelism.ensure(df)
      .where(valueCol.isNotNull)
      .select(groupCols ++ Seq(
        (h32(valueCol, 1) % m(p)).as("bucket"),
        when(w === 0L, lit(33))
          .otherwise(lit(33) - length(bin(w))).cast("int").as("rho")): _*)
      .groupBy(groupCols :+ col("bucket"): _*)
      .agg(max("rho").as("r"))
  }

  /** Union sketches by re-aggregating to `groupCols` — per-bucket MAX
    * is exactly HLL union, so `merge(daily, coarser)` equals the
    * sketch built directly over the union'd data (the spec and the
    * q_hll_merge oracle pin the identity). Input must carry `bucket`
    * and `r`. */
  def merge(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("r").as("r"))

  /** Estimate distinct counts from a sketch table: `(groupCols…,
    * n_buckets, est_distinct)` — `n_buckets` the populated register
    * count (the small-range correction's V = m − n_buckets), the
    * estimate 6dp-rounded with the published small/large-range
    * corrections applied.
    *
    * Input is [[merge]]d internally first, so an UNMERGED register
    * dir (per-batch partitions holding duplicate `(group, bucket)`
    * rows) estimates exactly like its merged form — the counting
    * (`n_buckets = count(rows)`) and summing (`zsparse`) steps would
    * otherwise silently inflate on duplicates. On already-merged
    * input the extra per-bucket MAX is an identity over a
    * register-bounded table. */
  def estimate(
      sketches: DataFrame, groupCols: Seq[String],
      p: Int = DefaultP): DataFrame = {
    requireP(p)
    val mm = m(p)
    // alpha_m * m^2 * 2^33 with the SQL-mirrored op order (left-assoc)
    val c = alpha(mm) * mm * mm * 8589934592.0
    val grouped = merge(sketches, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 33 - r)")).as("zsparse"))
    val v = lit(mm.toLong) - col("n_buckets") // zero registers
    val zsc = (col("zsparse") + v * lit(8589934592L)).cast("double")
    val raw = lit(c) / zsc
    val est =
      when(raw <= lit(2.5 * mm) && v > 0L,
        lit(mm.toDouble) * log(lit(mm.toDouble) / v.cast("double")))
        .when(raw > lit(4294967296.0 / 30.0),
          lit(-4294967296.0) * log(lit(1.0) - raw / lit(4294967296.0)))
        .otherwise(raw)
    grouped.select(groupCols.map(col) ++ Seq(
      col("n_buckets"), round(est, 6).as("est_distinct")): _*)
  }
}
