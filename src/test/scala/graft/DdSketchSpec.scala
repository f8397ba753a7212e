package graft

import org.apache.spark.sql.functions._

import graft.ops.DdSketch
import SparkSpec.spark.implicits._

/** DDSketch quantile sketches: bucket construction against a
  * plain-Scala reference, the merge-is-union identity, the paper's
  * relative-VALUE-error guarantee against exact percentiles, the
  * full-real-line extension (negatives, zeros), and the combinable
  * plan shape. */
class DdSketchSpec extends SparkSpec {

  private val Alpha = 0.01
  private val Gamma = (1 + Alpha) / (1 - Alpha)

  private def refBuckets(values: Seq[Double]): Map[(Int, Long), Long] =
    values.groupBy { v =>
      val sgn = if (v > 0) 1 else if (v < 0) -1 else 0
      val idx = if (v == 0) 0L else math.ceil(math.log(math.abs(v)) / math.log(Gamma)).toLong
      (sgn, idx)
    }.map { case (k, vs) => k -> vs.length.toLong }

  test("sketch buckets match the plain-Scala reference (incl. negatives and zero)") {
    val vals = Seq(0.5, 1.0, 1.0, 37.25, 450.0, 0.0, 0.0, -0.5, -120.0)
    val got = DdSketch.sketch(vals.toDF("v"), col("v"), Seq.empty)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === refBuckets(vals))
  }

  test("merge of partitioned sketches equals the sketch of the union") {
    val df = (1 to 3000).map(i => (i % 5, i * 0.37 + (i % 7))).toDF("day", "v")
    val merged = DdSketch.merge(
      DdSketch.sketch(df, col("v"), Seq(col("day"))), Seq.empty)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val direct = DdSketch.sketch(df, col("v"), Seq.empty)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === direct)
  }

  test("quantiles on an UNMERGED bucket dir equal the merged quantiles (internal merge)") {
    val df = (1 to 3000).map(i => (i % 5, i * 0.37 + (i % 7))).toDF("day", "v")
    val unmerged = DdSketch.sketch(df, col("v"), Seq(col("day"))).drop("day")
    val qs = Seq(0.5, 0.95)
    val viaUnmerged = DdSketch.quantiles(unmerged.withColumn("g", lit(1)), Seq("g"), qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    val viaMerged = DdSketch.quantiles(
      DdSketch.merge(unmerged.withColumn("g", lit(1)), Seq("g")), Seq("g"), qs)
      .select("q", "est").as[(Double, Double)].collect().toMap
    assert(viaUnmerged === viaMerged,
      "duplicate bucket rows must not skew the cumulative walk")
  }

  test("quantile estimates honor the relative-value-error guarantee") {
    // heavy-tailed positives — the regime where rank-error sketches
    // misplace p99; DDSketch must stay within alpha of the VALUE
    val vals = (1 to 5000).map(i => math.exp(i / 700.0) * 3.0)
    val df = vals.toDF("v")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = DdSketch.quantiles(
      DdSketch.sketch(df, col("v"), Seq(lit(1).as("g"))), Seq("g"), qs)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val sorted = vals.sorted
    qs.foreach { q =>
      val exact = sorted(math.floor(q * (vals.length - 1)).toInt)
      val rel = math.abs(est(q) - exact) / exact
      assert(rel <= Alpha + 1e-9, s"q=$q est=${est(q)} exact=$exact rel=$rel")
    }
  }

  test("negative and zero values place quantiles on the full real line") {
    val vals = (-100 to 100).map(_.toDouble)
    val df = vals.toDF("v")
    val est = DdSketch.quantiles(
      DdSketch.sketch(df, col("v"), Seq(lit(1).as("g"))), Seq("g"),
      Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(math.abs(est(0.0) + 100.0) / 100.0 <= Alpha + 1e-9, s"min: ${est(0.0)}")
    assert(est(0.5) === 0.0) // the zero bucket holds the median exactly
    assert(math.abs(est(1.0) - 100.0) / 100.0 <= Alpha + 1e-9, s"max: ${est(1.0)}")
  }

  test("NULL values are skipped") {
    val df = Seq(Some(1.0), None, Some(2.0)).toDF("v")
    assert(DdSketch.sketch(df, col("v"), Seq.empty)
      .agg(sum("n")).head.getLong(0) === 2L)
  }

  test("sketch aggregation is map-side combinable (partial agg in plan)") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val plan = DdSketch.sketch(df, col("v"), Seq.empty)
      .queryExecution.executedPlan.toString
    assert("(?s)HashAggregate.*Exchange.*HashAggregate".r
      .findFirstIn(plan).isDefined, plan)
  }
}
