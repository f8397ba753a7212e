package graft

import org.apache.spark.sql.functions._

import graft.ops.Hll
import SparkSpec.spark.implicits._

/** HLL register-table sketches: register construction against a
  * plain-Scala reference, the merge-is-union identity, estimate
  * accuracy envelopes across the correction regimes, and the NULL /
  * grouping contracts. */
class HllSpec extends SparkSpec {

  // ---- plain-Scala reference registers ------------------------------------

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  private def refRegisters(values: Seq[String], m: Int): Map[Long, Int] =
    values.foldLeft(Map.empty[Long, Int]) { (acc, v) =>
      val h = md5hex(v)
      val bucket = java.lang.Long.parseLong(h.substring(0, 8), 16) % m
      val w = java.lang.Long.parseLong(h.substring(8, 16), 16)
      val rho = if (w == 0L) 33 else 33 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      acc.updated(bucket, math.max(acc.getOrElse(bucket, 0), rho))
    }

  test("sketch registers match the plain-Scala reference") {
    val ids = (1L to 400L).map(i => i * 37 % 997)
    val df = ids.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("event_id", "user_id")
    val got = Hll.sketch(df, col("user_id"), Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val exp = refRegisters(ids.map(_.toString), 512)
    assert(got == exp)
  }

  test("merge of partitioned sketches equals the sketch of the union") {
    val df = (1L to 2000L).map(u => (u % 7, u * 13 % 1499)).toDF("day", "user_id")
    val daily = Hll.sketch(df, col("user_id"), Seq(col("day")))
    val merged = Hll.merge(daily, Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val direct = Hll.sketch(df, col("user_id"), Seq.empty).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(merged == direct)
  }

  test("estimate on an UNMERGED register dir equals the merged estimate (internal merge)") {
    val df = (1L to 2000L).map(u => (u % 7, u * 13 % 1499)).toDF("day", "user_id")
    val daily = Hll.sketch(df, col("user_id"), Seq(col("day")))
    // per-day partitions with the day column dropped = the raw
    // distinctDir shape: duplicate (bucket) rows across partitions
    val unmerged = daily.drop("day")
    val viaUnmerged = Hll.estimate(unmerged, Seq.empty)
      .as[(Long, Double)].head()
    val viaMerged = Hll.estimate(Hll.merge(unmerged, Seq.empty), Seq.empty)
      .as[(Long, Double)].head()
    assert(viaUnmerged === viaMerged,
      "duplicate register rows must not inflate the estimate")
  }

  test("NULL values are skipped (COUNT DISTINCT semantics)") {
    val df = Seq(Some(1L), None, Some(2L), None).toDF("user_id")
    val withNulls = Hll.sketch(df, col("user_id"), Seq.empty).collect().length
    val without = Hll.sketch(df.where(col("user_id").isNotNull),
      col("user_id"), Seq.empty).collect().length
    assert(withNulls == without)
  }

  test("estimate is within the published error envelope in both regimes") {
    // small-range regime (linear counting): few hundred distinct
    val small = (1L to 300L).map(u => (u, u)).toDF("event_id", "user_id")
    val es = Hll.estimate(Hll.sketch(small, col("user_id"), Seq.empty), Seq.empty)
      .collect().head.getDouble(1)
    assert(math.abs(es - 300.0) / 300.0 < 0.05, s"linear-counting est $es")
    // raw regime: enough distincts that most registers populate
    val big = (1L to 30000L).map(u => (u, u)).toDF("event_id", "user_id")
    val eb = Hll.estimate(Hll.sketch(big, col("user_id"), Seq.empty), Seq.empty)
      .collect().head.getDouble(1)
    // 512 registers -> ~4.6% standard error; allow 3 sigma
    assert(math.abs(eb - 30000.0) / 30000.0 < 0.14, s"raw est $eb")
  }

  test("grouped estimates keep group sizes apart") {
    val df = ((1L to 1000L).map(u => ("a", u)) ++ (1L to 50L).map(u => ("b", u)))
      .toDF("g", "user_id")
    val est = Hll.estimate(Hll.sketch(df, col("user_id"), Seq(col("g"))), Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(est("a") - 1000.0) / 1000.0 < 0.14)
    assert(math.abs(est("b") - 50.0) / 50.0 < 0.1)
  }

  test("sketch aggregation is map-side combinable (partial agg in plan)") {
    val df = (1L to 100L).map(u => (u, u)).toDF("event_id", "user_id")
    val plan = Hll.sketch(df, col("user_id"), Seq.empty)
      .queryExecution.executedPlan.toString
    // partial + final hash aggregate around one exchange
    assert("(?s)HashAggregate.*Exchange.*HashAggregate".r
      .findFirstIn(plan).isDefined, plan)
  }
}
