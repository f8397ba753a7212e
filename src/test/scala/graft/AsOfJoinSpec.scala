package graft

import graft.plans.AsOfJoin
import SparkSpec.spark.implicits._

class AsOfJoinSpec extends SparkSpec {

  private def clicks(rows: (Long, Long, Long)*) = // (user, ts, id)
    rows.toDF("c_user", "c_ts", "click_id")
  private def purchases(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "ts_ns", "purchase_id")

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsOfJoin.join(l, r, "user_id", "c_user", "ts_ns", "c_ts", "click_id")
      .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toMap

  test("attaches the latest click at-or-before each purchase; none -> null") {
    val got = run(
      purchases((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 20L)),
      clicks((1L, 90L, 1L), (1L, 200L, 2L), (2L, 60L, 3L)))
    assert(got === Map(10L -> Some(1L), 11L -> Some(2L), 20L -> None))
  }

  test("equal timestamps: click at same ts matches; max click_id wins ties") {
    val got = run(
      purchases((1L, 100L, 10L)),
      clicks((1L, 100L, 1L), (1L, 100L, 7L), (1L, 100L, 3L)))
    assert(got === Map(10L -> Some(7L)))
  }

  test("multiple purchases share the same buffered click; keys never bleed") {
    val got = run(
      purchases((1L, 100L, 10L), (1L, 101L, 11L), (2L, 100L, 20L), (3L, 100L, 30L)),
      clicks((1L, 99L, 1L), (3L, 5L, 9L)))
    assert(got === Map(10L -> Some(1L), 11L -> Some(1L), 20L -> None, 30L -> Some(9L)))
  }

  test("physical plan uses the native operator with per-side exchanges") {
    val df = AsOfJoin.join(
      purchases((1L, 100L, 10L)), clicks((1L, 90L, 1L)),
      "user_id", "c_user", "ts_ns", "c_ts", "click_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan) // node prints without the Exec suffix
    assert(plan.contains("Exchange hashpartitioning(user_id"), plan)
    assert(plan.contains("Exchange hashpartitioning(c_user"), plan)
  }

  test("native operator matches the window composition on the events fixture") {
    val nat = graft.ops.Relational.asofPurchaseToClickNative(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Option[Long], Option[Double])].collect().toSet
    val win = graft.ops.Relational.asofPurchaseToClick(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Option[Long], Option[Double])].collect().toSet
    assert(nat === win)
  }
}
