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

  test("v2: multi-column keys + timestamp time columns, brute-force checked") {
    import org.apache.spark.sql.functions.{col, timestamp_micros}
    val rnd = new scala.util.Random(31)
    // two-part key (tenant, user), timestamp-typed event times with
    // deliberate collisions so the tie-break path runs
    val lRows = (1 to 400).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 1000L, i.toLong)
    }
    val rRows = (1 to 300).map { i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(5).toLong, rnd.nextInt(50).toLong * 1000L, i.toLong)
    }
    val l = lRows.toDF("tenant", "user_id", "us", "purchase_id")
      .select(col("tenant"), col("user_id"), timestamp_micros(col("us")).as("ts"), col("purchase_id"))
    val r = rRows.toDF("c_tenant", "c_user", "us", "click_id")
      .select(col("c_tenant"), col("c_user"), timestamp_micros(col("us")).as("c_ts"), col("click_id"))
    val got = AsOfJoin.join(l, r,
      Seq("tenant", "user_id"), Seq("c_tenant", "c_user"), "ts", "c_ts", "click_id")
      .select("purchase_id", "click_id").as[(Long, Option[Long])].collect().toMap
    // brute force: last right row with same (tenant,user), time <= left
    // time, ties by highest click_id
    val expected = lRows.map { case (t, u, us, pid) =>
      val cands = rRows.filter(c => c._1 == t && c._2 == u && c._3 <= us)
      pid -> (if (cands.isEmpty) None
              else Some(cands.maxBy(c => (c._3, c._4))._4))
    }.toMap
    assert(got === expected)
  }

  test("v2 rejects non-time-typed or mismatched columns") {
    val l = Seq((1L, "x", 1L)).toDF("k", "bad", "id")
    val r = Seq((1L, "x", 1L)).toDF("k2", "bad2", "id2")
    intercept[IllegalArgumentException] {
      AsOfJoin.join(l, r, Seq("k"), Seq("k2"), "bad", "bad2", "id2")
    }
  }

  test("SQL surface: graft_asof table function plans the native operator") {
    graft.plans.GraftExtensions.install(spark)
    purchases((1L, 100L, 10L), (1L, 250L, 11L), (2L, 50L, 20L))
      .createOrReplaceTempView("asof_purchases")
    clicks((1L, 90L, 1L), (1L, 200L, 2L), (2L, 60L, 3L))
      .createOrReplaceTempView("asof_clicks")
    val df = spark.sql(
      """SELECT purchase_id, click_id FROM graft_asof(
        |  'asof_purchases', 'asof_clicks',
        |  'user_id', 'c_user', 'ts_ns', 'c_ts', 'click_id')""".stripMargin)
    // the FROM-clause call must plan our physical node, not a rewrite
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      df.queryExecution.executedPlan.toString)
    assert(df.as[(Long, Option[Long])].collect().toMap ===
      Map(10L -> Some(1L), 11L -> Some(2L), 20L -> None))
    // non-literal / wrong-arity calls fail with an actionable message
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('asof_purchases', 'asof_clicks')").collect()
    }
    assert(e.getMessage.contains("seven arguments"), e.getMessage)
  }

  test("native operator matches the window composition on the events fixture") {
    val nat = graft.ops.Relational.asofPurchaseToClickNative(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Option[Long], Option[Double])].collect().toSet
    val win = graft.ops.Relational.asofPurchaseToClick(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Double, Option[Long], Option[Double])].collect().toSet
    assert(nat === win)
  }
}
