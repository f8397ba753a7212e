package graft

import graft.ops.Relational
import SparkSpec.spark.implicits._

/** Relational operators against the sf0.001 fixtures — cross-checked
  * with independently computed expectations, plus the asof tie rule. */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("funnel: ordered recurrence — early out-of-order events don't count") {
    // u1 completes the funnel; u2's click at t=5 precedes their first
    // view (t=10) so only the t=20 click counts, no purchase; u3 only
    // purchases (never enters the funnel)
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "purchase"),
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 20L, "click"),
      (3L, 1L, "purchase")
    ).toDF("user_id", "ts_ns", "event_type")
    val got = Relational.funnel(ev, Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq((1, "view", 2L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("pricingSummary groups are complete and averages are in range") {
    val rows = Relational.pricingSummary(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avgQty = r.getAs[Double]("avg_qty")
      assert(avgQty > 0 && avgQty < 100)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("approx percentiles: sketch stays within tolerance of exact (all groups)") {
    val rows = Relational.quantityPercentilesApprox(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("median_qty_within_tol"), r.toString)
      assert(r.getAs[Boolean]("p90_qty_within_tol"), r.toString)
      assert(r.getAs[Boolean]("median_price_within_tol"), r.toString)
    }
    // a sketch that drifted to garbage would also fail a loose 20% gate
    // on a DIFFERENT accuracy knob — pins that accuracy is plumbed through
    val loose = Relational.quantityPercentilesApprox(spark, dir,
      accuracy = 100, relTol = 0.2).collect()
    loose.foreach(r => assert(r.getAs[Boolean]("p90_qty_within_tol"), r.toString))
  }

  test("asof join: every purchase pairs with the latest click at-or-before it") {
    val got = Relational.asofPurchaseToClick(spark, dir)
    // recompute naively: for each purchase row, scan all clicks.
    // NOTE `cast(ts as long)` on a timestamp is SECONDS — it collapses
    // distinct micro timestamps; derive nanos the same way the adapter does
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsExpr = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "ts"
      case _ => "unix_micros(cast(ts as timestamp)) * 1000"
    }
    val ev = raw
      .selectExpr("event_id", s"$tsExpr as ts", "user_id", "event_type")
      .as[(Long, Long, Long, String)].collect()
    val clicks = ev.filter(_._4 == "click").groupBy(_._3)
    val expected = ev.filter(_._4 == "purchase").map { case (pid, ts, uid, _) =>
      val best = clicks.getOrElse(uid, Array.empty)
        .filter(_._2 <= ts)
        .sortBy(c => (c._2, c._1)) // ts asc, click_id asc -> last = max
        .lastOption.map(_._1)
      pid -> best
    }.toMap
    val gotMap = got.select("purchase_id", "asof_click_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(gotMap === expected)
  }

  test("running spend is cumulative and order_seq is dense per customer") {
    val rows = Relational.customerRunningSpend(spark, dir)
      .select("o_custkey", "order_seq", "running_spend", "o_totalprice")
      .as[(Long, Int, Double, Double)].collect()
      .groupBy(_._1)
    rows.values.foreach { orders =>
      val sorted = orders.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 >= a._3 - 0.01) // non-decreasing (prices > 0)
        case _ =>
      }
    }
  }

  test("cube emits all four grouping sets") {
    val rows = Relational.returnsCube(spark, dir)
      .select("l_returnflag", "l_linestatus").collect()
    val patterns = rows.map(r => (r.isNullAt(0), r.isNullAt(1))).toSet
    assert(patterns === Set((false, false), (false, true), (true, false), (true, true)))
  }

  test("distinct aggregates are bounded by plain counts") {
    Relational.orderPriorityDistincts(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("n_custs") <= r.getAs[Long]("n_orders"))
      assert(r.getAs[Long]("n_status") <= 3)
    }
  }

  test("events() adapts to the timestamp-micros fixture without the nanos conf") {
    // the regenerated fixture stores TIMESTAMP(MICROS); the adapter must
    // produce epoch-nanos BIGINT with no legacy conf involved at all
    val bare = spark.newSession()
    bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    bare.conf.set("spark.sql.session.timeZone", "UTC")
    val ev = Relational.events(bare, dir)
    assert(ev.schema("ts_ns").dataType === org.apache.spark.sql.types.LongType)
    // spot-check the instant: ts_ns agrees with an independent epoch read
    val viaAdapter = ev.selectExpr("event_id", "ts_ns").as[(Long, Long)].collect().toMap
    val raw = bare.read.parquet(s"$dir/events.parquet")
    val independent = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.selectExpr("event_id", "ts").as[(Long, Long)].collect().toMap
      case _ =>
        raw.selectExpr("event_id", "unix_micros(cast(ts as timestamp)) * 1000")
          .as[(Long, Long)].collect().toMap
    }
    assert(viaAdapter === independent)
    // and distinct micro-instants stay distinct (a seconds-granularity
    // cast would collapse them)
    assert(viaAdapter.values.toSet.size === independent.values.toSet.size)
  }
}
