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

  test("profile: per-column null/distinct/min-max across numeric, string, bool, timestamp") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some(2.5), Some("b"), Some(true), Some(1000000L)),
      (2L, Some(-1.0), Some("a"), Some(false), Some(2000000L)),
      (3L, None, Some("a"), None, None),
      (4L, Some(2.5), None, Some(true), Some(1500000L))
    ).toDF("id", "x", "s", "flag", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val p = Relational.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Set("id", "x", "s", "flag", "ts"))
    assert(p.values.forall(_.getLong(2) === 4L))                   // n_rows
    val id = p("id"); val x = p("x"); val s = p("s"); val fl = p("flag"); val ts = p("ts")
    assert((id.getLong(3), id.getLong(4), id.getDouble(5), id.getDouble(6)) === ((0L, 4L, 1.0, 4.0)))
    assert((x.getString(1), x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6)) ===
      (("double", 1L, 2L, -1.0, 2.5)))
    assert((s.getLong(3), s.getLong(4), s.getString(7), s.getString(8)) === ((1L, 2L, "a", "b")))
    assert(s.isNullAt(5) && s.isNullAt(6))                         // strings carry no numeric range
    assert((fl.getString(1), fl.getLong(4), fl.getDouble(5), fl.getDouble(6)) ===
      (("boolean", 2L, 0.0, 1.0)))
    assert((ts.getString(1), ts.getLong(3), ts.getDouble(5), ts.getDouble(6)) ===
      (("timestamp", 1L, 1000000.0, 2000000.0)))                   // epoch micros
  }

  test("profile: map columns (unorderable) still profile counts, not crash") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Map("a" -> 1, "b" -> 2)),
      (2L, Map("a" -> 1, "b" -> 2)),
      (3L, Map("c" -> 3)),
      (4L, Map.empty[String, Int])
    ).toDF("id", "m")
      .withColumn("m", when(col("id") === 4L, lit(null)).otherwise(col("m")))
    val p = Relational.profile(df).collect().map(r => r.getString(0) -> r).toMap
    val m = p("m")
    assert(m.getString(1) === "map")
    assert(m.getLong(3) === 1L)   // n_nulls
    assert(m.getLong(4) === 2L)   // n_distinct over serialized form
    assert(m.isNullAt(5) && m.isNullAt(6) && m.isNullAt(7) && m.isNullAt(8))
  }

  test("profile runs as ONE job over one scan of the input") {
    import SparkSpec.spark.implicits._
    val df = (1L to 100L).map(i => (i, s"v${i % 7}")).toDF("id", "v")
    val plan = Relational.profile(df).queryExecution.executedPlan.toString
    // multiple count-distincts rewrite into a single Expand pass, not
    // one scan per column: exactly one LocalTableScan/scan node
    assert("(?i)expand".r.findAllIn(plan).size >= 1, plan)
    assert("LocalTableScan".r.findAllIn(plan).size === 1, plan)
    // SQL surface parity
    graft.plans.GraftExtensions.install(SparkSpec.spark)
    df.createOrReplaceTempView("pr_t")
    assert(SparkSpec.spark.sql("SELECT * FROM graft_profile('pr_t')")
      .collect().map(_.toSeq).toSet ===
      Relational.profile(df).collect().map(_.toSeq).toSet)
  }

  test("histogram: fixed-width buckets, under/overflow edges NULL, nulls excluded") {
    import SparkSpec.spark.implicits._
    val vals: Seq[Option[Double]] = Seq(
      Some(-5.0),             // underflow → bucket -1
      Some(0.0), Some(9.99),  // bucket 0
      Some(10.0),             // bucket 1 (left-closed edges)
      Some(39.999999999),     // just under hi → top in-range bucket 3
      Some(40.0), Some(99.0), // overflow → bucket 4
      None)                   // excluded
    val got = Relational.histogram(vals.toDF("v"), "v", 0.0, 40.0, 4)
      .collect().map(r => r.getInt(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getLong(3)))).toMap
    assert(got === Map(
      -1 -> ((None, None, 1L)),
      0 -> ((Some(0.0), Some(10.0), 2L)),
      1 -> ((Some(10.0), Some(20.0), 1L)),
      3 -> ((Some(30.0), Some(40.0), 1L)),
      4 -> ((None, None, 2L))))
    // SQL surface parity
    graft.plans.GraftExtensions.install(SparkSpec.spark)
    vals.toDF("v").createOrReplaceTempView("hg_t")
    assert(SparkSpec.spark
      .sql("SELECT * FROM graft_histogram('hg_t', 'v', 0.0, 40.0, 4)")
      .collect().map(_.toSeq).toSet ===
      Relational.histogram(vals.toDF("v"), "v", 0.0, 40.0, 4)
        .collect().map(_.toSeq).toSet)
  }

  test("gapFill: complete grid per key, forward fill across holes, filled flags; observed NULL refills") {
    val obs = Seq(
      ("a", 0L, Some(1.0)), ("a", 30L, Some(3.0)),
      ("b", 100L, Some(5.0)), ("b", 110L, None), ("b", 120L, Some(7.0)),
      ("c", 40L, Some(9.0)))
      .toDF("key", "bucket", "value")
    val got = Relational.gapFill(obs, step = 10L)
      .as[(String, Long, Option[Double], Boolean)].collect().toSet
    assert(got === Set(
      ("a", 0L, Some(1.0), false), ("a", 10L, Some(1.0), true),
      ("a", 20L, Some(1.0), true), ("a", 30L, Some(3.0), false),
      // the observed NULL at b/110 counts as "no measurement": filled
      ("b", 100L, Some(5.0), false), ("b", 110L, Some(5.0), true),
      ("b", 120L, Some(7.0), false),
      // single-observation key: grid is just that bucket
      ("c", 40L, Some(9.0), false)))
  }

  test("meltMeasures: one row per (id, measure), row-local — plan has no Exchange") {
    val wide = Seq((1L, 2.0, 3.0), (2L, 4.0, 5.0)).toDF("id", "m1", "m2")
    val long = Relational.meltMeasures(wide, Seq("id"), Seq("m1", "m2"))
    assert(long.as[(Long, String, Double)].collect().toSet === Set(
      (1L, "m1", 2.0), (1L, "m2", 3.0), (2L, "m1", 4.0), (2L, "m2", 5.0)))
    assert(!long.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
