package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Ev, UserSession}
import SparkSpec.spark.implicits._

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowedCounts over a real stream: watermark finalizes windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.windowedCounts(
      in.toDF().toDF("ts", "event_type", "value"),
      windowLen = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    // window [10:00,10:10): two clicks; then advance event time past
    // watermark horizon (10:10 + 5min lateness) to finalize it
    in.addData((ts(1), "click", 1.0), (ts(4), "click", 2.0))
    q.processAllAvailable()
    in.addData((ts(21), "view", 5.0)) // watermark -> 10:16 > 10:10
    q.processAllAvailable()

    val rows = spark.table("wc").as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows === Set((ts(0), "click", 2L, 3.0))) // only the finalized window emitted
  }

  test("late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val q = EventStreams.windowedCounts(
      in.toDF().toDF("ts", "event_type", "value"),
      windowLen = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("wc_late").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    in.addData((ts(1), "click", 1.0))
    q.processAllAvailable()
    in.addData((ts(40), "view", 1.0)) // watermark -> 10:35
    q.processAllAvailable()
    in.addData((ts(2), "click", 100.0)) // late: event time far behind watermark
    q.processAllAvailable()
    in.addData((ts(59), "view", 1.0)) // push watermark to close everything <= 10:50
    q.processAllAvailable()

    val clickWindow = spark.table("wc_late")
      .as[(Timestamp, String, Long, Double)].collect().filter(_._2 == "click")
    q.stop()
    // the late 100.0 click was dropped: count stays 1, sum stays 1.0
    assert(clickWindow.toSet === Set((ts(0), "click", 1L, 1.0)))
  }

  test("stream-stream join: purchases pick up clicks within the window, state bounded by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = graft.streaming.EventStreams.clickPurchaseJoin(
      clicks.toDF().toDF("ts", "user_id", "event_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id"),
      within = "30 minutes")
      .writeStream.format("memory").queryName("ssj").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    clicks.addData((ts(0), 1L, 100L), (ts(5), 1L, 101L), (ts(0), 2L, 200L))
    purchases.addData((ts(10), 1L, 900L)) // joins both user-1 clicks
    q.processAllAvailable()
    // a purchase >30min after any click of that user: no output row
    purchases.addData((ts(59), 2L, 901L))
    q.processAllAvailable()

    val rows = spark.table("ssj").as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(rows === Set((1L, 900L, 100L), (1L, 900L, 101L)))
  }

  test("dedupStream drops repeated keys within the watermark, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val q = EventStreams.dedupStream(
      in.toDF().toDF("ts", "content_hash", "payload"),
      keyCols = Seq("content_hash"), lateness = "30 minutes")
      .writeStream.format("memory").queryName("dedup").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    in.addData((ts(1), 100L, "first"), (ts(2), 100L, "dup-in-batch"), (ts(3), 200L, "other"))
    q.processAllAvailable()
    in.addData((ts(5), 100L, "dup-across-batches"), (ts(6), 300L, "new"))
    q.processAllAvailable()

    val rows = spark.table("dedup").as[(Timestamp, Long, String)].collect().toSet
    q.stop()
    assert(rows === Set(
      (ts(1), 100L, "first"), (ts(3), 200L, "other"), (ts(6), 300L, "new")))
  }

  test("sessionizeStream: open sessions survive micro-batches, watermark evicts them") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String): Timestamp = Timestamp.valueOf(s"2026-01-01 $s")
    val in = MemoryStream[EventStreams.EvT]
    val q = EventStreams.sessionizeStream(in.toDS(), gapMs = 30L * 60 * 1000,
        lateness = "10 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()
    def sessions(): Set[UserSession] =
      spark.table("sess").as[UserSession].collect().toSet

    // batch 1: user 1 opens a session (2 events, 5 min apart)
    in.addData(EventStreams.EvT(1L, t("10:00:00"), "a"), EventStreams.EvT(1L, t("10:05:00"), "b"))
    q.processAllAvailable()
    assert(sessions() === Set.empty) // session still open — survived the batch

    // batch 2: user 2 appears at 11:00, pushing the watermark to
    // 10:59:50 — past user 1's 10:35 deadline, so the follow-up
    // timeout batch (processAllAvailable drains it) flushes user 1's
    // session; user 2's stays open
    val u1Session = UserSession(1L, t("10:00:00").getTime, t("10:05:00").getTime, 2)
    in.addData(EventStreams.EvT(2L, t("11:00:00"), "x"))
    q.processAllAvailable()
    assert(sessions() === Set(u1Session))

    // batch 3: user 2 extends at the 30-min gap boundary — session
    // grows instead of closing, and remains open (nothing new emitted)
    in.addData(EventStreams.EvT(2L, t("11:30:00"), "y"))
    q.processAllAvailable()
    val afterB3 = sessions()
    q.stop()
    assert(afterB3 === Set(u1Session))
  }

  test("sessionizeStream: late-but-within-watermark events never regress session bounds") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String): Timestamp = Timestamp.valueOf(s"2026-01-01 $s")
    val in = MemoryStream[EventStreams.EvT]
    val q = EventStreams.sessionizeStream(in.toDS(), gapMs = 30L * 60 * 1000,
        lateness = "1 hour") // generous watermark: late arrivals stay in scope
      .writeStream.format("memory").queryName("sess_late").outputMode("append")
      .trigger(Trigger.ProcessingTime(0)).start()

    in.addData(EventStreams.EvT(1L, t("10:00:00"), "a"), EventStreams.EvT(1L, t("10:05:00"), "b"))
    q.processAllAvailable()
    // batch 2: two LATE user-1 events — one inside the open span, one
    // before its start; end must stay 10:05, start must extend to 09:58
    in.addData(EventStreams.EvT(1L, t("10:01:00"), "late"),
      EventStreams.EvT(1L, t("09:58:00"), "later"),
      EventStreams.EvT(2L, t("10:30:00"), "x"))
    q.processAllAvailable()
    // batch 3: push the watermark past user 1's end+gap deadline
    in.addData(EventStreams.EvT(2L, t("12:00:00"), "y"))
    q.processAllAvailable()
    val rows = spark.table("sess_late").as[UserSession].collect().toSet
    q.stop()
    assert(rows.contains(
      UserSession(1L, t("09:58:00").getTime, t("10:05:00").getTime, 4)))
  }

  test("sessionize (flatMapGroupsWithState) matches the batch window formulation") {
    val evs = Seq(
      Ev(1L, 1000L, "a"), Ev(1L, 2000L, "b"), Ev(1L, 90000L, "c"), // gap at 90s
      Ev(2L, 500L, "x")).toDS()
    val stateful = EventStreams.sessionize(evs, gapMs = 60000L).collect().toSet
    assert(stateful === Set(
      UserSession(1L, 1000L, 2000L, 2),
      UserSession(1L, 90000L, 90000L, 1),
      UserSession(2L, 500L, 500L, 1)))

    val batch = EventStreams.sessionizeBatch(
      evs.toDF().withColumnRenamed("ts_ms", "ts_ms"), gapMs = 60000L)
      .as[UserSession].collect().toSet
    assert(batch === stateful)
  }
}
