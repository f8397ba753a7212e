package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value).
  *
  * The reference has no event-time notion at all — its "stream" is one
  * indexing batch per uploaded file (SURVEY §2 #3, #29). These
  * operators are the standard event-time suite a training-data /
  * analytics pipeline needs, expressed with Structured Streaming
  * primitives so the SAME code runs in batch mode (unit tests, and the
  * correctness gate, run them over the batch events table).
  *
  * Scale notes: the windowed count is a streaming state-store hash
  * aggregation keyed by (window, event_type) — state size is bounded
  * by the watermark horizon. Sessionization keys state by user_id;
  * `GroupStateTimeout.EventTimeTimeout` evicts sessions once the
  * watermark passes their gap deadline, so state is bounded by the
  * active-user set.
  */
object EventStreams {

  /** Tumbling-window event counts with a watermark: late rows beyond
    * `lateness` are dropped (streaming) / included (batch — batch has
    * no late data). Works unchanged on batch or streaming input. */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      // DECIMAL accumulation: the sum is exact and independent of
      // partition/arrival order (same treatment as Relational.moneySum)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream inner join with a time bound: each purchase joins
    * the same user's clicks from the preceding `within` interval. Both
    * sides carry watermarks, so the join's state store retains only
    * `within + lateness` of history per side — bounded state, the
    * requirement for an unbounded run. (The batch as-of variant lives
    * in Relational.asofPurchaseToClick; this is the streaming shape:
    * all qualifying clicks, not just the latest.)
    */
  def clickPurchaseJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      within: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", within).alias("c")
    val p = purchases.withWatermark("ts", within).alias("p")
    p.join(c, expr(
      s"""c.user_id = p.user_id AND
         |c.ts BETWEEN p.ts - INTERVAL $within AND p.ts""".stripMargin))
      .select(
        col("p.user_id").as("user_id"),
        col("p.event_id").as("purchase_id"),
        col("c.event_id").as("click_id"))
  }

  final case class Ev(user_id: Long, ts_ms: Long, event_type: String)
  final case class SessionState(start: Long, end: Long, n: Int)
  final case class UserSession(user_id: Long, session_start: Long, session_end: Long, n_events: Int)

  /** Gap-based sessionization with custom state
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): a session
    * closes when more than `gapMs` elapses between consecutive events
    * of a user.
    *
    * Complete-group semantics: each invocation sees all of a user's
    * rows (batch execution, or one watermark-complete group in
    * streaming), folds them through the GroupState machinery, emits
    * every session, and clears state. The long-running streaming
    * deployment is [[sessionizeStream]] (EventTimeTimeout): the same
    * fold, with the open session held in state between micro-batches
    * and flushed by the watermark instead of end-of-group.
    */
  def sessionize(events: Dataset[Ev], gapMs: Long): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[List[SessionState]]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts_ms, e.event_type))
          var open = state.getOption.flatMap(_.headOption)
          val out = List.newBuilder[UserSession]
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_ms - s.end <= gapMs =>
                open = Some(s.copy(end = e.ts_ms, n = s.n + 1))
              case Some(s) =>
                out += UserSession(uid, s.start, s.end, s.n)
                open = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              case None =>
                open = Some(SessionState(e.ts_ms, e.ts_ms, 1))
            }
          }
          open.foreach(s => out += UserSession(uid, s.start, s.end, s.n))
          state.remove() // complete-group flush
          out.result().iterator
      }
  }

  /** Streaming exact deduplication: drop rows whose key was already seen
    * within the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    * streaming twin of [[graft.ops.Dedup.exact]]'s hash dedup. State is
    * the seen-key set bounded by the watermark window, the requirement
    * for an unbounded ingest (plain `dropDuplicates` on a stream retains
    * every key forever). Ingest-dedup for a training-data feed: key on
    * the content hash (`md5(normalize(text))`) to suppress re-uploads.
    */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      lateness: String = "10 minutes",
      tsCol: String = "ts"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class EvT(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  /** TRUE incremental sessionization for an unbounded stream: open
    * sessions live in the state store BETWEEN micro-batches and are
    * flushed by the watermark, not by end-of-input.
    *
    * Mechanics ([[GroupStateTimeout.EventTimeTimeout]]):
    *   - each batch folds the user's new events into the open session,
    *     emitting any session closed by an in-batch gap;
    *   - the open session stays in state with a timeout at
    *     `session.end + gapMs` — once the watermark (event time minus
    *     `lateness`) passes that deadline, no on-time event can extend
    *     the session, so the timed-out invocation emits and clears it.
    *
    * State is bounded by the ACTIVE-user set (one open session each),
    * the requirement for an unbounded run; [[sessionize]] keeps the
    * complete-group batch semantics (same fold, flush at end of group).
    */
  def sessionizeStream(
      events: Dataset[EvT],
      gapMs: Long,
      lateness: String = "10 seconds"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[EvT], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // watermark passed end+gap: the open session can no longer
            // be extended by on-time data — flush it
            val out = state.getOption.flatMap(_.headOption)
              .map(s => UserSession(uid, s.start, s.end, s.n)).iterator
            state.remove()
            out
          } else {
            val sorted = rows.map(_.ts.getTime).toSeq.sorted
            var open = state.getOption.flatMap(_.headOption)
            val closed = List.newBuilder[UserSession]
            sorted.foreach { t =>
              open match {
                case Some(s) if t - s.end <= gapMs =>
                  // min/max, not assignment: a late-but-within-watermark
                  // event from a later micro-batch may PRECEDE the open
                  // session's bounds — the span must never regress
                  open = Some(SessionState(
                    math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  closed += UserSession(uid, s.start, s.end, s.n)
                  open = Some(SessionState(t, t, 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(List(s))
              // deadline must sit above the current watermark (an event
              // arriving right at the horizon could otherwise set a
              // past deadline, which Spark rejects)
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.result().iterator
          }
      }
  }

  /** Batch-mode sessionization (same semantics, pure DataFrame algebra:
    * a session boundary is a gap > gapMs between consecutive events of
    * a user). This is the oracle-checkable twin of [[sessionize]]. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_type")
    events
      .withColumn("prev_ts", lag("ts_ms", 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull || (col("ts_ms") - col("prev_ts") > gapMs)).cast("int"))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        min("ts_ms").as("session_start"),
        max("ts_ms").as("session_end"),
        count(lit(1)).cast("int").as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
  }
}
