package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming surface (SURVEY.md §2 B10, design §7.3).
  *
  * The reference has no streams; these are the north-star incremental
  * capabilities. Each transform below is expressed over an unbounded
  * `DataFrame` (works identically on `readStream` sources and
  * `MemoryStream` test inputs) and is exercised end-to-end by
  * StreamingSpec. The batch-mode twins of the window aggregations are the
  * declared queries in [[graft.operators.StreamingOps]].
  *
  * Scale notes:
  *  - State size is bounded: windowed aggregates keep one row per
  *    (window, group) and the watermark evicts windows older than the
  *    allowed lateness; `dropDuplicatesWithinWatermark` keeps only ids
  *    younger than the watermark; the session state in
  *    [[sessionizeWithState]] is one small struct per active user.
  *  - All transforms shuffle once on their group key per micro-batch —
  *    the same plan shape at any input rate.
  */
object EventStreams {

  /** 5-minute tumbling count+sum per event_type with a 10-minute watermark.
    * Late events (older than max(ts) - 10 min) are dropped in append mode.
    * Identical expression to StreamingOps "stream_tumbling". */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stateful stream dedup on event_id; state for an id is dropped once the
    * watermark passes its event time. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: attribute each click to the view by the
    * same user within the preceding 10 minutes. Both sides carry
    * watermarks, and the join condition bounds event-time distance, so
    * Spark can size the join state exactly: a buffered view is dropped as
    * soon as the click-side watermark passes `view_ts + 10 min` — state
    * stays O(rate × window) at any input volume, never O(stream).
    * Column names are prefixed per side because stream-stream joins
    * cannot reference ambiguous names across sides. */
  def clickAttribution(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    v.join(c, expr(
      """v_user = c_user AND
         c_ts >= v_ts AND
         c_ts <= v_ts + interval 10 minutes"""))
      .select(col("v_user").as("user_id"), col("v_ts"), col("c_ts"), col("c_value"))
  }

  /** Left-outer variant of [[clickAttribution]]: views with no click
    * inside the window are emitted null-extended once the watermark
    * passes their join horizon (v_ts + 10 min + watermark delay) — the
    * state-eviction semantics that make outer stream-stream joins safe:
    * the unmatched row can only be emitted when no future click could
    * still match it, and the same watermark bounds the buffered state. */
  def clickAttributionOuter(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
      .withWatermark("c_ts", "10 minutes")
    v.join(c, expr(
      """v_user = c_user AND
         c_ts >= v_ts AND
         c_ts <= v_ts + interval 10 minutes"""), "leftOuter")
      .select(col("v_user").as("user_id"), col("v_ts"), col("c_ts"), col("c_value"))
  }

  // ---- custom state: session assembly via flatMapGroupsWithState ----

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionAcc(start: Long, lastTs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  val SessionGapMs: Long = 30L * 60 * 1000

  /** Emit a closed session whenever a user's inter-event gap reaches 30
    * minutes (or their state times out past the watermark). Demonstrates
    * the arbitrary-state API; the declarative twin is `session_window` in
    * StreamingOps "stream_session". */
  def sessionizeWithState(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionAcc]) =>
          if (state.hasTimedOut) {
            val acc = state.get
            state.remove()
            Iterator(Session(userId, new Timestamp(acc.start),
              new Timestamp(acc.lastTs + SessionGapMs), acc.n, acc.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var acc = state.getOption.orNull
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (acc == null) {
                acc = SessionAcc(t, t, 1, e.value)
              } else if (t - acc.lastTs >= SessionGapMs) {
                closed += Session(userId, new Timestamp(acc.start),
                  new Timestamp(acc.lastTs + SessionGapMs), acc.n, acc.sum)
                acc = SessionAcc(t, t, 1, e.value)
              } else {
                acc = SessionAcc(acc.start, t, acc.n + 1, acc.sum + e.value)
              }
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.lastTs + SessionGapMs)
            closed.result().iterator
          }
      }
  }
}
