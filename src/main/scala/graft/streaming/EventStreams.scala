package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Streaming content-level dedup: the incremental twin of `dedup_exact`.
    * Each document's distinct-token set folds to a 64-bit fingerprint
    * (same collapse key the batch dedup family shuffles), and
    * `dropDuplicatesWithinWatermark` keeps one survivor per fingerprint —
    * state holds only fingerprints younger than the watermark, so a
    * perpetual ingest stream dedups against its recent past with bounded
    * state (the full-history exact pass stays a periodic batch job;
    * cf. DedupOps' collapse). Token hashing is the same codegen'd
    * xxhash64-over-sorted-set shape as the batch side, so stream and
    * batch agree on what "same content" means. NB: null and
    * empty/whitespace-only texts all fold to one shared fingerprint and
    * therefore dedup against each other (batch parity) — route no-content
    * rows to a quality gate upstream if they must pass through. */
  def dedupByContent(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", graft.operators.DedupOps.contentFingerprint(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Stream-static enrichment: join each incoming event against a static
    * dimension snapshot (user → segment). Stateless — the static side,
    * being dimension-sized, broadcasts: every micro-batch plans a
    * map-side hash join, no shuffle of the stream and NO join state to
    * evict, which is why enrichment should be expressed stream-static
    * rather than stream-stream whenever one side is bounded. The
    * snapshot is fixed at plan time for file-backed dims (the parquet
    * file listing is captured when the DataFrame is created — swapping
    * files under a running stream serves stale data or fails the scan);
    * to follow a changing dim, restart the query on a fresh DataFrame or
    * use a source that re-lists per batch. Inner by default;
    * `keepUnmatched` emits dimension-less events null-extended (left
    * join) instead of dropping them. */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      keepUnmatched: Boolean = false): DataFrame =
    events.join(broadcast(dim), Seq("user_id"),
      if (keepUnmatched) "left" else "inner")

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

  /** Incremental upsert-materialization: a CDC changelog stream
    * (`key, op ∈ {upsert, delete}, value, seq`) applied to a versioned
    * parquet target via `foreachBatch` — the streaming half of
    * [[graft.operators.MergeOps]]'s `merge_compact`/`merge_upsert`.
    *
    * Each micro-batch (1) self-compacts to the latest op per key
    * (`row_number` by seq desc — a batch may carry several ops for one
    * key), (2) reads the previous target version, (3) merges: carried-
    * through rows are the anti-join on batch keys, upserts replace or
    * insert, deletes drop, and (4) writes the result as a NEW version
    * directory `v=<batchId>` — versioned rewrite instead of in-place
    * overwrite because a parquet path cannot be read and overwritten in
    * the same job, and it is exactly the copy-on-write commit shape
    * table formats use (readers keep a consistent snapshot; the
    * micro-batch commit is atomic at the directory level).
    *
    * Scale notes: the merge joins |target-keys| against |batch-keys| —
    * the batch side is micro-batch-sized, so Catalyst broadcasts it and
    * the target streams through map-side; the rewrite cost is the
    * copy-on-write trade-off every non-indexed table format makes (at
    * 100 TB the target would be partitioned and only touched partitions
    * rewritten — dynamic partition overwrite, proven in SinkSpec). */
  def cdcApply(changes: DataFrame, targetDir: String)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream.foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // ties on seq break by (op, value) so a retried/speculated task
        // compacts to the SAME winner — row_number over a non-total order
        // is free to pick either duplicate
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("seq").desc, col("op"), col("value"))
        val compacted = batch
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        val root = new java.io.File(targetDir)
        // only versions BELOW this batch id are candidate inputs: after a
        // crash between the v=<batchId> write and the checkpoint commit,
        // foreachBatch replays the same batchId — an unbounded max would
        // select the orphaned v=<batchId> itself as input and then
        // overwrite it (Spark rejects overwriting a path being read), so
        // the stream could never recover. The < bound makes replay
        // idempotent: the rerun reads the same parent and rewrites the
        // same output.
        val prev = Option(root.listFiles).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("v="))
          .map(_.getName.stripPrefix("v=").toLong)
          .filter(_ < batchId)
          .sorted.lastOption
        val target = prev match {
          case Some(v) => spark.read.parquet(s"$targetDir/v=$v")
          case None =>
            // bootstrap an empty target with the CHANGES' (key, value)
            // schema — hardcoding types would silently widen or fail the
            // first merge for any other CDC payload type
            val shape = compacted.select("key", "value")
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              shape.schema)
        }
        val merged = target
          .join(compacted.select("key"), Seq("key"), "left_anti")
          .unionByName(compacted.filter(col("op") === "upsert")
            .select(col("key"), col("value")))
        merged.write.mode("overwrite").parquet(s"$targetDir/v=$batchId")
        ()
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
                // max/min guards: a late-but-within-watermark event from a
                // later micro-batch can arrive out of order ACROSS batches
                // (the in-batch sort can't see it) — letting it regress
                // lastTs would close the session early and pull the
                // timeout timestamp backwards
                acc = SessionAcc(math.min(acc.start, t), math.max(acc.lastTs, t),
                  acc.n + 1, acc.sum + e.value)
              }
            }
            state.update(acc)
            state.setTimeoutTimestamp(acc.lastTs + SessionGapMs)
            closed.result().iterator
          }
      }
  }

  case class UserTotal(user_id: Long, n_events: Long, sum_value: Double)

  /** Per-user lifetime totals via `transformWithState` — the Spark 4.x
    * arbitrary-state API (StatefulProcessor + typed state variables) that
    * succeeds `mapGroupsWithState`. One ValueState cell per user holds
    * (count, sum); every micro-batch emits the updated totals for the
    * users it touched (update semantics). Requires the RocksDB state
    * store provider — state lives off-heap and spills to disk, so
    * per-key state count is bounded by storage, not executor memory,
    * which is exactly the 100 TB-keyspace design point. */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, Event, UserTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[UserTotal] = {
      var (n, sum) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; sum += e.value }
      totals.update((n, sum))
      Iterator(UserTotal(key, n, sum))
    }
  }

  def runningTotals(events: Dataset[Event]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
