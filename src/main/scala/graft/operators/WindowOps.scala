package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function suite (SURVEY.md §2 B6).
  *
  * Scale notes (100 TB design):
  *  - A window shuffles once on its partition key and sorts within
  *    partitions; all four queries below partition on a natural
  *    high-cardinality key (c_custkey / user_id), so no single partition
  *    outgrows an executor. Never use an empty `partitionBy` at scale —
  *    that serializes the whole table through one task.
  *  - Every ORDER BY inside a window carries a unique tiebreak column so
  *    frame contents — and therefore running fp sums — are deterministic
  *    across engines and re-runs.
  *  - The range frame orders by integer epoch seconds (floored) on both
  *    engines, sidestepping cross-engine interval-arithmetic differences.
  */
object WindowOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-3 orders by totalprice per customer — all three ranking fns.
    "win_rank_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
        .orderBy("o_custkey", "rn")
    }),

    // Running revenue per customer in order-date order (unique tiebreak on
    // o_orderkey ⇒ the sequential fold order is identical in both engines,
    // so the running double sum is bit-identical).
    "win_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 4))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Gap in days between consecutive orders per customer (lag + lead).
    "win_lead_lag" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          datediff(col("o_orderdate"), col("prev_date")).as("days_since_prev"),
          col("next_key"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distribution ranking: quartile bucket, percent_rank, cume_dist of
    // each order's price within its customer.
    "win_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", round(percent_rank().over(w), 4))
        .withColumn("cd", round(cume_dist().over(w), 4))
        .select("o_custkey", "o_orderkey", "o_totalprice", "quartile", "pr", "cd")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Value navigation across the whole partition: first / last / nth
    // order price per customer (frame = entire partition, so last_value
    // sees the true last row, not the default running frame).
    "win_first_last" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .withColumn("last_price", last(col("o_totalprice")).over(w))
        .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(w))
        .select("o_custkey", "o_orderkey", "first_price", "last_price", "second_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Distinct count over a window — Spark (like most engines) rejects
    // COUNT(DISTINCT) OVER, so this is the standard two-window idiom:
    // dense_rank over the ordered key, then max of that rank over the
    // full partition. Same shuffle as a single window (both partition on
    // l_orderkey).
    "win_distinct_count" -> ((s, dir) => {
      val w1 = Window.partitionBy("l_orderkey").orderBy("l_suppkey")
      val w2 = Window.partitionBy("l_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.lineitem(s, dir)
        .withColumn("dr", dense_rank().over(w1))
        .withColumn("n_distinct_supp", max(col("dr")).over(w2).cast("int"))
        .select("l_orderkey", "l_linenumber", "l_suppkey", "n_distinct_supp")
        .orderBy("l_orderkey", "l_linenumber", "l_suppkey")
    }),

    // Exact median as a window aggregate (full-partition frame): each
    // order carries its customer's median price — the sort-based exact
    // percentile, not the approximate sketch, running once per partition
    // over the same single shuffle as the other windows.
    "win_median" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .withColumn("median_price", round(median(col("o_totalprice")).over(w), 4))
        .select("o_custkey", "o_orderkey", "o_totalprice", "median_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // 1-hour trailing average event value per user: range frame over
    // floored epoch seconds (inclusive [t-3600, t], peers included).
    "win_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("es"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, dir)
        .withColumn("es", col("ts").cast("long"))
        .withColumn("trailing_avg", round(avg(col("value")).over(w), 4))
        .select("event_id", "user_id", "es", "trailing_avg")
        .orderBy("event_id")
    }),

    // Relative standing within a group: percent_rank and cume_dist of each
    // customer's balance inside its market segment — the distributional
    // ranking functions that close out the B6 family (rank says "3rd";
    // percent_rank says "top 2%", which is what a percentile-based cut
    // actually filters on). Ties share a value in both functions, so the
    // window orders on the value ALONE (adding a tiebreak key would change
    // the semantics); output order still carries the unique c_custkey.
    "win_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          round(percent_rank().over(w), 4).as("pct_rank"),
          round(cume_dist().over(w), 4).as("cume"))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    }),

    // Gap-based sessionization that LABELS every event (session index +
    // position within the session) — the row-level complement of
    // `stream_session`'s per-session aggregates: clickstream feature
    // pipelines need the label on the event, not just the rollup. All
    // four derived columns (break flag, running session count, session
    // start rank, position) ride ONE window sort on (user_id; ts,
    // event_id) — the position comes from rank arithmetic against the
    // cumulative max of session-start ranks, NOT a second window keyed on
    // (user, session) which would re-shuffle the corpus. Gap compare is
    // integer epoch seconds (cross-engine-stable, no interval math).
    "win_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withSessionIds(Tables.events(s, dir))
        .withColumn("rn", row_number().over(w))
        .withColumn("pos_in_session",
          col("rn") - max(when(col("brk") === 1, col("rn"))).over(cum) + 1)
        .select(col("event_id"), col("user_id"),
          col("sid").as("session_idx"),
          col("pos_in_session").cast("int").as("pos_in_session"))
        .orderBy("event_id")
    }),

    // Gaps-and-islands: maximal runs of CONSECUTIVE active days per user
    // — the streak/churn primitive ("longest activity streak", "broke a
    // 7-day streak"). The classic rn-difference trick: within a user,
    // day − row_number(day) is constant exactly across a consecutive
    // run, so one distinct-day aggregate + one window sort + one
    // (user, anchor) groupBy does it all. The raw stream collapses to
    // DISTINCT (user, day) in the first partial-aggregated shuffle
    // (bounded by users × calendar, not event volume); everything after
    // runs on that relation.
    "win_gap_islands" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("day"))
      Tables.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(min(col("day")).as("start_day"), max(col("day")).as("end_day"),
          count(lit(1)).cast("int").as("n_days"))
        .select("user_id", "start_day", "end_day", "n_days")
        .orderBy("user_id", "start_day")
    }),

    // Rolling OLS slope: the trend of `value` over its last SlopeFrame
    // observations per user — the local-trend feature every monitoring /
    // forecasting pipeline derives (a windowed `regr_slope`, which Spark
    // has no window form of). x is the per-user row index, so the four
    // sufficient sums (Σx, Σy, Σxy, Σx²) all ride ONE window sort on
    // (user_id; ts, event_id); y folds as exact DECIMAL inside the frame
    // so the sums are bit-equal cross-engine (DuckDB evaluates sliding
    // window sums through a segment tree — a different fp summation
    // order — and double drift would flake the 6dp round). Head rows
    // with an under-filled frame emit NULL, the standard warm-up
    // contract. One corpus shuffle on user_id, nothing else. The slope
    // rounds through Num.pin, not round(): a constant-value frame gives
    // a numerator like −1e-17, which DuckDB's round() keeps as −0.0
    // while Spark emits +0.0 — an ==-equal but bit-different zero the
    // driver's hash rejects (r8 row 472).
    "win_moving_slope" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
      val f = w.rowsBetween(-(SlopeFrame - 1), Window.currentRow)
      val n = lit(SlopeFrame.toDouble)
      val ev = Tables.events(s, dir)
        .withColumn("es", unix_timestamp(col("ts")))
        .withColumn("x", row_number().over(w).cast("long"))
        .withColumn("yd", col("value").cast("decimal(28,10)"))
      val sx = sum(col("x")).over(f).cast("double")
      val sy = sum(col("yd")).over(f).cast("double")
      val sxy = sum((col("x") * col("yd")).cast("decimal(28,10)")).over(f).cast("double")
      val sxx = sum(col("x") * col("x")).over(f).cast("double")
      val cnt = count(lit(1)).over(f)
      ev.select(col("event_id"), col("user_id"),
          when(cnt === SlopeFrame,
            graft.functions.Num.pin(
              (n * sxy - sx * sy) / (n * sxx - sx * sx), 6))
            .as("slope"))
        .orderBy("event_id")
    }),

    // Rolling 24-hour Pearson correlation between the hourly click and
    // view series (r11) — the co-movement monitor behind "did these two
    // metrics decouple" alerts, where `ts_cross_corr` reports one global
    // number. The series aligns in ONE conditional-sum aggregation
    // (never a self-join); the rolling frame then runs over the
    // calendar-bounded hourly relation (the correlogram's adjudicated
    // bounded-window class — at any corpus size this relation is
    // |hours|). All six frame sums fold as exact DECIMAL, which is what
    // makes the window aggregation order-independent: Spark accumulates
    // frames by sliding while DuckDB combines segment-tree nodes, and
    // only exact arithmetic makes those two association orders agree
    // bit-for-bit. Partial (< 24 h) head windows are dropped — a 3-point
    // correlation is noise presented as signal; zero-variance windows
    // yield NULL via the guarded denominator, not a NaN that hashes
    // differently.
    "win_rolling_corr" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"))
      val w = Window.orderBy("h").rowsBetween(-23, Window.currentRow)
      def dsum(x: org.apache.spark.sql.Column) =
        sum(x.cast("decimal(28,10)")).over(w).cast("double")
      def psum(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).over(w)
          .cast("double")
      hourly
        .withColumn("n", count(lit(1)).over(w).cast("double"))
        .withColumn("sc", dsum(col("c")))
        .withColumn("sv", dsum(col("v")))
        .withColumn("scv", psum(col("c"), col("v")))
        .withColumn("scc", psum(col("c"), col("c")))
        .withColumn("svv", psum(col("v"), col("v")))
        .filter(col("n") === 24.0)
        .select(col("h"), col("c"), col("v"),
          when((col("n") * col("scc") - col("sc") * col("sc")) *
            (col("n") * col("svv") - col("sv") * col("sv")) > 0,
            graft.functions.Num.pin(
              (col("n") * col("scv") - col("sc") * col("sv")) /
                sqrt((col("n") * col("scc") - col("sc") * col("sc")) *
                  (col("n") * col("svv") - col("sv") * col("sv"))), 6))
            .as("corr24"))
        .orderBy("h")
    })
  )

  /** Trailing observations in the rolling-regression frame. */
  val SlopeFrame = 5

  /** Inactivity gap that closes a session (shared with the oracle SQL). */
  val SessionGapSec = 1800L

  /** The ONE gap-based session derivation (r15 review item): adds `es`
    * (integer epoch seconds), `brk` (1 at each gap > [[SessionGapSec]]
    * over the (es, event_id) per-user order) and `sid` (the running
    * per-user session index) in a single window sort. `win_sessionize`
    * labels events with it; `join_interval` aggregates it to session
    * intervals — one definition, two consumers, so the session contract
    * cannot silently fork between them. */
  private[operators] def withSessionIds(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("es"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("es", unix_timestamp(col("ts")))
      .withColumn("brk", when(
        col("es") - lag(col("es"), 1).over(w) <= SessionGapSec, 0L)
        .otherwise(1L))
      .withColumn("sid", sum(col("brk")).over(cum))
  }

  def oracles: Map[String, String] = Map(
    // same DECIMAL frame sums (exactness is what lets Spark's sliding
    // accumulation and DuckDB's segment-tree combine agree), same
    // full-window filter and zero-variance guard
    "win_rolling_corr" ->
      """WITH hourly AS (
           SELECT date_trunc('hour', ts) AS h,
                  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c,
                  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v
           FROM events WHERE event_type IN ('click', 'view') GROUP BY 1
         ), r AS (
           SELECT h, c, v,
                  CAST(count(*) OVER w AS DOUBLE) AS n,
                  CAST(sum(CAST(c AS DECIMAL(28,10))) OVER w AS DOUBLE) AS sc,
                  CAST(sum(CAST(v AS DECIMAL(28,10))) OVER w AS DOUBLE) AS sv,
                  CAST(sum(CAST(c AS DECIMAL(19,0))
                           * CAST(v AS DECIMAL(19,0))) OVER w AS DOUBLE) AS scv,
                  CAST(sum(CAST(c AS DECIMAL(19,0))
                           * CAST(c AS DECIMAL(19,0))) OVER w AS DOUBLE) AS scc,
                  CAST(sum(CAST(v AS DECIMAL(19,0))
                           * CAST(v AS DECIMAL(19,0))) OVER w AS DOUBLE) AS svv
           FROM hourly
           WINDOW w AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
         )
         SELECT h, CAST(c AS BIGINT) AS c, CAST(v AS BIGINT) AS v,
                CASE WHEN (n * scc - sc * sc) * (n * svv - sv * sv) > 0 THEN
                  floor((n * scv - sc * sv)
                        / sqrt((n * scc - sc * sc) * (n * svv - sv * sv))
                        * 1e6 + 0.5) / 1e6
                END AS corr24
         FROM r WHERE n = 24.0 ORDER BY h""",
    "win_gap_islands" ->
      """SELECT user_id, min(day) AS start_day, max(day) AS end_day,
                CAST(count(*) AS INT) AS n_days
         FROM (
           SELECT user_id, day,
                  day - CAST(row_number() OVER (PARTITION BY user_id
                    ORDER BY day) AS INT) AS anchor
           FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
         ) GROUP BY user_id, anchor ORDER BY user_id, start_day""",
    "win_moving_slope" ->
      """SELECT event_id, user_id,
                CASE WHEN cnt = 5 THEN
                  floor((5.0 * sxy - sx * sy) / (5.0 * sxx - sx * sx)
                        * 1e6 + 0.5) / 1e6
                END AS slope
         FROM (
           SELECT event_id, user_id,
                  CAST(sum(x) OVER f AS DOUBLE) AS sx,
                  CAST(sum(yd) OVER f AS DOUBLE) AS sy,
                  CAST(sum(CAST(x * yd AS DECIMAL(28,10))) OVER f AS DOUBLE) AS sxy,
                  CAST(sum(x * x) OVER f AS DOUBLE) AS sxx,
                  count(*) OVER f AS cnt
           FROM (
             SELECT event_id, user_id, es,
                    CAST(row_number() OVER (PARTITION BY user_id
                      ORDER BY es, event_id) AS BIGINT) AS x,
                    CAST(value AS DECIMAL(28,10)) AS yd
             FROM (SELECT event_id, user_id, value,
                          CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
           )
           WINDOW f AS (PARTITION BY user_id ORDER BY es, event_id
                        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
         ) ORDER BY event_id""",
    "win_sessionize" ->
      """SELECT event_id, user_id, CAST(session_idx AS BIGINT) AS session_idx,
                CAST(rn - sess_start + 1 AS INT) AS pos_in_session
         FROM (
           SELECT event_id, user_id, rn, brk,
                  sum(brk) OVER c AS session_idx,
                  max(CASE WHEN brk = 1 THEN rn END) OVER c AS sess_start
           FROM (
             SELECT event_id, user_id,
                    CASE WHEN es - lag(es, 1) OVER w <= 1800
                         THEN 0 ELSE 1 END AS brk,
                    row_number() OVER w AS rn
             FROM (SELECT event_id, user_id, ts,
                          CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events)
             WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)
           )
           WINDOW c AS (PARTITION BY user_id ORDER BY rn
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         ) ORDER BY event_id""",
    "win_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
                round(percent_rank() OVER w, 4) AS pct_rank,
                round(cume_dist() OVER w, 4) AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal)
         ORDER BY c_mktsegment, c_acctbal, c_custkey""",
    "win_distinct_count" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
                CAST(max(dr) OVER (PARTITION BY l_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS INT)
                  AS n_distinct_supp
         FROM (
           SELECT l_orderkey, l_linenumber, l_suppkey,
                  dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_suppkey) AS dr
           FROM lineitem
         ) ORDER BY l_orderkey, l_linenumber, l_suppkey""",
    "win_rank_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk, CAST(drnk AS INT) AS drnk
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER w AS rn,
                  rank() OVER w AS rnk,
                  dense_rank() OVER w AS drnk
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
         ) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
                round(sum(o_totalprice) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "win_lead_lag" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
                CAST(date_diff('day',
                  CAST(lag(o_orderdate, 1) OVER w AS DATE),
                  CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev,
                lead(o_orderkey, 1) OVER w AS next_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "win_ntile" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                CAST(ntile(4) OVER w AS INT) AS quartile,
                round(percent_rank() OVER w, 4) AS pr,
                round(cume_dist() OVER w, 4) AS cd
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "win_first_last" ->
      """SELECT o_custkey, o_orderkey,
                first_value(o_totalprice) OVER w AS first_price,
                last_value(o_totalprice) OVER w AS last_price,
                nth_value(o_totalprice, 2) OVER w AS second_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "win_median" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
                round(median(o_totalprice) OVER (PARTITION BY o_custkey), 4)
                  AS median_price
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "win_range_frame" ->
      """SELECT event_id, user_id, es,
                round(avg(value) OVER (
                  PARTITION BY user_id ORDER BY es
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 4) AS trailing_avg
         FROM (SELECT event_id, user_id, value,
                      CAST(floor(epoch(ts)) AS BIGINT) AS es
               FROM events)
         ORDER BY event_id"""
  )
}
