package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Merge / upsert / change-data-capture suite — the maintenance half of a
  * warehouse engine. The reference delegates all mutation to managed
  * services (MongoDB Atlas upserts server-side; streamlit_app.py:32 only
  * reads); here the three canonical maintenance shapes are declarative
  * batch plans over the fixture tables, so the DuckDB oracle can replay
  * them:
  *
  *  - `merge_upsert` — MERGE INTO (incremental dimension load): an
  *    existing snapshot (even-keyed customers) merged with per-customer
  *    aggregates from the latest order batch (orders from 2001 on — an
  *    incremental slice, the way a real MERGE source arrives). Matched keys
  *    update the balance, source-only keys insert, target-only keys carry
  *    through unchanged — the three MERGE branches surfaced as a `status`
  *    column.
  *  - `merge_scd2` — slowly-changing-dimension type 2: collapse each
  *    user's event-type timeline to change points, then derive
  *    [valid_from, valid_to) versioned rows with an `is_current` flag.
  *  - `merge_compact` — CDC log compaction: latest record per key from an
  *    append-only changelog (`row_number() = 1` descending), the batch twin
  *    of a streaming upsert-materialize.
  *
  * Scale notes (100 TB design):
  *  - `merge_upsert` pre-aggregates the source to one row per key (partial
  *    agg map-side) BEFORE the full-outer join, so the join input is
  *    |keys|, not |orders|; the join itself is a sort-merge on the merge
  *    key — the same single-shuffle shape Delta/Iceberg MERGE compiles to
  *    when the source is too big to broadcast.
  *  - `merge_scd2` uses one window partitioning (user_id, ordered by
  *    ts, event_id) for both the change-collapse and the validity lookahead
  *    — the filter between them preserves partitioning and order, so
  *    Catalyst plans ONE exchange+sort, not two (asserted in MergeSpec).
  *  - `merge_compact` is a per-key top-1: row_number + filter pushes the
  *    rank computation into one shuffle; at cluster scale AQE handles a
  *    hot key by splitting its partition (ordering stays deterministic via
  *    the (ts, event_id) tiebreak).
  *  - Sums fold in DECIMAL(28,10) so the merge arithmetic is exact and
  *    order-independent across engines (SURVEY §7.4), rounded to 4 places
  *    before the final DOUBLE cast on both sides.
  */
object MergeOps {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // MERGE INTO: even-keyed customer snapshot <- per-custkey order totals.
    "merge_upsert" -> ((s, dir) => {
      val tgt = Tables.customer(s, dir)
        .filter(col("c_custkey") % 2 === 0)
        .select("c_custkey", "c_name", "c_acctbal")
      val src = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .groupBy(col("o_custkey"))
        .agg(
          sum(col("o_totalprice").cast("decimal(28,10)"))
            .cast("decimal(28,10)").as("delta"),
          count(lit(1)).as("n_orders"))
      tgt.join(src, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          coalesce(col("c_name"),
            concat(lit("NEW-"), col("o_custkey").cast("string"))).as("name"),
          round(
            coalesce(col("c_acctbal").cast("decimal(28,10)"),
              lit(0).cast("decimal(28,10)")) +
              coalesce(col("delta"), lit(0).cast("decimal(28,10)")), 4)
            .cast("double").as("acctbal"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          when(col("c_custkey").isNotNull && col("o_custkey").isNotNull, "updated")
            .when(col("c_custkey").isNull, "inserted")
            .otherwise("unchanged").as("status"))
        .orderBy("custkey")
    }),

    // SCD2: change-point collapse then [valid_from, valid_to) versioning.
    "merge_scd2" -> ((s, dir) =>
      scd2Versions(s, dir)
        .drop("ver_id")
        .orderBy("user_id", "valid_from", "attr")),

    // Point-in-time SCD2 lookup — the Kimball pattern's second half: for
    // every fact (purchase), the dimension version valid AT the fact's
    // timestamp. Implemented with the as-of union idiom (ONE
    // user-partitioned window sort — no row-multiplying interval join):
    // versions tile each user's timeline contiguously, so "latest
    // version at-or-before" IS interval containment, with [from, to)
    // boundary semantics pinned by sorting version starts ahead of facts
    // at equal timestamps. The oracle deliberately joins on the RAW
    // interval predicate (from ≤ ts < to, null-open end) so the two
    // formulations check each other.
    "merge_pit_lookup" -> ((s, dir) => {
      // dim rows keep their change event's id (ver_id) as the sort key:
      // two versions sharing a valid_from (a user with two change events
      // at an identical ts) would otherwise order nondeterministically —
      // last() could pick the zero-width [t, t) version the oracle's
      // from <= ts < to predicate excludes. Ascending ver_id puts the
      // non-zero-width version (the later change event) last, which is
      // exactly the version the raw interval join keeps.
      val dim = scd2Versions(s, dir)
        .select(col("user_id"), col("attr"), col("valid_from"), col("ver_id"))
      val facts = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val tagged = dim
        .select(col("user_id"), col("valid_from").as("ts"), col("attr"),
          col("ver_id").as("event_id"), lit(0).as("is_fact"))
        .unionByName(facts.select(col("user_id"), col("ts"),
          lit(null).cast("string").as("attr"), col("event_id"),
          lit(1).as("is_fact")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_fact"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("ver", last(when(col("is_fact") === 0,
          struct(col("ts").as("vfrom"), col("attr").as("vattr"))),
          ignoreNulls = true).over(w))
        .filter(col("is_fact") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("ver.vattr").as("attr_at_ts"),
          col("ver.vfrom").as("version_from"))
        .orderBy("event_id")
    }),

    // Snapshot diff: given two versions of a table, emit every changed
    // row tagged insert / delete / update — the reconciliation step that
    // turns two warehouse snapshots into a CDC feed (Delta CHANGE DATA
    // FEED computed after the fact). The "new" snapshot derives
    // deterministically from the fixture (keys %13 deleted, %7 price-
    // bumped, %17 re-keyed as inserts), so the oracle replays it exactly.
    // One full-outer sort-merge join on the key; unchanged rows (the
    // overwhelming majority at scale) are filtered before the final sort,
    // so output is |changes|, not |table|.
    "merge_diff" -> ((s, dir) => {
      val old = Tables.orders(s, dir).select("o_orderkey", "o_totalprice")
      val neu = old.filter(col("o_orderkey") % 13 =!= 0)
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10.0)
            .otherwise(col("o_totalprice")).as("o_totalprice"))
        .union(old.filter(col("o_orderkey") % 17 === 0)
          .select(col("o_orderkey") + 100000000L, col("o_totalprice")))
      old.select(col("o_orderkey").as("key"), col("o_totalprice").as("old_price"))
        .join(neu.select(col("o_orderkey").as("key"), col("o_totalprice").as("new_price")),
          Seq("key"), "full_outer")
        .withColumn("change_type",
          when(col("old_price").isNull, "insert")
            .when(col("new_price").isNull, "delete")
            .when(col("old_price") =!= col("new_price"), "update")
            .otherwise("unchanged"))
        .filter(col("change_type") =!= "unchanged")
        .select("key", "change_type", "old_price", "new_price")
        .orderBy("key")
    }),

    // CDC compaction: latest event per user_id (deterministic tiebreak).
    "merge_compact" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(
          col("user_id"),
          col("event_type").as("last_event_type"),
          col("ts").as("last_ts"),
          col("value").as("last_value"))
        .orderBy("user_id")
    }))

  /** SCD2 change-point collapse with the change event's id carried as
    * `ver_id` — the deterministic version tiebreaker `merge_pit_lookup`
    * sorts on (merge_scd2 itself projects it away). One window
    * partitioning serves both the collapse and the validity lookahead. */
  private def scd2Versions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .withColumn("prev", lag("event_type", 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(
        col("user_id"),
        col("event_id").as("ver_id"),
        col("event_type").as("attr"),
        col("ts").as("valid_from"),
        lead("ts", 1).over(w).as("valid_to"),
        lead("ts", 1).over(w).isNull.as("is_current"))
  }

  /** merge_scd2's oracle, shared verbatim as `merge_pit_lookup`'s dim
    * CTE so both keys pin ONE versioning definition. */
  private val Scd2Sql: String =
    """WITH ordered AS (
           SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events
         ), changes AS (
           SELECT user_id, event_type, ts, event_id FROM ordered
           WHERE prev IS NULL OR prev <> event_type
         )
         SELECT user_id, event_type AS attr, ts AS valid_from,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
                lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
         FROM changes
         ORDER BY user_id, valid_from, attr"""

  def oracles: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH tgt AS (
           SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 0
         ), src AS (
           SELECT o_custkey,
                  CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS DECIMAL(28,10)) AS delta,
                  count(*) AS n_orders
           FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01' GROUP BY o_custkey
         )
         SELECT coalesce(t.c_custkey, s.o_custkey) AS custkey,
                coalesce(t.c_name, 'NEW-' || CAST(s.o_custkey AS VARCHAR)) AS name,
                CAST(round(coalesce(CAST(t.c_acctbal AS DECIMAL(28,10)), 0)
                           + coalesce(s.delta, 0), 4) AS DOUBLE) AS acctbal,
                coalesce(s.n_orders, 0) AS n_orders,
                CASE WHEN t.c_custkey IS NOT NULL AND s.o_custkey IS NOT NULL THEN 'updated'
                     WHEN t.c_custkey IS NULL THEN 'inserted'
                     ELSE 'unchanged' END AS status
         FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.o_custkey
         ORDER BY custkey""",
    "merge_scd2" -> Scd2Sql,
    // the dim CTE is merge_scd2's oracle; the fact join uses the RAW
    // [from, to) interval predicate — a deliberately different
    // formulation from the Spark side's as-of merge, so each checks the
    // other (contiguous tiling makes them provably equivalent)
    "merge_pit_lookup" ->
      s"""WITH dim AS (
           $Scd2Sql
         ), f AS (
           SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'
         )
         SELECT f.event_id, f.user_id, f.ts, d.attr AS attr_at_ts,
                d.valid_from AS version_from
         FROM f JOIN dim d
           ON d.user_id = f.user_id AND d.valid_from <= f.ts
          AND (d.valid_to IS NULL OR f.ts < d.valid_to)
         ORDER BY event_id""",
    "merge_diff" ->
      """WITH old AS (
           SELECT o_orderkey, o_totalprice FROM orders
         ), neu AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0
                       ELSE o_totalprice END AS o_totalprice
           FROM old WHERE o_orderkey % 13 <> 0
           UNION ALL
           SELECT o_orderkey + 100000000, o_totalprice
           FROM old WHERE o_orderkey % 17 = 0
         )
         SELECT * FROM (
           SELECT coalesce(o.o_orderkey, n.o_orderkey) AS key,
                  CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                       WHEN n.o_orderkey IS NULL THEN 'delete'
                       WHEN o.o_totalprice <> n.o_totalprice THEN 'update'
                       ELSE 'unchanged' END AS change_type,
                  o.o_totalprice AS old_price,
                  n.o_totalprice AS new_price
           FROM old o FULL OUTER JOIN neu n ON o.o_orderkey = n.o_orderkey
         ) WHERE change_type <> 'unchanged'
         ORDER BY key""",
    "merge_compact" ->
      """SELECT user_id, event_type AS last_event_type,
                CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value
         FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC) AS rn
           FROM events
         ) WHERE rn = 1
         ORDER BY user_id""")
}
