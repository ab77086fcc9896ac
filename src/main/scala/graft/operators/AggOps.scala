package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Num

/** Aggregation suite (SURVEY.md §2 B5).
  *
  * Scale notes (100 TB design):
  *  - Every `groupBy.agg` here gets automatic partial (map-side) + final
  *    aggregation from Catalyst — the shuffle carries one row per
  *    (partition, group), not per input row.
  *  - Large double sums are folded as DECIMAL (exact, order-independent)
  *    and cast back to DOUBLE, so results are bit-identical regardless of
  *    partition count or reduce order — at 1000 executors the fp summation
  *    order is nondeterministic, and a correctness gate that depends on it
  *    would flake (SURVEY §7.4). Ratios (averages) are safe as plain
  *    doubles and are rounded to 4dp.
  *  - `agg_approx_distinct` is the sketch path: HyperLogLog++ partial
  *    states merge associatively, so a 100 TB distinct-count never shuffles
  *    raw values. Sketch output is impl-specific → no DuckDB oracle;
  *    bounded-error property lives in the ScalaTest suite.
  *  - Rollup/cube/grouping-sets expand in the map phase; group columns are
  *    coalesced to a sentinel so the oracle compare never depends on
  *    cross-engine NULL ordering.
  */
object AggOps {

  /** Discount-weighted average extended price: sum(p*d)/sum(d).
    * The typed-`Aggregator` UDAF surface (B11) — partial `reduce` on
    * executors, associative `merge` across partitions, `finish` on the
    * final state only. */
  object WeightedAvg extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Exact decimal fold of a double column, returned as DOUBLE. */
  private def dsum(c: String): org.apache.spark.sql.Column =
    sum(col(c).cast("decimal(28,10)")).cast("double")

  /** `agg_kendall_tau`'s (quantity, discount) cell count per (session,
    * dir) — the ProvidenciasOps.nodeCountMemo class; see the usage
    * comment at the key. */
  private val kendallCellCountMemo = new SessionMemo[String, java.lang.Long]

  /** `agg_weighted_median`'s value-range bucket count: bounds the cell
    * relation at |groups|×WmBuckets and the exact second pass at ~1/B of
    * the value domain. 4,096 is comfortably past the point where the
    * cell windows are trivial yet keeps the per-group cell table under
    * a broadcast page; the choice only moves WORK between the two
    * passes, never output (any monotonic bucketing is correct). */
  val WmBuckets = 4096

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: per-(returnflag, linestatus) sums/avgs/count with
    // derived expressions — the canonical partial-aggregation benchmark.
    "agg_group_q1" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum("l_quantity").as("sum_qty"),
          dsum("l_extendedprice").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,10)")).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
            .cast("decimal(28,10)")).cast("double").as("sum_charge"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_extendedprice"), 4).as("avg_price"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Exact distinct customers per market segment.
    "agg_count_distinct" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(countDistinct(col("c_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"))
        .orderBy("c_mktsegment")),

    // HLL++ approximate distinct users per event_type — sketch-specific,
    // no oracle; ±5% property vs exact in AggSpec.
    "agg_approx_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id")).as("approx_users"))
        .orderBy("event_type")),

    // Rollup nation→region order counts (group cols coalesced to '(all)'
    // so the compare is NULL-ordering-independent).
    // Expressed in SQL: DataFrame `rollup` over a join trips Spark's
    // ambiguous-self-join lineage detector (misfire — no self-join here);
    // the SQL path resolves by name and plans the identical Expand+Agg.
    "agg_rollup" -> ((s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("graft_customer")
      Tables.nation(s, dir).createOrReplaceTempView("graft_nation")
      Tables.region(s, dir).createOrReplaceTempView("graft_region")
      s.sql("""
        SELECT coalesce(r_name, '(all)') AS r_name,
               coalesce(n_name, '(all)') AS n_name,
               count(1) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS DOUBLE) AS sum_acctbal
        FROM graft_customer
        JOIN graft_nation ON c_nationkey = n_nationkey
        JOIN graft_region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name, n_name
      """)
    }),

    // Cube over (o_orderstatus, o_orderpriority).
    "agg_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          dsum("o_totalprice").as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("(all)")).as("o_orderpriority"),
          col("n_orders"), col("sum_price"))
        .orderBy("o_orderstatus", "o_orderpriority")),

    // Explicit grouping sets via SQL (the spark.sql surface).
    "agg_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
      s.sql("""
        SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
               coalesce(o_orderpriority, '(all)') AS o_orderpriority,
               count(1) AS n_orders
        FROM graft_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus, o_orderpriority
      """)
    }),

    // Statistical aggregates: correlation, covariance, stddev of quantity
    // vs extended price per return flag.
    "agg_stats" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qp_corr"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("qp_covar"),
          round(stddev(col("l_quantity")), 4).as("qty_stddev"),
          round(variance(col("l_discount")), 6).as("disc_var"))
        .orderBy("l_returnflag")),

    // Closed-form OLS (price ~ quantity per returnflag) from exact
    // DECIMAL sufficient statistics — the scale-correct shape for
    // regression on 100 TB: one partial+final aggregation computes
    // (n, Σx, Σy, Σxy, Σx²), the model solves driver-free in the same
    // plan, and the decimal folds make slope/intercept bit-identical
    // regardless of partition count or reduce order (the engine-native
    // regr_slope/REGR_SLOPE aggregates fold doubles in engine-specific
    // order and cannot be oracle-compared exactly).
    "agg_regression" -> ((s, dir) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(x.cast("decimal(28,10)")).cast("double").as("sx"),
          sum(y.cast("decimal(28,10)")).cast("double").as("sy"),
          sum((x * y).cast("decimal(28,10)")).cast("double").as("sxy"),
          sum((x * x).cast("decimal(28,10)")).cast("double").as("sxx"))
        .withColumn("slope", Num.pin(
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 6))
        .withColumn("intercept",
          Num.pin((col("sy") - col("slope") * col("sx")) / col("n"), 6))
        .select(col("l_returnflag"), col("slope"), col("intercept"),
          col("n").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),

    // Pearson correlation matrix per return flag — quantity↔price and
    // discount↔price — from the SAME exact-DECIMAL sufficient-statistics
    // discipline as `agg_regression`: every sum is order-independent
    // DECIMAL, so the closed-form corr is bit-identical across engines
    // where native corr()'s double-summation folds are not. One partial+
    // final aggregation; the eight sums ride a single shuffle row per
    // (partition, flag) regardless of table size.
    "agg_corr" -> ((s, dir) => {
      val x = col("l_quantity"); val y = col("l_extendedprice")
      val d = col("l_discount")
      def dsum(c: Column) = sum(c.cast("decimal(28,10)")).cast("double")
      def corr2(sxy: Column, sx: Column, sy: Column,
                sxx: Column, syy: Column): Column = Num.pin(
        (col("n") * sxy - sx * sy) /
          sqrt((col("n") * sxx - sx * sx) * (col("n") * syy - sy * sy)), 6)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(x).as("sx"), dsum(y).as("sy"), dsum(d).as("sd"),
          dsum(x * y).as("sxy"), dsum(d * y).as("sdy"),
          dsum(x * x).as("sxx"), dsum(y * y).as("syy"), dsum(d * d).as("sdd"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          corr2(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
            .as("corr_qty_price"),
          corr2(col("sdy"), col("sd"), col("sy"), col("sdd"), col("syy"))
            .as("corr_disc_price"))
        .orderBy("l_returnflag")
    }),

    // Higher-moment shape statistics — population skewness and excess
    // kurtosis of quantity per return flag — closing out the
    // regression/corr family: raw power sums Σx..Σx⁴ accumulate as exact
    // DECIMAL (x ≤ 50 so x⁴ ≤ 6.25e6 is integer-exact and the 18 integer
    // digits of DECIMAL(28,10) hold any count up to 10¹¹ rows per flag),
    // central moments solve in closed form afterwards. Engine-native
    // skewness()/kurtosis() fold doubles in engine order AND disagree on
    // the bias correction across engines; the raw-sum form is both
    // order-independent and definition-pinned. Same single partial+final
    // aggregation shape as `agg_corr`.
    "agg_skew_kurt" -> ((s, dir) => {
      val x = col("l_quantity")
      def dsum(c: Column) = sum(c.cast("decimal(28,10)")).cast("double")
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(x).as("s1"), dsum(x * x).as("s2"),
          dsum(x * x * x).as("s3"), dsum(x * x * x * x).as("s4"))
        .withColumn("mu", col("s1") / col("n"))
        .withColumn("m2", col("s2") / col("n") - col("mu") * col("mu"))
        .withColumn("m3", col("s3") / col("n")
          - lit(3) * col("mu") * col("s2") / col("n")
          + lit(2) * col("mu") * col("mu") * col("mu"))
        .withColumn("m4", col("s4") / col("n")
          - lit(4) * col("mu") * col("s3") / col("n")
          + lit(6) * col("mu") * col("mu") * col("s2") / col("n")
          - lit(3) * col("mu") * col("mu") * col("mu") * col("mu"))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          Num.pin(col("m3") / (col("m2") * sqrt(col("m2"))), 6).as("skewness"),
          Num.pin(col("m4") / (col("m2") * col("m2")) - 3, 6).as("kurtosis"))
        .orderBy("l_returnflag")
    }),

    // Exact COUNT(DISTINCT) via bitmap OR — the bitmap-index technique
    // (Roaring/ClickHouse groupBitmap) expressed relationally: bucket the
    // id space into 32-bit words, OR the membership bits per
    // (group, bucket) in ONE partial+final aggregation, then popcount.
    // Versus `agg_count_distinct`'s expand/two-shuffle plan, the first
    // shuffle here carries at most |groups|·|id-space|/32 8-byte words
    // REGARDLESS of row count — the right distinct plan when ids are
    // dense integers (user ids, doc ids). 32-bit words because a 1<<63
    // sign-bit shift is UB-adjacent on other engines (DuckDB range-checks
    // it); the second aggregation is |groups|·|buckets|-bounded.
    "agg_bitmap_distinct" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), expr("user_id div 32").as("bucket"))
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"))
          .as("bits"))
        .groupBy("event_type")
        .agg(sum(bit_count(col("bits")).cast("long")).as("n_distinct"))
        .orderBy("event_type")),

    // Two-feature OLS (price ~ quantity + discount per return flag) by
    // the closed-form normal equations — Cramer's rule over the 3×3
    // moment matrix built from the same exact-DECIMAL sums as
    // `agg_regression`. One partial+final aggregation computes the eight
    // sums; the determinant arithmetic is a per-group scalar epilogue, so
    // multi-feature regression costs exactly one shuffle at any scale.
    // (The pseudo-inverse/QR route needs an iterative or driver-side
    // solve; for the handful of features analytic pipelines regress on,
    // the normal equations ARE the distributed answer.)
    "agg_regression_multi" -> ((s, dir) => {
      val x = col("l_quantity"); val d = col("l_discount")
      val y = col("l_extendedprice")
      def dsum(c: Column) = sum(c.cast("decimal(28,10)")).cast("double")
      def det3(a: Column, b: Column, c: Column,
               p: Column, q: Column, r: Column,
               u: Column, v: Column, w: Column): Column =
        a * (q * w - r * v) - b * (p * w - r * u) + c * (p * v - q * u)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(x).as("sx"), dsum(d).as("sd"), dsum(y).as("sy"),
          dsum(x * x).as("sxx"), dsum(x * d).as("sxd"),
          dsum(d * d).as("sdd"), dsum(x * y).as("sxy"), dsum(d * y).as("sdy"))
        .withColumn("det", det3(
          col("n"), col("sx"), col("sd"),
          col("sx"), col("sxx"), col("sxd"),
          col("sd"), col("sxd"), col("sdd")))
        .select(col("l_returnflag"), col("n").cast("long").as("n"),
          Num.pin(det3(col("sy"), col("sx"), col("sd"),
            col("sxy"), col("sxx"), col("sxd"),
            col("sdy"), col("sxd"), col("sdd")) / col("det"), 6).as("b0"),
          Num.pin(det3(col("n"), col("sy"), col("sd"),
            col("sx"), col("sxy"), col("sxd"),
            col("sd"), col("sdy"), col("sdd")) / col("det"), 6).as("b1"),
          Num.pin(det3(col("n"), col("sx"), col("sy"),
            col("sx"), col("sxx"), col("sxy"),
            col("sd"), col("sxd"), col("sdy")) / col("det"), 6).as("b2"))
        .orderBy("l_returnflag")
    }),

    // Exact percentiles (sort-based, linear interpolation) per status.
    "agg_percentiles" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Equi-DEPTH histogram (each bucket holds ~the same row count —
    // the quantile-binning step behind learned optimizers and balanced
    // range partitioning), as two linear passes: exact decile cutpoints
    // from one percentile aggregation (a tiny 1-row broadcast), then a
    // codegen'd bin assignment + per-bin rollup. Never a global
    // ntile-style sort: the window form serializes the table through one
    // partition, this form is partial+final aggregation twice. Cutpoints
    // are rounded to 4dp on BOTH engines before binning so the strict->
    // comparison is bit-identical.
    "agg_equidepth" -> ((s, dir) => {
      val cuts = Tables.orders(s, dir)
        .agg(expr("percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
          .as("cuts"))
        .select(transform(col("cuts"), c => round(c, 4)).as("cuts"))
      Tables.orders(s, dir)
        .crossJoin(broadcast(cuts))
        .select(col("o_totalprice"),
          size(filter(col("cuts"), c => col("o_totalprice") > c)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(min("o_totalprice"), 4).as("lo"),
          round(max("o_totalprice"), 4).as("hi"))
        .orderBy("bucket")
    }),

    // Pivot (conditional aggregation over a pinned value list, so the
    // output schema is static regardless of data).
    "agg_pivot" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")),

    // Mergeable DataSketches HLL: sketch per (event_type, day) partial,
    // then union-merge per event_type. This is THE re-aggregation pattern
    // at 100 TB — daily sketches are tiny, persistable, and merge
    // associatively, so a backfill or a coarser rollup never rescans raw
    // events. Sketch bytes are impl-specific → no DuckDB oracle; the ±5%
    // bound vs exact distinct is pinned in AggSpec.
    "agg_hll_mergeable" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        .orderBy("event_type")),

    // Mergeable KMV (k-minimum-values) set-overlap sketch (r15): the
    // INTERSECTION contract the mergeable family lacked — HLL unions but
    // cannot intersect, so "how much do the click and purchase audiences
    // overlap?" at 100 TB needs a sketch whose union AND intersection
    // both derive from the same bounded state (Beyer et al., SIGMOD'07;
    // the Theta-sketch idea). State per (event_type, day) partial is the
    // K smallest md5 hashes of the (user, day) activity cells; partials
    // union-merge by re-ranking (min-K of min-Ks IS the min-K of the
    // union — the re-aggregation demo agg_hll_mergeable/agg_tdigest run,
    // replayed here structurally as daily sketch -> global merge). For a
    // type pair, the K smallest of the two sketches' union is a KMV of
    // A∪B, and Jaccard ≈ |{those present in BOTH sketches}| / K — EXACT
    // whenever |A∪B| <= K (AggSpec pins the estimate against the exact
    // cell Jaccard at K=32 and the exactness property past the universe;
    // the declared K=256 genuinely estimates on the fixture, whose
    // ~1,600 cells per type exceed it). Unlike the HLL/t-digest
    // keys this sketch is fully ORACLE-CHECKABLE: the hash is md5 (both
    // engines, identical lowercase hex, lexicographic = 128-bit order),
    // ranking/marking/counting are integer window/agg logic, and the one
    // division pins at 6dp. Shapes (r16, r15 verdict item 1): the corpus
    // collapses through a map-side MinK Aggregator fold (ObjectHashAgg
    // partial mode — <= K entries per (partition, type, day) cross the
    // exchange, and the distinct pass is subsumed by the bounded buffer);
    // the only windows left run on the K×pairs-bounded union relation.
    "agg_kmv_jaccard" -> ((s, dir) => kmvJaccard(s, dir, KmvK)),

    // Mergeable Bloom MEMBERSHIP sketch (r16, r15 verdict item 2) — the
    // contract completing the sketch family: HLL counts, KMV
    // intersects, t-digest quantiles, CountMin frequencies, SpaceSaving
    // top-k — and nothing before this answered "was this id in
    // yesterday's ingest?" without shipping the full key set. The
    // filter is 66 BIGINT words (63 usable bits each — masks never
    // touch the sign bit, so two's-complement `1 << 63` semantics never
    // enters the compare); the 4 bit positions per id come from
    // disjoint 3-hex-char slices of md5(id) — the agg_kmv_jaccard
    // discipline (md5 replays engine-identically), parsed by the SAME
    // instr/substring SQL text on both engines, so unlike stock
    // BloomFilterAggregate (impl-specific XXH64 bytes) every bit is
    // fully ORACLE-CHECKABLE. Build: member ids explode to (word, mask)
    // and bit_or-fold per word — the agg_bitmap_distinct shape; the
    // map-side-combined shuffle carries <= 66 rows per partition at ANY
    // corpus size, and daily word-tables union-merge by the same
    // bit_or (the mergeable-family re-aggregation contract). Probe: a
    // fixed 32-id panel (20 in-domain + 12 guaranteed non-members)
    // joins the broadcast 66-row filter; hit = all 4 bits set. The
    // datasheet reports the bloom verdict NEXT TO ground truth
    // (false_positive column — zero false negatives is structural, and
    // AggSpec pins it plus guaranteed FPs on a saturated 2-word
    // geometry) and the closed-form fill-ratio FPR estimate
    // (bits_set/4096)^g — three double multiplies, no transcendentals,
    // bit-identical cross-engine.
    "agg_bloom_members" -> ((s, dir) => bloomMembers(s, dir, BloomWords)),

    // Mergeable t-digest quantiles (r14): sketch per (event_type, day)
    // partial, union-merge per event_type, read p50/p90/p99 off the
    // merged digest — `agg_hll_mergeable`'s re-aggregation contract for
    // QUANTILES, the one sketch family the suite lacked (r13 verdict
    // item 5; `agg_approx_percentile` exists but its state is opaque —
    // the persistable-daily-partials demo is the point). Each partial is
    // a few hundred (mean, weight) centroids regardless of row count, so
    // a backfill or coarser rollup never rescans raw events. Centroid
    // boundaries are arrival-order-dependent like every merge-based
    // digest → no DuckDB oracle; AggSpec pins mass conservation, the
    // rank-error bound vs the exact percentiles, and merge
    // associativity-within-bound.
    "agg_tdigest" -> ((s, dir) => {
      val sk = udaf(new graft.functions.TDigestSketchAgg, Encoders.scalaDouble)
      val qs = udaf(new graft.functions.TDigestQuantilesAgg(
        Seq(0.5, 0.9, 0.99)), Encoders.BINARY)
      Tables.events(s, dir)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sk(col("value")).as("sk"))
        .groupBy("event_type")
        .agg(qs(col("sk")).as("qv"))
        .select(col("event_type"),
          round(col("qv.qs").getItem(0), 4).as("p50"),
          round(col("qv.qs").getItem(1), 4).as("p90"),
          round(col("qv.qs").getItem(2), 4).as("p99"))
        .orderBy("event_type")
    }),

    // Simpson's-paradox (aggregation-reversal) audit (r14): the
    // urgent-vs-rest fulfillment-rate gap per order YEAR next to the
    // POOLED gap — the textbook amalgamation check every dashboard
    // aggregate should ship with, because a pooled rate difference can
    // carry the opposite sign of every stratum once group sizes
    // confound (Simpson 1951; agg_chi2/agg_cramers_v measure
    // association strength, this audits its DIRECTION under
    // aggregation). One corpus groupBy into the |years|-bounded strata
    // relation + one global aggregate; every rate is a single division
    // of exact integer sums, the reversal flag compares the RAW double
    // products (identical IEEE chains both engines), outputs pin at
    // 6dp. Degenerate strata (one arm empty) are excluded by the same
    // integer HAVING both engines.
    "agg_simpson" -> ((s, dir) => {
      val t = when(substring(col("o_orderpriority"), 1, 1) <= "2", 1L)
        .otherwise(0L)
      val y = when(col("o_orderstatus") === "F", 1L).otherwise(0L)
      val b = Tables.orders(s, dir)
        .select(year(col("o_orderdate")).as("yr"), t.as("t"), y.as("y"))
      val strata = b.groupBy("yr")
        .agg(sum(col("t")).as("n_t"), sum(lit(1L) - col("t")).as("n_c"),
          sum(col("t") * col("y")).as("f_t"),
          sum((lit(1L) - col("t")) * col("y")).as("f_c"))
        .filter(col("n_t") > 0 && col("n_c") > 0)
      val pooled = b.agg(
        (sum(col("t") * col("y")).cast("double") / sum(col("t")) -
          sum((lit(1L) - col("t")) * col("y")).cast("double") /
            sum(lit(1L) - col("t"))).as("pooled_raw"))
      val rt = col("f_t").cast("double") / col("n_t")
      val rc = col("f_c").cast("double") / col("n_c")
      strata.crossJoin(broadcast(pooled))
        .select(col("yr"), col("n_t"), col("n_c"),
          Num.pin(rt, 6).as("rate_t"), Num.pin(rc, 6).as("rate_c"),
          Num.pin(rt - rc, 6).as("diff"),
          Num.pin(col("pooled_raw"), 6).as("pooled_diff"),
          ((rt - rc) * col("pooled_raw") < 0).as("reversed"))
        .orderBy("yr")
    }),

    // Kendall tau-b (r14) — the concordant/discordant-pair rank
    // correlation completing the monotone-association pair with
    // agg_spearman (tau has the cleaner interpretation — probability of
    // concordance minus discordance — and the b-form corrects for the
    // heavy ties both these domains carry). NEVER a row-pair sweep:
    // rows collapse to the |X|x|Y|-bounded (x, y, count) grid in one
    // corpus groupBy (50x11 here; the spearman value-domain move), and
    // C/D come from the TRIANGULAR x-ordered grid self-join — at most
    // |grid|^2/2 cell pairs regardless of row count, with the grid side
    // size-conditionally broadcast. Tie terms fold from the bounded
    // marginals; every count is an exact DECIMAL(19,0)x(19,0) product
    // fold (no overflow at any N), and tau-b is one fixed double chain
    // with per-factor sqrt (the ml_mcc discipline), pinned at 6dp.
    "agg_kendall_tau" -> ((s, dir) => {
      def d19(c: Column) = c.cast("decimal(19,0)")
      def dbl(c: Column) = c.cast("double")
      val cells = Tables.lineitem(s, dir)
        .groupBy(col("l_quantity").as("x"), col("l_discount").as("y"))
        .agg(count(lit(1)).as("c")).persist()
      // memoized per (session, dir) — the nodeCountMemo class (r18 opt):
      // the cell count only sizes the broadcast hint and is a pure
      // function of the immutable fixture; the query's own first action
      // still materializes the persisted cells it consumes
      val nCells: Long =
        kendallCellCountMemo.getOrElseUpdate(s, dir)(cells.count())
      val b = cells.select(col("x").as("xb"), col("y").as("yb"),
        col("c").as("cb"))
      val pairs = cells.join(Bcast.ifFitsRows(b, nCells, 32),
          col("x") < col("xb"))
        .agg(
          sum(when(col("y") < col("yb"), d19(col("c")) * d19(col("cb")))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("cc"),
          sum(when(col("y") > col("yb"), d19(col("c")) * d19(col("cb")))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("dd"))
      def tieTerm(key: String, out: String): DataFrame = cells
        .groupBy(key).agg(sum(col("c")).as("t"))
        .agg(dbl(sum(d19(col("t")) * d19(col("t") - 1))).as(out))
      val nn = cells.agg(sum(col("c")).as("n"))
      pairs.crossJoin(broadcast(nn))
        .crossJoin(broadcast(tieTerm("x", "n1d")))
        .crossJoin(broadcast(tieTerm("y", "n2d")))
        .select(col("n"), col("cc").cast("long").as("n_concordant"),
          col("dd").cast("long").as("n_discordant"),
          Num.pin(lit(2.0) * (dbl(col("cc")) - dbl(col("dd"))) /
            (sqrt(dbl(col("n")) * (dbl(col("n")) - lit(1.0)) - col("n1d")) *
             sqrt(dbl(col("n")) * (dbl(col("n")) - lit(1.0)) - col("n2d"))), 6)
            .as("tau_b"))
    }),

    // Argmin/argmax surface: per market segment, the customer carrying the
    // max / min account balance (struct-ordered tiebreak on the unique
    // custkey, so the answer is deterministic under balance ties). One
    // partial+final aggregation — no window, no sort of the whole table.
    "agg_arg_minmax" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("top_name"),
          min_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("bottom_name"),
          max(col("c_acctbal")).as("max_bal"),
          min(col("c_acctbal")).as("min_bal"))
        .orderBy("c_mktsegment")),

    // Ordered string aggregation (LISTAGG/STRING_AGG): csv of the distinct
    // line statuses per return flag. Built as collect_set -> array_sort ->
    // concat_ws so the order is deterministic without WITHIN GROUP support.
    "agg_listagg" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(concat_ws(",", array_sort(collect_set(col("l_linestatus")))).as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Histogram: fixed-width price buckets via portable arithmetic
    // (floor(x / w)) — the one-pass distribution profile every OLAP
    // engine exposes; engine-specific width_bucket variants disagree on
    // edge semantics, plain arithmetic does not.
    "agg_histogram" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(floor(col("o_totalprice") / 50000).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 4).as("lo"),
          round(max(col("o_totalprice")), 4).as("hi"))
        .orderBy("bucket")),

    // Boolean aggregates: universally/existentially quantified predicates
    // per group (every/any — SQL bool_and/bool_or).
    "agg_bool" -> ((s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(every(col("c_acctbal") > -1000).as("all_above_min"),
          some(col("c_acctbal") > 9000).as("any_rich"),
          count(lit(1)).as("n"))
        .orderBy("c_mktsegment")),

    // Bitwise aggregates over the line numbers per return flag.
    "agg_bitwise" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(bit_and(col("l_linenumber")).as("band"),
          bit_or(col("l_linenumber")).as("bor"),
          bit_xor(col("l_linenumber")).as("bxor"))
        .orderBy("l_returnflag")),

    // Mergeable approximate percentiles (Greenwald-Khanna style sketch):
    // the bounded-memory path for quantiles at corpus scale — the exact
    // `percentile` buffers every value per group; this sketch ships
    // O(accuracy) centroids per partial and merges associatively, the
    // same partial/final contract the HLL and SpaceSaving entries pin.
    // No oracle (sketch-impl-specific); AggSpec bounds it against the
    // exact percentiles.
    "agg_approx_percentile" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_orderstatus")
        .agg(percentile_approx(col("o_totalprice"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ps"))
        .select(col("o_orderstatus"),
          col("ps")(0).as("p50"), col("ps")(1).as("p90"), col("ps")(2).as("p99"))
        .orderBy("o_orderstatus")),

    // Mode (most frequent value) per group with a deterministic tiebreak:
    // built as count + rank-1 window rather than the engine's `mode()`,
    // whose tie choice is implementation-defined — the two-level
    // (count desc, value asc) key pins one answer on every engine. The
    // pre-aggregation shrinks the window input to |groups|×|values| rows,
    // so the sort is over counts, not raw events.
    "agg_mode" -> ((s, dir) => {
      val counts = Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("n").desc, col("event_type"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("mode_event"), col("n"))
        .orderBy("user_id")
    }),

    // Custom UDAF: discount-weighted average price per return flag.
    "agg_custom_wavg" -> ((s, dir) => {
      val wavg = udaf(WeightedAvg,
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_extendedprice"), col("l_discount")), 4).as("wavg_price"))
        .orderBy("l_returnflag")
    }),

    // Geometric + harmonic means per group — the other two Pythagorean
    // means (rates and ratios average geometrically/harmonically, not
    // arithmetically; think per-token loss multipliers or throughput).
    // Determinism discipline: ln(x) and 1/x are per-row transforms
    // (cross-engine-identical to ≲1 ulp), but their SUMS are not — so
    // each transform rounds to DECIMAL(28,10) BEFORE the fold, making
    // the aggregation exact and order-independent; the final exp/divide
    // are single exactly-rounded ops. One partial+final aggregation.
    "agg_geomean" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(log(col("l_extendedprice")).cast("decimal(28,10)"))
            .cast("double").as("sln"),
          sum((lit(1.0) / col("l_extendedprice")).cast("decimal(28,10)"))
            .cast("double").as("sinv"))
        .select(col("l_returnflag"), col("n"),
          round(exp(col("sln") / col("n")), 4).as("geo_mean"),
          round(col("n") / col("sinv"), 4).as("harm_mean"))
        .orderBy("l_returnflag")),

    // Exact weighted median: smallest price v whose cumulative quantity
    // weight (ordered by price) reaches half the group's total — the
    // lower weighted median, the order statistic behind cost-weighted
    // SLAs and weighted-percentile dashboards.
    //
    // r18 opt round: bucketed TWO-PHASE exact selection replacing the
    // r16 range-partition + per-partition-offset form. That form's
    // premise — "the (group, value) distinct-value relation is
    // dictionary-sized" — fails exactly on value domains like prices
    // (this fixture: 594,330 distinct (flag, price) pairs from 600,000
    // rows), where it shuffled a corpus-sized relation THREE times
    // (groupBy, range exchange incl. its sampling job, the windows' own
    // (pid, group) exchange) and pinned it in cache. The two-phase form
    // shuffles only BOUNDED relations at any cardinality:
    //   1. one pass partial-aggregates weights into |groups| × WmBuckets
    //      value-range cells (map-side combine does the heavy lifting;
    //      the only corpus-wide work is the scan) plus a 3-row min/max
    //      probe rider; the half-mass bucket b* and the cumulative
    //      weight below it come from windows over the bounded cell
    //      relation;
    //   2. a second scan filtered to b* (a broadcast-joined range test)
    //      collapses to per-value weights — at most the values of ONE
    //      bucket — and the global rule "min v with cum ≥ tot/2" is
    //      recovered exactly from offset + within-bucket cumsum, because
    //      the bucket map floor((v−mn)/width) is monotonic in v.
    // Identical output to the naive one-window form the oracle replays:
    // weights fold as exact DECIMAL everywhere, so offsets, cell sums,
    // and the ≥ total/2 comparisons are order-independent and bit-equal
    // cross-engine (AggProbe pins collect-equality against the r16 form
    // at sf0.1). Windows never see more than |groups|×WmBuckets cells or
    // one bucket's values — the single-task collapse the r16 form
    // guarded against stays impossible unless one bucket degenerately
    // holds the whole domain (a near-constant column — in which case the
    // relation is dictionary-sized and trivially small anyway).
    "agg_weighted_median" -> ((s, dir) => {
      val B = WmBuckets
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_extendedprice").as("v"),
        col("l_quantity").cast("decimal(28,10)").as("w"))
      val rng = li.groupBy("l_returnflag")
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      // epsilon keeps the width positive for a constant column (every
      // value then lands in bucket 0); any monotonic bucketing is
      // correct, so the perturbation cannot change output
      val bucketed = li.join(broadcast(rng), "l_returnflag")
        .withColumn("bkt",
          least(lit(B - 1), greatest(lit(0), floor(
            (col("v") - col("mn")) / ((col("mx") - col("mn")) / B + lit(1e-12))
          ).cast("int"))))
      val cells = bucketed.groupBy("l_returnflag", "bkt")
        .agg(sum(col("w")).as("bw"))
      val wc = Window.partitionBy("l_returnflag").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells
        .withColumn("cumw", sum(col("bw")).over(wc))
        .withColumn("tot",
          sum(col("bw")).over(Window.partitionBy("l_returnflag")))
      // b* = first bucket whose cumulative weight crosses half; offset =
      // cumulative weight of the last NON-EMPTY bucket strictly below it
      // (cells exist only for non-empty buckets, so a "b* − 1" lookup
      // would drop any group whose preceding bucket is empty — caught by
      // the sf0.001 oracle gate; cumw is monotone in bkt, so the max
      // over pb < b* IS the cumulative below b*, and 0 when none exists)
      val target = cum
        .filter(col("cumw") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(min(col("bkt")).as("bstar"), max(col("tot")).as("tot"))
        .join(cum.select(col("l_returnflag"), col("bkt").as("pb"),
          col("cumw").as("below")), Seq("l_returnflag"), "left")
        .groupBy("l_returnflag", "bstar", "tot")
        .agg(coalesce(max(when(col("pb") < col("bstar"), col("below"))),
          lit(0).cast("decimal(38,10)")).as("offset"))
      val inB = bucketed.join(broadcast(target), "l_returnflag")
        .filter(col("bkt") === col("bstar"))
        .groupBy(col("l_returnflag"), col("tot"), col("offset"), col("v"))
        .agg(sum(col("w")).as("vw"))
      val vc = Window.partitionBy("l_returnflag").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      inB.withColumn("cum", sum(col("vw")).over(vc) + col("offset"))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy("l_returnflag")
        .agg(min(col("v")).as("weighted_median"),
          max(col("tot")).cast("double").as("total_weight"))
        .orderBy("l_returnflag")
    }),

    // Shannon entropy of a categorical distribution per group (r11): how
    // evenly each order status spreads across priorities — the
    // category-balance audit behind "is this slice degenerate"
    // dashboards, and `agg_chi2`'s information-theoretic companion on
    // the SAME contingency cells (chi2 asks independence; entropy asks
    // concentration — H→0 flags a collapsed slice, H→log2(k) a uniform
    // one). One corpus-scale partial-agg shuffle to the |status|×
    // |priority| cells; the entropy identity H = (ln n − Σ c·ln c / n) /
    // ln 2 (text_entropy's form — exact integer counts, one log per
    // CELL, never per row) folds over that bounded relation as exact
    // DECIMAL so the reduction is order-independent.
    "agg_entropy_group" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("c"))
        .groupBy("status")
        .agg(sum(col("c")).as("n_orders"),
          count(lit(1)).as("n_cats"),
          sum((col("c") * log(col("c"))).cast("decimal(28,10)"))
            .cast("double").as("slc"))
        .select(col("status"), col("n_orders"), col("n_cats"),
          graft.functions.Num.pin(
            (log(col("n_orders")) - col("slc") / col("n_orders")) /
              log(lit(2.0)), 6).as("entropy_bits"))
        .orderBy("status")),

    // Chi-square independence test between two categoricals — the
    // contingency-table screen behind feature selection and A/B sanity
    // checks ("is order priority independent of status?"). ONE
    // corpus-scale aggregation collapses the fact table to the
    // |status|×|priority| cell relation (map-side combine does the heavy
    // lifting); the three marginal windows and the chi2 total all run
    // over that bounded contingency table, never the corpus. Expected
    // counts and per-cell contributions are exactly-rounded IEEE
    // products/divisions of integers pre-rounded at 6dp, and the final
    // chi2 sums those ROUNDED terms as exact DECIMAL — order-independent
    // and bit-equal cross-engine.
    "agg_chi2" -> ((s, dir) => {
      val tot = Window.partitionBy()
      Tables.orders(s, dir)
        .groupBy(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("obs"))
        .withColumn("row_tot",
          sum(col("obs")).over(Window.partitionBy("status")))
        .withColumn("col_tot",
          sum(col("obs")).over(Window.partitionBy("priority")))
        .withColumn("n", sum(col("obs")).over(tot))
        .withColumn("expected", round(
          col("row_tot").cast("double") * col("col_tot") / col("n"), 6))
        .withColumn("contrib", round(
          (col("obs") - col("expected")) * (col("obs") - col("expected")) /
            col("expected"), 6))
        .withColumn("chi2",
          sum(col("contrib").cast("decimal(28,10)")).over(tot).cast("double"))
        .select(col("status"), col("priority"), col("obs"), col("row_tot"),
          col("col_tot"), col("expected"), col("contrib"), col("chi2"))
        .orderBy("status", "priority")
    }),

    // Bowley (quartile) skewness per event type — the robust shape
    // companion to agg_skew_kurt's moment-based skewness (a handful of
    // outliers saturates the third moment; the quartile form has a 25%
    // breakdown point): B = (Q3 + Q1 − 2·median)/(Q3 − Q1) ∈ [−1, 1].
    // One aggregation pass per group with exact interpolating
    // percentiles (the agg_mad discipline — Spark percentile() matches
    // DuckDB quantile_cont), |types|-row output, degenerate groups
    // (IQR = 0) excluded by the same raw-value compare on both engines.
    "agg_bowley_skew" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.25)").as("q1r"),
          expr("percentile(value, 0.5)").as("medr"),
          expr("percentile(value, 0.75)").as("q3r"))
        .filter(col("q3r") > col("q1r"))
        .select(col("event_type"), col("n"),
          Num.pin(col("q1r"), 4).as("q1"),
          Num.pin(col("medr"), 4).as("median"),
          Num.pin(col("q3r"), 4).as("q3"),
          Num.pin(col("q3r") - col("q1r"), 4).as("iqr"),
          Num.pin((col("q3r") + col("q1r") - lit(2.0) * col("medr")) /
            (col("q3r") - col("q1r")), 6).as("bowley"))
        .orderBy("event_type")
    }),

    // Spearman rank correlation ρ between quantity and discount — the
    // monotone-association upgrade of agg_corr's Pearson (rank-based, so
    // outliers and curvature don't fake or hide a relation). Ranks are
    // ml_mann_whitney's midranks computed WITHOUT ranking a row: each
    // variable collapses to its DISTINCT value domain (50 and 11 values
    // here — domain-bounded at any corpus size), one cumulative window
    // over that bounded relation yields tie-block prefix counts, and
    // 2·midrank = 2·before + t + 1 stays an exact BIGINT. The tiny rank
    // maps broadcast back onto the fact rows and ρ is Pearson over the
    // integer 2·midranks — scale-invariant, so the ×2 cancels — via
    // exact DECIMAL(19,0)-product sufficient sums (the agg_corr
    // discipline; products cast per factor so 2N-sized ranks can never
    // overflow a BIGINT multiply at any N). One corpus scan, one
    // map-side-combined aggregation, zero row-level sorts.
    "agg_spearman" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_quantity"), col("l_discount"))
      def rankMap(c: String, out: String): DataFrame = {
        val cum = Window.orderBy(c)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.groupBy(col(c)).agg(count(lit(1)).as("t"))
          .withColumn("before", sum(col("t")).over(cum) - col("t"))
          .select(col(c), (lit(2L) * col("before") + col("t") + lit(1L)).as(out))
      }
      def d19(c: Column) = c.cast("decimal(19,0)")
      def dbl(c: Column) = c.cast("double")
      val st = li
        .join(broadcast(rankMap("l_quantity", "mx")), "l_quantity")
        .join(broadcast(rankMap("l_discount", "my")), "l_discount")
        .agg(count(lit(1)).as("n"),
          sum(d19(col("mx"))).as("sx"), sum(d19(col("my"))).as("sy"),
          sum(d19(col("mx")) * d19(col("my"))).as("sxy"),
          sum(d19(col("mx")) * d19(col("mx"))).as("sxx"),
          sum(d19(col("my")) * d19(col("my"))).as("syy"))
      st.select(col("n"),
        Num.pin((dbl(col("n")) * dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy"))) /
          sqrt((dbl(col("n")) * dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx"))) *
            (dbl(col("n")) * dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")))), 6)
          .as("spearman_rho"))
    }),

    // Cramér's V — the normalized effect size the chi-square statistic
    // (agg_chi2's per-cell table) is read THROUGH: V = √(χ²/(n·min(r−1,
    // c−1))) ∈ [0,1] answers "HOW dependent is the language mix on the
    // source?" where χ² only answers "is it dependent at all" (any
    // large-n corpus rejects independence). Unlike agg_chi2's
    // observed-cells form this builds the DENSE contingency grid
    // (distinct langs × distinct sources, empty cells at obs = 0 —
    // which DO contribute their full expected mass), so the statistic
    // is the textbook one. Shapes: one corpus-scale groupBy into the
    // |langs|×|sources|-bounded grid (the cross of two tiny broadcast
    // distinct lists), bounded windows for the marginals, contributions
    // pre-pinned at 6dp and folded as DECIMAL, one sqrt at the end.
    "agg_cramers_v" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val tot = Window.partitionBy()
      val obs = docs.groupBy("lang", "source").agg(count(lit(1)).as("obs"))
      val grid = docs.select("lang").distinct()
        .crossJoin(broadcast(docs.select("source").distinct()))
        .join(obs, Seq("lang", "source"), "left")
        .select(col("lang"), col("source"),
          coalesce(col("obs"), lit(0L)).as("obs"))
      val cells = grid
        .withColumn("row_tot",
          sum(col("obs")).over(Window.partitionBy("lang")))
        .withColumn("col_tot",
          sum(col("obs")).over(Window.partitionBy("source")))
        .withColumn("n", sum(col("obs")).over(tot))
        .withColumn("expected", Num.pin(
          col("row_tot").cast("double") * col("col_tot") / col("n"), 6))
        .withColumn("contrib", Num.pin(
          (col("obs") - col("expected")) * (col("obs") - col("expected")) /
            col("expected"), 6))
      val rc = docs.agg(countDistinct(col("lang")).as("r"),
        countDistinct(col("source")).as("c"))
      cells.agg(max(col("n")).as("n"),
          sum(col("contrib").cast("decimal(28,10)")).cast("double").as("x2"))
        .crossJoin(broadcast(rc))
        .select(col("n"), col("r"), col("c"),
          Num.pin(col("x2"), 6).as("chi2"),
          Num.pin(sqrt(col("x2") /
            (col("n") * least(col("r") - 1, col("c") - 1))), 6)
            .as("cramers_v"))
    }),

    // Median absolute deviation — the robust dispersion / outlier-scale
    // statistic data-cleaning pipelines use where stddev is skew-fragile.
    // Two aggregation passes over the fact table (exact median of
    // values, then exact median of |value − median|), the per-group
    // medians joined back as a BROADCAST of the |event types|-row stats
    // relation — never a window over raw events. Interpolating exact
    // percentile matches DuckDB's quantile_cont; the deviation is one
    // exactly-rounded IEEE subtraction, so the second median ranks
    // identically cross-engine.
    "agg_mad" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"),
          count(lit(1)).as("n"))
      ev.join(broadcast(med), "event_type")
        .groupBy(col("event_type"))
        .agg(round(min(col("med")), 4).as("med"),
          min(col("n")).as("n"),
          round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"))
        .orderBy("event_type")
    }),

    // Gini coefficient of order value per priority class — the
    // concentration/inequality statistic (revenue concentration, token
    // budget skew) via the rank formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n.
    // The rank would naively be a per-group global sort window — the
    // low-cardinality single-task trap. r18 opt: the rank offsets now
    // derive from the agg_weighted_median bucket discipline instead of
    // the r16 range-partition + pid-offset form, because the (group,
    // value) DISTINCT-value relation is corpus-sized on price-like
    // domains (594,330 distinct pairs from 600,000 rows at sf0.1) and
    // the range form shuffled it TWICE more (range exchange incl. its
    // sampling job, then the windows' own (pid, group) exchange) and
    // pinned it in cache. Now: ONE corpus-scale map-side-combined
    // shuffle collapses to (g, v, c); per-(g, bkt) counts aggregate to
    // the ≤|groups|×WmBuckets cell relation whose strictly-below
    // cumulative counts broadcast back, and each value's global rank
    // offset cb = cells-below-bucket + within-bucket cumsum (a window
    // partitioned on (g, bkt) — ≤ |groups|×WmBuckets well-spread
    // partitions, spillable, never one task). The tie-block rank sum
    // folds in the SAME closed form (c·(cb+1) + c·(c−1)/2), cb is the
    // identical integer by bucket-map monotonicity, and value sums ride
    // the same DECIMAL(18,2)×DECIMAL(18,0) exact products — so both
    // engines divide identical integers/decimals at the end (AggProbe
    // pins collect-equality against the r16 form at sf0.1).
    "agg_gini" -> ((s, dir) => {
      val B = WmBuckets
      val byVal = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
        .agg(count(lit(1)).as("c"))
      val rng = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("g"))
        .agg(min(col("o_totalprice")).as("mn"),
          max(col("o_totalprice")).as("mx"))
      // epsilon keeps the width positive for a constant column; any
      // monotonic bucketing is correct (cb is recovered exactly), so the
      // perturbation cannot change output
      val bucketed = byVal.join(broadcast(rng), "g")
        .withColumn("bkt",
          least(lit(B - 1), greatest(lit(0), floor(
            (col("v") - col("mn")) / ((col("mx") - col("mn")) / B + lit(1e-12))
          ).cast("int"))))
        .select("g", "v", "c", "bkt")
      val cells = bucketed.groupBy("g", "bkt").agg(sum(col("c")).as("bc"))
      val wc = Window.partitionBy("g").orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val cellMap = cells
        .withColumn("cbelow", coalesce(sum(col("bc")).over(wc), lit(0L)))
        .select(col("g"), col("bkt"), col("cbelow"))
      val vw = Window.partitionBy("g", "bkt").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      bucketed.join(broadcast(cellMap), Seq("g", "bkt"))
        .withColumn("cb",
          coalesce(sum(col("c")).over(vw), lit(0L)) + col("cbelow"))
        .withColumn("w", expr("c * (cb + 1) + (c * (c - 1)) DIV 2"))
        .groupBy("g")
        .agg(sum(col("c")).as("n"),
          sum(col("v").cast("decimal(18,2)") *
            col("c").cast("decimal(18,0)")).as("s1"),
          sum(col("v").cast("decimal(18,2)") *
            col("w").cast("decimal(18,0)")).as("s2"))
        .select(col("g").as("priority"), col("n"),
          round(col("s1").cast("double"), 2).as("total"),
          Num.pin(lit(2.0) * col("s2").cast("double") /
              (col("n") * col("s1").cast("double")) -
            (col("n") + lit(1.0)) / col("n"), 6).as("gini"))
        .orderBy("priority")
    }),

    // Theil T inequality index with the between/within decomposition —
    // `agg_gini`'s additively-decomposable companion: gini says HOW
    // unequal, Theil says WHERE the inequality lives (T_total = T_between
    // + Σ w_g·T_g, the one identity gini cannot offer). One corpus-scale
    // partial-agg shuffle collapses orders to the (priority, price, c)
    // cell relation, so ln runs once per DISTINCT value, never per row
    // (the agg_entropy_group discipline); per-cell x·ln x terms pre-round
    // at 6dp (|v·ln v| ≤ ~8e6 keeps the floor chain inside exact-double
    // range) and fold as exact c×DECIMAL products; group relations are
    // |priority|-bounded, so every window below runs over ≤5 rows.
    "agg_theil" -> ((s, dir) => {
      val tot = Window.partitionBy()
      val lnv = Num.pin(log(col("v")), 10)
      val grp = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("g"), col("o_totalprice").as("v"))
        .agg(count(lit(1)).as("c"))
        .groupBy("g")
        .agg(sum(col("c")).as("n"),
          sum(col("v").cast("decimal(18,2)") *
            col("c").cast("decimal(18,0)")).as("s"),
          sum(col("c") * Num.pin(col("v") * lnv, 6).cast("decimal(28,6)"))
            .as("slvx"))
      val mu = col("s").cast("double") / col("n")
      val muT = col("st").cast("double") / col("nt")
      val w = col("s").cast("double") / col("st").cast("double")
      val r = col("n").cast("double") / col("nt")
      grp
        .withColumn("nt", sum(col("n")).over(tot))
        .withColumn("st", sum(col("s")).over(tot))
        .withColumn("slvxt", sum(col("slvx")).over(tot))
        .withColumn("tb_term", Num.pin(
          w * (Num.pin(log(w), 10) - Num.pin(log(r), 10)), 10))
        .withColumn("theil_between", Num.pin(
          sum(col("tb_term").cast("decimal(28,10)")).over(tot)
            .cast("double"), 6))
        .withColumn("theil_total", Num.pin(
          col("slvxt").cast("double") / (col("nt") * muT) -
            Num.pin(log(muT), 10), 6))
        .select(col("g").as("priority"), col("n"),
          round(col("s").cast("double"), 2).as("total"),
          round(mu, 6).as("mean"),
          Num.pin(w, 6).as("value_share"),
          Num.pin(col("slvx").cast("double") / (col("n") * mu) -
            Num.pin(log(mu), 10), 6).as("theil_within"),
          col("theil_between"), col("theil_total"))
        .orderBy("priority")
    }),

    // Lorenz curve deciles over the order-value distribution — the
    // inequality DIAGRAM behind `agg_gini`'s single number ("the poorest
    // 50% of orders carry 31% of the value"): cumulative population share
    // vs cumulative value share at each population decile. r18 opt: the
    // decile assignment is a 9-boundary SELECTION, not a full rank, so it
    // rides the agg_weighted_median bucket discipline instead of the r16
    // range-partition + pid-offset form (the DISTINCT-price relation is
    // corpus-sized — near-unique prices — so that form shuffled it two
    // extra times and pinned it in cache). One corpus-scale map-side-
    // combined shuffle collapses to (v, c, sv); per-bucket counts
    // aggregate to the ≤WmBuckets cell relation, over which a bounded
    // cumsum decides each bucket's decile span: a bucket whose rank span
    // [cbelow+1, cumc] stays inside one decile maps directly (the
    // common case — broadcast bucket→decile), and only the ≤10 buckets
    // STRADDLING a decile boundary get an exact within-bucket cumsum (a
    // window partitioned on bkt over ~1/WmBuckets of the domain). The
    // ceil-DIV tie-block rule is evaluated on the identical integers
    // (bucket-map monotonicity), so every value lands in the decile the
    // naive global cumsum assigns; per-decile cum_orders/cumv are then
    // running EXACT-DECIMAL sums over the ≤10-row decile table — equal
    // to the naive form's max-of-cumulative because deciles partition
    // the value order contiguously (AggProbe pins collect-equality
    // against the r16 form at sf0.1).
    "agg_lorenz" -> ((s, dir) => {
      val B = WmBuckets
      val tot = Window.partitionBy()
      val byVal = Tables.orders(s, dir)
        .groupBy(col("o_totalprice").as("v"))
        .agg(count(lit(1)).as("c"))
        .withColumn("sv", col("v").cast("decimal(18,2)") *
          col("c").cast("decimal(18,0)"))
      val rng = byVal.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      val bucketed = byVal.crossJoin(broadcast(rng))
        .withColumn("bkt",
          least(lit(B - 1), greatest(lit(0), floor(
            (col("v") - col("mn")) / ((col("mx") - col("mn")) / B + lit(1e-12))
          ).cast("int"))))
      val cells = bucketed.groupBy("bkt").agg(sum(col("c")).as("bc"))
      val wc = Window.orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // d(r) = decile of global rank r; evaluated at a bucket's first and
      // last rank — equal means the whole bucket shares that decile
      val cellMap = cells
        .withColumn("cumc", sum(col("bc")).over(wc))
        .withColumn("nt", sum(col("bc")).over(tot))
        .withColumn("cbelow", col("cumc") - col("bc"))
        .withColumn("dlo",
          least(lit(9L), expr("(10 * (cbelow + 1) + nt - 1) DIV nt") - 1))
        .withColumn("dhi",
          least(lit(9L), expr("(10 * cumc + nt - 1) DIV nt") - 1))
        .select(col("bkt").as("mbkt"), col("cbelow"), col("nt"),
          when(col("dlo") === col("dhi"), col("dhi")).as("d_uniform"))
      val joined = bucketed.join(broadcast(cellMap), col("bkt") === col("mbkt"))
      val uni = joined.filter(col("d_uniform").isNotNull)
        .select(col("d_uniform").as("decile"), col("c"), col("sv"))
      val vw = Window.partitionBy("bkt").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val strad = joined.filter(col("d_uniform").isNull)
        .withColumn("cb", sum(col("c")).over(vw) + col("cbelow"))
        .withColumn("decile",
          least(lit(9L), expr("(10 * cb + nt - 1) DIV nt") - 1))
        .select(col("decile"), col("c"), col("sv"))
      val dw = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      uni.union(strad)
        .groupBy("decile")
        .agg(sum(col("c")).as("n_orders"), sum(col("sv")).as("vsum"))
        .withColumn("cum_orders", sum(col("n_orders")).over(dw))
        .withColumn("cumv", sum(col("vsum")).over(dw))
        .withColumn("ntot", max(col("cum_orders")).over(tot))
        .withColumn("vtot", max(col("cumv")).over(tot))
        .select(col("decile"), col("n_orders"),
          round(col("vsum").cast("double"), 2).as("value_total"),
          Num.pin(col("cum_orders").cast("double") / col("ntot"), 6)
            .as("cum_pop_share"),
          Num.pin(col("cumv").cast("double") / col("vtot").cast("double"), 6)
            .as("cum_value_share"))
        .orderBy("decile")
    }),

    // Wilson score interval for a per-group success rate — the
    // experiment-dashboard confidence bound that stays valid at small n
    // and extreme rates where the normal approximation fails. ONE
    // aggregation into the |types|-row relation (n, successes as exact
    // integers); the interval arithmetic is a fixed chain of IEEE ops on
    // those integers — written in the SAME association order as the
    // oracle SQL, so every intermediate double is bit-equal (z² constant-
    // folds identically in both engines).
    "agg_wilson" -> ((s, dir) => {
      val z = lit(1.96)
      val nn = col("n").cast("double")
      val p = col("x").cast("double") / col("n")
      val denom = lit(1.0) + z * z / nn
      val center = (p + z * z / (lit(2.0) * nn)) / denom
      val half = z * sqrt(p * (lit(1.0) - p) / nn +
        z * z / (lit(4.0) * nn * nn)) / denom
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") > 50.0, 1L).otherwise(0L)).as("x"))
        .select(col("event_type"), col("n"), col("x"),
          round(p, 6).as("rate"),
          round(center - half, 6).as("wilson_lo"),
          round(center + half, 6).as("wilson_hi"))
        .orderBy("event_type")
    }),

    // Association rules (A → B) over user event-type baskets — the
    // market-basket support/confidence/lift triple (Apriori's 1-item
    // rules; the cross-sell/co-engagement readout). The stream collapses
    // to DISTINCT (user, type) in ONE partial-agg shuffle (bounded by
    // users × |types|); single-item supports are a |types|-row broadcast
    // and pair supports come from the bounded self-join each user
    // contributes ≤|types|² pairs to (the `graph_bipartite_proj` shape,
    // both directions kept since confidence is asymmetric). All ratios
    // divide exact integers.
    "agg_assoc_rules" -> ((s, dir) => {
      val ut = Tables.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct().persist()
      val totals = ut.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("n_users"))
      val singles = ut.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      val pairs = ut.select(col("user_id"), col("event_type").as("a"))
        .join(ut.select(col("user_id"), col("event_type").as("b")), "user_id")
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      pairs
        .join(broadcast(singles.select(col("event_type").as("a"),
          col("cnt").as("n_a"))), "a")
        .join(broadcast(singles.select(col("event_type").as("b"),
          col("cnt").as("n_b"))), "b")
        .crossJoin(broadcast(totals))
        .select(col("a"), col("b"), col("n_ab"),
          round(col("n_ab").cast("double") / col("n_users"), 6).as("support"),
          round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
          round(col("n_ab").cast("double") * col("n_users") /
            (col("n_a").cast("double") * col("n_b")), 6).as("lift"))
        .orderBy("a", "b")
    }),

    // Herfindahl-Hirschman concentration index per priority class —
    // "how concentrated is spend across customers" (the 0–10000 scale
    // regulators use; also the dataset-curation question "is this source
    // dominated by a few authors?"). Two aggregations: exact-DECIMAL
    // spend per (class, customer) — the only corpus-scale shuffle — then
    // a per-class fold where each squared share's numerator pre-rounds
    // at 4dp into a DECIMAL sum (order-independent; the square of an
    // exact-decimal double is exactly rounded IEEE).
    "agg_hhi" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"), col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
      val spd = col("sp").cast("double")
      spend
        .groupBy("priority")
        .agg(count(lit(1)).as("n_custs"),
          sum(col("sp")).as("tot"),
          sum(round(spd * spd, 4).cast("decimal(38,4)")).as("sq"))
        .select(col("priority"), col("n_custs"),
          round(col("tot").cast("double"), 2).as("total"),
          round(col("sq").cast("double") /
            (col("tot").cast("double") * col("tot").cast("double")) *
            10000.0, 4).as("hhi"))
        .orderBy("priority")
    }),

    // Tukey-fence outlier audit — the boxplot rule (beyond q1−1.5·IQR /
    // q3+1.5·IQR) per event type: the robust screen data-cleaning runs
    // before z-scores, since the fences themselves resist the outliers
    // they hunt. Two passes: exact interpolating quartiles into a
    // |types|-row relation, broadcast back, then one conditional-count
    // scan. Fence arithmetic is IEEE ops on the exact quantiles, written
    // in the oracle's association order.
    "agg_tukey_outliers" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val q = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"),
          count(lit(1)).as("n"))
      val lo = col("q1") - lit(1.5) * (col("q3") - col("q1"))
      val hi = col("q3") + lit(1.5) * (col("q3") - col("q1"))
      ev.join(broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(min(col("n")).as("n"),
          round(min(col("q1")), 4).as("q1"),
          round(min(col("q3")), 4).as("q3"),
          sum(when(col("value") < lo || col("value") > hi, 1L)
            .otherwise(0L)).as("n_outliers"))
        .withColumn("outlier_rate",
          round(col("n_outliers").cast("double") / col("n"), 6))
        .orderBy("event_type")
    }),

    // Winsorized mean — the robust location estimate that clamps the
    // tails at P05/P95 instead of dropping them: the standard guard for
    // metric aggregation over heavy-tailed telemetry. Same two-pass
    // shape as the Tukey audit (exact percentile relation broadcast
    // back); the clamped values fold as DECIMAL so the mean is
    // order-independent, next to the plain mean for the skew read-out.
    "agg_winsorized" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val q = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
      val clamped = greatest(least(col("value"), col("p95")), col("p05"))
      ev.join(broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(28,10)")).cast("double") /
            count(lit(1)), 4).as("mean"),
          round(sum(clamped.cast("decimal(28,10)")).cast("double") /
            count(lit(1)), 4).as("winsorized_mean"),
          round(min(col("p05")), 4).as("p05"),
          round(min(col("p95")), 4).as("p95"))
        .orderBy("event_type")
    }),

    // 5/95 trimmed mean per event type — `agg_winsorized`'s companion
    // that DROPS the tails instead of clamping them (winsorizing keeps
    // outlier COUNT influence at the fence value; trimming removes it —
    // the two disagree exactly when the tails matter, which is why
    // robust pipelines report both). Same two-pass shape: exact
    // interpolating percentiles into a |types|-row broadcast, then ONE
    // conditional-count/DECIMAL-fold scan; the kept-row mean divides
    // exact sums by exact counts.
    "agg_trimmed_mean" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val q = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
      val in = col("value") >= col("p05") && col("value") <= col("p95")
      ev.join(broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(in, 1L).otherwise(0L)).as("n_kept"),
          round(sum(when(in, col("value").cast("decimal(28,10)")))
            .cast("double") / sum(when(in, 1L).otherwise(0L)), 4)
            .as("trimmed_mean"),
          round(sum(col("value").cast("decimal(28,10)")).cast("double") /
            count(lit(1)), 4).as("mean"))
        .orderBy("event_type")
    }),

    // Benford first-digit screen over order totals — the classic
    // fraud/fabrication data-quality check: naturally-occurring amounts
    // follow P(d) = log10(1 + 1/d). The first digit comes from the
    // DECIMAL(18,2) string form (deterministic cross-engine, unlike
    // log10-of-double digit math whose floor flips at exact powers of
    // ten); the expected ladder is a FIXED literal table shared with the
    // oracle (in-engine log10 is not bit-pinned). One scan into a
    // ≤9-row aggregate; shares are exact-integer divisions.
    "agg_benford" -> ((s, dir) => {
      val digit = substring(col("o_totalprice").cast("decimal(18,2)")
        .cast("string"), 1, 1).cast("int")
      val tot = Window.partitionBy()
      def ladder(d: org.apache.spark.sql.Column) =
        BenfordP.tail.foldLeft(
          when(d === BenfordP.head._1, BenfordP.head._2)) {
          case (acc, (dd, p)) => acc.when(d === dd, p)
        }.otherwise(0.0)
      Tables.orders(s, dir)
        .select(digit.as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_orders"))
        .withColumn("share",
          round(col("n_orders").cast("double") /
            sum(col("n_orders")).over(tot), 6))
        .withColumn("benford_p", ladder(col("digit")))
        .withColumn("deviation", Num.pin(col("share") - col("benford_p"), 6))
        .select("digit", "n_orders", "share", "benford_p", "deviation")
        .orderBy("digit")
    })
  )

  /** `agg_kmv_jaccard` sketch size — 256 min-hashes per (type, day)
    * partial bounds the standard error of the Jaccard estimate at
    * ~1/√K ≈ 6%. The fixture's cell universe (~1,600 cells per type at
    * sf0.01) EXCEEDS K, so the declared key runs the genuine estimation
    * path — and the oracle still pins it bit-for-bit, because the
    * sketch is a deterministic function of the md5 draw (measured at
    * sf0.01: est 0.2148 vs ≈0.216 exact for click×error). AggSpec
    * additionally pins the estimate against the exact cell Jaccard at
    * K=32 and exactness once K exceeds the pair's union. */
  val KmvK = 256

  /** `agg_bloom_members` geometry (r16, r15 verdict item 2). 66 words ×
    * 63 usable bits = 4,158 bit positions; each of the 4 hash functions
    * derives its position from a disjoint 3-hex-char slice of
    * `md5(user_id)` — 16³ = 4,096 reachable slots, uniform by
    * construction (no modulo bias), and `< 4158` so `slot = pos % 4158`
    * is the identity at the declared geometry (the spec shrinks `words`
    * to force saturation/false positives through the SAME formula).
    * Bits live at 0..62 of each BIGINT word so masks never touch the
    * sign bit — `1 << 63` two's-complement semantics never enters the
    * cross-engine compare. */
  val BloomWords = 66
  val BloomBitsPerWord = 63
  val BloomHashes = 4
  val BloomSlots = 4096

  /** Fixed probe panel: 20 ids inside every fixture's user domain plus
    * 12 far outside it (guaranteed non-members at any SF — the
    * false-positive surface AggSpec pins). */
  val BloomPanel: Seq[Long] = (0L until 20L) ++ (1000000L until 1000012L)

  /** One hash function's bit position: parse 3 hex chars of `hcol` at
    * 1-based `off` as an integer in [0, 4096). The SAME SQL text runs on
    * both engines (`instr`/`substring` are identical in Spark SQL and
    * DuckDB), so the parsed values — and therefore every downstream
    * bit — replay exactly. */
  private[graft] def hex3Sql(hcol: String, off: Int): String =
    graft.functions.HexSql.intAt(hcol, off, 3)

  /** The `agg_bloom_members` plan, parameterized on the word count so
    * AggSpec can force a saturated small filter (guaranteed false
    * positives) through the identical formula. See the query-map entry
    * for the full design note. */
  private[graft] def bloomMembers(s: SparkSession, dir: String, words: Int)
      : DataFrame = {
    val span = words * BloomBitsPerWord
    // `slots` is the FILL denominator: the md5 slices draw from 4,096
    // values, so a filter wider than 4,096 still only ever sets 4,096
    // distinct positions. The oracle SQL hardcodes the 4,096 declared-
    // geometry value — they agree only because the declared words=66
    // gives span 4,158 > 4,096; a shrunk/grown `words` is SPEC-ONLY and
    // must not be promoted to an oracled key without parameterizing the
    // oracle's denominator the same way. Note also that at span < 4,096
    // the `pos % span` fold below is modulo-BIASED (4,096 values onto
    // span slots leaves a 4096-mod-span remainder hitting low slots once
    // more) — harmless for the words=2 saturation forcing AggSpec runs,
    // wrong for any uniformity claim.
    val slots = math.min(BloomSlots, span)
    val ev = Tables.events(s, dir)
    val mday = ev.agg(max(to_date(col("ts"))).as("mday"))
    // "yesterday's ingest": the distinct ids active on the newest day.
    // Persisted (r17 advice): three consumers below (the word build, the
    // n_members datasheet stat, and the panel ground truth) would
    // otherwise each re-plan the events scan + mday join + distinct —
    // one pass over events serves all three, and the persisted relation
    // is bounded by the newest day's distinct-id cardinality. Measured
    // local trade-off: ~0.6 → ~1.0 s warm at sf0.1, because the three
    // re-plans used to run inside CONCURRENT broadcast-exchange threads
    // whose scans overlap on a 2 MB fixture; at corpus scale that
    // "free" overlap is 3× the events I/O, so the single-scan build is
    // the shape that survives 100 TB. Cache lifecycle (r17 advice): the
    // harness's per-query clearCache drops the entry, and within a
    // session CacheManager dedups semantically-equal plans (a repeat
    // persist() of this same build is a no-op, not a second pinned
    // copy), so repeated builder invocations reuse one cached relation.
    val members = ev.join(broadcast(mday), to_date(col("ts")) === col("mday"))
      .select(col("user_id")).distinct().persist()
    def positions(df: DataFrame): DataFrame = df
      .withColumn("h", md5(col("user_id").cast("string")))
      .select(col("user_id"), explode(array(
        (0 until BloomHashes).map(g => expr(hex3Sql("h", 1 + 8 * g))): _*))
        .as("pos"))
      .selectExpr("user_id", s"(pos % $span) div $BloomBitsPerWord AS word_idx",
        s"CAST(power(2, (pos % $span) % $BloomBitsPerWord) AS BIGINT) AS mask")
    // build: OR the member masks per word — the map-side-combined
    // shuffle carries <= `words` rows per partition at any corpus size
    val filterWords = positions(members)
      .groupBy("word_idx").agg(expr("bit_or(mask)").as("word"))
    val stats = members.agg(count(lit(1)).as("n_members"))
    val bits = filterWords
      .agg(sum(expr("bit_count(word)")).cast("long").as("bits_set"))
    val panel = s.range(1)
      .select(explode(array(BloomPanel.map(lit(_)): _*)).as("user_id"))
    // ground truth for the datasheet: membership restricted to the panel
    // FIRST (the persisted member relation joined against the broadcast
    // 32-row panel — the exchange feeding `members` is bounded by the
    // newest day's distinct-id cardinality via its map-side-combined
    // partial distinct, and the panel join itself adds no shuffle), so
    // the later left join broadcasts a <=|panel|-row relation instead
    // of shuffling the member set to serve 32 probes. Panel ids 0..19
    // are chosen to land inside the fixtures' user domain; the code
    // tolerates absentees (they simply report actual=false).
    val actuals = members.join(broadcast(panel), Seq("user_id"))
      .withColumn("m", lit(1)) // members and panel are both key-unique
    positions(panel)
      .join(broadcast(filterWords), Seq("word_idx"), "left")
      .withColumn("hit",
        coalesce(col("word"), lit(0L)).bitwiseAND(col("mask")) === col("mask"))
      .groupBy("user_id")
      .agg((sum(when(col("hit"), 1).otherwise(0)) === BloomHashes)
        .as("bloom_hit"))
      .join(broadcast(actuals), Seq("user_id"), "left")
      .withColumn("actual", coalesce(col("m"), lit(0)) === 1)
      .crossJoin(broadcast(stats))
      .crossJoin(broadcast(bits))
      .withColumn("fill", col("bits_set").cast("double") / slots)
      .select(col("user_id"), col("bloom_hit"), col("actual"),
        (col("bloom_hit") && !col("actual")).as("false_positive"),
        col("n_members"), col("bits_set"),
        Num.pin(col("fill") * col("fill") * col("fill") * col("fill"), 8)
          .as("fpr_est"))
      .orderBy("user_id")
  }

  /** The `agg_kmv_jaccard` plan, parameterized on the sketch size so the
    * spec can force true sketching (universe > K) and pin the error
    * bound. See the query-map entry for the full design note. */
  private[graft] def kmvJaccard(s: SparkSession, dir: String, k: Int)
      : DataFrame = {
    // activity cell = (user, day); the sketch hashes the CELL so overlap
    // reads "shared active user-days", and md5 is the cross-engine hash
    val minK = graft.functions.MinK.minK(k) _
    val cells = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        md5(concat_ws("|", col("user_id"), to_date(col("ts")))).as("h"))
    // daily partial: the K smallest DISTINCT hashes per (type, day) —
    // bounded state a backfill persists and re-merges without rescanning
    // events. r16 (r15 verdict item 1): a map-side MinK Aggregator fold
    // replaces the distinct() + per-(type, day) row_number window, so
    // the exchange carries <= K entries per (partition, type, day) at
    // any corpus size and the separate distinct pass collapses into the
    // bounded buffer (duplicate cells — same user, day, type — dedupe
    // inside it; min-K of a multiset == min-K of its distinct support,
    // so the oracle's DISTINCT + rank replay is unchanged).
    val daily = cells.groupBy("event_type", "day")
      .agg(minK(col("h")).as("sk"))
      .select(col("event_type"), explode(col("sk").getField("hs")).as("h"))
    // union-merge: min-K of the daily min-Ks = the type's global KMV
    // (cells embed the day, so no hash repeats across a type's days);
    // input is already <= K x days rows per type, the same fold keeps
    // the merge exchange <= K per (partition, type) too
    val kmv = daily.groupBy("event_type")
      .agg(minK(col("h")).as("sk"))
      .select(col("event_type"), explode(col("sk").getField("hs")).as("h"))
    val types = kmv.select(col("event_type")).distinct()
    val pairs = types.select(col("event_type").as("ta"))
      .join(types.select(col("event_type").as("tb")), col("ta") < col("tb"))
    // per pair: mark each sketch hash with its side, union, re-rank to
    // the K smallest of A∪B (a KMV of the union), and count the members
    // both sketches contain — every relation here is ≤ K × pairs rows
    val ua = pairs.join(kmv.withColumnRenamed("event_type", "ta"), Seq("ta"))
      .select(col("ta"), col("tb"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val ub = pairs.join(kmv.withColumnRenamed("event_type", "tb"), Seq("tb"))
      .select(col("ta"), col("tb"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val wu = Window.partitionBy("ta", "tb").orderBy("h")
    ua.unionByName(ub)
      .groupBy(col("ta"), col("tb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rn", row_number().over(wu))
      .filter(col("rn") <= k)
      .groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("k_used"),
        sum(col("in_a") * col("in_b")).as("n_shared"))
      .select(col("ta"), col("tb"), col("k_used"), col("n_shared"),
        Num.pin(col("n_shared") / col("k_used"), 6).as("jaccard_est"))
      .orderBy("ta", "tb")
  }

  /** Benford expected first-digit shares, log10(1+1/d) fixed to 6dp so
    * both engines consume the SAME double constants. */
  private[graft] val BenfordP: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> "%.6f".format(math.log10(1.0 + 1.0 / d)).toDouble)

  /** The expected-share CASE ladder as oracle SQL (same constants). */
  private def benfordCaseSql(expr: String): String =
    BenfordP.map { case (d, p) => s"WHEN $expr = $d THEN $p" }
      .mkString("CASE ", " ", " ELSE 0.0 END")

  def oracles: Map[String, String] = Map(
    "agg_geomean" ->
      """SELECT l_returnflag, count(*) AS n,
                round(exp(CAST(sum(CAST(ln(l_extendedprice) AS DECIMAL(28,10)))
                               AS DOUBLE) / count(*)), 4) AS geo_mean,
                round(count(*) / CAST(sum(CAST(1.0 / l_extendedprice
                               AS DECIMAL(28,10))) AS DOUBLE), 4) AS harm_mean
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // the KMV sketch replays EXACTLY: md5 is the same lowercase hex on
    // both engines (lexicographic order = 128-bit hash order), ranking /
    // side-marking / counting are integer window logic, and the one
    // division mirrors the Num.pin chain
    "agg_kmv_jaccard" -> s"""
         WITH cells AS (
           SELECT DISTINCT event_type, CAST(ts AS DATE) AS day,
                  md5(CAST(user_id AS VARCHAR) || '|' ||
                      CAST(CAST(ts AS DATE) AS VARCHAR)) AS h
           FROM events
         ), daily AS (
           SELECT event_type, h FROM (
             SELECT event_type, h,
                    row_number() OVER (PARTITION BY event_type, day
                                       ORDER BY h) AS rn
             FROM cells) WHERE rn <= $KmvK
         ), kmv AS (
           SELECT event_type, h FROM (
             SELECT event_type, h,
                    row_number() OVER (PARTITION BY event_type
                                       ORDER BY h) AS rn
             FROM daily) WHERE rn <= $KmvK
         ), pairs AS (
           SELECT a.event_type AS ta, b.event_type AS tb
           FROM (SELECT DISTINCT event_type FROM kmv) a
           JOIN (SELECT DISTINCT event_type FROM kmv) b
             ON a.event_type < b.event_type
         ), u AS (
           SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
             SELECT p.ta, p.tb, s.h, 1 AS in_a, 0 AS in_b
             FROM pairs p JOIN kmv s ON s.event_type = p.ta
             UNION ALL
             SELECT p.ta, p.tb, s.h, 0 AS in_a, 1 AS in_b
             FROM pairs p JOIN kmv s ON s.event_type = p.tb
           ) GROUP BY 1, 2, 3
         ), topk AS (
           SELECT ta, tb, in_a, in_b FROM (
             SELECT ta, tb, in_a, in_b,
                    row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn
             FROM u) WHERE rn <= $KmvK
         ), agg AS (
           SELECT ta, tb, CAST(count(*) AS BIGINT) AS k_used,
                  CAST(sum(in_a * in_b) AS BIGINT) AS n_shared
           FROM topk GROUP BY ta, tb
         )
         SELECT ta, tb, k_used, n_shared,
                floor((n_shared / k_used) * 1e6 + 0.5) / 1e6 AS jaccard_est
         FROM agg ORDER BY ta, tb""",
    // every bit replays: md5 is identical hex on both engines, the
    // position parse is the SAME instr/substring text, masks are exact
    // powers of two below the sign bit, and bit_or/bit_count/& are
    // engine-portable integer ops; the one double chain (fill^4) is
    // three multiplies + the floor pin
    "agg_bloom_members" -> {
      val span = BloomWords * BloomBitsPerWord
      val posList = (0 until BloomHashes)
        .map(g => hex3Sql("h", 1 + 8 * g)).mkString(", ")
      val panelList = BloomPanel.mkString(", ")
      val fill = s"(CAST(bs.bits_set AS DOUBLE) / $BloomSlots)"
      s"""
         WITH mday AS (SELECT max(CAST(ts AS DATE)) AS d FROM events),
         members AS (
           SELECT DISTINCT user_id FROM events, mday
           WHERE CAST(ts AS DATE) = mday.d
         ), mpos AS (
           SELECT unnest([$posList]) AS pos
           FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM members)
         ), fw AS (
           SELECT (pos % $span) // $BloomBitsPerWord AS word_idx,
                  bit_or(CAST(power(2, (pos % $span) % $BloomBitsPerWord)
                              AS BIGINT)) AS word
           FROM mpos GROUP BY 1
         ), st AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM members),
         bs AS (SELECT CAST(sum(bit_count(word)) AS BIGINT) AS bits_set FROM fw),
         panel AS (SELECT CAST(unnest([$panelList]) AS BIGINT) AS user_id),
         ppos AS (
           SELECT user_id, unnest([$posList]) AS pos
           FROM (SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS h FROM panel)
         ), hits AS (
           SELECT p.user_id,
                  (sum(CASE WHEN (COALESCE(f.word, 0) & p.mask) = p.mask
                            THEN 1 ELSE 0 END) = $BloomHashes) AS bloom_hit
           FROM (SELECT user_id,
                        (pos % $span) // $BloomBitsPerWord AS word_idx,
                        CAST(power(2, (pos % $span) % $BloomBitsPerWord)
                             AS BIGINT) AS mask
                 FROM ppos) p
           LEFT JOIN fw f ON f.word_idx = p.word_idx
           GROUP BY p.user_id
         ), ac AS (
           SELECT h.user_id, h.bloom_hit,
                  (m.user_id IS NOT NULL) AS actual
           FROM hits h LEFT JOIN members m ON m.user_id = h.user_id
         )
         SELECT a.user_id, a.bloom_hit, a.actual,
                (a.bloom_hit AND NOT a.actual) AS false_positive,
                st.n_members, bs.bits_set,
                floor(($fill * $fill * $fill * $fill) * 1e8 + 0.5) / 1e8
                  AS fpr_est
         FROM ac a, st, bs ORDER BY a.user_id"""
    },
    "agg_weighted_median" ->
      """WITH byval AS (
           SELECT l_returnflag, l_extendedprice AS v,
                  sum(CAST(l_quantity AS DECIMAL(28,10))) AS w
           FROM lineitem GROUP BY l_returnflag, l_extendedprice
         ), cum AS (
           SELECT l_returnflag, v,
                  sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                  sum(w) OVER (PARTITION BY l_returnflag) AS tot
           FROM byval
         )
         SELECT l_returnflag, min(v) AS weighted_median,
                CAST(max(tot) AS DOUBLE) AS total_weight
         FROM cum WHERE cum * 2 >= tot
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_mode" ->
      """SELECT user_id, event_type AS mode_event, n FROM (
           SELECT user_id, event_type, count(*) AS n,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY count(*) DESC, event_type) AS rn
           FROM events GROUP BY user_id, event_type
         ) WHERE rn = 1 ORDER BY user_id""",
    "agg_listagg" ->
      """SELECT l_returnflag,
                string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
                count(*) AS n,
                round(min(o_totalprice), 4) AS lo,
                round(max(o_totalprice), 4) AS hi
         FROM orders GROUP BY bucket ORDER BY bucket""",
    "agg_bool" ->
      """SELECT c_mktsegment,
                bool_and(c_acctbal > -1000) AS all_above_min,
                bool_or(c_acctbal > 9000) AS any_rich,
                count(*) AS n
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_bitwise" ->
      """SELECT l_returnflag,
                CAST(bit_and(l_linenumber) AS INT) AS band,
                CAST(bit_or(l_linenumber) AS INT) AS bor,
                CAST(bit_xor(l_linenumber) AS INT) AS bxor
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_group_q1" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_qty,
                CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
                CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
                CAST(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_charge,
                round(avg(l_quantity), 4) AS avg_qty,
                round(avg(l_extendedprice), 4) AS avg_price,
                round(avg(l_discount), 4) AS avg_disc,
                count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "agg_count_distinct" ->
      """SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_customers, count(*) AS n_orders
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_rollup" ->
      """SELECT coalesce(r_name, '(all)') AS r_name,
                coalesce(n_name, '(all)') AS n_name,
                count(*) AS n_customers,
                CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name, n_name""",
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
                coalesce(o_orderpriority, '(all)') AS o_orderpriority,
                count(*) AS n_orders,
                CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sum_price
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus, o_orderpriority""",
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS o_orderstatus,
                coalesce(o_orderpriority, '(all)') AS o_orderpriority,
                count(*) AS n_orders
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus, o_orderpriority""",
    "agg_stats" ->
      """SELECT l_returnflag,
                round(corr(l_quantity, l_extendedprice), 4) AS qp_corr,
                round(covar_samp(l_quantity, l_extendedprice), 2) AS qp_covar,
                round(stddev(l_quantity), 4) AS qty_stddev,
                round(var_samp(l_discount), 6) AS disc_var
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_regression" ->
      """SELECT l_returnflag, slope,
                floor((sy - slope * sx) / n * 1e6 + 0.5) / 1e6 AS intercept,
                CAST(n AS BIGINT) AS n
         FROM (
           SELECT l_returnflag, n, sx, sy,
                  floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                        * 1e6 + 0.5) / 1e6 AS slope
           FROM (
             SELECT l_returnflag,
                    CAST(count(*) AS DOUBLE) AS n,
                    CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sx,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
                    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
                    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sxx
             FROM lineitem GROUP BY l_returnflag
           )
         ) ORDER BY l_returnflag""",
    "agg_corr" ->
      """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                floor((n * sxy - sx * sy) /
                      sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                      * 1e6 + 0.5) / 1e6
                  AS corr_qty_price,
                floor((n * sdy - sd * sy) /
                      sqrt((n * sdd - sd * sd) * (n * syy - sy * sy))
                      * 1e6 + 0.5) / 1e6
                  AS corr_disc_price
         FROM (
           SELECT l_returnflag,
                  CAST(count(*) AS DOUBLE) AS n,
                  CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
                  CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) AS sd,
                  CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
                  CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sdy,
                  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
                  CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS syy,
                  CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS sdd
           FROM lineitem GROUP BY l_returnflag
         ) ORDER BY l_returnflag""",
    // same raw-power-sum discipline as agg_corr: decimal sums, closed-form
    // central moments in double afterwards, term order mirrored exactly
    "agg_skew_kurt" ->
      """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                floor(m3 / (m2 * sqrt(m2)) * 1e6 + 0.5) / 1e6 AS skewness,
                floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) / 1e6 AS kurtosis
         FROM (
           SELECT l_returnflag, n, mu,
                  s2 / n - mu * mu AS m2,
                  s3 / n - 3 * mu * s2 / n + 2 * mu * mu * mu AS m3,
                  s4 / n - 4 * mu * s3 / n + 6 * mu * mu * s2 / n
                    - 3 * mu * mu * mu * mu AS m4
           FROM (
             SELECT l_returnflag, n, s1 / n AS mu, s2, s3, s4, s1
             FROM (
               SELECT l_returnflag,
                      CAST(count(*) AS DOUBLE) AS n,
                      CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS s1,
                      CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS s2,
                      CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS s3,
                      CAST(sum(CAST(l_quantity * l_quantity * l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS s4
               FROM lineitem GROUP BY l_returnflag
             )
           )
         ) ORDER BY l_returnflag""",
    "agg_bitmap_distinct" ->
      """SELECT event_type, CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct
         FROM (
           SELECT event_type, user_id // 32 AS bucket,
                  bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS bits
           FROM events GROUP BY event_type, user_id // 32
         ) GROUP BY event_type ORDER BY event_type""",
    // Cramer's rule terms mirror the Scala det3 cofactor expansion
    // term-for-term so the double arithmetic is bit-identical
    "agg_regression_multi" ->
      """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
                floor((sy*(sxx*sdd - sxd*sxd) - sx*(sxy*sdd - sxd*sdy)
                       + sd*(sxy*sxd - sxx*sdy)) / det * 1e6 + 0.5) / 1e6
                  AS b0,
                floor((n*(sxy*sdd - sxd*sdy) - sy*(sx*sdd - sxd*sd)
                       + sd*(sx*sdy - sxy*sd)) / det * 1e6 + 0.5) / 1e6
                  AS b1,
                floor((n*(sxx*sdy - sxy*sxd) - sx*(sx*sdy - sxy*sd)
                       + sy*(sx*sxd - sxx*sd)) / det * 1e6 + 0.5) / 1e6
                  AS b2
         FROM (
           SELECT *,
                  n*(sxx*sdd - sxd*sxd) - sx*(sx*sdd - sxd*sd)
                    + sd*(sx*sxd - sxx*sd) AS det
           FROM (
             SELECT l_returnflag,
                    CAST(count(*) AS DOUBLE) AS n,
                    CAST(sum(CAST(l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sx,
                    CAST(sum(CAST(l_discount AS DECIMAL(28,10))) AS DOUBLE) AS sd,
                    CAST(sum(CAST(l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sy,
                    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS DOUBLE) AS sxx,
                    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS sxd,
                    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(28,10))) AS DOUBLE) AS sdd,
                    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sxy,
                    CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(28,10))) AS DOUBLE) AS sdy
             FROM lineitem GROUP BY l_returnflag
           )
         ) ORDER BY l_returnflag""",
    "agg_percentiles" ->
      """SELECT o_orderstatus,
                round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
                round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
                count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_equidepth" ->
      """WITH cuts AS (
           SELECT list_transform(
             quantile_cont(o_totalprice, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             c -> round(c, 4)) AS cuts
           FROM orders
         )
         SELECT bucket, count(*) AS n,
                round(min(o_totalprice), 4) AS lo,
                round(max(o_totalprice), 4) AS hi
         FROM (
           SELECT o_totalprice,
                  CAST(len(list_filter((SELECT cuts FROM cuts),
                                       c -> o_totalprice > c)) AS INT) AS bucket
           FROM orders
         ) GROUP BY bucket ORDER BY bucket""",
    "agg_pivot" ->
      """SELECT o_orderpriority,
                count(*) FILTER (o_orderstatus = 'F') AS n_f,
                count(*) FILTER (o_orderstatus = 'O') AS n_o,
                count(*) FILTER (o_orderstatus = 'P') AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "agg_arg_minmax" ->
      """SELECT c_mktsegment,
                first(c_name ORDER BY c_acctbal DESC, c_custkey DESC) AS top_name,
                first(c_name ORDER BY c_acctbal ASC, c_custkey ASC) AS bottom_name,
                max(c_acctbal) AS max_bal,
                min(c_acctbal) AS min_bal
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "agg_custom_wavg" ->
      """SELECT l_returnflag,
                round(sum(l_extendedprice * l_discount) / sum(l_discount), 4) AS wavg_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // grid-collapse C/D pair counts as exact DECIMAL folds; tau-b is
    // one fixed double chain with per-factor sqrt
    "agg_kendall_tau" ->
      """WITH cells AS MATERIALIZED (
           SELECT l_quantity AS x, l_discount AS y,
                  CAST(count(*) AS BIGINT) AS c
           FROM lineitem GROUP BY 1, 2
         ), pr AS (
           SELECT CAST(sum(CASE WHEN a.y < b.y
                    THEN CAST(a.c AS DECIMAL(19,0)) * b.c
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS cc,
                  CAST(sum(CASE WHEN a.y > b.y
                    THEN CAST(a.c AS DECIMAL(19,0)) * b.c
                    ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS dd
           FROM cells a JOIN cells b ON a.x < b.x
         ), tx AS (
           SELECT CAST(sum(CAST(t AS DECIMAL(19,0)) * (t - 1)) AS DOUBLE)
                    AS n1d
           FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY x)
         ), ty AS (
           SELECT CAST(sum(CAST(t AS DECIMAL(19,0)) * (t - 1)) AS DOUBLE)
                    AS n2d
           FROM (SELECT CAST(sum(c) AS BIGINT) AS t FROM cells GROUP BY y)
         ), nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
         SELECT n, CAST(cc AS BIGINT) AS n_concordant,
                CAST(dd AS BIGINT) AS n_discordant,
                floor(2.0 * (CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE))
                  / (sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - n1d)
                     * sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) - n2d))
                  * 1e6 + 0.5) / 1e6 AS tau_b
         FROM pr CROSS JOIN nn CROSS JOIN tx CROSS JOIN ty""",
    // strata rates + pooled gap from exact integer sums; the reversal
    // flag compares the RAW double product on both engines
    "agg_simpson" ->
      """WITH b AS (
           SELECT CAST(year(o_orderdate) AS INT) AS yr,
                  CASE WHEN substring(o_orderpriority, 1, 1) <= '2'
                    THEN 1 ELSE 0 END AS t,
                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
           FROM orders
         ), strata AS (
           SELECT yr, CAST(sum(t) AS BIGINT) AS n_t,
                  CAST(sum(1 - t) AS BIGINT) AS n_c,
                  CAST(sum(t * y) AS BIGINT) AS f_t,
                  CAST(sum((1 - t) * y) AS BIGINT) AS f_c
           FROM b GROUP BY yr
           HAVING sum(t) > 0 AND sum(1 - t) > 0
         ), pooled AS (
           SELECT CAST(sum(t * y) AS DOUBLE) / sum(t)
                  - CAST(sum((1 - t) * y) AS DOUBLE) / sum(1 - t)
                    AS pooled_raw
           FROM b
         )
         SELECT yr, n_t, n_c,
                floor(CAST(f_t AS DOUBLE) / n_t * 1e6 + 0.5) / 1e6 AS rate_t,
                floor(CAST(f_c AS DOUBLE) / n_c * 1e6 + 0.5) / 1e6 AS rate_c,
                floor((CAST(f_t AS DOUBLE) / n_t
                  - CAST(f_c AS DOUBLE) / n_c) * 1e6 + 0.5) / 1e6 AS diff,
                floor(pooled_raw * 1e6 + 0.5) / 1e6 AS pooled_diff,
                (CAST(f_t AS DOUBLE) / n_t - CAST(f_c AS DOUBLE) / n_c)
                  * pooled_raw < 0 AS reversed
         FROM strata CROSS JOIN pooled
         ORDER BY yr""",
    // marginals/expected/contrib replay the Spark windows over the same
    // bounded cell relation; chi2 sums the pre-rounded contribs as DECIMAL
    "agg_entropy_group" ->
      """SELECT status, n_orders, n_cats,
                floor((ln(CAST(n_orders AS DOUBLE)) - slc / n_orders)
                      / ln(2.0) * 1e6 + 0.5) / 1e6 AS entropy_bits
         FROM (
           SELECT status, CAST(sum(c) AS BIGINT) AS n_orders,
                  CAST(count(*) AS BIGINT) AS n_cats,
                  CAST(sum(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,10)))
                       AS DOUBLE) AS slc
           FROM (
             SELECT o_orderstatus AS status, o_orderpriority AS priority,
                    count(*) AS c
             FROM orders GROUP BY 1, 2
           ) GROUP BY status
         ) ORDER BY status""",
    // quantile_cont matches Spark's interpolating percentile(); same
    // pinned arithmetic, same IQR > 0 exclusion
    "agg_bowley_skew" ->
      """SELECT event_type, n,
                floor(q1r * 1e4 + 0.5) / 1e4 AS q1,
                floor(medr * 1e4 + 0.5) / 1e4 AS median,
                floor(q3r * 1e4 + 0.5) / 1e4 AS q3,
                floor((q3r - q1r) * 1e4 + 0.5) / 1e4 AS iqr,
                floor((q3r + q1r - 2.0 * medr) / (q3r - q1r) * 1e6 + 0.5) / 1e6
                  AS bowley
         FROM (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                  quantile_cont(value, 0.25) AS q1r,
                  quantile_cont(value, 0.5) AS medr,
                  quantile_cont(value, 0.75) AS q3r
           FROM events GROUP BY event_type
         ) WHERE q3r > q1r ORDER BY event_type""",
    // midrank maps over the distinct-value domains; Pearson on the
    // integer 2-midranks via per-factor DECIMAL(19,0) product sums
    "agg_spearman" ->
      """WITH rx AS (
           SELECT l_quantity,
                  2 * (CAST(sum(t) OVER (ORDER BY l_quantity
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) - t) + t + 1 AS mx
           FROM (SELECT l_quantity, CAST(count(*) AS BIGINT) AS t
                 FROM lineitem GROUP BY l_quantity)
         ), ry AS (
           SELECT l_discount,
                  2 * (CAST(sum(t) OVER (ORDER BY l_discount
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) - t) + t + 1 AS my
           FROM (SELECT l_discount, CAST(count(*) AS BIGINT) AS t
                 FROM lineitem GROUP BY l_discount)
         ), j AS (
           SELECT mx, my FROM lineitem l
           JOIN rx ON rx.l_quantity = l.l_quantity
           JOIN ry ON ry.l_discount = l.l_discount
         ), st AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
                  sum(CAST(mx AS DECIMAL(19,0))) AS sx,
                  sum(CAST(my AS DECIMAL(19,0))) AS sy,
                  sum(CAST(mx AS DECIMAL(19,0)) * CAST(my AS DECIMAL(19,0))) AS sxy,
                  sum(CAST(mx AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0))) AS sxx,
                  sum(CAST(my AS DECIMAL(19,0)) * CAST(my AS DECIMAL(19,0))) AS syy
           FROM j
         )
         SELECT n,
                floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                      * 1e6 + 0.5) / 1e6 AS spearman_rho
         FROM st""",
    // dense grid (empty cells contribute their expected mass), 6dp
    // floor-chain pins on expected/contrib, DECIMAL fold, one sqrt
    "agg_cramers_v" ->
      """WITH obs AS (
           SELECT lang, source, CAST(count(*) AS BIGINT) AS obs
           FROM documents GROUP BY 1, 2
         ), g AS (
           SELECT l.lang, s.source, coalesce(o.obs, 0) AS obs
           FROM (SELECT DISTINCT lang FROM documents) l
           CROSS JOIN (SELECT DISTINCT source FROM documents) s
           LEFT JOIN obs o ON o.lang = l.lang AND o.source = s.source
         ), t AS (
           SELECT obs,
                  CAST(sum(obs) OVER (PARTITION BY lang) AS BIGINT) AS row_tot,
                  CAST(sum(obs) OVER (PARTITION BY source) AS BIGINT) AS col_tot,
                  CAST(sum(obs) OVER () AS BIGINT) AS n
           FROM g
         ), c AS (
           SELECT n, obs,
                  floor(CAST(row_tot AS DOUBLE) * col_tot / n * 1e6 + 0.5) / 1e6
                    AS expected
           FROM t
         ), x AS (
           SELECT n,
                  floor((obs - expected) * (obs - expected) / expected
                        * 1e6 + 0.5) / 1e6 AS contrib
           FROM c
         ), ag AS (
           SELECT max(n) AS n,
                  CAST(sum(CAST(contrib AS DECIMAL(28,10))) AS DOUBLE) AS x2
           FROM x
         ), rc AS (
           SELECT CAST(count(DISTINCT lang) AS BIGINT) AS r,
                  CAST(count(DISTINCT source) AS BIGINT) AS c
           FROM documents
         )
         SELECT ag.n, rc.r, rc.c,
                floor(x2 * 1e6 + 0.5) / 1e6 AS chi2,
                floor(sqrt(x2 / (ag.n * least(rc.r - 1, rc.c - 1)))
                      * 1e6 + 0.5) / 1e6 AS cramers_v
         FROM ag CROSS JOIN rc""",
    "agg_chi2" ->
      """WITH cells AS (
           SELECT o_orderstatus AS status, o_orderpriority AS priority,
                  count(*) AS obs
           FROM orders GROUP BY 1, 2
         ), t AS (
           SELECT status, priority, CAST(obs AS BIGINT) AS obs,
                  CAST(sum(obs) OVER (PARTITION BY status) AS BIGINT) AS row_tot,
                  CAST(sum(obs) OVER (PARTITION BY priority) AS BIGINT) AS col_tot,
                  CAST(sum(obs) OVER () AS BIGINT) AS n
           FROM cells
         ), e AS (
           SELECT *, round(CAST(row_tot AS DOUBLE) * col_tot / n, 6) AS expected
           FROM t
         ), c AS (
           SELECT *, round((obs - expected) * (obs - expected) / expected, 6) AS contrib
           FROM e
         )
         SELECT status, priority, obs, row_tot, col_tot, expected, contrib,
                CAST(sum(CAST(contrib AS DECIMAL(28,10))) OVER () AS DOUBLE) AS chi2
         FROM c ORDER BY status, priority""",
    // the deviation median consumes the UNROUNDED per-type median, same
    // as the Spark side; quantile_cont == Spark's interpolating percentile
    "agg_mad" ->
      """WITH med AS (
           SELECT event_type, quantile_cont(value, 0.5) AS med, count(*) AS n
           FROM events GROUP BY event_type
         )
         SELECT e.event_type, round(min(m.med), 4) AS med, min(m.n) AS n,
                round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad
         FROM events e JOIN med m USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    // the plain per-group cumulative window replays the range-partition +
    // offset rank assignment; // is DuckDB's integer division (Spark DIV)
    "agg_gini" ->
      """WITH c AS (
           SELECT o_orderpriority AS g, o_totalprice AS v, count(*) AS c
           FROM orders GROUP BY 1, 2
         ), r AS (
           SELECT g, v, c,
                  coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           FROM c
         ), s AS (
           SELECT g, CAST(sum(c) AS BIGINT) AS n,
                  sum(CAST(v AS DECIMAL(18,2)) *
                      CAST(c AS DECIMAL(18,0))) AS s1,
                  sum(CAST(v AS DECIMAL(18,2)) *
                      CAST(c * (cb + 1) + (c * (c - 1)) // 2
                           AS DECIMAL(18,0))) AS s2
           FROM r GROUP BY g
         )
         SELECT g AS priority, n, round(CAST(s1 AS DOUBLE), 2) AS total,
                floor((2.0 * CAST(s2 AS DOUBLE) / (n * CAST(s1 AS DOUBLE))
                       - (n + 1.0) / n) * 1e6 + 0.5) / 1e6 AS gini
         FROM s ORDER BY priority""",
    // ln once per distinct value; x·ln x terms pre-round at 6dp and fold
    // as c×DECIMAL; every window is over the ≤5-row group relation
    "agg_theil" ->
      """WITH cells AS (
           SELECT o_orderpriority AS g, o_totalprice AS v, count(*) AS c
           FROM orders GROUP BY 1, 2
         ), grp AS (
           SELECT g, CAST(sum(c) AS BIGINT) AS n,
                  sum(CAST(v AS DECIMAL(18,2)) * CAST(c AS DECIMAL(18,0))) AS s,
                  sum(c * CAST(floor(v * (floor(ln(v) * 1e10 + 0.5) / 1e10)
                        * 1e6 + 0.5) / 1e6 AS DECIMAL(28,6))) AS slvx
           FROM cells GROUP BY g
         ), t AS (
           SELECT g, n, s, slvx,
                  CAST(sum(n) OVER () AS BIGINT) AS nt,
                  sum(s) OVER () AS st,
                  sum(slvx) OVER () AS slvxt
           FROM grp
         ), u AS (
           SELECT g, n, s, slvx, nt, st, slvxt,
                  CAST(s AS DOUBLE) / CAST(st AS DOUBLE) AS w,
                  CAST(n AS DOUBLE) / nt AS r,
                  CAST(s AS DOUBLE) / n AS mu,
                  CAST(st AS DOUBLE) / nt AS mut
           FROM t
         ), v2 AS (
           SELECT u.*,
                  floor(w * ((floor(ln(w) * 1e10 + 0.5) / 1e10) -
                             (floor(ln(r) * 1e10 + 0.5) / 1e10))
                        * 1e10 + 0.5) / 1e10 AS tb_term
           FROM u
         )
         SELECT g AS priority, n, round(CAST(s AS DOUBLE), 2) AS total,
                round(mu, 6) AS mean,
                floor(w * 1e6 + 0.5) / 1e6 AS value_share,
                floor((CAST(slvx AS DOUBLE) / (n * mu)
                       - floor(ln(mu) * 1e10 + 0.5) / 1e10)
                      * 1e6 + 0.5) / 1e6 AS theil_within,
                floor(CAST(sum(CAST(tb_term AS DECIMAL(28,10))) OVER ()
                           AS DOUBLE) * 1e6 + 0.5) / 1e6 AS theil_between,
                floor((CAST(slvxt AS DOUBLE) / (nt * mut)
                       - floor(ln(mut) * 1e10 + 0.5) / 1e10)
                      * 1e6 + 0.5) / 1e6 AS theil_total
         FROM v2 ORDER BY priority""",
    // the plain ascending cumulative windows replay the range-partition +
    // offset cumsums; ceil-DIV (// is DuckDB integer division) keeps tie
    // blocks wholly inside one decile, as in ml_lift_gain
    "agg_lorenz" ->
      """WITH byval AS (
           SELECT v, c, CAST(v AS DECIMAL(18,2)) * CAST(c AS DECIMAL(18,0)) AS sv
           FROM (SELECT o_totalprice AS v, count(*) AS c FROM orders GROUP BY 1)
         ), cum AS (
           SELECT v, c, sv,
                  sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cb,
                  sum(sv) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cv,
                  sum(c) OVER () AS nt
           FROM byval
         ), g AS (
           SELECT least(9, (10 * cb + nt - 1) // nt - 1) AS decile,
                  CAST(sum(c) AS BIGINT) AS n_orders,
                  round(CAST(sum(sv) AS DOUBLE), 2) AS value_total,
                  max(cb) AS cum_orders, max(cv) AS cumv
           FROM cum GROUP BY 1
         )
         SELECT CAST(decile AS BIGINT) AS decile, n_orders, value_total,
                floor(CAST(cum_orders AS DOUBLE) /
                      CAST(max(cum_orders) OVER () AS DOUBLE) * 1e6 + 0.5)
                  / 1e6 AS cum_pop_share,
                floor(CAST(cumv AS DOUBLE) /
                      CAST(max(cumv) OVER () AS DOUBLE) * 1e6 + 0.5)
                  / 1e6 AS cum_value_share
         FROM g ORDER BY decile""",
    // the interval chain mirrors the Spark expression association
    // exactly; z is CAST to DOUBLE so z*z folds to the same constant
    "agg_wilson" ->
      """WITH a AS (
           SELECT event_type, count(*) AS n,
                  CAST(sum(CASE WHEN value > 50.0 THEN 1 ELSE 0 END)
                       AS BIGINT) AS x
           FROM events GROUP BY event_type
         ), b AS (
           SELECT event_type, n, x,
                  CAST(x AS DOUBLE) / n AS p,
                  CAST(n AS DOUBLE) AS nn,
                  CAST(1.96 AS DOUBLE) AS z
           FROM a
         ), c AS (
           SELECT *,
                  (p + z * z / (2.0 * nn)) / (1.0 + z * z / nn) AS center,
                  z * sqrt(p * (1.0 - p) / nn + z * z / (4.0 * nn * nn))
                    / (1.0 + z * z / nn) AS half
           FROM b
         )
         SELECT event_type, n, x, round(p, 6) AS rate,
                round(center - half, 6) AS wilson_lo,
                round(center + half, 6) AS wilson_hi
         FROM c ORDER BY event_type""",
    "agg_assoc_rules" ->
      """WITH ut AS (
           SELECT DISTINCT user_id, event_type FROM events
         ), totals AS (
           SELECT count(DISTINCT user_id) AS n_users FROM ut
         ), singles AS (
           SELECT event_type, count(*) AS cnt FROM ut GROUP BY event_type
         ), pairs AS (
           SELECT a.event_type AS a, b.event_type AS b, count(*) AS n_ab
           FROM ut a JOIN ut b
             ON a.user_id = b.user_id AND a.event_type <> b.event_type
           GROUP BY 1, 2
         )
         SELECT p.a, p.b, p.n_ab,
                round(CAST(p.n_ab AS DOUBLE) / t.n_users, 6) AS support,
                round(CAST(p.n_ab AS DOUBLE) / sa.cnt, 6) AS confidence,
                round(CAST(p.n_ab AS DOUBLE) * t.n_users /
                      (CAST(sa.cnt AS DOUBLE) * sb.cnt), 6) AS lift
         FROM pairs p
         JOIN singles sa ON sa.event_type = p.a
         JOIN singles sb ON sb.event_type = p.b
         CROSS JOIN totals t
         ORDER BY a, b""",
    // Spark decimal→double goes through the string form (the ts_resample
    // idiom) so `total` and the share denominators agree bit-for-bit
    "agg_hhi" ->
      """WITH spend AS (
           SELECT o_orderpriority AS priority, o_custkey,
                  sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
           FROM orders GROUP BY 1, 2
         )
         SELECT priority, count(*) AS n_custs,
                round(CAST(CAST(sum(sp) AS VARCHAR) AS DOUBLE), 2) AS total,
                round(CAST(sum(CAST(round(CAST(CAST(sp AS VARCHAR) AS DOUBLE)
                                          * CAST(CAST(sp AS VARCHAR) AS DOUBLE), 4)
                                    AS DECIMAL(38,4))) AS DOUBLE)
                      / (CAST(CAST(sum(sp) AS VARCHAR) AS DOUBLE)
                         * CAST(CAST(sum(sp) AS VARCHAR) AS DOUBLE))
                      * 10000.0, 4) AS hhi
         FROM spend GROUP BY priority ORDER BY priority""",
    // fences/clamps consume the UNROUNDED exact quantiles, same as Spark
    "agg_tukey_outliers" ->
      """WITH q AS (
           SELECT event_type,
                  quantile_cont(value, 0.25) AS q1,
                  quantile_cont(value, 0.75) AS q3,
                  count(*) AS n
           FROM events GROUP BY event_type
         )
         SELECT e.event_type, min(q.n) AS n,
                round(min(q.q1), 4) AS q1, round(min(q.q3), 4) AS q3,
                CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                              OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                round(CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
                              OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
                              THEN 1 ELSE 0 END) AS DOUBLE) / min(q.n), 6)
                  AS outlier_rate
         FROM events e JOIN q USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    "agg_winsorized" ->
      """WITH q AS (
           SELECT event_type,
                  quantile_cont(value, 0.05) AS p05,
                  quantile_cont(value, 0.95) AS p95
           FROM events GROUP BY event_type
         )
         SELECT e.event_type, count(*) AS n,
                round(CAST(sum(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE)
                      / count(*), 4) AS mean,
                round(CAST(sum(CAST(greatest(least(e.value, q.p95), q.p05)
                                    AS DECIMAL(28,10))) AS DOUBLE)
                      / count(*), 4) AS winsorized_mean,
                round(min(q.p05), 4) AS p05,
                round(min(q.p95), 4) AS p95
         FROM events e JOIN q USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    // same quantile_cont fences as agg_winsorized; the kept-row filter
    // replays as the identical double compares against those fences
    "agg_trimmed_mean" ->
      """WITH q AS (
           SELECT event_type,
                  quantile_cont(value, 0.05) AS p05,
                  quantile_cont(value, 0.95) AS p95
           FROM events GROUP BY event_type
         )
         SELECT e.event_type, count(*) AS n,
                CAST(sum(CASE WHEN e.value >= q.p05 AND e.value <= q.p95
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                round(CAST(sum(CASE WHEN e.value >= q.p05 AND e.value <= q.p95
                                    THEN CAST(e.value AS DECIMAL(28,10)) END)
                           AS DOUBLE) /
                      sum(CASE WHEN e.value >= q.p05 AND e.value <= q.p95
                               THEN 1 ELSE 0 END), 4) AS trimmed_mean,
                round(CAST(sum(CAST(e.value AS DECIMAL(28,10))) AS DOUBLE)
                      / count(*), 4) AS mean
         FROM events e JOIN q USING (event_type)
         GROUP BY e.event_type ORDER BY e.event_type""",
    // first digit off the DECIMAL(18,2) string form; the expected ladder
    // interpolates the same 6dp constants the Spark plan uses
    "agg_benford" ->
      s"""WITH d AS (
           SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                                      AS VARCHAR), 1, 1) AS INT) AS digit
           FROM orders
         ), c AS (
           SELECT digit, count(*) AS n_orders FROM d GROUP BY digit
         )
         SELECT digit, n_orders,
                round(CAST(n_orders AS DOUBLE) / sum(n_orders) OVER (), 6)
                  AS share,
                CAST(${benfordCaseSql("digit")} AS DOUBLE) AS benford_p,
                floor((round(CAST(n_orders AS DOUBLE) / sum(n_orders) OVER (), 6)
                       - CAST(${benfordCaseSql("digit")} AS DOUBLE))
                      * 1e6 + 0.5) / 1e6
                  AS deviation
         FROM c ORDER BY digit"""
  )
}
