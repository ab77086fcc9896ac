package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.operators.{AggOps, JoinOps, RelationalOps, StreamingOps, WindowOps}

/** Physical-plan assertions (SURVEY §4.2 / the scale contract): pushdown
  * reaches the Parquet scan, dims broadcast, top-k never global-sorts.
  * These are the properties that matter at 100 TB and are invisible to the
  * row-level oracle, so they're pinned against `.explain` output here.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("scan_parquet_project pushes filter and projection into the scan") {
    val plan = planOf(RelationalOps.queries("scan_parquet_project")(spark, SfDir))
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$plan")
    // projection pruning: the read schema must not include unused columns
    assert(!plan.contains("l_extendedprice"), s"column pruning failed:\n$plan")
  }

  test("join_broadcast plans BroadcastHashJoin for all three dims") {
    val plan = planOf(JoinOps.queries("join_broadcast")(spark, SfDir))
    // formatted AQE output repeats nodes (tree + details), so count >= 3
    val n = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(n >= 3, s"expected 3 broadcast joins, got $n:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"dim join degraded to SMJ:\n$plan")
  }

  test("sort_multi_limit plans TakeOrderedAndProject (no global sort)") {
    val plan = planOf(RelationalOps.queries("sort_multi_limit")(spark, SfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("agg_group_q1 plans partial (map-side) aggregation before the shuffle") {
    val plan = planOf(AggOps.queries("agg_group_q1")(spark, SfDir))
    assert(plan.contains("HashAggregate"), plan)
    // partial + final pairs around one exchange
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("join_asof shuffles exactly once on user_id (plus the final order-by)") {
    val plan = JoinOps.queries("join_asof")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    val rangeEx = "Exchange rangepartitioning".r.findAllIn(plan).length
    assert(hashEx === 1, s"as-of join should shuffle once:\n$plan")
    assert(rangeEx === 1, plan)
    assert(plan.contains("PushedFilters: [In(event_type"), s"type filter not pushed:\n$plan")
  }

  test("pipe_e2e chains dedup→near-dedup→decontam→gate→split→accounting with a pinned exchange census") {
    // the flagship composition claim: the stages chain into one plan
    // with no materialization barriers between them (clusterLabels'
    // internal CC checkpoint is that operator's own discipline). The
    // census counts PHYSICAL tree nodes (not explain-string mentions,
    // which double-print cached subplans): dedup groupBy(text); the
    // doc_id-keyed semi (near-dedup reps) and anti (decontam hits)
    // join sides; the decontam groupBy(doc_id); the final
    // groupBy(lang, split); the 15-row presentation sort. Every added
    // exchange carries 8-byte doc_id keys or aggregated rows — never
    // text payloads beyond the dedup groupBy.
    val df = graft.operators.PipelineOps.queries("pipe_e2e")(spark, SfDir)
    // sparkPlan predates EnsureRequirements (no exchanges yet); under
    // AQE the executedPlan wraps the exchanged plan, so census the
    // adaptive node's initial plan
    val physical = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val shuffles = physical.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    val range = shuffles.count(
      _.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning])
    assert(range === 1, s"expected only the final-order range exchange, got $range")
    assert(shuffles.length <= 9,
      s"pipe_e2e exchange census grew past the r11 budget: ${shuffles.length}\n" +
        df.queryExecution.explainString(ExplainMode.fromString("simple")))
  }

  test("dedup_near verifies Jaccard inside broadcast joins (no wide shuffle)") {
    val plan = graft.operators.DedupOps.queries("dedup_near")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("sorted_jaccard"), plan)
    assert(!plan.contains("SortMergeJoin"), s"candidate attach degraded to SMJ:\n$plan")
  }

  test("dedup_prefix candidate join is shuffled-hash on the prefix token, verify in broadcast joins") {
    // the scale contract: prefix-token candidate generation must shuffle
    // (both sides are corpus-derived — a broadcast there caps the design
    // at driver memory), while the array attach for the verify stays
    // broadcast; the hint silently degrades if its shape breaks, so pin it
    val plan = graft.operators.DedupOps.queries("dedup_prefix")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("ShuffledHashJoin"), s"candidate join lost the hash hint:\n$plan")
    assert(plan.contains("sorted_jaccard"), plan)
    assert(!plan.contains("SortMergeJoin"), s"a join degraded to SMJ:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("pipe_chunk is a shuffle-free generator scan (plus the final order-by)") {
    val plan = graft.operators.PipelineOps.queries("pipe_chunk")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty,
      s"chunking must not shuffle:\n$plan")
    assert(plan.contains("Generate"), s"expected a generator (posexplode):\n$plan")
  }

  test("pipe_pack shuffles exactly once on the language key") {
    val plan = graft.operators.PipelineOps.queries("pipe_pack")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1, s"packing should shuffle once:\n$plan")
  }

  test("win_distinct_count reuses one shuffle for both windows") {
    val plan = graft.operators.WindowOps.queries("win_distinct_count")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1,
      s"both windows partition on l_orderkey — one exchange expected:\n$plan")
  }

  test("join_range_bucket plans an equi-join on the bucket key, never a nested loop") {
    val plan = JoinOps.queries("join_range_bucket")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join degraded to a quadratic plan:\n$plan")
    assert(plan.contains("Join") || plan.contains("HashJoin"),
      s"expected an equi join on the bucket key:\n$plan")
  }

  test("join_interval plans an equi-join on the bucket key, never a " +
      "nested loop (r15: interval × interval overlap)") {
    val plan = JoinOps.queries("join_interval")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval-overlap join degraded to a quadratic plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi join on the bucket key:\n$plan")
  }

  test("agg_kmv_jaccard: min-K partial is a map-side Aggregator fold; no " +
      "window consumes the corpus-scale cell relation (r16)") {
    val df = AggOps.queries("agg_kmv_jaccard")(spark, SfDir)
    // every remaining WindowExec must partition on the pair key — i.e.
    // run over the K×pairs-bounded union relation, never the raw cells
    val winParts = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.flatMap(_.references.map(_.name).toSeq).toSet
    }
    assert(winParts.nonEmpty && winParts.forall(_ == Set("ta", "tb")),
      s"a window consumes a non-pair-bounded relation: $winParts")
    // and the partial itself is the MinK Aggregator (ObjectHashAggregate
    // partial mode), so the exchange carries <= K entries per
    // (partition, group) — not a distinct + sort of the full cell set
    val objAgg = df.queryExecution.sparkPlan.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(objAgg.nonEmpty,
      "MinK Aggregator partial (ObjectHashAggregateExec) missing from the plan")
  }

  test("ts_dtw: one exchange total — the row-index/sufficient-sum windows, " +
      "the PAA aggregate, and the segment pivot all reuse the user_id " +
      "partitioning; top-k is TakeOrderedAndProject (r16)") {
    val plan = StreamingOps.queries("ts_dtw")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex === 1,
      s"ts_dtw should shuffle once on user_id, found $ex exchanges:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k degraded to a global sort:\n$plan")
  }

  test("agg_bloom_members: every join broadcasts a bounded side — no " +
      "corpus-scale shuffle join anywhere in build or probe (r16)") {
    val plan = planOf(AggOps.queries("agg_bloom_members")(spark, SfDir))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"a bounded relation (panel/filter/actuals/scalars) rode a shuffle " +
        s"join — at 100 TB that shuffles the corpus to serve 32 probes:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ts_anomaly broadcasts the per-user model onto the stream") {
    val plan = StreamingOps.queries("ts_anomaly")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("BroadcastHashJoin"),
      s"model join should be map-side:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  /** The pid-offset discipline's structural invariant: any WindowExec
    * with NO partition spec (the single-task collapse at scale) may only
    * ever consume the #partitions-row offsets relation — recognizable
    * because its sort key is exactly `pid`. A window ordering on a data
    * column with no partition spec means the corpus/vocab relation is
    * being serialized through one task. */
  private def unpartitionedWindowKeys(
      df: org.apache.spark.sql.DataFrame): Seq[Set[String]] =
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty =>
        w.orderSpec.flatMap(_.references.map(_.name).toSeq).toSet
    }

  /** r16 (r15 verdict item 5): the pid-offset sweep generalized to the
    * FULL declared surface. Every key whose physical plan contains a
    * WindowExec with an empty partition spec over anything other than
    * the #partitions-row `pid` offsets relation must be documented here
    * with WHY its input is bounded at any corpus size — so a future key
    * cannot reintroduce a corpus-scale global sort unnoticed. The
    * tightness check below also fails when an entry goes stale. */
  private val boundedGlobalWindows: Map[String, String] = Map(
    // calendar-bounded series: windows run over the date_trunc-hourly
    // (or daily) AGGREGATE of the fixture's fixed time span — rows are
    // bounded by calendar hours, never by event count
    "ts_bollinger" -> "24h rolling bands over the calendar-bounded hourly series",
    "ts_correlogram" -> "lag windows over the calendar-bounded hourly series",
    "ts_pacf" -> "nests ts_correlogram's hourly series",
    "ts_decompose" -> "trend/seasonal windows over the calendar-bounded hourly series",
    "ts_resid_anomaly" -> "nests ts_decompose's hourly series; median over its residuals",
    "ts_hurst" -> "R/S chunks over the calendar-bounded hourly series + <=4-row m-table",
    "ts_ljung_box" -> "hourly series + the <=12-row cumulative lag table",
    "ts_periodogram" -> "row index over the calendar-bounded hourly series + 8-row spectrum",
    "win_rolling_corr" -> "paired rolling stats over the calendar-bounded hourly series",
    // pinned-granularity value domains: cumulative windows run over the
    // DISTINCT-value relation of a rounded/low-cardinality domain (the
    // ml_auc exact-rank discipline), not over raw rows
    "ml_auc" -> "cumulative ranks over the distinct rounded-score domain",
    "ml_mann_whitney" -> "midranks over the distinct rounded-score domain",
    "ml_lift_gain" -> "cumulative gains over the distinct-score relation + <=10 deciles",
    "ml_pr_curve" -> "PR points = one row per distinct threshold score",
    "ml_roc_curve" -> "ROC points = one row per distinct threshold score",
    "ml_youden_j" -> "J argmax over the distinct-threshold ROC relation",
    "ml_ks_test" -> "CDF gap over the distinct n_chars value domain",
    "agg_spearman" -> "midranks over the 50-value l_quantity / 11-value l_discount domains",
    // fixed-size statistic tables: the window input is a <=constant-row
    // aggregate (bins, digits, deciles, replicates, probes, groups)
    "agg_benford" -> "9-row first-digit table",
    "agg_chi2" -> "status x priority contingency cells",
    "agg_cramers_v" -> "lang x source contingency cells",
    "agg_theil" -> "per-group share terms over the bounded group set",
    "agg_lorenz" -> ("<= WmBuckets bucket cells (least()-capped bucket " +
      "map) + the <= 10-row decile table"),
    "ml_bootstrap_ci" -> "64 replicate means (B is a compile-time constant)",
    "ml_brier" -> "decile calibration bins",
    "ml_mrr" -> "rank windows over the one-probe LIMIT-10 candidate relation",
    "ml_ndcg" -> "rank windows over the one-probe LIMIT-10 candidate relation",
    "ml_parity_gap" -> "|groups|-row rate table",
    "ml_psi" -> "10 fixed score bins",
    // datasheet totals: one total-share window over a report bounded by
    // |sources|/|langs|/|stages|/|buckets| — cluster-config-and-schema
    // bounded, never row-count bounded
    "pipe_dedup_report" -> "per-source dedup datasheet (|sources| rows)",
    "pipe_near_dedup_report" -> "per-source near-dup datasheet (|sources| rows)",
    "pipe_substring_report" -> "<=11-row duplicated-fraction decile histogram",
    "pipe_filter_report" -> "ordered |stages|-row funnel",
    "pipe_mix_temperature" -> "|langs|-row mixture weights",
    "pipe_unimax" -> "|langs|-row UniMax budget table",
    "pipe_repeat_factors" -> "|sources|-row repeat-factor table",
    "pipe_split_audit" -> "|buckets|-row split audit",
    // misc bounded relations
    "dedup_chunk" -> "per-doc FastCDC chunk spine: window over <=chunks-per-doc offsets",
    "ann_hybrid_rerank" -> "rerank window over the k-bounded ANN candidate set",
    "graph_component_sizes" -> "component-size histogram (<=|components| rows)",
    "graph_hits" -> "per-iteration normalization over the |nodes|-bounded score table")

  /** r18 cont. (the BNLJ structural discipline applied to windows): the
    * subset of [[boundedGlobalWindows]] whose window INPUT is bounded by
    * plan structure alone — the child chain bottoms out at a LIMIT
    * (TakeOrdered top-k candidate sets), so [[structurallyBounded]] can
    * verify the prose. Most window whitelist entries are bounded by
    * DOMAIN properties the plan cannot show (calendar-bounded hourly
    * aggregates, distinct-value collapses of rounded score domains,
    * |sources|-row datasheets — all grouped aggregates whose grouping
    * key cardinality is a data/domain fact), so prose + the owning spec
    * remain their contract; this set covers the class where structure
    * suffices. ann_hybrid_rerank is deliberately NOT here: its rerank
    * window rides the top-20 BM25 set through an inner equi-join back to
    * the embeddings table, and that join's output bound (20 x doc_id
    * multiplicity = 20, doc_id being unique) is a data fact the plan
    * cannot show — the prose entry plus SimilaritySpec stay its
    * contract. */
  private val structurallyBoundedWindows: Set[String] =
    Set("ml_mrr", "ml_ndcg")

  test("meta: every key's unpartitioned windows sort only pid or a " +
      "documented bounded relation (r16)") {
    val offenders = scala.collection.mutable.Map[String, Seq[Set[String]]]()
    val loose = scala.collection.mutable.Map[String, String]()
    val seen = scala.collection.mutable.Set[String]()
    for ((k, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val df = fn(spark, SfDir)
      val plan = df.queryExecution.sparkPlan
      val globals = unpartitionedWindowKeys(df)
        .filterNot(_ == Set("pid"))
      if (globals.nonEmpty) {
        seen += k
        if (!boundedGlobalWindows.contains(k)) offenders(k) = globals
        // limit-class entries: verify the bounded property on the plan
        // itself — every unpartitioned window's input chain must bottom
        // out at a limit/bounded leaf (r18 cont.)
        if (structurallyBoundedWindows(k)) {
          val bad = plan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec
                if w.partitionSpec.isEmpty &&
                  !structurallyBounded(w.child) => w
          }
          if (bad.nonEmpty) loose(k) = bad.head.toString.take(2000)
        }
      }
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"UNDOCUMENTED unpartitioned windows (single-task collapse risk at " +
        s"scale — document boundedness or re-plan): ${offenders.toMap}")
    // tightness: every whitelist entry must still be load-bearing
    val stale = boundedGlobalWindows.keySet -- seen
    assert(stale.isEmpty,
      s"stale whitelist entries (key no longer plans a global window): $stale")
    val orphans = structurallyBoundedWindows -- boundedGlobalWindows.keySet
    assert(orphans.isEmpty,
      s"structurally-bounded window set names keys outside the whitelist: $orphans")
    assert(loose.isEmpty,
      s"declared limit-bounded, but an unpartitioned window's input is " +
        s"not structurally bounded:\n" +
        loose.map { case (k, p) => s"== $k ==\n$p" }.mkString("\n"))
  }

  test("sort_skyline: staircase window is pid-partitioned; only the offsets window is global") {
    val df = RelationalOps.queries("sort_skyline")(spark, SfDir)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // r11 rewrite (r10 verdict item 2): the cumulative-min staircase over
    // the distinct-price relation runs per range partition; the only
    // unpartitioned window is the prefix-min over the #partitions-row
    // offsets table (bounded by cluster config, never by data)
    val global = unpartitionedWindowKeys(df)
    assert(global.nonEmpty && global.forall(_ == Set("pid")),
      s"unpartitioned window over a data-sized relation: $global\n$plan")
    // and the per-partition staircase window exists
    val partitioned = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty => w
    }
    assert(partitioned.nonEmpty, s"pid-partitioned staircase window missing:\n$plan")
  }

  test("text_zipf: vocabulary rank window is pid-partitioned (no global vocab sort)") {
    // r11 rewrite (r10 verdict item 3): ranks ride the pipe_vocab
    // range-partition + per-partition row_number + offsets layout; a web
    // corpus's 10^8+ singleton tail must never cross one task
    val df = graft.operators.TextOps.queries("text_zipf")(spark, SfDir)
    val global = unpartitionedWindowKeys(df)
    assert(global.forall(_ == Set("pid")),
      s"text_zipf serializes the vocabulary through one task: $global")
    val partitioned = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty => w
    }
    assert(partitioned.nonEmpty, "pid-partitioned rank window missing")
  }

  test("agg_lorenz: unpartitioned windows ride bounded domains; the exact " +
      "pass is bkt-partitioned; no range shuffle or cache of the price domain") {
    // r18 opt: the deciles ride the agg_weighted_median bucket
    // discipline. Any unpartitioned window sorts only compile-bounded
    // domains — bkt (≤ WmBuckets cells, the least()-capped bucket map) or
    // decile (≤ 10 rows post-groupBy) — or is an order-free total (empty
    // key set); the exact within-bucket cumsum partitions on bkt. The
    // corpus-sized distinct-price relation must cross NO range exchange
    // and pin NO cache (the r16 form shuffled it twice more and persisted
    // it).
    val df = graft.operators.AggOps.queries("agg_lorenz")(spark, SfDir)
    val global = unpartitionedWindowKeys(df)
    assert(global.forall(k =>
        k.isEmpty || k == Set("bkt") || k == Set("decile")),
      s"agg_lorenz serializes an unbounded domain through one task: $global")
    val plan = df.queryExecution.sparkPlan
    val straddle = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.nonEmpty =>
        w.partitionSpec.flatMap(_.references.map(_.name).toSeq).toSet
    }
    assert(straddle.contains(Set("bkt")),
      s"bkt-partitioned exact straddle window missing: $straddle")
    val rangeEx = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.outputPartitioning
            .isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e
    }
    assert(rangeEx.length <= 1,
      // the one admissible range exchange is the output ORDER BY over the
      // ≤10-row decile table; the r16 form added a second, corpus-sized one
      s"the corpus-sized price relation crossed a range exchange: $rangeEx")
    assert(df.queryExecution.optimizedPlan.collect {
      case c: org.apache.spark.sql.execution.columnar.InMemoryRelation => c
    }.isEmpty, "the price relation is pinned in cache again")
  }

  test("dedup_chunk and pipe_ppl_buckets window only on real partition keys") {
    // dedup_chunk's chunk-id cumsum is doc-partitioned; ppl_buckets'
    // tercile cumsum is lang-partitioned over the distinct-ce relation —
    // neither may plan an unpartitioned window over data-sized input
    for (name <- Seq("dedup_chunk", "pipe_ppl_buckets")) {
      val df = SparkEntry.queries(name)(spark, SfDir)
      val global = unpartitionedWindowKeys(df)
      assert(global.forall(_.isEmpty),
        s"$name: unpartitioned sorted window over data: $global")
    }
  }

  test("join_fuzzy blocks via equi-joins, never a cartesian candidate space") {
    val plan = JoinOps.queries("join_fuzzy")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("zorder_layout is a pure project + top-k (no shuffle beyond the limit)") {
    val plan = RelationalOps.queries("zorder_layout")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  /** r17 (r16 verdict item 3): the window meta-test pattern applied to
    * JOINS. A BroadcastNestedLoopJoin is only safe when its BROADCAST
    * side is bounded at any corpus size (a 1-row scalar, a |types|²
    * pair frame, a compile-time panel) — broadcast of a data-sized side
    * OOMs the driver at 100 TB, and a nested-loop probe over a
    * data-sized broadcast is quadratic. Every key that plans one must
    * carry an entry here stating WHY the broadcast side is bounded; the
    * tightness check fails when an entry goes stale, so the whitelist
    * can only shrink or be consciously grown. */
  private val boundedNestedLoopJoins: Map[String, String] = Map(
    // 1-row (or few-row) corpus-scalar relations crossJoined onto a
    // stream: grand totals, counts, fitted parameters, percentile cut
    // arrays — a grouping-free aggregate is one row by construction
    "agg_assoc_rules" -> "1-row transaction-count scalar",
    "agg_bloom_members" -> "1-row n_members + 1-row bits_set scalars",
    "agg_cramers_v" -> ("|langs| x |sources| contingency spine (distinct " +
      "value domains of two low-cardinality columns) + 1-row grand-total " +
      "and min-dim scalars"),
    "agg_equidepth" -> "1-row percentile-cut-array scalar",
    "agg_kendall_tau" -> ("value-domain pair self-join over the distinct " +
      "(quantity, discount) cells (bounded by the columns' value domains) " +
      "+ 1-row concordance/tie-term scalars"),
    "agg_lorenz" -> "1-row min/max bucket-range probe onto the distinct-price relation",
    "agg_simpson" -> "1-row grand-total scalar",
    "ml_ece" -> "1-row doc-count scalar onto the 10 calibration bins",
    "pipe_dsir_weights" -> "1-row per-side token-total scalars",
    "pipe_expectations" -> "1-row scan-check x 1-row orphan-count datasheet",
    "text_bm25" -> "1-row corpus avgdl/N scalar",
    "text_burstiness" -> "1-row corpus token-total scalar",
    "text_collocations" -> "1-row bigram-total scalar",
    "text_kl_drift" -> "1-row per-side mass-total scalars",
    "text_kn_bigram" -> "1-row continuation/type-count scalars",
    "text_lang_kappa" -> "1-row agreement-total scalar",
    "text_tfidf" -> "1-row document-count scalar",
    "text_vocab_coverage" -> "1-row token-mass-total scalar",
    "ts_resid_anomaly" -> "1-row residual median/MAD scalars",
    "zorder_layout" -> "1-row domain-max normalization scalar",
    // bounded replicate/permutation frames: s.range(B) with a
    // compile-time replicate count, plus the 1-row observed statistic
    "ml_bootstrap_ci" -> "64-row replicate frame + 1-row observed mean",
    "ml_permutation_test" -> "64-row permutation frame + 1-row observed stat",
    // fixed probe panels / k-bounded model relations broadcast onto the
    // corpus: the panel or codebook is a config constant, never
    // data-sized
    "ann_brute" -> "1-row probe-vector scalar",
    "ann_range" -> "1-row probe-vector scalar",
    "ann_hybrid_rerank" -> "1-row probe vector + k-bounded rerank candidates",
    "ann_ivf" -> "k-centroid table + 1-row probe (k = config constant)",
    "ann_lsh" -> "1-row probe bucket+vector scalar (planes are in-row literals since r17)",
    "ann_pq" -> "<=4096-row trained codebook + 1-row probe",
    // ml_kmeans / dedup_semantic: delisted r18 — their k-centroid
    // crossJoin now lives in the once-per-session lloydAssign derivation
    // (SessionTableMemo), so the per-key plan is a label-parquet scan
    // and no longer plans a BNLJ; the staleness assertion demanded the
    // removal
    "ml_knn" -> "1-row probe-vector scalar",
    "ml_mrr" -> "1-row probe-vector scalar (vec_id = 42)",
    "ml_ndcg" -> "1-row probe-vector scalar (vec_id = 42)",
    "ml_recall_at_k" -> "10-probe retrieval panel (vec_id < 10)",
    "similar_range" -> "1-row probe-vector scalar",
    "api_similares" -> "1-row probe-vector scalar (nests similar_range)",
    // size-gated: the broadcast side is MEASURED against Bcast.budget
    // before the crossJoin; past the budget the plan falls back to the
    // fingerprint equi-join path
    "pipe_decontaminate_near" -> "eval panel, size-gated via Bcast.measuredBytes <= budget",
    // |types|- / |nodes|- / iteration-bounded graph and pair frames:
    // non-equi joins of aggregates whose cardinality is a schema or
    // fixture-graph constant, never event-count-sized
    "agg_kmv_jaccard" -> "|types|^2 pair frame over the <=K-per-type sketch",
    "graph_2hop" -> "1-row probe-node scalar",
    "graph_betweenness" -> "1-row path-count normalization scalar",
    "graph_eigenvector" -> "1-row L2-norm scalar per power iteration",
    "graph_modularity" -> "1-row edge-total scalar",
    "graph_pagerank" -> "1-row dangling-mass scalar per iteration (3 rounds)",
    "graph_rich_club" -> "8-row k-threshold frame x degree histogram",
    "graph_summary" -> "1-row global datasheet scalars",
    "graph_transitivity" -> "1-row triangle/wedge-count scalars")

  /** r18 (r17 advice): the whitelist VALUES are free-text rationales the
    * meta test cannot validate, so for the scalar class — entries whose
    * broadcast side is produced by bounded-by-construction plan nodes —
    * assert the bounded property ITSELF: every BNLJ build side must be a
    * grouping-free aggregate (1 row by construction), a ≤4,096-element
    * range/local relation (compile-time panels, replicate frames), or a
    * limit, composed through unary nodes and joins of such. A key here
    * whose broadcast side later becomes data-sized fails the meta test
    * structurally instead of passing on a stale prose claim. Keys NOT in
    * this set are bounded by data properties the PLAN cannot show — a
    * key-unique filter (the vec_id=42 probes), a size-gated measured
    * broadcast (pipe_decontaminate_near), a |types|-bounded groupBy
    * (agg_kmv_jaccard's sketch frame, ann_ivf's centroids, the
    * agg_cramers_v contingency spine, agg_kendall_tau's value-domain
    * pair cells) — where the prose rationale plus the owning spec
    * remain the contract. */
  private val structurallyBoundedBnlj: Set[String] = Set(
    "agg_assoc_rules", "agg_bloom_members",
    "agg_equidepth", "agg_lorenz", "agg_simpson",
    "ml_ece", "ml_bootstrap_ci", "ml_permutation_test",
    "pipe_dsir_weights", "pipe_expectations",
    "text_bm25", "text_burstiness", "text_collocations", "text_kl_drift",
    "text_kn_bigram", "text_lang_kappa", "text_tfidf",
    "text_vocab_coverage", "ts_resid_anomaly", "zorder_layout",
    "graph_betweenness", "graph_eigenvector", "graph_modularity",
    "graph_pagerank", "graph_summary", "graph_transitivity")

  /** True when `p` cannot produce more than a bounded number of rows at
    * ANY input size, by plan structure alone. */
  private def structurallyBounded(p: org.apache.spark.sql.execution.SparkPlan)
      : Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
        if a.groupingExpressions.isEmpty => true
    case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec
        if a.groupingExpressions.isEmpty => true
    case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
        if a.groupingExpressions.isEmpty => true
    case r: org.apache.spark.sql.execution.RangeExec =>
      r.numElements <= BigInt(4096)
    case l: org.apache.spark.sql.execution.LocalTableScanExec =>
      l.rows.lengthCompare(4096) <= 0
    case _: org.apache.spark.sql.execution.GlobalLimitExec |
         _: org.apache.spark.sql.execution.LocalLimitExec |
         _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
    case j if j.children.length > 1 => j.children.forall(structurallyBounded)
    case u if u.children.length == 1 => structurallyBounded(u.children.head)
    case _ => false
  }

  test("meta: no CartesianProduct anywhere; every BroadcastNestedLoopJoin " +
      "broadcasts a documented bounded side (r17)") {
    // CartesianProduct — a SHUFFLED all-pairs product — is banned
    // outright: it cannot survive a 100x scale-up and has no legitimate
    // use on this surface. BNLJ is conditionally allowed per the
    // whitelist above. Planning only — nothing executes beyond what
    // builders materialize themselves.
    val cart = scala.collection.mutable.ArrayBuffer[String]()
    val bnljUndoc = scala.collection.mutable.Map[String, Int]()
    val bnljLoose = scala.collection.mutable.Map[String, String]()
    val seen = scala.collection.mutable.Set[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val phys = fn(spark, SfDir).queryExecution.sparkPlan
        if (phys.collect {
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }.nonEmpty) cart += name
        val bnlj = phys.collect {
          case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
        }
        if (bnlj.nonEmpty) {
          seen += name
          if (!boundedNestedLoopJoins.contains(name))
            bnljUndoc(name) = bnlj.length
          // scalar-class entries: verify the bounded property on the
          // plan itself, not just the prose (r18)
          if (structurallyBoundedBnlj(name)) {
            val loose = bnlj.filterNot { j =>
              val build =
                if (j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildLeft)
                  j.left else j.right
              structurallyBounded(build)
            }
            if (loose.nonEmpty) bnljLoose(name) = loose.head.toString.take(2000)
          }
        }
      } catch {
        case e: Throwable => cart += s"$name: failed to plan (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)})"
      }
      spark.sharedState.cacheManager.clearCache()
    }
    assert(cart.isEmpty, s"CartesianProduct (or planning failure): $cart")
    assert(bnljUndoc.isEmpty,
      s"UNDOCUMENTED BroadcastNestedLoopJoin (document why the broadcast " +
        s"side is bounded at any corpus size, or re-plan): ${bnljUndoc.toMap}")
    val stale = boundedNestedLoopJoins.keySet -- seen
    assert(stale.isEmpty,
      s"stale whitelist entries (key no longer plans a BNLJ): $stale")
    val orphans = structurallyBoundedBnlj -- boundedNestedLoopJoins.keySet
    assert(orphans.isEmpty,
      s"structurally-bounded set names keys outside the whitelist: $orphans")
    assert(bnljLoose.isEmpty,
      s"declared structurally bounded, but a BNLJ build side is not a " +
        s"grouping-free aggregate / bounded range / limit:\n" +
        bnljLoose.map { case (k, p) => s"== $k ==\n$p" }.mkString("\n"))
  }

  test("join_bloom_prune: probe sits BELOW the fact-side join exchange; " +
      "residual join is SMJ (r17)") {
    val df = JoinOps.queries("join_bloom_prune")(spark, SfDir)
    // sparkPlan predates EnsureRequirements (no exchanges yet) — census
    // the adaptive node's initial plan, the pipe_e2e discipline
    val phys = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    // the residual exact join models the non-broadcastable dimension
    assert(phys.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.nonEmpty, s"residual join lost the merge shape:\n$phys")
    // the whole point: the 4-bit-test conjunction against the literal
    // word array prunes the fact BELOW its join exchange, so dropped
    // rows never shuffle
    val prunedBelowExchange = phys.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collect {
            case f: org.apache.spark.sql.execution.FilterExec
                if f.condition.toString.contains("element_at") => f
          }.nonEmpty => e
    }
    assert(prunedBelowExchange.nonEmpty,
      s"bloom probe is not below the fact-side exchange:\n$phys")
  }

  test("win_rank_topk: WindowGroupLimit prunes to top-3 per group " +
      "MAP-SIDE, below the window's exchange (r18 cont.)") {
    // the rn <= 3 filter above the ranking window triggers Spark's
    // InferWindowGroupLimit: a Partial WindowGroupLimit keeps only each
    // group's top-3 candidate rows BEFORE the shuffle (so at corpus
    // scale the window exchange carries 3 rows per customer, not every
    // order) and a Final one re-prunes after. Pin both modes and the
    // partial's below-the-exchange position — a refactor that breaks
    // the rank filter shape (e.g. filtering a derived column) would
    // silently lose the prune and re-shuffle the whole table.
    val df = WindowOps.queries("win_rank_topk")(spark, SfDir)
    val phys = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    val modes = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
        w.mode.toString
    }
    assert(modes.sorted == Seq("Final", "Partial"),
      s"expected Partial+Final WindowGroupLimit, saw $modes:\n$phys")
    val partialBelowExchange = phys.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
          if e.child.collect {
            case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
                if w.mode.toString == "Partial" => w
          }.nonEmpty => e
    }
    assert(partialBelowExchange.nonEmpty,
      s"partial WindowGroupLimit is not below the window exchange:\n$phys")
  }

  test("ts_mad_anomaly: no collect_list / object-hash buffer anywhere — " +
      "the two-pass value-domain discipline; all windows partition on " +
      "user_id (r17)") {
    val df = StreamingOps.queries("ts_mad_anomaly")(spark, SfDir)
    val phys = df.queryExecution.sparkPlan
    // an ObjectHashAggregate here would mean a collect-style buffer
    // whose memory bound is a data distribution (the r16 shape); the
    // value-domain rewrite uses only codegen'd HashAggregates and
    // spillable window frames
    assert(phys.collect {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }.isEmpty, s"data-shaped aggregation buffer reappeared:\n$phys")
    val winParts = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.flatMap(_.references.map(_.name).toSeq).toSet
    }
    assert(winParts.nonEmpty && winParts.forall(_ == Set("user_id")),
      s"a window lost its user_id partitioning: $winParts")
  }

  test("global sweep: every unpartitioned window rides the pid discipline " +
      "or a documented bounded relation") {
    // An unpartitioned WindowExec funnels its whole input through ONE
    // task — the sort_skyline-class regression (r10). Individually
    // pinned queries cover five shapes; this sweep makes the hazard
    // un-landable anywhere: a new global window in ANY declared query
    // must either order on `pid` (the #partitions-row offsets tables —
    // bounded by cluster config, auto-allowed) or carry an entry here
    // stating why its input relation is bounded at ANY corpus scale.
    // Entries are exact: an allowlisted query that loses its global
    // window fails too, so the list cannot rot.
    val allow: Map[String, String] = Map(
      // order-free totals over bounded aggregates
      "agg_benford" -> "<= 9 leading-digit rows",
      "agg_chi2" -> "contingency cells bounded by |segments| x |flags|",
      "agg_lorenz" -> ("bkt cumsum over <= WmBuckets cells, decile cumsum " +
        "+ order-free totals over the <= 10-row decile table"),
      "agg_theil" -> "order-free totals over the |nations|-row aggregate",
      "ann_hybrid_rerank" -> "LIMIT-bounded candidate set (top-k rerank)",
      "dedup_chunk" -> "order-free total over the bounded dup-chunk histogram",
      "graph_component_sizes" -> "distinct component-size histogram",
      "graph_hits" -> "|event types|-row authority relation",
      "ml_brier" -> "order-free total over the <= 10-bin reliability table",
      "ml_parity_gap" -> "|groups|-row rate table",
      "ml_psi" -> "<= 10-bucket score histogram",
      "pipe_dedup_report" -> "cluster-size histogram (distinct sizes)",
      "pipe_mix_temperature" -> "|sources|-row mixture table",
      "pipe_near_dedup_report" -> "cluster-size histogram (distinct sizes)",
      "pipe_repeat_factors" -> "|sources|-row epoch plan",
      "pipe_substring_report" -> "<= 10-row dup-mass decile table",
      "ts_decompose" -> "<= 24-row hour-of-day seasonal relation",
      "ts_resid_anomaly" -> "1-row median/MAD stats relation",
      // sorted windows over value-domain / calendar / constant-size inputs
      "agg_cramers_v" -> "order-free total over the |langs| x |sources| grid",
      "agg_spearman" -> "midrank maps over the two distinct-value domains",
      "ts_hurst" -> "calendar-bounded hourly series + the 4-row chunk-size relation",
      "ts_periodogram" -> "calendar-bounded hourly series + the 8-row frequency relation",
      "ml_auc" -> "distinct score (n_chars) value domain",
      "ml_mann_whitney" -> "distinct score (n_chars) value domain (midranks)",
      "ml_ks_test" -> "distinct score value domain (two CDFs + the sup)",
      "ml_lift_gain" -> "distinct score value domain",
      "ml_pr_curve" -> "distinct score value domain (threshold sweep)",
      "ml_roc_curve" -> "distinct score value domain (threshold sweep)",
      "ml_youden_j" -> "distinct score value domain (threshold argmax)",
      "ml_bootstrap_ci" -> "64 bootstrap-replica rows",
      "ml_mrr" -> "per-probe candidate sets of a bounded probe list",
      "ml_ndcg" -> "per-probe top-10 candidate sets",
      "pipe_filter_report" -> "<= 5-row filter-cascade funnel",
      "pipe_split_audit" -> "dense 100-bucket hash-fairness relation",
      "pipe_unimax" -> "|langs|-row capacity waterfill",
      "ts_bollinger" -> "calendar-bounded hourly series",
      "ts_correlogram" -> "calendar-bounded hourly series",
      "ts_pacf" -> "calendar-bounded hourly series",
      "ts_ljung_box" -> "12-lag correlogram + calendar-bounded series",
      "win_rolling_corr" -> "calendar-bounded joint hourly series")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val keys = unpartitionedWindowKeys(fn(spark, SfDir))
          .filterNot(_ == Set("pid"))
        if (keys.nonEmpty && !allow.contains(name))
          Some(s"$name: new unpartitioned window(s) on $keys — pid-partition " +
            "the relation or document its bound in the allowlist")
        else if (keys.isEmpty && allow.contains(name))
          Some(s"$name: allowlist entry is stale (no unpartitioned window left)")
        else None
      } catch {
        case e: Throwable => Some(s"$name: failed to plan (${e.getClass.getSimpleName})")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("window counts are conserved: tumbling windows partition the input") {
    val total = Tables.events(spark, SfDir).count()
    val windowed = StreamingOps.queries("stream_tumbling")(spark, SfDir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(windowed === total)
  }

  test("sliding windows double-count each event exactly twice") {
    val total = Tables.events(spark, SfDir).count()
    val windowed = StreamingOps.queries("stream_sliding")(spark, SfDir)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(windowed === 2 * total)
  }
}
