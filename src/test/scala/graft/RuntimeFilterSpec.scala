package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps

/** `join_bloom_prune` semantics (r17, r16 verdict item 2) — the runtime
  * bloom-filter semi-join prune. The row-level oracle already pins the
  * OUTPUT (it is the plain selective equi-join); this suite pins the
  * properties that make the prune safe and worthwhile:
  *
  *  1. No false negatives: every fact row that truly joins survives the
  *     probe, at ANY geometry — this is the invariant that lets the
  *     bloom drop rows ahead of the shuffle without changing the join.
  *  2. The prune actually prunes: at the declared geometry the survivor
  *     set is the true match set plus only fpr-level noise, far below
  *     the full fact table.
  *  3. Geometry-independence of the RESULT: a deliberately saturated
  *     2-word filter passes almost everything (prune ratio → 0) yet the
  *     final output is bit-identical — the residual exact join owns
  *     correctness, the bloom owns only efficiency.
  *
  * Contrast with Spark's own runtime filtering (InjectRuntimeFilter,
  * `spark.sql.optimizer.runtime.bloomFilter.enabled`): Spark can inject
  * BloomFilterAggregate/BloomFilterMightContain into the probe side of
  * a qualifying join automatically — the same algebra — but only when
  * its creation-side estimates clear `...creationSideThreshold`, so the
  * prune is planner-discretionary and invisible to tests. This key
  * DECLARES the rewrite: the filter build is an ordinary aggregation,
  * the geometry is an explicit config constant, and the last test pins
  * that the prune is present and correct even with Spark's injector
  * disabled.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def trueMatches = Tables.lineitem(spark, SfDir)
    .join(Tables.orders(spark, SfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey"), "left_semi")

  test("no false negatives: every true match survives the probe at the " +
      "declared AND at a saturated geometry") {
    for (words <- Seq(JoinOps.BloomPruneWords, 2)) {
      val missed = trueMatches
        .join(JoinOps.bloomPrunedFact(spark, SfDir, words)
            .select("l_orderkey").distinct(),
          Seq("l_orderkey"), "left_anti")
        .count()
      assert(missed === 0L,
        s"bloom dropped $missed truly-matching fact rows at words=$words")
    }
  }

  test("the prune prunes: survivors = true matches + at most fpr-level " +
      "noise, well below the fact table") {
    val fact = Tables.lineitem(spark, SfDir).count()
    val matches = trueMatches.count()
    val pruned = JoinOps.bloomPrunedFact(
      spark, SfDir, JoinOps.BloomPruneWords).count()
    assert(pruned >= matches, s"impossible: $pruned survivors < $matches matches")
    // at sf0.001 the build side is ~300 keys in 516,096 bits — fill
    // ≈ 0.2%, fpr ≈ fill^4 — so noise above the true matches should be
    // essentially zero; 1% of the fact is a generous ceiling
    assert(pruned <= matches + fact / 100,
      s"prune too leaky: $pruned survivors vs $matches matches ($fact fact rows)")
    assert(pruned < fact / 2,
      s"prune did not prune: $pruned of $fact fact rows survived")
  }

  test("saturated geometry: words=2 passes (nearly) everything, yet the " +
      "output is identical — the residual join owns correctness") {
    val fact = Tables.lineitem(spark, SfDir).count()
    val saturated = JoinOps.bloomPrunedFact(spark, SfDir, 2).count()
    assert(saturated >= fact * 95 / 100,
      s"words=2 (126 bits for ~300 keys x 4 hashes) should saturate; " +
        s"only $saturated of $fact survived")
    val declared = JoinOps.bloomPruneJoin(
      spark, SfDir, JoinOps.BloomPruneWords).collect().toSeq
    val viaSaturated = JoinOps.bloomPruneJoin(spark, SfDir, 2).collect().toSeq
    assert(declared === viaSaturated,
      "result must be geometry-independent (blooms have no false negatives)")
  }

  test("the prune is DECLARED, not planner-discretionary: present and " +
      "oracle-identical with Spark's InjectRuntimeFilter disabled") {
    withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false") {
      val df = JoinOps.queries("join_bloom_prune")(spark, SfDir)
      val phys = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case p => p
      }
      // the probe filter (4 bit tests against the literal word array)
      // is still in the plan — OUR rewrite, not Spark's
      assert(phys.collect {
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.toString.contains("element_at") => f
      }.nonEmpty, s"declared bloom probe missing with the injector off:\n$phys")
      // and the output is still the plain selective join
      val got = df.collect().toSeq
      val plain = Tables.lineitem(spark, SfDir)
        .join(Tables.orders(spark, SfDir)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          graft.functions.Num.pin(
            sum(col("l_quantity").cast("decimal(28,10)")).cast("double"), 4)
            .as("sum_qty"),
          graft.functions.Num.pin(
            sum(col("l_extendedprice").cast("decimal(28,10)")).cast("double"), 4)
            .as("sum_price"))
        .orderBy("l_returnflag")
        .collect().toSeq
      assert(got === plain)
    }
  }

  // r17-advice smoke test: the r17 rewrite of this suite dropped all
  // coverage of Spark's OWN InjectRuntimeFilter; keep one test pinning
  // that the planner-side rule still fires under forced thresholds and
  // stays suppressed for broadcast joins, so a Spark-upgrade regression
  // in runtime filtering is caught here rather than in production plans.
  test("Spark's own InjectRuntimeFilter: might_contain injected under " +
      "forced thresholds, suppressed for broadcast joins") {
    import spark.implicits._
    val lineitem = Tables.lineitem(spark, SfDir)
    val part = Tables.part(spark, SfDir).filter($"p_partkey" % 10 === 0)
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture scans are KB-scale; drop the 10 GB application-side floor
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.creationSideThreshold" -> "100MB",
      // keep the join shuffled: a broadcast join needs no runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val shuffled = lineitem.join(part, $"l_partkey" === $"p_partkey")
        .queryExecution.optimizedPlan.toString
      assert(shuffled.contains("might_contain"),
        s"no bloom filter injected on the fact side:\n$shuffled")
    }
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val bcast = lineitem.join(broadcast(part), $"l_partkey" === $"p_partkey")
        .queryExecution.optimizedPlan.toString
      assert(!bcast.contains("might_contain"),
        s"bloom filter injected on a broadcast join:\n$bcast")
    }
  }
}
