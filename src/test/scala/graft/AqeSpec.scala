package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution behaviors that matter at 100 TB (SURVEY §4.2):
  * runtime skew-split of a sort-merge join, and runtime conversion of a
  * shuffle join to broadcast once real stats are known. Thresholds are
  * forced down so the fixtures trip them; the decision logic is the same
  * one that fires on real multi-GB partitions. */
class AqeSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    import spark.implicits._
    // one pathological key (0) carries 50k rows; 100 normal keys carry ~10
    val skewed = spark.range(50000).select(lit(0L).as("k"), $"id".as("v"))
      .union(spark.range(1000).select(($"id" % 100 + 1).as("k"), $"id".as("v")))
    val dim = spark.range(101).select($"id".as("k"), $"id".as("rv"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // keep both planning-time and AQE-time broadcast off so the join
      // stays sort-merge and the skew path is what must save it
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = skewed.join(dim, "k")
      // drive THIS DataFrame's QueryExecution (count() would build a new
      // one and leave this plan un-executed / un-adapted)
      assert(joined.collect().length === 50000 + 1000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$finalPlan")
    }
  }

  test("AQE converts a shuffle join to broadcast from runtime stats") {
    import spark.implicits._
    val fact = Tables.orders(spark, SfDir)
    // planner sees no stats advantage (broadcast disabled at planning
    // time); AQE sees the tiny filtered build side and converts
    val dim = Tables.customer(spark, SfDir).filter($"c_custkey" < 50)
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "1MB") {
      val joined = fact.join(dim, $"o_custkey" === $"c_custkey")
      assert(joined.collect().nonEmpty)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("BroadcastHashJoin"),
        s"AQE did not convert to broadcast:\n$finalPlan")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    import spark.implicits._
    // the third runtime-filtering tier next to DPP and the DSv2 runtime
    // filter (SourceSpec): a selective filter on the dim side injects a
    // bloom-filter semi-filter into the fact scan branch, so most fact
    // rows die BEFORE the join exchange — at 100 TB this is the difference
    // between shuffling the whole fact table and shuffling the ~match set.
    // Size thresholds are forced down so fixture-scale relations trip the
    // same injection rule that fires on multi-GB plans.
    val fact = Tables.lineitem(spark, SfDir)
    val dim = Tables.orders(spark, SfDir).filter($"o_totalprice" > 400000)
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // no broadcast: a broadcast join would already prune via its build
      // side, making the bloom filter redundant (and it is not injected)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom filter injected into the fact branch:\n$plan")
      // and the filtered result is identical to the unfiltered-path join
      var expected = -1L
      withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        expected = fact.join(dim, $"l_orderkey" === $"o_orderkey").count()
      }
      assert(joined.count() === expected)
    }
  }
}
