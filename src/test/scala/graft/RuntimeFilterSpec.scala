package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter rule).
  * At 100 TB the dominant join cost is shuffling the fact side; when the dim
  * side carries a selective filter, Spark builds a bloom filter over the dim
  * join keys and applies `might_contain` to the fact side BEFORE its shuffle,
  * so non-matching fact rows never leave the scan stage. The size thresholds
  * are forced down so the 600-row fixtures trip the rule; the rewrite is the
  * same one that fires on multi-TB scans. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    import spark.implicits._
    val lineitem = Tables.lineitem(spark, SfDir)
    val part     = Tables.part(spark, SfDir).filter($"p_partkey" % 10 === 0)
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture scans are KB-scale; drop the 10 GB application-side floor
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.creationSideThreshold" -> "100MB",
      // keep the join shuffled: a broadcast join needs no runtime filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val joined = lineitem.join(part, $"l_partkey" === $"p_partkey")
        .groupBy($"p_partkey").agg(sum($"l_quantity").as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected on the fact side:\n$optimized")
      // the rewrite must not change results
      val expected = lineitem.filter($"l_partkey" % 10 === 0)
        .groupBy($"l_partkey").count().count()
      assert(joined.count() === expected)
    }
  }

  test("no runtime filter when the join is broadcast (filter would be redundant)") {
    import spark.implicits._
    val lineitem = Tables.lineitem(spark, SfDir)
    val part     = Tables.part(spark, SfDir).filter($"p_partkey" % 10 === 0)
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val joined = lineitem.join(broadcast(part), $"l_partkey" === $"p_partkey")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("might_contain"),
        s"bloom filter injected on a broadcast join:\n$optimized")
    }
  }
}
