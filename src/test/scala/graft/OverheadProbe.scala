package graft

import org.apache.spark.sql.SparkSession

/** Overhead decomposition probe (r18 optimization round): for each named
  * key, times (a) DataFrame construction + Catalyst analysis/optimization/
  * physical planning only (no job), vs (b) the full count() — at a given
  * SF. The delta says whether a key's fixed cost is planning (Catalyst)
  * or execution orchestration (jobs, persists, stats actions). Run:
  * `sbt "Test/runMain graft.OverheadProbe /root/testdata/sf0.001 3 k1,k2"`. */
object OverheadProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val passes = if (args.length > 1) args(1).toInt else 3
    val keys = if (args.length > 2) args(2).split(",").toSeq
      else Seq("graph_modularity", "dedup_simhash", "pipe_e2e", "ml_kmeans")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    for (k <- keys) {
      val fn = SparkEntry.queries(k)
      fn(spark, dir).count(); clear() // warm
      val plan = Vector.newBuilder[Double]
      val full = Vector.newBuilder[Double]
      for (_ <- 1 to passes) {
        clear()
        plan += time { fn(spark, dir).queryExecution.executedPlan }
        clear()
        full += time { fn(spark, dir).count() }
      }
      def s(v: Vector[Double]) = f"min=${v.min}%.2f all=${v.map(x => f"$x%.2f").mkString(",")}"
      println(f"$k%-24s plan ${s(plan.result())}   full ${s(full.result())}")
    }
    spark.stop()
  }
}
