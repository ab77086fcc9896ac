package graft

import org.apache.spark.sql.SparkSession

/** Manual decomposition probe for `dedup_simhash` (r17 verdict item 4):
  * times the SIGNATURE stage and the PAIR stage separately so the key's
  * steady-state cost attributes to measured components instead of
  * narrative. Not a ScalaTest suite — run on demand with
  * `sbt "Test/runMain graft.SimhashProbe /root/testdata/sf0.1 5"`;
  * results are recorded in BASELINE.md's r18 section.
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
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
    // warm codegen/parquet/shuffle once
    graft.operators.DedupOps.queries("dedup_simhash")(spark, dir).count()
    val full = Vector.newBuilder[Double]
    val colT = Vector.newBuilder[Double]
    val sigT = Vector.newBuilder[Double]
    val pairT = Vector.newBuilder[Double]
    for (_ <- 1 to passes) {
      clear()
      full += time {
        graft.operators.DedupOps.queries("dedup_simhash")(spark, dir).count()
      }
      clear()
      // collapse stage alone: the shared dedup-family fingerprint maps
      val c = graft.operators.DedupOps.collapse(spark, dir)
      colT += time { c.docMap.count() }
      // signature stage with collapse hot: reps semi-join + md5 votes +
      // pack + the explicit round-robin repartition + persist,
      // materialized to the cache the pair scan consumes
      sigT += time {
        graft.operators.DedupOps.simhashSig(spark, dir, c).count()
      }
      // pair stage with the sig cache hot: SelfPairwise Hamming +
      // member-pair expansion + order — the full key minus the cached
      // signature build
      pairT += time {
        graft.operators.DedupOps.queries("dedup_simhash")(spark, dir).count()
      }
    }
    def stats(v: Vector[Double]) =
      f"min=${v.min}%.2f med=${v.sorted.apply(v.length / 2)}%.2f all=${v.map(x => f"$x%.2f").mkString(",")}"
    println(s"full-key      ${stats(full.result())}")
    println(s"collapse-stage      ${stats(colT.result())}")
    println(s"sig-stage(hot-collapse) ${stats(sigT.result())}")
    println(s"pair-stage(hot-sig) ${stats(pairT.result())}")
    spark.stop()
  }
}
