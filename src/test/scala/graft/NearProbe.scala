package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Manual decomposition probe for `dedup_near` (r18 optimization round,
  * guide §1): does the band self-join recompute the tokenize+MinHash
  * subtree per side at runtime (the initial plan shows two Generate
  * subtrees), or does AQE's stage cache already reuse it? Measures the
  * current key against a variant that persists the all-long `slim`
  * band relation once. Run:
  * `sbt "Test/runMain graft.NearProbe /root/testdata/sf0.1 5"`. */
object NearProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.operators.DedupOps.JaccardThreshold

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // re-derivations of the private pieces (package-visible constants)
    def uniqDf: DataFrame = {
      val c = graft.operators.DedupOps.collapse(spark, dir)
      c.uniq()
    }
    def slimOf(sig: DataFrame): DataFrame =
      sig.select(col("gid"), size(col("th")).as("len"),
        posexplode(graft.functions.ArrayExprs.minHashBands(col("th"),
          graft.operators.DedupOps.Bands,
          graft.operators.DedupOps.RowsPerBand)).as(Seq("band", "bh")))

    def bandJoin(slim: DataFrame): DataFrame = {
      val a = slim.select(col("gid").as("gid_a"), col("len").as("len_a"),
        col("band"), col("bh"))
      val b = slim.select(col("gid").as("gid_b"), col("len").as("len_b"),
        col("band"), col("bh"))
      a.hint("shuffle_hash").join(b, Seq("band", "bh"))
        .filter(col("gid_a") < col("gid_b") &&
          least(col("len_a"), col("len_b")).cast("double") >=
            greatest(col("len_a"), col("len_b")) * (t - 1e-3))
        .select("gid_a", "gid_b")
    }

    val q = graft.operators.DedupOps.queries
    // warm
    q("dedup_near")(spark, dir).count(); clear()

    val chans = Seq(
      "near-full-current   " -> (() => { clear()
        q("dedup_near")(spark, dir).count(); () }),
      "near-slim-onepass   " -> (() => { clear(); noop(slimOf(uniqDf)) }),
      "near-bandjoin-plain " -> (() => { clear()
        noop(bandJoin(slimOf(uniqDf))) }),
      "near-bandjoin-cached" -> (() => { clear()
        val s2 = slimOf(uniqDf).persist()
        noop(bandJoin(s2)) }),
      "near-verify-2bcast  " -> (() => { clear()
        val u = uniqDf
        val cand = bandJoin(slimOf(u))
        val inter = cand
          .join(broadcast(u.select(col("gid").as("gid_a"), col("th").as("th_a"))), "gid_a")
          .join(broadcast(u.select(col("gid").as("gid_b"), col("th").as("th_b"))), "gid_b")
          .filter(graft.functions.ArrayExprs.sortedJaccard(col("th_a"), col("th_b")) >= t - 1e-3)
          .select(col("gid_a"), col("gid_b"),
            round(graft.functions.ArrayExprs.sortedJaccard(col("th_a"), col("th_b")), 4).as("jaccard"))
          .filter(col("jaccard") >= t)
          .distinct()
        noop(inter) })
    )
    val acc = chans.map(_ => Vector.newBuilder[Double])
    for (_ <- 1 to passes; ((_, f), i) <- chans.zipWithIndex)
      acc(i) += time(f())
    for (((name, _), i) <- chans.zipWithIndex) {
      val v = acc(i).result()
      println(f"$name min=${v.min}%.2f med=${v.sorted.apply(v.length / 2)}%.2f " +
        s"all=${v.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
