package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manual decomposition probe for the `dedup_substring` /
  * `pipe_substring_report` span frame (r18 optimization round): times the
  * gram-generation stage and the duplicated-gram build separately, and
  * measures candidate rewrites side by side BEFORE any of them lands in
  * DedupOps (guide §1: measure first; §1.4: noop sink so the timed region
  * is the computation). Not a ScalaTest suite — run on demand with
  * `sbt "Test/runMain graft.SubstringProbe /root/testdata/sf0.1 5"`;
  * results go in OPTIMIZATION_r18.md.
  */
object SubstringProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val passes = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = graft.operators.DedupOps.SubstringK

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // current gram generator: xxhash64 over the k-token concat per position
    def gramsConcat: DataFrame = {
      val t = split(col("text"), " ")
      Tables.documents(spark, dir)
        .select(col("doc_id"), t.as("ts"))
        .filter(size(col("ts")) >= k)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(1), size(col("ts")) - (k - 1)),
            i => xxhash64(concat_ws(" ", slice(col("ts"), i, lit(k))))))
            .as(Seq("p0", "gh")))
        .select(col("doc_id"), (col("p0") + 1).cast("bigint").as("pos"),
          col("gh"))
    }

    // candidate: hash each token once, then hash the k-long slice natively
    // (xxhash64 over ARRAY<BIGINT> — 64 bytes per position, no re-concat)
    def gramsFold: DataFrame = {
      val th = transform(split(col("text"), " "), t => xxhash64(t))
      Tables.documents(spark, dir)
        .select(col("doc_id"), th.as("hs"))
        .filter(size(col("hs")) >= k)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(1), size(col("hs")) - (k - 1)),
            i => xxhash64(slice(col("hs"), i, lit(k)))))
            .as(Seq("p0", "gh")))
        .select(col("doc_id"), (col("p0") + 1).cast("bigint").as("pos"),
          col("gh"))
    }

    def dupCountDistinct(g: DataFrame): DataFrame =
      g.groupBy("gh").agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") > 1).select("gh")

    def dupMinMax(g: DataFrame): DataFrame =
      g.groupBy("gh").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
        .filter(col("mn") =!= col("mx")).select("gh")

    // warm codegen/parquet/shuffle paths once
    noop(gramsConcat); noop(gramsFold)
    noop(dupCountDistinct(gramsConcat)); noop(dupMinMax(gramsFold))
    graft.operators.DedupOps.queries("dedup_substring")(spark, dir).count()

    val chans = Seq(
      "grams-concat       " -> (() => noop(gramsConcat)),
      "grams-fold         " -> (() => noop(gramsFold)),
      "dup-concat-cdist   " -> (() => noop(dupCountDistinct(gramsConcat))),
      "dup-concat-minmax  " -> (() => noop(dupMinMax(gramsConcat))),
      "dup-fold-minmax    " -> (() => noop(dupMinMax(gramsFold))),
      "fullkey-current    " -> (() => {
        graft.operators.DedupOps.queries("dedup_substring")(spark, dir).count(); ()
      })
    )
    val acc = chans.map(_ => Vector.newBuilder[Double])
    for (_ <- 1 to passes; ((_, f), i) <- chans.zipWithIndex) {
      spark.sharedState.cacheManager.clearCache()
      acc(i) += time(f())
    }
    for (((name, _), i) <- chans.zipWithIndex) {
      val v = acc(i).result()
      println(f"$name min=${v.min}%.2f med=${v.sorted.apply(v.length / 2)}%.2f " +
        s"all=${v.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
