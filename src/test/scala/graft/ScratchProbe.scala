package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Throwaway diagnostic — deleted before commit. */
class ScratchProbe extends SparkSpec {
  test("probe candidate volumes by canonical order at sf0.1") {
    val dir = "/root/testdata/sf0.1"
    val t = DedupOps.JaccardThreshold
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), array_sort(transform(
        array_distinct(split(col("text"), " ")), x => xxhash64(x))).as("th"))
    val uniq = docs.groupBy(col("th")).agg(min("doc_id").as("gid"))
      .select("gid", "th").persist()
    println(s"uniq sets: ${uniq.count()}")
    def cands(src: org.apache.spark.sql.DataFrame): Long = {
      val pref = src.select(col("gid"), size(col("rth")).as("len"),
        posexplode(slice(col("rth"), lit(1),
          (size(col("rth")) - ceil(lit(t * t) * size(col("rth"))) + 1)
            .cast("int"))).as(Seq("pos", "tok")))
      val a = pref.select(col("gid").as("gid_a"), col("len").as("len_a"),
        col("pos").as("pos_a"), col("tok"))
      val b = pref.select(col("gid").as("gid_b"), col("len").as("len_b"),
        col("pos").as("pos_b"), col("tok"))
      a.hint("shuffle_hash").join(b, Seq("tok"))
        .filter(col("gid_a") < col("gid_b") &&
          least(col("len_a"), col("len_b")).cast("double") >=
            greatest(col("len_a"), col("len_b")) * (t - 1e-3) &&
          least(col("len_a") - col("pos_a"), col("len_b") - col("pos_b"))
            .cast("double") >= least(col("len_a"), col("len_b")) * (t - 1e-3))
        .select("gid_a", "gid_b").count()
    }
    val t0 = System.nanoTime()
    val hashC = cands(uniq.select(col("gid"), col("th").as("rth")))
    val t1 = System.nanoTime()
    val toks = uniq.select(col("gid"), explode(col("th")).as("tok"))
    val dfTab = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = toks.join(broadcast(dfTab), "tok").groupBy("gid")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("rk"))
      .select(col("gid"), transform(col("rk"), r => r.getField("tok")).as("rth"))
      .persist()
    ranked.count()
    val t2 = System.nanoTime()
    val dfC = cands(ranked)
    val t3 = System.nanoTime()
    // long-rank variant: rank the vocab once, collect plain longs
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("df"), col("tok"))
    val rankTab = dfTab.select(col("tok"), row_number().over(w).cast("long").as("rk"))
    val ranked2 = toks.join(broadcast(rankTab), "tok").groupBy("gid")
      .agg(array_sort(collect_list(col("rk"))).as("rth")).persist()
    ranked2.count()
    val t4 = System.nanoTime()
    val dfC2 = cands(ranked2)
    val t5 = System.nanoTime()
    println(f"hash-order cands=$hashC (${(t1 - t0) / 1e9}%.2f s); " +
      f"rank build ${(t2 - t1) / 1e9}%.2f s; df-order cands=$dfC (${(t3 - t2) / 1e9}%.2f s); " +
      f"longrank build ${(t4 - t3) / 1e9}%.2f s; cands=$dfC2 (${(t5 - t4) / 1e9}%.2f s)")
  }
}
