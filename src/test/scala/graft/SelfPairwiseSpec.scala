package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.functions.{ArrayExprs, Vectors}
import graft.operators.SimilarityOps
import graft.plans.SelfPairwise

/** The custom pairwise operator must be plan-visible and produce exactly
  * the rows the declarative BNLJ formulation produces. */
class SelfPairwiseSpec extends SparkSpec {

  test("sim_edges plans through SelfPairwiseExec") {
    val plan = SimilarityOps.queries("sim_edges")(spark, SfDir)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("SelfPairwise"), plan) // nodeName strips the Exec suffix
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("SelfPairwise(Cosine) equals the declarative BNLJ formulation exactly") {
    val e = Tables.embeddings(spark, SfDir).select(col("vec_id"), col("embedding"))
    val custom = SelfPairwise(e, SelfPairwise.Cosine, Double.MinValue, triangular = true)
      .select(col("src"), col("dst"), round(col("score") * 100, 4).as("similitud"))
    val a = e.select(col("vec_id").as("src"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("dst"), col("embedding").as("vb"))
    val declarative = a.join(b, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        Vectors.similitud(col("va"), col("vb")).as("similitud"))
    assert(custom.exceptAll(declarative).count() === 0)
    assert(declarative.exceptAll(custom).count() === 0)
  }

  test("NULL rows and unequal-length vectors drop exactly like the declarative form") {
    import spark.implicits._
    // id 1-2: normal 3-dim; id 3: NULL vec; id 4: 2-dim (ragged);
    // id 5: NULL id; id 6: all-zero (zero norm)
    val raw = Seq(
      (Option(1L), Option(Seq(1.0f, 2.0f, 3.0f))),
      (Option(2L), Option(Seq(2.0f, 4.0f, 6.0f))),
      (Option(3L), Option.empty[Seq[Float]]),
      (Option(4L), Option(Seq(1.0f, 2.0f))),
      (Option.empty[Long], Option(Seq(9.0f, 9.0f, 9.0f))),
      (Option(6L), Option(Seq(0.0f, 0.0f, 0.0f)))
    ).toDF("id", "vec")
    val custom = SelfPairwise(raw, SelfPairwise.Cosine, Double.MinValue, triangular = true)
      .select(col("src"), col("dst"), round(col("score") * 100, 4).as("similitud"))
    val a = raw.select(col("id").as("src"), col("vec").as("va"))
    val b = raw.select(col("id").as("dst"), col("vec").as("vb"))
    val declarative = a.join(b, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        Vectors.similitud(col("va"), col("vb")).as("similitud"))
      .filter(col("similitud").isNotNull)
    assert(custom.exceptAll(declarative).count() === 0)
    assert(declarative.exceptAll(custom).count() === 0)
    // the only surviving pair is (1,2): colinear, cosine 1
    assert(custom.count() === 1)
    assert(custom.first().getDouble(2) === 100.0)
  }

  test("SelfPairwise(Jaccard) equals the expression-based join exactly") {
    val th = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => xxhash64(t))).as("th"))
    val custom = SelfPairwise(th, SelfPairwise.Jaccard, 0.899, triangular = true)
      .select(col("src"), col("dst"), round(col("score"), 4).as("j"))
      .filter(col("j") >= 0.9)
    val a = th.select(col("doc_id").as("src"), col("th").as("tha"))
    val b = th.select(col("doc_id").as("dst"), col("th").as("thb"))
    val declarative = a.join(b, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        round(ArrayExprs.sortedJaccard(col("tha"), col("thb")), 4).as("j"))
      .filter(col("j") >= 0.9)
    assert(custom.exceptAll(declarative).count() === 0)
    assert(declarative.exceptAll(custom).count() === 0)
  }

  test("SelfPairwise(Hamming) equals the declarative popcount join exactly") {
    val sig = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        array(graft.functions.ArrayExprs.simHash(
          array_sort(transform(array_distinct(split(col("text"), " ")),
            t => xxhash64(t))), 32)).as("sh"))
    val custom = SelfPairwise(sig, SelfPairwise.Hamming, -3.0, triangular = true)
      .select(col("src"), col("dst"), (-col("score")).cast("int").as("hamming"))
    val a = sig.select(col("doc_id").as("src"), element_at(col("sh"), 1).as("sha"))
    val b = sig.select(col("doc_id").as("dst"), element_at(col("sh"), 1).as("shb"))
    val declarative = a.join(b, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("hamming"))
      .filter(col("hamming") <= 3)
    assert(custom.exceptAll(declarative).count() === 0)
    assert(declarative.exceptAll(custom).count() === 0)
  }

  test("SelfPairwise(Overlap) equals the declarative containment join exactly") {
    val th = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => xxhash64(t))).as("th"))
    // bounded (prefilter just below 1.0) vs the declarative form with no
    // early exit — both filtered on the exact rounded containment
    val custom = SelfPairwise(th, SelfPairwise.Overlap, 1.0 - 1e-9, triangular = true)
      .select(col("src"), col("dst"), round(col("score"), 4).as("c"))
      .filter(col("c") >= 1.0)
    val a = th.select(col("doc_id").as("src"), col("th").as("tha"))
    val b = th.select(col("doc_id").as("dst"), col("th").as("thb"))
    val declarative = a.join(b, col("src") < col("dst"))
      .select(col("src"), col("dst"),
        round(size(array_intersect(col("tha"), col("thb"))) /
          least(size(col("tha")), size(col("thb"))).cast("double"), 4).as("c"))
      .filter(col("c") >= 1.0)
    assert(custom.exceptAll(declarative).count() === 0)
    assert(declarative.exceptAll(custom).count() === 0)
  }

  test("SelfPairwise top-k mode equals the window top-k formulation exactly") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.embeddings(spark, SfDir).select(col("vec_id"), col("embedding"))
    val topk = SelfPairwise(e, SelfPairwise.Cosine, Double.MinValue,
      triangular = false, topK = 5)
      .select(col("src"), col("dst"), round(col("score") * 100, 4).as("similitud"))
    val a = e.select(col("vec_id").as("src"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("dst"), col("embedding").as("vb"))
    val w = Window.partitionBy("src").orderBy(col("similitud").desc, col("dst"))
    val windowed = a.join(b, col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        Vectors.similitud(col("va"), col("vb")).as("similitud"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(topk.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(topk).count() === 0)
  }

  test("Jaccard early-exit bound never drops a survivor (minScore prefilter)") {
    val th = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
        array_sort(transform(array_distinct(split(col("text"), " ")),
          t => xxhash64(t))).as("th"))
    // with the bound active (minScore 0.899) vs inactive (MinValue), the
    // rows surviving the exact rounded filter must be identical
    val bounded = SelfPairwise(th, SelfPairwise.Jaccard, 0.899, triangular = true)
      .select(col("src"), col("dst"), round(col("score"), 4).as("j"))
      .filter(col("j") >= 0.9)
    val unbounded = SelfPairwise(th, SelfPairwise.Jaccard, Double.MinValue, triangular = true)
      .select(col("src"), col("dst"), round(col("score"), 4).as("j"))
      .filter(col("j") >= 0.9)
    assert(bounded.exceptAll(unbounded).count() === 0)
    assert(unbounded.exceptAll(bounded).count() === 0)
  }

  test("in-loop threshold never drops a row that survives the exact filter") {
    val e = Tables.embeddings(spark, SfDir).select(col("vec_id"), col("embedding"))
    val pre = SelfPairwise(e, SelfPairwise.Cosine, (30.0 - 0.01) / 100.0, triangular = true)
      .select(col("src"), col("dst"), round(col("score") * 100, 4).as("similitud"))
      .filter(col("similitud") >= 30.0)
    val full = SelfPairwise(e, SelfPairwise.Cosine, Double.MinValue, triangular = true)
      .select(col("src"), col("dst"), round(col("score") * 100, 4).as("similitud"))
      .filter(col("similitud") >= 30.0)
    assert(pre.exceptAll(full).count() === 0)
    assert(full.exceptAll(pre).count() === 0)
  }
}
