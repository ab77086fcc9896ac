package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** Similarity-search semantics on sf0.001: top-k shape, ANN recall of the
  * IVF path against the brute-force baseline. */
class SimilaritySpec extends SparkSpec {

  private def q(name: String) = SimilarityOps.queries(name)(spark, SfDir)

  test("sim_topk returns at most 5 neighbors per node, ranked") {
    val perSrc = q("sim_topk").groupBy("src").agg(
      count(lit(1)).as("n"), max("rn").as("max_rn"))
    assert(perSrc.filter(col("n") > 5).count() === 0)
    assert(perSrc.filter(col("max_rn") > 5).count() === 0)
  }

  test("ml_ndcg matches a hand-computed NDCG over the brute-force top-10") {
    val row = q("ml_ndcg").head()
    assert(row.getAs[Long]("n_cands") === 10L)
    val (dcg, idcg, ndcg) = (row.getAs[Double]("dcg"),
      row.getAs[Double]("idcg"), row.getAs[Double]("ndcg"))
    assert(idcg >= dcg - 1e-9, "ideal ranking must dominate")
    assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9)
    // replay the metric in Scala from ann_brute's ranking semantics
    val probe = Tables.embeddings(spark, SfDir)
      .filter(col("vec_id") === 42).head()
    val qlabel = probe.getAs[Int]("label")
    val qv = probe.getSeq[Float](probe.fieldIndex("embedding")).toArray
    val cands = Tables.embeddings(spark, SfDir).filter(col("vec_id") =!= 42)
      .collect().map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).toArray
        val dot = qv.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val na = math.sqrt(qv.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        val sim = BigDecimal(dot / (na * nb) * 100)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getAs[Long]("vec_id"), r.getAs[Int]("label"), sim)
      }
      .sortBy { case (id, _, sim) => (-sim, id) }.take(10)
    val gains = cands.map { case (_, l, _) =>
      math.max(0, 3 - math.abs(l - qlabel)) match {
        case 3 => 7.0; case 2 => 3.0; case 1 => 1.0; case _ => 0.0
      }
    }
    val ws = SimilarityOps.NdcgWeights.map(_._2)
    val expDcg = gains.zip(ws).map { case (g, w) => g * w }.sum
    val expIdcg = gains.sorted.reverse.zip(ws).map { case (g, w) => g * w }.sum
    assert(math.abs(dcg - expDcg) < 1e-4, s"dcg $dcg vs $expDcg")
    assert(math.abs(idcg - expIdcg) < 1e-4, s"idcg $idcg vs $expIdcg")
    if (expIdcg > 0)
      assert(math.abs(ndcg - expDcg / expIdcg) < 1e-4)
  }

  test("ml_mrr is the reciprocal rank of the first same-label candidate") {
    val row = q("ml_mrr").head()
    assert(row.getAs[Long]("n_cands") === 10L)
    val hits = row.getAs[Long]("hits")
    assert(hits >= 0L && hits <= 10L)
    val mrr = row.getAs[Double]("mrr")
    if (row.isNullAt(row.fieldIndex("first_rel_rank"))) {
      assert(hits === 0L && mrr === 0.0)
    } else {
      val fr = row.getAs[Int]("first_rel_rank")
      assert(fr >= 1 && fr <= 10 && hits >= 1L)
      assert(math.abs(mrr - BigDecimal(1.0 / fr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"mrr $mrr vs 1/$fr")
    }
  }

  test("TopK partial aggregator matches the window top-k formulation") {
    // generic shuffle-topk component (map-side bounded buffer): no longer
    // on the sim_topk path (SelfPairwise top-k mode replaced it) but kept
    // as the reusable aggregation primitive for non-broadcastable inputs
    import org.apache.spark.sql.expressions.Window
    // built twice: SelfPairwiseNode generates its output attrs, so a
    // self-combination of one instance trips conflicting-reference checks
    // (leaf relations dedup via MultiInstanceRelation; custom unary nodes
    // don't) — two instances give each side independent exprIds
    val pairs = SimilarityOps.pairwise(spark, SfDir)
    val pairs2 = SimilarityOps.pairwise(spark, SfDir)
    val viaAgg = pairs.groupBy("src")
      .agg(graft.functions.TopK.topK(3)(col("dst"), col("similitud")).as("top"))
      .select(col("src"),
        posexplode(arrays_zip(col("top.ids"), col("top.scores"))).as(Seq("pos", "e")))
      .select(col("src"), col("e.ids").as("dst"), col("e.scores").as("similitud"))
    val w = Window.partitionBy("src").orderBy(col("similitud").desc, col("dst"))
    val viaWindow = pairs2.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(viaAgg.exceptAll(viaWindow).count() === 0)
    assert(viaWindow.exceptAll(viaAgg).count() === 0)
  }

  test("sim_edges is triangular (src < dst) and above threshold") {
    val e = q("sim_edges")
    assert(e.filter(col("src") >= col("dst")).count() === 0)
    assert(e.filter(col("similitud") < SimilarityOps.EdgeThreshold).count() === 0)
  }

  test("ann_ivf (nprobe=3) recalls a useful share of the brute-force top-10") {
    val brute = q("ann_brute").select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = q("ann_ivf").select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = ivf.intersect(brute).size
    // the fixture embeddings are near-uniform (max pairwise cosine ~0.5,
    // neighbors spread across lists), the adversarial case for IVF —
    // probing 3/10 lists must still beat the ~30% uniform baseline
    assert(recall >= 3, s"IVF recalled only $recall/10 of brute-force top-10")
    // and every IVF hit must be a genuine similarity (ranked output)
    assert(ivf.size === 10)
  }

  test("ann_pq (M=4, K=16, ADC + exact re-rank) recalls the exact-L2 top-10") {
    import graft.functions.Vectors
    import graft.Tables
    val e = Tables.embeddings(spark, SfDir).select(col("vec_id"), col("embedding"))
    val qv = e.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
    val exact = e.filter(col("vec_id") =!= 42).crossJoin(broadcast(qv))
      .select(col("vec_id"), Vectors.l2sq(col("embedding"), col("qv")).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val pq = q("ann_pq").collect()
    assert(pq.length === 10)
    // re-ranked output is ordered by exact L2 asc
    val ds = pq.map(_.getAs[Double]("l2sq"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a <= b }, "ranked asc")
    val recall = pq.map(_.getLong(0)).toSet.intersect(exact).size
    // 4-byte codes over 64 dims is a 64× compression; with a 50-candidate
    // ADC cut and exact re-rank the true top-10 must mostly survive
    assert(recall >= 6, s"PQ recalled only $recall/10 of the exact-L2 top-10")
  }

  test("ann_lsh (8-bit multi-probe) returns 10 ranked true-cosine results") {
    val brute = q("ann_brute").collect()
    val lsh = q("ann_lsh").collect()
    assert(lsh.length === 10)
    // scores are true cosines, so none can exceed the brute-force best
    val bruteTop = brute.head.getAs[Double]("sim")
    val sims = lsh.map(_.getAs[Double]("sim"))
    assert(sims.forall(_ <= bruteTop))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranked desc")
    // every LSH result must carry the same sim the brute-force pass
    // computed for that vec_id (it IS the exact cosine, just bucket-pruned)
    val bruteSims = brute.map(r => r.getLong(0) -> r.getAs[Double]("sim")).toMap
    lsh.foreach { r =>
      bruteSims.get(r.getLong(0)).foreach(b => assert(b === r.getAs[Double]("sim")))
    }
  }

  test("ann_prefiltered: all results match the predicate and contain the filtered brute top") {
    import org.apache.spark.sql.functions._
    val rows = q("ann_prefiltered").collect()
    assert(rows.length === 10)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranked desc")
    // pre-filter semantics: every result passes the predicate — compare
    // against brute-force restricted to the probe's label
    val e = Tables.embeddings(spark, SfDir)
    val qlabel = e.filter(col("vec_id") === 42).select("label")
      .collect().head.getAs[Number](0).longValue
    val ids = rows.map(_.getLong(0)).toSet
    val labelIds = e.filter(col("vec_id") =!= 42)
      .filter(col("label") === qlabel).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(labelIds), "a result escaped the predicate")
    // and the unfiltered brute top-10 generally CANNOT satisfy the
    // predicate set — the post-filter recall trap this key exists for:
    // its label-matching subset must be <= the prefiltered count, and
    // every prefiltered sim must be <= the brute best
    val brute = q("ann_brute").collect()
    assert(sims.head <= brute.head.getAs[Double]("sim") + 1e-12)
  }

  test("ml_recall_at_k: bounds hold and one probe replays brute-force") {
    import org.apache.spark.sql.functions._
    val rows = q("ml_recall_at_k").collect()
    assert(rows.length === 10, "one row per probe")
    rows.foreach { r =>
      val hits = r.getAs[Long]("hits"); val nRel = r.getAs[Long]("n_rel")
      assert(hits <= math.min(10L, nRel), s"hits $hits exceed min(10, $nRel)")
      Option(r.getAs[Any]("recall_at_10")).foreach { v =>
        val rec = v.asInstanceOf[Double]
        assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $rec")
      }
    }
    // brute replay for probe qid=0: rank all others by (rounded sim
    // desc, vec_id), count same-label in the top 10
    val e = Tables.embeddings(spark, SfDir)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
    val probe = e.find(_.getLong(0) == 0L).get
    val qv = probe.getSeq[Float](1).toArray.map(_.toDouble)
    val qlabel = probe.getAs[Number](2).longValue
    def cos(a: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * qv(i); na += a(i) * a(i); nb += qv(i) * qv(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val ranked = e.filter(_.getLong(0) != 0L)
      .map { r =>
        val sim = BigDecimal(cos(r.getSeq[Float](1).toArray.map(_.toDouble)) * 100)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getLong(0), r.getAs[Number](2).longValue, sim)
      }
      .sortBy { case (id, _, sim) => (-sim, id) }
    val wantHits = ranked.take(10).count(_._2 == qlabel).toLong
    val got = rows.find(_.getAs[Long]("qid") == 0L).get
    assert(got.getAs[Long]("hits") === wantHits,
      s"probe 0: got ${got.getAs[Long]("hits")} hits, replay says $wantHits")
  }
}
