package graft

import org.apache.spark.sql.functions._

import graft.operators.ProvidenciasOps

/** Invariants of the graph extensions on sf0.001 — complements the DuckDB
  * oracle (which pins values) with the structural properties a graph
  * consumer relies on. */
class GraphSpec extends SparkSpec {

  private def q(name: String) = ProvidenciasOps.queries(name)(spark, SfDir)

  test("graph_bipartite_proj weights equal the distinct shared-user counts") {
    val proj = q("graph_bipartite_proj").persist()
    assert(proj.filter(col("t1") >= col("t2")).count() === 0,
      "edges must be oriented t1 < t2, no self-loops")
    assert(proj.filter(col("n_shared_users") < 1).count() === 0)
    // spot-check the heaviest edge against a direct two-sided count
    val top = proj.orderBy(col("n_shared_users").desc, col("t1"), col("t2")).head()
    val (t1, t2) = (top.getString(0), top.getString(1))
    val ev = Tables.events(spark, SfDir)
    val u1 = ev.filter(col("event_type") === t1).select("user_id").distinct()
    val u2 = ev.filter(col("event_type") === t2).select("user_id").distinct()
    assert(top.getAs[Long]("n_shared_users") === u1.join(u2, "user_id").count())
    proj.unpersist()
  }

  test("graph_assortativity equals native corr over the directed stubs") {
    import graft.operators.SimilarityOps
    val row = q("graph_assortativity").head()
    val r = row.getAs[Double]("assortativity")
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9, "Pearson r must be in [-1,1]")
    // rebuild the (deg(src), deg(dst)) stub relation and compare the
    // exact-DECIMAL closed form against Spark's native corr()
    val e = SimilarityOps.pairwiseTriangular(spark, SfDir, SimilarityOps.EdgeThreshold)
      .filter(col("similitud") >= SimilarityOps.EdgeThreshold)
      .select(col("src"), col("dst")).persist()
    val nEdges = e.count()
    assert(row.getAs[Long]("n_edges") === nEdges)
    val deg = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val directed = e.select(col("src").as("a"), col("dst").as("b"))
      .union(e.select(col("dst").as("a"), col("src").as("b")))
    val native = directed
      .join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .agg(corr(col("da"), col("db"))).head().getDouble(0)
    assert(math.abs(r - native) < 1e-5,
      s"closed form $r drifted from native corr $native")
    e.unpersist()
  }

  test("graph_pagerank conserves probability mass and covers every node") {
    val pr = q("graph_pagerank").persist()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(pr.count() === n, "one rank per node, isolated nodes included")
    // dangling redistribution keeps the rank vector a distribution
    val mass = pr.agg(sum("pagerank")).head.getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-3, s"rank mass was $mass")
    assert(pr.filter(col("pagerank") <= 0).count() === 0, "ranks are positive")
    // isolated nodes all share the same (minimal) rank; any linked node
    // with degree > 0 receives at least the teleport floor
    val floor = 0.15 / n
    assert(pr.filter(col("pagerank") < floor - 1e-9).count() === 0)
    pr.unpersist()
  }

  test("graph_kcore survivors satisfy the peel threshold and refine the degree filter") {
    val k = ProvidenciasOps.KCoreK
    val kc = q("graph_kcore").persist()
    assert(kc.count() > 0, "fixture graph must have a non-empty 4-core")
    // every survivor meets the threshold in the final induced subgraph
    assert(kc.filter(col("core_degree") < k).count() === 0)
    val deg = q("graph_degree").withColumnRenamed("id", "node_id")
    val joined = kc.join(deg, "node_id").persist()
    assert(joined.count() === kc.count(), "survivors must exist in the graph")
    // peeling only removes: a survivor's full-graph degree bounds its
    // core degree from above, and itself must be >= k
    assert(joined.filter(col("core_degree") > col("degree")).count() === 0)
    assert(joined.filter(col("degree") < k).count() === 0)
    joined.unpersist(); kc.unpersist()
  }

  test("graph_components labels both endpoints of every edge identically") {
    import graft.operators.SimilarityOps
    val comp = q("graph_components").persist()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(comp.count() === n, "one label per node, singletons included")
    val edges = SimilarityOps.pairwiseTriangular(spark, SfDir, SimilarityOps.EdgeThreshold)
      .filter(col("similitud") >= SimilarityOps.EdgeThreshold)
      .select("src", "dst")
    val violations = edges
      .join(comp.withColumnRenamed("node_id", "src")
        .withColumnRenamed("component_id", "c_src"), "src")
      .join(comp.withColumnRenamed("node_id", "dst")
        .withColumnRenamed("component_id", "c_dst"), "dst")
      .filter(col("c_src") =!= col("c_dst"))
      .count()
    assert(violations === 0, s"$violations edges cross component labels")
    // every component label is the min member id (canonical labeling)
    val badLabel = comp.groupBy("component_id").agg(min("node_id").as("mn"))
      .filter(col("component_id") =!= col("mn")).count()
    assert(badLabel === 0, "component label must be the component's min node id")
    comp.unpersist()
    ()
  }

  test("graph_triangles credits exactly the mutually-adjacent triples") {
    val tri = q("graph_triangles")
    // total credit is divisible by 3 (each triangle credits 3 nodes once)
    val total = tri.agg(sum("n_tri")).head.getLong(0)
    assert(total % 3 === 0, s"total triangle credit $total not divisible by 3")
    // every credited node has degree >= 2 in the thresholded graph
    val deg = q("graph_degree")
    assert(tri.join(deg, tri("node_id") === deg("id"))
      .filter(col("degree") < 2).count() === 0)
  }

  test("graph_label_prop communities refine connected components") {
    val lp = q("graph_label_prop").persist()
    val n = Tables.embeddings(spark, SfDir).count()
    assert(lp.count() === n, "one community label per node")
    // a label can only travel along edges, so after any number of
    // supersteps a node's community label names a node of its own
    // connected component — communities partition components, never
    // straddle them
    val comp = q("graph_components")
    val straddle = lp
      .join(comp, lp("node_id") === comp("node_id"))
      .select(lp("community"), comp("component_id").as("c_node"))
      .join(comp.withColumnRenamed("node_id", "community")
        .withColumnRenamed("component_id", "c_lbl"), "community")
      .filter(col("c_node") =!= col("c_lbl"))
      .count()
    assert(straddle === 0, s"$straddle labels crossed component boundaries")
    // isolated nodes (degree 0) keep their own id as community
    val deg = q("graph_degree")
    val isolated = lp.join(deg, lp("node_id") === deg("id"), "left_anti")
    assert(isolated.filter(col("community") =!= col("node_id")).count() === 0,
      "an isolated node has no neighbors to adopt a label from")
    lp.unpersist()
    ()
  }

  test("labelPropagate converges each clique to its min id on a known graph") {
    // two disjoint triangles + one isolated node — hand-computable:
    // superstep 1 sends every triangle member its neighbors' min id,
    // superstep 2 floods the triangle's global min to all three members
    import spark.implicits._
    val tri = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (10L, 11L), (10L, 12L), (11L, 12L))
    val e = tri.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("s", "d")
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L, 99L).toDF("id")
    val got = graft.operators.ProvidenciasOps.labelPropagate(e, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("graph_hits authority scores equal the brute-force two-sweep HITS") {
    // replay h0=1 → a1 → h1 → a2 over the collected bipartite edge set
    val got = q("graph_hits").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("a1"), r.getAs[Long]("a2"))).toMap
    val ut = Tables.events(spark, SfDir)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val a1 = ut.groupBy(_._2).map { case (t, es) => t -> es.length.toLong }
    val h1 = ut.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => a1(e._2)).sum
    }
    val a2 = ut.groupBy(_._2).map { case (t, es) =>
      t -> es.map(e => h1(e._1)).sum
    }
    assert(got.keySet === a2.keySet)
    got.foreach { case (t, (g1, g2)) =>
      assert(g1 === a1(t), s"$t a1")
      assert(g2 === a2(t), s"$t a2")
    }
  }

  test("graph_adamic_adar matches a direct replay over the edge set") {
    val got = q("graph_adamic_adar").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_common"), r.getAs[Double]("adamic_adar"))).toMap
    val edges = graft.operators.SimilarityOps.queries("sim_edges")(spark, SfDir)
      .collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val brute = (for {
      a <- adj.keys; b <- adj.keys if a < b
      common = adj(a) intersect adj(b) if common.size >= 3
    } yield {
      val aa = common.toSeq.map { z =>
        BigDecimal(1.0 / math.log(adj(z).size.toDouble))
          .setScale(10, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
      (a, b) -> (common.size.toLong,
        BigDecimal(aa).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toMap
    assert(got.keySet === brute.keySet)
    got.foreach { case (k, (n, s)) =>
      assert(n === brute(k)._1, s"$k common count")
      assert(math.abs(s - brute(k)._2) < 1e-5, s"$k score $s vs ${brute(k)._2}")
    }
  }

  test("graph_component_sizes is the histogram of the component labels") {
    val hist = q("graph_component_sizes").collect()
      .map(r => r.getAs[Long]("csize") -> r.getAs[Long]("n_components")).toMap
    val labels = q("graph_components").collect()
      .map(_.getAs[Long]("component_id"))
    val brute = labels.groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, xs) => sz -> xs.size.toLong }
    assert(hist === brute)
    val nodes = Tables.embeddings(spark, SfDir).count()
    assert(hist.map { case (sz, n) => sz * n }.sum === nodes,
      "component sizes must partition the node set")
  }

  test("graph_transitivity is coherent with the per-node triangle counts") {
    val r = q("graph_transitivity").head()
    val triSum = q("graph_triangles").collect().map(_.getAs[Long]("n_tri")).sum
    // each triangle contributes one count at each of its three corners
    assert(3L * r.getAs[Long]("n_triangles") === triSum,
      "global triangle count must be the corner-count sum over 3")
    val c = r.getAs[Double]("transitivity")
    assert(c >= 0.0 && c <= 1.0 + 1e-9, "closed wedges are a subset of wedges")
    assert(r.getAs[Long]("n_wedges") >= r.getAs[Long]("n_triangles") * 3)
  }
}
