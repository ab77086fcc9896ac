package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ArrayExprs

/** Deduplication suite (SURVEY.md §2 B1 + the north-star LLM-pipeline ops):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup — all over the `documents` table.
  *
  * Scale notes (100 TB design):
  *  - `dedup_exact` is a hash-shuffle groupBy on the text (at real scale,
  *    groupBy on a 128-bit fingerprint of the text — same plan shape, tiny
  *    shuffle payload; the fingerprint column is what `text_fingerprint`
  *    in [[TextOps]] computes).
  *  - Pairwise Jaccard runs on per-doc SORTED ARRAYS OF TOKEN HASHES
  *    (computed once per doc, tiny vs the pair count) compared by the
  *    codegen'd merge-loop [[ArrayExprs.sortedJaccard]] — the
  *    `array_intersect`-based formulation evaluates interpreted per pair
  *    and measured ~180 s at sf0.1; this one is a primitive long-merge
  *    inside whole-stage codegen.
  *  - `dedup_near` is the canonical LSH pipeline: signature scan →
  *    candidate pairs from an equi-join on (band, hash) carrying ONLY ids
  *    (the token arrays join back in afterwards, so the wide payload never
  *    rides the candidate shuffle) → exact Jaccard verification on
  *    candidates only. At 100 TB the band join is the only quadratic-risk
  *    step and its blow-up is bounded by bucket sizes, not n².
  *  - `dedup_simhash` packs a document into one 32-bit signature, so the
  *    candidate filter is a cheap integer XOR + popcount.
  *  - Thresholds are calibrated to the synthetic fixtures (vocab of ~31
  *    tokens makes random docs ~0.63 Jaccard-similar) but the plans are
  *    data-independent.
  */
object DedupOps {

  val NumHashes = 16
  val Bands     = 4 // 4 rows per band
  val JaccardThreshold = 0.9
  val HammingMax = 3

  private def toks(c: Column): Column = array_distinct(split(c, " "))

  /** Sorted distinct token-hash array — the per-doc shape every pairwise
    * variant compares. xxhash64 over a ~31-token vocabulary is
    * collision-free, so hash-set Jaccard == string-set Jaccard (the DuckDB
    * oracle computes the string form). */
  private def tokHashes(c: Column): Column =
    array_sort(transform(toks(c), t => xxhash64(t)))

  /** LSH band digests over the MinHash signature ([[ArrayExprs.minHashes]],
    * codegen'd — the HOF `transform(array_min(transform(xxhash64)))`
    * formulation cost ~12 s per pass at sf0.1): band b = hash of its 4
    * signature rows (a 4-element transform — negligible). */
  private def bandHashes(mh: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(b,
        element_at(mh, b * lit(4) + 1), element_at(mh, b * lit(4) + 2),
        element_at(mh, b * lit(4) + 3), element_at(mh, b * lit(4) + 4)))

  /** doc_id + sorted token-hash array, reused by the pairwise variants. */
  private def docHashes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), tokHashes(col("text")).as("th"))

  private def jaccard(a: Column, b: Column): Column =
    round(ArrayExprs.sortedJaccard(a, b), 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: canonical survivor = min doc_id per identical text.
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("text").agg(min("doc_id").as("doc_id"))
        .select("doc_id", "text")
        .orderBy("doc_id")),

    // MinHash + LSH banding: signature scan -> band equi-join over ids
    // only -> exact Jaccard verify on candidates. No oracle
    // (hash-impl-specific banding); the pair set is property-tested
    // against the exact pairwise `dedup_ngram` result in DedupSpec.
    "dedup_near" -> ((s, dir) => {
      // Only (doc_id, bands) ride the candidate shuffle — the wide
      // token-hash arrays stay out of the band join entirely and are
      // broadcast-joined back for the verify step (the signature table is
      // per-doc, orders of magnitude smaller than the candidate set). The
      // join keeps a candidate occurrence only when this band is the FIRST
      // band where the two signatures agree ([[ArrayExprs.firstEqualIndex]],
      // a 4-element codegen'd loop), so each pair surfaces exactly once and
      // no distinct shuffle is needed; exact Jaccard verification then runs
      // once per unique candidate pair.
      // (sig is recomputed by the two broadcast sides — tokenize+minhash
      // of the per-doc table is negligible next to the candidate join, and
      // skipping persist() avoids a cache entry outliving the query)
      val sig = docHashes(s, dir)
        .withColumn("bands", bandHashes(ArrayExprs.minHashes(col("th"), NumHashes)))
      val slim = sig.select(col("doc_id"), col("bands"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      val a = slim.select(col("doc_id").as("doc_a"), col("bands").as("bands_a"),
        col("band"), col("bh"))
      val b = slim.select(col("doc_id").as("doc_b"), col("bands").as("bands_b"),
        col("band"), col("bh"))
      val cand = a.join(b, Seq("band", "bh"))
        .filter(col("doc_a") < col("doc_b") &&
          ArrayExprs.firstEqualIndex(col("bands_a"), col("bands_b")) === col("band"))
        .select("doc_a", "doc_b")
      val th = sig.select(col("doc_id"), col("th"))
      cand
        .join(broadcast(th.select(col("doc_id").as("doc_a"), col("th").as("th_a"))), "doc_a")
        .join(broadcast(th.select(col("doc_id").as("doc_b"), col("th").as("th_b"))), "doc_b")
        .filter(ArrayExprs.sortedJaccard(col("th_a"), col("th_b")) >= JaccardThreshold - 1e-3)
        .select(col("doc_a"), col("doc_b"), jaccard(col("th_a"), col("th_b")).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-dup: 32-bit signatures, pairs within Hamming distance 3.
    // No oracle (hash-impl-specific); property-tested.
    "dedup_simhash" -> ((s, dir) => {
      val sig = docHashes(s, dir)
        .select(col("doc_id"), ArrayExprs.simHash(col("th"), 32).as("sh"))
      val a = sig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val b = sig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      a.join(b, col("doc_a") < col("doc_b"))
        .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .filter(col("hamming") <= HammingMax)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    }),

    // Exact pairwise token-set Jaccard >= 0.9 — the ground truth the LSH
    // variants approximate. Quadratic by construction; at scale `dedup_near`
    // is the candidate pre-filter and this expression verifies candidates.
    // Planned by the custom SelfPairwise operator (fused broadcast loop
    // with an in-loop prefilter 1e-3 below the threshold; the exact filter
    // runs on the rounded column, so values stay oracle-identical).
    "dedup_ngram" -> ((s, dir) =>
      graft.plans.SelfPairwise(docHashes(s, dir),
        graft.plans.SelfPairwise.Jaccard, JaccardThreshold - 1e-3, triangular = true)
        .select(col("src").as("doc_a"), col("dst").as("doc_b"),
          round(col("score"), 4).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .orderBy("doc_a", "doc_b")),

    // Embedding-cosine near-dup: top-100 most-similar document pairs by
    // embedding cosine (fixture cosines top out at ~51, so a fixed
    // threshold would be empty — rank instead).
    "dedup_embed" -> ((s, dir) =>
      SimilarityOps.pairwiseTriangular(s, dir, -200.0)
        .select(col("src").as("doc_a"), col("dst").as("doc_b"), col("similitud"))
        .orderBy(col("similitud").desc, col("doc_a"), col("doc_b"))
        .limit(100)),

    // Near-dup CLUSTER assignment: connected components over the exact
    // Jaccard >= 0.9 pair graph (the `dedup_ngram` edge set); every doc
    // gets cluster_id = min doc_id of its component (singletons keep their
    // own id). This is the step that turns a pair list into per-cluster
    // survivor selection in a dedup pipeline.
    //
    // Spark-first CC: iterative min-label propagation — each round every
    // node takes min(own label, neighbors' labels), a shuffle join per
    // round, until a fixpoint (the GraphX/Pregel CC algorithm expressed
    // relationally). Rounds = graph diameter; near-dup components are
    // dup cliques, so 1-2 rounds in practice. The edge set is persisted
    // (it is the expensive quadratic pass; at scale the LSH candidate
    // pairs of `dedup_near` take its place) and each round's labels are
    // localCheckpoint'ed so lineage stays flat no matter how many rounds.
    "dedup_clusters" -> ((s, dir) => {
      // ONE quadratic pass: each surviving pair is exploded into both
      // orientations, a self-loop is added per doc, and the adjacency is
      // persisted — it is read once per propagation round and must not
      // re-run the pairwise join.
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val edges = graft.plans.SelfPairwise(docHashes(s, dir),
        graft.plans.SelfPairwise.Jaccard, JaccardThreshold - 1e-3, triangular = true)
        .select(col("src"), col("dst"), round(col("score"), 4).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(explode(array(
          struct(col("src").as("a"), col("dst").as("b")),
          struct(col("dst").as("a"), col("src").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .union(docs.select(col("doc_id").as("a"), col("doc_id").as("b")))
        .persist()
      // Min-label propagation with the self-loop folded into the
      // adjacency: new label = min over {labels of b : (a,b) in edges} is
      // ONE broadcast join + ONE aggregation per round (the self-loop
      // replaces the old least()/left-join recombination step).
      // Convergence: labels only ever decrease, so sum(lbl) is strictly
      // decreasing until the fixpoint — comparing two Long sums per round
      // replaces the filter+count job over a prev/next join.
      var labels = docs.select(col("doc_id").as("id"), col("doc_id").as("lbl"))
        .localCheckpoint()
      def lblSum(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(sum(col("lbl"))).first().getLong(0)
      var prevSum = lblSum(labels)
      var rounds = 0
      var converged = false
      while (!converged && rounds < 50) {
        // labels is one row per doc — broadcast it so the (much larger)
        // edge list is never shuffled; the partial min() then shrinks the
        // per-round shuffle to one row per (partition, node). A
        // checkpointed frame has no stats, so the hint is load-bearing.
        // (At a scale where the label table itself outgrows broadcast,
        // drop the hint and this becomes the standard shuffle-join CC.)
        val next = edges.join(broadcast(labels), col("b") === col("id"))
          .groupBy(col("a")).agg(min(col("lbl")).as("lbl"))
          .select(col("a").as("id"), col("lbl"))
          .localCheckpoint()
        val nextSum = lblSum(next)
        converged = nextSum == prevSum
        prevSum = nextSum
        labels = next
        rounds += 1
      }
      edges.unpersist()
      labels.select(col("id").as("doc_id"), col("lbl").as("cluster_id"))
        .orderBy("doc_id")
    })
  )

  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY doc_id",
    "dedup_ngram" ->
      s"""SELECT * FROM (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  round(1.0 * len(list_intersect(list_distinct(string_split(a.text,' ')),
                                                 list_distinct(string_split(b.text,' ')))) /
                        len(list_distinct(string_split(a.text,' ') || string_split(b.text,' '))), 4) AS jaccard
           FROM documents a, documents b WHERE a.doc_id < b.doc_id
         ) WHERE jaccard >= $JaccardThreshold ORDER BY doc_a, doc_b""",
    "dedup_embed" ->
      """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])) * 100, 4) AS similitud
         FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
         ORDER BY similitud DESC, doc_a, doc_b LIMIT 100""",
    // transitive closure via recursive CTE — min reachable id per node is
    // exactly the connected-component min label
    "dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
            SELECT src, dst FROM (
              SELECT a.doc_id AS src, b.doc_id AS dst,
                     round(1.0 * len(list_intersect(list_distinct(string_split(a.text,' ')),
                                                    list_distinct(string_split(b.text,' ')))) /
                           len(list_distinct(string_split(a.text,' ') || string_split(b.text,' '))), 4) AS jaccard
              FROM documents a, documents b WHERE a.doc_id < b.doc_id
            ) WHERE jaccard >= $JaccardThreshold
          ), edges AS (
            SELECT src AS a, dst AS b FROM pairs
            UNION ALL SELECT dst AS a, src AS b FROM pairs
          ), reach(id, r) AS (
            SELECT doc_id, doc_id FROM documents
            UNION
            SELECT e.a, reach.r FROM reach JOIN edges e ON e.b = reach.id
          )
          SELECT id AS doc_id, min(r) AS cluster_id
          FROM reach GROUP BY id ORDER BY doc_id"""
  )
}
