package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{ArrayExprs, Num}

/** Deduplication suite (SURVEY.md §2 B1 + the north-star LLM-pipeline ops):
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
  * near-dup — all over the `documents` table.
  *
  * Scale notes (100 TB design):
  *  - `dedup_exact` is a hash-shuffle groupBy on a 64-bit fingerprint of
  *    the text (at 100 TB, a 128-bit digest — same plan shape): the
  *    shuffle keys are 8 bytes and map-side combine drops duplicate
  *    bodies before the exchange.
  *  - **Collapse-then-compare**: every near-dup variant first groups docs
  *    by their exact token-hash set ([[collapse]]) and runs the quadratic /
  *    LSH machinery over UNIQUE sets only, expanding surviving set-pairs
  *    back to member doc-pairs at the end. Real corpora are dominated by
  *    exact duplicates (boilerplate, mirrors), so the collapse is the
  *    single highest-leverage step in a production dedup pipeline: the
  *    candidate space shrinks quadratically in the dup factor BEFORE any
  *    pairwise work, and identical docs never reach the LSH join at all
  *    (measured here: a 248-doc clique at sf0.1 alone put 61k rows per
  *    band into the bucket join pre-collapse). The expansion joins are
  *    map-side (group table broadcasts; at 100 TB it shuffle-joins on
  *    gid — linear either way).
  *  - Pairwise Jaccard runs on per-doc SORTED ARRAYS OF TOKEN HASHES
  *    (computed once per doc, tiny vs the pair count) compared by the
  *    codegen'd merge-loop [[ArrayExprs.sortedJaccard]] — the
  *    `array_intersect`-based formulation evaluated interpreted per pair
  *    and measured ~180 s at sf0.1; this one is a primitive long-merge
  *    inside whole-stage codegen.
  *  - `dedup_near` is the canonical LSH pipeline: signature scan →
  *    candidate pairs from an equi-join on (band, hash) carrying ONLY ids
  *    (the token arrays join back in afterwards, so the wide payload never
  *    rides the candidate shuffle) → exact Jaccard verification on
  *    candidates only. Banding is 24 bands × 16 rows (384 MinHashes):
  *    the fixture's similarity histogram is DENSE right below the 0.9
  *    threshold (at sf0.1, 480k unique-set pairs sit in [0.8,0.85) and
  *    190k in [0.85,0.9)), so the S-curve must be steep — this choice
  *    keeps miss probability at s=0.905 under 0.1% while passing only
  *    ~1M of 7.7M unique-set pairs as candidates. The original 4×4
  *    banding let ~95% of pairs through, making the band join strictly
  *    worse than the fused brute-force pass it was meant to avoid;
  *    signature cost is linear (384 × |tokens| per UNIQUE set) and
  *    codegen'd, i.e. noise in the scan.
  *  - `dedup_simhash` packs a document into one 32-bit signature, so the
  *    candidate filter is a cheap integer XOR + popcount.
  *  - Thresholds are calibrated to the synthetic fixtures (vocab of ~31
  *    tokens makes random docs ~0.63 Jaccard-similar) but the plans are
  *    data-independent.
  */
object DedupOps {

  val Bands       = 24
  val RowsPerBand = 16
  val NumHashes   = Bands * RowsPerBand
  val JaccardThreshold = 0.9
  val HammingMax = 3

  /** `dedup_substring`'s window width in tokens. Lee et al. use 50 BPE
    * tokens; the fixture docs average ~55 whitespace tokens, so 8 keeps
    * the gram space (31⁸ ≈ 8.5e11 over the synthetic vocabulary) sparse
    * enough that only genuinely shared phrases collide while still
    * producing non-trivial span structure. */
  val SubstringK = 8

  /** `dedup_semantic`'s within-cluster cosine×100 cutoff — calibrated to
    * the synthetic Gaussian fixture (pair cosines top out near 55; real
    * duplicate corpora use ~0.95·100). The plan is threshold-independent. */
  val SemanticDupSim = 35.0

  private def toks(c: Column): Column = array_distinct(split(c, " "))

  /** `dedup_simhash`'s 32-bit per-token hash: the first 8 hex chars of
    * `hcol` (an md5 hex string) parsed as an integer — the SAME SQL text
    * runs on Spark and DuckDB (`instr`/`substring` behave identically),
    * so every downstream vote, bit, and Hamming distance replays exactly
    * (the agg_bloom_members hex-slice discipline, widened to 8 chars for
    * a 32-bit draw). */
  private[graft] def hex8Sql(hcol: String): String =
    graft.functions.HexSql.intAt(hcol, 1, 8)

  /** Bit `j`'s SimHash majority vote over a group's token hashes: +1 when
    * the bit is set, −1 when clear. `FLOOR(hv / 2^j)` is exact (hv < 2³²,
    * power-of-two divisor) and floors identically on both engines —
    * unlike a bare CAST, which truncates on Spark but ROUNDS on DuckDB. */
  private[graft] def simhashVoteSql(j: Int): String =
    s"sum(CASE WHEN CAST(FLOOR(hv / ${1L << j}.0) AS BIGINT) % 2 = 1 " +
      "THEN 1 ELSE -1 END)"

  /** Pack the 32 vote columns into the signature word: bit j set iff the
    * vote is strictly positive (ties → 0, identically on both engines). */
  private[graft] val simhashPackSql: String =
    (0 until 32).map(j => s"(CASE WHEN v$j > 0 THEN ${1L << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Sorted distinct token-hash array — the per-doc shape every pairwise
    * variant compares. xxhash64 over a ~31-token vocabulary is
    * collision-free, so hash-set Jaccard == string-set Jaccard (the DuckDB
    * oracle computes the string form). */
  private def tokHashes(c: Column): Column =
    array_sort(transform(toks(c), t => xxhash64(t)))

  /** 64-bit fingerprint of the distinct-token SET of a text column — the
    * collapse key the whole dedup family groups by, exposed so the
    * streaming side ([[graft.streaming.EventStreams.dedupByContent]])
    * shares the definition of "same content" with the batch side by
    * construction rather than by copy. */
  private[graft] def contentFingerprint(c: Column): Column =
    xxhash64(tokHashes(c))

  /** LSH band digests straight from the token-hash set — MinHash and the
    * per-band fold run in ONE fused codegen loop
    * ([[ArrayExprs.minHashBands]]); see that Scaladoc for why composing
    * `minHashes` + per-band `xxhash64(element_at(…))` Columns is
    * quadratically wrong.
    *
    * Measured dead end (this round): one-permutation MinHash (one hash
    * pass into K = bands·rows bins + densification) promised a 384×
    * cheaper signature, but at this corpus's set size (~200 unique tokens
    * vs K = 384 bins) most bins densify, densified rows correlate across
    * sets sharing a vocabulary, and band collisions explode — dedup_near
    * went 3.1 s → 8.9 s at sf0.1 (recall held; selectivity died). OPH
    * only pays when |tokens| ≫ K; per-seed MinHash stays the right
    * signature for short documents. */
  private def bandHashes(th: Column): Column =
    ArrayExprs.minHashBands(th, Bands, RowsPerBand)

  /** doc_id + sorted token-hash array, reused by the pairwise variants. */
  private def docHashes(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"), tokHashes(col("text")).as("th"))

  /** The exact-set collapse, split into the two frames downstream actually
    * joins on. Earlier rounds persisted one wide (doc_id, th, gid) frame;
    * the columnar cache encode of the ARRAY<BIGINT> column cost ~10× the
    * computation itself (measured 2.0 s encode vs 0.22 s compute at
    * sf0.1) and was paid once per query. The collapse key is now a 64-bit
    * fingerprint of the sorted token-hash set, so
    *   - the grouping shuffles 8-byte keys, not arrays;
    *   - only two all-long frames persist ([[Collapse.gidMap]] one row
    *     per unique set, [[Collapse.docMap]] one per doc) — their encode
    *     is noise;
    *   - the token arrays are re-derived from the scan on demand
    *     ([[Collapse.uniq]], ~0.2 s) instead of being cached.
    * Fingerprint collisions would silently merge distinct sets; at 64
    * bits and n unique sets the chance is ~n²/2⁶⁵ (≈1e-9 even at 10M
    * sets) — at 100 TB corpus scale swap xxhash64 for a 128-bit digest
    * and this layout is unchanged.
    *
    * `nDocs`/`nGids`/`thBytes` are measured in collapse()'s one stats job
    * and drive every downstream broadcast decision: the maps and the
    * verify-stage token arrays are CONTENT-cardinality relations, so each
    * hint is size-conditional (Bcast) — past the budget the joins degrade
    * to shuffle joins instead of collecting the corpus to the driver. */
  private[graft] case class Collapse(docMap: DataFrame, gidMap: DataFrame,
      uniq: () => DataFrame, nDocs: Long, nGids: Long, thBytes: Long) {
    /** The slim (doc_id, gid) map, broadcast only while it fits. */
    def docMapHinted: DataFrame = Bcast.ifFitsRows(docMap, nDocs, 24)
  }

  /** Fixed on-disk schemas of the two memoized collapse maps — passed to
    * the reads so a memo hit never runs a schema-inference job (the
    * ProvidenciasOps.EdgesSchema discipline). */
  private val GidMapSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("fp",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("gid",
      org.apache.spark.sql.types.LongType)))
  private val DocMapSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("gid",
      org.apache.spark.sql.types.LongType)))

  private[graft] def collapse(s: SparkSession, dir: String): Collapse = {
    val df = docHashes(s, dir).withColumn("fp", xxhash64(col("th")))
    // The two all-long maps are session-shared scratch parquet (r18 opt):
    // FIVE declared keys consume the identical collapse per sweep
    // (near/simhash/ngram/prefix/contain — plus the label derivation),
    // and each was re-running the fingerprint groupBy + map join because
    // Bench/Verify clear the SQL cache between queries (SimhashProbe:
    // 0.29–0.34 s per consumer at sf0.1). Same materialized-view
    // lifecycle as similarEdges/clusterLabels; the maps are
    // doc-/set-cardinality × 2 longs. The token ARRAYS stay re-derived
    // on demand in uniq() — materializing them was measured at ~10× the
    // compute in the columnar cache (scaladoc above), and the parquet
    // trade is the same: the arrays are the corpus, the maps are not.
    val root = collapseMemo.getOrElseUpdate(s, dir) {
      val out = new org.apache.hadoop.fs.Path(SimilarityOps.scratchRoot(s),
        "graft_collapse_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      // the collapse groupBy sees the arrays anyway, so the per-set token
      // count rides the SAME shuffle — the verify-stage broadcast budget
      // (thBytes) costs no extra scan
      val gidFull = df.groupBy("fp")
        .agg(min("doc_id").as("gid"), max(size(col("th"))).as("len"))
        .persist()
      val st = gidFull.agg(count(lit(1)).as("n"),
        coalesce(sum(col("len").cast("long")), lit(0L)).as("toks")).first()
      val nGids = st.getLong(0)
      val thBytes = 8L * st.getLong(1) + 32L * nGids
      gidFull.select("fp", "gid").write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(out, "gid").toString)
      val gidW = s.read.schema(GidMapSchema)
        .parquet(new org.apache.hadoop.fs.Path(out, "gid").toString)
      df.join(Bcast.ifFitsRows(gidW, nGids, 24), "fp")
        .select("doc_id", "gid").write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(out, "doc").toString)
      val nDocs = s.read.schema(DocMapSchema)
        .parquet(new org.apache.hadoop.fs.Path(out, "doc").toString).count()
      collapseStats.put(s, dir, (nGids, thBytes, nDocs))
      gidFull.unpersist()
      // orphan guard, as in similarEdges: reclaim on session death
      out.getFileSystem(s.sessionState.newHadoopConf()).deleteOnExit(out)
      out.toString
    }
    val (nGids, thBytes, nDocs) = collapseStats.get(s, dir).get
    val gidMap = s.read.schema(GidMapSchema)
      .parquet(new org.apache.hadoop.fs.Path(root, "gid").toString)
    val docMap = s.read.schema(DocMapSchema)
      .parquet(new org.apache.hadoop.fs.Path(root, "doc").toString)
    def gidHinted = Bcast.ifFitsRows(gidMap, nGids, 24)
    val uniq = () => df.join(gidHinted, "fp")
      .filter(col("doc_id") === col("gid")).select(col("gid"), col("th"))
    Collapse(docMap, gidMap, uniq, nDocs, nGids, thBytes)
  }

  /** Scratch roots of the memoized collapse maps per (session, dir) —
    * see the derivation comment inside [[collapse]]. */
  private val collapseMemo = new SessionMemo[String, String]

  /** Drop a session's shared collapse-map materializations (spec
    * isolation — mirrors [[evictSharedLabels]]); the stats memo is
    * dropped with it so a re-derivation re-measures. */
  private[graft] def evictSharedCollapse(s: SparkSession): Unit = {
    collapseMemo.removeAll(s).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sessionState.newHadoopConf()).delete(hp, true)
      ()
    }
    collapseStats.removeAll(s)
    ()
  }

  /** collapse()'s measured stats (nGids, thBytes, nDocs) memoized per
    * (session, data dir), mirroring Bcast.measured: the fixture dirs
    * are immutable within a session, so every dedup query after the
    * first skips both collapse stats jobs. Populated inside the
    * [[collapseMemo]] derivation block (r18) so the stats and the
    * materialized maps always come from the same derivation run.
    * Session-scoped via the weak-keyed [[SessionMemo]] (r11) so a
    * recycled identity hash can never surface a stale measurement. */
  private val collapseStats = new SessionMemo[String, (Long, Long, Long)]

  /** Expand surviving set-pairs (gid_a, gid_b, score) to member doc-pairs
    * with doc_a < doc_b, via two size-conditional broadcast joins on the
    * slim doc map. gid order does not imply member order across groups,
    * so the pair is re-oriented with least/greatest. */
  private def expandPairs(pairs: DataFrame, c: Collapse, scoreCol: String): DataFrame =
    pairs
      .join(c.docMapHinted.select(col("doc_id").as("da"), col("gid").as("gid_a")), "gid_a")
      .join(c.docMapHinted.select(col("doc_id").as("db"), col("gid").as("gid_b")), "gid_b")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col(scoreCol))

  /** All intra-group member pairs (doc_a < doc_b) with a constant score —
    * identical sets need no verification (Jaccard 1, Hamming 0). */
  private def intraPairs(c: Collapse, scoreCol: String, score: Column): DataFrame =
    c.docMap.select(col("doc_id").as("doc_a"), col("gid"))
      .join(c.docMapHinted.select(col("doc_id").as("doc_b"), col("gid")), "gid")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .withColumn(scoreCol, score)

  /** The verify-stage token-array side (gid, th) for one join leg —
    * content-cardinality AND wide (arrays), so the hint budgets the
    * measured token bytes, not a per-row constant. */
  private def thSide(c: Collapse, th: DataFrame, gidAs: String, thAs: String): DataFrame =
    Bcast.ifFits(
      th.select(col("gid").as(gidAs), col("th").as(thAs)), c.thBytes)

  private def jaccard(a: Column, b: Column): Column =
    round(ArrayExprs.sortedJaccard(a, b), 4)

  /** AllPairs/PPJoin candidate stage for `dedup_prefix`, split out so
    * DedupSpec can pin its selectivity against the operator's own code.
    *
    * Input: one row per UNIQUE token set (gid, th: ARRAY<BIGINT>).
    * Output: candidate occurrences (gid_a < gid_b, plus the lengths and
    * prefix positions the prunes used) — every pair with Jaccard ≥ t
    * appears at least once (completeness argument at the dedup_prefix
    * comment); a pair may appear once per shared prefix token, so
    * consumers dedupe AFTER their verify filter (survivors are few; raw
    * candidate occurrences are not).
    *
    * Canonical order: ascending (document frequency, token) — AllPairs'
    * rarest-first order. Prefixes then hold each set's rarest tokens,
    * whose posting lists are short, so on a Zipfian vocabulary the
    * equi-join on prefix tokens stays near-linear where a
    * frequency-blind order degenerates toward quadratic (head tokens
    * land in prefixes and every pair of docs sharing a stopword becomes
    * a candidate). Ties on df break by token value, so the order is
    * total and deterministic; ANY total order preserves completeness,
    * df-order only changes selectivity. Costs one counting pass over
    * the unique sets plus one hash shuffle to re-assemble ranked
    * arrays — both linear in token volume, both scale-safe. */
  /** Skew decision memo for [[prefixCandidates]], keyed like
    * [[Bcast.measured]]: the rank-or-not choice (and the vocabulary row
    * count the broadcast hint needs) is a pure function of the df
    * distribution, so one bounded aggregate per (session, plan) decides
    * both and repeat invocations (bench warm passes) skip the job. */
  private val dfSkewed = new SessionMemo[Int, (Boolean, Long)]

  /** Rank by df only when the distribution is skewed enough for
    * rarest-first prefixes to prune: on a FLAT vocabulary (every posting
    * list ~equally long — the fixture's dense 31-token worst case) no
    * order prunes, and the re-rank shuffle is pure overhead, so the
    * already-hash-sorted arrays are used as the canonical order instead.
    * max/mean df ≥ 4 is a loose Zipf detector: real text vocabularies
    * measure in the hundreds-to-millions (the head stopword covers a
    * large corpus fraction while the mean is tail-dominated), flat
    * synthetic vocabularies sit near 1. The choice affects CANDIDATE
    * VOLUME only, never output — any total order preserves completeness
    * — so the adaptive switch cannot change results, exactly like
    * Spark's own stats-driven join-strategy picks. Returns
    * (skewed, vocabulary rows) so the caller's broadcast hint needs no
    * second stats job over the same table. */
  private def dfStats(dfTab: DataFrame): (Boolean, Long) =
    dfSkewed.getOrElseUpdate(dfTab.sparkSession, dfTab.semanticHash()) {
      val st = dfTab.agg(count(lit(1)).as("v"),
        coalesce(max(col("df")), lit(0L)).as("mx"),
        coalesce(sum(col("df")), lit(0L)).as("tot")).first()
      (st.getLong(0) > 0 &&
        st.getLong(1) * st.getLong(0) >= 4L * st.getLong(2), st.getLong(0))
    }

  private[graft] def prefixCandidates(uniq: DataFrame, t: Double): DataFrame = {
    // Per-token document frequency over the UNIQUE sets (one counting
    // pass); vocabulary-cardinality, so the join back onto the exploded
    // tokens is size-conditional (16 bytes of token+count per row).
    val toks = uniq.select(col("gid"), explode(col("th")).as("tok"))
    val dfTabRaw = toks.groupBy("tok").agg(count(lit(1)).as("df")).persist()
    // Re-rank each set by (df, tok) when the distribution rewards it:
    // one hash shuffle of (gid, df, tok) triples; array_sort on the
    // struct is lexicographic (df, tok) and the transform strips the
    // rank back off. The broadcast hint reuses the row count dfStats
    // already measured (80 bytes/row = the 16-byte key+count pipe_vocab
    // estimate + 64 fixed), so no second stats job runs. Flat
    // distribution → the hash-sorted input arrays are already a
    // canonical total order; skip the shuffle and drop the then-unused
    // persisted df table.
    val (skewed, nVocab) = dfStats(dfTabRaw)
    val ranked =
      if (skewed)
        toks.join(Bcast.ifFitsRows(dfTabRaw, nVocab, 80), "tok")
          .groupBy("gid")
          .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("rk"))
          .select(col("gid"),
            transform(col("rk"), r => r.getField("tok")).as("rth"))
      else {
        dfTabRaw.unpersist()
        uniq.select(col("gid"), col("th").as("rth"))
      }
    val pref = ranked.select(col("gid"), size(col("rth")).as("len"),
      posexplode(slice(col("rth"), lit(1),
        (size(col("rth")) - ceil(lit(t * t) * size(col("rth"))) + 1)
          .cast("int"))).as(Seq("pos", "tok")))
    val a = pref.select(col("gid").as("gid_a"), col("len").as("len_a"),
      col("pos").as("pos_a"), col("tok"))
    val b = pref.select(col("gid").as("gid_b"), col("len").as("len_b"),
      col("pos").as("pos_b"), col("tok"))
    // Shuffle-hash candidate join with two in-join prunes beyond the
    // token match (both evaluated before a candidate row leaves the
    // join loop):
    //  - length-ratio: J >= t forces min/max >= t;
    //  - PPJoin's positional filter: for the canonically SMALLEST common
    //    element at 0-based positions (pos_a, pos_b), every common
    //    element sits at ≥ those positions, so
    //    c <= min(len_a - pos_a, len_b - pos_b); a true pair needs
    //    c >= t·min(len_a, len_b), so occurrences violating that bound
    //    cannot be the smallest-common-element occurrence — dropping
    //    them keeps completeness (the x-occurrence of any true pair
    //    always passes) while pruning deep-position collisions.
    a.hint("shuffle_hash").join(b, Seq("tok"))
      .filter(col("gid_a") < col("gid_b") &&
        least(col("len_a"), col("len_b")).cast("double") >=
          greatest(col("len_a"), col("len_b")) * (t - 1e-3) &&
        least(col("len_a") - col("pos_a"), col("len_b") - col("pos_b"))
          .cast("double") >= least(col("len_a"), col("len_b")) * (t - 1e-3))
  }

  /** Contracted-graph edge count below which [[localCC]] solves the
    * components in one task instead of the iterative relational loop. */
  val LocalCCMaxEdges = 5_000_000L

  /** Single-task min-label connected components over a (a, b) edge list —
    * union-find with path compression, union-by-min so the root IS the
    * component's min id. Runs as ONE executor task (`mapPartitions` after
    * `coalesce(1)`), not on the driver: after contraction the component
    * graph is usually tiny relative to the corpus, and a local solve
    * replaces diameter-many join rounds — the same data-size-adaptive
    * trade Spark itself makes when it broadcasts a small join side. The
    * iterative pointer-jump loop below remains the path for contracted
    * graphs beyond single-task scale. */
  private[graft] def localCC(edges: DataFrame): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    edges.select(col("a"), col("b")).as[(Long, Long)]
      .coalesce(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        it.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        val ks = parent.keys.toArray
        ks.iterator.map(k => (k, find(k)))
      }
      .toDF("id", "lbl")
  }

  /** Iterative relational min-label CC — the at-scale path. Near-dup
    * components are NOT all cliques (sets chain through 0.9-neighbors:
    * A~B~C with A̸~C), so plain per-edge propagation needs diameter-many
    * edge joins. Each cycle therefore runs
    *   relax:    lbl(a) := min over edges (a,b) of lbl(b)   (edge join;
    *             a self-loop per node folds in lbl(a) itself)
    *   shortcut: lbl(a) := lbl(lbl(a)), twice               (label
    *             self-joins on the node-sized table — pointer jumping)
    * which contracts path lengths geometrically: O(log diameter)
    * expensive edge joins, the standard two-phase relational CC.
    * Labels are one row per unique set — broadcast them so the edge list
    * is never shuffled (a checkpointed frame has no stats, so the hint is
    * load-bearing). The hint is size-conditional: one node count up
    * front, compared against the session's broadcast budget — past that
    * the rounds degrade to shuffle joins (edges re-shuffle per round;
    * linear, and the only shape that doesn't OOM the driver at
    * broadcast-busting label cardinality). Convergence: labels only ever
    * decrease, so sum(lbl)
    * is strictly decreasing until the fixpoint — comparing two Long sums
    * per cycle replaces a filter+count job over a prev/next join.
    * Two Spark jobs per cycle: `relaxed` is persist-marked so its four
    * occurrences inside the shortcut composition compute once, and one
    * eager localCheckpoint materializes the whole cycle. The checkpoint
    * also keeps every cycle's logical plan flat (an RDD-backed scan) —
    * chaining persist() alone snowballs the plan tree 4× per cycle (each
    * shortcut hop references its input twice) and OOMs on plan objects
    * long before the data matters. */
  /** Size-conditional broadcast for the CC loop's node-cardinality label
    * maps — hoisted to [[Bcast]] (r9) so every operator family shares one
    * budget check; kept as an alias because the loop reads naturally with
    * its original name. */
  private[graft] def broadcastIfFits(df: DataFrame, rows: Long): DataFrame =
    Bcast.ifFitsRows(df, rows)

  private[graft] def iterativeCC(edges: DataFrame, nodes: DataFrame): DataFrame = {
    // labels stay one (id, lbl) long-pair per node for the whole loop, so
    // one count decides the join strategy for every round
    val nNodes = nodes.count()
    def maybeBroadcast(df: DataFrame): DataFrame = broadcastIfFits(df, nNodes)
    var labels = nodes.select(col("gid").as("id"), col("gid").as("lbl"))
      .localCheckpoint()
    def lblSum(df: DataFrame): Long =
      df.agg(sum(col("lbl"))).first().getLong(0)
    var prevSum = lblSum(labels)
    var rounds = 0
    var converged = false
    while (!converged && rounds < 50) {
      val relaxed = edges.join(maybeBroadcast(labels), col("b") === col("id"))
        .groupBy(col("a")).agg(min(col("lbl")).as("lbl"))
        .select(col("a").as("id"), col("lbl"))
        .persist()
      var next = relaxed
      for (_ <- 1 to 2)
        next = next.as("x")
          .join(maybeBroadcast(next.select(col("id").as("rid"), col("lbl").as("rlbl"))),
            col("x.lbl") === col("rid"))
          .select(col("x.id").as("id"), col("rlbl").as("lbl"))
      next = next.localCheckpoint()
      val nextSum = lblSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      relaxed.unpersist()
      labels = next
      rounds += 1
    }
    labels
  }

  /** The span frame behind `dedup_substring` — (doc_id, span_start,
    * span_len) of every maximal cross-doc duplicated token region —
    * factored out so `pipe_substring_report` aggregates the IDENTICAL
    * spans the dedup key reports (one definition, two consumers, the
    * langIdSql/lloydAssign sharing pattern). Spans are pairwise disjoint
    * by the coverage-merge rule, so Σ span_len per doc is its exact
    * duplicated-token count.
    *
    * Session-shared scratch materialization (r18 opt): both consumers
    * re-ran the full gram join per query; the frame is doc-cardinality
    * × 3 longs, so the similarEdges write-once trade applies. */
  private val substringSpansMemo = new SessionTableMemo(
    "graft_substring_spans_",
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("span_start",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("span_len",
        org.apache.spark.sql.types.LongType))))

  private[graft] def substringSpans(s: SparkSession, dir: String): DataFrame =
    substringSpansMemo.get(s, dir)(deriveSubstringSpans(s, dir))

  private def deriveSubstringSpans(s: SparkSession, dir: String): DataFrame = {
    val k = SubstringK
    // Gram key = xxhash64 over the k-slice of PER-TOKEN xxhash64s, not
    // over the k-token string re-concat: each token's bytes are hashed
    // once per doc instead of k times through concat_ws allocations, and
    // the per-position hash input is a fixed 8·k bytes (r18 opt round,
    // guide §1.2 per-task work; SubstringProbe: gram stage 0.47 → 0.31 s
    // med isolated at sf0.1). Distinct grams collide only at the same
    // ~n²/2⁶⁴ odds the previous concat key accepted (the oracle groups
    // the gram TEXT, so the key is free to be any sound fingerprint).
    val th = transform(split(col("text"), " "), t => xxhash64(t))
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), th.as("hs"))
      .filter(size(col("hs")) >= k)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), size(col("hs")) - (k - 1)),
          i => xxhash64(slice(col("hs"), i, lit(k)))))
          .as(Seq("p0", "gh")))
      .select(col("doc_id"), (col("p0") + 1).cast("bigint").as("pos"),
        col("gh"))
    // "appears in >1 distinct doc" ⟺ min(doc_id) < max(doc_id): one
    // map-side-combined exchange on gh instead of countDistinct's
    // two-exchange (gh, doc_id) dedup expansion (r18 opt round, guide
    // §2.4; SubstringProbe: dup build 0.85 → 0.53 s med isolated with
    // both changes — the hashpartitioning(gh, doc_id) exchange is gone)
    val dupGrams = grams.groupBy("gh")
      .agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("gh")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    grams.join(dupGrams, "gh")
      .select("doc_id", "pos")
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(w) > k, 1).otherwise(0))
      .withColumn("grp", sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min("pos").as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).as("span_len"))
      .select("doc_id", "span_start", "span_len")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: canonical survivor = min doc_id per identical text.
    // Grouped on a 64-bit text fingerprint, not the text itself: the
    // shuffle partitions and group-compares on 8-byte keys, and map-side
    // combine collapses duplicates before the exchange, so the only text
    // bytes that ride the shuffle are the survivors' (which the output
    // needs anyway). min(text) keeps the survivor deterministic; a
    // fingerprint collision would merge two distinct texts (~n²/2⁶⁵ —
    // the same documented trade the near-dup collapse makes; at 100 TB
    // swap in a 128-bit digest, plan shape unchanged).
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(xxhash64(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"), min("text").as("text"))
        .select("doc_id", "text")
        .orderBy("doc_id")),

    // Incremental-ingest dedup: the new batch (here the doc_id % 7 == 3
    // slice) anti-joined on content fingerprint against the corpus
    // already ingested — the "is this scrape already in the training
    // set" gate every continuously-built corpus runs per batch. Scale
    // shape: both sides reduce to 8-byte xxhash64 keys before the
    // LEFT ANTI join, so the shuffle carries fingerprints, not text; the
    // existing side additionally collapses to DISTINCT fingerprints
    // (dictionary-sized relative to raw rows). In steady state the
    // existing-fingerprint set is a materialized table keyed by
    // fingerprint (or a Bloom pre-filter feeding this same anti-join) —
    // the join shape here is that plan. The oracle anti-joins on the
    // text itself: identical ground truth up to the documented
    // ~n²/2⁶⁵ collision odds `dedup_exact` already accepts.
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val newBatch = docs.filter(col("doc_id") % 7 === 3)
        .select(col("doc_id"), col("text"), xxhash64(col("text")).as("fp"))
      val existing = docs.filter(col("doc_id") % 7 =!= 3)
        .select(xxhash64(col("text")).as("fp")).distinct()
      newBatch.join(existing, Seq("fp"), "left_anti")
        .select("doc_id", "text")
        .orderBy("doc_id")
    }),

    // MinHash + LSH banding over UNIQUE token sets: collapse -> band
    // equi-join over gids only -> exact Jaccard verify on candidate set
    // pairs -> expand to member pairs (intra-group pairs are Jaccard 1 by
    // construction and bypass the join). No oracle (hash-impl-specific
    // banding); the pair set is property-tested against the exact pairwise
    // `dedup_ngram` result in DedupSpec. An exact-oracle conversion was
    // MEASURED unsound in r8 (SURVEY §7.4): at sf0.01 banding misses 10 of
    // 9,020 true pairs, all at rounded J exactly 0.9000 — the designed
    // (1−0.9¹⁶)²⁴ ≈ 0.75% boundary miss rate, i.e. recall 0.9989. The
    // deterministic-100%-recall alternative is `dedup_prefix`.
    "dedup_near" -> ((s, dir) => {
      // the collapse feeds SIX branches of this DAG (band join sides, the
      // two verify broadcasts, the two expansion broadcasts, intra pairs)
      // — the slim persists in [[collapse]] materialize the maps once
      val c = collapse(s, dir)
      // Only (gid, band, bh) — 24 bytes — ride the candidate shuffle: the
      // wide token-hash arrays AND the band-signature arrays both stay out
      // of the join entirely (the arrays are broadcast-joined back for the
      // verify step; the unique-set table is orders of magnitude smaller
      // than the candidate set). Pairs colliding in several bands surface
      // once PER BAND and are verified per occurrence: the verify is a
      // codegen'd long-merge (~|tokens| ops) reached through two broadcast
      // joins, so re-verifying a multi-band collision costs less than the
      // candidate-wide `distinct()` shuffle this replaced (measured ~0.5 s
      // at sf0.1) — survivors are a tiny fraction, and THEY dedupe.
      val sig = c.uniq()
        .withColumn("bands", bandHashes(col("th")))
      val slim = sig.select(col("gid"), size(col("th")).as("len"),
        posexplode(col("bands")).as(Seq("band", "bh")))
      val a = slim.select(col("gid").as("gid_a"), col("len").as("len_a"),
        col("band"), col("bh"))
      val b = slim.select(col("gid").as("gid_b"), col("len").as("len_b"),
        col("band"), col("bh"))
      // length-ratio prefilter: J(A,B) >= t forces |A∩B| >= t·|A∪B|, so
      // min(|A|,|B|)/max(|A|,|B|) >= t — evaluated inside the join, it
      // drops false candidates before they leave the join loop
      // the candidate join needs no ordering — hint it to a shuffled HASH
      // join so neither band side pays a sort (without the hint the
      // planner defaults to SMJ now that the inputs are raw scans with no
      // cached stats)
      val cand = a.hint("shuffle_hash").join(b, Seq("band", "bh"))
        .filter(col("gid_a") < col("gid_b") &&
          least(col("len_a"), col("len_b")).cast("double") >=
            greatest(col("len_a"), col("len_b")) * (JaccardThreshold - 1e-3))
        .select("gid_a", "gid_b")
      val th = sig.select(col("gid"), col("th"))
      val inter = cand
        .join(thSide(c, th, "gid_a", "th_a"), "gid_a")
        .join(thSide(c, th, "gid_b", "th_b"), "gid_b")
        .filter(ArrayExprs.sortedJaccard(col("th_a"), col("th_b")) >= JaccardThreshold - 1e-3)
        .select(col("gid_a"), col("gid_b"), jaccard(col("th_a"), col("th_b")).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .distinct()
      expandPairs(inter, c, "jaccard")
        .union(intraPairs(c, "jaccard", lit(1.0)))
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash near-dup: 32-bit signatures over unique token sets, set
    // pairs within Hamming distance 3, expanded to member pairs
    // (identical sets are Hamming 0). r17 (r16 verdict item 6): the
    // per-token hash now derives from an 8-hex-char md5 slice parsed by
    // SQL text that runs VERBATIM on both engines (the agg_kmv_jaccard /
    // agg_bloom_members discipline), the majority vote is 32 integer
    // CASE folds, and the bit pack is integer arithmetic — so the key is
    // fully ORACLED: DuckDB replays signature and Hamming join exactly.
    // The signature is a pure function of the token SET, so the oracle
    // can pair DOCS directly (identical sets share a signature — its
    // doc-level join IS this plan's set-level join + member expansion).
    // The codegen'd SimHash expression stays the fast path where
    // cross-engine replay isn't required (the registered `sim_hash` SQL
    // function; ExprProps/ArrayExprsSpec pin it).
    "dedup_simhash" -> ((s, dir) => {
      val c = collapse(s, dir)
      // signature stage extracted to [[simhashSig]] (r18) — the
      // repartition/persist/parallelism design notes live there
      val sig = simhashSig(s, dir, c)
      val inter = graft.plans.SelfPairwise(sig,
        graft.plans.SelfPairwise.Hamming, -HammingMax.toDouble, triangular = true)
        .select(col("src").as("gid_a"), col("dst").as("gid_b"),
          (-col("score")).cast("int").as("hamming"))
      expandPairs(inter, c, "hamming")
        .union(intraPairs(c, "hamming", lit(0).cast("int")))
        .orderBy("doc_a", "doc_b")
    }),

    // Exact pairwise token-set Jaccard >= 0.9 — the ground truth the LSH
    // variants approximate. Quadratic over UNIQUE sets by construction; at
    // scale `dedup_near` is the candidate pre-filter and this expression
    // verifies candidates. Set pairs are planned by the custom SelfPairwise
    // operator (fused broadcast loop with an in-loop prefilter 1e-3 below
    // the threshold; the exact filter runs on the rounded column, so values
    // stay oracle-identical — intra-group pairs are exactly 1.0 and
    // round(1.0) == 1.0 on both engines).
    "dedup_ngram" -> ((s, dir) => {
      val c = collapse(s, dir)
      val inter = graft.plans.SelfPairwise(c.uniq(),
        graft.plans.SelfPairwise.Jaccard, JaccardThreshold - 1e-3, triangular = true)
        .select(col("src").as("gid_a"), col("dst").as("gid_b"),
          round(col("score"), 4).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
      expandPairs(inter, c, "jaccard")
        .union(intraPairs(c, "jaccard", lit(1.0)))
        .orderBy("doc_a", "doc_b")
    }),

    // Deterministic prefix-filtered set-similarity join (AllPairs/PPJoin,
    // Bayardo et al. WWW'07): the 100%-recall complement to the LSH
    // banding above, and the key this family puts under the DuckDB hash
    // gate — `dedup_near`'s banding is probabilistic (it measurably
    // misses ~1 set-pair at sf0.01: 9010 vs the exact 9020 member pairs,
    // within its ≥0.95 recall contract), so an exact oracle on it would
    // be red by design; THIS plan's candidate set provably contains every
    // true pair, so its verified output EQUALS the quadratic ground truth
    // at any scale while staying candidate-pruned.
    //
    // Completeness: fix a global canonical token order — ascending
    // (document frequency, token), the AllPairs order, when the df
    // distribution is skewed: prefixes then hold the RAREST tokens,
    // whose posting lists are short, which is what keeps the candidate
    // join selective on Zipfian vocabularies (one extra counting pass
    // over the unique sets buys it). On a FLAT distribution no order
    // prunes, so the already-hash-sorted arrays serve as the canonical
    // order and the re-rank shuffle is skipped — a stats-driven plan
    // choice that cannot change output (see prefixCandidates).
    // If J(A,B) ≥ t then c = |A∩B| ≥ ⌈t·min(|A|,|B|)⌉ =: α, and the
    // canonically SMALLEST common element x has ≥ α−1 common elements
    // after it in both sets, so x sits within the first |X|−α+1 elements
    // of each — both prefixes contain x and the equi-join on prefix
    // tokens surfaces the pair. Not knowing the partner's size, each set
    // emits |X|−⌈t²|X|⌉+1 prefix tokens (min(|A|,|B|) ≥ t·max ≥ t·|X|
    // for any partner passing the length-ratio filter). Shuffle carries
    // only (gid, len, token-hash) triples — ~(1−t²)·|tokens| rows per
    // unique set; the wide arrays broadcast into the verify exactly as in
    // dedup_near. The fixture's 31-token vocabulary is the pruning
    // worst case (every posting list is dense, so df-order cannot prune
    // there); completeness — the property the oracle checks — is
    // data-independent, and DedupSpec's Zipf corpus pins the selectivity.
    "dedup_prefix" -> ((s, dir) => {
      val c = collapse(s, dir)
      val t = JaccardThreshold
      val uniq = c.uniq()
      val cand = prefixCandidates(uniq, t).select("gid_a", "gid_b")
      val th = uniq.select(col("gid"), col("th"))
      val inter = cand
        .join(thSide(c, th, "gid_a", "th_a"), "gid_a")
        .join(thSide(c, th, "gid_b", "th_b"), "gid_b")
        .filter(ArrayExprs.sortedJaccard(col("th_a"), col("th_b")) >= t - 1e-3)
        .select(col("gid_a"), col("gid_b"), jaccard(col("th_a"), col("th_b")).as("jaccard"))
        .filter(col("jaccard") >= t)
        .distinct()
      expandPairs(inter, c, "jaccard")
        .union(intraPairs(c, "jaccard", lit(1.0)))
        .orderBy("doc_a", "doc_b")
    }),

    // Soft dedup: instead of DROPPING duplicates, weight each doc by
    // 1/|exact-content cluster| so a page mirrored 1000× contributes one
    // doc's worth of gradient mass — the sampling-weight alternative to
    // hard dedup. Cluster sizes aggregate on the 128-bit content digest
    // (the payload never rides the shuffle) and join back on the same
    // digest — agg and join share one exchange, so the whole query is a
    // single hash shuffle at any corpus size.
    "dedup_soft" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), md5(col("text")).as("fp"))
      val sizes = d.groupBy("fp").agg(count(lit(1)).as("n_copies"))
      d.join(sizes, "fp")
        .select(col("doc_id"), col("n_copies"),
          round(lit(1.0) / col("n_copies"), 4).as("weight"))
        .orderBy("doc_id")
    }),

    // Boilerplate (paragraph-level) dedup: cut every document into
    // non-overlapping 10-token segments and report segments appearing in
    // MORE THAN ONE document — the C4/RefinedWeb "repeated line" scrub
    // that removes navigation chrome and license headers which
    // whole-document dedup can't see. One generator explode + one
    // hash-shuffle on the segment key; at 100 TB the segment id would be
    // its 128-bit digest and the group-by shape is unchanged.
    // Content-defined-chunking dedup datasheet (the FastCDC/storage-
    // dedup shape brought to corpus text): chunk boundaries are a pure
    // function of LOCAL content (an md5-derived 1-in-8 token gate), so
    // insertions shift chunk ids but never re-cut downstream boundaries —
    // the property that lets chunk-level dedup find shared tails that
    // fixed-offset segmentation (`dedup_paragraph`) misses after a
    // one-token edit. Chunks fingerprint to 16-byte md5 keys (the only
    // thing the cluster shuffle carries), clusters histogram by size,
    // and the duplicate-token mass prices what chunk-level scrubbing
    // would reclaim. r18 opt: because the boundary gate is per-token
    // LOCAL, the whole cut happens in the ARRAY domain inside the scan
    // projection (boundary positions → chunk start offsets → one
    // (n_toks, fp) struct per chunk, all codegen'd higher-order
    // functions) — the r12 form instead exploded every token through a
    // doc-keyed exchange, sorted a per-doc window for the boundary
    // cumsum, and rebuilt chunks with a collect_list object aggregate:
    // two corpus-scale shuffles of token rows for a value that is a
    // pure row-local function. Now the only corpus-scale exchange is
    // the map-side-combined fp groupBy; the pct window still runs over
    // the bounded histogram only. Chunk token counts and fingerprints
    // are the identical integers/strings (same positions, same order,
    // same " " join), so the oracle is unchanged.
    "dedup_chunk" -> ((s, dir) => {
      val tot = Window.partitionBy()
      val t = col("t")
      // 1-based boundary positions; a boundary token STARTS a new chunk
      // (its own gate bit counted the old cumsum's currentRow)
      val bpos = filter(sequence(lit(1), size(t)), i =>
        conv(substring(md5(element_at(t, i)), 1, 4), 16, 10).cast("int")
          % 8 === 0)
      // chunk start offsets: position 1 opens chunk 0 unless the first
      // token is itself a boundary (then there is no pre-boundary chunk);
      // get() is the null-safe probe (0-based), so an empty bpos falls
      // through to the otherwise branch. Staged through Projects so each
      // array is an ATTRIBUTE where it is referenced more than once —
      // CollapseProject keeps multi-referenced non-cheap aliases
      // materialized, and the zip_with lambda sees only its element
      // variables (a lambda referencing the starts EXPRESSION would
      // re-evaluate the whole md5 boundary filter per chunk — measured
      // 57 s at sf0.1, the reason this staging is load-bearing).
      val starts = when(get(bpos, lit(0)) === 1, bpos)
        .otherwise(concat(array(lit(1)), bpos))
      // next-start array: starts shifted left, padded with n+1 past the
      // last chunk, so (st, nx) pairs line up positionally
      val nexts = concat(
        slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
        array(size(t) + 1))
      val chunksCol = zip_with(col("starts"), col("nexts"), (st, nx) =>
        struct((nx - st).cast("long").as("n_toks"),
          md5(concat_ws(" ", slice(t, st, nx - st))).as("fp")))
      val chunks = Tables.documents(s, dir)
        .select(split(col("text"), " ").as("t"))
        .select(t, starts.as("starts"))
        .select(t, col("starts"), nexts.as("nexts"))
        .select(explode(chunksCol).as("c"))
        .select(col("c.n_toks").as("n_toks"), col("c.fp").as("fp"))
      chunks.groupBy("fp")
        .agg(count(lit(1)).as("cluster_size"), min(col("n_toks")).as("n_toks"))
        .withColumn("dup", col("n_toks") * (col("cluster_size") - 1))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"), sum(col("dup")).as("dup_token_mass"))
        .withColumn("n_chunks", col("cluster_size") * col("n_clusters"))
        .withColumn("pct_chunks", Num.pin(
          col("n_chunks").cast("double") / sum(col("n_chunks")).over(tot), 6))
        .select("cluster_size", "n_clusters", "n_chunks", "dup_token_mass",
          "pct_chunks")
        .orderBy("cluster_size")
    }),

    "dedup_paragraph" -> ((s, dir) => {
      val seg = 10
      val t = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(transform(
            sequence(lit(0), floor((size(t) - 1) / lit(seg)).cast("int")),
            i => concat_ws(" ", slice(t, i * seg + 1, lit(seg)))))
            .as(Seq("seg_idx", "segment")))
        .groupBy("segment")
        .agg(countDistinct("doc_id").as("n_docs"),
          min("doc_id").as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy("segment")
    }),

    // Exact-substring (span-level) dedup — the Lee et al. 2022
    // ("Deduplicating Training Data Makes Language Models Better")
    // granularity the set-based variants can't see: a 50-token boilerplate
    // block shared by otherwise-distinct pages is invisible to doc-level
    // Jaccard but is exactly what a training pipeline must scrub. The
    // suffix-array formulation is replaced by the equivalent
    // rolling-k-gram join, which IS distributable:
    //   1. each doc emits one xxhash64 per k-token window (k = SubstringK,
    //      computed in a single pass over the token array — the 8-byte
    //      gram hashes are the only thing that ever shuffles, never text);
    //   2. a groupBy(gram) marks grams seen in >1 distinct doc;
    //   3. per doc, flagged window positions chain into maximal spans via
    //      a gaps-and-islands window over TOKEN COVERAGE: flagged
    //      positions p < q belong to one span iff q − p ≤ k (the token
    //      intervals [p, p+k−1] and [q, q+k−1] overlap or abut — the
    //      duplicated region is contiguous even when the gram strictly
    //      between them is unique). A shared 50-token block therefore
    //      reports as ONE span of length 50, not 43 overlapping 8-grams,
    //      and spans never overlap, so Σ span_len IS the doc's
    //      duplicated-token count.
    // Output: (doc_id, span_start, span_len) in 1-based token positions.
    // At 100 TB the gram table is the corpus token count — the dup-gram
    // relation is content-cardinality, so it stays a shuffle join (no
    // broadcast), and the islands window partitions by doc_id: all linear.
    // The oracle groups by the gram STRING; xxhash64 over ≤~1e6 distinct
    // grams is collision-free in the same n²/2⁶⁵ sense as the collapse
    // fingerprint (§ scaladoc above).
    "dedup_substring" -> ((s, dir) =>
      substringSpans(s, dir).orderBy("doc_id", "span_start")),

    // Containment dedup: doc pairs whose SMALLER token set is entirely
    // inside the larger one (overlap coefficient |A∩B| / min(|A|,|B|)
    // = 1) — the scrub that catches a snippet embedded in a longer page,
    // which Jaccard structurally misses (10 tokens inside 100 is J≈0.1).
    // Same collapse-then-compare shape as the other variants; the
    // SelfPairwise Overlap metric prunes the merge loop against the
    // containment bound, and identical sets are containment 1 by
    // definition (intra pairs bypass the scan).
    "dedup_contain" -> ((s, dir) => {
      val c = collapse(s, dir)
      val inter = graft.plans.SelfPairwise(c.uniq(),
        graft.plans.SelfPairwise.Overlap, 1.0 - 1e-9, triangular = true)
        .select(col("src").as("gid_a"), col("dst").as("gid_b"),
          round(col("score"), 4).as("containment"))
        .filter(col("containment") >= 1.0)
      expandPairs(inter, c, "containment")
        .union(intraPairs(c, "containment", lit(1.0)))
        .orderBy("doc_a", "doc_b")
    }),

    // Embedding-cosine near-dup: top-100 most-similar document pairs by
    // embedding cosine (fixture cosines top out at ~51, so a fixed
    // threshold would be empty — rank instead). Planned by SelfPairwise in
    // per-src top-k mode: each src's 100-entry buffer is ordered by the
    // same (rounded score DESC, dst ASC) key the global sort uses, so the
    // global top-100 is contained in the n*100 emitted rows (any pair
    // outside its src's top-100 has 100 globally-earlier pairs) — the
    // 12.5M-pair materialization + sort this replaced measured 3.4 s.
    "dedup_embed" -> ((s, dir) =>
      graft.plans.SelfPairwise(
        Tables.embeddings(s, dir).select(col("vec_id"), col("embedding")),
        graft.plans.SelfPairwise.Cosine, Double.MinValue,
        triangular = true, topK = 100)
        .select(col("src").as("doc_a"), col("dst").as("doc_b"),
          round(col("score") * 100, 4).as("similitud"))
        .orderBy(col("similitud").desc, col("doc_a"), col("doc_b"))
        .limit(100)),

    // SemDeDup-style semantic dedup (Abbas et al. 2023): k-means cluster
    // the embedding space FIRST, then compare pairs only WITHIN clusters
    // — the pruning that makes embedding dedup feasible at corpus scale
    // (cross-cluster pairs are never materialized; the pair space shrinks
    // from n² to Σ|cluster|²). Clusters come from the shared
    // [[SimilarityOps.lloydAssign]] (the exact assignment `ml_kmeans`
    // reports), so the oracle replays the identical unrolled Lloyd loop
    // and the within-cluster pair scan declaratively. The cluster
    // self-join shuffles on cid — at 100 TB, k grows with the corpus
    // (SemDeDup uses ~10⁵ clusters for 10⁹ docs) keeping every cluster
    // executor-sized, and the join stays the same plan. The recall trade
    // vs the exact `dedup_embed` scan is the documented SemDeDup design:
    // near-dups in DIFFERENT clusters are unseen by construction.
    "dedup_semantic" -> ((s, dir) => {
      val pts = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding"))
        .join(SimilarityOps.lloydAssign(s, dir), "vec_id")
      val a = pts.select(col("cid"), col("vec_id").as("doc_a"),
        col("embedding").as("ea"))
      val b = pts.select(col("cid"), col("vec_id").as("doc_b"),
        col("embedding").as("eb"))
      a.join(b, "cid")
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("similitud",
          graft.functions.Vectors.similitud(col("ea"), col("eb")))
        .filter(col("similitud") >= SemanticDupSim)
        .select(col("doc_a"), col("doc_b"), col("cid"), col("similitud"))
        .orderBy("doc_a", "doc_b")
    }),

    // Near-dup CLUSTER assignment: connected components over the exact
    // Jaccard >= 0.9 pair graph (the `dedup_ngram` edge set); every doc
    // gets cluster_id = min doc_id of its component (singletons keep their
    // own id). This is the step that turns a pair list into per-cluster
    // survivor selection in a dedup pipeline.
    //
    // Spark-first CC with the collapse folded in: docs with identical
    // token sets are connected by definition, so CC runs on the CONTRACTED
    // graph — one node per unique set (gid), edges = set pairs with
    // Jaccard >= 0.9 (one fused SelfPairwise pass, never expanded to
    // member pairs). Each doc then inherits its group's component label.
    // Contraction preserves connectivity exactly: an intra-group doc pair
    // maps to one node, and a surviving cross-group doc pair implies the
    // same score for ALL member pairs of those two sets, i.e. exactly the
    // contracted edge. Label propagation is the GraphX/Pregel CC algorithm
    // expressed relationally — each round every node takes min(own label,
    // neighbors' labels) — and runs on the tiny contracted edge list
    // (pre-collapse it iterated over every member pair: 1.9M rows per
    // round at sf0.1, measured 8.1 s total).
    "dedup_clusters" -> ((s, dir) =>
      clusterLabels(s, dir).orderBy("doc_id"))
  )

  /** Session-shared (doc_id, cluster_id) label table: THREE declared keys
    * consume the identical labeling (`dedup_clusters`, `pipe_e2e`'s
    * survivor filter, `pipe_near_dedup_report`'s histogram), and each was
    * re-running the full SelfPairwise pair scan + CC because Bench/Verify
    * clear the SQL cache between queries. Materialized ONCE per (session,
    * fixture dir) to a session-scoped scratch parquet — the SAME
    * materialized-view move, lifecycle, and cluster-safe scratch root as
    * [[SimilarityOps.similarEdges]] (whose scaladoc carries the full
    * rationale); the label table is doc-cardinality × 2 longs, orders of
    * magnitude smaller than the corpus, so write-once + scan-per-query is
    * the right trade at any scale (r18 opt round: derivation measured
    * 0.9–1.2 s per consumer at sf0.1, × 3 consumers per sweep). */
  private val labelMemo = new SessionMemo[String, String]

  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val path = labelMemo.getOrElseUpdate(s, dir) {
      val out = new org.apache.hadoop.fs.Path(SimilarityOps.scratchRoot(s),
        "graft_cluster_labels_" +
          java.util.UUID.randomUUID().toString.replace("-", ""))
      deriveClusterLabels(s, dir).write.mode("overwrite").parquet(out.toString)
      // orphan guard, as in similarEdges: reclaim on session death
      out.getFileSystem(s.sessionState.newHadoopConf()).deleteOnExit(out)
      out.toString
    }
    s.read.parquet(path)
  }

  /** Drop a session's shared label materializations (spec isolation —
    * mirrors [[SimilarityOps.evictSharedEdges]]) and delete their scratch
    * dirs so evict/re-derive cycles never orphan parquet. */
  private[graft] def evictSharedLabels(s: SparkSession): Unit =
    labelMemo.removeAll(s).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sessionState.newHadoopConf()).delete(hp, true)
      ()
    }

  /** The (doc_id, cluster_id) labeling behind `dedup_clusters`, without
    * the presentation sort — extracted (r11) so `pipe_e2e` can chain the
    * near-dedup survivor filter (doc_id == cluster_id keeps exactly one
    * representative per J ≥ 0.9 component) without paying a range
    * exchange it immediately re-partitions away. cluster_id = the
    * component's min doc_id, seeded through the exact-collapse gid. */
  private def deriveClusterLabels(s: SparkSession, dir: String): DataFrame = {
    {
      val c = collapse(s, dir)
      // gid = min doc_id of its group, so min gid over a component = min
      // doc_id over the component: seeding labels with gid yields the
      // final min-doc labeling directly.
      val uniq = c.uniq()
      val nodes = c.gidMap.select(col("gid"))
      // No coalesce here: with no exchange between SelfPairwise and the
      // persist, a coalesce(8) propagates UP the plan and runs the
      // quadratic pair scan itself on 8 tasks (measured 7.6 s vs 2 s at
      // sf0.1). localCC narrows to one task from the CACHED edge blocks,
      // which is free; the iterative path reads the cache per round.
      val edges = graft.plans.SelfPairwise(uniq,
        graft.plans.SelfPairwise.Jaccard, JaccardThreshold - 1e-3, triangular = true)
        .select(col("src"), col("dst"), round(col("score"), 4).as("jaccard"))
        .filter(col("jaccard") >= JaccardThreshold)
        .select(explode(array(
          struct(col("src").as("a"), col("dst").as("b")),
          struct(col("dst").as("a"), col("src").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .union(nodes.select(col("gid").as("a"), col("gid").as("b")))
        .persist()
      // The contracted graph is solved by [[localCC]] (one union-find
      // task) when it is small — the measured common case: contraction
      // leaves one node per unique set — and by the iterative relational
      // loop below beyond [[LocalCCMaxEdges]].
      // The labels are localCheckpoint'ed EAGERLY before the unpersist:
      // cache substitution happens at each action's planning, so a lazy
      // labels plan executed after unpersist would re-derive the whole
      // pair scan uncached — inside localCC's coalesce(1), serially.
      val labels =
        (if (edges.count() <= LocalCCMaxEdges) localCC(edges)
         else iterativeCC(edges, nodes)).localCheckpoint()
      edges.unpersist()
      // same size condition as the loop's joins: labels are
      // node-cardinality, so at broadcast-busting scale this final
      // label-application join must shuffle too (the count is cheap —
      // labels are checkpointed)
      c.docMap
        .select(col("doc_id"), col("gid").as("id"))
        .join(broadcastIfFits(labels, labels.count()), "id")
        .select(col("doc_id"), col("lbl").as("cluster_id"))
    }
  }

  /** `dedup_simhash`'s oracle (r17): the signature is a pure function of
    * the token SET, so the doc-level self-join below IS the Spark plan's
    * unique-set join + member expansion (identical sets share a
    * signature and land at Hamming 0). Every fragment marked by a
    * builder runs VERBATIM in the Spark plan too — md5 slices, votes,
    * pack — so the 32-bit words agree bit-for-bit and the popcount
    * compare is exact integer logic on both engines. Quadratic over the
    * ~|docs|² pair space by design (the oracle is allowed the slow
    * formulation; the Spark side pairs unique sets in the fused
    * SelfPairwise loop). */
  private def SimhashOracleSql: String =
    s"""WITH toks AS (
         SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok
         FROM documents),
       h AS (SELECT doc_id, md5(tok) AS h FROM toks),
       hv AS (SELECT doc_id, ${hex8Sql("h")} AS hv FROM h),
       votes AS (
         SELECT doc_id,
                ${(0 until 32).map(j => s"${simhashVoteSql(j)} AS v$j")
                  .mkString(",\n                ")}
         FROM hv GROUP BY doc_id),
       sig AS (SELECT doc_id, $simhashPackSql AS sh FROM votes)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
       FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.sh, b.sh)) <= $HammingMax
       ORDER BY doc_a, doc_b"""

  /** `dedup_simhash`'s signature stage — one 32-bit signature per UNIQUE
    * token set, as a persisted (gid, ARRAY<BIGINT>) relation ready for
    * the fused SelfPairwise Hamming scan. Extracted (r18, r17 verdict
    * item 4) so the signature build and the pair scan can be TIMED
    * separately when attributing the key's steady-state cost. */
  private[graft] def simhashSig(s: SparkSession, dir: String,
      c: Collapse): DataFrame = {
      // every gid IS its set's min doc_id, so the representative doc's
      // text reproduces the set — signatures are computed once per
      // UNIQUE set, off one size-conditional semi-join against the scan
      val reps = Tables.documents(s, dir)
        .join(Bcast.ifFitsRows(c.gidMap.select(col("gid")), c.nGids, 12),
          col("doc_id") === col("gid"))
      // spread the representative docs across the cluster BEFORE the
      // heavy per-token work: the fixture's documents parquet is one
      // split, and without this the explode + md5 + hex parse + 32 vote
      // partials all run inside that single scan task (measured ~1.9 s
      // serial vs ~0.1 s wide at sf0.1); the exchange itself is |sets|
      // slim text rows
      val votes = reps
        .repartition(s.sessionState.conf.numShufflePartitions)
        .select(col("gid"), explode(toks(col("text"))).as("tok"))
        .withColumn("h", md5(col("tok")))
        .selectExpr("gid", s"${hex8Sql("h")} AS hv")
        .groupBy("gid")
        .agg(expr(s"${simhashVoteSql(0)} AS v0"),
          (1 until 32).map(j => expr(s"${simhashVoteSql(j)} AS v$j")): _*)
      // one-word signature, but shipped as ARRAY<BIGINT> so the pair scan
      // is the fused SelfPairwise Hamming loop (the declarative
      // `a < b` BNLJ materializes a joined row for every one of the n²/2
      // candidate pairs BEFORE the popcount filter runs). The
      // repartition + persist matter: the probe side's parallelism IS
      // the fused loop's parallelism, and AQE coalesces the few-KB
      // post-aggregation sig relation to ONE partition — which then runs
      // the n² popcount scan single-threaded (measured: a ~1.7 s 1-task
      // stage at sf0.1 vs ~0.2 s over the 32 cached partitions). The
      // round-robin form is deliberate: a hash repartition on gid is
      // partitioning-identical to the groupBy's exchange, so the
      // optimizer elides it and AQE's coalesce wins anyway; an explicit
      // fixed-width round-robin survives both. The persisted relation
      // pins that width AND serves both of the fused operator's child
      // executions (build collect + probe stream) from one evaluation —
      // it is |sets| slim (long, 1-word array) rows, the collapse-family
      // cache shape. Cache lifecycle (r17 advice): like collapse()'s
      // persists, this entry is dropped by the harness's per-query
      // clearCache (Bench/Verify); within a long-lived session repeated
      // builder invocations do NOT pin fresh copies — CacheManager
      // dedups by semantic plan equality (cacheQuery is a no-op when
      // lookupCachedData hits), so one entry per (dir, conf) serves
      // every rebuild, the same reuse the SessionMemo stats pattern
      // gives the collapse maps.
      votes.selectExpr("gid", s"$simhashPackSql AS sh")
        .select(col("gid"), array(col("sh")).as("sh"))
        .repartition(s.sessionState.conf.numShufflePartitions)
        .persist()
  }

  def oracles: Map[String, String] = Map(
    "dedup_simhash" -> SimhashOracleSql,
    // gram identity is the k-token STRING here vs its xxhash64 in the
    // operator — identical grouping as long as the hash is injective on
    // the corpus's gram set (see the operator comment)
    "dedup_substring" ->
      s"""SELECT * FROM ($SubstringSpansSql)
          ORDER BY doc_id, span_start""",
    "dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY doc_id",
    "dedup_incremental" ->
      """SELECT doc_id, text FROM documents n
         WHERE doc_id % 7 = 3
           AND NOT EXISTS (
             SELECT 1 FROM documents e
             WHERE e.doc_id % 7 <> 3 AND e.text = n.text)
         ORDER BY doc_id""",
    // the cluster CTEs replay ml_kmeans's oracle verbatim (same unrolled
    // Lloyd loop), then the pair scan joins only within a1's clusters
    "dedup_semantic" ->
      s"""WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
          c0 AS (SELECT vec_id AS cid, e AS c FROM pts WHERE vec_id < 8),
          a0 AS (
            SELECT vec_id, cid FROM (
              SELECT p.vec_id, c.cid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       list_sum(list_transform(range(${SimilarityOps.EmbedDim}),
                         i -> (p.e[i + 1] - c.c[i + 1]) * (p.e[i + 1] - c.c[i + 1]))),
                       c.cid) AS rn
              FROM pts p CROSS JOIN c0 c
            ) WHERE rn = 1
          ),
          comp AS (
            SELECT a.cid, t.i AS d,
                   round(CAST(sum(CAST(p.e[t.i + 1] AS DECIMAL(28,10))) AS DOUBLE)
                         / count(*), 6) AS m
            FROM pts p JOIN a0 a USING (vec_id), range(${SimilarityOps.EmbedDim}) t(i)
            GROUP BY a.cid, t.i
          ),
          c1 AS (SELECT cid, list(m ORDER BY d) AS c FROM comp GROUP BY cid),
          a1 AS (
            SELECT vec_id, cid FROM (
              SELECT p.vec_id, c.cid,
                     row_number() OVER (PARTITION BY p.vec_id ORDER BY
                       list_sum(list_transform(range(${SimilarityOps.EmbedDim}),
                         i -> (p.e[i + 1] - c.c[i + 1]) * (p.e[i + 1] - c.c[i + 1]))),
                       c.cid) AS rn
              FROM pts p CROSS JOIN c1 c
            ) WHERE rn = 1
          )
          SELECT doc_a, doc_b, cid, similitud FROM (
            SELECT x.vec_id AS doc_a, y.vec_id AS doc_b, x.cid AS cid,
                   round(list_cosine_similarity(pa.e, pb.e) * 100, 4) AS similitud
            FROM a1 x JOIN a1 y ON x.cid = y.cid AND x.vec_id < y.vec_id
            JOIN pts pa ON pa.vec_id = x.vec_id
            JOIN pts pb ON pb.vec_id = y.vec_id
          ) WHERE similitud >= $SemanticDupSim
          ORDER BY doc_a, doc_b""",
    // identical ground truth by construction (see the dedup_prefix
    // completeness argument) — the deterministic prefix-filter join is
    // exactly the quadratic set-similarity join, candidate-pruned.
    // Oracle form (r10): a pair at rounded J ≥ t shares at least one
    // token (t > 0) and satisfies min/max ≥ t − rounding slack, so
    // counting shared DISTINCT tokens per length-compatible co-occurring
    // pair — c = |A∩B|, union = na + nb − c — is exhaustive and exact.
    // Replaces the doc×doc cross join whose per-pair list_intersect blew
    // verify_scale's 90 s budget at sf0.1 (measured: 39 s → 0.8 s at
    // sf0.01, 54 s at sf0.1; bit-identical results at both SFs).
    "dedup_prefix" -> PairsOracleSql,
    "dedup_ngram" -> PairsOracleSql,
    "dedup_soft" ->
      """SELECT doc_id, n_copies, round(1.0 / n_copies, 4) AS weight
         FROM (
           SELECT doc_id, count(*) OVER (PARTITION BY md5(text)) AS n_copies
           FROM documents
         ) ORDER BY doc_id""",
    // the boundary gate replays via the text_hashed_features 0x-cast md5
    // mapping; string_agg(ORDER BY pos) rebuilds each chunk in token order
    "dedup_chunk" ->
      """WITH toks AS (
           SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         ), pos AS (
           SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS pos FROM toks
         ), tk AS (
           SELECT doc_id, pos, ts[pos] AS token,
                  CASE WHEN CAST(('0x' || substring(md5(ts[pos]), 1, 4))
                            AS INT) % 8 = 0 THEN 1 ELSE 0 END AS b
           FROM pos
         ), ch AS (
           SELECT doc_id, pos, token,
                  CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS chunk_id
           FROM tk
         ), chunks AS (
           SELECT doc_id, chunk_id, CAST(count(*) AS BIGINT) AS n_toks,
                  md5(string_agg(token, ' ' ORDER BY pos)) AS fp
           FROM ch GROUP BY doc_id, chunk_id
         ), clusters AS (
           SELECT fp, CAST(count(*) AS BIGINT) AS cluster_size,
                  CAST(min(n_toks) AS BIGINT) AS n_toks
           FROM chunks GROUP BY fp
         ), hist AS (
           SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
                  CAST(sum(n_toks * (cluster_size - 1)) AS BIGINT)
                    AS dup_token_mass
           FROM clusters GROUP BY cluster_size
         )
         SELECT cluster_size, n_clusters,
                CAST(cluster_size * n_clusters AS BIGINT) AS n_chunks,
                dup_token_mass,
                floor(CAST(cluster_size * n_clusters AS DOUBLE) /
                      sum(cluster_size * n_clusters) OVER () * 1e6 + 0.5)
                  / 1e6 AS pct_chunks
         FROM hist ORDER BY cluster_size""",
    "dedup_paragraph" ->
      """SELECT segment, count(DISTINCT doc_id) AS n_docs,
                min(doc_id) AS first_doc
         FROM (
           SELECT doc_id,
                  unnest(list_transform(
                    generate_series(0, (len(toks) - 1) // 10),
                    i -> array_to_string(toks[i*10+1 : i*10+10], ' '))) AS segment
           FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
         )
         GROUP BY segment HAVING count(DISTINCT doc_id) > 1
         ORDER BY segment""",
    // same shared-token-count form, no length prune (containment = 1.0
    // allows any size ratio); a subset pair always co-occurs on every
    // token of the smaller side, so the count join is exhaustive
    "dedup_contain" ->
      """WITH toks AS (
           SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok,
                  len(list_distinct(string_split(text,' '))) AS n
           FROM documents),
         inter AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS c
           FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b, containment FROM (
           SELECT doc_a, doc_b,
                  round(1.0 * c / least(na, nb), 4) AS containment FROM inter)
         WHERE containment >= 1.0 ORDER BY doc_a, doc_b""",
    "dedup_embed" ->
      """SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                             CAST(b.embedding AS DOUBLE[])) * 100, 4) AS similitud
         FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id
         ORDER BY similitud DESC, doc_a, doc_b LIMIT 100""",
    // Connected components as a round-capped synchronous min-label
    // iteration (r10): each recursive round's delta carries the FULL
    // |nodes|-row label vector (left branch) plus every neighbor
    // relaxation (right branch), and the grouped min is the next label
    // vector — rows per round stay |nodes| + |directed edges|, vs the
    // old reach-closure whose row count was Σ component-size² (the
    // fixture's 2,652-doc giant near-dup component at sf0.1 made that
    // formulation run for tens of minutes; this one measures 51 s at
    // sf0.1, 1.2 s at sf0.01, bit-identical labels — cross-checked
    // against an independent union-find at both SFs). Min-label BFS
    // converges in ecc(min-id node) rounds — measured 8 at sf0.1; the
    // 32-round cap gives 4× margin and rounds past convergence re-emit
    // the fixed vector, so selecting r = 32 yields the fixpoint.
    "dedup_clusters" -> ClustersOracleSql
  )

  /** `dedup_clusters`' oracle, shared with `pipe_near_dedup_report`
    * (which histograms these labels) the way ComponentsSql is shared on
    * the graph side. See the r10 note at the map entry above. */
  /** `dedup_substring`'s span derivation as DuckDB SQL — one definition
    * nested by both the dedup oracle (ordered) and
    * `pipe_substring_report`'s (aggregated), mirroring the
    * [[substringSpans]] factoring on the Spark side. */
  private[graft] val SubstringSpansSql: String =
    s"""WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        ), pos AS (
          SELECT doc_id, ts,
                 unnest(range(1, greatest(len(ts) - ${SubstringK - 2}, 1)))
                   AS pos
          FROM toks
        ), grams AS (
          SELECT doc_id, pos,
                 array_to_string(ts[pos:pos + ${SubstringK - 1}], ' ') AS g
          FROM pos
        ), dup AS (
          SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1
        ), isl0 AS (
          SELECT doc_id, pos,
                 CASE WHEN pos - lag(pos) OVER
                        (PARTITION BY doc_id ORDER BY pos) > $SubstringK
                      THEN 1 ELSE 0 END AS brk
          FROM grams JOIN dup USING (g)
        ), isl AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS UNBOUNDED PRECEDING) AS grp
          FROM isl0
        )
        SELECT doc_id, min(pos) AS span_start,
               max(pos) - min(pos) + $SubstringK AS span_len
        FROM isl GROUP BY doc_id, grp"""

  private[graft] val ClustersOracleSql: String =
      s"""WITH RECURSIVE toks AS (
            SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok,
                   len(list_distinct(string_split(text,' '))) AS n
            FROM documents),
          inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS c
            FROM toks a JOIN toks b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
             AND least(a.n, b.n) >= ${JaccardThreshold - 0.001} * greatest(a.n, b.n)
            GROUP BY 1, 2),
          pairs AS (
            SELECT doc_a AS src, doc_b AS dst FROM (
              SELECT doc_a, doc_b,
                     round(1.0 * c / (na + nb - c), 4) AS jaccard FROM inter)
            WHERE jaccard >= $JaccardThreshold),
          edges AS MATERIALIZED (
            SELECT src AS a, dst AS b FROM pairs
            UNION ALL SELECT dst AS a, src AS b FROM pairs),
          labels(r, id, lbl) AS (
            SELECT 0, doc_id, doc_id FROM documents
            UNION ALL
            SELECT r + 1, id, min(lbl) FROM (
              SELECT l.r AS r, l.id AS id, l.lbl AS lbl FROM labels l
              UNION ALL
              SELECT l.r, e.b, l.lbl FROM labels l JOIN edges e ON e.a = l.id
            ) WHERE r < 32 GROUP BY r, id
          )
          SELECT doc_id, cluster_id FROM (
            SELECT id AS doc_id, lbl AS cluster_id FROM labels WHERE r = 32
            UNION ALL
            -- convergence canary: min-label BFS needs ecc(min-id node)
            -- rounds (measured 8 at sf0.1; cap 32 = 4x margin). If a
            -- future fixture ever ships a component deeper than the cap,
            -- labels would still be moving at r = 32 — emit a poison row
            -- so the gate fails LOUDLY as "oracle not converged" instead
            -- of surfacing as a plausible-looking label mismatch that
            -- gets debugged as a Spark CC bug.
            SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
            WHERE EXISTS (SELECT 1 FROM labels a JOIN labels b USING (id)
                          WHERE a.r = 32 AND b.r = 31 AND a.lbl <> b.lbl)
          ) ORDER BY doc_id"""

  /** Shared oracle for `dedup_prefix`/`dedup_ngram` (both compute the
    * exact J ≥ t pair set): count shared DISTINCT tokens per
    * length-compatible co-occurring pair, then the Jaccard in closed
    * form from (c, na, nb). The length prune keeps soundness through
    * the 4dp rounding boundary: rounded J ≥ t implies raw J ≥ t − 5e-5,
    * hence min/max ≥ t − 5e-5 > t − 1e-3. */
  private val PairsOracleSql: String =
    s"""WITH toks AS (
         SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS tok,
                len(list_distinct(string_split(text,' '))) AS n
         FROM documents),
       inter AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                any_value(a.n) AS na, any_value(b.n) AS nb, count(*) AS c
         FROM toks a JOIN toks b
           ON a.tok = b.tok AND a.doc_id < b.doc_id
          AND least(a.n, b.n) >= ${JaccardThreshold - 0.001} * greatest(a.n, b.n)
         GROUP BY 1, 2)
       SELECT doc_a, doc_b, jaccard FROM (
         SELECT doc_a, doc_b,
                round(1.0 * c / (na + nb - c), 4) AS jaccard FROM inter)
       WHERE jaccard >= $JaccardThreshold ORDER BY doc_a, doc_b"""
}
