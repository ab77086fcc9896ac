package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, coalesce, count, lit, sum}
import org.apache.spark.sql.internal.SQLConf

/** Size-conditional broadcast hints for DATA-DEPENDENT relations.
  *
  * A `broadcast()` of a vocabulary-, node-, user-, or content-cardinality
  * frame is correct at fixture scale and a driver OOM at 100×: the hint is
  * unconditional, so Spark collects the relation to the driver no matter
  * how large it grew. Every such site must instead estimate the relation's
  * serialized size and fall back to a shuffle join past the session's
  * broadcast budget — the same data-size-adaptive call Spark itself makes
  * from table statistics, made explicitly here because these frames sit
  * behind aggregations/checkpoints that erase stats. (Bounded relations —
  * single-row stats, constant term lists, ≤|types|×24 aggregates — keep
  * their plain `broadcast()`.)
  */
object Bcast {

  /** The session's broadcast budget; <= 0 means broadcasting is disabled. */
  def budget: Long = SQLConf.get.autoBroadcastJoinThreshold

  /** Broadcast `df` only while `estBytes` fits the budget; identity
    * otherwise, so the consuming join degrades to a shuffle join instead
    * of collecting an unbounded relation to the driver. */
  def ifFits(df: DataFrame, estBytes: Long): DataFrame =
    if (budget > 0 && estBytes <= budget) broadcast(df) else df

  /** Row-count form for slim fixed-width frames: `bytesPerRow` should be
    * a conservative serialized estimate (32 covers a pair of longs plus
    * row framing — the shape of label/degree/weight maps). */
  def ifFitsRows(df: DataFrame, rows: Long, bytesPerRow: Long = 32L): DataFrame =
    ifFits(df, rows * bytesPerRow)

  /** Measured sizes memoized per (session, logical-plan semanticHash,
    * keyLen-expression hash) so re-invocations of the same measurement in
    * one session — bench warm passes, verify reruns — skip the stats job
    * and pay only the persist. The keyLen expression is part of the key:
    * two sites measuring the SAME plan with different per-row estimates
    * must not share a value, or the smaller estimate could silently
    * authorize an over-budget broadcast. Safe because the fixture dirs
    * are immutable within a session and the plan hash pins the data dir
    * (it appears in the scan). A 32-bit hash collision across the few
    * dozen distinct vocabulary plans a session builds is ~1e-7 and would
    * only mis-size a hint, never change results. Growth is bounded by
    * #queries × #sfdirs per LIVE session — [[SessionMemo]] drops a dead
    * session's entries with the session itself. */
  private val measured = new SessionMemo[(Int, Int), Long]

  /** Measure `df`'s estimated serialized size — sum of `keyLen` + 64
    * bytes/row of fixed overhead, the pipe_vocab convention — in ONE
    * stats job, memoized per (session, plan, keyLen) as above. `df`
    * should already be persisted: the stats job then materializes a
    * cache the consuming join reuses instead of recomputing the
    * upstream scan. */
  def measuredBytes(df: DataFrame, keyLen: Column): Long = {
    // Column hides its expression tree in Spark 4; the canonical
    // toString (e.g. "(size(th_e) * 8)") distinguishes estimates just as
    // well for the memo key
    val key = (df.semanticHash(), keyLen.toString.hashCode)
    measured.getOrElseUpdate(df.sparkSession, key) {
      val st = df.agg(count(lit(1)).as("n"),
        coalesce(sum(keyLen.cast("long")), lit(0L)).as("bytes")).first()
      st.getLong(1) + 64L * st.getLong(0)
    }
  }

  /** Persist a vocabulary-sized aggregate, measure it via
    * [[measuredBytes]], and return it broadcast-or-not. The frame stays
    * persisted — Verify/Bench clear the session cache between queries.
    * Two stats-job elisions (the measurement is pure overhead in both):
    *   - budget <= 0: broadcasting is off, the decision is fixed;
    *   - memo hit: this session already measured this exact plan. */
  def vocabHinted(df: DataFrame, keyLen: Column): DataFrame = {
    if (budget <= 0) return df.persist()
    val p = df.persist()
    ifFits(p, measuredBytes(p, keyLen))
  }
}

/** A memo scoped to the life of a SparkSession.
  *
  * The r10 memos keyed on `System.identityHashCode(session)`, which has
  * two defects the advisor flagged: identity hashes are not unique, so
  * after a session is GC'd a NEW session can reuse the hash and (with an
  * equal inner key — same fixture path whose contents changed between
  * sessions) read a stale measurement that silently authorizes an
  * over-budget broadcast; and entries for dead sessions accumulate
  * forever in a long-lived JVM (a Spark thrift/notebook server). Keying
  * the OUTER map weakly on the session object itself fixes both: two
  * live sessions can never collide (object identity, not a hash), and a
  * collected session's entire entry set becomes unreachable with it.
  * Values must not reference the session (all current uses store Longs/
  * tuples), or they would pin the weak key. */
/** Session-scoped scratch-parquet materialization of a derived table
  * shared by several declared keys — the similarEdges/clusterLabels
  * materialized-view lifecycle packaged once (r18 opt): derive ONCE per
  * (session, fixture dir), write to the cluster-safe scratch root, read
  * back with a FIXED schema (no inference job on a memo hit), orphan
  * guard via deleteOnExit, evict hook for spec isolation. Use only for
  * bounded derived relations (maps, labels, per-doc frames) — never for
  * corpus-scale payloads. */
private[operators] final class SessionTableMemo(prefix: String,
    schema: org.apache.spark.sql.types.StructType) {
  private val memo = new SessionMemo[String, String]

  def get(s: org.apache.spark.sql.SparkSession, dir: String)(
      derive: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val path = memo.getOrElseUpdate(s, dir) {
      val out = new org.apache.hadoop.fs.Path(SimilarityOps.scratchRoot(s),
        prefix + java.util.UUID.randomUUID().toString.replace("-", ""))
      derive.write.mode("overwrite").parquet(out.toString)
      out.getFileSystem(s.sessionState.newHadoopConf()).deleteOnExit(out)
      out.toString
    }
    s.read.schema(schema).parquet(path)
  }

  /** Drop this memo's materializations for one session and delete their
    * scratch dirs (the removeAll external-resource contract). */
  def evict(s: org.apache.spark.sql.SparkSession): Unit =
    memo.removeAll(s).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(s.sessionState.newHadoopConf()).delete(hp, true)
      ()
    }
}

private[operators] final class SessionMemo[K, V] {
  private val outer = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[K, V]]())

  private def inner(s: org.apache.spark.sql.SparkSession) =
    outer.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[K, V]())

  def get(s: org.apache.spark.sql.SparkSession, k: K): Option[V] =
    Option(inner(s).get(k))

  def put(s: org.apache.spark.sql.SparkSession, k: K, v: V): Unit =
    inner(s).put(k, v)

  def getOrElseUpdate(s: org.apache.spark.sql.SparkSession, k: K)(v: => V): V =
    inner(s).computeIfAbsent(k, _ => v)

  /** Drop every entry of one session (spec isolation). */
  def remove(s: org.apache.spark.sql.SparkSession): Unit = outer.remove(s)

  /** Drop every entry of one session and return the removed values —
    * for memos whose values name EXTERNAL resources (temp parquet
    * dirs): the caller deletes what it owned, so evict/re-derive cycles
    * don't orphan scratch directories (r13 advice). */
  def removeAll(s: org.apache.spark.sql.SparkSession): Seq[V] = {
    import scala.jdk.CollectionConverters._
    Option(outer.remove(s)).map(_.values.asScala.toSeq).getOrElse(Seq.empty)
  }
}
