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

  /** Persist a vocabulary-sized aggregate, measure its serialized size in
    * ONE stats job (sum of `keyLen` + 64 bytes/row of fixed overhead —
    * the pipe_vocab convention), and return it broadcast-or-not. Without
    * the persist the deciding count would recompute the aggregate's whole
    * upstream scan; with it, the stats job materializes a cache the
    * consuming join reuses. The frame stays persisted — Verify/Bench
    * clear the session cache between queries. */
  def vocabHinted(df: DataFrame, keyLen: Column): DataFrame = {
    val p = df.persist()
    val st = p.agg(count(lit(1)).as("n"),
      coalesce(sum(keyLen.cast("long")), lit(0L)).as("bytes")).first()
    ifFits(p, st.getLong(1) + 64L * st.getLong(0))
  }
}
