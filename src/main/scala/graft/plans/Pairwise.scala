package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}

/** Stats-driven front door for pairwise similarity: picks the broadcast
  * operator ([[SelfPairwise]]) or the grid-distributed plan
  * ([[GridPairwise]]) from the OPTIMIZED plan's size estimate — the same
  * signal (and the same threshold conf) Spark's planner uses to choose
  * BroadcastHashJoin vs a shuffled join. No data is read to decide:
  * Catalyst's stats propagate from the Parquet footers through the
  * projection, so the choice is free at plan time and robust to the
  * caller not knowing their input's scale.
  *
  * Grid size is chosen so one block ≈ the broadcast threshold — each
  * grid cell then holds roughly what a broadcast build side would have,
  * keeping per-task memory bounded by the same knob a cluster already
  * tunes.
  */
object Pairwise {

  /** The broadcast-vs-grid decision both entry points share: None →
    * broadcast ([[SelfPairwise]]); Some(blocks) → grid with that block
    * count. The block arithmetic stays in BigInt space until after the
    * cap: stats-less inputs carry Catalyst's defaultSizeInBytes
    * (Long.MaxValue), whose block count overflows Int and a bare
    * `.toInt` would wrap NEGATIVE — clamping the hugest inputs to the
    * 2-block minimum, the exact opposite of what they need. */
  private def gridBlocks(df: DataFrame): Option[Int] =
    gridBlocksFor(df.queryExecution.optimizedPlan.stats.sizeInBytes)

  /** Same decision from a raw byte estimate — shared with
    * [[PairwiseRewrite]], which sees the logical subtree (and its stats)
    * rather than a DataFrame. */
  def gridBlocksFor(bytes: BigInt): Option[Int] = {
    val threshold =
      org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    // threshold <= 0 is Spark's "never broadcast" setting → grid path
    if (threshold > 0 && bytes <= BigInt(threshold)) None
    else {
      // one block per threshold-sized slice (10 MB default slice when
      // broadcasting is disabled outright), at least 2 so the plan is
      // genuinely distributed, capped so replication stays sane
      val slice = if (threshold > 0) threshold else 10L << 20
      Some((bytes / BigInt(slice)).max(2).min(256).toInt)
    }
  }

  /** (id, vec) projection of the first two columns — the only ones the
    * pairwise operators read. SelfPairwiseNode deliberately blocks
    * ColumnPruning (it reads positionally), so without this a wide
    * caller frame would be collected and broadcast whole. */
  private def slim(df: DataFrame): DataFrame =
    df.select(df.columns.take(2).map(col): _*)

  /** Cosine pairs (src < dst, score scaled ×100 and rounded like
    * `sim_edges`) with `similitud >= minSimilitud`, planned by broadcast
    * or grid according to the session's autoBroadcastJoinThreshold. */
  def cosineAuto(df: DataFrame, minSimilitud: Double): DataFrame =
    gridBlocks(df) match {
      case None =>
        SelfPairwise(slim(df), SelfPairwise.Cosine, (minSimilitud - 0.01) / 100.0,
          triangular = true)
          .select(col("src"), col("dst"),
            org.apache.spark.sql.functions.round(col("score") * 100, 4).as("similitud"))
          .filter(col("similitud") >= minSimilitud)
      case Some(blocks) =>
        GridPairwise(slim(df), blocks,
          (x, y) => graft.functions.Vectors.similitud(x, y),
          lit(minSimilitud))
          .withColumnRenamed("score", "similitud")
    }

  /** Token-set Jaccard twin of [[cosineAuto]]: raw score in [0,1],
    * caller-side rounding/thresholding as in the dedup suite. */
  def jaccardAuto(df: DataFrame, minJaccard: Double): DataFrame =
    gridBlocks(df) match {
      case None =>
        SelfPairwise(slim(df), SelfPairwise.Jaccard, minJaccard - 1e-3,
          triangular = true)
      case Some(blocks) =>
        GridPairwise(slim(df), blocks,
          (x, y) => graft.functions.ArrayExprs.sortedJaccard(x, y),
          lit(minJaccard - 1e-3))
    }

  /** Exposed for tests: the byte estimate the decision reads. */
  def estimatedBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes
}
