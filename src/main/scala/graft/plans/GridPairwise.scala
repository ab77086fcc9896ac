package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shuffle-distributed all-pairs comparison via B×B grid partitioning —
  * the at-scale complement of [[SelfPairwise]].
  *
  * [[SelfPairwise]] broadcasts the build side (the contract of Spark's own
  * broadcast joins) and is the right plan while one side fits an
  * executor. Past that point the standard move (Okcan & Riedewald's
  * theta-join grid; the same layout Spark's `CartesianProduct` partitions
  * by, but with explicit control of the replication factor) is:
  *
  *   - assign every row a block `blk = hash(id) mod B`;
  *   - the LEFT copy of a row in block p is replicated to grid keys
  *     (p, j) for j in [p, B); the RIGHT copy to (i, p) for i in [0, p];
  *   - an ordinary shuffled equi-join on the grid key (i, j) then brings
  *     exactly the rows of block-pair (i, j) together — every unordered
  *     pair meets in exactly one grid cell (cross-block pairs via the one
  *     orientation with i ≤ j; in-block pairs on the diagonal, deduped by
  *     the id ordering filter).
  *
  * Each side is replicated ~(B+1)/2 times, so shuffle volume is
  * O(n·B) while the compare work stays O(n²/B²) per cell × B(B+1)/2
  * cells = O(n²) — B tunes cell size to executor memory, exactly like
  * choosing a broadcast threshold. The score expression runs inside the
  * join's generated loop (codegen'd), and the threshold filter prunes
  * before anything downstream materializes.
  *
  * Parity with SelfPairwise is pinned in GridPairwiseSpec; the plan shape
  * (shuffled join on the grid key, no broadcast of either side, no
  * CartesianProduct) is asserted there too.
  */
object GridPairwise {

  /** All unordered pairs (emitted as src < dst) of `df`'s (id, vec) rows
    * whose `score(va, vb)` passes `minScore`, computed with grid
    * parallelism `b`. `df`'s first two columns must be (id: LONG,
    * vec: ARRAY); `score` must be symmetric (every pairwise metric here
    * is) because an off-diagonal cell sees the pair in whichever
    * block-orientation it hashed to and the output is re-oriented with
    * least/greatest. Diagonal cells (i = j) hold both copies of their
    * rows, so only they dedupe on the id ordering. */
  def apply(df: DataFrame, b: Int,
            score: (Column, Column) => Column,
            minScore: Column): DataFrame = {
    val Seq(idCol, vecCol) = df.columns.toSeq.take(2)
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("blk", pmod(xxhash64(col("id")), lit(b.toLong)).cast("int"))
    val left = base.select(col("id").as("lid"), col("vec").as("va"),
      col("blk").as("i"),
      explode(sequence(col("blk"), lit(b - 1))).as("j"))
    val right = base.select(col("id").as("rid"), col("vec").as("vb"),
      explode(sequence(lit(0), col("blk"))).as("i"),
      col("blk").as("j"))
    left.hint("shuffle_hash").join(right, Seq("i", "j"))
      .filter(col("i") =!= col("j") || col("lid") < col("rid"))
      .filter(col("lid") =!= col("rid"))
      .select(least(col("lid"), col("rid")).as("src"),
        greatest(col("lid"), col("rid")).as("dst"),
        score(col("va"), col("vb")).as("score"))
      .filter(col("score") >= minScore)
  }
}
