package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Map-side partial top-k by score (SURVEY §2 B6/B1 scale path).
  *
  * `Window.partitionBy(key).orderBy(score).row_number <= k` shuffles EVERY
  * row to the key's partition before discarding all but k. This Aggregator
  * keeps a bounded k-buffer per key on the map side (ObjectHashAggregate
  * partial mode), so the shuffle carries at most k entries per (partition,
  * key) — at a billion pairs per key, the window moves them all; this
  * moves 32·k.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * `sim_topk` window/oracle specification.
  */
object TopK {

  case class Entry(id: Long, score: Double)
  case class Buf(ids: Seq[Long], scores: Seq[Double])

  class TopKAgg(k: Int) extends Aggregator[(Long, Double), Buf, Buf] {

    override def zero: Buf = Buf(Nil, Nil)

    private def insert(b: Buf, id: Long, score: Double): Buf = {
      // position by (score desc, id asc)
      val n = b.ids.length
      var i = 0
      while (i < n && (b.scores(i) > score || (b.scores(i) == score && b.ids(i) < id))) i += 1
      if (i >= k) b
      else Buf(
        (b.ids.take(i) :+ id) ++ b.ids.drop(i).take(k - i - 1),
        (b.scores.take(i) :+ score) ++ b.scores.drop(i).take(k - i - 1))
    }

    override def reduce(b: Buf, a: (Long, Double)): Buf = insert(b, a._1, a._2)

    override def merge(b1: Buf, b2: Buf): Buf =
      b2.ids.zip(b2.scores).foldLeft(b1) { case (acc, (id, s)) => insert(acc, id, s) }

    override def finish(r: Buf): Buf = r

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Column aggregate: top-k (id, score) pairs per group as a struct of
    * parallel arrays ordered by (score desc, id asc). */
  def topK(k: Int)(id: Column, score: Column): Column =
    udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(id, score)
}

/** Map-side min-K DISTINCT string fold — the KMV-sketch partial
  * (`agg_kmv_jaccard`; r15 verdict item 1). The window form
  * (`distinct()` + `row_number().over(partitionBy(keys).orderBy(h))`)
  * ships the ENTIRE distinct cell relation to each group's partition
  * and sorts it before discarding all but K; this Aggregator keeps a
  * sorted bounded buffer per group on the map side (ObjectHashAggregate
  * partial mode), so the exchange carries at most K entries per
  * (partition, group) at any corpus size — AND subsumes the separate
  * `distinct()` pass, because duplicates collapse inside the buffer
  * (min-K of a multiset == min-K of its distinct support).
  *
  * Ordering is plain lexicographic `compareTo` — for lowercase md5 hex
  * (ASCII subset) that is exactly the 128-bit numeric hash order and
  * exactly the oracle's `ORDER BY h` collation. The hot path is O(1):
  * once the buffer holds K entries, any value >= the current max is
  * rejected on one comparison; accepted values binary-search their slot.
  */
object MinK {

  /** Buffer/output wrapper so `Encoders.product` round-trips it through
    * shuffles (the TopK/TDigest discipline); `hs` stays ascending-sorted
    * and duplicate-free at all times. */
  case class SBuf(hs: Array[String])

  class MinKAgg(k: Int) extends Aggregator[String, SBuf, SBuf] {
    require(k >= 1, s"min-K sketch size must be >= 1, got $k")

    override def zero: SBuf = SBuf(Array.empty)

    private def insert(b: Array[String], v: String): Array[String] = {
      val n = b.length
      // saturated-buffer fast path: >= max → duplicate or too large
      if (n == k && v.compareTo(b(n - 1)) >= 0) return b
      val at = java.util.Arrays.binarySearch(
        b.asInstanceOf[Array[AnyRef]], v.asInstanceOf[AnyRef])
      if (at >= 0) return b // duplicate collapses in the buffer
      val i = -at - 1
      if (i >= k) return b
      val m = math.min(n + 1, k)
      val out = new Array[String](m)
      System.arraycopy(b, 0, out, 0, i)
      out(i) = v
      System.arraycopy(b, i, out, i + 1, m - i - 1)
      out
    }

    override def reduce(b: SBuf, v: String): SBuf =
      if (v == null) b else SBuf(insert(b.hs, v))

    override def merge(b1: SBuf, b2: SBuf): SBuf =
      SBuf(b2.hs.foldLeft(b1.hs)(insert))

    override def finish(r: SBuf): SBuf = r

    override def bufferEncoder: Encoder[SBuf] = Encoders.product[SBuf]
    override def outputEncoder: Encoder[SBuf] = Encoders.product[SBuf]
  }

  /** Column aggregate: the K smallest distinct values of `v` per group,
    * as a struct holding one ascending-sorted array (`.getField("hs")`
    * / `explode(col("...").getField("hs"))` to unnest). */
  def minK(k: Int)(v: Column): Column =
    udaf(new MinKAgg(k), Encoders.STRING).apply(v)
}
