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
