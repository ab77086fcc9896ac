package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable frequent-items sketch (SpaceSaving / Metwally et al.) — the
  * scale path for "top tokens over 100 TB": an exact top-k needs a full
  * groupBy over every distinct item; this keeps a BOUNDED `capacity`-entry
  * counter table per partial (ObjectHashAggregate map side), ships only
  * those entries through the shuffle, and merges by summing common keys
  * and truncating back to capacity.
  *
  * Guarantees (single-pass): every item with true count > N/capacity is
  * present, and each reported count overestimates by at most the smallest
  * displaced counter. When `capacity` ≥ the true distinct-item count the
  * sketch degenerates to EXACT counts — pinned in AggSpec against the
  * exact `text_tokens` aggregation.
  */
object FreqSketch {

  case class Buf(items: Seq[String], counts: Seq[Long])

  class SpaceSaving(capacity: Int) extends Aggregator[String, Buf, Buf] {

    override def zero: Buf = Buf(Nil, Nil)

    override def reduce(b: Buf, item: String): Buf = {
      val i = b.items.indexOf(item)
      if (i >= 0) Buf(b.items, b.counts.updated(i, b.counts(i) + 1))
      else if (b.items.length < capacity) Buf(b.items :+ item, b.counts :+ 1L)
      else {
        // displace the minimum counter, inheriting its count (+1) — the
        // SpaceSaving overestimate bound
        var mi = 0
        var m = b.counts.head
        var j = 1
        while (j < b.counts.length) {
          if (b.counts(j) < m) { m = b.counts(j); mi = j }
          j += 1
        }
        Buf(b.items.updated(mi, item), b.counts.updated(mi, m + 1))
      }
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      val m = scala.collection.mutable.LinkedHashMap[String, Long]()
      b1.items.zip(b1.counts).foreach { case (k, v) => m(k) = m.getOrElse(k, 0L) + v }
      b2.items.zip(b2.counts).foreach { case (k, v) => m(k) = m.getOrElse(k, 0L) + v }
      val kept = m.toSeq.sortBy { case (k, v) => (-v, k) }.take(capacity)
      Buf(kept.map(_._1), kept.map(_._2))
    }

    // deterministic output order: count desc, item asc
    override def finish(r: Buf): Buf = {
      val s = r.items.zip(r.counts).sortBy { case (k, v) => (-v, k) }
      Buf(s.map(_._1), s.map(_._2))
    }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Column aggregate: the sketch as a struct of parallel arrays
    * (items, counts), ordered by (count desc, item asc). */
  def freqItems(capacity: Int)(item: Column): Column =
    udaf(new SpaceSaving(capacity), Encoders.STRING).apply(item)
}
