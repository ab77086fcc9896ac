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
  *
  * The aggregation buffer is a MUTABLE hash map under a kryo encoder:
  * ObjectHashAggregate keeps the buffer as a live object between rows and
  * serializes it only at the shuffle boundary, so `reduce` must be
  * allocation-free — the earlier immutable-Seq form (linear `indexOf` +
  * two copied Seqs per row) measured ~4× slower on the same scan. The
  * output stays a plain (items, counts) struct of parallel arrays.
  */
object FreqSketch {

  /** Final sketch: parallel arrays ordered by (count desc, item asc). */
  case class Buf(items: Seq[String], counts: Seq[Long])

  /** Mutable aggregation state — one bounded counter table. */
  final class SSBuf {
    val m = new java.util.HashMap[String, Long]()
  }

  class SpaceSaving(capacity: Int) extends Aggregator[String, SSBuf, Buf] {

    override def zero: SSBuf = new SSBuf

    override def reduce(b: SSBuf, item: String): SSBuf = {
      val cur = b.m.get(item)
      if (cur != 0L || b.m.containsKey(item)) b.m.put(item, cur + 1L)
      else if (b.m.size < capacity) b.m.put(item, 1L)
      else {
        // displace the minimum counter, inheriting its count (+1) — the
        // SpaceSaving overestimate bound
        var minK: String = null
        var minV = Long.MaxValue
        val it = b.m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue < minV) { minV = e.getValue; minK = e.getKey }
        }
        b.m.remove(minK)
        b.m.put(item, minV + 1L)
      }
      b
    }

    override def merge(b1: SSBuf, b2: SSBuf): SSBuf = {
      val it = b2.m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val prev = if (b1.m.containsKey(k)) b1.m.get(k) else 0L
        b1.m.put(k, prev + e.getValue)
      }
      if (b1.m.size > capacity) {
        // truncate back to the capacity largest, (count desc, item asc)
        val kept = topEntries(b1.m)
        b1.m.clear()
        kept.foreach { case (k, v) => b1.m.put(k, v) }
      }
      b1
    }

    // deterministic output order: count desc, item asc
    override def finish(r: SSBuf): Buf = {
      val s = topEntries(r.m)
      Buf(s.map(_._1), s.map(_._2))
    }

    private def topEntries(m: java.util.HashMap[String, Long]): Seq[(String, Long)] = {
      val arr = new Array[(String, Long)](m.size)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
      arr.sortBy { case (k, v) => (-v, k) }.take(capacity).toSeq
    }

    override def bufferEncoder: Encoder[SSBuf] = Encoders.kryo[SSBuf]
    override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
  }

  /** Column aggregate: the sketch as a struct of parallel arrays
    * (items, counts), ordered by (count desc, item asc). */
  def freqItems(capacity: Int)(item: Column): Column =
    udaf(new SpaceSaving(capacity), Encoders.STRING).apply(item)
}
