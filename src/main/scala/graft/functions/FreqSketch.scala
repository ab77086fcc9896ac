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

/** Count-Min sketch (Cormode & Muthukrishnan '05) — mergeable
  * point-frequency estimates in O(depth × width) memory regardless of
  * item cardinality. Every partial holds the same depth×width counter
  * grid; `merge` is an element-wise sum (exactly associative and
  * commutative, so partials combine in any shuffle order), and the
  * estimate for an item is the MIN of its `depth` counters.
  * Overestimates only: est ∈ [true, true + ε·N] with ε = e/width at
  * probability 1 − e^(−depth); pinned in AggSpec against exact counts.
  *
  * The scale complement to [[FreqSketch.SpaceSaving]]: SpaceSaving
  * answers "which items are frequent", Count-Min answers "how frequent
  * is THIS item" for arbitrary probes without ever storing keys — the
  * grid is 4×256 longs here (8 KiB) whether the stream has 64 distinct
  * tokens or 10^9.
  */
object CountMin {
  val Depth = 4
  val Width = 256

  /** Mutable aggregation state — one flat depth×width counter grid. */
  final class CMBuf {
    val t = new Array[Long](Depth * Width)
  }

  class Sketch(probes: Seq[String]) extends Aggregator[String, CMBuf, FreqSketch.Buf] {

    override def zero: CMBuf = new CMBuf

    override def reduce(b: CMBuf, item: String): CMBuf = {
      var r = 0
      while (r < Depth) { b.t(r * Width + idx(item, r)) += 1L; r += 1 }
      b
    }

    override def merge(b1: CMBuf, b2: CMBuf): CMBuf = {
      var i = 0
      while (i < b1.t.length) { b1.t(i) += b2.t(i); i += 1 }
      b1
    }

    /** Point estimates for the probe items, ordered by item asc. */
    override def finish(r: CMBuf): FreqSketch.Buf = {
      val ps = probes.distinct.sorted
      FreqSketch.Buf(ps, ps.map { p =>
        var m = Long.MaxValue
        var row = 0
        while (row < Depth) {
          val v = r.t(row * Width + idx(p, row))
          if (v < m) m = v
          row += 1
        }
        m
      })
    }

    override def bufferEncoder: Encoder[CMBuf] = Encoders.kryo[CMBuf]
    override def outputEncoder: Encoder[FreqSketch.Buf] = Encoders.product[FreqSketch.Buf]
  }

  /** Pairwise-independent-enough row hashes: murmur3 under per-row seeds. */
  private def idx(item: String, row: Int): Int =
    (scala.util.hashing.MurmurHash3.stringHash(item, 0x9747b28c + row) & 0x7fffffff) % Width

  /** Column aggregate: (items, counts) estimates for `probes`, item asc. */
  def estimates(probes: Seq[String])(item: Column): Column =
    udaf(new Sketch(probes), Encoders.STRING).apply(item)
}
