package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{FloatCosine, MinHashes, SimHash, SortedLongJaccard}

/** ScalaCheck laws for the custom expressions (SURVEY §5.2 tier 3),
  * exercised through the interpreted `eval` path directly — no session,
  * thousands of samples per property. The codegen path is pinned equal to
  * this one by ArrayExprsSpec. */
object ExprProps extends Properties("graft.expressions") {

  private def floatArr(a: Seq[Float]): Literal =
    Literal.create(a, ArrayType(FloatType, containsNull = false))
  private def longArr(a: Seq[Long]): Literal =
    Literal.create(a, ArrayType(LongType, containsNull = false))

  private def cosine(a: Seq[Float], b: Seq[Float]): Option[Double] =
    Option(FloatCosine(floatArr(a), floatArr(b)).eval(null))
      .map(_.asInstanceOf[Double])

  private def jac(a: Seq[Long], b: Seq[Long]): Option[Double] =
    Option(SortedLongJaccard(longArr(a.distinct.sorted), longArr(b.distinct.sorted))
      .eval(null)).map(_.asInstanceOf[Double])

  private def minhash(a: Seq[Long], k: Int): Seq[Long] =
    MinHashes(longArr(a), k).eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  private val vec: Gen[Seq[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-100.0f, 100.0f)).map(_.toSeq)
  private val tokens: Gen[Seq[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)).map(_.toSeq)

  property("cosine is symmetric") = forAll(vec, vec) { (a, b) =>
    cosine(a, b) == cosine(b, a)
  }

  property("cosine is bounded in [-1, 1]") = forAll(vec, vec) { (a, b) =>
    cosine(a.take(b.length), b.take(a.length)).forall(v => v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
  }

  property("cosine of a vector with itself is ~1 (or NULL for zero)") =
    forAll(vec) { a =>
      cosine(a, a) match {
        case Some(v) => math.abs(v - 1.0) < 1e-9
        case None => a.forall(_ == 0.0f)
      }
    }

  property("jaccard is symmetric, bounded, and 1 on self") =
    forAll(tokens, tokens) { (a, b) =>
      val ab = jac(a, b)
      (ab == jac(b, a)) &&
        ab.forall(v => v >= 0.0 && v <= 1.0) &&
        (jac(a, a) == Some(1.0))
    }

  property("jaccard of disjoint sets is 0") =
    forAll(tokens, tokens) { (a, b) =>
      val odd = a.map(_ | 1L)
      val even = b.map(_ & ~1L)
      jac(odd, even) == Some(0.0)
    }

  property("minhash: equal sets give equal signatures; signature length = k") =
    forAll(tokens, Gen.chooseNum(1, 32)) { (a, k) =>
      val s1 = minhash(a, k)
      val s2 = minhash(scala.util.Random.shuffle(a), k)
      // order-insensitive (min over the set) and deterministic
      (s1.length == k) && (s1 == s2)
    }

  property("minhash agreement approximates jaccard within gross bounds") =
    forAll(tokens) { a =>
      val b = a // identical sets -> all hash slots agree
      minhash(a, 16) == minhash(b, 16)
    }

  property("simhash is deterministic and fits its bit width") =
    forAll(tokens, Gen.oneOf(16, 32, 48)) { (a, bits) =>
      val s = SimHash(longArr(a), bits).eval(null).asInstanceOf[Long]
      val s2 = SimHash(longArr(a), bits).eval(null).asInstanceOf[Long]
      (s == s2) && (bits == 64 || (s >>> bits) == 0L)
    }

  // ---- MinK laws (r16 — the agg_kmv_jaccard map-side partial) --------
  // Exercised at the Aggregator level directly: reduce over arbitrary
  // chunkings, merge in BOTH association orders, against the spec
  // "sorted distinct take K". This is exactly the freedom Spark has at
  // runtime (partitioning and partial-merge order are not deterministic),
  // so the law IS the cross-run determinism of the KMV sketch.

  private val hexStr: Gen[String] =
    Gen.choose(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("0123456789abcdef".toSeq)).map(_.mkString))

  property("MinK = sorted distinct take K under any chunking and either " +
      "merge association order") =
    forAll(Gen.nonEmptyListOf(hexStr), Gen.chooseNum(1, 12),
      Gen.chooseNum(1, 5)) { (xs, k, chunk) =>
      val agg = new graft.functions.MinK.MinKAgg(k)
      val bufs = xs.grouped(chunk).toList
        .map(c => c.foldLeft(agg.zero)(agg.reduce))
      val l = bufs.foldLeft(agg.zero)(agg.merge).hs.toSeq
      val r = bufs.foldRight(agg.zero)((b, acc) => agg.merge(acc, b)).hs.toSeq
      val want = xs.distinct.sorted.take(k)
      l == want && r == want
    }

  property("MinK buffer is always sorted, duplicate-free, and <= K") =
    forAll(Gen.nonEmptyListOf(hexStr), Gen.chooseNum(1, 12)) { (xs, k) =>
      val agg = new graft.functions.MinK.MinKAgg(k)
      val states = xs.scanLeft(agg.zero)(agg.reduce).map(_.hs.toSeq)
      states.forall(s =>
        s.length <= k && s == s.sorted && s.distinct == s)
    }
}
