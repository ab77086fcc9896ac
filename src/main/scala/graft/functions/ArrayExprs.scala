package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot pairwise paths (SURVEY §4.3).
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) and set
  * functions (`array_intersect`) evaluate their lambdas/hash-sets row by
  * row outside Java-loop codegen — fine for a projection over n rows,
  * ruinous inside an O(n²) pairwise join (measured ~150-185 s per query at
  * sf0.1). These expressions generate a single fused primitive loop per
  * pair and participate in whole-stage codegen, with an identical
  * interpreted `nullSafeEval` fallback.
  *
  * Both compute exactly the same arithmetic (same accumulation order) as
  * the HOF formulations in [[Vectors]], so results — and the DuckDB oracle
  * comparisons — are bit-identical. Parity is pinned in ArrayExprsSpec.
  */
object ArrayExprs {

  /** cosine(a, b) over ARRAY<FLOAT> in one fused pass; NULL when either
    * norm is zero (ANSI-safe — see ADVICE r1). */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(FloatCosine(
      Bridge.expression(a), Bridge.expression(b)))

  /** Jaccard |A∩B|/|A∪B| over two SORTED, DISTINCT ARRAY<BIGINT> token-hash
    * arrays via a merge pass; NULL when both are empty. */
  def sortedJaccard(a: Column, b: Column): Column =
    Bridge.column(SortedLongJaccard(
      Bridge.expression(a), Bridge.expression(b)))

  /** k MinHash values over an ARRAY<BIGINT> token-hash set: for seed i,
    * min over tokens of splitmix64(h ⊕ gamma·(i+1)). */
  def minHashes(tokenHashes: Column, k: Int): Column =
    Bridge.column(MinHashes(Bridge.expression(tokenHashes), k))

  /** SimHash signature (`bits` wide, in the low bits of a long) over an
    * ARRAY<BIGINT> token-hash set: per-bit majority vote. */
  def simHash(tokenHashes: Column, bits: Int): Column =
    Bridge.column(SimHash(Bridge.expression(tokenHashes), bits))

  /** Index (0-based) of the first position where the two ARRAY<BIGINT>
    * arguments are equal, or -1. Lets an LSH band join emit each candidate
    * pair exactly once (at its first matching band) instead of deduping
    * occurrence rows with a distinct shuffle. */
  def firstEqualIndex(a: Column, b: Column): Column =
    Bridge.column(FirstEqualIndex(Bridge.expression(a), Bridge.expression(b)))

  /** LSH band digests over an ARRAY<BIGINT> token-hash set, in ONE fused
    * loop: band b = splitmix64 fold of its `rowsPerBand` MinHash rows
    * (seeds b·rowsPerBand … b·rowsPerBand+rowsPerBand−1). Composing this
    * from `minHashes` + per-band `xxhash64(element_at(mh,…)…)` Columns
    * re-inlines the whole MinHash subtree into EVERY element_at (lambda
    * bodies see no common-subexpression elimination): at 32 bands × 16
    * rows that is 512 copies × 512 hashes per row — the plan never
    * finished at sf0.1. Here signature cost is bands·rows·|tokens| total. */
  def minHashBands(tokenHashes: Column, bands: Int, rowsPerBand: Int): Column =
    Bridge.column(MinHashBands(Bridge.expression(tokenHashes), bands, rowsPerBand))
}

/** Fused dot/norms cosine over two float/double arrays (each side may be
  * ARRAY<FLOAT> or ARRAY<DOUBLE> independently — e.g. raw embeddings vs
  * avg-derived centroids). Length = min of the two, mirroring `zip_with`'s
  * null-padding semantics on the shorter array — fixture arrays are
  * equal-length. */
case class FloatCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_cosine"

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Unequal lengths → NULL: cosine of different-dimension vectors is
  // undefined, and this matches the declarative HOF form exactly —
  // zip_with pads the shorter array with nulls, which null-propagates
  // through the dot product. (An earlier min-length truncation silently
  // DISAGREED with the HOF form and with per-row precomputed norms in
  // SelfPairwiseExec.)
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val den = ctx.freshName("den")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        |final int $n = $a.numElements();
        |if ($b.numElements() != $n) { ${ev.isNull} = true; } else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $xi = $getX;
        |    final double $yi = $getY;
        |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |  }
        |  final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |  if ($den == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $den; }
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatCosine =
    copy(left = newLeft, right = newRight)
}

/** Merge-based Jaccard over two sorted distinct long arrays. */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_jaccard"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { inter += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    val union = n + m - inter
    if (union == 0) null else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val inter = ctx.freshName("inter")
      val union = ctx.freshName("union")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        |final int $n = $a.numElements();
        |final int $m = $b.numElements();
        |int $i = 0, $j = 0, $inter = 0;
        |while ($i < $n && $j < $m) {
        |  final long $xv = $a.getLong($i);
        |  final long $yv = $b.getLong($j);
        |  if ($xv == $yv) { $inter++; $i++; $j++; }
        |  else if ($xv < $yv) { $i++; } else { $j++; }
        |}
        |final int $union = $n + $m - $inter;
        |if ($union == 0) { ${ev.isNull} = true; }
        |else { ${ev.value} = (double) $inter / (double) $union; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}

/** First index at which two long arrays agree, else -1 (fused loop). */
case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "first_equal_index"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two ARRAY<BIGINT> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |int $res = -1;
        |for (int $i = 0; $i < $n && $res < 0; $i++) {
        |  if ($a.getLong($i) == $b.getLong($i)) $res = $i;
        |}
        |${ev.value} = $res;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}

/** k MinHash values per row in one fused loop (k × |tokens| long mixes —
  * the `transform(sequence, array_min(transform(xxhash64)))` formulation
  * evaluates ~5 µs per interpreted lambda call and dominated `dedup_near`).
  * Mixing: splitmix64 finalizer over (tokenHash ⊕ seed·gamma) — an
  * independent-enough family for banding (impl-specific; no oracle). */
case class MinHashes(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "min_hashes"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) {
      var min = Long.MaxValue
      var i = 0
      while (i < n) {
        val m = MinHashes.mix(arr.getLong(i) ^ ((k + 1) * MinHashes.Gamma))
        if (m < min) min = m
        i += 1
      }
      out(k) = min
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val min = ctx.freshName("min"); val z = ctx.freshName("z")
      val cls = MinHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
        |final int $n = $a.numElements();
        |final long[] $out = new long[$numHashes];
        |for (int $k = 0; $k < $numHashes; $k++) {
        |  long $min = Long.MAX_VALUE;
        |  for (int $i = 0; $i < $n; $i++) {
        |    long $z = $cls.mix($a.getLong($i) ^ (($k + 1) * ${MinHashes.Gamma}L));
        |    if ($z < $min) $min = $z;
        |  }
        |  $out[$k] = $min;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)
}

object MinHashes {
  final val Gamma = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer. */
  def mix(v0: Long): Long = {
    var v = v0
    v ^= v >>> 30; v *= 0xBF58476D1CE4E5B9L
    v ^= v >>> 27; v *= 0x94D049BB133111EBL
    v ^ (v >>> 31)
  }
}

/** MinHash + LSH banding fused: band digest b = splitmix64 fold over the
  * band's `rowsPerBand` MinHash values, each MinHash computed inline (min
  * over tokens of splitmix64(tok ⊕ gamma·(seed+1)), same family as
  * [[MinHashes]]). One bands·rows·|tokens| loop nest per row — the
  * signature never materializes as an intermediate array column. */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "min_hash_bands"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = MinHashes.mix(b.toLong + 1L)
      var r = 0
      while (r < rowsPerBand) {
        val k = b * rowsPerBand + r
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val m = MinHashes.mix(arr.getLong(i) ^ ((k + 1) * MinHashes.Gamma))
          if (m < min) min = m
          i += 1
        }
        h = MinHashes.mix(h ^ min)
        r += 1
      }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val r = ctx.freshName("r")
      val b = ctx.freshName("b"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val min = ctx.freshName("min"); val z = ctx.freshName("z")
      val h = ctx.freshName("h")
      val cls = MinHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
        |final int $n = $a.numElements();
        |final long[] $out = new long[$bands];
        |for (int $b = 0; $b < $bands; $b++) {
        |  long $h = $cls.mix((long) $b + 1L);
        |  for (int $r = 0; $r < $rowsPerBand; $r++) {
        |    final int $k = $b * $rowsPerBand + $r;
        |    long $min = Long.MAX_VALUE;
        |    for (int $i = 0; $i < $n; $i++) {
        |      long $z = $cls.mix($a.getLong($i) ^ (($k + 1) * ${MinHashes.Gamma}L));
        |      if ($z < $min) $min = $z;
        |    }
        |    $h = $cls.mix($h ^ $min);
        |  }
        |  $out[$b] = $h;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** SimHash over a token-hash array: majority vote per bit, one fused loop. */
case class SimHash(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sim_hash"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires ARRAY<BIGINT>, got ${t.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var vote = 0
      var i = 0
      while (i < n) {
        if (((arr.getLong(i) >>> b) & 1L) == 1L) vote += 1 else vote -= 1
        i += 1
      }
      if (vote > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val vote = ctx.freshName("vote")
      s"""
        |final int $n = $a.numElements();
        |long $sig = 0L;
        |for (int $b = 0; $b < $bits; $b++) {
        |  int $vote = 0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ((($a.getLong($i) >>> $b) & 1L) == 1L) $vote++; else $vote--;
        |  }
        |  if ($vote > 0) $sig |= (1L << $b);
        |}
        |${ev.value} = $sig;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
