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

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left); val rf = isFloat(right)
    val n = math.min(x.numElements(), y.numElements())
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
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final double $xi = $getX;
        |  final double $yi = $getY;
        |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        |}
        |final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |if ($den == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dot / $den; }
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
