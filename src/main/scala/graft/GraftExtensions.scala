package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatCosine, SortedLongJaccard}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions (so `spark.sql("SELECT float_cosine(a, b)")`
  * works next to the Column API), the [[graft.plans.PairwiseRewrite]]
  * optimizer rule, and the [[graft.plans.SelfPairwiseStrategy]] planner
  * strategy that executes its rewrites.
  *
  * Wire-up (either):
  *   SparkSession.builder().withExtensions(new GraftExtensions), or
  *   --conf spark.sql.extensions=graft.GraftExtensions
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.PairwiseRewrite)
    ext.injectPlannerStrategy(_ => new graft.plans.SelfPairwiseStrategy)
    ext.injectFunction((
      new FunctionIdentifier("float_cosine"),
      new ExpressionInfo(classOf[FloatCosine].getName, "float_cosine"),
      (args: Seq[Expression]) => FloatCosine(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("sorted_jaccard"),
      new ExpressionInfo(classOf[SortedLongJaccard].getName, "sorted_jaccard"),
      (args: Seq[Expression]) => SortedLongJaccard(args(0), args(1))))
  }
}
