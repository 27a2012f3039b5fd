package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** SparkSessionExtensions wiring (the (c)-tier mechanism of the custom-
  * operator toolkit): installs the custom expressions as session
  * functions and injects an optimizer rule.
  *
  * Usage:
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)       // or
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("token_sort_ratio"),
      new ExpressionInfo(classOf[CustomExprs.TokenSortRatio].getName,
        "token_sort_ratio"),
      (es: Seq[Expression]) => CustomExprs.TokenSortRatio(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("fnv1a64"),
      new ExpressionInfo(classOf[CustomExprs.Fnv1a64].getName, "fnv1a64"),
      (es: Seq[Expression]) => CustomExprs.Fnv1a64(es.head)))
    e.injectFunction((
      FunctionIdentifier("array_combinations2"),
      new ExpressionInfo(classOf[CustomExprs.ArrayCombinations2].getName,
        "array_combinations2"),
      (es: Seq[Expression]) => CustomExprs.ArrayCombinations2(es.head)))
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[CustomExprs.VectorDot].getName, "vector_dot"),
      (es: Seq[Expression]) => CustomExprs.VectorDot(es.head, es(1))))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[CustomExprs.SimHash64].getName, "simhash64"),
      (es: Seq[Expression]) => CustomExprs.SimHash64(es.head)))
    e.injectFunction((
      FunctionIdentifier("byte_sum"),
      new ExpressionInfo(classOf[CustomExprs.ByteSum].getName, "byte_sum"),
      (es: Seq[Expression]) => CustomExprs.ByteSum(es.head)))
    e.injectOptimizerRule(_ => FoldSelfTokenSortRatio)
  }
}

/** Optimizer rule: token_sort_ratio(x, x) ≡ 100.0 for any non-null x —
  * fold the (potentially expensive) scorer away when both sides are the
  * same expression. Demonstrates a Rule[LogicalPlan] doing domain-
  * specific algebraic simplification the generic optimizer can't know. */
object FoldSelfTokenSortRatio extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CustomExprs.TokenSortRatio(a, b)
          if a.semanticEquals(b) && a.deterministic =>
        if (a.nullable)
          If(IsNull(a), Literal(null, DoubleType), Literal(100.0, DoubleType))
        else Literal(100.0, DoubleType)
    }
}
