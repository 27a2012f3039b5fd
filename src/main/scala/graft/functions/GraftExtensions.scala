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
    // the SAME builder list register(spark) installs as temp functions
    // — one source, so a function added there is automatically injected
    // here too (the hand-copied lambdas this replaces had already
    // drifted: bloom_agg/might_contain were missing from this path)
    CustomExprs.builders.foreach { case (name, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(CustomExprs.getClass.getName, name),
        builder))
    }
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
