package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Cast, ExpressionInfo}
import org.apache.spark.sql.types.StringType
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine extensions, registered via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`:
  *
  *  - SQL functions `rolling_hash64(str)`, `dot_d(arr, arr)` and
  *    `dist_sq_l(arr, arr)` backed by the codegen'd native Expressions
  *    (usable from pure SQL, not just the Scala API)
  *  - optimizer rule collapsing nested `array_distinct(array_distinct(x))`
  *    — a shape our merge/dedup pipelines can produce when composed,
  *    and one Catalyst does not simplify on its own.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("rolling_hash64"),
      new ExpressionInfo(classOf[RollingHash64].getName, "rolling_hash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash64(Cast(children.head, StringType))))
    e.injectFunction((
      FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProductD(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier("dist_sq_l"),
      new ExpressionInfo(classOf[DistSqL].getName, "dist_sq_l"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DistSqL(children(0), children(1))))
    e.injectOptimizerRule(_ => CollapseArrayDistinct)
  }
}

/** array_distinct is idempotent: array_distinct(array_distinct(x)) ≡
  * array_distinct(x). Collapsing saves a full O(n) pass + allocation
  * per row on composed dedup pipelines. */
object CollapseArrayDistinct extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayDistinct(ArrayDistinct(child)) => ArrayDistinct(child)
    }
}
