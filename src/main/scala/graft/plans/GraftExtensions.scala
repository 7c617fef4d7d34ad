package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType
import graft.expressions.Md5Hash32

/** Optimizer rule: collapse the composed 32-bit-md5 idiom
  * `cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)` into the native
  * `Md5Hash32` expression — so SQL-text users (the P9 `expr()` entry point)
  * and hand-written column code get the digest->long fast path without
  * knowing it exists. Semantics are bit-identical (Md5Hash32Spec); the
  * rewrite is a pure strength reduction.
  */
object RewriteMd5Hash32 extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(_ => true) {
      case Cast(
            Conv(Substring(Md5(inner), Literal(1, _), Literal(8, _)),
              Literal(16, _), Literal(10, _), _),
            LongType, _, _) =>
        Md5Hash32(inner)
    }
}

/** Session extension entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteMd5Hash32)
}
