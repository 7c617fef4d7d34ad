package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
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
      // This rule runs post-analysis, so md5's argument is already wrapped
      // in Cast(_, binary) (md5 takes binary). Strip that cast when it sits
      // on a string — Md5Hash32 hashes the same utf8 bytes the cast would
      // produce — and keep raw-binary children as-is (Md5Hash32 accepts
      // both). Matching `Md5(inner)` without looking through the cast would
      // be wrong twice over: the rewrite must only fire on the genuine
      // composed idiom, and its output must stay type-correct without the
      // analyzer re-checking it.
      case Cast(
            Conv(Substring(Md5(b), Literal(1, _), Literal(8, _)),
              Literal(16, _), Literal(10, _), _),
            LongType, _, _) if b.dataType == BinaryType =>
        b match {
          case Cast(inner, BinaryType, _, _) if inner.dataType == StringType =>
            Md5Hash32(inner)
          case _ => Md5Hash32(b)
        }
    }
}

/** Session extension entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteMd5Hash32)
    // off until spark.graft.rangeJoin.bucketWidth is set to a positive width
    ext.injectOptimizerRule(session => new RangeJoinRule(session))
  }
}
