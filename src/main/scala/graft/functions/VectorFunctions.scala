package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level dense-vector math over `array<double>` embedding columns.
  * Pure higher-order-function expressions (codegen-friendly, no UDFs), so
  * the same arithmetic is reproducible in the DuckDB oracle.
  */
object VectorFunctions {

  /** Native compiled dot product (graft.expressions.DotProduct) —
    * bit-identical to the HOF form `aggregate(zip_with(a,b,*), 0d, +)`
    * without its per-element interpreter overhead.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftBridge.expression(a),
        org.apache.spark.sql.GraftBridge.expression(b)))

  /** Reference HOF form of `dot`, kept as the semantics baseline the
    * native expression is tested against.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Sign-bucket LSH key: one bit per probed dimension (1 when the
    * component is positive). Coordinate hyperplanes rather than random
    * ones, so any engine can reproduce the bucketing; at scale the probed
    * dims and bit count grow with the collection size.
    */
  def signBucket(a: Column, dims: Seq[Int]): Column = {
    require(dims.nonEmpty, "signBucket needs at least one probed dimension")
    // try_element_at: a vector shorter than the probed dimension (or a
    // null component) contributes bit 0 instead of throwing under ANSI
    // mode — matching the oracle engine, where an out-of-range list index
    // is NULL and NULL > 0 is not true
    dims.zipWithIndex.map { case (d, i) =>
      when(try_element_at(a, lit(d + 1)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
