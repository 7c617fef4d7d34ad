package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense dot product over two array<double> columns as one native
  * expression.
  *
  * Bit-identical to the HOF composition
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)` — the
  * same left-to-right summation order — but the inner loop is compiled
  * Scala instead of ~2*dim interpreted lambda evals per pair. Bucketed
  * similarity joins evaluate this millions of times per task, so the
  * interpreter overhead, not the arithmetic, was the cost
  * (DotProductSpec asserts the equivalence).
  *
  * Mismatched lengths yield null (the HOF form yields null there too,
  * via zip_with's null padding).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // null is produced for mismatched lengths and null elements even when
  // both children are non-nullable — without this override the optimizer
  // would constant-fold IsNotNull(dot(...)) to true and elide null guards
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        // a null ELEMENT nulls the whole product — the HOF form's
        // semantics (null propagates through x*y and acc+x); getDouble
        // on a null slot would silently read 0.0 and fabricate a value
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        s += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      s
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
