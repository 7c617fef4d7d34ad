package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash of a document as one native expression: lowercase ->
  * whitespace tokens -> md5-derived 32-bit token hashes -> per-bit +/-1
  * vote sums -> sign bits packed MSB-first.
  *
  * Bit-identical to `TextFunctions.simhash32(tokens(text))` (asserted in
  * SimHash32ExprSpec and by the unchanged d4 DuckDB oracle row); same
  * evaluation-shape rationale as MinHashSig.
  */
case class SimHash32Expr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash32 requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    SimHash32Expr.simhash(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): SimHash32Expr =
    copy(child = newChild)
}

object SimHash32Expr {
  def simhash(text: String): Long = {
    val votes = new Array[Long](32)
    // UTF8String lowercasing, not Locale.ROOT — see MinHashSig.signature
    val words = UTF8String.fromString(text).toLowerCase.toString.split(" ", -1)
    var i = 0
    while (i < words.length) {
      val h = Md5Hash32.hash(UTF8String.fromString(words(i)))
      var b = 0
      while (b < 32) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var acc = 0L
    var b = 0
    while (b < 32) { acc = acc * 2 + (if (votes(b) > 0) 1L else 0L); b += 1 }
    acc
  }
}
