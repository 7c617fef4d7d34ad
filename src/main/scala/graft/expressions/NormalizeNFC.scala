package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the first cleaning
  * stage of a text-curation pipeline. The same logical character arrives
  * from different sources precomposed (é, U+00E9) or decomposed
  * (e + U+0301): without canonical normalization, exact dedup, MinHash
  * shingles, and token counting all treat the two spellings as different
  * documents. Spark has no built-in normalizer and a Scala UDF would break
  * the engine's no-UDF rule, so this wraps `java.text.Normalizer` (the
  * JDK's implementation of Unicode canonical composition — the same
  * algorithm behind the DuckDB oracle's `nfc_normalize`) in the same
  * CodegenFallback shape as Md5Hash32/MinHashSig.
  */
case class NormalizeNFC(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan, and real-world
    // corpora are overwhelmingly already-NFC — skip the rebuild for them
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeNFC =
    copy(child = newChild)
}
