package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator MinHash signature as one native expression: lowercase ->
  * whitespace tokens -> word 3-gram shingles -> md5-derived 32-bit hash ->
  * k permutation minima.
  *
  * Bit-identical to the composed HOF form
  * `TextFunctions.minhashSignature(shingleHashes(text), k)` (asserted in
  * MinHashSigSpec and by the unchanged d2/d3 DuckDB oracle rows). The HOF
  * pipeline is evaluated by the interpreter element by element (~4k boxed
  * expression evals per document); this runs the whole inner loop as
  * compiled Scala, one eval per row — the interior is tight JVM code, so
  * CodegenFallback's per-row boxing is irrelevant.
  *
  * Empty/short docs (< 3 tokens) produce the neutral signature (all slots
  * = 2^31-1), matching the HOF fold's init value.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      MinHashSig.signature(input.asInstanceOf[UTF8String].toString, k))

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val P = 2147483647L

  def signature(text: String, k: Int): Array[Long] = {
    val sig = Array.fill(k)(P)
    // lowercase through UTF8String — the EXACT implementation Spark's
    // lower() uses — not String.toLowerCase(Locale.ROOT): for non-ASCII
    // text Spark's slow path lowercases in the JVM DEFAULT locale, so a
    // Locale.ROOT copy here would break native==HOF bit-identity on
    // e.g. a Turkish-locale JVM (dotted/dotless i)
    val words = UTF8String.fromString(text).toLowerCase.toString.split(" ", -1)
    var i = 0
    while (i + 2 < words.length) {
      val shingle = new java.lang.StringBuilder(words(i))
        .append(' ').append(words(i + 1)).append(' ').append(words(i + 2))
      val h = Md5Hash32.hash(UTF8String.fromString(shingle.toString))
      var j = 0
      while (j < k) {
        val v = (h * (j * 2 + 3) + (j * 7919 + 1)) % P
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }
}
