package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string/binary value, as a native codegen
  * expression — the primitive behind the compression-ratio quality signal
  * (t19): near-random text compresses poorly, boilerplate/templated/
  * repetitive text compresses extremely well, so `deflate_len / raw_len`
  * is a cheap, language-agnostic repetition gate (used alongside the
  * Gopher-style token-share signals of t12; see e.g. the RedPajama-v2 and
  * Dolma quality-signal sets, which both ship a per-document compression
  * ratio).
  *
  * Level is pinned to 6 (zlib default) and strategy to DEFAULT so the
  * output length is a pure function of the input bytes for a given zlib
  * build; the JDK bundles its own zlib, so one Spark cluster computes
  * identical lengths on every executor. Cross-ENGINE the length is not
  * portable (zlib version / heuristics), which is why t19 is rows-only
  * with the signal's LAWS spec'd (DeflateLenSpec) instead of hash-oracled.
  *
  * Scale: one Deflater call per row, reused via a ThreadLocal (Deflater
  * allocates native memory; per-row allocation would thrash). The
  * expression participates in whole-stage codegen (`doGenCode`), so the
  * scan -> deflate -> ratio pipeline is a single map-side pass with no
  * shuffle — exactly what a 100 TB quality-scoring sweep needs.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires a string or binary argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => DeflateLen.compressedLen(s.getBytes)
    case b: Array[Byte] => DeflateLen.compressedLen(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arg = if (child.dataType == BinaryType) (c: String) => c
      else (c: String) => s"$c.getBytes()"
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.DeflateLen.compressedLen(${arg(c)})")
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  // Deflater holds native zlib state; end() is never called on the
  // ThreadLocal instance (reset() between uses), matching the lifetime of
  // the executor thread — the JDK frees it on finalization.
  private val deflater: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION))

  /** Total DEFLATE output length for `bytes` at zlib default level. */
  def compressedLen(bytes: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
