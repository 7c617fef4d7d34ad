package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit md5-derived hash as a native Catalyst expression.
  *
  * Semantically identical to `conv(substring(md5(s), 1, 8), 16, 10)` — the
  * first four digest bytes read big-endian as an unsigned int — which is
  * what the DuckDB oracle computes as `('0x' || substr(md5(s),1,8))::BIGINT`.
  * The composed built-in form materializes a 32-char hex string and parses
  * it back per call; this expression goes digest -> long directly, with
  * codegen (`doGenCode`), so it stays inside whole-stage codegen in plain
  * projections and skips the string round trip inside (interpreted) HOF
  * lambdas — the minhash/simhash hot path hashes millions of shingles.
  */
case class Md5Hash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash32"

  // Binary is accepted alongside string because the OPTIMIZER rewrite
  // (RewriteMd5Hash32) runs post-analysis: the analyzer has already wrapped
  // md5's argument in Cast(_, binary), and a rewrite target that only takes
  // strings would blow up at eval time instead of being re-type-checked.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType || child.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash32 requires a string or binary argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => Md5Hash32.hash(s)
    case b: Array[Byte] => Md5Hash32.hashBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = if (child.dataType == BinaryType) "hashBytes" else "hash"
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Hash32.$method($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash32 =
    copy(child = newChild)
}

object Md5Hash32 {
  private val digest: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 digest bytes, big-endian, as an unsigned 32-bit value. */
  def hash(s: UTF8String): Long = hashBytes(s.getBytes)

  def hashBytes(b: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(b)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
