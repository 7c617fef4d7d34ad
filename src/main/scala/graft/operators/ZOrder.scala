package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys — multi-column data-skipping layout.
  *
  * Sort-on-write clusters a file on ONE column (DataSkippingSpec); at
  * 100 TB the dominant scan predicates usually touch two or three columns
  * (tenant + time, user + score …). Interleaving the columns' bits into
  * one sort key gives every participating column partial clustering, so
  * parquet row-group min/max stats prune on ANY of them — the layout
  * technique behind Delta/Iceberg `ZORDER BY`, expressed here as a plain
  * column expression: write with
  * `df.repartitionByRange(zkey).sortWithinPartitions(zkey)` (or
  * `orderBy(zkey)` for a single file) and drop the key.
  *
  * Built entirely from codegen'd bit builtins (shiftright / bitwiseAND /
  * shiftleft / sum) — a static `2*bits`-term expression, no UDF, and the
  * identical arithmetic runs in any ANSI engine (the o10 oracle row
  * recomputes it in DuckDB).
  */
object ZOrder {

  /** Morton key interleaving the low `bits` bits of `a` (even positions)
    * and `b` (odd positions). Inputs are treated as two's-complement
    * longs, so the key is deterministic for any input; for meaningful
    * LOCALITY the inputs should be non-negative and fit in `bits` bits —
    * bucket or offset them first if they don't.
    */
  def zkey(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ + _)
  }

  /** The DuckDB/ANSI text form of [[zkey]] — kept next to the expression
    * so the oracle can never drift from the implementation.
    */
  def zkeySql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
}
