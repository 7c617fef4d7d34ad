package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the LATEST right row of the same key
  * with right.ts <= left.ts. Spark has no built-in operator for this; the
  * naive phrasing (`l.ts >= r.ts` range join + per-left max) explodes to a
  * partial cross product per key.
  *
  * Composition (preference (a) of the custom-operator ladder — existing
  * ops express the semantics): tag both sides, union, then one running
  * `last(_, ignoreNulls)` window per key ordered by (ts, side) — right
  * rows sort BEFORE left rows at equal ts, so an exactly-simultaneous
  * right row is visible (the <= bound). Cost at any scale: ONE shuffle of
  * |L|+|R| rows keyed on the join key + a per-partition sort — the same
  * plan shape as a regular sort-merge join, never a key-local cross
  * product. Matches engine-native ASOF JOIN semantics (the DuckDB oracle
  * for j8_asof_join runs a literal ASOF JOIN).
  */
object AsOfJoin {

  /** Inner as-of join. `left`/`right` must both carry `key` and `ts`;
    * `rightCols` are the right-side payload columns to attach, emitted as
    * `asof_<name>`. Left rows with no matching right row are dropped
    * (inner semantics).
    */
  def asOfInner(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame =
    asOfInnerImpl(left, right, key, ts, rightCols, maxGapSeconds = None)

  /** As-of join with a tolerance: the latest right row at or before the
    * left row's time AND within `maxGapSeconds` of it (pandas merge_asof
    * `tolerance`, inclusive). A match farther back than the gap is
    * discarded — correct, because no closer one can exist (the window
    * already picked the latest). `ts` must be a timestamp column.
    */
  def asOfInnerWithin(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightCols: Seq[String], maxGapSeconds: Double): DataFrame =
    asOfInnerImpl(left, right, key, ts, rightCols, Some(maxGapSeconds))

  private def asOfInnerImpl(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightCols: Seq[String],
      maxGapSeconds: Option[Double]): DataFrame = {
    // the matched right ts is smuggled through the struct as "_rts"; a
    // payload column with either name would make the struct carry duplicate
    // fields and col("_rf._rts") ambiguous — corrupting the tolerance check
    require(!rightCols.contains(ts),
      s"rightCols must not include the ts column '$ts' (it is attached as _rts internally)")
    require(!rightCols.contains("_rts"), "rightCols must not include the reserved name _rts")
    val lType = org.apache.spark.sql.functions.struct(
      left.columns.map(col).toIndexedSeq: _*)
    // the matched right row's own ts rides along inside the struct so the
    // tolerance can be checked AFTER the window picked the latest match
    val rStruct = struct(rightCols.map(col) :+ col(ts).as("_rts"): _*)
    val rType = right.select(rStruct.as("r")).schema("r").dataType

    val l2 = left.select(col(key), col(ts), lit(1).as("_side"),
      lType.as("_l"), lit(null).cast(rType).as("_r"))
    val lSchema = l2.schema("_l").dataType
    val r2 = right.select(col(key), col(ts), lit(0).as("_side"),
      lit(null).cast(lSchema).as("_l"), rStruct.as("_r"))

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val withinGap = maxGapSeconds match {
      case Some(g) =>
        unix_micros(col(ts)) - unix_micros(col("_rf._rts")) <= (g * 1e6).toLong
      case None => lit(true)
    }
    l2.union(r2)
      .withColumn("_rf", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1 && col("_rf").isNotNull && withinGap)
      .select(col("_l.*") +:
        rightCols.map(c => col(s"_rf.$c").as(s"asof_$c")): _*)
  }
}
