package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global ordered computations — row_number and running totals
  * over the whole frame WITHOUT the single-partition sort that
  * `row_number().over(Window.orderBy(...))` plans (Spark coalesces an
  * unpartitioned window to 1 partition: fine for dimension tables, a
  * stall at vocabulary/corpus scale).
  *
  * Two-phase shape (the classic sort + partition-offset pattern):
  *  1. range-repartition by the sort key — every partition holds a
  *     contiguous, disjoint key range, partitions sort relative to each
  *     other by id;
  *  2. count rows per partition and prefix-sum the counts into offsets —
  *     a table of at most `numShufflePartitions` rows, so ITS window is
  *     single-partition over tiny data by construction;
  *  3. broadcast-join the offsets back and add the per-partition local
  *     row_number (partitioned window — distributes).
  *
  * Cost at any scale: one range shuffle of the data + one hash shuffle for
  * the per-partition window, both over balanced partitions. Determinism:
  * `order` must be a total order (tie-break on a unique column) — then the
  * result is identical to the naive global window (GlobalRankSpec asserts
  * equality) regardless of where the range partitioner cuts, because equal
  * keys cannot exist.
  */
object GlobalRank {

  /** `df` plus `out` = the 1-based global row number under `order`. */
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame =
    twoPhase(df, order, count(lit(1)).as("_gr_n"),
      (pid, off) => (row_number().over(Window.partitionBy(pid).orderBy(order: _*))
        + off).cast("long"), out)

  /** `df` plus `out` = the INCLUSIVE global running total of `valueCol`
    * under `order` — the scalable prefix sum (same two-phase shape as
    * `withRowNumber`: per-partition running sum + broadcast offsets of the
    * preceding partitions' totals). The packing/chunking primitive: a
    * corpus-wide token offset assigns every document its position in the
    * concatenated training stream without ever sorting into one partition.
    */
  def withRunningTotal(df: DataFrame, order: Seq[Column], valueCol: String,
      out: String): DataFrame = {
    // the offsets and the output are long-typed; a fractional valueCol
    // would be silently floor-truncated and diverge from the naive window
    val vt = df.schema(valueCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
      s"withRunningTotal needs an integral value column, got $valueCol: ${vt.typeName}")
    twoPhase(df, order, sum(col(valueCol)).as("_gr_n"),
      (pid, off) => (sum(col(valueCol)).over(
        Window.partitionBy(pid).orderBy(order: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + off).cast("long"), out)
  }

  /** Rank AND running total under the same `order` in ONE two-phase pass —
    * `withRowNumber` followed by `withRunningTotal` would range-shuffle the
    * frame twice for the identical ordering (t15's shape: a vocabulary
    * needs its frequency rank and the cumulative share up to it). The
    * offsets table just carries both prefixes.
    */
  def withRankAndRunningTotal(df: DataFrame, order: Seq[Column],
      valueCol: String, rankOut: String, totalOut: String): DataFrame =
    withRankAndRunningTotals(df, order, Seq(valueCol), rankOut, Seq(totalOut))

  /** The n-column generalization: rank plus one INCLUSIVE global running
    * total PER value column, all under the same `order`, still in ONE
    * range shuffle (t24's shape: a corpus growth curve needs cumulative
    * tokens AND cumulative vocabulary at every checkpoint — running the
    * two-phase machinery once per column would range-shuffle the frame
    * once per measure for the identical ordering). The offsets table just
    * carries one prefix per measure.
    */
  def withRankAndRunningTotals(df: DataFrame, order: Seq[Column],
      valueCols: Seq[String], rankOut: String,
      totalOuts: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty && valueCols.length == totalOuts.length,
      "one output name per value column")
    valueCols.foreach { valueCol =>
      val vt = df.schema(valueCol).dataType
      require(Seq("byte", "short", "integer", "long").contains(vt.typeName),
        s"withRankAndRunningTotals needs integral value columns, got $valueCol: ${vt.typeName}")
    }
    val pid = "_gr_pid"
    val roff = "_gr_roff"
    val voffs = valueCols.indices.map(i => s"_gr_voff$i")
    require((Seq(pid, roff) ++ voffs).forall(c => !df.columns.contains(c)),
      s"input must not carry reserved columns $pid/$roff/${voffs.mkString("/")}")
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
    val perPart = valueCols.zipWithIndex.map { case (c, i) =>
      sum(col(c)).as(s"_gr_v$i") }
    val offsets0 = ranged.groupBy(col(pid))
      .agg(count(lit(1)).as("_gr_n"), perPart: _*)
      .withColumn(roff,
        (sum(col("_gr_n")).over(TinyWindow.total(col(pid))(col(pid))) - col("_gr_n")).cast("long"))
    val offsets = valueCols.indices.foldLeft(offsets0) { (acc, i) =>
      acc.withColumn(voffs(i),
        (sum(col(s"_gr_v$i")).over(TinyWindow.total(col(pid))(col(pid)))
          - col(s"_gr_v$i")).cast("long"))
    }.select(col(pid) +: col(roff) +: voffs.map(col): _*)
    val local = Window.partitionBy(col(pid)).orderBy(order: _*)
    val withRank = ranged.join(broadcast(offsets), Seq(pid))
      .withColumn(rankOut, (row_number().over(local) + col(roff)).cast("long"))
    valueCols.indices.foldLeft(withRank) { (acc, i) =>
      acc.withColumn(totalOuts(i), (sum(col(valueCols(i))).over(
        local.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + col(voffs(i))).cast("long"))
    }.drop((pid +: roff +: voffs): _*)
  }

  /** Range-repartition by `order`, aggregate `perPartition` per partition,
    * prefix-sum those into per-partition offsets (a ≤numShufflePartitions
    * row table — the one place a global window is safe), broadcast them
    * back, and let `local` combine the partitioned window with the offset.
    */
  private def twoPhase(df: DataFrame, order: Seq[Column],
      perPartition: Column, local: (Column, Column) => Column,
      out: String): DataFrame = {
    val pid = "_gr_pid"
    val off = "_gr_off"
    require(!df.columns.contains(pid) && !df.columns.contains(off),
      s"input must not carry reserved columns $pid/$off")
    val ranged = df.repartitionByRange(order: _*).withColumn(pid, spark_partition_id())
    val offsets = ranged.groupBy(col(pid)).agg(perPartition)
      .withColumn(off,
        (sum(col("_gr_n")).over(TinyWindow.total(col(pid))(col(pid))) - col("_gr_n")).cast("long"))
      .select(col(pid), col(off))
    ranged.join(broadcast(offsets), Seq(pid))
      .withColumn(out, local(col(pid), col(off)))
      .drop(pid, off)
  }
}
