package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row_number — a dense total rank over the whole frame
  * WITHOUT the single-partition sort that `row_number().over(Window.orderBy
  * (...))` plans (Spark coalesces an unpartitioned window to 1 partition:
  * fine for dimension tables, a stall at vocabulary/corpus scale).
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
  def withRowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val pid = "_gr_pid"
    val off = "_gr_off"
    require(!df.columns.contains(pid) && !df.columns.contains(off),
      s"input must not carry reserved columns $pid/$off")
    val ranged = df.repartitionByRange(order: _*).withColumn(pid, spark_partition_id())
    // offsets: #partitions rows max — the one place a global window is safe
    val offsets = ranged.groupBy(col(pid)).agg(count(lit(1)).as("_gr_n"))
      .withColumn(off,
        (sum(col("_gr_n")).over(Window.orderBy(col(pid))) - col("_gr_n")).cast("long"))
      .select(col(pid), col(off))
    ranged.join(broadcast(offsets), Seq(pid))
      .withColumn(out,
        (row_number().over(Window.partitionBy(col(pid)).orderBy(order: _*))
          + col(off)).cast("long"))
      .drop(pid, off)
  }
}
