package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Layout-level data skipping: the same range predicate over the same rows
  * reads far less when the file is WRITTEN sorted on the filter column,
  * because parquet row-group min/max stats let the pushed filter skip
  * whole groups. This is the write-side half of the pushdown story PlanSpec
  * pins — at 100 TB, sort-on-write (or Z-order) on the dominant filter
  * column is a first-class layout decision, and this spec makes its effect
  * measurable instead of asserted.
  */
class DataSkippingSpec extends SparkSpec {

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sorted-on-write layout prunes row groups; unsorted reads everything") {
    // DATE, not the source timestamp_ntz: Spark pushes ntz filters to the
    // scan but (as of 4.1) does not row-group-prune on ntz min/max stats,
    // which would make this spec measure nothing
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("l_shipdate"),
        col("l_extendedprice"))
    val total = base.count()
    val dir = Scratch.dir(spark, "skiptest")
    // small row groups so one file holds many (default 128 MB = 1 group here)
    base.orderBy("l_shipdate").coalesce(1)
      .write.mode("overwrite").option("parquet.block.size", "16384")
      .parquet(s"$dir/sorted")
    base.orderBy("l_orderkey").coalesce(1) // clustered on the WRONG column
      .write.mode("overwrite").option("parquet.block.size", "16384")
      .parquet(s"$dir/unsorted")

    def filtered(sub: String) = spark.read.parquet(s"$dir/$sub")
      .filter(col("l_shipdate").between("1996-01-01", "1996-02-01"))

    // same answer from both layouts...
    val a = filtered("sorted").count()
    val b = filtered("unsorted").count()
    assert(a == b && a > 0, s"layouts disagree: $a vs $b")

    // ...but the sorted layout's scan emits far fewer rows: row groups
    // outside the date range are skipped on min/max stats. (Scan output
    // rows = rows surviving row-group pruning, before the row filter.)
    val sortedRows = scanOutputRows(filtered("sorted"))
    val unsortedRows = scanOutputRows(filtered("unsorted"))
    assert(sortedRows < unsortedRows / 2,
      s"no skipping observed: sorted scan $sortedRows vs unsorted $unsortedRows (total $total)")
  }
}
