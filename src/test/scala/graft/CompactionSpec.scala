package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

class CompactionSpec extends SparkSpec {

  test("compaction collapses a many-small-files directory to the target " +
      "count, preserves rows, and restores sort locality") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"),
        col("l_extendedprice"))
    val src = Scratch.dir(spark, "compact_src")
    val dest = Scratch.dir(spark, "compact_dest")
    // simulate a streaming sink's droppings: 40 tiny files, ranges interleaved
    base.repartition(40).write.mode("overwrite").parquet(src)
    val before = Compaction.dataFiles(spark, src)
    assert(before >= 30, s"fixture did not fan out: $before files")

    val bytes = Compaction.dataBytes(spark, src)
    val written = Compaction.compactParquet(spark, src, dest,
      targetFileBytes = bytes / 2 + 1, sortCols = Seq(col("sd")))
    assert(written <= 2, s"expected <=2 compacted files, got $written")

    // lossless
    val a = spark.read.parquet(src).count()
    val b = spark.read.parquet(dest).count()
    assert(a == b && b > 0)

    // the re-sort restored per-file date locality: each output file's
    // min/max date range is a fraction of the full span (the repartition(40)
    // source interleaves the whole span into every file)
    val perFile = spark.read.parquet(dest)
      .groupBy(input_file_name())
      .agg(datediff(max("sd"), min("sd")).as("span"))
      .agg(max("span")).head().getInt(0)
    val fullSpan = spark.read.parquet(dest)
      .agg(datediff(max("sd"), min("sd"))).head().getInt(0)
    assert(perFile < fullSpan,
      s"compacted files not range-clustered: file span $perFile vs total $fullSpan")
  }
}
