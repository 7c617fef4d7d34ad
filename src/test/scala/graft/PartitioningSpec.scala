package graft

import org.apache.spark.sql.functions._

/** O7: repartition-by-key write — the reference computed the repartition
  * and discarded it (sample_indexer.py:50); here the layout is asserted:
  * the requested file count exists and no key is split across files.
  */
class PartitioningSpec extends SparkSpec {

  test("repartition(8, user_id) write produces 8 files, keys never split") {
    val out = "/root/repo/target/test-tmp/o7_layout"
    Tables.events(spark, sfDir).repartition(8, col("user_id"))
      .write.mode("overwrite").parquet(out)

    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    // empty hash buckets write no file, so <= 8; fan-out must still happen
    assert(files.length <= 8 && files.length >= 2,
      s"expected 2..8 part files, got ${files.length}")

    val filesPerKey = spark.read.parquet(out)
      .select(col("user_id"), input_file_name().as("f"))
      .groupBy("user_id").agg(countDistinct("f").as("nf"))
      .filter(col("nf") > 1).count()
    assert(filesPerKey == 0, "a user_id was split across part files")
  }
}
