package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {

  test("zkey matches a driver-side Morton reference") {
    val s = spark
    import s.implicits._
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (5L, 3L), (255L, 255L),
      (65535L, 1L), (12345L, 54321L))
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zkey(col("a"), col("b"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b, 16), s"zkey($a, $b)")
    }
  }

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case sc: FileSourceScanExec => sc
    }
    assert(scans.nonEmpty, "no file scan in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes row groups on the SECOND filter column; " +
      "a single-column sort does not") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey").cast("long").as("sk"),
        col("l_partkey").cast("long").as("pk"))
    val dir = Scratch.dir(spark, "zordertest")
    // small row groups so the single output file holds many
    base.orderBy(ZOrder.zkey(col("sk"), col("pk"), 16)).coalesce(1)
      .write.mode("overwrite").option("parquet.block.size", "16384")
      .parquet(s"$dir/zorder")
    base.orderBy("sk").coalesce(1) // clustered on sk ONLY
      .write.mode("overwrite").option("parquet.block.size", "16384")
      .parquet(s"$dir/single")

    // predicate on pk alone: the column the single-sort layout ignores
    def filtered(sub: String) = spark.read.parquet(s"$dir/$sub")
      .filter(col("pk") < 25)

    val a = filtered("zorder").count()
    val b = filtered("single").count()
    assert(a == b && a > 0, s"layouts disagree: $a vs $b")

    val zRows = scanOutputRows(filtered("zorder"))
    val sRows = scanOutputRows(filtered("single"))
    // sk-sorted layout scatters pk across every row group -> reads ~all;
    // the z-ordered layout keeps pk partially clustered -> groups skip
    assert(zRows * 2 <= sRows,
      s"no multi-column skipping: zorder scan $zRows vs single-sort $sRows")
  }
}
