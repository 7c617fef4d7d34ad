package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

class GlobalRankSpec extends SparkSpec {

  test("global row_number equals the naive single-partition window") {
    val s = spark
    import s.implicits._
    // keys deliberately collide (ties) so the unique tie-break column does
    // real work across range-partition boundaries
    val df = (1 to 500).map(i => (i % 13, s"id_$i")).toDF("k", "id")
    val got = GlobalRank.withRowNumber(df, Seq(desc("k"), col("id")), "rn")
      .select(col("id"), col("rn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(desc("k"), col("id"))).cast("long"))
      .select(col("id"), col("rn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("data path is range-partitioned, never one global sort partition") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i, s"x$i")).toDF("k", "id")
    val p = GlobalRank.withRowNumber(df, Seq(col("k"), col("id")), "rn")
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"),
      "main data path lost its range repartition:\n" + p.take(1500))
  }

  test("global running total equals the naive single-partition window") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (s"id_$i", (i % 37 + 1).toLong)).toDF("id", "v")
    val got = GlobalRank.withRunningTotal(df, Seq(col("id")), "v", "cum")
      .select(col("id"), col("cum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = df.withColumn("cum",
        sum(col("v")).over(Window.orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select(col("id"), col("cum"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("multi-column rank+running-totals equal the naive windows") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i =>
        (i % 13, s"id_$i", (i % 37 + 1).toLong, (i % 7).toLong))
      .toDF("k", "id", "v", "u")
    val order = Seq(desc("k"), col("id"))
    val got = GlobalRank
      .withRankAndRunningTotals(df, order, Seq("v", "u"), "rn",
        Seq("cumv", "cumu"))
      .select(col("id"), col("rn"), col("cumv"), col("cumu"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val naive = Window.orderBy(order: _*)
    val cumw = naive.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("rn", row_number().over(naive).cast("long"))
      .withColumn("cumv", sum(col("v")).over(cumw).cast("long"))
      .withColumn("cumu", sum(col("u")).over(cumw).cast("long"))
      .select(col("id"), col("rn"), col("cumv"), col("cumu"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want)
  }

  test("combined rank+running-total equals the naive windows in one pass") {
    val s = spark
    import s.implicits._
    val df = (1 to 500).map(i => (i % 13, s"id_$i", (i % 37 + 1).toLong))
      .toDF("k", "id", "v")
    val order = Seq(desc("k"), col("id"))
    val got = GlobalRank
      .withRankAndRunningTotal(df, order, "v", "rn", "cum")
      .select(col("id"), col("rn"), col("cum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val naive = Window.orderBy(order: _*)
    val want = df
      .withColumn("rn", row_number().over(naive).cast("long"))
      .withColumn("cum", sum(col("v")).over(naive
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select(col("id"), col("rn"), col("cum"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // single-pass claim, on the post-collect final plan (AQE substitutes
    // ReusedExchange for the offsets path's copy of the shared subtree):
    // exactly one EXECUTED range exchange — the chained two-call form
    // would run a second, non-reusable one after the first join
    val df2 = GlobalRank.withRankAndRunningTotal(df, order, "v", "rn", "cum")
    df2.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count only
    // the executed Final Plan section above it
    val executedRangeExchanges = df2.queryExecution.executedPlan.toString
      .split("Initial Plan").head
      .linesIterator
      .count(l => l.contains("Exchange rangepartitioning")
        && !l.contains("ReusedExchange"))
    assert(executedRangeExchanges == 1,
      s"combined form must range-shuffle once, executed $executedRangeExchanges")
  }

  test("reserved helper names are rejected, not silently overwritten") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "a")).toDF("_gr_pid", "id")
    intercept[IllegalArgumentException] {
      GlobalRank.withRowNumber(df, Seq(col("id")), "rn")
    }
  }
}
