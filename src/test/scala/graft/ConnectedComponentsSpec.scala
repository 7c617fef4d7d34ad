package graft

import graft.operators.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {

  test("chain, triangle, and isolated pair all collapse to min-id labels") {
    val s = spark
    import s.implicits._
    // {1,2,3,4} chain, {10,11,12} triangle, {20,21} pair
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)).toDF("a", "b")
    val out = ConnectedComponents.propagateMinLabel(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("maxIter bounds the rounds (partial labels when cut short)") {
    val s = spark
    import s.implicits._
    // a 4-chain needs 3 rounds to fully label; 1 round must NOT finish it
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val one = ConnectedComponents.propagateMinLabel(edges, "a", "b", maxIter = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one(2L) == 1L && one(4L) == 3L, one.toString)
  }

  test("checkpointDir path yields identical labels (and truncates lineage)") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("a", "b")
    val dir = Scratch.dir(spark, "cc_spec")
    val plain = ConnectedComponents.propagateMinLabel(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ckpt = ConnectedComponents.propagateMinLabel(edges, "a", "b",
      maxIter = 20, checkpointDir = Some(dir))
    assert(ckpt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == plain)
    // the returned frame reads from the last checkpoint, not the loop's
    // join lineage — downstream actions don't replay the iterations
    val plan = ckpt.queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet") && !plan.contains("SortMergeJoin"),
      plan.take(800))
  }

  test("direction of the edge list doesn't matter") {
    val s = spark
    import s.implicits._
    val fwd = Seq((5L, 6L), (6L, 7L)).toDF("a", "b")
    val rev = Seq((6L, 5L), (7L, 6L)).toDF("a", "b")
    def run(df: org.apache.spark.sql.DataFrame) =
      ConnectedComponents.propagateMinLabel(df, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(fwd) == run(rev))
  }
}
