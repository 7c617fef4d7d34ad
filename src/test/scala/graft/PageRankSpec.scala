package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** PageRank semantics against hand-checkable graphs, plus an in-suite
  * power-method reference for a weighted digraph (the same definition the
  * g2 oracle unrolls in SQL — teleport + damped weighted in-mass, dangling
  * mass dropped).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Double)], iters: Int = 8)
      : Map[Long, Double] =
    PageRank.run(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("uniform cycle stays uniform") {
    // A->B->C->A with equal weights: 1/3 each is the exact fixpoint, so
    // every iterate equals it too.
    val r = ranks(Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0)))
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("sink-heavy star: hub outranks leaves, leaves tie") {
    // leaves 2,3,4 all point at 1; 1 points back at 2,3,4 equally.
    val edges = Seq((2L, 1L, 1.0), (3L, 1L, 1.0), (4L, 1L, 1.0),
      (1L, 2L, 1.0), (1L, 3L, 1.0), (1L, 4L, 1.0))
    val r = ranks(edges)
    assert(r(1L) > r(2L))
    assert(r(2L) === r(3L) && r(3L) === r(4L))
    // no dangling nodes -> total mass conserved at 1
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("edge weights shift mass: heavier edge's target ranks higher") {
    // 1 sends 3x more weight to 2 than to 3; 2 and 3 are otherwise
    // symmetric (both return all mass to 1).
    val edges = Seq((1L, 2L, 3.0), (1L, 3L, 1.0), (2L, 1L, 1.0), (3L, 1L, 1.0))
    val r = ranks(edges)
    assert(r(2L) > r(3L))
    // 2 receives 3/4 of 1's damped mass m, 3 receives 1/4; with teleport t:
    // r2 - r3 = m/2 and r2 + r3 = 2t/3 + m, so the implementation must
    // satisfy (r2 - r3) = ((r2 + r3) - 2*0.15/3) / 2 exactly.
    assert(math.abs((r(2L) - r(3L)) - ((r(2L) + r(3L)) - 2 * 0.15 / 3) / 2) < 1e-12)
  }

  test("matches an in-suite power-method reference on a weighted digraph") {
    val edges = Seq(
      (1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 1L, 4.0),
      (4L, 1L, 1.0), (4L, 5L, 1.0), (5L, 4L, 2.0), (2L, 5L, 3.0))
    val iters = 8
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val ow = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var ref = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 0 until iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => ref(s) * w / ow(s) }.sum).toMap
      ref = nodes.map(nd => nd -> ((1.0 - 0.85) / n
        + 0.85 * in.getOrElse(nd, 0.0))).toMap
    }
    val got = ranks(edges, iters)
    nodes.foreach(nd => assert(math.abs(got(nd) - ref(nd)) < 1e-9,
      s"node $nd: got ${got(nd)} ref ${ref(nd)}"))
  }

  test("dangling node keeps teleport rank; mass leaks by design") {
    // 1->2 only: 2 has no out-edges, so 2's absorbed mass is dropped.
    val r = ranks(Seq((1L, 2L, 1.0)))
    assert(math.abs(r(1L) - 0.15 / 2) < 1e-12)
    assert(r(2L) > r(1L))
    assert(r.values.sum < 1.0)
  }

  test("runDense fold == run join form (r18 g2 collapse differential)") {
    // same digraph as the power-method reference, PLUS a dangling node
    // and a source-only node so every membership arm is exercised; the
    // two forms differ only in double summation order, so agreement is
    // demanded at 1e-12 (term count is tiny — reordering noise is ULPs)
    val edges = Seq(
      (1L, 2L, 2.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 1L, 4.0),
      (4L, 1L, 1.0), (4L, 5L, 1.0), (5L, 4L, 2.0), (2L, 5L, 3.0),
      (1L, 6L, 0.5), // 6 is dangling: receives, never redistributes
      (7L, 1L, 1.0)) // 7 is source-only: teleport rank, never receives
    for (iters <- Seq(1, 8)) {
      val joinForm = ranks(edges, iters)
      val dense = PageRank
        .runDense(edges.toDF("src", "dst", "w"), "src", "dst", "w", iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(dense.keySet == joinForm.keySet)
      joinForm.foreach { case (nd, v) =>
        assert(math.abs(dense(nd) - v) < 1e-12,
          s"iters=$iters node $nd: dense ${dense(nd)} vs join $v")
      }
    }
  }

  test("per-round plan: equi-join + partial aggregation, no cartesian") {
    val edges = (1L to 200L).map(i => (i, i % 17, 1.0)).toDF("src", "dst", "w")
    val p = PageRank.run(edges, "src", "dst", "w", iters = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "rank propagation went all-pairs")
    // contribution aggregate must combine map-side before its shuffle
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "per-round contribution aggregate lost its partial/final split")
  }

  test("checkpointed loop returns the same ranks as uncheckpointed") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 1L, 1.0), (3L, 2L, 1.0))
    val df = edges.toDF("src", "dst", "w")
    val plain = PageRank.run(df, "src", "dst", "w", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dir = Scratch.dir(spark, "pagerank_spec")
    val ck = PageRank.run(df, "src", "dst", "w", iters = 5,
      checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(plain === ck)
  }
}
