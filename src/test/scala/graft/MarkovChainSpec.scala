package graft

import org.apache.spark.sql.functions._
import graft.operators.MarkovChain

/** MarkovChain's data-shape edge cases on synthetic transition tables —
  * above all the SINK path (a state appearing only as to_type), which the
  * registered f6 query's corpus never exercises.
  */
class MarkovChainSpec extends SparkSpec {

  // A -> A (1), A -> B (2), B -> C (3); C is a sink (only ever a target)
  private def counts = {
    val s = spark
    import s.implicits._
    Seq(("A", "A", 1L), ("A", "B", 2L), ("B", "C", 3L))
      .toDF("from_type", "to_type", "n_pair")
  }

  test("paddedTransitions gives the sink an absorbing self-loop and real outdegrees") {
    val t = MarkovChain.paddedTransitions(counts)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(t === Set(
      ("A", "A", 1L, 3L), ("A", "B", 2L, 3L), ("B", "C", 3L, 3L),
      ("C", "C", 1L, 1L)))
  }

  test("stationary matches an exact BigInt replay and drains into the sink") {
    val trans = MarkovChain.paddedTransitions(counts)
    val (pi, prev) = MarkovChain.stationary(spark, trans, 8)
    val got = pi.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact replay: same uniform seed, same per-edge floor division
    val edges = Map(
      ("A", "A") -> (1L, 3L), ("A", "B") -> (2L, 3L),
      ("B", "C") -> (3L, 3L), ("C", "C") -> (1L, 1L))
    var p = Map("A" -> 333333L, "B" -> 333333L, "C" -> 333333L)
    for (_ <- 1 to 8) {
      val next = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for (((f, t), (np, nf)) <- edges; pf <- p.get(f))
        next(t) += pf * np / nf
      p = next.toMap
    }
    assert(got === p)
    // absorbing sink drains the chain: C holds nearly all surviving mass
    assert(got("C") > 900000L)
    assert(got.values.sum > 1000000L - 2L - 8L * edges.size)
    // prev really is the round-7 state: one more hand round from it
    // must land on the final vector
    val pv = prev.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val step = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for (((f, t), (np, nf)) <- edges; pf <- pv.get(f))
      step(t) += pf * np / nf
    assert(step.toMap === got)
  }

  test("a sink-free chain is unchanged by padding") {
    val s = spark
    import s.implicits._
    val noSink = Seq(("A", "B", 2L), ("B", "A", 1L))
      .toDF("from_type", "to_type", "n_pair")
    val t = MarkovChain.paddedTransitions(noSink)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(t === Set(("A", "B", 2L, 2L), ("B", "A", 1L, 1L)))
  }
}
