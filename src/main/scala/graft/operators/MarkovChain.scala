package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-integer Markov stationary-distribution machinery (f6's operator,
  * extracted so its data-shape edge cases are unit-testable on synthetic
  * transition tables — the registered query's corpus has no sink state,
  * so the padding path would otherwise be live-but-never-exercised code).
  *
  * All arithmetic is integer at the 1e6 grain: each power-round term is
  * the exact floor division pi_i * n_pair div n_from, so the sum is
  * order-independent and the whole iteration is bit-reproducible across
  * engines (a float pi would be the a16 hash-divergence class). Mass
  * leaks at most one grain unit per (state, round) to the floor; the
  * caller reports the residual mass in-row as evidence.
  */
object MarkovChain {

  /** Pad SINK states (appearing only as `to_type`) with an absorbing
    * self-loop: without it a sink's entire occupancy vanishes on the
    * round after mass reaches it — far beyond the floor-leak bound.
    * Input: (from_type, to_type, n_pair). Output: the padded transition
    * table joined with per-state outdegree, (from_type, to_type, n_pair,
    * n_from) — sinks carry the synthetic (1, 1) self-loop.
    */
  def paddedTransitions(counts: DataFrame): DataFrame = {
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n_pair")).as("n_from"))
    val sinks = counts.select(col("to_type").as("from_type")).distinct()
      .join(totals.select(col("from_type")), Seq("from_type"), "left_anti")
    val padded = counts.unionByName(sinks.select(col("from_type"),
      col("from_type").as("to_type"), lit(1L).as("n_pair")))
    val totalsAll = totals.unionByName(
      sinks.select(col("from_type"), lit(1L).as("n_from")))
    padded.join(totalsAll, Seq("from_type"))
  }

  /** `rounds` exact-integer power iterations from the uniform seed
    * (1000000 div n_states per state) over a padded transition table
    * (paddedTransitions' shape). Returns (pi, piPrev) — the final vector
    * and the one before it, both (state, p_x1e6) — so the caller can
    * report the convergence delta.
    */
  def stationary(spark: SparkSession, trans: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    val states = trans.select(col("from_type").as("state")).distinct()
    val ns = states.agg(count(lit(1)).as("n_states"))
    var pi = states.crossJoin(broadcast(ns))
      .select(col("state"), expr("1000000 div n_states").as("p_x1e6"))
    var prev = pi
    for (_ <- 1 to rounds) {
      prev = pi
      pi = trans.join(pi, col("from_type") === col("state"))
        .select(col("to_type"),
          expr("p_x1e6 * n_pair div n_from").as("t"))
        .groupBy(col("to_type")).agg(sum(col("t")).as("p_x1e6"))
        .select(col("to_type").as("state"), col("p_x1e6"))
    }
    (pi, prev)
  }
}
