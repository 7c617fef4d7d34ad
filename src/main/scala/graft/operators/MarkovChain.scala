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
    *
    * r17 shape: the transition table is |states|² rows at ANY corpus
    * scale (states = event-type cardinality, bounded by the schema, not
    * the corpus), so the old form — `rounds` unrolled join+groupBy stages,
    * 37 exchanges in f6's plan — paid a per-round shuffle cadence for
    * frames that fit in one task. The rounds now run as ONE codegen-
    * friendly higher-order `aggregate` fold over a single collapsed row
    * (states array + indexed edge array): per round, new_pi[j] =
    * Σ_{edges e→j} pi[e.fi]·np div nf — the identical exact-integer floor
    * divisions in the identical order-independent sum, so the vectors are
    * bit-equal to the join-form's (the fold's accumulator is a VALUE, so
    * each round evaluates once — no exponential re-inlining). Row
    * membership keeps the join-form's sparse semantics: a state appears
    * in round k's frame iff some edge reaches it from a state present in
    * round k-1 (the `exists` mask fold) — membership only diverges from
    * "all states" on tables with source-only states, which
    * paddedTransitions never produces but the contract preserves anyway.
    * The collapse is the TinyWindow argument: bounded-by-construction
    * frames may run single-task; MarkovChainSpec's BigInt replay pins
    * value-exactness, and f6's DuckDB oracle (which still unrolls the
    * join form as 8 CTEs) pins cross-engine equality end to end.
    */
  def stationary(spark: SparkSession, trans: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val onerow = trans
      .agg(collect_set(col("from_type")).as("froms"),
        collect_set(col("to_type")).as("tos"),
        collect_list(struct(col("from_type").as("f"), col("to_type").as("t"),
          col("n_pair").cast("long").as("np"),
          col("n_from").cast("long").as("nf"))).as("raw"))
      .select(col("froms"), col("raw"),
        sort_array(array_distinct(concat(col("froms"), col("tos"))))
          .as("states"))
      .select(col("states"),
        expr("""transform(raw, e -> named_struct(
                |  'fi', CAST(array_position(states, e.f) AS INT),
                |  'ti', CAST(array_position(states, e.t) AS INT),
                |  'np', e.np, 'nf', e.nf))""".stripMargin).as("edges"),
        // seed matches the join form exactly: uniform mass over the
        // FROM-state set (to-only states start absent ⟹ dense 0)
        expr("""transform(states, x ->
                |  IF(array_contains(froms, x),
                |     1000000 div size(froms), 0L))""".stripMargin).as("pi0"),
        expr("transform(states, x -> array_contains(froms, x))").as("pr0"))
    val vfold =
      s"""aggregate(sequence(1, $rounds),
         |  named_struct('prev', pi0, 'cur', pi0),
         |  (acc, r) -> named_struct('prev', acc.cur, 'cur',
         |    transform(sequence(1, size(states)), j ->
         |      aggregate(edges, 0L, (a, e) ->
         |        a + IF(e.ti = j,
         |              element_at(acc.cur, e.fi) * e.np div e.nf,
         |              0L)))))""".stripMargin
    val mfold =
      s"""aggregate(sequence(1, $rounds),
         |  named_struct('prev', pr0, 'cur', pr0),
         |  (acc, r) -> named_struct('prev', acc.cur, 'cur',
         |    transform(sequence(1, size(states)), j ->
         |      exists(edges, e -> e.ti = j AND element_at(acc.cur, e.fi)))))"""
        .stripMargin
    val solved = onerow.select(col("states"),
      expr(vfold).as("v"), expr(mfold).as("m"))
    def frame(leg: String): DataFrame =
      solved.select(posexplode(col("states")).as(Seq("i", "state")),
          col("v"), col("m"))
        .filter(expr(s"element_at(m.$leg, i + 1)"))
        .select(col("state"),
          expr(s"element_at(v.$leg, i + 1)").as("p_x1e6"))
    (frame("cur"), frame("prev"))
  }
}
