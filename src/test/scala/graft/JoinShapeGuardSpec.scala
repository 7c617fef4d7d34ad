package graft

/** Registry-wide join-shape guard — the global form of PlanSpec's
  * per-query no-cartesian pins: a CartesianProduct anywhere in an
  * executed plan is an N x M scale-killer and is forbidden outright;
  * BroadcastNestedLoopJoin is legitimate ONLY for the scalar-frame
  * crossJoin idiom (broadcasting a one-row aggregate onto every row —
  * t14's corpus total, a18's quantile frame), so the exact set of
  * queries allowed one is FROZEN here. A new query that introduces a
  * BNLJ fails until it is reviewed and added — which is the review the
  * guard exists to force.
  */
class JoinShapeGuardSpec extends SparkSpec {

  // model-fitting queries execute training at construction (the
  // WindowGuardSpec/LambdaCseGuardSpec skip-set rationale); their plan
  // shapes are owned by their specs.
  private val skip = Set("m1_indexer_pipeline", "m3_ranking_metrics",
    "m4_als_recommend", "m5_als_rmse", "m6_item_similarity", "m7_sweep",
    "m8_grid", "m9_curve", "m10_cv", "m11_rec_coverage", "m12_fold_in",
    // streaming queries execute a full stream drain at construction; the
    // returned sink-read aggregate plans no joins to guard
    "st1_stream_hourly", "st2_stream_dedup", "st3_stream_ingest",
    "st4_stream_cdc", "st5_stream_join", "st6_stream_session",
    "st7_stream_ewma", "st8_stream_heavy")

  /** Queries whose BNLJ is the reviewed scalar-frame (or bounded
    * dimension-frame) broadcast idiom: the broadcast side is a one-row
    * aggregate, a literal quantile/config frame, or a model-sized
    * centroid table joined without an equi-key by construction.
    */
  private val bnljAllowed = Set(
    "a18_ddsketch_quantiles", // literal quantile frame x cumulative walk
    "e1_cosine_topk",         // <= 3-row query frame x corpus (baseline op)
    // (e11_mmr_diverse left the list at the round-14 census fix: its
    // candidate frame is materialized, so no BNLJ plans anymore)
    "e10_mips",               // same 3-row query frame x corpus shape
    "e4_ann_ivf",             // query frame / centroid table broadcasts
    "e6_semdedup", "e7_pq_adc", "e8_ivfpq", "e9_ivf_maintain", // same family
    "e13_probe_sweep",        // same 8-row query frame / centroid broadcasts
    "t7_tfidf",               // 1-row corpus-size aggregate
    "t18_bm25",               // 1-row corpus-stats aggregate (TL, ND)
    "t14_unigram_surprisal",  // 1-row corpus-total aggregate
    "t22_bigram_surprisal",   // 1-row vocabulary-size aggregate
    "c10_temporal_split",     // 1-row time-cutoff aggregate
    "t15_vocab_coverage",     // 1-row total-token aggregate
    // (u1/u2/u10 left the list at the round-15 change-batch cut: their
    // 1-row insert-offset crossJoins now execute at construction, inside
    // the batch materialization — the returned plans read the batch like
    // the real change table it models)
    "b23_tpch_q11",           // 1-row (total, n_parts) threshold frame
    "g8_kcore",               // two 1-row count aggregates (convergence flag)
    "c13_temperature_mix",    // 1-row weight-sum aggregate (quota denominator)
    // (g9_hits' per-half-step 1-row max crossJoins run inside its scratch
    // checkpoint writes, so its FINAL plan carries no BNLJ — not listed)
    "m13_popularity_baseline", // 1-row cutoff + 1-row val-user-count frames
    "g10_degree_histogram",   // 1-row node-total frame (share denominator)
    "a23_benford",            // 1-row order-count frame (share denominator)
    "g11_modularity",         // 1-row edge-total frame (Q denominator)
    "a26_chi_square",         // |langs| x |sources| category frames + 1-row N/df
    "t24_heaps_law",          // 1-row doc-count frame (checkpoint stride)
    "m14_pr_curve",           // 6-row literal threshold frame
    "a28_ks_test",            // 1-row sample-size frame (n_a, n_b)
    "f6_markov_stationary",   // 1-row state-count seed + 1-row mass frame
    "t25_bigram_lift",        // 1-row unigram-total + 1-row bigram-total frames
    "a31_cramers_v",          // a26's category frames + 1-row N/dims frames
    "w16_changepoint",        // 1-row (n_bins, series-total) frame
    "c15_curriculum_phases",  // 1-row corpus-count frame (phase denominator)
    "a32_two_proportion",     // two 1-row variant frames (n, x) each
    "a34_runs_test",          // 1-row median / bin-count / flip-count frames
    "a35_acf",                // 1-row (mu, n) and (d2) scalar frames + 3-row lag frame
    "a36_odds_ratio",         // two 1-row variant frames (a32's shape)
    "a37_cuped",              // 1-row cutoff / stats / variant frames
    "w19_theil_sen",          // calendar-bounded daily pair join (d1 < d2)
                              // + 1-row n_pairs/n_days scalar frames
    "m17_calibration",        // 1-row cmax frame (decile denominator)
    "f9_survival_km",         // 1-row observation-end + user-total frames
    "c18_distribution_drift", // 1-row cutoff + half-total frames
    "c19_dedup_report",       // 1-row (n_docs, n_survivors) totals frame
    "m18_gains_table",        // 1-row (N, positives) totals frame
    "b12_tpch_q22"            // 1-row positive-balance threshold frame
  )
  // (c16's scalar crossJoins execute at construction, before the
  // per-round materialization — its RETURNED plan is a parquet read +
  // tiny window, so it needs no allowlist row.)

  test("no CartesianProduct; BroadcastNestedLoopJoin only on the frozen allowlist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .flatMap { case (name, fn) =>
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cart =
          if (p.contains("CartesianProduct")) Seq(s"$name: CartesianProduct")
          else Nil
        val bnlj =
          if (p.contains("BroadcastNestedLoopJoin") && !bnljAllowed(name))
            Seq(s"$name: unreviewed BroadcastNestedLoopJoin")
          else Nil
        cart ++ bnlj
      }
    assert(offenders.isEmpty,
      "scale-killing join shape in a registered query (review it; if the " +
        "broadcast side is provably scalar/model-sized, add it to " +
        "bnljAllowed):\n" + offenders.mkString("\n"))
  }

  test("the allowlist stays minimal: every entry still plans a BNLJ") {
    val stale = bnljAllowed.toSeq.sorted.filter { name =>
      val p = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      !p.contains("BroadcastNestedLoopJoin")
    }
    assert(stale.isEmpty,
      s"allowlist entries with no BNLJ anymore (remove them): $stale")
  }
}
