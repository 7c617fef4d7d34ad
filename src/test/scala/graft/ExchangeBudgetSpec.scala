package graft

/** Registry-wide per-query EXCHANGE BUDGET — the mechanized form of the
  * "hidden extra shuffle" review (VERDICT r15 #2 / r16 #2), built on the
  * [[ScanCensus]]/[[ScanBudgetSpec]] pattern that killed the hidden
  * re-scan class in round 14:
  *
  *   - every registered query (minus the model-fitting/stream skip set,
  *     whose plans are owned by their own specs) must have a committed
  *     exchange budget row here — registering without one fails;
  *   - observed shuffle AND broadcast exchange counts must equal the
  *     budget EXACTLY — a shuffle count that creeps up is the defect
  *     (lost partial agg, lost broadcast join, sneaked repartition); a
  *     count that drops means the budget is stale and must be
  *     re-committed (both force the review);
  *   - a planted lost-broadcast control proves the detector fires.
  *
  * Counting semantics (ExchangeCensus): shuffle = Exchange
  * hash/range/Single/RoundRobin nodes in the AQE-initial executed plan
  * (the statically REQUESTED shape); broadcast = BroadcastExchange
  * nodes; ReusedExchange counts as ZERO (a reused exchange executes
  * once — the d3 diamond pins depend on exactly that).
  *
  * Reviewed multi-shuffle classes, annotated inline where they explain
  * an outlier row:
  *   - bounded-round ITERATION UNROLLED IN-PLAN over tiny frames
  *     (f6_markov_stationary's 37: 8 power-iteration rounds over the
  *     ~25-row event-type transition matrix — kilobyte shuffles, the
  *     scalar-matrix fixed point; t20's 26: 3 unrolled walk steps x
  *     join+agg against the edges artifact);
  *   - protocol-inherent repetition (m10_cv's 18: 3-fold fit+eval;
  *     e8/e13/e9's 10-14: build + assign + ADC rerank + recall-evidence
  *     legs of the ANN protocols);
  *   - stats contrasts whose oracle needs both a distribution pass and a
  *     row pass (a26-a31 family, 7-12).
  * Every remaining row is the query's natural agg/join/sort ladder —
  * most oracled queries end in a total-order sort, so shuffle >= 1 is
  * the normal floor.
  *
  * Regenerate with `sbt "Test/runMain graft.ExchangeCensusMain"` and
  * review every diff line before pasting — regeneration is for reviewed
  * plan changes, never for making the spec pass.
  */
class ExchangeBudgetSpec extends SparkSpec {

  private val budget: Map[String, String] = Map(
    "a10_rmse" -> "shuffle=2",
    "a12_rollup" -> "shuffle=2",
    "a13_pivot" -> "shuffle=3",
    "a14_cube" -> "shuffle=2",
    "a15_percentiles" -> "shuffle=2",
    "a16_zscore_anomaly" -> "shuffle=3,broadcast=1",
    "a17_hll_distinct" -> "shuffle=6",
    "a18_ddsketch_quantiles" -> "shuffle=5,broadcast=2",
    "a19_randomized_response" -> "shuffle=2",
    "a1_collect_list" -> "shuffle=2",
    "a20_ab_welch" -> "shuffle=3,broadcast=1",
    "a21_cusum" -> "shuffle=3,broadcast=1",
    "a22_gini" -> "shuffle=3,broadcast=2",
    "a23_benford" -> "shuffle=3,broadcast=1",
    "a24_winsorize" -> "shuffle=4,broadcast=2",
    "a25_ols_trend" -> "shuffle=2,broadcast=2",
    "a26_chi_square" -> "shuffle=12,broadcast=9",
    "a27_rank_correlation" -> "shuffle=11,broadcast=3",
    "a28_ks_test" -> "shuffle=8,broadcast=2",
    "a29_mann_whitney" -> "shuffle=7,broadcast=1",
    "a2_distinct" -> "shuffle=2",
    "a30_tukey_fences" -> "shuffle=4,broadcast=2",
    "a31_cramers_v" -> "shuffle=8,broadcast=5",
    "a32_two_proportion" -> "shuffle=4,broadcast=1",
    "a33_mad_outliers" -> "shuffle=6,broadcast=3",
    "a34_runs_test" -> "shuffle=2,broadcast=2",
    "a35_acf" -> "shuffle=5,broadcast=5",
    "a36_odds_ratio" -> "shuffle=4,broadcast=1",
    "a37_cuped" -> "shuffle=3,broadcast=1",
    "a38_mde" -> "shuffle=2",
    "a39_srm" -> "shuffle=2",
    "a3_group_sum" -> "shuffle=2",
    "a4_count_by_group" -> "shuffle=2",
    "a5_group_entries" -> "shuffle=2",
    "a5_map_from_entries" -> "shuffle=2",
    "a6_rank_agg" -> "shuffle=3",
    "a7_summary_stats" -> "shuffle=1",
    "a8_histogram" -> "shuffle=3",
    "a9_argmax" -> "shuffle=2",
    "a9_argmax_map" -> "shuffle=2",
    "b10_tpch_q19" -> "shuffle=1,broadcast=1",
    "b11_tpch_q15" -> "shuffle=2,broadcast=2",
    "b12_tpch_q22" -> "shuffle=3,broadcast=2",
    "b13_tpch_q7" -> "shuffle=2,broadcast=5",
    "b14_tpch_q4" -> "shuffle=2,broadcast=1",
    "b15_tpch_q12" -> "shuffle=2,broadcast=1",
    "b16_tpch_q13" -> "shuffle=3,broadcast=1",
    "b17_tpch_q8" -> "shuffle=2,broadcast=7",
    "b18_tpch_q21" -> "shuffle=3,broadcast=2",
    "b19_tpch_q9" -> "shuffle=2,broadcast=4",
    "b1_bucketed_join" -> "shuffle=2,broadcast=1",
    "b20_tpch_q16" -> "shuffle=3,broadcast=2",
    "b21_tpch_q20" -> "shuffle=5,broadcast=2",
    "b22_tpch_q2" -> "shuffle=1,broadcast=4",
    "b23_tpch_q11" -> "shuffle=2,broadcast=1",
    "b2_tpch_q5" -> "shuffle=4,broadcast=6",
    "b3_tpch_q3" -> "shuffle=1,broadcast=2",
    "b4_tpch_q1" -> "shuffle=2",
    "b5_tpch_q18" -> "shuffle=1,broadcast=2",
    "b6_tpch_q6" -> "shuffle=1",
    "b7_tpch_q14" -> "shuffle=1,broadcast=1",
    "b8_tpch_q10" -> "shuffle=1,broadcast=3",
    "b9_tpch_q17" -> "shuffle=2,broadcast=1",
    "c10_temporal_split" -> "shuffle=3,broadcast=1",
    "c11_quality_survivor" -> "shuffle=6,broadcast=2",
    "c13_temperature_mix" -> "shuffle=5,broadcast=2",
    "c14_ngram_contamination" -> "shuffle=7,broadcast=3",
    "c15_curriculum_phases" -> "shuffle=8,broadcast=2",
    "c16_mixture_raking" -> "shuffle=2",
    "c17_survivor_quality" -> "shuffle=2,broadcast=1",
    "c18_distribution_drift" -> "shuffle=4,broadcast=2",
    "c19_dedup_report" -> "shuffle=2,broadcast=1",
    "c1_curation_apply" -> "shuffle=3",
    "c2_split_assign" -> "shuffle=1",
    "c3_decontaminate" -> "shuffle=3,broadcast=2",
    "c4_mixture_sample" -> "shuffle=2",
    "c5_quality_classifier" -> "shuffle=2",
    "c6_domain_cap" -> "shuffle=2",
    "c7_epoch_shuffle" -> "",
    "c8_bloom_decontaminate" -> "shuffle=4,broadcast=3",
    // r18 distinct-name rewrite: every exchange now carries name-level
    // aggregates (<= distinct-name rows), not the entity corpus — the two
    // extra groupBys are the pk_min/pk_min2 per-name passes, the extra
    // broadcasts ship the scored-name-pair table to the entity attach
    "d10_fuzzy_pairs" -> "shuffle=6,broadcast=4",
    "d11_incremental_neardup" -> "shuffle=4,broadcast=1",
    "d12_span_excise" -> "shuffle=4,broadcast=2",
    "d13_containment" -> "shuffle=8,broadcast=5",
    "d14_minhash_calibration" -> "shuffle=1,broadcast=1",
    "d15_chunk_dedup" -> "shuffle=2",
    "d16_exact_substr" -> "shuffle=4",
    "d17_self_repeats" -> "shuffle=4",
    "d1_dedup_exact" -> "shuffle=2",
    "d2_minhash_sig" -> "shuffle=1",
    "d3_lsh_pairs" -> "shuffle=4",
    "d4_simhash" -> "shuffle=1",
    "d5_jaccard_pairs" -> "shuffle=1,broadcast=1",
    "d6_dedup_apply" -> "shuffle=6",
    "d7_dup_components" -> "shuffle=1",
    "d8_incremental_dedup" -> "shuffle=2,broadcast=1",
    "d9_span_dedup" -> "shuffle=3",
    "e10_mips" -> "shuffle=2,broadcast=1",
    "e11_mmr_diverse" -> "shuffle=8,broadcast=7",
    "e12_random_projection" -> "shuffle=1",
    "e13_probe_sweep" -> "shuffle=12,broadcast=12",
    "e14_knn_graph" -> "shuffle=4",
    "e15_matryoshka" -> "shuffle=2,broadcast=1",
    "e1_cosine_topk" -> "shuffle=2,broadcast=1",
    "e2_ann_buckets" -> "shuffle=4",
    "e3_embed_neardup" -> "shuffle=3",
    "e4_ann_ivf" -> "shuffle=9,broadcast=7",
    "e5_quantize" -> "shuffle=1",
    "e6_semdedup" -> "shuffle=6,broadcast=2",
    "e7_pq_adc" -> "shuffle=8,broadcast=3",
    "e8_ivfpq" -> "shuffle=14,broadcast=9",
    "e9_ivf_maintain" -> "shuffle=10,broadcast=7",
    "f10_stickiness" -> "shuffle=5,broadcast=1",
    "f1_funnel" -> "shuffle=2",
    "f2_retention" -> "shuffle=5,broadcast=1",
    "f3_top_paths" -> "shuffle=2",
    "f4_markov_transitions" -> "shuffle=6,broadcast=1",
    "f5_rfm_segments" -> "shuffle=5",
    // r17: the 8 power rounds collapsed from unrolled join+groupBy stages
    // (37 shuffles / 29 broadcasts) into one single-row HOF fold over the
    // bounded transition matrix (MarkovChain.stationary), and totals now
    // re-derives from the materialized counts parquet (no events lead-
    // window replay); what remains are the collapsed-row collects for
    // pi/prev/mass plus the final tiny joins
    "f6_markov_stationary" -> "shuffle=4,broadcast=3",
    "f7_cohort_ltv" -> "shuffle=5,broadcast=1",
    "f8_sessionize" -> "shuffle=2",
    "f9_survival_km" -> "shuffle=7,broadcast=2",
    "g10_degree_histogram" -> "shuffle=5,broadcast=1",
    "g11_modularity" -> "shuffle=5,broadcast=6",
    "g12_common_neighbors" -> "shuffle=3,broadcast=4",
    "g13_assortativity" -> "shuffle=3,broadcast=2",
    "g14_clustering_coeff" -> "shuffle=2,broadcast=2",
    "g15_link_prediction" -> "shuffle=3,broadcast=4",
    "g16_harmonic_centrality" -> "shuffle=2",
    "g1_dominant_tag" -> "shuffle=9,broadcast=2",
    // r18 runDense fold: the 8 power rounds moved INTO the returned plan
    // (one single-row collapse agg = +1 shuffle of <= 625 edge structs,
    // +1 broadcast of the 1-row fold result into the nation join) —
    // before, the rounds ran EAGERLY at construction as 8 hidden
    // join+groupBy jobs plus 9 checkpoint write+read cycles the budget
    // never saw; the visible plan grew, the executed work collapsed 2.4x
    "g2_pagerank" -> "shuffle=2,broadcast=2",
    "g3_triangle_count" -> "shuffle=1,broadcast=6",
    "g4_label_prop" -> "shuffle=1",
    "g5_bfs" -> "shuffle=1",
    "g6_weighted_sssp" -> "shuffle=1",
    "g7_random_walks" -> "shuffle=5,broadcast=3",
    "g8_kcore" -> "shuffle=4,broadcast=7",
    "g9_hits" -> "shuffle=1,broadcast=2",
    "j10_range_join_rule" -> "shuffle=2,broadcast=1",
    "j11_asof_tolerance" -> "shuffle=2",
    "j12_attribution" -> "shuffle=1,broadcast=1",
    "j13_nullsafe_join" -> "shuffle=3,broadcast=1",
    "j14_interval_overlap" -> "shuffle=2,broadcast=1",
    "j15_interp_asof" -> "shuffle=2",
    "j17_nearest_asof" -> "shuffle=2",
    "j18_bloom_filtered_join" -> "shuffle=2,broadcast=1",
    "j1_broadcast_agg" -> "shuffle=2,broadcast=1",
    "j2_outer_join" -> "shuffle=3",
    "j3_join_chain" -> "shuffle=2,broadcast=3",
    "j4_anti_join" -> "shuffle=1,broadcast=1",
    "j5_semi_join" -> "shuffle=1,broadcast=1",
    "j6_keyed_concat" -> "shuffle=1,broadcast=1",
    "j8_asof_join" -> "shuffle=2",
    "j9_range_join" -> "shuffle=1,broadcast=1",
    "m10_cv" -> "shuffle=18,broadcast=3",
    "m13_popularity_baseline" -> "shuffle=10,broadcast=7",
    "m14_pr_curve" -> "shuffle=3,broadcast=1",
    "m15_patch_grid" -> "shuffle=1",
    "m16_audio_frames" -> "shuffle=1",
    "m17_calibration" -> "shuffle=3,broadcast=1",
    "m18_gains_table" -> "shuffle=10,broadcast=2",
    "m19_roc_auc" -> "shuffle=6,broadcast=1",
    "m1_binary_meta" -> "shuffle=1",
    "m20_multiclass_eval" -> "shuffle=3",
    "m2_frame_sample" -> "shuffle=1",
    "m2_precision_at_k" -> "shuffle=3,broadcast=1",
    "m3_media_resize" -> "shuffle=1,broadcast=1",
    "o10_zorder_key" -> "shuffle=1",
    "o11_compaction" -> "",
    "o12_analyze" -> "shuffle=10",
    "o13_weighted_sample" -> "shuffle=2",
    "o14_hash_bucket_sample" -> "shuffle=1",
    "o15_block_sample" -> "shuffle=4,broadcast=1",
    "o16_poisson_bootstrap" -> "shuffle=6,broadcast=2",
    "o17_systematic_sample" -> "shuffle=6,broadcast=1",
    "o1_sort" -> "shuffle=1",
    "o2_limit" -> "",
    "o3_topk" -> "shuffle=1",
    "o5_row_sample" -> "shuffle=3,broadcast=1",
    "o6_user_sample" -> "shuffle=5,broadcast=3",
    "o7_repartition_write" -> "shuffle=2",
    "o8_stratified_sample" -> "shuffle=3,broadcast=1",
    "o9_partitioned_write" -> "shuffle=2",
    "p10_json_extract" -> "shuffle=2",
    "p11_dq_checks" -> "shuffle=6,broadcast=1",
    "p12_unpivot" -> "shuffle=1",
    "p1_project_filter" -> "shuffle=1",
    "p2_nested_field" -> "shuffle=2",
    "p5_column_drop" -> "shuffle=1",
    "p6_null_normalize" -> "shuffle=1",
    "p7_int_arith" -> "shuffle=1",
    "p8_regex_clean" -> "shuffle=1",
    "p9_expr_entry" -> "shuffle=2",
    "s10_schema_evolution" -> "shuffle=1",
    "s11_corrupt_json" -> "shuffle=2",
    "s12_csv_quarantine" -> "shuffle=2",
    "s13_text_roundtrip" -> "shuffle=1",
    "s2_parquet_roundtrip" -> "shuffle=2",
    "s4_sqlite_contract" -> "shuffle=1",
    "s5_csv_roundtrip" -> "shuffle=2",
    "s7_reformat" -> "shuffle=1",
    "s8_json_roundtrip" -> "shuffle=2",
    "s9_orc_roundtrip" -> "shuffle=2",
    "set_except" -> "shuffle=2,broadcast=1",
    "set_intersect" -> "shuffle=2,broadcast=1",
    "set_union_distinct" -> "shuffle=2",
    "sk1_skew_salted_join" -> "shuffle=2,broadcast=1",
    "sk2_skew_salted_agg" -> "shuffle=4",
    "t10_nfc_normalize" -> "shuffle=1",
    "t11_pii_redact" -> "shuffle=1",
    "t12_repetition" -> "shuffle=5,broadcast=2",
    "t13_chunk" -> "shuffle=1",
    "t14_unigram_surprisal" -> "shuffle=5,broadcast=2",
    "t15_vocab_coverage" -> "shuffle=8,broadcast=2",
    "t16_bpe_merges" -> "shuffle=1",
    "t17_heavy_hitters" -> "shuffle=6,broadcast=7",
    "t18_bm25" -> "shuffle=6,broadcast=3",
    "t19_compression_ratio" -> "shuffle=1",
    "t1_langid" -> "shuffle=1",
    "t20_skipgram_pairs" -> "shuffle=26,broadcast=18",
    "t21_bpe_encode" -> "shuffle=2,broadcast=1",
    "t22_bigram_surprisal" -> "shuffle=6,broadcast=3",
    "t23_lexical_diversity" -> "shuffle=3",
    "t24_heaps_law" -> "shuffle=9,broadcast=2",
    "t25_bigram_lift" -> "shuffle=3,broadcast=4",
    "t26_hapax_ratio" -> "shuffle=3",
    "t27_cdc_chunking" -> "shuffle=1",
    "t2_quality" -> "shuffle=1",
    "t3_token_count" -> "shuffle=1",
    "t4_fingerprint" -> "shuffle=1",
    "t5_approx_sketches" -> "shuffle=1",
    "t6_top_bigrams" -> "shuffle=1",
    "t7_tfidf" -> "shuffle=4,broadcast=2",
    "t8_edit_distance" -> "shuffle=1,broadcast=1",
    "t9_pack" -> "shuffle=6,broadcast=1",
    "u10_mor_read" -> "shuffle=2",
    "u11_log_compact" -> "shuffle=1",
    "u1_upsert" -> "shuffle=1,broadcast=1",
    "u2_snapshot_diff" -> "shuffle=3,broadcast=1",
    "u3_scd2_history" -> "shuffle=2",
    "u4_agg_ledger" -> "shuffle=3",
    "u5_snapshot_publish" -> "shuffle=2",
    "u6_wap_audit" -> "shuffle=1",
    "u7_snapshot_rollback" -> "shuffle=3",
    "u8_cdc_apply" -> "shuffle=2",
    "u9_snapshot_vacuum" -> "shuffle=3",
    "w10_gap_fill" -> "shuffle=2,broadcast=1",
    "w11_ewma" -> "shuffle=2",
    "w12_rolling_median" -> "shuffle=2",
    "w13_holt" -> "shuffle=2",
    "w14_backtest" -> "shuffle=2",
    "w15_holt_winters" -> "shuffle=2",
    "w16_changepoint" -> "shuffle=7,broadcast=2",
    "w17_bollinger_bands" -> "shuffle=3",
    "w18_seasonal_profile" -> "shuffle=3",
    "w19_theil_sen" -> "shuffle=13,broadcast=8",
    "w20_ohlc_candles" -> "shuffle=2",
    "w21_drawdown" -> "shuffle=3",
    "w2_topk_per_key" -> "shuffle=2",
    "w3_tumbling_window" -> "shuffle=2",
    "w4_session_window" -> "shuffle=2",
    "w5_sliding_window" -> "shuffle=2",
    "w6_running_total" -> "shuffle=2",
    "w7_quantile_buckets" -> "shuffle=2",
    "w8_trailing_window" -> "shuffle=2",
    "w9_topk_agg" -> "shuffle=2",
  )

  test("every registered query has a committed exchange budget; none is stale") {
    val names = SparkEntry.queries.keySet -- ScanCensus.skip
    val missing = names -- budget.keySet
    val stale = budget.keySet -- names
    assert(missing.isEmpty,
      "new queries registered without an exchange budget (run " +
        "ExchangeCensusMain, review, commit): " +
        missing.toSeq.sorted.mkString(", "))
    assert(stale.isEmpty,
      "budget rows for unregistered queries (delete them): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("observed exchange counts equal the committed budgets exactly") {
    // uncached, like ScanBudgetSpec: a leftover InMemoryTableScan from
    // another suite would hide the exchanges under the cached subtree
    spark.catalog.clearCache()
    val diffs = budget.toSeq.sortBy(_._1).flatMap { case (name, b) =>
      SparkEntry.queries.get(name).toSeq.flatMap { fn =>
        val obs = ExchangeCensus.counts(
          fn(spark, sfDir).queryExecution.executedPlan.toString)
        val exp = ExchangeCensus.parse(b)
        if (obs == exp) Nil
        else Seq(s"$name: budget [$b] observed [${ExchangeCensus.render(obs)}]")
      }
    }
    assert(diffs.isEmpty,
      "exchange counts diverged from the committed budget — a shuffle " +
        "count UP is the hidden-extra-exchange defect (lost partial " +
        "agg / lost broadcast / sneaked repartition); a count DOWN " +
        "means re-commit the budget after review:\n" + diffs.mkString("\n"))
  }

  test("planted control: the detector counts a lost-broadcast join") {
    import org.apache.spark.sql.functions._
    val n = Tables.nation(spark, sfDir).select(col("n_nationkey"),
      col("n_regionkey"))
    val r = Tables.region(spark, sfDir).select(col("r_regionkey"))
    // the merge hint forbids the broadcast the tiny side would get: the
    // plan shuffles BOTH sides — exactly the silent regression shape
    val lost = n.join(r.hint("merge"),
      n("n_regionkey") === r("r_regionkey"))
    val cLost = ExchangeCensus.counts(
      lost.queryExecution.executedPlan.toString)
    assert(cLost.getOrElse("shuffle", 0) >= 2 &&
        cLost.getOrElse("broadcast", 0) == 0,
      s"detector missed the planted lost-broadcast shape: $cLost")
    // and the healthy form of the same join broadcasts with no shuffle
    val healthy = n.join(broadcast(r),
      n("n_regionkey") === r("r_regionkey"))
    val cHealthy = ExchangeCensus.counts(
      healthy.queryExecution.executedPlan.toString)
    assert(cHealthy.getOrElse("broadcast", 0) == 1 &&
        cHealthy.getOrElse("shuffle", 0) == 0,
      s"healthy-baseline miscount: $cHealthy")
  }
}
