package graft

/** Registry-wide per-query FACT-SCAN BUDGET — the mechanized form of the
  * round-14 manual scan census (VERDICT r14 top item). That census found
  * the same defect class three times by hand: a multi-consumer frame whose
  * lineage silently re-planned the fact scan per consumer (d13 shipped at
  * 24 documents scans, e11 at 21, f1 at 7). PlanSpec pins the ~16 queries
  * already caught; THIS spec closes the class for every query that will
  * ever be registered:
  *
  *   - every registered query (minus the model-fitting skip set, whose
  *     plans are owned by their own specs) must have a committed budget
  *     row here — registering without one fails;
  *   - the observed per-fact scan count must equal the budget EXACTLY —
  *     a count that creeps up is the defect, a count that drops means the
  *     budget is stale and must be re-committed (both force the review);
  *   - a planted multiplied-scan control proves the detector fires.
  *
  * Regenerate the table with `sbt "Test/runMain graft.ScanCensusMain"`
  * and review every diff line before pasting — regeneration is for
  * reviewed plan changes, never for making the spec pass.
  */
class ScanBudgetSpec extends SparkSpec {

  /** name -> "fact=n,..." ("" = zero fact scans: dims-only, or consumers
    * that read a materialized scratch artifact). Multi-scan entries fall
    * into three reviewed classes, annotated inline: protocol-inherent
    * passes (m10's 3-fold CV), self-join semantics (as-of/interval joins,
    * ANN bucket self-joins, a16-class stats+rows contrasts), and derived
    * test scaffolding (the u-family change batches).
    */
  private val budget: Map[String, String] = Map(
    "a10_rmse" -> "events=1",
    "a12_rollup" -> "events=1",
    "a13_pivot" -> "events=1",
    "a14_cube" -> "",
    "a15_percentiles" -> "events=1",
    "a16_zscore_anomaly" -> "events=2",
    "a17_hll_distinct" -> "documents=2",
    "a18_ddsketch_quantiles" -> "events=3",
    "a19_randomized_response" -> "documents=1",
    "a1_collect_list" -> "orders=1",
    "a20_ab_welch" -> "events=2",
    "a21_cusum" -> "events=2",
    "a22_gini" -> "orders=1",
    "a23_benford" -> "orders=2",
    // a24/a33: histogram-cut since round 15 (a24 additionally rewritten
    // off its per-type corpus sort onto the a30 cumulative read-off)
    "a24_winsorize" -> "",
    "a25_ols_trend" -> "lineitem=1",
    "a26_chi_square" -> "",
    "a27_rank_correlation" -> "",
    "a28_ks_test" -> "",
    "a29_mann_whitney" -> "",
    "a2_distinct" -> "orders=1",
    "a30_tukey_fences" -> "",
    "a31_cramers_v" -> "",
    "a32_two_proportion" -> "events=2",
    "a33_mad_outliers" -> "",
    "a34_runs_test" -> "",
    "a35_acf" -> "",
    "a36_odds_ratio" -> "events=2",
    "a37_cuped" -> "events=2",
    "a38_mde" -> "events=1",
    "a39_srm" -> "events=1",
    "a3_group_sum" -> "lineitem=1",
    "a4_count_by_group" -> "events=1",
    "a5_group_entries" -> "lineitem=1",
    "a5_map_from_entries" -> "events=1",
    "a6_rank_agg" -> "events=1",
    "a7_summary_stats" -> "events=1",
    "a8_histogram" -> "events=1",
    "a9_argmax" -> "orders=1",
    "a9_argmax_map" -> "orders=1",
    "b10_tpch_q19" -> "lineitem=1",
    "b11_tpch_q15" -> "",
    "b12_tpch_q22" -> "orders=1",
    "b13_tpch_q7" -> "lineitem=1,orders=1",
    "b14_tpch_q4" -> "lineitem=1,orders=1",
    "b15_tpch_q12" -> "lineitem=1,orders=1",
    "b16_tpch_q13" -> "orders=1",
    "b17_tpch_q8" -> "lineitem=1,orders=1",
    "b18_tpch_q21" -> "lineitem=1,orders=1",
    "b19_tpch_q9" -> "lineitem=1,orders=1",
    "b1_bucketed_join" -> "",
    "b20_tpch_q16" -> "lineitem=1",
    "b21_tpch_q20" -> "lineitem=1",
    "b22_tpch_q2" -> "lineitem=1",
    "b23_tpch_q11" -> "",
    "b2_tpch_q5" -> "lineitem=1,orders=1",
    "b3_tpch_q3" -> "lineitem=1,orders=1",
    "b4_tpch_q1" -> "lineitem=1",
    "b5_tpch_q18" -> "lineitem=1,orders=1",
    "b6_tpch_q6" -> "lineitem=1",
    "b7_tpch_q14" -> "lineitem=1",
    "b8_tpch_q10" -> "lineitem=1,orders=1",
    "b9_tpch_q17" -> "lineitem=1",
    "c10_temporal_split" -> "events=2",
    // protocol-inherent: survivor-vs-corpus contrast reads both policy branches
    // r17: band frame ships from the shared lshb cut (documents 5 -> 3)
    "c11_quality_survivor" -> "documents=3",
    "c13_temperature_mix" -> "documents=3",
    // protocol-inherent: train/eval gram sides + per-n replication
    "c14_ngram_contamination" -> "documents=4",
    "c15_curriculum_phases" -> "documents=3",
    "c16_mixture_raking" -> "",
    "c17_survivor_quality" -> "documents=1",
    "c18_distribution_drift" -> "",
    "c19_dedup_report" -> "",
    "c1_curation_apply" -> "documents=1",
    "c2_split_assign" -> "documents=1",
    "c3_decontaminate" -> "",
    "c4_mixture_sample" -> "documents=1",
    "c5_quality_classifier" -> "documents=1",
    "c6_domain_cap" -> "documents=1",
    "c7_epoch_shuffle" -> "documents=1",
    "c8_bloom_decontaminate" -> "",
    "d10_fuzzy_pairs" -> "",
    "d11_incremental_neardup" -> "documents=2",
    "d12_span_excise" -> "documents=3",
    "d13_containment" -> "",
    "d14_minhash_calibration" -> "",
    "d15_chunk_dedup" -> "",
    "d16_exact_substr" -> "documents=2",
    "d17_self_repeats" -> "documents=2",
    "d1_dedup_exact" -> "documents=1",
    "d2_minhash_sig" -> "documents=1",
    // r17: both self-join inputs read the shared lshb cut (2 -> 0)
    "d3_lsh_pairs" -> "",
    "d4_simhash" -> "documents=1",
    "d5_jaccard_pairs" -> "",
    // d6/c11/d8/e6: self-join DIAMONDS (both plan references are the
    // same subtree, collapsed to one execution by ReusedExchange —
    // the d3 pin) plus the anti-join base / partition-pruned slices;
    // not the re-derived-consumer class the cuts fix
    // r17: band branches read the shared lshb cut (3 -> 1, the apply scan)
    "d6_dedup_apply" -> "documents=1",
    "d7_dup_components" -> "",
    "d8_incremental_dedup" -> "documents=3",
    "d9_span_dedup" -> "documents=1",
    "e10_mips" -> "embeddings=2",
    "e11_mmr_diverse" -> "",
    "e12_random_projection" -> "",
    "e13_probe_sweep" -> "",
    "e14_knn_graph" -> "embeddings=2",
    "e15_matryoshka" -> "",
    "e1_cosine_topk" -> "embeddings=2",
    "e2_ann_buckets" -> "embeddings=2",
    "e3_embed_neardup" -> "embeddings=2",
    // e4/e7/e8/e9/e13: since the round-15 save/load fix the IVF assigned
    // table and PQ code table are READ as parquet artifacts (build's
    // frames were live lineages, so e8 planned 8 corpus scans); the
    // remaining single scan is the exact-recall baseline by construction
    "e4_ann_ivf" -> "embeddings=1",
    "e5_quantize" -> "embeddings=1",
    // cluster-then-compare: quantizer fit + assignment + pair pass
    "e6_semdedup" -> "embeddings=4",
    "e7_pq_adc" -> "embeddings=1",
    "e8_ivfpq" -> "embeddings=1",
    "e9_ivf_maintain" -> "",
    "f10_stickiness" -> "",
    "f1_funnel" -> "events=1",
    "f2_retention" -> "events=2",
    "f3_top_paths" -> "events=1",
    "f4_markov_transitions" -> "events=2",
    "f5_rfm_segments" -> "events=1",
    // r17: totals re-derives from the materialized counts parquet — the
    // returned plan no longer replays the events lead-window branch
    "f6_markov_stationary" -> "",
    "f7_cohort_ltv" -> "events=2",
    "f8_sessionize" -> "events=1",
    "f9_survival_km" -> "",
    "g10_degree_histogram" -> "",
    "g11_modularity" -> "",
    "g12_common_neighbors" -> "",
    "g13_assortativity" -> "",
    "g14_clustering_coeff" -> "",
    "g15_link_prediction" -> "",
    "g16_harmonic_centrality" -> "",
    // g1: tag-map frame cut since round 15 (fed rank AND argmax)
    "g1_dominant_tag" -> "",
    "g2_pagerank" -> "",
    "g3_triangle_count" -> "",
    "g4_label_prop" -> "",
    "g5_bfs" -> "",
    "g6_weighted_sssp" -> "",
    "g7_random_walks" -> "",
    "g8_kcore" -> "",
    "g9_hits" -> "",
    "j10_range_join_rule" -> "events=1",
    "j11_asof_tolerance" -> "events=2",
    "j12_attribution" -> "events=2",
    "j13_nullsafe_join" -> "events=2",
    "j14_interval_overlap" -> "orders=2",
    "j15_interp_asof" -> "events=2",
    "j17_nearest_asof" -> "events=2",
    "j18_bloom_filtered_join" -> "lineitem=1",
    "j1_broadcast_agg" -> "orders=1",
    "j2_outer_join" -> "lineitem=1",
    "j3_join_chain" -> "lineitem=1,orders=1",
    "j4_anti_join" -> "orders=1",
    "j5_semi_join" -> "orders=1",
    "j6_keyed_concat" -> "orders=2",
    "j8_asof_join" -> "events=2",
    "j9_range_join" -> "events=1",
    // protocol-inherent: 3-fold CV = fit+eval per fold (2x3); owned by its spec
    "m10_cv" -> "documents=6",
    "m13_popularity_baseline" -> "",
    "m14_pr_curve" -> "documents=1",
    "m15_patch_grid" -> "documents=1",
    "m16_audio_frames" -> "documents=1",
    "m17_calibration" -> "events=2",
    "m18_gains_table" -> "",
    "m19_roc_auc" -> "",
    "m1_binary_meta" -> "documents=1",
    "m20_multiclass_eval" -> "",
    "m2_frame_sample" -> "documents=1",
    "m2_precision_at_k" -> "orders=2",
    "m3_media_resize" -> "documents=2",
    "o10_zorder_key" -> "events=1",
    "o11_compaction" -> "",
    // protocol-inherent: ANALYZE computes one stats pass per audited column family
    "o12_analyze" -> "lineitem=5",
    "o13_weighted_sample" -> "documents=1",
    "o14_hash_bucket_sample" -> "documents=1",
    "o15_block_sample" -> "lineitem=2",
    "o16_poisson_bootstrap" -> "events=3",
    "o17_systematic_sample" -> "documents=2",
    "o1_sort" -> "orders=1",
    "o2_limit" -> "orders=1",
    "o3_topk" -> "lineitem=1",
    "o5_row_sample" -> "lineitem=2",
    "o6_user_sample" -> "events=4",
    "o7_repartition_write" -> "",
    "o8_stratified_sample" -> "events=2",
    "o9_partitioned_write" -> "",
    "p10_json_extract" -> "events=1",
    "p11_dq_checks" -> "lineitem=2,orders=4",
    "p12_unpivot" -> "lineitem=1",
    "p1_project_filter" -> "lineitem=1",
    "p2_nested_field" -> "lineitem=1",
    "p5_column_drop" -> "events=1",
    "p6_null_normalize" -> "events=1",
    "p7_int_arith" -> "events=1",
    "p8_regex_clean" -> "events=1",
    "p9_expr_entry" -> "events=1",
    "s10_schema_evolution" -> "",
    "s11_corrupt_json" -> "events=1",
    "s12_csv_quarantine" -> "",
    "s13_text_roundtrip" -> "",
    "s2_parquet_roundtrip" -> "",
    "s4_sqlite_contract" -> "",
    "s5_csv_roundtrip" -> "",
    "s7_reformat" -> "",
    "s8_json_roundtrip" -> "",
    "s9_orc_roundtrip" -> "",
    "set_except" -> "orders=2",
    "set_intersect" -> "",
    "set_union_distinct" -> "",
    "sk1_skew_salted_join" -> "lineitem=1",
    "sk2_skew_salted_agg" -> "events=1",
    "t10_nfc_normalize" -> "documents=1",
    "t11_pii_redact" -> "documents=1",
    "t12_repetition" -> "",
    "t13_chunk" -> "documents=1",
    // t14/t18/t22/t25/t7: token/gram tables cut since round 15 (the
    // t12/c3 gram-table discipline; uncut they planned 3-5 corpus
    // tokenizations each; t7 keeps the 1-column ndocs count scan)
    "t14_unigram_surprisal" -> "",
    "t15_vocab_coverage" -> "",
    "t16_bpe_merges" -> "",
    "t17_heavy_hitters" -> "",
    "t18_bm25" -> "",
    "t19_compression_ratio" -> "documents=1",
    "t1_langid" -> "documents=1",
    "t20_skipgram_pairs" -> "",
    "t21_bpe_encode" -> "documents=1",
    "t22_bigram_surprisal" -> "",
    "t23_lexical_diversity" -> "documents=1",
    "t24_heaps_law" -> "",
    // protocol-inherent: unigram + bigram counts + two scalar total frames off one corpus
    "t25_bigram_lift" -> "",
    "t26_hapax_ratio" -> "documents=1",
    "t27_cdc_chunking" -> "documents=1",
    "t2_quality" -> "documents=1",
    "t3_token_count" -> "documents=1",
    "t4_fingerprint" -> "documents=1",
    "t5_approx_sketches" -> "events=1",
    "t6_top_bigrams" -> "documents=1",
    "t7_tfidf" -> "documents=1",
    "t8_edit_distance" -> "documents=2",
    "t9_pack" -> "documents=2",
    // u-family: the derived change batch + second delta log ride
    // Scratch.cut since round 15 (they model REAL change tables), so the
    // registered plans read the batch like production would — u1 8->1,
    // u10 8->1, u2 9->2 (old + new snapshot digests; the new side reads
    // the cut batch)
    "u10_mor_read" -> "documents=1",
    "u11_log_compact" -> "",
    "u1_upsert" -> "documents=1",
    "u2_snapshot_diff" -> "documents=2",
    "u3_scd2_history" -> "orders=1",
    "u4_agg_ledger" -> "events=1",
    "u5_snapshot_publish" -> "",
    "u6_wap_audit" -> "",
    "u7_snapshot_rollback" -> "",
    "u8_cdc_apply" -> "events=1",
    "u9_snapshot_vacuum" -> "",
    "w10_gap_fill" -> "",
    "w11_ewma" -> "events=1",
    "w12_rolling_median" -> "events=1",
    "w13_holt" -> "events=1",
    "w14_backtest" -> "events=1",
    "w15_holt_winters" -> "events=1",
    "w16_changepoint" -> "",
    "w17_bollinger_bands" -> "events=1",
    "w18_seasonal_profile" -> "events=1",
    "w19_theil_sen" -> "",
    "w20_ohlc_candles" -> "events=1",
    "w21_drawdown" -> "",
    "w2_topk_per_key" -> "events=1",
    "w3_tumbling_window" -> "events=1",
    "w4_session_window" -> "events=1",
    "w5_sliding_window" -> "events=1",
    "w6_running_total" -> "events=1",
    "w7_quantile_buckets" -> "events=1",
    "w8_trailing_window" -> "events=1",
    "w9_topk_agg" -> "events=1",
  )

  test("every registered query has a committed scan budget; none is stale") {
    val names = SparkEntry.queries.keySet -- ScanCensus.skip
    val missing = names -- budget.keySet
    val stale = budget.keySet -- names
    assert(missing.isEmpty,
      "new queries registered without a scan budget (run ScanCensusMain, " +
        "review, commit): " + missing.toSeq.sorted.mkString(", "))
    assert(stale.isEmpty,
      "budget rows for unregistered queries (delete them): " +
        stale.toSeq.sorted.mkString(", "))
  }

  test("observed fact-scan counts equal the committed budgets exactly") {
    // another suite's leftover cache would substitute InMemoryTableScan
    // for FileScan nodes and silently LOWER counts — measure uncached,
    // the plan that exists at 100 TB (PlanSpec e2/e3 rationale)
    spark.catalog.clearCache()
    val diffs = budget.toSeq.sortBy(_._1).flatMap { case (name, b) =>
      SparkEntry.queries.get(name).toSeq.flatMap { fn =>
        val obs = ScanCensus.counts(
          fn(spark, sfDir).queryExecution.executedPlan.toString)
        val exp = ScanCensus.parse(b)
        if (obs == exp) Nil
        else Seq(s"$name: budget [$b] observed [${ScanCensus.render(obs)}]")
      }
    }
    assert(diffs.isEmpty,
      "fact-scan counts diverged from the committed budget — a count UP " +
        "is the multiplied-scan defect (materialize the shared frame, " +
        "PlanSpec census pattern); a count DOWN means re-commit the " +
        "budget after review:\n" + diffs.mkString("\n"))
  }

  test("planted control: the detector counts a multiplied-scan plan") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sfDir)
    // two aggregates unioned from the same source: the optimizer keeps
    // two FileScan nodes — exactly the re-derived-lineage shape the
    // round-14 census kept finding
    val multiplied = docs.groupBy().agg(count(lit(1)).as("v"))
      .unionByName(docs.groupBy().agg(sum(length(col("text"))).cast("long").as("v")))
    val c = ScanCensus.counts(
      multiplied.queryExecution.executedPlan.toString)
    assert(c.get("documents").contains(2),
      s"detector failed to count the planted double scan: $c")
    // and the single-scan baseline counts exactly one
    val single = ScanCensus.counts(
      docs.select(col("doc_id")).queryExecution.executedPlan.toString)
    assert(single.get("documents").contains(1), s"baseline miscount: $single")
  }
}
