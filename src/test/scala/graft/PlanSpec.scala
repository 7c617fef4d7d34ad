package graft

/** Physical-plan assertions — the "would this survive 100x scale" checks
  * (VERDICT r1: j3's year() filter silently killed parquet pushdown; these
  * pin the fixed plans so a regression fails loudly, not slowly).
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("p1: filter and projection reach the parquet scan") {
    val p = plan("p1_project_filter")
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("GreaterThan(l_quantity"), "l_quantity filter not pushed")
    assert(p.contains("ReadSchema") && !p.contains("l_comment"))
  }

  test("j3: date-range predicate is pushed to the orders scan") {
    val p = plan("j3_join_chain")
    assert(p.contains("GreaterThanOrEqual(o_orderdate") ||
      p.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      "o_orderdate range not pushed to scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), "range filter missing")
  }

  test("j1: dimension join is broadcast, fact side not shuffled for the join") {
    val p = plan("j1_broadcast_agg")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("o3: top-k lowers to TakeOrderedAndProject, not a global sort") {
    assert(plan("o3_topk").contains("TakeOrderedAndProject"))
  }

  test("banded/bucketed similarity plans contain no cartesian product") {
    for (q <- Seq("d3_lsh_pairs", "e2_ann_buckets")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q degraded to a cartesian product")
    }
  }

  test("d3: band self-join computes the signatures once (ReusedExchange), " +
      "and the derived generate filter doesn't re-inline them") {
    // r17: the band frame rides Scratch.cut, so the signature lineage
    // lives in the LIVE form (cutMaterialize=false) — pin it there; the
    // cut (default) form must read the lshb scratch parquet instead and
    // keep the one-exchange diamond over the scratch scan.
    spark.conf.set(Scratch.CutKey, "false")
    val p =
      try {
        val df = SparkEntry.queries("d3_lsh_pairs")(spark, sfDir)
        df.collect() // AQE inserts exchange reuse at runtime — final plan
        df.queryExecution.executedPlan.toString
      } finally spark.conf.set(Scratch.CutKey, "true")
    assert(p.contains("isFinalPlan=true"), p.take(300))
    assert(p.contains("ReusedExchange"), "band diamond computed twice:\n" + p.take(2000))
    assert(!p.contains("slice(minhash_sig"),
      "minhash_sig re-inlined into a filter (posexplode_outer regressed)")
    assert(p.contains("minhash_sig"), "native signature expression missing")
    val dfMat = SparkEntry.queries("d3_lsh_pairs")(spark, sfDir)
    dfMat.collect()
    val pm = dfMat.queryExecution.executedPlan.toString
    assert(pm.contains("lshb_"), "cut d3 no longer reads the shared band frame")
    assert(!pm.contains("minhash_sig"),
      "cut d3 re-derives signatures the shared frame already materialized")
    assert(pm.contains("ReusedExchange"),
      "cut band diamond computed twice:\n" + pm.take(2000))
  }

  test("e2/e3: embedding self-joins shuffle (no broadcast of the vector " +
      "table) and compute the bucketed side once") {
    // another suite's leftover cache of an embeddings subtree would be
    // substituted into these plans and change AQE's choices — pin the
    // UNCACHED plan, which is the one that exists at 100 TB
    spark.catalog.clearCache()
    for (q <- Seq("e2_ann_buckets", "e3_embed_neardup")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"), s"$q: bucketed side computed twice")
      assert(!p.contains("BroadcastHashJoin"),
        s"$q: vector self-join must not assume a broadcastable side")
    }
  }

  test("t6/t7: corpus stats keep the scale-safe shapes (top-k lowering, " +
      "broadcast of the vocabulary side)") {
    assert(plan("t6_top_bigrams").contains("TakeOrderedAndProject"),
      "top-k bigrams materialized a global sort")
    val p = plan("t7_tfidf")
    assert(p.contains("BroadcastHashJoin"), "df/ndocs sides not broadcast")
  }

  test("o9: partition-column predicate prunes directories, not just rows") {
    val p = plan("o9_partitioned_write")
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      "event_type predicate did not become a partition filter:\n" + p.take(1500))
    // the predicate must NOT appear as a post-scan data filter
    assert(!p.contains("PushedFilters: [IsNotNull(event_type)"),
      "event_type still filtered row-by-row")
  }

  test("group-by aggregates are partial (map-side combine before shuffle)") {
    val p = plan("a3_group_sum")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "no partial aggregation")
  }

  test("semi/anti joins stay joins (no collected id lists in the plan)") {
    assert(plan("j4_anti_join").contains("LeftAnti"))
    assert(plan("j5_semi_join").contains("LeftSemi"))
  }

  test("round-7 curation queries keep equi-join / partial-agg shapes") {
    // c3: exploded-gram joins are equi-joins, never all-pairs
    val c3 = plan("c3_decontaminate")
    assert(!c3.contains("CartesianProduct"), "c3 degraded to a cartesian")
    // t12: both gram counts partial-aggregate before their shuffles
    val t12 = plan("t12_repetition")
    assert("HashAggregate".r.findAllIn(t12).length >= 4,
      "t12 lost map-side combine on a gram count")
    // d8: ledger probe is an equi-join, batch keep-first stays a window
    // partitioned by the hash (no single-partition window)
    val d8 = plan("d8_incremental_dedup")
    assert(!d8.contains("CartesianProduct"))
    assert(!d8.contains("SinglePartition"), "d8 window lost its hash partitioning")
    // c4/e5 are pure map-side projections until their final tiny agg/sort:
    // no join operator may appear at all
    for (q <- Seq("c4_mixture_sample", "e5_quantize")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew an unexpected join")
    }
  }

  test("w9: bounded top-k aggregator partial-aggregates before the shuffle") {
    val p = plan("w9_topk_agg")
    // two-level ObjectHashAggregate (partial on the map side, final after
    // the exchange) is the whole point — losing it means the shuffle
    // carries every row again, i.e. w2 with extra steps
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "top-k aggregation lost its partial/final split:\n" + p.take(1200))
    assert(p.contains("partial_topkagg"),
      "map-side partial top-k missing from the plan")
  }

  test("span/semantic dedup and chunking keep their scale shapes") {
    // d9: explode -> aggregate; the span aggregate partial-combines
    // map-side and there is no join at all
    val d9 = plan("d9_span_dedup")
    assert(!d9.contains("Join"), "d9 grew an unexpected join")
    assert("HashAggregate".r.findAllIn(d9).length >= 2,
      "d9 lost map-side partial aggregation")
    // e6: the within-cell pair join is a shuffled equi-join on cell_id,
    // never a cartesian. (The centroid routing IS a BroadcastNestedLoop —
    // an unconditioned expansion against the model-sized broadcast side,
    // the same probe shape e4 uses; only the corpus x corpus join must
    // never be all-pairs.)
    val e6 = plan("e6_semdedup")
    assert(!e6.contains("CartesianProduct"),
      "e6 pair generation degraded to a cartesian")
    assert(e6.contains("ShuffledHashJoin"),
      "e6 pair join lost its shuffled equi-join shape")
    // c5: scoring is map-side — no join anywhere; the only exchange
    // feeds the 10-row calibration rollup
    val c5 = plan("c5_quality_classifier")
    assert(!c5.contains("Join"), "c5 scoring grew a join")
    // c6: per-source rank window keyed by source, not a global window
    val c6 = plan("c6_domain_cap")
    assert(!c6.contains("SinglePartition"),
      "c6 window lost its per-source partitioning")
    // c7: global order lowers to TakeOrdered over the 50-row head, not a
    // full sort materialization
    val c7 = plan("c7_epoch_shuffle")
    assert(c7.contains("TakeOrderedAndProject"),
      "c7 head-of-order did not lower to TakeOrdered")
    // t13: map-side explode only — no join, exactly one exchange (the
    // output sort)
    val t13 = plan("t13_chunk")
    assert(!t13.contains("Join"), "t13 grew an unexpected join")
  }

  test("corpus maintenance/ranking queries keep their scale shapes") {
    // c8: the bloom probe is a map-side native predicate (the sketch rides
    // in the task binary) — it must appear as might_contain in the plan,
    // and nothing may degrade to a cartesian
    val c8 = plan("c8_bloom_decontaminate")
    assert(c8.contains("might_contain"), "c8 lost the native bloom probe")
    assert(!c8.contains("CartesianProduct"), "c8 degraded to a cartesian")
    // u1: the MERGE is one anti-join on the key — no cartesian, no
    // broadcast of the corpus-derived change batch assumed
    val u1 = plan("u1_upsert")
    assert(u1.contains("LeftAnti"), "u1 lost its anti-join MERGE shape")
    assert(!u1.contains("CartesianProduct"))
    // u2: digests must be computed BELOW the full-outer join so the
    // shuffle carries (id, md5) and never document bodies
    // (logical plan, not executedPlan: AQE's wrapper node hides the join
    // from a physical collect)
    val u2 = SparkEntry.queries("u2_snapshot_diff")(spark, sfDir)
      .queryExecution.optimizedPlan
    val outerJoins = u2.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.FullOuter => j }
    assert(outerJoins.nonEmpty, "u2 lost its full-outer diff")
    outerJoins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name)
      assert(!carried.contains("text"),
        s"u2 full-outer join carries raw text: ${carried.mkString(",")}")
    }
    // g2: the final assembly joins the 25-row nation dim by broadcast;
    // the iterative ranks come off the runDense one-row fold (r18), so
    // no sort-merge anywhere
    val g2 = plan("g2_pagerank")
    assert(g2.contains("BroadcastHashJoin"), "g2 nation join not broadcast")
    assert(!g2.contains("SortMergeJoin"))
  }

  test("round-8 graph/temporal queries keep their scale shapes") {
    // g3: every join is an equi-join on edge endpoints — the triangle
    // enumeration must never degrade to a cartesian or nested-loop
    val g3 = plan("g3_triangle_count")
    assert(!g3.contains("CartesianProduct") && !g3.contains("NestedLoop"),
      "g3 triangle join degraded from equi-join")
    // d10: the fuzzy quadratic lives INSIDE the blocking band, the dim
    // side broadcasts (8 distinct band keys would cap a shuffle join at
    // 8 tasks), and the best-match reduction partial-aggregates
    val d10 = plan("d10_fuzzy_pairs")
    assert(!d10.contains("CartesianProduct"),
      "d10 fuzzy matching degraded to all-pairs")
    assert(d10.contains("BroadcastHashJoin"), "d10 band join not broadcast")
    assert(d10.contains("partial_min") || d10.contains("partial min"),
      "d10 best-match reduction lost its map-side combine:\n" + d10.take(1500))
    // a16: the per-user stats side is one row per user — it must
    // broadcast; the events side must not shuffle for the join
    val a16 = plan("a16_zscore_anomaly")
    assert(a16.contains("BroadcastHashJoin"), "a16 stats join not broadcast")
    // u3: one window over one shuffle on the natural key — no join at all
    val u3 = plan("u3_scd2_history")
    assert(u3.contains("Window"), "u3 lost its window shape")
    assert(!u3.contains("Join"), "u3 grew a join; SCD2 needs only a join-free window")
    // j14: the interval-overlap join must meet in the bucket equi-join,
    // never the nested-loop/cartesian Spark would plan for the raw
    // inequality condition
    val j14 = plan("j14_interval_overlap")
    assert(!j14.contains("CartesianProduct") && !j14.contains("NestedLoop"),
      "j14 degraded to an all-pairs interval join")
  }

  test("round-10 additions keep their scale shapes") {
    // m13: the top-20 popularity lowers to TakeOrdered (no global sort),
    // and the big val set is filtered by a broadcast LEFT-SEMI before
    // its distinct — the only full-width val shuffle is the user count
    val m13 = plan("m13_popularity_baseline")
    assert(m13.contains("TakeOrderedAndProject"),
      "m13 popularity top-k grew a global sort")
    assert(m13.contains("LeftSemi") && m13.contains("BroadcastHashJoin"),
      "m13 val filter lost its broadcast semi-join (val would shuffle)")
    assert(!m13.contains("CartesianProduct"))
    // a24: the per-group clip bounds broadcast back onto the stream —
    // the second pass must be map-side, never a shuffled join
    val a24 = plan("a24_winsorize")
    assert(a24.contains("BroadcastHashJoin"), "a24 bounds join not broadcast")
    assert(!a24.contains("CartesianProduct"))
    // a22: both dimension joins broadcast (customer, nation)
    val a22 = plan("a22_gini")
    assert(a22.contains("BroadcastHashJoin"), "a22 dim joins not broadcast")
    assert(!a22.contains("SortMergeJoin"), "a22 grew a shuffle join")
    // w14: two lag frames over ONE partitioned sort — join-free
    val w14 = plan("w14_backtest")
    assert(w14.contains("Window"), "w14 lost its window shape")
    assert(!w14.contains("Join"), "w14 grew a join; backtest is join-free")
    // j17: merge-streams nearest as-of — bracket frames over one
    // exchange, never an inequality join
    val j17 = plan("j17_nearest_asof")
    assert(j17.contains("Window"), "j17 lost its merge-streams shape")
    assert(!j17.contains("Join"), "j17 grew a join; nearest as-of is join-free")
    // e12: signatures are literal-array dot products over the scratch
    // read — join-free map-side work
    val e12 = plan("e12_random_projection")
    assert(!e12.contains("Join"), "e12 grew a join; projection is map-side")
    // t23/s12: pure partial-combining aggregates, join-free
    for (q <- Seq("t23_lexical_diversity", "s12_csv_quarantine")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q grew a join")
    }
    // g9/g10/g11/a23/c13/o17: equi-joins + reviewed scalar broadcasts
    // only — never a cartesian
    for (q <- Seq("g9_hits", "g10_degree_histogram", "g11_modularity",
        "a23_benford", "c13_temperature_mix", "o17_systematic_sample")) {
      assert(!plan(q).contains("CartesianProduct"),
        s"$q degraded to a cartesian product")
    }
  }

  test("round-11 additions keep their scale shapes") {
    // a25: one partial-combining aggregate over the fact table; both
    // dimension joins broadcast (supplier, nation)
    val a25 = plan("a25_ols_trend")
    assert(a25.contains("BroadcastHashJoin"), "a25 dim joins not broadcast")
    assert(!a25.contains("SortMergeJoin"), "a25 grew a shuffle join")
    assert(a25.contains("partial_sum") || a25.contains("partial sum"),
      "a25 sufficient statistics lost their map-side combine")
    // c14: the corpus probe is a broadcast LEFT-SEMI (the corpus must
    // stream past the eval gram set, never shuffle for the join)
    val c14 = plan("c14_ngram_contamination")
    assert(c14.contains("LeftSemi") && c14.contains("BroadcastHashJoin"),
      "c14 corpus probe lost its broadcast semi-join")
    assert(!c14.contains("CartesianProduct"))
    // t24: both global prefixes ride GlobalRank's range repartition —
    // never an unpartitioned window over the per-doc frame
    val t24 = plan("t24_heaps_law")
    assert(t24.toLowerCase.contains("rangepartitioning"),
      "t24 lost GlobalRank's range repartition:\n" + t24.take(1500))
    // g12: wedge enumeration stays equi-join; existing edges drop via
    // anti-join; top-100 lowers to TakeOrdered, not a global sort
    val g12 = plan("g12_common_neighbors")
    assert(!g12.contains("CartesianProduct") && !g12.contains("NestedLoop"),
      "g12 wedge join degraded from equi-join")
    assert(g12.contains("LeftAnti"), "g12 lost its existing-edge anti-join")
    assert(g12.contains("TakeOrderedAndProject"),
      "g12 top-100 grew a global sort")
    // w15: one user_id shuffle, then a map-side ordered fold — join-free
    val w15 = plan("w15_holt_winters")
    assert(!w15.contains("Join"), "w15 grew a join; the HW fold is join-free")
    // a27: both rankings ride GlobalRank's range repartition — never an
    // unpartitioned window over the per-part metric frame
    val a27 = plan("a27_rank_correlation")
    assert(a27.toLowerCase.contains("rangepartitioning"),
      "a27 lost GlobalRank's range repartition:\n" + a27.take(1500))
    // b2: region/nation/supplier broadcast; customer/orders stay
    // shuffle joins (fact-scale at SF — broadcasting them would be a
    // bench-scale lie); no cartesian anywhere
    val b2 = plan("b2_tpch_q5")
    assert(b2.contains("BroadcastHashJoin"), "b2 dim joins not broadcast")
    assert(!b2.contains("CartesianProduct") && !b2.contains("NestedLoop"))
    assert(b2.contains("partial_sum") || b2.contains("partial sum"),
      "b2 revenue aggregate lost its map-side combine")
    // f6: the stationary iteration runs over the materialized tiny
    // transition table — equi-joins + reviewed scalar broadcasts only
    assert(!plan("f6_markov_stationary").contains("CartesianProduct"),
      "f6 degraded to a cartesian product")
    // a28: both ECDF prefixes ride GlobalRank's range repartition
    val a28 = plan("a28_ks_test")
    assert(a28.toLowerCase.contains("rangepartitioning"),
      "a28 lost GlobalRank's range repartition:\n" + a28.take(1500))
    // g13: equi-joins + one partial-combining moment aggregate
    val g13 = plan("g13_assortativity")
    assert(!g13.contains("CartesianProduct") && !g13.contains("NestedLoop"),
      "g13 degraded from equi-join")
    assert(g13.contains("partial_sum") || g13.contains("partial sum"),
      "g13 moment sums lost their map-side combine")
    // d14: the pair join stays an equi-join over the materialized base
    val d14 = plan("d14_minhash_calibration")
    assert(!d14.contains("CartesianProduct") && !d14.contains("NestedLoop"),
      "d14 pair join degraded from equi-join")
    // a26/m14: equi-joins + reviewed tiny-frame broadcasts only
    for (q <- Seq("a26_chi_square", "m14_pr_curve")) {
      assert(!plan(q).contains("CartesianProduct"),
        s"$q degraded to a cartesian product")
    }
  }

  test("round-12 additions keep their scale shapes") {
    // a29/w16/c15: global rank/prefix rides GlobalRank's range
    // repartition — never an unpartitioned window over the data frame
    for (q <- Seq("a29_mann_whitney", "w16_changepoint",
        "c15_curriculum_phases")) {
      val p = plan(q)
      assert(p.toLowerCase.contains("rangepartitioning"),
        s"$q lost GlobalRank's range repartition:\n" + p.take(1500))
    }
    // w16/g14/t25/b3: the argmax/top-k lowers to TakeOrderedAndProject,
    // never a global sort of the candidate frame
    for (q <- Seq("w16_changepoint", "g14_clustering_coeff",
        "t25_bigram_lift", "b3_tpch_q3")) {
      assert(plan(q).contains("TakeOrderedAndProject"),
        s"$q top-k grew a global sort")
    }
    // b3: BOTH date brackets reach their parquet scans
    val b3 = plan("b3_tpch_q3")
    assert(b3.contains("LessThan(o_orderdate"),
      "b3 order-date bracket not pushed to the orders scan")
    assert(b3.contains("GreaterThan(l_shipdate"),
      "b3 ship-date bracket not pushed to the lineitem scan")
    assert(!b3.contains("CartesianProduct") && !b3.contains("NestedLoop"))
    // j18: the bloom probe evaluates as a predicate on the fact side
    // (map-side semi-join reduction), and the exact join is broadcast
    val j18 = plan("j18_bloom_filtered_join")
    assert(j18.contains("might_contain"),
      "j18 lost its bloom probe predicate:\n" + j18.take(1500))
    assert(j18.contains("BroadcastHashJoin"),
      "j18 exact join not broadcast")
    // sk2: the salt is in the first-stage grouping (pmod of the hash)
    // and both stages partial-aggregate before their shuffles
    val sk2 = plan("sk2_skew_salted_agg")
    assert(sk2.contains("pmod"), "sk2 lost its salt derivation")
    assert(sk2.contains("partial_count") || sk2.contains("partial count"),
      "sk2 distinct stage lost its map-side combine")
    // u8: CDC apply is ONE partial-combining aggregate — no window, no
    // join, no per-key sort of the fact table
    val u8 = plan("u8_cdc_apply")
    assert(u8.contains("partial_max") || u8.contains("partial max"),
      "u8 last-writer-wins lost its map-side combine")
    assert(!u8.contains("Window"), "u8 grew a window over the fact table")
    assert(!u8.contains("Join"), "u8 grew a join")
    // m15: pure map-side tiling — two Generates, no join at all
    val m15 = plan("m15_patch_grid")
    assert(m15.contains("Generate"), "m15 lost its explode tiling")
    assert(!m15.contains("Join"), "m15 grew a join")
    // g14: wedge enumeration stays equi-join over the shared edges
    val g14 = plan("g14_clustering_coeff")
    assert(!g14.contains("CartesianProduct") && !g14.contains("NestedLoop"),
      "g14 wedge join degraded from equi-join")
    // a30/f7/t26/a31/a32: partial-combining aggregates, no cartesian
    for (q <- Seq("a30_tukey_fences", "f7_cohort_ltv", "t26_hapax_ratio",
        "a31_cramers_v", "a32_two_proportion")) {
      assert(!plan(q).contains("CartesianProduct"),
        s"$q degraded to a cartesian product")
    }
  }

  test("m10: fold ranking is GlobalRank-shaped — no single-partition " +
      "window over the scored fold rows (VERDICT r8 #2)") {
    val p = plan("m10_cv")
    // the fold-row window must be partitioned (by GlobalRank's _gr_pid);
    // an unpartitioned spec would print windowspecdefinition(p_keep#...
    assert(!p.contains("windowspecdefinition(p_keep"),
      "m10's AUC rank regressed to an unpartitioned window over the " +
        "scored fold:\n" + p.take(1500))
    assert(p.toLowerCase.contains("rangepartitioning"),
      "m10's fold ranking lost GlobalRank's range repartition:\n" + p.take(1500))
  }

  test("w10: the hourly aggregate is computed once (materialized diamond)") {
    // grid derives from `hourly` and then left-joins back onto it; the
    // branches DIVERGE under column pruning (the grid side drops sv) so
    // exchange reuse can't dedup them — the query materializes hourly to
    // scratch instead. Invariant: the events parquet is scanned exactly
    // once; everything else reads the materialized aggregate.
    val df = SparkEntry.queries("w10_gap_fill")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    val eventScans = "events.parquet".r.findAllIn(p).length
    assert(eventScans == 0,
      s"w10's consumer plan re-scans events $eventScans time(s) — the " +
        "aggregate must come from the materialized hourly table:\n" + p.take(1500))
    assert(p.contains("w10_hourly"), "materialized hourly table missing from plan")
  }

  test("u4: the ledger merge scans events once (delta) — the base corpus " +
      "is never rescanned") {
    // incremental view maintenance's whole value: the merged plan reads
    // the persisted ledger parquet plus ONE events scan (the delta
    // partial-agg); a second events scan means the base recomputed.
    val p = plan("u4_agg_ledger")
    val eventScans = "events.parquet".r.findAllIn(p).length
    assert(eventScans == 1,
      s"u4 merge plan scans events $eventScans time(s), want exactly 1 " +
        "(the delta batch):\n" + p.take(1500))
    assert(p.contains("u4_ledger"), "persisted ledger missing from plan")
  }

  test("w2: per-key top-N lowers to partial+final WindowGroupLimit — " +
      "the shuffle carries <= k rows per key per map partition") {
    // Spark 4's WindowGroupLimit pushes the rank <= k predicate below the
    // exchange: each map partition keeps its own top-k per key (Partial)
    // before the shuffle, and the reduce side finishes (Final). Without
    // it the exchange carries EVERY row of every key — the difference
    // between k rows and a key's full history at warehouse scale.
    val p = plan("w2_topk_per_key")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined,
      "w2 lost the map-side (Partial) group limit:\n" + p.take(1500))
    assert("WindowGroupLimit.*Final".r.findFirstIn(p).isDefined,
      "w2 lost the reduce-side (Final) group limit:\n" + p.take(1500))
  }

  test("a18: sketch state partial-aggregates map-side and quantile " +
      "windows are key-partitioned") {
    val p = plan("a18_ddsketch_quantiles")
    assert(!p.contains("windowspecdefinition(bucket"),
      "a18's cumulative walk lost its key partitioning:\n" + p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial count"),
      "bucket counts must partial-aggregate before the shuffle:\n" + p.take(1500))
  }

  test("t18: retrieval keeps the broadcast + top-k shape (no global sort, " +
      "no shuffled query-term join)") {
    val p = plan("t18_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "t18's top-20 materialized a global sort:\n" + p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "the 3-row query-term side must broadcast:\n" + p.take(1500))
  }

  test("j15: both bracket frames run over ONE user_id exchange (merge-" +
      "streams shape, no second shuffle between the windows)") {
    val p = plan("j15_interp_asof")
    val shuffles = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(p).length
    assert(shuffles == 1,
      s"j15 should shuffle on user_id exactly once, saw $shuffles:\n" +
        p.take(1500))
  }

  test("round-13 TPC-H faces keep their scale shapes (b4 scan+agg, " +
      "b5 single lineitem pass + TakeOrdered)") {
    // b4 (Q1): date bracket pushed to the scan, pruned ReadSchema, and
    // the 8 aggregates partial-combine map-side — the one-pass pure-
    // codegen shape; a second lineitem scan or a missing partial agg is
    // a 100 TB regression
    val p4 = plan("b4_tpch_q1")
    assert(p4.contains("LessThanOrEqual(l_shipdate"),
      "b4's shipdate bracket no longer reaches the parquet scan:\n" +
        p4.take(1500))
    assert(!p4.contains("l_orderkey"),
      "b4 reads columns its projection doesn't need:\n" + p4.take(1500))
    assert(p4.contains("partial_sum"),
      "b4's aggregates lost map-side combine:\n" + p4.take(1500))
    assert("lineitem.parquet".r.findAllIn(p4).length == 1,
      "b4 must scan lineitem exactly once")
    // b5 (Q18): the classic form joins lineitem twice (HAVING subquery +
    // outer re-sum); this plan aggregates it exactly once, keeps the
    // > 300 filter ON the aggregate (after partial combine), and lowers
    // top-100 to TakeOrderedAndProject
    val df5 = SparkEntry.queries("b5_tpch_q18")(spark, sfDir)
    df5.collect()
    // AQE prints final + initial plans; count scans in the FINAL one only
    val p5 = df5.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("lineitem.parquet".r.findAllIn(p5).length == 1,
      "b5 must scan lineitem exactly once (no second pass to re-sum):\n" +
        p5.take(1500))
    assert(p5.contains("partial_sum"),
      "b5's per-order quantity sum lost map-side combine")
    assert(p5.contains("TakeOrderedAndProject"),
      "b5's top-100 materialized a global sort:\n" + p5.take(1500))
    assert(!p5.contains("CartesianProduct"))
  }

  test("a37: all eleven CUPED statistics ride one fact pass — events is " +
      "scanned exactly twice (cutoff min/max + per-user aggregate)") {
    // ADVICE r13: separate st/va/vb frames recomputed the per-user
    // aggregate three times, so the returned plan scanned events four
    // times; the conditional-aggregate form costs exactly two scans
    val p = plan("a37_cuped")
    val eventScans = "events.parquet".r.findAllIn(p).length
    assert(eventScans == 2,
      s"a37 scans events $eventScans time(s), want exactly 2 " +
        "(cutoff + fact pass):\n" + p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "a37's sufficient statistics lost map-side combine")
  }

  test("round-14 TPC-H faces keep their scale shapes (b6 pure pushed " +
      "scan, b7 broadcast dimension, b8 TakeOrdered top-20)") {
    // b6 (Q6): all three predicates reach the scan; one pass, one
    // partial-combined accumulator — the I/O-bound lower bound
    val p6 = plan("b6_tpch_q6")
    // (the PushedFilters display truncates, so the quantity predicate is
    // asserted via the scan's DataFilters text)
    assert(p6.contains("GreaterThanOrEqual(l_shipdate")
      && p6.contains("IsNotNull(l_quantity") && p6.contains("< 24.0"),
      "b6's date/quantity predicates no longer reach the parquet scan:\n" +
        p6.take(1500))
    assert("lineitem.parquet".r.findAllIn(p6).length == 1,
      "b6 must scan lineitem exactly once")
    assert(p6.contains("partial_sum"),
      "b6's accumulator lost map-side combine")
    assert(!p6.contains("l_orderkey"),
      "b6 reads columns its aggregate doesn't need:\n" + p6.take(1500))
    // b7 (Q14): part is the broadcast dimension; the month bracket is
    // pushed; lineitem scanned once
    val p7 = plan("b7_tpch_q14")
    assert(p7.contains("BroadcastHashJoin"),
      "b7's part dimension join lost its broadcast:\n" + p7.take(1500))
    assert(p7.contains("GreaterThanOrEqual(l_shipdate"),
      "b7's month bracket no longer reaches the lineitem scan")
    assert("lineitem.parquet".r.findAllIn(p7).length == 1,
      "b7 must scan lineitem exactly once")
    // b8 (Q10): returnflag + order-date brackets pushed, top-20 lowers
    // to TakeOrderedAndProject, no cartesian
    val p8 = plan("b8_tpch_q10")
    assert(p8.contains("EqualTo(l_returnflag,R)"),
      "b8's returnflag filter no longer reaches the lineitem scan:\n" +
        p8.take(1500))
    assert(p8.contains("GreaterThanOrEqual(o_orderdate"),
      "b8's quarter bracket no longer reaches the orders scan")
    assert(p8.contains("TakeOrderedAndProject"),
      "b8's top-20 materialized a global sort:\n" + p8.take(1500))
    assert(!p8.contains("CartesianProduct"))
  }

  test("round-14 additions keep their scale shapes (a39 one distinct + " +
      "agg, w19 calendar-bounded broadcast pairs, m17 two fact passes, " +
      "g15 top-k lowering, c17 no cartesian)") {
    // a39: ONE events scan — distinct(user_id) partial-aggregates
    // map-side, then a one-row conditional aggregate; no joins
    val pA = plan("a39_srm")
    assert("events.parquet".r.findAllIn(pA).length == 1,
      "a39 must scan events exactly once:\n" + pA.take(1500))
    assert(pA.contains("partial_count") || pA.contains("HashAggregate"),
      "a39's distinct lost its partial aggregation")
    assert(!pA.contains("CartesianProduct"))
    // w19: the daily compression runs at CONSTRUCTION into scratch; the
    // consumer plan (pair join, histogram, day count) reads the
    // calendar-bounded parquet only, and the pair join is a BROADCAST
    // (never a shuffled/cartesian product)
    val pW = plan("w19_theil_sen")
    assert("events.parquet".r.findAllIn(pW).length == 0,
      "w19's consumer plan re-scans events — the daily level must come " +
        "from the materialized scratch parquet:\n" + pW.take(1500))
    assert(pW.contains("w19_daily"),
      "materialized daily table missing from w19's plan")
    assert(!pW.contains("CartesianProduct"),
      "w19's pair join degraded to a cartesian product")
    assert(pW.contains("BroadcastNestedLoopJoin"),
      "w19's d1 < d2 pair join must ride the broadcast daily frame")
    // m17: exactly two fact passes (1-row cmax + the binned aggregate)
    val pM = plan("m17_calibration")
    assert("events.parquet".r.findAllIn(pM).length == 2,
      "m17 must scan events exactly twice (cmax + binning):\n" +
        pM.take(1500))
    assert(pM.contains("partial_sum"),
      "m17's per-bin sums lost map-side combine")
    // g15: top-100 lowers to TakeOrderedAndProject; candidate self-join
    // stays an equi-join
    val pG = plan("g15_link_prediction")
    assert(pG.contains("TakeOrderedAndProject"),
      "g15's top-100 materialized a global sort:\n" + pG.take(1500))
    assert(!pG.contains("CartesianProduct") &&
      !pG.contains("BroadcastNestedLoopJoin"),
      "g15's joins must all stay equi-joins")
    // c17: the consumer plan reads the checkpointed labels, joins
    // documents with equi-joins only, and partial-aggregates per cluster
    val dfC = SparkEntry.queries("c17_survivor_quality")(spark, sfDir)
    val pC = dfC.queryExecution.executedPlan.toString
    assert(!pC.contains("CartesianProduct") &&
      !pC.contains("BroadcastNestedLoopJoin"),
      "c17's joins must all stay equi-joins")
    assert(pC.contains("partial_count") || pC.contains("partial_sum"),
      "c17's per-cluster ledger lost map-side combine")
    // c18: the two fact passes (cutoff + categories) run at
    // CONSTRUCTION into the materialized category frame; the consumer
    // plan (per-category rows + '~total' union) reads scratch only
    val pD = plan("c18_distribution_drift")
    assert("events.parquet".r.findAllIn(pD).length == 0,
      "c18's consumer plan re-scans events — the category frame must " +
        "come from the materialized scratch parquet:\n" + pD.take(1500))
    assert(pD.contains("c18_cat"),
      "materialized category table missing from c18's plan")
    // m18: the scored projection is materialized at construction — the
    // consumer plan reads scratch only, and the rank is GlobalRank's
    // range-partitioned two-phase pass, never one window partition over
    // the fact rows
    val pM18 = plan("m18_gains_table")
    assert("events.parquet".r.findAllIn(pM18).length == 0,
      "m18's consumer plan re-scans events — the scored frame must come " +
        "from the materialized scratch parquet:\n" + pM18.take(1500))
    assert(pM18.contains("m18_scored"),
      "materialized scored table missing from m18's plan")
    assert(pM18.toLowerCase.contains("rangepartitioning"),
      "m18's ranking lost GlobalRank's range repartition")
    // g16: the BFS rounds materialize — the consumer plan reads the
    // last round's scratch only, never replays the lineitem self-join
    val pG16 = plan("g16_harmonic_centrality")
    assert("lineitem.parquet".r.findAllIn(pG16).length == 0,
      "g16's consumer plan must read the round-3 scratch, not replay " +
        "the edge build:\n" + pG16.take(1500))
    assert(pG16.contains("g16_round3"),
      "materialized BFS round missing from g16's plan")
    assert(!pG16.contains("CartesianProduct"))
    // f9: the fact table feeds ONE per-user aggregate at CONSTRUCTION
    // (materialized lifetime table); the consumer plan reads only the
    // calendar-bounded scratch parquet — a fact scan here means the
    // lifetime aggregate is being recomputed per consumer
    val pF = plan("f9_survival_km")
    assert("events.parquet".r.findAllIn(pF).length == 0,
      s"f9's consumer plan re-scans events — the lifetime table must " +
        "come from the materialized scratch parquet:\n" + pF.take(1500))
    assert(pF.contains("f9_lt"),
      "materialized lifetime table missing from f9's plan")
    assert(!pF.contains("CartesianProduct"))
  }

  test("d16: anchor self-join computes the exploded side once and the " +
      "islands window is (pair, diagonal)-partitioned") {
    val df = SparkEntry.queries("d16_exact_substr")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"),
      "d16's anchor join degraded to a cartesian product")
    assert(p.contains("ReusedExchange") ||
      "documents.parquet".r.findAllIn(p).length <= 1,
      "the exploded anchor side must be computed once:\n" + p.take(1500))
    // the partition columns print INSIDE windowspecdefinition(...), so
    // losing them leaves `windowspecdefinition(pa#N ASC ...` — assert
    // the (pair, diagonal) columns lead the spec (a bare `()` can never
    // print; the first cut of this pin was vacuous)
    assert("windowspecdefinition\\(da#\\d+L, db#\\d+L, off#\\d+L, pa#".r
        .findFirstIn(p).isDefined,
      "d16's islands window lost its (pair, diagonal) partitioning:\n" +
        p.take(1500))
  }

  test("b9: the correlated scalar subquery decorrelates into ONE lineitem " +
      "scan — brand dimension broadcast, per-part window, no second fact pass") {
    val p = plan("b9_tpch_q17")
    assert("lineitem.parquet".r.findAllIn(p).length == 1,
      "b9 must scan lineitem exactly once (the window form computes the " +
        "per-part aggregate and the probe in one shuffle):\n" + p.take(1500))
    assert(p.contains("BroadcastHashJoin"),
      "b9's brand dimension join lost its broadcast:\n" + p.take(1500))
    assert(p.contains("Window"),
      "b9's per-part sum/count must ride a partitioned window")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "b9 must not shuffle a second fact side:\n" + p.take(1500))
  }

  test("d17: same-doc anchor join reuses one exploded exchange and the " +
      "islands window is (doc, diagonal)-partitioned") {
    val df = SparkEntry.queries("d17_self_repeats")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"),
      "d17's anchor join degraded to a cartesian product")
    assert(p.contains("ReusedExchange") ||
      "documents.parquet".r.findAllIn(p).length <= 1,
      "the exploded anchor side must be computed once:\n" + p.take(1500))
    // same non-vacuous form as d16's pin: the (doc, diagonal) partition
    // columns must lead the printed window spec
    assert("windowspecdefinition\\(doc#\\d+L, off#\\d+L, pa#".r
        .findFirstIn(p).isDefined,
      "d17's islands window lost its (doc, diagonal) partitioning:\n" +
        p.take(1500))
  }

  test("b10/b11/b12/w20 keep their scale shapes (disjunction implications " +
      "pushed, zero-fact-scan max consumer, anti-join + 1-row threshold, " +
      "partial min_by/max_by)") {
    // b10 (Q19): the per-side implications of the three-band disjunction
    // reach BOTH scans — quantity envelope + band-OR on lineitem, the
    // (brand, size) OR on part — and the join stays a broadcast equi-join
    // with the full disjunction as residual
    val p10 = plan("b10_tpch_q19")
    assert(p10.contains("LessThanOrEqual(l_quantity,30.0)"),
      "b10's quantity envelope no longer reaches the lineitem scan:\n" +
        p10.take(1500))
    assert(p10.contains("Or(Or(And(EqualTo(p_brand,Brand#12)"),
      "b10's (brand, size) disjunction no longer reaches the part scan")
    assert(p10.contains("BroadcastHashJoin") &&
      !p10.contains("CartesianProduct"),
      "b10's join must stay a broadcast equi-join")
    assert("lineitem.parquet".r.findAllIn(p10).length == 1,
      "b10 must scan lineitem exactly once")
    // b11 (Q15): the consumer plan reads the materialized per-supplier
    // ledger — the fact table is never rescanned for max or equality
    val p11 = plan("b11_tpch_q15")
    assert("lineitem.parquet".r.findAllIn(p11).length == 0,
      "b11's consumer plan re-scans lineitem — the revenue ledger must " +
        "come from the materialized scratch parquet:\n" + p11.take(1500))
    assert(p11.contains("b11_rev"),
      "materialized revenue ledger missing from b11's plan")
    assert(p11.contains("BroadcastHashJoin"),
      "b11's winner/supplier joins must broadcast the tiny sides")
    // b12 (Q22): two customer passes (threshold + probe), date-bracketed
    // anti-join, 1-row threshold broadcast
    val p12 = plan("b12_tpch_q22")
    assert("customer.parquet".r.findAllIn(p12).length == 2,
      "b12 must scan customer exactly twice (threshold + probe):\n" +
        p12.take(1500))
    assert(p12.contains("LeftAnti"),
      "b12's NOT EXISTS must stay a distributed anti-join")
    assert(p12.contains("GreaterThanOrEqual(o_orderdate"),
      "b12's quarter bracket no longer reaches the orders scan")
    assert(p12.contains("BroadcastNestedLoopJoin"),
      "b12's 1-row threshold must ride a broadcast")
    // b13 (Q7): two-year bracket pushed to the lineitem scan, both
    // nation lookups broadcast, one lineitem scan, no cartesian
    val p13 = plan("b13_tpch_q7")
    assert(p13.contains("GreaterThanOrEqual(l_shipdate"),
      "b13's two-year bracket no longer reaches the lineitem scan:\n" +
        p13.take(1500))
    assert("lineitem.parquet".r.findAllIn(p13).length == 1,
      "b13 must scan lineitem exactly once")
    assert("BroadcastHashJoin".r.findAllIn(p13).length >= 3,
      "b13's supplier/nation lookups lost their broadcasts:\n" +
        p13.take(1500))
    assert(!p13.contains("CartesianProduct"))
    // w20: one events scan; min_by/max_by partial-aggregate map-side so
    // the shuffle carries one candle per group per map partition
    val pW = plan("w20_ohlc_candles")
    assert("events.parquet".r.findAllIn(pW).length == 1,
      "w20 must scan events exactly once:\n" + pW.take(1500))
    assert(pW.contains("partial_min_by") && pW.contains("partial_max_by"),
      "w20's open/close selection lost map-side combine")
    assert(!pW.contains("Window"),
      "w20 must stay a grouped aggregate, never a window over raw events")
  }

  test("b3's broadcast-less join is genuinely ADAPTIVE: AQE broadcasts a " +
      "measured-small side and keeps a measured-large side shuffled") {
    // 17809dc dropped b3's customer broadcast hint arguing AQE picks BHJ
    // when the filtered side measures small and a shuffle join when it
    // doesn't. This pins BOTH halves on real runtime statistics: same
    // query shape, same session confs, only the DATA size differs.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // static planning must NOT pre-broadcast (initial plan = shuffle
      // join for both cases); only AQE's runtime measurement decides
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "32768")
      val dir = graft.Scratch.dir(spark, "aqe_law")
      val fact = spark.range(0, 20000)
        .select(col("id").as("k"), (col("id") % 97).as("v"))
      fact.write.mode("overwrite").parquet(s"$dir/fact")
      def run(rows: Long, pad: Int) = {
        spark.range(0, rows)
          .select(col("id").as("k"),
            concat_ws("", Seq.fill(pad)(lit("x")): _*).as("payload"))
          .write.mode("overwrite").parquet(s"$dir/dim")
        val joined = spark.read.parquet(s"$dir/fact")
          .join(spark.read.parquet(s"$dir/dim"), "k")
          .groupBy(col("v")).agg(count(lit(1)).as("n"))
        joined.collect()
        joined.queryExecution.executedPlan.toString
      }
      // half 1: a side AQE measures at a few KB -> runtime BHJ
      val small = run(rows = 50, pad = 8)
      assert(small.contains("BroadcastHashJoin"),
        "AQE failed to broadcast a measured-small side:\n" + small.take(1500))
      // half 2: the same side inflated past the adaptive threshold ->
      // the join must STAY a shuffle join (this is the half nothing
      // tested before: a hard-coded broadcast hint would ship this to
      // every executor no matter what it weighs)
      val large = run(rows = 20000, pad = 200)
      assert(!large.contains("BroadcastHashJoin"),
        "AQE broadcast a side that measures past the threshold:\n" +
          large.take(1500))
      assert(large.contains("SortMergeJoin") ||
        large.contains("ShuffledHashJoin"), large.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("b14/b15/b16 keep their scale shapes (semi-join with cross-side " +
      "residual, pushed brackets, outer join with on-clause filter)") {
    // b14 (Q4): the quarter bracket reaches the orders scan; the EXISTS
    // stays ONE left-semi join (never a count(*) > 0 aggregate) with
    // the 60-day lateness predicate riding it as a residual; each fact
    // table is scanned exactly once
    val p14 = plan("b14_tpch_q4")
    assert(p14.contains("GreaterThanOrEqual(o_orderdate"),
      "b14's quarter bracket no longer reaches the orders scan:\n" +
        p14.take(1500))
    assert(p14.contains("LeftSemi"),
      "b14's EXISTS must stay a left-semi join:\n" + p14.take(1500))
    assert("lineitem.parquet".r.findAllIn(p14).length == 1
      && "orders.parquet".r.findAllIn(p14).length == 1,
      "b14 must scan each fact table exactly once")
    assert(!p14.contains("CartesianProduct"))
    // b15 (Q12): the year bracket reaches the lineitem scan; one
    // equi-join with the lateness residual; the dual CASE counts
    // partial-aggregate map-side
    val p15 = plan("b15_tpch_q12")
    assert(p15.contains("GreaterThanOrEqual(l_shipdate"),
      "b15's year bracket no longer reaches the lineitem scan:\n" +
        p15.take(1500))
    assert("lineitem.parquet".r.findAllIn(p15).length == 1
      && "orders.parquet".r.findAllIn(p15).length == 1,
      "b15 must scan each fact table exactly once")
    assert(p15.contains("partial_count"),
      "b15's dual counts lost map-side combine")
    assert(!p15.contains("CartesianProduct"))
    // b16 (Q13): the priority selection pushes to the orders scan even
    // under the outer join (it filters the JOIN's right side, not
    // post-join rows); the join must STAY outer (an inner join would
    // silently drop the zero-order bucket); customer scanned once
    val p16 = plan("b16_tpch_q13")
    assert(p16.contains("LeftOuter"),
      "b16's outer join degraded to inner — zero-order customers lost:\n" +
        p16.take(1500))
    assert(p16.contains("EqualTo(o_orderpriority,1-URGENT)"),
      "b16's priority selection no longer reaches the orders scan")
    assert("customer.parquet".r.findAllIn(p16).length == 1
      && "orders.parquet".r.findAllIn(p16).length == 1,
      "b16 must scan each table exactly once")
    assert(!p16.contains("CartesianProduct"))
  }

  test("b17/b18 keep their scale shapes (five broadcast dimensions + " +
      "exact-ratio aggregate; single-shuffle window decorrelation)") {
    // b17 (Q8): part/region-nation/supplier/nation lookups broadcast,
    // both fact brackets pushed, lineitem scanned once, no cartesian
    val p17 = plan("b17_tpch_q8")
    assert("BroadcastHashJoin".r.findAllIn(p17).length >= 4,
      "b17's dimension lookups lost their broadcasts:\n" + p17.take(2000))
    assert(p17.contains("EqualTo(p_type,ECONOMY)"),
      "b17's part-type filter no longer reaches the part scan")
    assert(p17.contains("GreaterThanOrEqual(o_orderdate"),
      "b17's two-year bracket no longer reaches the orders scan")
    assert("lineitem.parquet".r.findAllIn(p17).length == 1,
      "b17 must scan lineitem exactly once")
    assert(!p17.contains("CartesianProduct"))
    // b18 (Q21): status filter pushed to the orders scan; the dual
    // correlation rides per-order WINDOW counts (b9's discipline) over
    // the (order, supplier) reduction — one lineitem scan, one orders
    // scan, top-25 lowers to TakeOrderedAndProject
    val p18 = plan("b18_tpch_q21")
    assert(p18.contains("EqualTo(o_orderstatus,F)"),
      "b18's status filter no longer reaches the orders scan:\n" +
        p18.take(1500))
    assert("lineitem.parquet".r.findAllIn(p18).length == 1
      && "orders.parquet".r.findAllIn(p18).length == 1,
      "b18 must scan each fact table exactly once — the window form " +
        "replaces the textbook double self-join")
    assert(p18.contains("Window"),
      "b18's EXISTS/NOT-EXISTS counts must ride per-order windows")
    assert(p18.contains("TakeOrderedAndProject"),
      "b18's top-25 materialized a global sort")
    assert(!p18.contains("CartesianProduct"))
  }

  test("b19/b20/b21 keep their scale shapes (pushed name filter + " +
      "broadcast chains; blacklist anti-join; windowed dominance)") {
    // b19 (Q9): the LIKE pushes to the part scan as StringContains;
    // part/supplier/nation lookups broadcast; lineitem scanned once
    val p19 = plan("b19_tpch_q9")
    assert(p19.contains("StringContains(p_name,gear)"),
      "b19's name filter no longer reaches the part scan:\n" +
        p19.take(1500))
    assert("BroadcastHashJoin".r.findAllIn(p19).length >= 3,
      "b19's dimension lookups lost their broadcasts")
    assert("lineitem.parquet".r.findAllIn(p19).length == 1,
      "b19 must scan lineitem exactly once")
    assert(!p19.contains("CartesianProduct"))
    // b20 (Q16): size-IN reaches the part scan, the blacklist is a
    // broadcast LEFT ANTI, the distinct count partial-aggregates
    val p20 = plan("b20_tpch_q16")
    // (the PushedFilters display truncates with "...", so the size-IN
    // is pinned via the scan-adjacent Filter's predicate text)
    assert(p20.contains("IN (1,4,9,14,19,23,36,45)"),
      "b20's size-IN no longer reaches the part scan:\n" + p20.take(1500))
    assert(p20.contains("LeftAnti"),
      "b20's blacklist must stay an anti-join")
    assert("lineitem.parquet".r.findAllIn(p20).length == 1,
      "b20 must scan lineitem exactly once")
    assert(!p20.contains("CartesianProduct"))
    // b21 (Q20): the 1996 bracket and the PROMO filter reach their
    // scans; the dominance threshold rides a per-part window over the
    // (part, supplier) reduction; supplier side stays semi-joined
    val p21 = plan("b21_tpch_q20")
    assert(p21.contains("GreaterThanOrEqual(l_shipdate"),
      "b21's 1996 bracket no longer reaches the lineitem scan:\n" +
        p21.take(1500))
    assert(p21.contains("EqualTo(p_type,PROMO)"),
      "b21's part-type filter no longer reaches the part scan")
    assert(p21.contains("Window"),
      "b21's dominance threshold must ride a per-part window")
    assert("LeftSemi".r.findAllIn(p21).length >= 2,
      "b21's nation/dominant-set joins must stay semi-joins")
    assert(!p21.contains("CartesianProduct"))
  }

  test("b22/b23 keep their scale shapes (argmin window + TakeOrdered; " +
      "materialized ledger + one-row broadcast threshold)") {
    // b22 (Q2): part predicates pushed, all dimension lookups
    // broadcast, the argmin is a per-part window, top-100 lowers to
    // TakeOrderedAndProject, one lineitem scan
    val p22 = plan("b22_tpch_q2")
    assert(p22.contains("EqualTo(p_type,LARGE)")
      && p22.contains("LessThanOrEqual(p_size,10)"),
      "b22's part predicates no longer reach the part scan:\n" +
        p22.take(1500))
    assert("BroadcastHashJoin".r.findAllIn(p22).length >= 2,
      "b22's dimension lookups lost their broadcasts")
    assert(p22.contains("Window"),
      "b22's argmin must ride a per-part window")
    assert(p22.contains("TakeOrderedAndProject"),
      "b22's top-100 materialized a global sort")
    assert("lineitem.parquet".r.findAllIn(p22).length == 1,
      "b22 must scan lineitem exactly once")
    assert(!p22.contains("CartesianProduct"))
    // b23 (Q11): the consumer plan reads the materialized ledger — the
    // fact table is never rescanned for the total or the probe — and
    // the 1-row total rides a broadcast
    val p23 = plan("b23_tpch_q11")
    assert("lineitem.parquet".r.findAllIn(p23).length == 0,
      "b23's consumer plan re-scans lineitem — the per-part ledger " +
        "must come from the materialized scratch parquet:\n" +
        p23.take(1500))
    assert(p23.contains("b23_pv"),
      "materialized ledger missing from b23's plan")
    assert(p23.contains("BroadcastNestedLoopJoin"),
      "b23's 1-row total must ride a broadcast")
    assert(!p23.contains("CartesianProduct"))
  }

  test("m19: the AUC fold reads the materialized score-level parquet — " +
      "zero fact scans in the consumer plan (GlobalRank references its " +
      "input twice, so an unmaterialized aggregate would recompute)") {
    val p = plan("m19_roc_auc")
    assert("documents.parquet".r.findAllIn(p).length == 0,
      "m19's consumer plan re-scans documents — the score-level frame " +
        "must come from the materialized scratch parquet:\n" + p.take(1500))
    assert(p.contains("m19_lvl"),
      "materialized score-level table missing from m19's plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("e15: the overlap join reads the materialized top-k parquet — " +
      "the consumer plan never rescans embeddings (the pair pass runs " +
      "ONCE at construction, all four prefixes in one corpus stream)") {
    val p = plan("e15_matryoshka")
    assert("embeddings.parquet".r.findAllIn(p).length == 0,
      "e15's consumer plan re-scans embeddings — the ranked top-k must " +
        "come from the materialized scratch parquet:\n" + p.take(1500))
    assert(p.contains("e15_topk"),
      "materialized top-k table missing from e15's plan")
    assert(!p.contains("CartesianProduct"))
  }

  test("m20: metric algebra reads the materialized confusion matrix — " +
      "zero fact scans in the consumer plan, and the class axis stays a " +
      "full outer join (an inner would drop never-predicted classes)") {
    val p = plan("m20_multiclass_eval")
    assert("documents.parquet".r.findAllIn(p).length == 0,
      "m20's consumer plan re-scans documents — the (lang, pred) matrix " +
        "must come from the materialized scratch parquet:\n" + p.take(1500))
    assert(p.contains("m20_cm"),
      "materialized confusion matrix missing from m20's plan")
    assert(p.contains("FullOuter"),
      "m20's class axis degraded from a full outer join")
    assert(!p.contains("CartesianProduct"))
  }

  test("round-14 scan-census fixes hold: the GlobalRank/multi-consumer " +
      "aggregate frames are materialized — zero fact scans in each " +
      "consumer plan (the unmaterialized forms scanned 2-5x)") {
    // GlobalRank references its input twice (offsets + main side) and
    // most of these queries take a separate 1-row total off the same
    // frame — without the scratch cut the per-value/per-bin aggregate
    // recomputed per reference, silently multiplying fact scans
    val cases = Seq(
      ("a27_rank_correlation", "lineitem", "a27_m"),
      ("a28_ks_test", "events", "a28_bv"),
      ("a29_mann_whitney", "events", "a29_bv"),
      ("a30_tukey_fences", "events", "a30_bv"),
      ("w16_changepoint", "events", "w16_bins"),
      ("t15_vocab_coverage", "documents", "t15_voc"),
      ("t24_heaps_law", "documents", "t24_docs"),
      // d13's shingle table fed a lineage that MULTIPLIED its
      // references — 24 documents scans unmaterialized; a26/a31's
      // contingency frames recomputed per marginal — 10/6 scans
      ("d13_containment", "documents", "d13_sh"),
      ("a26_chi_square", "documents", "a26_obs"),
      ("a31_cramers_v", "documents", "a31_obs"))
    for ((q, fact, frame) <- cases) {
      val p = plan(q)
      assert(s"$fact.parquet".r.findAllIn(p).length == 0,
        s"$q's consumer plan re-scans $fact — the aggregate frame must " +
          s"come from the materialized scratch parquet:\n" + p.take(1500))
      assert(p.contains(frame),
        s"materialized frame $frame missing from $q's plan")
    }
    // f1's one-pass fold rewrite: the per-stage join chain planned
    // SEVEN event scans; the fold form is one scan, one shuffle
    val f1 = plan("f1_funnel")
    assert("events.parquet".r.findAllIn(f1).length == 1,
      "f1 must scan events exactly once (the ordered-fold form):\n" +
        f1.take(1500))
    assert(!f1.contains("Join"), "f1's fold form must be join-free")
    // third census pass: e11's candidate frame (21 embeddings scans
    // unmaterialized), m13's fact-fact interaction join (8+8), t17's
    // sketch + exact frames (8 documents scans) — all zero-fact-scan
    // consumers now; e13 keeps one probe pass per swept setting
    val e11 = plan("e11_mmr_diverse")
    assert("embeddings.parquet".r.findAllIn(e11).length == 0,
      "e11's consumer plan re-scans embeddings:\n" + e11.take(1500))
    assert(e11.contains("e11_cand"),
      "materialized candidate frame missing from e11's plan")
    val m13 = plan("m13_popularity_baseline")
    assert("lineitem.parquet".r.findAllIn(m13).length == 0
      && "orders.parquet".r.findAllIn(m13).length == 0,
      "m13's consumer plan re-runs the fact-fact join:\n" + m13.take(1500))
    assert(m13.contains("m13_inter"),
      "materialized interaction frame missing from m13's plan")
    val t17 = plan("t17_heavy_hitters")
    assert("documents.parquet".r.findAllIn(t17).length == 0,
      "t17's consumer plan re-tokenizes the corpus:\n" + t17.take(1500))
    assert(t17.contains("t17_sum") && t17.contains("t17_ex"),
      "materialized sketch/exact frames missing from t17's plan")
    val e13 = plan("e13_probe_sweep")
    assert("embeddings.parquet".r.findAllIn(e13).length <= 3,
      "e13 must scan embeddings at most once per swept probe setting:\n" +
        e13.take(1500))
    assert(e13.contains("e13_exact"),
      "materialized ground-truth pool missing from e13's plan")
  }

  test("f10: both aggregates read the materialized pair table (zero " +
      "event scans in the consumer plan) and the unfold is an explode, " +
      "never a day-grid cross join") {
    val p = plan("f10_stickiness")
    assert("events.parquet".r.findAllIn(p).length == 0,
      "f10's consumer plan re-scans events — the (user, day) pairs must " +
        "come from the materialized scratch parquet:\n" + p.take(1500))
    assert(p.contains("f10_ud"),
      "materialized pair table missing from f10's plan")
    assert(p.contains("Generate explode"),
      "f10's bounded unfold lost its explode")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "f10's window expansion degraded to a cross join")
  }
}
