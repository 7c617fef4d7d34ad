package graft

/** Shared machinery for the registry-wide fact-scan budget (VERDICT r14
  * top item). Round 14 fixed the multiplied-scan defect class three times
  * by HAND — d13 shipped at 24 documents scans and e11 at 21 before a
  * manual census caught them — so the census is now mechanical:
  * [[ScanBudgetSpec]] walks every registered query's executed plan, counts
  * scans of each FACT table, and compares against the committed per-query
  * budget table. [[ScanCensusMain]] regenerates the table when a query's
  * plan legitimately changes.
  */
object ScanCensus {

  /** The tables whose scan counts are budgeted: the ones that are
    * corpus-sized at 100 TB. Dimension tables (region/nation/customer/
    * supplier/part at their TPC-H ratios) are broadcast-sized and excluded
    * — re-reading a broadcast dim is noise, re-reading a fact is the
    * defect. Same table set as PlanSpec's census pins.
    */
  val Facts: Seq[String] =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  /** Scan count per fact table in an executed-plan string. Counting plan
    * OCCURRENCES of the source path (one per FileSourceScan node) is the
    * exact metric the round-14 manual census used: ReusedExchange dedups
    * an exchange subtree but a re-derived lineage plans a fresh scan node
    * each time, which is what this counts.
    */
  def counts(plan: String): Map[String, Int] =
    Facts.map(f => f -> s"$f\\.parquet".r.findAllIn(plan).length)
      .filter(_._2 > 0).toMap

  /** Compact committed form: "lineitem=1,orders=2"; "" = zero fact scans
    * (the query reads only dims, or its consumers read scratch parquet).
    */
  def render(c: Map[String, Int]): String =
    Facts.flatMap(f => c.get(f).map(n => s"$f=$n")).mkString(",")

  def parse(s: String): Map[String, Int] =
    if (s.isEmpty) Map.empty[String, Int]
    else s.split(',').map { kv =>
      val Array(k, v) = kv.split('=') : @unchecked
      k -> v.toInt
    }.toMap

  /** The 14 round-14 scan-census queries whose shared frames now ride
    * [[Scratch.cut]] (f1's fix was a join-free rewrite, not a cut, so it
    * has no live form to toggle). CutDifferentialSpec asserts the toggle
    * never changes results; CensusCrossoverExperiment measures the
    * materialize-vs-recompute crossover on exactly this set.
    */
  val censusCuts: Seq[String] = Seq(
    "a26_chi_square", "a27_rank_correlation", "a28_ks_test",
    "a29_mann_whitney", "a30_tukey_fences", "a31_cramers_v",
    "d13_containment", "e11_mmr_diverse", "e13_probe_sweep",
    "m13_popularity_baseline", "t15_vocab_coverage", "t17_heavy_hitters",
    "t24_heaps_law", "w16_changepoint")

  /** Every query that gained a [[Scratch.cut]] site in the round-15 budget
    * sweep (gram tables t7/t14/t18/t22/t25, histogram read-offs a24/a33,
    * g1's tag-map frame, the u-family change batches, the e-family query
    * frames, c19's histogram, w21's daily frame). CutDifferentialSpec
    * toggles these through `cutMaterialize=false` like the round-14 set
    * (ADVICE r15 — the 'toggle changes plans, never results' claim must
    * cover every cut call site, not just the 14 the crossover experiment
    * times). The grep-derived site list lives in the spec's coverage test.
    */
  val round15Cuts: Seq[String] = Seq(
    "a24_winsorize", "a33_mad_outliers", "c19_dedup_report",
    "e4_ann_ivf", "e7_pq_adc", "e8_ivfpq", "e9_ivf_maintain",
    "g1_dominant_tag", "t7_tfidf", "t14_unigram_surprisal", "t18_bm25",
    "t22_bigram_surprisal", "t25_bigram_lift",
    "u1_upsert", "u2_snapshot_diff", "u10_mor_read", "u11_log_compact",
    "w21_drawdown")

  /** The round-17 optimization cuts: EAGER builds shared by two queries
    * through [[Scratch.cutEager]] (the by-name variant — a plain cut's
    * by-value producer would re-run the build before the memo applied).
    * d7/c17 share the 10-round label propagation (`d7_comps`); t16/t21
    * share the 6-merge BPE training (`bpe6`). Same differential contract:
    * `cutMaterialize=false` restores the per-consumer rebuild and results
    * must be identical both ways.
    */
  val round17Cuts: Seq[String] = Seq(
    "c17_survivor_quality", "d7_dup_components",
    "t16_bpe_merges", "t21_bpe_encode",
    "g11_modularity", "g4_label_prop",
    // the shared LSH band frame (plain cut — the frame is lazy)
    "c11_quality_survivor", "d3_lsh_pairs", "d6_dedup_apply")

  /** Union of every cut-bearing query the differential must toggle. */
  val allCuts: Seq[String] = censusCuts ++ round15Cuts ++ round17Cuts

  /** Model-fitting queries whose construction executes training — the
    * WindowGuardSpec / JoinShapeGuardSpec skip-set rationale: their plan
    * shapes are owned by their dedicated specs (AlsSpec, SweepsSpec,
    * FoldInSpec, ...), and constructing each of them here would re-fit
    * models per guard suite. m10_cv IS budgeted (3-fold fit+eval is cheap
    * at sf0.001 and its 6 scans are the protocol, worth pinning).
    */
  val skip: Set[String] = Set(
    "m1_indexer_pipeline", "m3_ranking_metrics", "m4_als_recommend",
    "m5_als_rmse", "m6_item_similarity", "m7_sweep", "m8_grid", "m9_curve",
    "m11_rec_coverage", "m12_fold_in",
    // st* construction executes a full streaming drain (file source →
    // sink), and the RETURNED plan reads the sink, never a fact table —
    // the stream's single pass over the landing files is pinned by the
    // checkpoint contract (FileStreamSpec), not by a consumer-plan census
    "st1_stream_hourly", "st2_stream_dedup", "st3_stream_ingest",
    "st4_stream_cdc", "st5_stream_join", "st6_stream_session",
    "st7_stream_ewma", "st8_stream_heavy")
}

/** Regenerates ScanBudgetSpec's committed budget table:
  * {{{
  *   sbt "Test/runMain graft.ScanCensusMain"
  * }}}
  * prints one `"name" -> "counts",` line per non-skipped registered query
  * (grep CENSUS). Paste the block into ScanBudgetSpec.budget after
  * REVIEWING every diff line — a count that went UP is exactly the defect
  * the budget exists to catch; regeneration is for reviewed plan changes,
  * not for making the spec pass.
  */
object ScanCensusMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !ScanCensus.skip(name)) {
      val c = scala.util.Try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        ScanCensus.render(ScanCensus.counts(p))
      }.getOrElse("ERROR")
      println(s"""CENSUS    "$name" -> "$c",""")
    }
    spark.stop()
  }
}
