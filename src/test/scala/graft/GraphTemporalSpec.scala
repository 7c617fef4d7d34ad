package graft

import org.apache.spark.sql.functions._

/** Laws for the round-8 graph/temporal block that the DuckDB oracle can't
  * express as cheaply: triangle counting vs a brute-force reference on a
  * hand-built graph, SCD2 interval algebra, gap-fill grid completeness,
  * and fuzzy-pair symmetry invariants. (The oracled queries themselves are
  * additionally hash-checked by the driver at sf0.01.)
  */
class GraphTemporalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("g3: brute-force triangle reference on a known graph") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant edge 4-5 (no new triangle)
    val edges = Seq((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5))
      .toDF("u", "v")
    val ab = edges.select($"u".as("a"), $"v".as("b"))
    val bc = edges.select($"u".as("b2"), $"v".as("c"))
    val ac = edges.select($"u".as("a2"), $"v".as("c2"))
    val tri = ab.join(bc, $"b" === $"b2")
      .join(ac, $"a" === $"a2" && $"c" === $"c2")
      .select($"a", $"b", $"c")
    assert(tri.count() === 4L) // C(4,3)
    // node 4 participates in 3 of them, node 5 in none
    val byNode = tri.select($"a".as("n")).union(tri.select($"b"))
      .union(tri.select($"c")).groupBy($"n").count()
      .as[(Int, Long)].collect().toMap
    assert(byNode(4) === 3L)
    assert(!byNode.contains(5))
  }

  test("g3 on sf0.001 emits canonical counts (each node's n_tri >= 1)") {
    val out = q("g3_triangle_count").collect()
    assert(out.forall(_.getLong(1) >= 1L))
    // ordered by n_tri desc then key
    val pairs = out.map(r => (r.getLong(1), r.getLong(0)))
    assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
  }

  test("u3: SCD2 intervals are contiguous, non-overlapping, one current per key") {
    val s = spark
    import s.implicits._
    val hist = q("u3_scd2_history").cache()
    try {
      // exactly one open (NULL valid_to) interval per customer
      val opens = hist.groupBy($"o_custkey")
        .agg(sum(when($"valid_to_us".isNull, 1).otherwise(0)).as("n_open"))
      assert(opens.filter($"n_open" =!= 1).isEmpty)
      // closed intervals chain: valid_to equals the next row's valid_from
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"valid_from_us", $"o_orderkey")
      val chained = hist
        .withColumn("next_from", lead($"valid_from_us", 1).over(w))
        .filter($"valid_to_us".isNotNull)
      assert(chained.filter($"valid_to_us" =!= $"next_from").isEmpty)
      // interval edges never invert
      assert(hist.filter($"valid_to_us".isNotNull
        && $"valid_to_us" < $"valid_from_us").isEmpty)
    } finally hist.unpersist()
  }

  test("w10: grid is dense (n_hours = span) and fill only adds, never drops") {
    val s = spark
    import s.implicits._
    val out = q("w10_gap_fill")
    assert(out.filter($"n_observed" > $"n_hours").isEmpty)
    assert(out.filter($"n_observed" < 1).isEmpty)
    // per-user span check against the raw table
    val hourly = Tables.events(spark, sfDir)
      .groupBy($"user_id", expr("ts div 3600000000000").as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy($"user_id")
      .agg((max($"h") - min($"h") + 1).as("span"), count(lit(1)).as("observed"))
    val joined = out.join(hourly, "user_id")
    assert(joined.filter($"n_hours" =!= $"span").isEmpty)
    assert(joined.filter($"n_observed" =!= $"observed").isEmpty)
  }

  test("a16: anomaly counts obey Chebyshev-ish sanity and sum to flags") {
    val s = spark
    import s.implicits._
    val out = q("a16_zscore_anomaly")
    // |z|>=2 can hold for at most 1/4 of a finite sample's points
    // (Chebyshev with the SAMPLE mean/sd is slightly looser; 30% margin)
    assert(out.filter($"n_anomalies" > $"n_events" * 0.3).isEmpty)
    assert(out.filter($"n_anomalies" < 0).isEmpty)
  }

  test("g4: labels converge to the component minimum on a toy triangle pair") {
    val s = spark
    import s.implicits._
    // two disjoint triangles; sync-LPA with min-label tie-break converges
    // each to its component's smallest id within two rounds
    val e = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6)).toDF("u", "v")
    val nb = e.select($"u".as("node"), $"v".as("nbr"))
      .union(e.select($"v", $"u"))
    var labels = nb.select($"node").distinct()
      .select($"node", $"node".as("label"))
    for (_ <- 1 to 3) {
      labels = nb
        .join(labels.select($"node".as("ln"), $"label"), $"nbr" === $"ln")
        .groupBy($"node", $"label").agg(count(lit(1)).as("cnt"))
        .groupBy($"node")
        .agg(min(struct(negate($"cnt"), $"label")).as("best"))
        .select($"node", $"best.label".as("label"))
    }
    val got = labels.as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 4 -> 4, 5 -> 4, 6 -> 4))
  }

  test("g4 on sf0.001: one label per node, labels are graph nodes") {
    val s = spark
    import s.implicits._
    val out = q("g4_label_prop").cache()
    try {
      assert(out.groupBy($"node").count().filter($"count" > 1).isEmpty)
      val nodes = out.select($"node")
      val labels = out.select($"label").distinct()
      assert(labels.exceptAll(nodes.distinct()).isEmpty,
        "a propagated label is not a node of the graph")
    } finally out.unpersist()
  }

  test("w11: EWMA is convex (inside each user's value range) and counts match") {
    val s = spark
    import s.implicits._
    val out = q("w11_ewma")
    val raw = Tables.events(spark, sfDir).groupBy($"user_id")
      .agg(count(lit(1)).as("n_raw"),
        min($"value").as("lo"), max($"value").as("hi"))
    val j = out.join(raw, "user_id")
    assert(j.filter($"n_events" =!= $"n_raw").isEmpty)
    // a convex combination of observed values cannot leave their range
    // (round(4) can nudge at most 5e-5 past an endpoint)
    assert(j.filter($"ewma" < $"lo" - 0.0001 || $"ewma" > $"hi" + 0.0001).isEmpty)
  }

  test("w11: the fold recurrence is exact on a hand-computed series") {
    val s = spark
    import s.implicits._
    // y = [1, 2, 3] at a=0.2: 1 -> 1.2 -> 1.56
    val toy = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0), (1L, 30L, 3L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")
    val y = toy.groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"ts", $"event_id", $"value"))).as("xs"))
      .select(aggregate(
        transform($"xs", x => x.getField("value")),
        lit(null).cast("double"),
        (acc, x) => coalesce(acc * lit(0.8) + lit(0.2) * x, x)).as("y"))
      .as[Double].head()
    assert(math.abs(y - 1.56) < 1e-12)
  }

  test("f1: funnel stages are ordered in time and consistent with nulls") {
    val s = spark
    import s.implicits._
    val out = q("f1_funnel").cache()
    try {
      // stage k implies stages < k: the null pattern must be a prefix
      assert(out.filter($"tc".isNotNull && $"tv".isNull).isEmpty)
      assert(out.filter($"tp".isNotNull && $"tc".isNull).isEmpty)
      // strict event-time ordering inside the funnel
      assert(out.filter($"tc".isNotNull && $"tc" <= $"tv").isEmpty)
      assert(out.filter($"tp".isNotNull && $"tp" <= $"tc").isEmpty)
      // stage agrees with the deepest non-null time
      assert(out.filter($"stage" === 3 && $"tp".isNull).isEmpty)
      assert(out.filter($"stage" === 2 && ($"tp".isNotNull || $"tc".isNull)).isEmpty)
      assert(out.filter($"stage" === 0 && $"tv".isNotNull).isEmpty)
      // one row per user seen in events
      val users = Tables.events(spark, sfDir).select($"user_id").distinct()
      assert(out.count() === users.count())
    } finally out.unpersist()
  }

  test("g5: BFS distances on a toy chain stop at the hop bound") {
    val s = spark
    import s.implicits._
    val e = Seq((1, 2), (2, 3), (3, 4), (4, 5), (5, 6)).toDF("u", "v")
    val nb = e.select($"u".as("node"), $"v".as("nbr"))
      .union(e.select($"v", $"u"))
    var dist = nb.select($"node").distinct().filter($"node" === 1)
      .select($"node", lit(0).as("dist"))
    for (_ <- 1 to 3) {
      val relaxed = nb
        .join(dist.select($"node".as("dn"), $"dist"), $"nbr" === $"dn")
        .select($"node", ($"dist" + 1).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"))
    }
    val got = dist.as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 0, 2 -> 1, 3 -> 2, 4 -> 3))
  }

  test("g5 on sf0.001: seeds at zero, neighbors triangle-inequality-consistent") {
    val s = spark
    import s.implicits._
    val out = q("g5_bfs").cache()
    try {
      assert(out.filter($"dist" < 0 || $"dist" > 3).isEmpty)
      assert(out.filter($"node" < 100 && $"dist" =!= 0).isEmpty,
        "a seed node's distance is not zero")
      assert(out.filter($"node" >= 100 && $"dist" === 0).isEmpty,
        "a non-seed node claims distance zero")
    } finally out.unpersist()
  }

  test("g6: weighted relaxation beats the fewest-hop path on a toy graph") {
    val s = spark
    import s.implicits._
    // 1-4 direct costs 25; 1-3-4 costs 1+1=2. BFS (hop metric) would take
    // the direct edge; weighted Bellman-Ford must not.
    val e = Seq((1, 2, 10L), (2, 4, 10L), (1, 3, 1L), (3, 4, 1L), (1, 4, 25L))
      .toDF("u", "v", "w")
    val nb = e.select($"u".as("node"), $"v".as("nbr"), $"w")
      .union(e.select($"v", $"u", $"w"))
    var dist = nb.select($"node").distinct().filter($"node" === 1)
      .select($"node", lit(0L).as("dist"))
    for (_ <- 1 to 3) {
      val relaxed = nb
        .join(dist.select($"node".as("dn"), $"dist"), $"nbr" === $"dn")
        .select($"node", ($"dist" + $"w").as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy($"node").agg(min($"dist").as("dist"))
    }
    val got = dist.as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 0L, 2 -> 10L, 3 -> 1L, 4 -> 2L))
  }

  test("g6 on sf0.001: seed/non-seed laws and BFS-consistency bound") {
    val s = spark
    import s.implicits._
    val out = q("g6_weighted_sssp").cache()
    try {
      assert(out.filter($"dist" < 0).isEmpty)
      assert(out.filter($"node" < 100 && $"dist" =!= 0).isEmpty,
        "a seed node's weighted distance is not zero")
      assert(out.filter($"node" >= 100 && $"dist" === 0).isEmpty,
        "a non-seed node claims distance zero")
      // every reached node is within 3 hops of a seed (same frontier as g5),
      // and each hop costs at most 500 (max cost: 1000 div 2)
      assert(out.filter($"dist" > 3L * 500L).isEmpty,
        "a weighted distance exceeds the 3-round x max-edge-cost bound")
    } finally out.unpersist()
  }

  test("j15: interpolation is convex (between brackets) and collapses at dt=0") {
    val s = spark
    import s.implicits._
    val out = q("j15_interp_asof").cache()
    try {
      assert(out.count() > 0)
      assert(out.filter(
        $"interp_cents" < least($"p_cents", $"n_cents") ||
          $"interp_cents" > greatest($"p_cents", $"n_cents")).isEmpty,
        "an interpolated value escaped its bracket")
      // a quote exactly at the click instant means interp == that quote
      assert(out.filter($"dt_prev_us" === 0 && $"interp_cents" =!= $"p_cents")
        .isEmpty)
      assert(out.filter($"dt_prev_us" < 0 || $"dt_next_us" <= 0).isEmpty,
        "bracket deltas must be >= 0 (prev) and > 0 (next)")
    } finally out.unpersist()
  }

  test("f3: paths are bounded at five steps and counts conserve users") {
    val s = spark
    import s.implicits._
    val out = q("f3_top_paths")
    val steps = out.withColumn("k",
      size(split($"path", ">", -1)))
    assert(steps.filter($"k" > 5 || $"k" < 1).isEmpty)
    // top-20 cut can't exceed the distinct-user total
    val users = Tables.events(spark, sfDir).select($"user_id").distinct().count()
    val total = out.agg(sum($"n_users")).as[Long].head()
    assert(total <= users)
  }

  test("f2: retention matrix laws (offset-0 totals, no negatives, user conservation)") {
    val s = spark
    import s.implicits._
    val out = q("f2_retention").cache()
    try {
      assert(out.filter($"week_offset" < 0 || $"n_active" < 1).isEmpty)
      // offset 0 row exists for every cohort and counts the whole cohort:
      // the per-cohort max active count is at offset 0 (every member is
      // active in their own first week by construction)
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"cohort_week")
      val bad = out.withColumn("mx", max($"n_active").over(w))
        .filter($"week_offset" === 0 && $"n_active" =!= $"mx")
      assert(bad.isEmpty, "a cohort's offset-0 row is not its maximum")
      // cohort sizes sum to the distinct user count
      val total = out.filter($"week_offset" === 0)
        .agg(sum($"n_active")).as[Long].head()
      val users = Tables.events(spark, sfDir)
        .select($"user_id").distinct().count()
      assert(total === users)
    } finally out.unpersist()
  }

  test("m10: CV folds partition the corpus and hold the distillation AUC floor") {
    val s = spark
    import s.implicits._
    val out = q("m10_cv").as[(Int, Long, Long, Double)].collect()
    assert(out.length === 3)
    assert(out.map(_._1).toSet == Set(0, 1, 2))
    // folds cover the featurized corpus exactly once
    val total = Tables.tokenizedDocs(spark, sfDir).count()
    assert(out.map(_._2).sum === total)
    out.foreach { case (fold, nTest, nPos, auc) =>
      assert(nPos > 0 && nPos < nTest, s"fold $fold is label-degenerate")
      // c5's distillation acceptance floor, held out-of-fold
      assert(auc >= 0.85, s"fold $fold AUC $auc below floor")
    }
  }

  test("p11: the battery reports every check exactly once, non-negative") {
    val s = spark
    import s.implicits._
    val out = q("p11_dq_checks").as[(String, Long)].collect().toMap
    assert(out.keySet == Set("orders_dup_pk", "orders_null_custkey",
      "orders_nonpositive_price", "lineitem_orphan", "lineitem_qty_range"))
    assert(out.values.forall(_ >= 0))
  }

  test("j14: overlap lengths are bounded by the shorter interval, pairs canonical") {
    val s = spark
    import s.implicits._
    val out = q("j14_interval_overlap").cache()
    try {
      // overlap of a 30-day and a 7-day window is within (0, 7]
      assert(out.filter($"overlap_days" < 1 || $"overlap_days" > 7).isEmpty)
      assert(out.filter($"a_key" % 997 =!= 0).isEmpty,
        "a non-campaign key leaked into the a side")
      assert(out.groupBy($"a_key", $"b_key").count().filter($"count" > 1).isEmpty,
        "bucket decomposition produced duplicate pairs")
    } finally out.unpersist()
  }

  test("a17: HLL estimates track exact counts and the union is consistent") {
    val s = spark
    import s.implicits._
    val out = q("a17_hll_distinct").cache()
    try {
      // lgK=12 (4096 registers) on a sub-100k cardinality: estimate
      // error is far inside 5% relative
      val bad = out.filter(
        abs($"n_approx" - $"n_exact") > greatest($"n_exact" * 0.05, lit(2.0)))
      assert(bad.isEmpty, s"estimate drifted: ${bad.collect().mkString}")
      // the merged row covers every per-source row (doc_id is a global PK)
      val g = out.filter($"source" === "__all__").select($"n_exact")
        .as[Long].head()
      val parts = out.filter($"source" =!= "__all__").agg(sum($"n_exact"))
        .as[Long].head()
      assert(g === parts)
    } finally out.unpersist()
  }

  test("d10: best matches are canonical, within-threshold, and find exact dups") {
    val s = spark
    import s.implicits._
    val out = q("d10_fuzzy_pairs").cache()
    try {
      assert(out.filter($"pk1" === $"best_pk2").isEmpty, "self-match leaked")
      assert(out.filter($"best_dist" > 2 || $"best_dist" < 0).isEmpty)
      assert(out.groupBy($"pk1").count().filter($"count" > 1).isEmpty,
        "entity resolved to more than one best match")
      // every part with an exact-duplicate name must resolve at dist 0:
      // blocking on the noun token cannot separate identical strings,
      // and nothing beats distance 0
      val named = Tables.part(spark, sfDir)
        .select($"p_partkey", $"p_name")
      val hasDup = named.as("x").join(named.as("y"),
          col("x.p_name") === col("y.p_name")
            && col("x.p_partkey") =!= col("y.p_partkey"))
        .select(col("x.p_partkey").as("pk1")).distinct()
      val zero = out.filter($"best_dist" === 0).select($"pk1")
      assert(hasDup.exceptAll(zero).isEmpty,
        "a part with an identical twin did not resolve at distance 0")
      assert(zero.exceptAll(hasDup).isEmpty,
        "a part without an identical twin scored distance 0")
    } finally out.unpersist()
  }
}
