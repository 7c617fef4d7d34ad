package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions._

/** Round-3 surface growth: skew-salted joins, sliding/running windows,
  * grouping sets, exact percentiles, and the corpus-statistics operators a
  * training-data pipeline runs after cleaning (vocabulary building, tf-idf
  * term weighting). Same contract as every other query module: each entry
  * is phrased so the identical arithmetic runs in the DuckDB oracle, ends
  * in a total order, and emits integer-scaled or grain-rounded numerics.
  */
object AdvancedQueries {
  import Tables._

  /** The 6-merge BPE table shared by t16 (the table IS its output) and t21
    * (the encoder replays it over the vocabulary). ONE definition — the
    * corpora, merge budget, and tie-break contract can't drift between the
    * two halves of the tokenizer pipeline — and the trained table rides
    * [[graft.Scratch.cutEager]] (r17): training is a driver-synchronized
    * EAGER build (6 argmax round-trips + checkpoint writes), so only the
    * by-name cut stops the second consumer from re-training the identical
    * table; each suite run pays training exactly once (t16 sorts first and
    * pays; t21 reads). `cutMaterialize=false` restores per-consumer
    * training; CutDifferentialSpec holds both forms row-identical.
    */
  private def bpe6Df(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.Scratch.cutEager(s, s"bpe6_${graft.Scratch.key(d)}") {
      import s.implicits._
      val wc = documents(s, d)
        .select(explode(tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      graft.operators.BpeTrainer
        .train(wc, "word", "cnt", merges = 6,
          checkpointDir = Some(graft.Scratch.dir(s, "bpe6_train")))
        .toDF()
    }

  /** [[bpe6Df]] as the in-order merge list t21's encode expression needs —
    * a ≤ 6-row scalar-class read-off (the merge table is bounded by the
    * merge budget, never by the corpus; same driver contract as the
    * trainer's own per-round argmax).
    */
  private def bpe6(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[graft.operators.BpeTrainer.Merge] =
    bpe6Df(s, d).collect()
      .map(r => graft.operators.BpeTrainer.Merge(
        r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pairCount")))
      .sortBy(_.step).toSeq

  val all: Seq[Q] = Seq(

    // SK1: salted join for pathologically skewed keys
    // (graft.operators.SkewJoin): the big side's hot keys are split across
    // n salt sub-keys, the small side is replicated n times, and the result
    // set is IDENTICAL to the plain join — which is exactly what the oracle
    // checks. AQE's runtime skew split is the first line of defense; this is
    // the plan-level fallback it can't always apply.
    Q("sk1_skew_salted_join",
      (s, d) => {
        val big = lineitem(s, d).select(col("l_partkey").as("pk"),
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        val small = part(s, d).select(col("p_partkey").as("pk"), col("p_brand"))
        graft.operators.SkewJoin
          .saltedInnerJoin(big, small, "pk",
            saltColumns = Seq("l_orderkey", "l_linenumber"), n = 4)
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // J10: the inequality join a SQL-text user writes, planned through
    // plans/RangeJoinRule — Spark's native plan for this shape is a
    // BroadcastNestedLoopJoin (or cartesian), O(|P| x |R|); the rule turns
    // it into the bucketed equi-join of j9 automatically. The rewrite is
    // applied at construction with an EXPLICIT width override — never by
    // set/unset of session conf, which (with the rule also injected into
    // the session optimizer by GraftExtensions) would leak the rewrite into
    // any query planned concurrently in that window. The extension wiring
    // itself is RangeJoinRuleSpec's job.
    Q("j10_range_join_rule",
      (s, d) => {
        val pts = events(s, d).select(col("event_id"), col("value"))
        val iv = region(s, d).select(col("r_regionkey"),
          (col("r_regionkey") * 20.0).as("lo"),
          (col("r_regionkey") * 20.0 + 30.0).as("hi"))
        val naive = pts.join(iv,
          col("value") >= col("lo") && col("value") < col("hi"))
        val rule = new graft.plans.RangeJoinRule(s, widthOverride = Some(10.0))
        val rewritten = rule(naive.queryExecution.analyzed)
        require(rewritten.toString.contains("sequence"), "range-join rule did not fire")
        org.apache.spark.sql.GraftBridge.ofRows(s, rewritten)
          .groupBy(col("r_regionkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
          .orderBy("r_regionkey")
      },
      Some("""SELECT r_regionkey, count(*) AS n, round(sum(value), 2) AS sv
             |FROM events JOIN region
             |  ON value >= r_regionkey * 20.0 AND value < r_regionkey * 20.0 + 30.0
             |GROUP BY r_regionkey ORDER BY r_regionkey""".stripMargin)),

    // J12: attribution join — every purchase paired with the same user's
    // clicks from the preceding hour. This is the BATCH face of
    // streaming/EventStream.attributedPurchases (the stream-stream interval
    // join): the same function body is oracled here against DuckDB and
    // stream==batch parity-tested in EventStreamSpec. Plan shape: equi-join
    // on user_id (hash-partitionable at any scale) + a time-range residual;
    // per-user pair count is bounded by the attribution window.
    Q("j12_attribution",
      (s, d) => {
        val ev = events(s, d).withColumn("ts", Tables.eventTime(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        graft.streaming.EventStream
          .attributedPurchases(clicks, purchases, "1 hour", 3600L)
          .select(col("user_id"), col("click_id"), col("purchase_id"),
            (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
              .as("gap_us"),
            round(col("value"), 2).as("v"))
          .orderBy("user_id", "click_id", "purchase_id")
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
             |  round(p.value, 2) AS v
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON c.user_id = p.user_id AND p.ts >= c.ts
             |  AND p.ts <= c.ts + INTERVAL 1 HOUR
             |ORDER BY c.user_id, click_id, purchase_id""".stripMargin)),

    // J13: NULL-SAFE equality join (`<=>` / IS NOT DISTINCT FROM) — the
    // join a pipeline needs when the key itself is legitimately null
    // ("no campaign", "unknown language") and null must MATCH null
    // instead of silently dropping those rows (plain equality never
    // matches null). Spark plans <=> as a regular hash join — same
    // shuffle shape as an equi-join, with null keys hashing to one
    // partition (a skew hazard at scale if nulls dominate — then salt or
    // split the null group; here the null group is one dim row).
    Q("j13_nullsafe_join",
      (s, d) => {
        // nullif: the 'click' rows get a NULL key — the unattributed group
        val ev = events(s, d).select(
          when(col("event_type") === "click", lit(null).cast("string"))
            .otherwise(col("event_type")).as("k"),
          col("value"))
        val dim = ev.select(col("k")).distinct()
          .select(col("k"), concat(lit("grp_"), coalesce(col("k"), lit("none"))).as("label"))
        ev.join(dim, ev("k") <=> dim("k"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
          .orderBy("label")
      },
      Some("""WITH ev AS (
             |  SELECT nullif(event_type, 'click') AS k, value FROM events
             |), dim AS (
             |  SELECT k, 'grp_' || coalesce(k, 'none') AS label
             |  FROM (SELECT DISTINCT k FROM ev)
             |)
             |SELECT label, count(*) AS n, round(sum(value), 2) AS sv
             |FROM ev JOIN dim ON ev.k IS NOT DISTINCT FROM dim.k
             |GROUP BY label ORDER BY label""".stripMargin)),

    // O10: Z-order key computation (operators/ZOrder) — the multi-column
    // layout key. The query oracles the bit-interleaving arithmetic
    // bit-for-bit against DuckDB (the write-side skipping effect itself is
    // ZOrderSpec's job, measured on parquet row-group scan counts).
    Q("o10_zorder_key",
      (s, d) => events(s, d)
        .select(col("event_id"),
          graft.operators.ZOrder
            .zkey(col("user_id"), floor(col("value")).cast("long"), 16)
            .as("zkey"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id,
              |  ${graft.operators.ZOrder.zkeySql("user_id",
                   "CAST(floor(value) AS BIGINT)", 16)} AS zkey
              |FROM events ORDER BY event_id""".stripMargin)),

    // P10: JSON column extraction — events.props is a JSON payload (the
    // semi-structured tail every event log carries). from_json with an
    // explicit schema parses it into a typed struct ONCE per row (versus
    // get_json_object re-parsing per extracted path); the aggregate is
    // oracled against DuckDB's json_extract.
    Q("p10_json_extract",
      (s, d) => events(s, d)
        .select(col("event_type"),
          from_json(col("props"), "k LONG", Map.empty[String, String])
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
          min(col("k")).as("mn"), max(col("k")).as("mx"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sk,
             |  min(json_extract(props, '$.k')::BIGINT) AS mn,
             |  max(json_extract(props, '$.k')::BIGINT) AS mx
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // J11: as-of join with TOLERANCE (pandas merge_asof `tolerance`) — the
    // latest prior purchase only counts if it happened within the last
    // hour. Discarding a too-old match is correct because the window
    // already picked the latest one; no closer match can exist. The oracle
    // is DuckDB's native ASOF JOIN with the same gap filter on top.
    Q("j11_asof_tolerance",
      (s, d) => {
        val ev = events(s, d).withColumn("ts", Tables.eventTime(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("src_id"))
        graft.operators.AsOfJoin
          .asOfInnerWithin(clicks, purchases, "user_id", "ts",
            Seq("src_id"), maxGapSeconds = 3600.0)
          .select(col("event_id"), col("user_id"), col("asof_src_id"))
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id, p.event_id AS asof_src_id
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |WHERE epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000::BIGINT
             |ORDER BY c.event_id""".stripMargin)),

    // W5: event-time SLIDING windows (2 h width, 1 h slide) — each event
    // lands in width/slide = 2 windows. Spark expands via its window()
    // generator; the oracle expands the same two epoch-aligned starts per
    // row. Same shuffle shape as a tumbling window, x(width/slide) rows.
    Q("w5_sliding_window",
      (s, d) => events(s, d)
        .withColumn("ts", Tables.eventTime(col("ts")))
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .select(col("window.start").cast("long").as("win_start"),
          col("event_type"), col("n"), col("sv"))
        .orderBy("win_start", "event_type"),
      Some("""WITH w AS (
             |  SELECT unnest([
             |      epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT - 3600,
             |      epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT]) AS win_start,
             |    event_type, value
             |  FROM events
             |)
             |SELECT win_start, event_type, count(*) AS n, round(sum(value), 2) AS sv
             |FROM w GROUP BY win_start, event_type
             |ORDER BY win_start, event_type""".stripMargin)),

    // W6: running total + lag — per-user cumulative value and
    // previous-event value over event time. The window is PARTITIONED by
    // user: state stays per-key and distributes, unlike a global-order
    // window. Frame pinned to ROWS on both sides ((ts, event_id) is unique,
    // so RANGE would be equal — but explicit is deterministic).
    Q("w6_running_total",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"))
          .withColumn("run_sv",
            round(sum(col("value")).over(
              w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
          .withColumn("prev_v", round(lag(col("value"), 1).over(w), 2))
          .select(col("user_id"), col("event_id"),
            round(col("value"), 2).as("v"), col("run_sv"), col("prev_v"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, round(value, 2) AS v,
             |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS UNBOUNDED PRECEDING), 2) AS run_sv,
             |  round(lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
             |    AS prev_v
             |FROM events ORDER BY user_id, event_id""".stripMargin)),

    // W8: trailing time-RANGE frame — "activity in the last hour" per
    // event, the classic feature-engineering window. RANGE (not ROWS)
    // semantics: the frame is defined by event-time distance, and peers
    // with the same timestamp are all included, which both engines agree
    // on deterministically. Partitioned by user: state distributes.
    Q("w8_trailing_window",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
          .rangeBetween(-3599, Window.currentRow)
        events(s, d)
          .withColumn("ts_sec", expr("ts div 1000000000"))
          .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"))
          .withColumn("n_1h", count(lit(1)).over(w))
          .withColumn("sv_1h", round(sum(col("value")).over(w), 2))
          .drop("value")
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS ts_sec,
             |  count(*) OVER w AS n_1h,
             |  round(sum(value) OVER w, 2) AS sv_1h
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000000000
             |  RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, event_id""".stripMargin)),

    // A14: CUBE (grouping sets) — segment x nation subtotals and grand
    // total in ONE Expand+aggregate pass instead of 4 scans. Null grouping
    // slots are labeled 'ALL' on both sides so the total order is unambiguous.
    Q("a14_cube",
      (s, d) => customer(s, d)
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("bal"))
        .select(coalesce(col("c_mktsegment"), lit("ALL")).as("seg"),
          coalesce(col("c_nationkey").cast("string"), lit("ALL")).as("nk"),
          col("n"), col("bal"))
        .orderBy("seg", "nk"),
      Some("""SELECT coalesce(c_mktsegment, 'ALL') AS seg,
             |  coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nk,
             |  count(*) AS n, round(sum(c_acctbal), 2) AS bal
             |FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
             |ORDER BY seg, nk""".stripMargin)),

    // A15: exact percentiles per group — Spark `percentile` and DuckDB
    // `quantile_cont` both linearly interpolate, so the values agree at the
    // rounding grain. The exact form is a full sort per group; t5's
    // percentile_approx sketch is the 100 TB path (rows-only there because
    // sketch internals are engine-specific — THIS row is its oracled twin).
    Q("a15_percentiles",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(round(percentile(col("value"), lit(0.25)), 3).as("p25"),
          round(percentile(col("value"), lit(0.5)), 3).as("p50"),
          round(percentile(col("value"), lit(0.75)), 3).as("p75"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.25), 3) AS p25,
             |  round(quantile_cont(value, 0.5), 3) AS p50,
             |  round(quantile_cont(value, 0.75), 3) AS p75
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // A24: winsorization (percentile clipping) — the robust-stats
    // TRANSFORM beside a15's percentile REPORT: clip each value into
    // [p5, p95] of its group before any mean-based feature touches it
    // (one fat-finger trade or bot burst otherwise owns the group mean —
    // w12's outlier rationale applied corpus-wide). Bounds are EXACT
    // LOWER order statistics selected by rank ((n+1)*k div 100, clamped)
    // on exact cents — no quantile interpolation, no float anywhere, so
    // clipped counts and the winsorized sum are exactly oracled.
    Q("a24_winsorize",
      (s, d) => {
        // round-15 rewrite onto a30/a33's histogram discipline: the
        // rank-based percentile VALUE at index i equals min{c: cum >= i}
        // under the (c, event_id) total order, so the whole query reads
        // off the cut per-(type, cents) histogram — one corpus scan, and
        // the per-type SORT OF THE CORPUS the row_number form planned
        // (with 3 scans) is gone; window state scales with the value
        // domain, clip counts and the winsorized sum weight histogram
        // masses
        val bv = graft.Scratch.cut(s, s"a24_bv_${graft.Scratch.key(d)}")(
          events(s, d)
            .select(col("event_type"),
              round(col("value") * 100).cast("long").as("c"))
            .groupBy(col("event_type"), col("c"))
            .agg(count(lit(1)).as("m"))
            // coalesce(1): bounded value-grid domain (a28's rationale)
            .coalesce(1))
        val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bv.withColumn("cm", sum(col("m")).over(w))
        val stats = bv.groupBy(col("event_type"))
          .agg(sum(col("m")).as("n"))
          .select(col("event_type"), col("n"),
            greatest(expr("(n + 1) * 5 div 100"), lit(1L)).as("ilo"),
            least(expr("(n + 1) * 95 div 100"), col("n")).as("ihi"))
        val bounds = cum.join(broadcast(stats), Seq("event_type"))
          .groupBy(col("event_type"), col("n"))
          .agg(min(when(col("cm") >= col("ilo"), col("c"))).as("lo_cents"),
            min(when(col("cm") >= col("ihi"), col("c"))).as("hi_cents"))
        bv.join(broadcast(bounds), Seq("event_type"))
          .groupBy(col("event_type"), col("n"),
            col("lo_cents"), col("hi_cents"))
          .agg(coalesce(sum(when(col("c") < col("lo_cents"), col("m"))),
              lit(0L)).as("n_clipped_lo"),
            coalesce(sum(when(col("c") > col("hi_cents"), col("m"))),
              lit(0L)).as("n_clipped_hi"),
            sum(col("m") * greatest(col("lo_cents"),
              least(col("hi_cents"), col("c")))).as("sum_winsorized_cents"))
          .select(col("event_type"), col("n"), col("lo_cents"),
            col("hi_cents"), col("n_clipped_lo"), col("n_clipped_hi"),
            col("sum_winsorized_cents"))
          .orderBy("event_type")
      },
      Some("""WITH cents AS (
             |  SELECT event_type, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), r AS (
             |  SELECT event_type, c,
             |    CAST(row_number() OVER (PARTITION BY event_type
             |      ORDER BY c, event_id) AS BIGINT) AS rk
             |  FROM cents
             |), st AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    greatest((count(*) + 1) * 5 // 100, 1) AS ilo,
             |    least((count(*) + 1) * 95 // 100, count(*)) AS ihi
             |  FROM cents GROUP BY event_type
             |), b AS (
             |  SELECT r.event_type, st.n,
             |    max(CASE WHEN r.rk = st.ilo THEN r.c END) AS lo_cents,
             |    max(CASE WHEN r.rk = st.ihi THEN r.c END) AS hi_cents
             |  FROM r JOIN st USING (event_type)
             |  GROUP BY r.event_type, st.n
             |)
             |SELECT c.event_type, b.n, b.lo_cents, b.hi_cents,
             |  CAST(sum(CASE WHEN c.c < b.lo_cents THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_clipped_lo,
             |  CAST(sum(CASE WHEN c.c > b.hi_cents THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_clipped_hi,
             |  CAST(sum(greatest(b.lo_cents, least(b.hi_cents, c.c)))
             |    AS BIGINT) AS sum_winsorized_cents
             |FROM cents c JOIN b USING (event_type)
             |GROUP BY c.event_type, b.n, b.lo_cents, b.hi_cents
             |ORDER BY c.event_type""".stripMargin)),

    // T23: lexical diversity (type-token ratio + hapax share) — the
    // vocabulary-richness quality gate beside t12's repetition shares
    // (Gopher-class filters use both: template/boilerplate text has LOW
    // diversity, keyboard-mash has pathologically HIGH hapax share).
    // Pure counting on the (doc, word) aggregate — one partial-combining
    // shuffle, integer-scaled ratios, exactly oracled.
    Q("t23_lexical_diversity",
      (s, d) => documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
        .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum((col("cnt") === 1).cast("long")).cast("long").as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("n_hapax"),
          expr("n_distinct * 10000 div n_tokens").as("ttr_x1e4"),
          expr("n_hapax * 10000 div n_distinct").as("hapax_x1e4"))
        .orderBy("doc_id"),
      Some("""WITH wc AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, word, count(*) AS cnt FROM wc GROUP BY 1, 2
             |)
             |SELECT doc_id,
             |  CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_hapax,
             |  CAST(count(*) AS BIGINT) * 10000
             |    // CAST(sum(cnt) AS BIGINT) AS ttr_x1e4,
             |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |    * 10000 // CAST(count(*) AS BIGINT) AS hapax_x1e4
             |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // T6: corpus top-k bigrams — vocabulary building, the first corpus-level
    // statistic a tokenizer-training pipeline computes. Explode is map-side;
    // the count is a partial-aggregated shuffle on the bigram; top-k lowers
    // to TakeOrderedAndProject (no global sort materialization).
    // The token array MUST be projected to its own column before shingling:
    // inlining tokens() into the shingles transform-lambda re-tokenizes the
    // document once per bigram (HOF lambdas get no CSE — O(tokens^2) per doc,
    // measured 6x slower at sf0.1 and a scale-killer on long documents).
    Q("t6_top_bigrams",
      (s, d) => documents(s, d)
        .select(tokens(col("text")).as("w"))
        .select(explode(shingles(col("w"), 2)).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("bigram"))
        .limit(20),
      Some("""WITH tok AS (
             |  SELECT string_split(lower(text), ' ') AS w FROM documents
             |), b AS (
             |  SELECT unnest([array_to_string(w[i:i+1], ' ')
             |    for i in range(1, len(w))]) AS bigram
             |  FROM tok
             |)
             |SELECT bigram, count(*) AS n FROM b
             |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin)),

    // T8: exact edit distance on candidate pairs — the precise verification
    // a near-dup pipeline runs AFTER banding narrowed the candidates
    // (levenshtein is O(len^2) per pair: affordable on candidates, never on
    // the cross product). Adjacent-id pairing gives the arithmetic an
    // oracle row without an all-pairs join, like d5.
    Q("t8_edit_distance",
      (s, d) => {
        val t = documents(s, d)
          .select(col("doc_id"), substring(lower(col("text")), 1, 40).as("t40"))
        t.as("a").join(t.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
            levenshtein(col("a.t40"), col("b.t40")).cast("long").as("edit_dist"))
          .orderBy("a_id")
      },
      Some("""SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  levenshtein(substr(lower(a.text), 1, 40),
             |    substr(lower(b.text), 1, 40)) AS edit_dist
             |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             |ORDER BY a_id""".stripMargin)),

    // W7: quantile bucketing — ntile + percent_rank per key, the sampling
    // primitive behind curriculum/quality-stratified training splits
    // ("keep the top quality quartile per language"). Partitioned window:
    // state distributes by key, no global sort.
    Q("w7_quantile_buckets",
      (s, d) => {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        events(s, d)
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("bucket", ntile(4).over(w).cast("long"))
          .withColumn("pr", round(percent_rank().over(w), 4))
          .select(col("event_type"), col("event_id"),
            round(col("value"), 2).as("v"), col("bucket"), col("pr"))
          .orderBy("event_type", "event_id")
      },
      Some("""SELECT event_type, event_id, round(value, 2) AS v,
             |  ntile(4) OVER w AS bucket,
             |  round(percent_rank() OVER w, 4) AS pr
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
             |ORDER BY event_type, event_id""".stripMargin)),

    // T7: tf-idf term weighting, top term per document. The document
    // frequency table is vocabulary-sized: often broadcastable, but at web
    // scale a 10-100M-term vocabulary is NOT — so the join is left
    // unhinted and AQE picks broadcast only when dfreq actually fits
    // (PlanSpec confirms it does here). ndocs is a broadcast scalar, never
    // a driver-side collect. idf is integer-scaled ((ndocs*10000) div df —
    // exact in both engines, no ln() cross-engine float risk; ln-idf is a
    // one-line swap in real use) so the oracle compare is bit-exact.
    Q("t7_tfidf",
      (s, d) => {
        // the tf table feeds dfreq AND the scoring join — cut (the gram
        // table discipline; uncut, each reference re-tokenized the corpus)
        val tf = graft.Scratch.cut(s, s"t7_tf_${graft.Scratch.key(d)}")(
          documents(s, d)
            .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
            .groupBy(col("doc_id"), col("term"))
            .agg(count(lit(1)).as("tf")))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val ndocs = documents(s, d).agg(count(lit(1)).as("nd"))
        tf.join(dfreq, Seq("term"))
          .crossJoin(broadcast(ndocs))
          .withColumn("idf_x1e4", floor(col("nd") * 10000L / col("df")).cast("long"))
          .withColumn("score", col("tf") * col("idf_x1e4"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id"))
              .orderBy(desc("score"), col("term"))))
          .filter(col("rn") === 1)
          .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
             |), dfreq AS (
             |  SELECT term, count(*) AS df FROM tf GROUP BY term
             |), nd AS (
             |  SELECT count(*) AS nd FROM documents
             |), s AS (
             |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             |    tf.tf * ((nd.nd * 10000) // dfreq.df) AS score
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
             |), r AS (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
             |  FROM s
             |)
             |SELECT doc_id, term, tf, df, score FROM r WHERE rn = 1
             |ORDER BY doc_id""".stripMargin)),

    // T14: unigram-LM surprisal filter — the CCNet/C4 perplexity gate's
    // shape: fit a unigram LM on the corpus itself (one aggregate), score
    // every document by mean token surprisal, keep the low-surprisal head.
    // Real pipelines use float log-probs from a trained LM; this query uses
    // the integer FREQUENCY CLASS floor(log2(total/cnt)) — computed as
    // length(bin(total div cnt)) - 1, bit-exact in both engines (the same
    // no-ln() discipline as t7's integer idf; a float KenLM score is a
    // one-line swap). Plan: vocabulary aggregate partial-combines map-side;
    // the corpus-total is a broadcast scalar, never a collect; the
    // token->vocab join is unhinted so AQE broadcasts only when the
    // vocabulary actually fits (t7's rule — a web-scale vocab does not).
    Q("t14_unigram_surprisal",
      (s, d) => {
        // the exploded token table feeds the vocabulary aggregate AND the
        // scoring join — cut (uncut, each reference re-tokenized)
        val toks = graft.Scratch.cut(s, s"t14_tok_${graft.Scratch.key(d)}")(
          documents(s, d)
            .select(col("doc_id"), explode(tokens(col("text"))).as("term")))
        val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        val total = vocab.agg(sum(col("cnt")).cast("long").as("total"))
        toks.join(vocab, Seq("term"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"),
            (length(bin(expr("total div cnt"))) - 1).cast("long").as("cls"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("cls")).as("scls"))
          .select(col("doc_id"), col("n_tokens"),
            expr("scls * 1000 div n_tokens").as("mean_surprisal_x1000"),
            (expr("scls * 1000 div n_tokens") <= 4100L).cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents
             |), vocab AS (
             |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
             |), tot AS (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab
             |), sc AS (
             |  SELECT t.doc_id, length(bin(tot.total // v.cnt)) - 1 AS cls
             |  FROM tok t JOIN vocab v USING (term) CROSS JOIN tot
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(sum(cls) * 1000 // count(*) AS BIGINT) AS mean_surprisal_x1000,
             |  CAST(sum(cls) * 1000 // count(*) <= 4100 AS INT) AS keep
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // T22: bigram conditional surprisal — t14 upgraded to the CONDITIONAL
    // language model real perplexity gates run (CCNet's KenLM is an
    // n-gram conditional LM; the unigram form can't see word-order
    // breakage): score every adjacent pair by the frequency class of
    // P(cur | prev) with add-one smoothing, floor(log2((c(prev) + V) /
    // (c(prev,cur) + 1))) — all integer (div then bin-length), t14's
    // no-ln() discipline extended to the smoothed conditional. A
    // reordered or word-salad document shares t14's unigram profile but
    // its bigrams fall off the conditional model — exactly what this
    // catches. Plan: one bigram-count aggregate and one unigram
    // aggregate (both partial-combining), V as a broadcast scalar, the
    // doc-bigram stream joins both tables on equi keys (unhinted — a
    // web-scale bigram table must be allowed to stay a shuffle join).
    Q("t22_bigram_surprisal",
      (s, d) => {
        // the token-array table feeds the bigram stream AND the unigram
        // aggregate, and the bigram stream feeds its own count AND the
        // scoring join — cut both (uncut, 4 corpus tokenizations planned)
        val toks = graft.Scratch.cut(s, s"t22_tok_${graft.Scratch.key(d)}")(
          Tables.tokenizedDocs(s, d).select(col("doc_id"), col("w")))
        val bg = graft.Scratch.cut(s, s"t22_bg_${graft.Scratch.key(d)}")(
          toks.select(col("doc_id"),
              explode(expr("transform(sequence(1, size(w) - 1), " +
                "i -> struct(w[i - 1] AS prev, w[i] AS cur))")).as("p"))
            .select(col("doc_id"), col("p.prev").as("prev"),
              col("p.cur").as("cur")))
        val uni = toks.select(explode(col("w")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("cu"))
        val vv = uni.agg(count(lit(1)).cast("long").as("v"))
        val bc = bg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("cb"))
        bg.join(bc, Seq("prev", "cur"))
          .join(uni.select(col("term").as("prev"), col("cu")), Seq("prev"))
          .crossJoin(broadcast(vv))
          .select(col("doc_id"),
            (length(bin(expr("(cu + v) div (cb + 1)"))) - 1).cast("long").as("cls"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("cls")).as("scls"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("scls * 1000 div n_bigrams").as("mean_surprisal_x1000"),
            (expr("scls * 1000 div n_bigrams") <= 4360L).cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, string_split(lower(text), ' ') AS w
             |  FROM documents WHERE len(string_split(lower(text), ' ')) >= 3
             |), uni AS (
             |  SELECT t AS term, count(*) AS cu FROM (
             |    SELECT unnest(w) AS t FROM tok) GROUP BY t
             |), vv AS (
             |  SELECT CAST(count(*) AS BIGINT) AS v FROM uni
             |), bg AS (
             |  SELECT doc_id, w[u.i - 1] AS prev, w[u.i] AS cur
             |  FROM tok, unnest(range(2, len(w) + 1)) AS u(i)
             |), bc AS (
             |  SELECT prev, cur, count(*) AS cb FROM bg GROUP BY 1, 2
             |), sc AS (
             |  SELECT g.doc_id,
             |    length(bin((u.cu + vv.v) // (b.cb + 1))) - 1 AS cls
             |  FROM bg g JOIN bc b ON g.prev = b.prev AND g.cur = b.cur
             |  JOIN uni u ON g.prev = u.term CROSS JOIN vv
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(sum(cls) * 1000 // count(*) AS BIGINT)
             |    AS mean_surprisal_x1000,
             |  CAST(sum(cls) * 1000 // count(*) <= 4360 AS INT) AS keep
             |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // T15: vocabulary coverage curve — the tokenizer-design question "how
    // much of the token stream do the top-k vocabulary entries cover?".
    // Both global ordered computations (rank of each term in the frequency
    // order, cumulative token share up to it) run through GlobalRank's
    // two-phase range-partition + offset machinery, NOT a naive
    // unpartitioned window — a web-scale vocabulary is tens of millions of
    // terms and the naive form coalesces it to one partition (t9's scale
    // rule; on the synthetic corpus the whole vocabulary is 31 terms, so
    // the rank<=1000 milestone filter keeps every row). Integer-scaled
    // coverage, exact in both engines.
    Q("t15_vocab_coverage",
      (s, d) => {
        import graft.operators.GlobalRank
        // the vocabulary frame is MATERIALIZED: GlobalRank references
        // it twice and the coverage total a third time — the
        // unmaterialized form tokenized the corpus three times
        // (round-14 scan census)
        val vocab = graft.Scratch.cut(s, s"t15_voc_${graft.Scratch.key(d)}")(
          documents(s, d)
            .select(explode(tokens(col("text"))).as("term"))
            .groupBy(col("term")).agg(count(lit(1)).as("cnt")))
        val order = Seq(col("cnt").desc, col("term").asc)
        val withCum = GlobalRank.withRankAndRunningTotal(vocab, order, "cnt",
          "vocab_rank", "cum_cnt")
        val total = vocab.agg(sum(col("cnt")).cast("long").as("total"))
        withCum.filter(col("vocab_rank") <= 1000)
          .crossJoin(broadcast(total))
          .select(col("vocab_rank"), col("term"), col("cnt"), col("cum_cnt"),
            expr("cum_cnt * 10000 div total").as("coverage_x10000"))
          .orderBy("vocab_rank")
      },
      Some("""WITH tok AS (
             |  SELECT unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents
             |), vocab AS (
             |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
             |), r AS (
             |  SELECT term, cnt,
             |    row_number() OVER (ORDER BY cnt DESC, term) AS vocab_rank,
             |    CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
             |  FROM vocab
             |), tot AS (
             |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab
             |)
             |SELECT vocab_rank, term, cnt, cum_cnt,
             |  CAST(cum_cnt * 10000 // total AS BIGINT) AS coverage_x10000
             |FROM r CROSS JOIN tot WHERE vocab_rank <= 1000
             |ORDER BY vocab_rank""".stripMargin)),

    // T16: BPE vocabulary learning (operators/BpeTrainer) — the tokenizer
    // TRAINING step, run on the corpus the engine just curated. Each round
    // is a distributed pair-count aggregate over the unique-word table and
    // a codegen'd merge fold; only the single argmax pair ever reaches the
    // driver. Rows-only by design (the merge table is the engine's own
    // training artifact; no SQL engine expresses the iterative argmax) but
    // fully deterministic — exact integer counts and a total tie-break
    // order make the learned table stable across runs, partitionings, and
    // scale factors' relative ordering; BpeTrainerSpec pins the algorithm
    // to a hand-computed merge sequence.
    Q("t16_bpe_merges",
      (s, d) =>
        bpe6Df(s, d)
          .select(col("step").cast("long").as("step"), col("left"),
            col("right"), col("merged"), col("pairCount").as("pair_count"))
          .orderBy("step"),
      None),

    // T21: BPE tokenizer APPLY — the other half of t16 (VERDICT r9 #7):
    // the corpus is re-tokenized with the merge table the trainer just
    // learned, which is exactly what a data pipeline does between
    // "tokenizer trained" and "token counts budgeted". The merge table is
    // a driver-side artifact like a broadcast dim; the encode itself is
    // t16's codegen'd merge fold replayed per word — map-side only, one
    // groupBy(doc_id) to roll up. Rows-only (the table is the engine's
    // own training artifact) but deterministic, and SELF-EVIDENCING: BPE
    // merges only ever CONCATENATE adjacent symbols, so per-word piece
    // reconstruction must equal the word and the piece count can never
    // exceed the character count — `ok` asserts both corpus-wide per doc;
    // compression below 1.0 piece/char proves the merges actually fired.
    // BpeTrainerSpec pins the encode replay itself on planted tables.
    Q("t21_bpe_encode",
      (s, d) => {
        val wc = documents(s, d)
          .select(explode(tokens(col("text"))).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        val table = bpe6(s, d)
        // Encode the UNIQUE-word vocabulary, not the token stream: the
        // merge replay costs per distinct word, and the doc rollup joins
        // the (word -> piece stats) table back — at 100 TB the encode
        // work is vocabulary-sized while the join is the plain equi-join
        // the corpus already shuffles for word counts. (First cut encoded
        // per occurrence: 11.0 s warm at sf0.1; this shape: 2.8 s.)
        // materialized to scratch so the 6-deep nested merge-fold runs
        // EXACTLY once per word — left lazy, CollapseProject re-inlines
        // the fold into every downstream reference (n_p, good, and the
        // broadcast build side), the t6 hazard class
        val store = graft.Scratch.dir(s, "t21_vocab")
        wc.select(col("word"),
          filter(graft.operators.BpeTrainer.encode(col("word"), table),
            p => p =!= "").as("pieces"))
          .write.mode("overwrite").parquet(store)
        val vocab = s.read.parquet(store)
          .select(col("word"), size(col("pieces")).as("n_p"),
            (concat_ws("", col("pieces")) === col("word")
              && size(col("pieces")) <= length(col("word"))).as("good"))
        documents(s, d)
          .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
          .join(vocab, Seq("word"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"),
            sum(col("n_p")).as("n_pieces"),
            sum(length(col("word"))).as("n_chars"),
            sum(when(col("good"), 0).otherwise(1)).cast("long").as("n_bad"))
          .withColumn("ok", (col("n_bad") === 0).cast("int"))
          .orderBy("doc_id")
      },
      None),

    // G2: weighted PageRank over the supplier-nation -> customer-nation
    // trade graph (operators/PageRank) — the authority score curation
    // pipelines compute over the domain link graph to gate ingestion.
    // Fixed 8 power iterations for bit-reproducible scores; the edge
    // aggregate is materialized ONCE to scratch so the iteration never
    // replays the 3-way fact-table join. r18: the node space is SCHEMA-
    // bounded (nation keys — <= 25 nodes, <= 625 edges at any corpus
    // scale), so the 8 rounds run as PageRank.runDense's one-row fold —
    // the f6/MarkovChain collapse — instead of 8 join+groupBy stages
    // with a per-round checkpoint write+read (the r17 verdict's
    // measured-most-expensive honest query: the cadence WAS the cost).
    // Per-term IEEE arithmetic is unchanged; only double summation order
    // moves, inside the 1e6 grain the comparator rounds at (GrainMargin
    // audit re-verifies). The oracle still unrolls 8 CTE iterations with
    // explicit ::DOUBLE arithmetic; scores cross integer-scaled at 1e6.
    // An UNBOUNDED link graph keeps PageRank.run's per-round checkpoint
    // discipline — see runDense's scaladoc.
    Q("g2_pagerank",
      (s, d) => {
        val edges = lineitem(s, d)
          .select(col("l_suppkey"), col("l_orderkey"))
          .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
          .agg(count(lit(1)).cast("double").as("w"))
        val scratch = graft.Scratch.dir(s, "g2")
        edges.write.mode("overwrite").parquet(s"$scratch/edges")
        graft.operators.PageRank
          .runDense(s.read.parquet(s"$scratch/edges"), "src", "dst", "w",
            iters = 8)
          .join(broadcast(nation(s, d)), col("node") === col("n_nationkey"))
          .select(col("node"), col("n_name"),
            round(col("rank") * lit(1000000.0)).cast("long").as("rank_x1e6"))
          .orderBy(desc("rank_x1e6"), col("node"))
      },
      Some {
        def prIter(i: Int) =
          s"""pr$i AS (
             |  SELECT nd.node,
             |    (1.0::DOUBLE - 0.85::DOUBLE) / c.n
             |      + 0.85::DOUBLE * coalesce(sum(p.pr * e.w / e.ow), 0.0::DOUBLE) AS pr
             |  FROM nodes nd CROSS JOIN cnt c
             |  LEFT JOIN ew e ON e.dst = nd.node
             |  LEFT JOIN pr${i - 1} p ON p.node = e.src
             |  GROUP BY nd.node, c.n
             |)""".stripMargin
        s"""WITH ew0 AS (
           |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
           |    count(*)::DOUBLE AS w
           |  FROM lineitem l
           |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
           |  JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  JOIN customer c ON o.o_custkey = c.c_custkey
           |  GROUP BY 1, 2
           |), nodes AS (
           |  SELECT src AS node FROM ew0 UNION SELECT dst FROM ew0
           |), cnt AS (SELECT count(*)::DOUBLE AS n FROM nodes),
           |ow AS (SELECT src, sum(w) AS ow FROM ew0 GROUP BY src),
           |ew AS (SELECT e.src, e.dst, e.w, o.ow FROM ew0 e JOIN ow o USING (src)),
           |pr0 AS (SELECT node, 1.0::DOUBLE / c.n AS pr FROM nodes CROSS JOIN cnt c),
           |${(1 to 8).map(prIter).mkString(",\n")}
           |SELECT node, n_name, CAST(round(pr * 1000000) AS BIGINT) AS rank_x1e6
           |FROM pr8 JOIN nation ON node = n_nationkey
           |ORDER BY rank_x1e6 DESC, node""".stripMargin
      }),

    // T18: BM25 ranked retrieval — the relevance scoring a corpus-search /
    // RAG-indexing pipeline runs over the curated corpus (the op t7's
    // tf-idf weighting feeds). Query terms are DATA-DERIVED (the 3
    // highest-df terms under a total df-desc/term order), so the query is
    // regeneration-proof. All BM25 arithmetic is exact integer rationals
    // (the t7/t14 no-float discipline): with k1 = 1.2, b = 0.75 and
    // avgdl = TL/ND (TL total tokens, ND docs),
    //   tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    // multiplied through by 10*TL becomes the all-integer rational
    //   22*tf*TL / (10*tf*TL + 3*TL + 9*dl*ND),
    // and the per-term contribution is idf_x1e4 * 22*tf*TL div (...) with
    // idf_x1e4 = ND*10000 div df (t7's integer idf; the Robertson log idf
    // is a one-line swap in real use). 64-bit headroom: the numerator is
    // bounded by 1e4*ND * 22 * dl * TL ~ 1e16 at sf0.1 — 600x under
    // Long.Max, and query terms are high-df so the realistic bound is far
    // lower. Plan shape: the query-term table is 3 rows (broadcast), the
    // corpus stats are a broadcast scalar, the per-doc score is one
    // partial-combining aggregate, and top-20 lowers to
    // TakeOrderedAndProject — no global sort, no driver collect. At
    // 100 TB this is a scan + two small-side broadcasts, the shape an
    // inverted-index build would feed.
    Q("t18_bm25",
      (s, d) => {
        // the exploded token table feeds tf AND dl — cut (uncut, the plan
        // tokenized the corpus four times through tf/dl/dfreq/stats)
        val toks = graft.Scratch.cut(s, s"t18_tok_${graft.Scratch.key(d)}")(
          documents(s, d)
            .select(col("doc_id"), explode(tokens(col("text"))).as("term")))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val qterms = dfreq.orderBy(desc("df"), col("term")).limit(3)
        val stats = dl.agg(sum(col("dl")).cast("long").as("tl"),
          count(lit(1)).as("nd"))
        tf.join(broadcast(qterms), Seq("term"))
          .join(dl, Seq("doc_id"))
          .crossJoin(broadcast(stats))
          .withColumn("contrib",
            expr("""(nd * 10000 div df) * 22 * tf * tl
                   | div (10 * tf * tl + 3 * tl + 9 * dl * nd)""".stripMargin))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_qterms"), sum(col("contrib")).as("score_x1e4"))
          .orderBy(desc("score_x1e4"), col("doc_id"))
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
             |  FROM documents
             |), tf AS (
             |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok GROUP BY doc_id, term
             |), dl AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
             |  FROM tok GROUP BY doc_id
             |), dfreq AS (
             |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
             |), qterms AS (
             |  SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 3
             |), stats AS (
             |  SELECT CAST(sum(dl) AS BIGINT) AS tl, CAST(count(*) AS BIGINT) AS nd
             |  FROM dl
             |), c AS (
             |  SELECT tf.doc_id,
             |    (nd * 10000 // df) * 22 * tf * tl
             |      // (10 * tf * tl + 3 * tl + 9 * dl.dl * nd) AS contrib
             |  FROM tf JOIN qterms USING (term) JOIN dl USING (doc_id)
             |  CROSS JOIN stats
             |)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_qterms,
             |  CAST(sum(contrib) AS BIGINT) AS score_x1e4
             |FROM c GROUP BY doc_id
             |ORDER BY score_x1e4 DESC, doc_id LIMIT 20""".stripMargin)),

    // A25: closed-form simple OLS per group — the "is there a trend"
    // question (price vs quantity per supplier nation) answered WITHOUT
    // an iterative fitter: slope/intercept/R^2 all derive from the five
    // classic sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²), which is
    // the 100 TB shape — ONE partial-combining aggregate over the fact
    // table, the algebra on the |groups|-row result. Every statistic
    // accumulates in DECIMAL(38,0) (exact; int64 would overflow n·Σxy at
    // sf >= 1) and the DuckDB mirror rides HUGEINT — the derived ratios
    // are integer divisions of exact integers, so the row hashes match
    // bit-for-bit. R² needs num²·1e6 which would blow even decimal38, so
    // BOTH sides first drop three low digits from num/den/deny (the
    // identical exact integer op), then divide — the result is r²·1e6 up
    // to that shared truncation, never a float. `div` truncates toward
    // zero in Spark and DuckDB alike (verified: -7 div 2 = -3 on both),
    // so the possibly-negative slope/intercept agree too.
    Q("a25_ols_trend",
      (s, d) => {
        val li = lineitem(s, d).select(col("l_suppkey"),
          col("l_quantity").cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
        val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
        def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n"),
            sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
            sum(dec(col("x")) * dec(col("x"))).as("sxx"),
            sum(dec(col("x")) * dec(col("y"))).as("sxy"),
            sum(dec(col("y")) * dec(col("y"))).as("syy"))
          .select(col("n_name"), col("n"),
            expr("(n * sxy - sx * sy) * 1000000 div nullif(n * sxx - sx * sx, 0)")
              .as("slope_x1e6"),
            expr("""(sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) * 100
                   | div nullif(n * (n * sxx - sx * sx), 0)""".stripMargin)
              .as("intercept_x100"),
            expr("n * sxy - sx * sy").as("rnum"),
            expr("n * sxx - sx * sx").as("rdenx"),
            expr("n * syy - sy * sy").as("rdeny"))
          // R² with ADAPTIVE shared-digit truncation (ADVICE r11): the
          // fixed drop-3-digits form required |n·Sxy − Sx·Sy| <= ~1e19,
          // which price-proportional-to-quantity data exhausts around a
          // few 1e5 rows per group (decimal38 null on Spark, error on
          // DuckDB). Both engines now drop the same tr =
          // 10^max(0, digits(|num|)−16, digits(denx)−18, digits(deny)−18)
          // low digits — digits() via length(CAST(x AS STRING)), an exact
          // integer op — so tr = 1 (bit-exact R², better than drop-3) at
          // small scale and the headroom is unbounded: num/tr <= 1e16
          // keeps num_t²·1e6 inside decimal38, den_t·den_t <= 1e36, and
          // the −18 branches keep each `div` (which lowers to LONG)
          // inside int64.
          .select(col("n_name"), col("n"), col("slope_x1e6"),
            col("intercept_x100"), col("rnum"), col("rdenx"), col("rdeny"),
            expr("""CAST(concat('1', repeat('0', greatest(0,
                   |  length(CAST(abs(rnum) AS STRING)) - 16,
                   |  length(CAST(rdenx AS STRING)) - 18,
                   |  length(CAST(rdeny AS STRING)) - 18)))
                   | AS DECIMAL(38,0))""".stripMargin).as("tr"))
          .select(col("n_name"), col("n"), col("slope_x1e6"),
            col("intercept_x100"),
            expr("""CAST(rnum div tr AS DECIMAL(38,0))
                   | * CAST(rnum div tr AS DECIMAL(38,0)) * 1000000
                   | div nullif(CAST(rdenx div tr AS DECIMAL(38,0))
                   |   * CAST(rdeny div tr AS DECIMAL(38,0)), 0)""".stripMargin)
              .as("r2_x1e6"))
          .orderBy("n_name")
      },
      Some("""WITH f AS (
             |  SELECT n_name, CAST(l_quantity AS BIGINT) AS x,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |), st AS (
             |  SELECT n_name, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
             |  FROM f GROUP BY n_name
             |), rr AS (
             |  SELECT n_name, n,
             |    (n * sxy - sx * sy) * 1000000
             |      // nullif(n * sxx - sx * sx, 0) AS slope_x1e6,
             |    (sy * (n * sxx - sx * sx) - (n * sxy - sx * sy) * sx) * 100
             |      // nullif(n * (n * sxx - sx * sx), 0) AS intercept_x100,
             |    n * sxy - sx * sy AS rnum,
             |    n * sxx - sx * sx AS rdenx,
             |    n * syy - sy * sy AS rdeny
             |  FROM st
             |), scaled AS (
             |  SELECT *, CAST('1' || repeat('0', greatest(0,
             |      length(CAST(abs(rnum) AS VARCHAR)) - 16,
             |      length(CAST(rdenx AS VARCHAR)) - 18,
             |      length(CAST(rdeny AS VARCHAR)) - 18)) AS HUGEINT) AS tr
             |  FROM rr
             |)
             |SELECT n_name, CAST(n AS BIGINT) AS n,
             |  CAST(slope_x1e6 AS BIGINT) AS slope_x1e6,
             |  CAST(intercept_x100 AS BIGINT) AS intercept_x100,
             |  CAST((rnum // tr) * (rnum // tr) * 1000000
             |    // nullif((rdenx // tr) * (rdeny // tr), 0) AS BIGINT)
             |    AS r2_x1e6
             |FROM scaled ORDER BY n_name""".stripMargin)),

    // A27: Spearman rank correlation between two global orderings — "do
    // two metrics rank the catalog the same way?" (here: parts by total
    // quantity moved vs by total revenue). Both rankings are TOTAL
    // orders (metric desc, p_partkey tie-break — integer-deterministic,
    // stated identically in the oracle), so rho = 1 - 6*sum(d^2) /
    // (n(n^2-1)) is exact integer arithmetic end to end; the x1e6 form
    // rides DECIMAL(38,0) vs HUGEINT (6*sum(d^2)*1e6 overflows int64
    // past ~50k ranked keys). Scale shape: one partial-combining
    // aggregate builds the per-part metrics, then each ranking is a
    // GlobalRank two-phase pass (t9/t15's rule — a catalog of hundreds
    // of millions of parts must never coalesce into one window
    // partition), joined back on the part key.
    Q("a27_rank_correlation",
      (s, d) => {
        import graft.operators.GlobalRank
        // the per-part metric frame is MATERIALIZED: it feeds TWO
        // GlobalRank passes and each references its input twice
        // (offsets + main side), so the unmaterialized form scanned
        // lineitem four times (caught by the round-14 scan census)
        val m = graft.Scratch.cut(s, s"a27_m_${graft.Scratch.key(d)}")(
          lineitem(s, d)
            .groupBy(col("l_partkey"))
            .agg(sum(col("l_quantity").cast("long")).as("qty"),
              sum(round(col("l_extendedprice") * 100).cast("long")).as("rev")))
        val byQty = GlobalRank.withRowNumber(m,
          Seq(col("qty").desc, col("l_partkey").asc), "rank_qty")
          .select(col("l_partkey"), col("rank_qty"))
        val byRev = GlobalRank.withRowNumber(m,
          Seq(col("rev").desc, col("l_partkey").asc), "rank_rev")
          .select(col("l_partkey"), col("rank_rev"))
        byQty.join(byRev, Seq("l_partkey"))
          .select(((col("rank_qty") - col("rank_rev"))
            * (col("rank_qty") - col("rank_rev"))).as("d2"))
          .agg(count(lit(1)).as("n"),
            sum(col("d2").cast("decimal(38,0)")).as("sd2"))
          // mean d², not the raw sum: sum(d²) reaches n³/3 and overflows
          // an int64 OUTPUT column past ~3M ranked keys; the mean stays
          // <= n²/3 (int64-safe to beyond 1e9 keys) and rho carries the
          // full-precision signal anyway
          // nullif guards (ADVICE r11): a degenerate single-key input has
          // n^3 - n = 0 (and an empty one n = 0) — Spark non-ANSI would
          // null while DuckDB raises, a silent engine divergence. With
          // the guard both engines yield a defined NULL row.
          .select(col("n"), expr("sd2 div nullif(n, 0)").as("mean_d2"),
            expr("""1000000 - 6 * sd2 * 1000000
                   | div nullif(CAST(n AS DECIMAL(38,0)) * n * n - n, 0)"""
              .stripMargin).as("rho_x1e6"))
      },
      Some("""WITH m AS (
             |  SELECT l_partkey,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM lineitem GROUP BY l_partkey
             |), r AS (
             |  SELECT l_partkey,
             |    CAST(row_number() OVER (ORDER BY qty DESC, l_partkey)
             |      AS BIGINT) AS rank_qty,
             |    CAST(row_number() OVER (ORDER BY rev DESC, l_partkey)
             |      AS BIGINT) AS rank_rev
             |  FROM m
             |), dd AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    sum((rank_qty - rank_rev) * (rank_qty - rank_rev)) AS sd2
             |  FROM r
             |)
             |SELECT n, CAST(sd2 // nullif(n, 0) AS BIGINT) AS mean_d2,
             |  CAST(1000000 - 6 * sd2 * 1000000
             |    // nullif(CAST(n AS HUGEINT) * n * n - n, 0) AS BIGINT)
             |    AS rho_x1e6
             |FROM dd""".stripMargin)),

    // A28: two-sample Kolmogorov-Smirnov test — "did the value
    // distribution drift between the two cohorts?" (here: click vs
    // purchase event values), the distribution-level complement of
    // a20's mean-level Welch test. D = max |ECDF_a - ECDF_b| evaluated
    // per distinct exact-cents value with BOTH cumulative counts riding
    // ONE GlobalRank.withRankAndRunningTotals pass (t24's multi-prefix
    // machinery — a billion-point sample never coalesces into one
    // window partition); the statistic is the exact integer
    // max|cum_a*n_b - cum_b*n_a| so no ECDF ratio is ever a float, and
    // the alpha=0.05 decision squares the classic c(α)·sqrt((n+m)/nm)
    // threshold into pure integer arithmetic (1.358² = 1.844164 — a
    // rational constant, no sqrt anywhere). One scan, one tiny-value
    // aggregate, one range shuffle.
    Q("a28_ks_test",
      (s, d) => {
        import graft.operators.GlobalRank
        // the per-value frame is MATERIALIZED so the fact table really
        // is scanned exactly once: GlobalRank references its input
        // twice and the sample-size aggregate a third time — the
        // unmaterialized form scanned events three times (caught by
        // the round-14 scan census; the comment claimed one)
        val byVal = graft.Scratch.cut(s, s"a28_bv_${graft.Scratch.key(d)}")(
          events(s, d)
            .filter(col("event_type").isin("click", "purchase"))
            .select(round(col("value") * 100).cast("long").as("c"),
              (col("event_type") === "click").cast("long").as("is_a"))
            .groupBy(col("c"))
            .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
            // coalesce(1): the frame's domain is BOUNDED (a value grid /
            // calendar bins), so one output file is scale-safe and cuts
            // the 32-file commit + read overhead; corpus-proportional
            // frames (a27/t15/t24) keep partitioned writes instead
            .coalesce(1))
        val cum = GlobalRank.withRankAndRunningTotals(byVal,
          Seq(col("c").asc), Seq("ca", "cb"), "vr", Seq("cum_a", "cum_b"))
        // sample sizes from the tiny materialized per-value frame
        val tot = byVal.agg(sum(col("ca")).as("n_a"),
          sum(col("cb")).as("n_b"))
        cum.crossJoin(broadcast(tot))
          .select(col("n_a"), col("n_b"),
            abs(col("cum_a") * col("n_b") - col("cum_b") * col("n_a"))
              .as("dn"))
          .groupBy(col("n_a"), col("n_b"))
          .agg(max(col("dn")).as("d_num"))
          .select(col("n_a"), col("n_b"), col("d_num"),
            // d_num * 10000 in DECIMAL: at the billion-point samples the
            // comment advertises, d_num <= n_a*n_b ~ 2.5e17 and the x1e4
            // scaling overflows int64. nullif: an all-one-cohort input
            // makes n_a*n_b = 0 (Spark non-ANSI nulls, DuckDB raises).
            expr("""CAST(d_num AS DECIMAL(38,0)) * 10000
                   | div nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0)"""
              .stripMargin).as("ks_x1e4"),
            // Decision inequality divided through by (n_a*n_b)^2 BEFORE
            // squaring (ADVICE r11): the raw d_num^2 * 1e6 form exceeds
            // DECIMAL(38,0)/HUGEINT once d_num > ~3.2e15 — i.e. D ~0.04
            // at the billion-point samples above — where Spark non-ANSI
            // nulls and DuckDB raises, a silent engine divergence. Here
            // q = D*1e6 (truncated) <= 1e6 so q*q <= 1e12 rides int64,
            // and r's numerator 1844164*(n_a+n_b)*1e6 stays inside
            // decimal38 to n_a+n_b ~ 5e25. Both sides truncate to the
            // same 1e-6 lattice with the same `div`, so the decision is
            // exact at that stated grain on both engines.
            expr("""CAST(
                   |  (CAST(d_num AS DECIMAL(38,0)) * 1000000
                   |     div nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0))
                   |  * (CAST(d_num AS DECIMAL(38,0)) * 1000000
                   |     div nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0))
                   |  > 1844164 * CAST(n_a + n_b AS DECIMAL(38,0)) * 1000000
                   |     div nullif(CAST(n_a AS DECIMAL(38,0)) * n_b, 0)
                   | AS INT)""".stripMargin).as("reject_05"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
             |    CAST(event_type = 'click' AS BIGINT) AS is_a
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |), bv AS (
             |  SELECT c, CAST(sum(is_a) AS BIGINT) AS ca,
             |    CAST(sum(1 - is_a) AS BIGINT) AS cb
             |  FROM ev GROUP BY c
             |), cum AS (
             |  SELECT c,
             |    CAST(sum(ca) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cum_a,
             |    CAST(sum(cb) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cum_b
             |  FROM bv
             |), tot AS (
             |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
             |    CAST(sum(cb) AS BIGINT) AS n_b
             |  FROM bv
             |), dd AS (
             |  SELECT n_a, n_b,
             |    max(abs(cum_a * n_b - cum_b * n_a)) AS d_num
             |  FROM cum CROSS JOIN tot GROUP BY n_a, n_b
             |)
             |SELECT n_a, n_b, CAST(d_num AS BIGINT) AS d_num,
             |  CAST(CAST(d_num AS HUGEINT) * 10000
             |    // nullif(CAST(n_a AS HUGEINT) * n_b, 0) AS BIGINT)
             |    AS ks_x1e4,
             |  CAST(
             |    (CAST(d_num AS HUGEINT) * 1000000
             |       // nullif(CAST(n_a AS HUGEINT) * n_b, 0))
             |    * (CAST(d_num AS HUGEINT) * 1000000
             |       // nullif(CAST(n_a AS HUGEINT) * n_b, 0))
             |    > 1844164 * CAST(n_a + n_b AS HUGEINT) * 1000000
             |       // nullif(CAST(n_a AS HUGEINT) * n_b, 0)
             |   AS INT) AS reject_05
             |FROM dd""".stripMargin)),

    // A26: chi-square independence audit between two categorical columns
    // (documents lang x source) — the corpus-balance question a mixture
    // designer asks before weighting ("is language distribution uniform
    // across sources, or is src7 secretly all-German?"). One map-side-
    // combining groupBy builds the contingency counts; row totals, column
    // totals and N are aggregates OF that tiny frame, so the fact table
    // is scanned exactly once and everything downstream is broadcast
    // algebra on |langs| x |sources| rows. Per-cell chi² contributions
    // are exact integer terms — (O·N − R·C)²·1e6 div (R·C·N), DECIMAL(38)
    // vs HUGEINT — and per-term truncation is order-independent, so the
    // total is exactly reproducible. Zero-observed cells enter with O=0
    // (the crossJoin of the two total frames restores them; both frames
    // are tiny BY CONSTRUCTION — category cardinalities, not row counts).
    Q("a26_chi_square",
      (s, d) => {
        // the contingency frame is MATERIALIZED (coalesce(1): bounded
        // by |langs|·|sources|) so the fact table really is scanned
        // exactly once — obs feeds rt/ct/tot/terms and each reference
        // recomputed the documents scan (TEN scans in the
        // unmaterialized plan, round-14 scan census)
        val obs = graft.Scratch.cut(s, s"a26_obs_${graft.Scratch.key(d)}")(
          documents(s, d).select(col("lang"), col("source"))
            .groupBy(col("lang"), col("source"))
            .agg(count(lit(1)).as("o"))
            .coalesce(1))
        // row/column/N totals aggregate the TINY materialized frame
        // (sums of cell counts ARE the marginal counts)
        val rt = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val ct = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
        val tot = obs.agg(sum(col("o")).as("nn"))
        val dims = rt.agg(count(lit(1)).as("nl"))
          .crossJoin(broadcast(ct.agg(count(lit(1)).as("ns"))))
        // Per-cell chi² term with ADAPTIVE shared-digit truncation (ADVICE
        // r11): the raw (O·N − R·C)²·1e6 is bounded only by N⁴·1e6 and
        // overflows decimal38/HUGEINT past N ~ 1e8 documents (Spark nulls,
        // DuckDB raises — silent divergence). Both engines instead drop
        // the same tr = 10^max(0, digits(|u|)−16, digits(den)−18) low
        // digits from u = O·N − R·C before squaring and tr² from the
        // denominator (two exact integer divisions — div tr div tr ==
        // div tr² for positive tr, without materializing tr² > 1e38).
        // digits() is length(CAST(x AS STRING)) — an exact integer in
        // both engines, unlike any float log10. tr = 1 at every tested
        // scale (u < 1e16), so the term is bit-identical to the exact
        // form there; at N = 1e10 the grain is ~1e-7 relative on the
        // dominant (large-u) cells. The den−18 branch keeps den div tr
        // inside int64, which Spark's `div` lowers to.
        val terms = rt.crossJoin(broadcast(ct))
          .join(obs, Seq("lang", "source"), "left")
          .crossJoin(broadcast(tot))
          .select(col("lang"), col("source"),
            coalesce(col("o"), lit(0L)).as("o"),
            col("r").cast("decimal(38,0)").as("r"),
            col("c").cast("decimal(38,0)").as("c"),
            col("nn").cast("decimal(38,0)").as("nn"))
          .select(col("lang"), col("source"), col("o"),
            expr("r * c * 1000000 div nn").as("e_x1e6"),
            expr("o * nn - r * c").as("u"),
            expr("r * c * nn").as("den"))
          .select(col("lang"), col("source"), col("o"), col("e_x1e6"),
            col("u"), col("den"),
            expr("""CAST(concat('1', repeat('0', greatest(0,
                   |  length(CAST(abs(u) AS STRING)) - 16,
                   |  length(CAST(den AS STRING)) - 18)))
                   | AS DECIMAL(38,0))""".stripMargin).as("tr"))
          .select(col("lang"), col("source"), col("o"), col("e_x1e6"),
            expr("""CAST(u div tr AS DECIMAL(38,0))
                   | * CAST(u div tr AS DECIMAL(38,0)) * 1000000
                   | div nullif(den div tr div tr, 0)""".stripMargin)
              .as("term_x1e6"))
        val total = terms.agg(sum(col("term_x1e6")).as("chi2_x1e6"))
        terms.crossJoin(broadcast(total)).crossJoin(broadcast(dims))
          .select(col("lang"), col("source"), col("o"), col("e_x1e6"),
            col("term_x1e6"), col("chi2_x1e6"),
            ((col("nl") - 1) * (col("ns") - 1)).as("df"))
          .orderBy("lang", "source")
      },
      Some("""WITH obs AS (
             |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
             |  FROM documents GROUP BY lang, source
             |), rt AS (
             |  SELECT lang, CAST(sum(o) AS BIGINT) AS r
             |  FROM obs GROUP BY lang
             |), ct AS (
             |  SELECT source, CAST(sum(o) AS BIGINT) AS c
             |  FROM obs GROUP BY source
             |), tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM obs),
             |dims AS (
             |  SELECT (SELECT count(*) FROM rt) AS nl,
             |         (SELECT count(*) FROM ct) AS ns
             |), cells AS (
             |  SELECT rt.lang, ct.source, coalesce(obs.o, 0) AS o,
             |    rt.r * ct.c * 1000000 // nn AS e_x1e6,
             |    coalesce(obs.o, 0) * nn - rt.r * ct.c AS u,
             |    rt.r * ct.c * nn AS den
             |  FROM rt CROSS JOIN ct
             |  LEFT JOIN obs ON rt.lang = obs.lang AND ct.source = obs.source
             |  CROSS JOIN tot
             |), scaled AS (
             |  SELECT *, CAST('1' || repeat('0', greatest(0,
             |      length(CAST(abs(u) AS VARCHAR)) - 16,
             |      length(CAST(den AS VARCHAR)) - 18)) AS HUGEINT) AS tr
             |  FROM cells
             |), terms AS (
             |  SELECT lang, source, o, e_x1e6,
             |    (u // tr) * (u // tr) * 1000000
             |      // nullif(den // tr // tr, 0) AS term_x1e6
             |  FROM scaled
             |), total AS (SELECT sum(term_x1e6) AS chi2_x1e6 FROM terms)
             |SELECT lang, source, o, CAST(e_x1e6 AS BIGINT) AS e_x1e6,
             |  CAST(term_x1e6 AS BIGINT) AS term_x1e6,
             |  CAST(chi2_x1e6 AS BIGINT) AS chi2_x1e6,
             |  CAST((nl - 1) * (ns - 1) AS BIGINT) AS df
             |FROM terms CROSS JOIN total CROSS JOIN dims
             |ORDER BY lang, source""".stripMargin)),

    // A29: Mann-Whitney U — the rank-based two-sample test ("are click
    // values stochastically larger than purchase values?"), the
    // non-parametric sibling of a20 (Welch, means) and a28 (KS, whole
    // distribution). Midranks handle ties exactly: with m tied rows at
    // value c and B rows strictly below, each gets midrank B + (m+1)/2 —
    // a half-integer, so the WHOLE computation rides x2 (2R_a = sum of
    // ca·(2B + m + 1), always integral). Both cohort prefix sums come
    // off ONE GlobalRank pass over the compressed per-value histogram
    // (a28's shape — a billion-point sample never coalesces into one
    // window partition). U/(n_a·n_b) IS the rank-biserial AUC — emitted
    // as auc_x1e6, the effect size a pipeline actually thresholds on.
    // The alpha=0.05 normal-approximation decision (no tie correction —
    // conservative, documented) is the same divide-through-by-(nm)^2-
    // before-squaring integer form as a28's reject: q = |2U − nm|·1e6
    // div nm <= 1e6, so q² rides int64 at ANY scale; 1.96² = 3.8416 and
    // var = nm(N+1)/12 give 3·q²·1e4 > 38416·(N+1)·1e12 div nm.
    Q("a29_mann_whitney",
      (s, d) => {
        import graft.operators.GlobalRank
        // a28's materialization cut: GlobalRank references its input
        // twice, so the unmaterialized per-value frame scanned events
        // twice (round-14 scan census)
        val byVal = graft.Scratch.cut(s, s"a29_bv_${graft.Scratch.key(d)}")(
          events(s, d)
            .filter(col("event_type").isin("click", "purchase"))
            .select(round(col("value") * 100).cast("long").as("c"),
              (col("event_type") === "click").cast("long").as("is_a"))
            .groupBy(col("c"))
            .agg(sum(col("is_a")).as("ca"), sum(lit(1L) - col("is_a")).as("cb"))
            // coalesce(1): the frame's domain is BOUNDED (a value grid /
            // calendar bins), so one output file is scale-safe and cuts
            // the 32-file commit + read overhead; corpus-proportional
            // frames (a27/t15/t24) keep partitioned writes instead
            .coalesce(1))
        val cum = GlobalRank.withRankAndRunningTotals(byVal,
          Seq(col("c").asc), Seq("ca", "cb"), "vr", Seq("cum_a", "cum_b"))
        // ca·(2B + m + 1) reaches 2N² — ride DECIMAL(38,0) from the start
        val st = cum.select(
            (col("ca").cast("decimal(38,0)")
              * (lit(2) * (col("cum_a") + col("cum_b") - col("ca") - col("cb"))
                + col("ca") + col("cb") + 1)).as("r2a"),
            col("ca"), col("cb"))
          .agg(sum(col("r2a")).as("r2_a"),
            sum(col("ca")).cast("decimal(38,0)").as("n_a"),
            sum(col("cb")).cast("decimal(38,0)").as("n_b"))
        st.select(col("n_a"), col("n_b"),
            expr("r2_a - n_a * (n_a + 1)").as("u2"),
            expr("n_a * n_b").as("nm"),
            expr("n_a + n_b").as("nn"))
          .select(col("n_a").cast("long").as("n_a"),
            col("n_b").cast("long").as("n_b"),
            col("u2").cast("long").as("u_x2"),
            expr("u2 * 1000000 div nullif(2 * nm, 0)").as("auc_x1e6"),
            expr("""CAST(
                   |  3 * (abs(u2 - nm) * 1000000 div nullif(nm, 0))
                   |    * (abs(u2 - nm) * 1000000 div nullif(nm, 0)) * 10000
                   |  > 38416 * (nn + 1) * 1000000000000 div nullif(nm, 0)
                   | AS INT)""".stripMargin).as("reject_05"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
             |    CAST(event_type = 'click' AS BIGINT) AS is_a
             |  FROM events WHERE event_type IN ('click', 'purchase')
             |), bv AS (
             |  SELECT c, CAST(sum(is_a) AS BIGINT) AS ca,
             |    CAST(sum(1 - is_a) AS BIGINT) AS cb
             |  FROM ev GROUP BY c
             |), cum AS (
             |  SELECT ca, cb,
             |    CAST(sum(ca + cb) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cum_t
             |  FROM bv
             |), st AS (
             |  SELECT sum(CAST(ca AS HUGEINT)
             |      * (2 * (cum_t - ca - cb) + ca + cb + 1)) AS r2_a,
             |    CAST(sum(ca) AS HUGEINT) AS n_a,
             |    CAST(sum(cb) AS HUGEINT) AS n_b
             |  FROM cum
             |), uu AS (
             |  SELECT n_a, n_b, r2_a - n_a * (n_a + 1) AS u2,
             |    n_a * n_b AS nm, n_a + n_b AS nn
             |  FROM st
             |)
             |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             |  CAST(u2 AS BIGINT) AS u_x2,
             |  CAST(u2 * 1000000 // nullif(2 * nm, 0) AS BIGINT) AS auc_x1e6,
             |  CAST(
             |    3 * (abs(u2 - nm) * 1000000 // nullif(nm, 0))
             |      * (abs(u2 - nm) * 1000000 // nullif(nm, 0)) * 10000
             |    > 38416 * (nn + 1) * 1000000000000 // nullif(nm, 0)
             |   AS INT) AS reject_05
             |FROM uu""".stripMargin)),

    // A30: Tukey-fence outlier audit per event type — the robust
    // complement of a16's z-score (a fat-tailed value column wrecks a
    // mean/stddev rule; quartiles don't care). Quartiles are EXACT
    // discrete order statistics (q1 = min value with 4·cum >= n, q3 with
    // 4·cum >= 3n — type-1 quantiles, no interpolation, no floats), read
    // off a cumulative sum over the per-(type, cent-value) histogram:
    // the window partitions by type and its state scales with the
    // DISTINCT value domain (price grid), not the row count — a16/a28's
    // compression discipline. Fences ride x2 so 1.5·IQR stays integral:
    // lo2 = 2q1 − 3·IQR, hi2 = 2q3 + 3·IQR, outliers counted by summing
    // histogram masses past the fences (the fact table is scanned once).
    Q("a30_tukey_fences",
      (s, d) => {
        // the per-(type, value) histogram is MATERIALIZED: the
        // cumulative pass, the per-type totals, and the final clip
        // count all read it — unmaterialized it scanned events three
        // times (round-14 scan census)
        val bv = graft.Scratch.cut(s, s"a30_bv_${graft.Scratch.key(d)}")(
          events(s, d)
            .select(col("event_type"),
              round(col("value") * 100).cast("long").as("c"))
            .groupBy(col("event_type"), col("c"))
            .agg(count(lit(1)).as("m"))
            // coalesce(1): the frame's domain is BOUNDED (a value grid /
            // calendar bins), so one output file is scale-safe and cuts
            // the 32-file commit + read overhead; corpus-proportional
            // frames (a27/t15/t24) keep partitioned writes instead
            .coalesce(1))
        val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = bv.withColumn("cm", sum(col("m")).over(w))
        val tot = bv.groupBy(col("event_type")).agg(sum(col("m")).as("n"))
        val fences = cum.join(broadcast(tot), Seq("event_type"))
          .groupBy(col("event_type"), col("n"))
          .agg(min(when(col("cm") * 4 >= col("n"), col("c"))).as("q1_c"),
            min(when(col("cm") * 4 >= col("n") * 3, col("c"))).as("q3_c"))
          .select(col("event_type"), col("n"), col("q1_c"), col("q3_c"),
            (col("q1_c") * 2 - (col("q3_c") - col("q1_c")) * 3).as("lo2"),
            (col("q3_c") * 2 + (col("q3_c") - col("q1_c")) * 3).as("hi2"))
        bv.join(broadcast(fences), Seq("event_type"))
          .groupBy(col("event_type"), col("n"), col("q1_c"), col("q3_c"))
          .agg(coalesce(sum(when(col("c") * 2 < col("lo2"), col("m"))), lit(0L))
              .as("n_low"),
            coalesce(sum(when(col("c") * 2 > col("hi2"), col("m"))), lit(0L))
              .as("n_high"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), bv AS (
             |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS m
             |  FROM ev GROUP BY event_type, c
             |), cum AS (
             |  SELECT event_type, c, m,
             |    CAST(sum(m) OVER (PARTITION BY event_type ORDER BY c
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
             |  FROM bv
             |), tot AS (
             |  SELECT event_type, CAST(sum(m) AS BIGINT) AS n
             |  FROM bv GROUP BY event_type
             |), qq AS (
             |  SELECT cum.event_type, n,
             |    min(CASE WHEN cm * 4 >= n THEN c END) AS q1_c,
             |    min(CASE WHEN cm * 4 >= n * 3 THEN c END) AS q3_c
             |  FROM cum JOIN tot ON cum.event_type = tot.event_type
             |  GROUP BY cum.event_type, n
             |), fen AS (
             |  SELECT event_type, n, q1_c, q3_c,
             |    q1_c * 2 - (q3_c - q1_c) * 3 AS lo2,
             |    q3_c * 2 + (q3_c - q1_c) * 3 AS hi2
             |  FROM qq
             |)
             |SELECT fen.event_type, n, q1_c, q3_c,
             |  CAST(coalesce(sum(CASE WHEN c * 2 < lo2 THEN m END), 0)
             |    AS BIGINT) AS n_low,
             |  CAST(coalesce(sum(CASE WHEN c * 2 > hi2 THEN m END), 0)
             |    AS BIGINT) AS n_high
             |FROM fen JOIN bv ON fen.event_type = bv.event_type
             |GROUP BY fen.event_type, n, q1_c, q3_c
             |ORDER BY fen.event_type""".stripMargin)),

    // A33: MAD robust outlier audit — the median-absolute-deviation
    // member of the robust family (a30's quartile fences tolerate 25%
    // contamination; MAD's breakdown point is 50%, the standard for
    // sensor/billing feeds where a burst can poison a whole quartile).
    // Everything is exact order statistics off per-type HISTOGRAMS:
    // median = min value with 2·cum >= n, then the DEVIATION histogram
    // (|c − med| re-aggregated from the value histogram, never from
    // raw rows) yields MAD the same way, and outlier mass |x − med| >
    // 3·MAD sums histogram masses. Three tiny frames, two partitioned
    // cumulative windows whose state scales with the value DOMAIN
    // (a30's compression discipline) — the fact table is scanned once.
    Q("a33_mad_outliers",
      (s, d) => {
        // the histogram feeds tot/med/dv and the final clip count — cut
        // (a28's discipline; uncut, each reference re-scanned events and
        // the "scanned once" claim above held only under runtime reuse)
        val bv = graft.Scratch.cut(s, s"a33_bv_${graft.Scratch.key(d)}")(
          events(s, d)
            .select(col("event_type"),
              round(col("value") * 100).cast("long").as("c"))
            .groupBy(col("event_type"), col("c"))
            .agg(count(lit(1)).as("m"))
            // coalesce(1): bounded value-grid domain (a28's rationale)
            .coalesce(1))
        val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = bv.groupBy(col("event_type")).agg(sum(col("m")).as("n"))
        val med = bv.withColumn("cm", sum(col("m")).over(w))
          .join(broadcast(tot), Seq("event_type"))
          .groupBy(col("event_type"), col("n"))
          .agg(min(when(col("cm") * 2 >= col("n"), col("c"))).as("med_c"))
        val dv = bv.join(broadcast(med), Seq("event_type"))
          .select(col("event_type"), col("n"), col("med_c"),
            abs(col("c") - col("med_c")).as("dd"), col("m"))
          .groupBy(col("event_type"), col("n"), col("med_c"), col("dd"))
          .agg(sum(col("m")).as("dm"))
        val wd = Window.partitionBy(col("event_type")).orderBy(col("dd"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val mad = dv.withColumn("cd", sum(col("dm")).over(wd))
          .groupBy(col("event_type"), col("n"), col("med_c"))
          .agg(min(when(col("cd") * 2 >= col("n"), col("dd"))).as("mad_c"))
        bv.join(broadcast(mad), Seq("event_type"))
          .groupBy(col("event_type"), col("n"), col("med_c"), col("mad_c"))
          .agg(coalesce(sum(when(abs(col("c") - col("med_c"))
            > col("mad_c") * 3, col("m"))), lit(0L)).as("n_out"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), bv AS (
             |  SELECT event_type, c, CAST(count(*) AS BIGINT) AS m
             |  FROM ev GROUP BY event_type, c
             |), tot AS (
             |  SELECT event_type, CAST(sum(m) AS BIGINT) AS n
             |  FROM bv GROUP BY event_type
             |), cum AS (
             |  SELECT event_type, c, m,
             |    CAST(sum(m) OVER (PARTITION BY event_type ORDER BY c
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cm
             |  FROM bv
             |), med AS (
             |  SELECT cum.event_type, n,
             |    min(CASE WHEN cm * 2 >= n THEN c END) AS med_c
             |  FROM cum JOIN tot ON cum.event_type = tot.event_type
             |  GROUP BY cum.event_type, n
             |), dv AS (
             |  SELECT bv.event_type, n, med_c, abs(c - med_c) AS dd,
             |    CAST(sum(m) AS BIGINT) AS dm
             |  FROM bv JOIN med ON bv.event_type = med.event_type
             |  GROUP BY bv.event_type, n, med_c, dd
             |), dcum AS (
             |  SELECT event_type, n, med_c, dd, dm,
             |    CAST(sum(dm) OVER (PARTITION BY event_type ORDER BY dd
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cd
             |  FROM dv
             |), mad AS (
             |  SELECT event_type, n, med_c,
             |    min(CASE WHEN cd * 2 >= n THEN dd END) AS mad_c
             |  FROM dcum GROUP BY event_type, n, med_c
             |)
             |SELECT bv.event_type, n, med_c, mad_c,
             |  CAST(coalesce(sum(CASE WHEN abs(c - med_c) > mad_c * 3
             |    THEN m END), 0) AS BIGINT) AS n_out
             |FROM bv JOIN mad ON bv.event_type = mad.event_type
             |GROUP BY bv.event_type, n, med_c, mad_c
             |ORDER BY bv.event_type""".stripMargin)),

    // A34: Wald-Wolfowitz runs test — "is the hourly revenue sequence
    // RANDOM around its median, or does it trend/cluster?": the
    // nonparametric autocorrelation screen that complements w16 (which
    // localizes one shift) and w17 (which flags level outliers). All
    // exact integers: the hourly series compresses map-side; the
    // global median of bin sums is an order statistic off the bin-value
    // HISTOGRAM through one GlobalRank prefix pass (ties to the median
    // are discarded, the standard treatment); the kept sequence ranks
    // through a second GlobalRank pass and sign flips count via the
    // rank→rank+1 EQUI-join (the oracle's lag() window is the spec, not
    // the plan). The alpha=0.05 normal-approx decision uses a28/a29's
    // divide-through rule with m = n1·n2: q = |N(R−1) − 2m|·1e6 div 2m,
    // reject iff q²·(N−1)·1e4 > 38416·(2m−N)·1e12 div 2m — every
    // truncating quotient bounded at any scale.
    Q("a34_runs_test",
      (s, d) => {
        import graft.operators.GlobalRank
        val byBin = events(s, d)
          .select(expr("ts div 3600000000000").as("bin"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy(col("bin")).agg(sum(col("c")).as("x"))
        val hv = byBin.groupBy(col("x")).agg(count(lit(1)).as("hm"))
        val cum = GlobalRank.withRankAndRunningTotals(hv,
          Seq(col("x").asc), Seq("hm"), "vr", Seq("cumm"))
        val nAll = byBin.agg(count(lit(1)).as("n_all"))
        val med = cum.crossJoin(broadcast(nAll))
          .agg(min(when(col("cumm") * 2 >= col("n_all"), col("x")))
            .as("med_x"))
        val kept = byBin.crossJoin(broadcast(med))
          .filter(col("x") =!= col("med_x"))
          .select(col("bin"), (col("x") > col("med_x")).cast("int").as("b"))
        // materialize the ranked sequence once: the successor self-join
        // keys on rk vs rk+1 (different shuffle expressions — no
        // ReusedExchange), so without storage the whole
        // histogram+median+rank chain would execute twice (d5/d15's
        // materialization discipline; 3.2 s -> 2.6 s at sf0.1, and at
        // 100 TB the saved recomputation is a full fact-table scan)
        val dir = graft.Scratch.dir(s, "a34_ranked")
        GlobalRank.withRowNumber(kept, Seq(col("bin").asc), "rk")
          .select(col("rk"), col("b"))
          .write.mode("overwrite").parquet(dir)
        val ranked = s.read.parquet(dir)
        val flips = ranked.as("a")
          .join(ranked.as("p"), col("a.rk") === col("p.rk") + 1)
          .agg(coalesce(sum((col("a.b") =!= col("p.b")).cast("long")),
            lit(0L)).as("n_flips"))
        // coalesce to 0 like n_flips: a degenerate series (every bin at
        // the median, or no events) must emit the same defined row the
        // oracle's coalesce(...,0) does, not NULL n1/n2/nn
        val counts = ranked.agg(
          coalesce(sum((col("b") === 1).cast("long")), lit(0L)).as("n1"),
          coalesce(sum((col("b") === 0).cast("long")), lit(0L)).as("n2"))
        counts.crossJoin(broadcast(flips))
          .select(col("n1"), col("n2"),
            (col("n1") + col("n2")).as("nn"),
            (col("n_flips") + 1).as("n_runs"),
            (col("n1").cast("decimal(38,0)") * col("n2")).as("m"))
          .select(col("n1"), col("n2"), col("nn"), col("n_runs"),
            // expected runs x100 = (2m/N + 1)*100
            expr("(2 * m * 100 + CAST(nn AS DECIMAL(38,0)) * 100) div nullif(nn, 0)")
              .as("mu_x100"),
            // q lowers to LONG off the div; q²·(N−1)·1e4 must ride
            // decimal38 (a25's recast rule) — headroom to ~3e7 bins,
            // i.e. hourly grain for four millennia
            expr("""CAST(
                   |  CAST(abs(CAST(nn AS DECIMAL(38,0)) * (n_runs - 1) - 2 * m)
                   |     * 1000000 div nullif(2 * m, 0) AS DECIMAL(38,0))
                   |  * CAST(abs(CAST(nn AS DECIMAL(38,0)) * (n_runs - 1) - 2 * m)
                   |     * 1000000 div nullif(2 * m, 0) AS DECIMAL(38,0))
                   |  * (nn - 1) * 10000
                   |  > 38416 * (2 * m - nn) * 1000000000000
                   |     div nullif(2 * m, 0)
                   | AS INT)""".stripMargin).as("reject_05"))
      },
      Some("""WITH bins AS (
             |  SELECT epoch_ns(ts) // 3600000000000 AS bin,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS x
             |  FROM events GROUP BY 1
             |), med AS (
             |  SELECT min(x) AS med_x FROM (
             |    SELECT x, CAST(sum(count(*))
             |        OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |      AS cumm
             |    FROM bins GROUP BY x) h
             |  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_all
             |              FROM bins) t
             |  WHERE cumm * 2 >= n_all
             |), kept AS (
             |  SELECT bin, CAST(x > med_x AS INT) AS b
             |  FROM bins CROSS JOIN med WHERE x <> med_x
             |), seq AS (
             |  SELECT b, lag(b) OVER (ORDER BY bin) AS pb FROM kept
             |), st AS (
             |  SELECT
             |    CAST((SELECT coalesce(sum(CAST(b = 1 AS BIGINT)), 0)
             |          FROM kept) AS BIGINT) AS n1,
             |    CAST((SELECT coalesce(sum(CAST(b = 0 AS BIGINT)), 0)
             |          FROM kept) AS BIGINT) AS n2,
             |    CAST((SELECT coalesce(sum(CAST(b <> pb AS BIGINT)), 0)
             |          FROM seq WHERE pb IS NOT NULL) AS BIGINT) AS n_flips
             |)
             |SELECT n1, n2, n1 + n2 AS nn,
             |  n_flips + 1 AS n_runs,
             |  CAST((2 * CAST(n1 AS HUGEINT) * n2 * 100 + (n1 + n2) * 100)
             |    // nullif(n1 + n2, 0) AS BIGINT) AS mu_x100,
             |  CAST(
             |    (abs(CAST(n1 + n2 AS HUGEINT) * (n_flips + 1 - 1)
             |         - 2 * CAST(n1 AS HUGEINT) * n2)
             |       * 1000000 // nullif(2 * CAST(n1 AS HUGEINT) * n2, 0))
             |    * (abs(CAST(n1 + n2 AS HUGEINT) * (n_flips + 1 - 1)
             |         - 2 * CAST(n1 AS HUGEINT) * n2)
             |       * 1000000 // nullif(2 * CAST(n1 AS HUGEINT) * n2, 0))
             |    * (n1 + n2 - 1) * 10000
             |    > 38416 * (2 * CAST(n1 AS HUGEINT) * n2 - (n1 + n2))
             |       * 1000000000000 // nullif(2 * CAST(n1 AS HUGEINT) * n2, 0)
             |   AS INT) AS reject_05
             |FROM st""".stripMargin)),

    // T25: bigram LIFT — collocation strength, the association metric a
    // tokenizer/phrase-mining pass ranks n-grams by (t6 ranks by RAW
    // count, which surfaces "of the"; lift = P(ab)/(P(a)P(b)) surfaces
    // genuinely bound pairs). Kept log-free and integer-exact:
    // lift·1e6 = c_ab·U²·1e6 / (c_a·c_b·B), computed as two staged
    // truncating divisions — (c_ab·U·1e4 div c_a)·U·100 div (c_b·B) —
    // each sized for decimal38/HUGEINT at a 1e13-token corpus (c_ab <=
    // c_a bounds the first quotient by U·1e4). The unigram join is left
    // unhinted like t7's dfreq join: a web-scale vocabulary is not
    // always broadcastable, AQE decides. min-count floor 5 before any
    // join — the candidate set, not the corpus, pays the join.
    Q("t25_bigram_lift",
      (s, d) => {
        // token arrays feed the unigram aggregate, the bigram-total, and
        // the bigram stream; the unigram table feeds its total AND two
        // joins — cut both (uncut, FIVE corpus tokenizations planned;
        // the x40 crossover proved this class pays for itself)
        val toks = graft.Scratch.cut(s, s"t25_tok_${graft.Scratch.key(d)}")(
          documents(s, d).select(tokens(col("text")).as("w")))
        val uni = graft.Scratch.cut(s, s"t25_uni_${graft.Scratch.key(d)}")(
          toks.select(explode(col("w")).as("t"))
            .groupBy(col("t")).agg(count(lit(1)).as("cu")))
        val utot = uni.agg(sum(col("cu")).cast("decimal(38,0)").as("u"))
        val btot = toks
          .agg(sum(greatest(size(col("w")) - 1, lit(0))).cast("decimal(38,0)")
            .as("b"))
        val bi = toks.select(explode(shingles(col("w"), 2)).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 5)
          .select(col("bigram"), col("cab"),
            split(col("bigram"), " ").getItem(0).as("w1"),
            split(col("bigram"), " ").getItem(1).as("w2"))
        bi.join(uni.select(col("t").as("w1"), col("cu").as("ca")), Seq("w1"))
          .join(uni.select(col("t").as("w2"), col("cu").as("cb")), Seq("w2"))
          .crossJoin(broadcast(utot)).crossJoin(broadcast(btot))
          .select(col("bigram"), col("cab").as("n_pair"),
            col("ca").as("n_first"), col("cb").as("n_second"),
            expr("""CAST(CAST(cab AS DECIMAL(38,0)) * u * 10000 div ca
                   |  AS DECIMAL(38,0)) * u * 100
                   | div (CAST(cb AS DECIMAL(38,0)) * b)""".stripMargin)
              .as("lift_x1e6"))
          .orderBy(desc("lift_x1e6"), col("bigram"))
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT string_split(lower(text), ' ') AS w FROM documents
             |), uni AS (
             |  SELECT unnest(w) AS t FROM tok
             |), cu AS (
             |  SELECT t, CAST(count(*) AS BIGINT) AS cu FROM uni GROUP BY t
             |), ut AS (SELECT CAST(sum(cu) AS HUGEINT) AS u FROM cu),
             |bt AS (
             |  SELECT CAST(sum(greatest(len(w) - 1, 0)) AS HUGEINT) AS b
             |  FROM tok
             |), bi AS (
             |  SELECT unnest([array_to_string(w[i:i+1], ' ')
             |    for i in range(1, len(w))]) AS bigram
             |  FROM tok
             |), cc AS (
             |  SELECT bigram, CAST(count(*) AS BIGINT) AS cab
             |  FROM bi GROUP BY bigram HAVING count(*) >= 5
             |), j AS (
             |  SELECT cc.bigram, cab, a.cu AS ca, bb.cu AS cb, u, b
             |  FROM cc
             |  JOIN cu a ON a.t = string_split(cc.bigram, ' ')[1]
             |  JOIN cu bb ON bb.t = string_split(cc.bigram, ' ')[2]
             |  CROSS JOIN ut CROSS JOIN bt
             |)
             |SELECT bigram, cab AS n_pair, ca AS n_first, cb AS n_second,
             |  CAST((CAST(cab AS HUGEINT) * u * 10000 // ca) * u * 100
             |    // (CAST(cb AS HUGEINT) * b) AS BIGINT) AS lift_x1e6
             |FROM j ORDER BY lift_x1e6 DESC, bigram LIMIT 20""".stripMargin)),

    // SK2: salted EXACT distinct-count for skewed group keys — sk1's
    // aggregation sibling. count(DISTINCT user) keeps per-key dedup
    // state; one hot event_type concentrates that state (and its sort)
    // in one task. Salting by hash(user) % 16 splits it 16 ways and
    // stays EXACT — the same user always lands in the same salt bucket,
    // so per-(key, salt) distinct counts are additive. Stage 2 merges
    // |keys|·16 scalar rows. The oracle is the plain count(DISTINCT):
    // identical result is the whole point, as with sk1.
    Q("sk2_skew_salted_agg",
      (s, d) => {
        val ev = events(s, d).select(col("event_type"), col("user_id"))
        ev.withColumn("salt", pmod(hash(col("user_id")), lit(16)))
          .groupBy(col("event_type"), col("salt"))
          .agg(countDistinct(col("user_id")).as("du"))
          .groupBy(col("event_type"))
          .agg(sum(col("du")).as("n_users"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY event_type ORDER BY event_type"""
        .stripMargin)),

    // A31: Cramér's V effect size — the answer to "a26 rejected
    // independence, but is the association LARGE?": chi² is sample-size
    // inflated (doubles when the corpus doubles at fixed association),
    // V² = chi²/(N·(min(r,k)−1)) ∈ [0,1] is the scale-free readout a
    // mixture designer actually thresholds. Same one-scan contingency
    // shape and adaptive-truncation term arithmetic as a26 (see there
    // for the overflow sizing); sqrt-free by emitting V² at the 1e6
    // grain, exactly as g13 emits r². One summary row at any scale.
    Q("a31_cramers_v",
      (s, d) => {
        // a26's materialization cut verbatim: the unmaterialized
        // contingency frame scanned documents six times (scan census)
        val obs = graft.Scratch.cut(s, s"a31_obs_${graft.Scratch.key(d)}")(
          documents(s, d).select(col("lang"), col("source"))
            .groupBy(col("lang"), col("source"))
            .agg(count(lit(1)).as("o"))
            .coalesce(1))
        val rt = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
        val ct = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
        val tot = obs.agg(sum(col("o")).as("nn"))
        val dims = rt.agg(count(lit(1)).as("nl"))
          .crossJoin(broadcast(ct.agg(count(lit(1)).as("ns"))))
        val chi2 = rt.crossJoin(broadcast(ct))
          .join(obs, Seq("lang", "source"), "left")
          .crossJoin(broadcast(tot))
          .select(coalesce(col("o"), lit(0L)).as("o"),
            col("r").cast("decimal(38,0)").as("r"),
            col("c").cast("decimal(38,0)").as("c"),
            col("nn").cast("decimal(38,0)").as("nn"))
          .select(col("nn"), expr("o * nn - r * c").as("u"),
            expr("r * c * nn").as("den"))
          .select(col("nn"), col("u"), col("den"),
            expr("""CAST(concat('1', repeat('0', greatest(0,
                   |  length(CAST(abs(u) AS STRING)) - 16,
                   |  length(CAST(den AS STRING)) - 18)))
                   | AS DECIMAL(38,0))""".stripMargin).as("tr"))
          .select(col("nn"),
            expr("""CAST(u div tr AS DECIMAL(38,0))
                   | * CAST(u div tr AS DECIMAL(38,0)) * 1000000
                   | div nullif(den div tr div tr, 0)""".stripMargin)
              .as("term_x1e6"))
          .groupBy(col("nn"))
          .agg(sum(col("term_x1e6")).as("chi2_x1e6"))
        chi2.crossJoin(broadcast(dims))
          .select(col("nn").cast("long").as("n_docs"),
            col("chi2_x1e6"),
            ((col("nl") - 1) * (col("ns") - 1)).as("df"),
            least(col("nl"), col("ns")).as("k_min"),
            expr("""chi2_x1e6 div (CAST(nn AS DECIMAL(38,0))
                   | * (least(nl, ns) - 1))""".stripMargin).as("v2_x1e6"))
      },
      Some("""WITH obs AS (
             |  SELECT lang, source, CAST(count(*) AS BIGINT) AS o
             |  FROM documents GROUP BY lang, source
             |), rt AS (
             |  SELECT lang, CAST(sum(o) AS BIGINT) AS r
             |  FROM obs GROUP BY lang
             |), ct AS (
             |  SELECT source, CAST(sum(o) AS BIGINT) AS c
             |  FROM obs GROUP BY source
             |), tot AS (SELECT CAST(sum(o) AS BIGINT) AS nn FROM obs),
             |dims AS (
             |  SELECT (SELECT count(*) FROM rt) AS nl,
             |         (SELECT count(*) FROM ct) AS ns
             |), cells AS (
             |  SELECT nn, coalesce(obs.o, 0) * nn - rt.r * ct.c AS u,
             |    rt.r * ct.c * nn AS den
             |  FROM rt CROSS JOIN ct
             |  LEFT JOIN obs ON rt.lang = obs.lang AND ct.source = obs.source
             |  CROSS JOIN tot
             |), scaled AS (
             |  SELECT *, CAST('1' || repeat('0', greatest(0,
             |      length(CAST(abs(u) AS VARCHAR)) - 16,
             |      length(CAST(den AS VARCHAR)) - 18)) AS HUGEINT) AS tr
             |  FROM cells
             |), total AS (
             |  SELECT nn, sum((u // tr) * (u // tr) * 1000000
             |    // nullif(den // tr // tr, 0)) AS chi2_x1e6
             |  FROM scaled GROUP BY nn
             |)
             |SELECT CAST(nn AS BIGINT) AS n_docs,
             |  CAST(chi2_x1e6 AS BIGINT) AS chi2_x1e6,
             |  CAST((nl - 1) * (ns - 1) AS BIGINT) AS df,
             |  CAST(least(nl, ns) AS BIGINT) AS k_min,
             |  CAST(chi2_x1e6 // (CAST(nn AS HUGEINT) * (least(nl, ns) - 1))
             |    AS BIGINT) AS v2_x1e6
             |FROM total CROSS JOIN dims""".stripMargin)),

    // T26: hapax-legomena audit per source — the vocabulary-health
    // signal beside t24's growth curve: a source whose vocabulary is
    // mostly singletons is OCR noise / boilerplate-ID soup; one whose
    // hapax share collapses is template spam. All exact integers off
    // ONE (source, token) count frame: vocab = rows, hapax = count-1
    // rows, tokens = summed counts — partial-combining aggregates end
    // to end, output is |sources| rows at any corpus size.
    Q("t26_hapax_ratio",
      (s, d) => {
        val tc = documents(s, d)
          .select(col("source"), explode(tokens(col("text"))).as("t"))
          .groupBy(col("source"), col("t"))
          .agg(count(lit(1)).as("cnt"))
        tc.groupBy(col("source"))
          .agg(sum(col("cnt")).as("n_tokens"),
            count(lit(1)).as("vocab"),
            sum((col("cnt") === 1).cast("long")).as("hapax"))
          .select(col("source"), col("n_tokens"), col("vocab"), col("hapax"),
            expr("hapax * 1000000 div vocab").as("hapax_ratio_x1e6"))
          .orderBy("source")
      },
      Some("""WITH tc AS (
             |  SELECT source, t, CAST(count(*) AS BIGINT) AS cnt
             |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS t
             |        FROM documents) u
             |  GROUP BY source, t
             |)
             |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS vocab,
             |  CAST(sum(CAST(cnt = 1 AS BIGINT)) AS BIGINT) AS hapax,
             |  CAST(sum(CAST(cnt = 1 AS BIGINT)) * 1000000 // count(*)
             |    AS BIGINT) AS hapax_ratio_x1e6
             |FROM tc GROUP BY source ORDER BY source""".stripMargin)),

    // J18: Bloom-filtered join — the semi-join reduction a 100 TB fact
    // scan pays FIRST so the shuffle doesn't: the dim-side key set
    // builds a fixed-size bloom sketch (operators/Bloom — distributed
    // partial-combining build, only the bit array reaches the driver),
    // the probe evaluates as a codegen'd MAP-SIDE predicate on the fact
    // table, and only survivors (matches + the ~1% false positives)
    // enter the exact join that removes the FPs. The result is
    // IDENTICAL to the plain join — which is exactly what the oracle
    // checks, sk1-style. Spark's own InjectRuntimeFilter makes this
    // same move when statistics let it; the library call makes it
    // deterministic and reusable from any later job against a sketch
    // built once.
    Q("j18_bloom_filtered_join",
      (s, d) => {
        val small = part(s, d).filter(col("p_size") < 10)
          .select(col("p_partkey"), col("p_brand"))
        val bloom = graft.operators.Bloom.build(small, col("p_partkey"),
          expectedItems = 65536L,
          numBits = graft.operators.Bloom.optimalNumBits(65536L, 0.01))
        val big = lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity").cast("long").as("q"))
          .filter(graft.operators.Bloom.mightContain(bloom, col("l_partkey")))
        big.join(broadcast(small), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n"), sum(col("q")).as("sum_qty"))
          .orderBy("p_brand")
      },
      Some("""SELECT p_brand, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_size < 10
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // A32: two-proportion z-test — the conversion-rate A/B readout
    // (a20 compares MEANS, a28/a29 distributions; this compares the
    // binomial rates product teams actually ship on): users split into
    // deterministic variants by user_id parity, success = the user
    // purchased at least once. The pooled z² = D²·N/(n1·n2·X·(N−X))
    // with D = x1·n2 − x2·n1 is rational in counts, so the alpha=0.05
    // decision is EXACT integer arithmetic — divided through by
    // (n1·n2)² before squaring (a28/a29's rule): q = |D|·1e6 div
    // (n1·n2) <= 1e6 and both sides ride DECIMAL(38,0) vs HUGEINT to
    // beyond 1e10 users. One scan: per-user partial-combining max,
    // then a 2-row variant aggregate.
    Q("a32_two_proportion",
      (s, d) => {
        val perUser = events(s, d)
          .select((col("user_id") % 2).as("variant"), col("user_id"),
            (col("event_type") === "purchase").cast("long").as("p"))
          .groupBy(col("variant"), col("user_id"))
          .agg(max(col("p")).as("purchased"))
        val v = perUser.groupBy(col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("purchased")).as("x"))
        val a = v.filter(col("variant") === 0)
          .select(col("n").as("n1"), col("x").as("x1"))
        val b = v.filter(col("variant") === 1)
          .select(col("n").as("n2"), col("x").as("x2"))
        a.crossJoin(broadcast(b))
          .select(col("n1"), col("x1"), col("n2"), col("x2"),
            expr("x1 * 1000000 div n1").as("p1_x1e6"),
            expr("x2 * 1000000 div n2").as("p2_x1e6"),
            // both sides divided through by (n1·n2)²·N: q <= 1e6 keeps
            // the LHS at q²·1e4 <= 1e16 (int64), and X(N−X)/(n1·n2·N)
            // <= 1/4 + eps for ANY split keeps the RHS quotient under
            // ~1e16 too — no long-lowered `div` can overflow at any
            // scale or imbalance
            expr("""CAST(
                   |  (abs(CAST(x1 AS DECIMAL(38,0)) * n2
                   |       - CAST(x2 AS DECIMAL(38,0)) * n1) * 1000000
                   |     div (CAST(n1 AS DECIMAL(38,0)) * n2))
                   |  * (abs(CAST(x1 AS DECIMAL(38,0)) * n2
                   |       - CAST(x2 AS DECIMAL(38,0)) * n1) * 1000000
                   |     div (CAST(n1 AS DECIMAL(38,0)) * n2))
                   |  * 10000
                   |  > 38416 * CAST(x1 + x2 AS DECIMAL(38,0))
                   |    * (n1 + n2 - x1 - x2) * 1000000000000
                   |    div (CAST(n1 AS DECIMAL(38,0)) * n2 * (n1 + n2))
                   | AS INT)""".stripMargin).as("reject_05"))
      },
      Some("""WITH pu AS (
             |  SELECT user_id % 2 AS variant, user_id,
             |    max(CAST(event_type = 'purchase' AS BIGINT)) AS purchased
             |  FROM events GROUP BY variant, user_id
             |), v AS (
             |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(purchased) AS BIGINT) AS x
             |  FROM pu GROUP BY variant
             |), ab AS (
             |  SELECT a.n AS n1, a.x AS x1, b.n AS n2, b.x AS x2
             |  FROM (SELECT n, x FROM v WHERE variant = 0) a
             |  CROSS JOIN (SELECT n, x FROM v WHERE variant = 1) b
             |)
             |SELECT n1, x1, n2, x2,
             |  CAST(x1 * 1000000 // n1 AS BIGINT) AS p1_x1e6,
             |  CAST(x2 * 1000000 // n2 AS BIGINT) AS p2_x1e6,
             |  CAST(
             |    (abs(CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
             |       * 1000000 // (CAST(n1 AS HUGEINT) * n2))
             |    * (abs(CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1)
             |       * 1000000 // (CAST(n1 AS HUGEINT) * n2))
             |    * 10000
             |    > 38416 * CAST(x1 + x2 AS HUGEINT)
             |      * (n1 + n2 - x1 - x2) * 1000000000000
             |      // (CAST(n1 AS HUGEINT) * n2 * (n1 + n2))
             |   AS INT) AS reject_05
             |FROM ab""".stripMargin)),

    // A37: CUPED variance reduction (Deng et al. 2013, "Improving the
    // Sensitivity of Online Controlled Experiments") — the standard
    // industrial upgrade to a20/a32's A/B readouts: regress each user's
    // post-period metric on their PRE-period metric (theta = Cov(X,Y)/
    // Var(X), a25's slope verbatim), subtract the predictable component,
    // and compare ADJUSTED variant means whose variance shrinks by rho².
    // Exact-integer end to end: the cutoff is c10's integer-nanos
    // midpoint (broadcast scalar), per-user (x, y) cents ride one
    // conditional-sum pass, the five sufficient statistics accumulate in
    // DECIMAL(38,0) vs HUGEINT, theta and rho² apply a25's adaptive
    // shared-digit truncation, and the adjusted means fix their
    // truncation points explicitly (centered pre-mean diff at the
    // half-cent x100 grain, then the theta product divided back down) so
    // both engines state the identical integer chain — HeadroomAudit
    // carries the full magnitude derivation. Scale shape: one min/max
    // scan for the cutoff, then ONE fact scan feeding the per-user
    // partial-combining aggregate, whose eleven sufficient statistics
    // (pooled moments + per-variant conditional counts/sums) ride a
    // single one-row aggregate; everything downstream is scalar algebra
    // (PlanSpec pins the two-scan shape).
    Q("a37_cuped",
      (s, d) => {
        val ev = events(s, d).select(col("user_id"), col("ts"),
          round(col("value") * 100).cast("long").as("c"))
        val cut = ev.agg(expr("(min(ts) + max(ts)) div 2").as("cut"))
        val perUser = ev.crossJoin(broadcast(cut))
          .groupBy(col("user_id"))
          .agg(coalesce(sum(when(col("ts") < col("cut"), col("c"))), lit(0L))
            .as("x"),
            coalesce(sum(when(col("ts") >= col("cut"), col("c"))), lit(0L))
              .as("y"))
          .select(col("user_id"), (col("user_id") % 2).as("variant"),
            col("x").cast("decimal(38,0)").as("x"),
            col("y").cast("decimal(38,0)").as("y"))
        // ALL eleven sufficient statistics (pooled moments + per-variant
        // counts/sums as conditional aggregates) ride ONE pass over
        // perUser — separate st/va/vb frames recomputed the per-user
        // aggregate (and its events scan) three times (ADVICE r13);
        // PlanSpec pins the events scan count at 2 (cutoff + fact pass).
        val st = perUser.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"),
          count(when(col("variant") === 0, 1)).as("n_a"),
          sum(when(col("variant") === 0, col("x"))).as("sx_a"),
          sum(when(col("variant") === 0, col("y"))).as("sy_a"),
          count(when(col("variant") === 1, 1)).as("n_b"),
          sum(when(col("variant") === 1, col("x"))).as("sx_b"),
          sum(when(col("variant") === 1, col("y"))).as("sy_b"))
        st.select(col("n"), col("n_a"), col("n_b"),
            expr("n * sxy - sx * sy").as("rnum"),
            expr("n * sxx - sx * sx").as("rdenx"),
            expr("n * syy - sy * sy").as("rdeny"),
            col("sx"), col("sx_a"), col("sx_b"),
            col("sy_a"), col("sy_b"))
          // a25's adaptive truncation for theta and rho²
          .select(col("*"),
            expr("""CAST(concat('1', repeat('0', greatest(0,
                   |  length(CAST(abs(rnum) AS STRING)) - 16,
                   |  length(CAST(rdenx AS STRING)) - 18,
                   |  length(CAST(rdeny AS STRING)) - 18)))
                   | AS DECIMAL(38,0))""".stripMargin).as("tr"))
          .select(col("n"), col("n_a"), col("n_b"),
            expr("""CAST(rnum div tr AS DECIMAL(38,0)) * 1000000
                   | div nullif(CAST(rdenx div tr AS DECIMAL(38,0)), 0)"""
              .stripMargin).as("theta_x1e6"),
            expr("""CAST(rnum div tr AS DECIMAL(38,0))
                   | * CAST(rnum div tr AS DECIMAL(38,0)) * 1000000
                   | div nullif(CAST(rdenx div tr AS DECIMAL(38,0))
                   |   * CAST(rdeny div tr AS DECIMAL(38,0)), 0)"""
              .stripMargin).as("rho2_x1e6"),
            col("sx"), col("sx_a"), col("sx_b"), col("sy_a"), col("sy_b"))
          .select(col("n"), col("n_a"), col("n_b"), col("theta_x1e6"),
            col("rho2_x1e6"),
            // centered pre-mean diff at the x100 grain, then the theta
            // product divided back down — the truncation points ARE the
            // statistic's definition (both engines state them verbatim)
            // theta_x1e6 comes off a long-lowered `div`, so the theta
            // product must be LIFTED back to DECIMAL(38,0) before the
            // multiply (the a25 rule) — in int64 it overflows at the
            // audited ~1e19 bound while DuckDB rides HUGEINT (ADVICE
            // r13); the n_a*n divisor rides decimal too so no factor
            // pair is int64-bounded by luck
            expr("""sy_a * 1000000 div nullif(n_a, 0)
                   | - CAST(theta_x1e6 AS DECIMAL(38,0))
                   |     * ((sx_a * n - sx * n_a) * 100
                   |     div nullif(CAST(n_a AS DECIMAL(38,0)) * n, 0))
                   |     div 100"""
              .stripMargin).cast("long").as("adj_mean_a_x1e6"),
            expr("""sy_b * 1000000 div nullif(n_b, 0)
                   | - CAST(theta_x1e6 AS DECIMAL(38,0))
                   |     * ((sx_b * n - sx * n_b) * 100
                   |     div nullif(CAST(n_b AS DECIMAL(38,0)) * n, 0))
                   |     div 100"""
              .stripMargin).cast("long").as("adj_mean_b_x1e6"))
          .select(col("n"), col("n_a"), col("n_b"), col("theta_x1e6"),
            col("rho2_x1e6"), col("adj_mean_a_x1e6"), col("adj_mean_b_x1e6"),
            (col("adj_mean_a_x1e6") - col("adj_mean_b_x1e6"))
              .as("adj_diff_x1e6"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, epoch_ns(ts) AS tns,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), cut AS (
             |  SELECT (min(tns) + max(tns)) // 2 AS cut FROM ev
             |), pu AS (
             |  SELECT user_id, user_id % 2 AS variant,
             |    CAST(coalesce(sum(CASE WHEN tns < cut THEN c END), 0)
             |      AS HUGEINT) AS x,
             |    CAST(coalesce(sum(CASE WHEN tns >= cut THEN c END), 0)
             |      AS HUGEINT) AS y
             |  FROM ev CROSS JOIN cut GROUP BY 1, 2
             |), st AS (
             |  SELECT CAST(count(*) AS HUGEINT) AS n,
             |    sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             |    sum(x * y) AS sxy, sum(y * y) AS syy
             |  FROM pu
             |), va AS (
             |  SELECT CAST(count(*) AS HUGEINT) AS n_a,
             |    sum(x) AS sx_a, sum(y) AS sy_a
             |  FROM pu WHERE variant = 0
             |), vb AS (
             |  SELECT CAST(count(*) AS HUGEINT) AS n_b,
             |    sum(x) AS sx_b, sum(y) AS sy_b
             |  FROM pu WHERE variant = 1
             |), rr AS (
             |  SELECT n, n_a, n_b,
             |    n * sxy - sx * sy AS rnum,
             |    n * sxx - sx * sx AS rdenx,
             |    n * syy - sy * sy AS rdeny,
             |    sx, sx_a, sx_b, sy_a, sy_b
             |  FROM st CROSS JOIN va CROSS JOIN vb
             |), scaled AS (
             |  SELECT *, CAST('1' || repeat('0', greatest(0,
             |      length(CAST(abs(rnum) AS VARCHAR)) - 16,
             |      length(CAST(rdenx AS VARCHAR)) - 18,
             |      length(CAST(rdeny AS VARCHAR)) - 18)) AS HUGEINT) AS tr
             |  FROM rr
             |), th AS (
             |  SELECT *,
             |    (rnum // tr) * 1000000 // nullif(rdenx // tr, 0)
             |      AS theta_x1e6
             |  FROM scaled
             |)
             |SELECT CAST(n AS BIGINT) AS n, CAST(n_a AS BIGINT) AS n_a,
             |  CAST(n_b AS BIGINT) AS n_b,
             |  CAST(theta_x1e6 AS BIGINT) AS theta_x1e6,
             |  CAST((rnum // tr) * (rnum // tr) * 1000000
             |    // nullif((rdenx // tr) * (rdeny // tr), 0) AS BIGINT)
             |    AS rho2_x1e6,
             |  CAST(sy_a * 1000000 // nullif(n_a, 0)
             |    - theta_x1e6 * ((sx_a * n - sx * n_a) * 100
             |        // nullif(n_a * n, 0)) // 100 AS BIGINT)
             |    AS adj_mean_a_x1e6,
             |  CAST(sy_b * 1000000 // nullif(n_b, 0)
             |    - theta_x1e6 * ((sx_b * n - sx * n_b) * 100
             |        // nullif(n_b * n, 0)) // 100 AS BIGINT)
             |    AS adj_mean_b_x1e6,
             |  CAST((sy_a * 1000000 // nullif(n_a, 0)
             |    - theta_x1e6 * ((sx_a * n - sx * n_a) * 100
             |        // nullif(n_a * n, 0)) // 100)
             |   - (sy_b * 1000000 // nullif(n_b, 0)
             |    - theta_x1e6 * ((sx_b * n - sx * n_b) * 100
             |        // nullif(n_b * n, 0)) // 100) AS BIGINT)
             |    AS adj_diff_x1e6
             |FROM th""".stripMargin)),

    // A38: minimum detectable effect — the PLANNING face completing the
    // A/B tier (a20 Welch analyzes, a32 decides, a37 sharpens; this
    // answers "is the experiment even worth running": the smallest true
    // mean shift a 50/50 split of this population detects at
    // alpha=.05 / power=.80). Emitted SQUARED so no sqrt ever forms —
    // MDE² = (z_.975 + z_.80)² · 2σ²/n_arm with the z-sum squared as
    // the rational constant 7848963/1e6 ((1.959964 + 0.841621)²,
    // correctly rounded) — the a28 squared-threshold discipline applied
    // to power analysis. σ² is the truncated-integer population
    // variance (n·Q − S²) div n² in exact cents² (one partial-combining
    // aggregate per event_type; DECIMAL(38,0) vs HUGEINT since n·Q
    // reaches ~1e39-risky only via the a25 rule — see the headroom
    // entry for the chain). Scale shape: one fact scan, |types| output
    // rows at any corpus size.
    Q("a38_mde",
      (s, d) => {
        val ev = events(s, d).select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
        ev.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("c").cast("decimal(38,0)")).as("sc"),
            sum(col("c").cast("decimal(38,0)") * col("c")).as("q"))
          .select(col("event_type"), col("n"),
            expr("(n * q - sc * sc) div (CAST(n AS DECIMAL(38,0)) * n)")
              .as("var_c2"))
          .select(col("event_type"), col("n"), col("var_c2"),
            // MDE²·1e4 in cents²: 7848963·2·σ²·1e4 div (1e6·(n div 2))
            expr("""CAST(7848963 AS DECIMAL(38,0)) * 2 * var_c2 * 10000
                   | div nullif(1000000 * (n div 2), 0)""".stripMargin)
              .as("mde2_x1e4"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
             |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), st AS (
             |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(c AS HUGEINT)) AS sc,
             |    sum(CAST(c AS HUGEINT) * c) AS q
             |  FROM ev GROUP BY event_type
             |), v AS (
             |  SELECT event_type, n,
             |    (n * q - sc * sc) // (n * n) AS var_c2
             |  FROM st
             |)
             |SELECT event_type, CAST(n AS BIGINT) AS n,
             |  CAST(var_c2 AS BIGINT) AS var_c2,
             |  CAST(7848963::HUGEINT * 2 * var_c2 * 10000
             |    // nullif(1000000 * (n // 2), 0) AS BIGINT) AS mde2_x1e4
             |FROM v ORDER BY event_type""".stripMargin)),

    // A35: lag-k autocorrelation (ACF at k = 1..3) of the hourly value
    // series — the "is today like yesterday" diagnostic behind w11/w13's
    // smoothing constants and w16's changepoint prior. Exact-integer
    // throughout (HeadroomAudit-checked): bins are exact cent sums, the
    // center is the TRUNCATED mean mu = S div n (a defined statistic both
    // engines state identically — no float mean), deviations d_i = x_i −
    // mu ride DECIMAL(38,0) vs HUGEINT (|d| <= ~3e12 at 100 TB hourly
    // grain, so d_i·d_{i+k} <= 1e25 and the sums <= 3e32), and r_k·1e6
    // applies a25's adaptive shared-digit truncation since |N_k| <= D can
    // put N_k·1e6 past decimal38's ceiling at the extreme. Scale shape:
    // one partial-combining groupBy builds the bins, GlobalRank's
    // two-phase pass ranks them (no single-partition window), the ranked
    // frame is MATERIALIZED once (a34's discipline — the lag self-join
    // keys rk vs rk+lag, different shuffle expressions, no reuse), and
    // every scalar is a broadcast.
    Q("a35_acf",
      (s, d) => {
        import graft.operators.GlobalRank
        val byBin = events(s, d)
          .select(expr("ts div 3600000000000").as("bin"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy(col("bin")).agg(sum(col("c")).as("x"))
        val dir = graft.Scratch.dir(s, "a35_ranked")
        GlobalRank.withRowNumber(byBin, Seq(col("bin").asc), "rk")
          .select(col("rk"), col("x"))
          .write.mode("overwrite").parquet(dir)
        val ranked = s.read.parquet(dir)
        val tot = ranked.agg(
          sum(col("x").cast("decimal(38,0)")).as("sx"),
          count(lit(1)).as("n"))
          .select(expr("sx div n").as("mu"), col("n"))
        val dstat = ranked.crossJoin(broadcast(tot))
          .select((col("x").cast("decimal(38,0)") - col("mu")).as("dd"))
          .agg(sum(col("dd") * col("dd")).as("d2"))
        val lags = ranked.sparkSession.range(1, 4)
          .select(col("id").as("lag"))
        val pairs = ranked.crossJoin(broadcast(lags))
          .select(col("lag"), (col("rk") + col("lag")).as("rk_b"),
            col("x").as("xa"))
          .join(ranked.select(col("rk").as("rk_b"), col("x").as("xb")),
            Seq("rk_b"))
        pairs.crossJoin(broadcast(tot)).crossJoin(broadcast(dstat))
          .groupBy(col("lag"), col("d2"))
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("xa").cast("decimal(38,0)") - col("mu"))
              * (col("xb").cast("decimal(38,0)") - col("mu"))).as("nk"))
          // adaptive shared-digit truncation (a25): |N_k| <= D, so
          // N_k·1e6 can pass decimal38 only at the extreme — drop the
          // same tr = 10^max(0, digits(|N_k|)−31, digits(D)−18) low
          // digits on both engines; tr = 1 (bit-exact) at any test SF
          .select(col("lag"), col("n_pairs"),
            expr("""CAST(concat('1', repeat('0', greatest(0,
                   |  length(CAST(abs(nk) AS STRING)) - 31,
                   |  length(CAST(d2 AS STRING)) - 18)))
                   | AS DECIMAL(38,0))""".stripMargin).as("tr"),
            col("nk"), col("d2"))
          .select(col("lag"), col("n_pairs"),
            expr("""CAST(nk div tr AS DECIMAL(38,0)) * 1000000
                   | div nullif(CAST(d2 div tr AS DECIMAL(38,0)), 0)"""
              .stripMargin).as("r_x1e6"))
          .orderBy("lag")
      },
      Some("""WITH bins AS (
             |  SELECT epoch_ns(ts) // 3600000000000 AS bin,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS x
             |  FROM events GROUP BY 1
             |), ranked AS (
             |  SELECT CAST(row_number() OVER (ORDER BY bin) AS BIGINT)
             |    AS rk, x
             |  FROM bins
             |), tot AS (
             |  SELECT CAST(sum(CAST(x AS HUGEINT)) // count(*) AS HUGEINT)
             |    AS mu, CAST(count(*) AS BIGINT) AS n
             |  FROM ranked
             |), ds AS (
             |  SELECT sum((CAST(x AS HUGEINT) - mu)
             |    * (CAST(x AS HUGEINT) - mu)) AS d2
             |  FROM ranked CROSS JOIN tot
             |), nk AS (
             |  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    sum((CAST(a.x AS HUGEINT) - mu)
             |      * (CAST(b.x AS HUGEINT) - mu)) AS nk
             |  FROM (SELECT unnest([1, 2, 3]) AS lag) l
             |  JOIN ranked a ON true
             |  JOIN ranked b ON b.rk = a.rk + l.lag
             |  CROSS JOIN tot
             |  GROUP BY l.lag
             |), scaled AS (
             |  SELECT lag, n_pairs, nk, d2,
             |    CAST('1' || repeat('0', greatest(0,
             |      length(CAST(abs(nk) AS VARCHAR)) - 31,
             |      length(CAST(d2 AS VARCHAR)) - 18)) AS HUGEINT) AS tr
             |  FROM nk CROSS JOIN ds
             |)
             |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             |  CAST((nk // tr) * 1000000
             |    // nullif(d2 // tr, 0) AS BIGINT) AS r_x1e6
             |FROM scaled ORDER BY lag""".stripMargin)),

    // A36: odds ratio (effect size for a32's two-proportion decision,
    // the way a31 Cramér's V sizes a26's chi-square) — OR·1e6 =
    // x1·(n2−x2)·1e6 / (x2·(n1−x1)) as exact integer arithmetic with a
    // SATURATION bound: the true OR is unbounded (a zero denominator
    // cell makes it infinite), so the statistic is defined as saturated
    // at 1e6x (emit 1e12) — the CASE tests num > den·1e6 FIRST, so
    // num·1e6 is only formed when it fits decimal38 (num <= den·1e6 <=
    // 1e32) and the lowered quotient is <= 1e12, inside int64 at any
    // scale or imbalance (HeadroomAudit entry states the chain).
    // 0/0 (a degenerate arm) emits NULL on both engines.
    Q("a36_odds_ratio",
      (s, d) => {
        val perUser = events(s, d)
          .select((col("user_id") % 2).as("variant"), col("user_id"),
            (col("event_type") === "purchase").cast("long").as("p"))
          .groupBy(col("variant"), col("user_id"))
          .agg(max(col("p")).as("purchased"))
        val v = perUser.groupBy(col("variant"))
          .agg(count(lit(1)).as("n"), sum(col("purchased")).as("x"))
        val a = v.filter(col("variant") === 0)
          .select(col("n").as("n1"), col("x").as("x1"))
        val b = v.filter(col("variant") === 1)
          .select(col("n").as("n2"), col("x").as("x2"))
        a.crossJoin(broadcast(b))
          .select(col("n1"), col("x1"), col("n2"), col("x2"),
            expr("CAST(x1 AS DECIMAL(38,0)) * (n2 - x2)").as("num"),
            expr("CAST(x2 AS DECIMAL(38,0)) * (n1 - x1)").as("den"))
          .select(col("n1"), col("x1"), col("n2"), col("x2"),
            expr("""CASE WHEN num = 0 AND den = 0 THEN NULL
                   | WHEN den = 0 OR num > den * 1000000
                   |   THEN 1000000000000
                   | ELSE num * 1000000 div den END""".stripMargin)
              .cast("long").as("or_x1e6"),
            expr("CAST(num > den AS INT)").as("favors_variant0"))
      },
      Some("""WITH pu AS (
             |  SELECT user_id % 2 AS variant, user_id,
             |    max(CAST(event_type = 'purchase' AS BIGINT)) AS purchased
             |  FROM events GROUP BY 1, 2
             |), v AS (
             |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(purchased) AS BIGINT) AS x
             |  FROM pu GROUP BY variant
             |), ab AS (
             |  SELECT a.n AS n1, a.x AS x1, b.n AS n2, b.x AS x2,
             |    CAST(a.x AS HUGEINT) * (b.n - b.x) AS num,
             |    CAST(b.x AS HUGEINT) * (a.n - a.x) AS den
             |  FROM (SELECT n, x FROM v WHERE variant = 0) a
             |  CROSS JOIN (SELECT n, x FROM v WHERE variant = 1) b
             |)
             |SELECT n1, x1, n2, x2,
             |  CAST(CASE WHEN num = 0 AND den = 0 THEN NULL
             |    WHEN den = 0 OR num > den * 1000000
             |      THEN 1000000000000
             |    ELSE num * 1000000 // den END AS BIGINT) AS or_x1e6,
             |  CAST(num > den AS INT) AS favors_variant0
             |FROM ab""".stripMargin)),

    // A39: sample-ratio mismatch (SRM) guard — the sanity check every
    // A/B readout (a20/a32/a36/a37/a38) silently assumes: the 50/50
    // user_id % 2 assignment actually LANDED 50/50. A skewed split means
    // broken bucketing/logging, and the convention (Fabijan et al. 2019,
    // "Diagnosing Sample Ratio Mismatch") is a chi-square test at the
    // strict alpha = 0.001 so the guard page only fires on real
    // breakage. For two cells at 50/50 the statistic collapses to
    // z² = (n_a − n_b)²/N exactly, so the decision is the pure-integer
    // inequality diff²·1000 > 10828·N (chi²_1(0.001) = 10.828) with
    // diff² in DECIMAL(38,0) vs HUGEINT — int64 dies past |diff| ≈ 3e9
    // users (HeadroomAudit carries the bound). Scale shape: one distinct
    // (shuffle on user_id with partial aggregation) then a one-row
    // conditional aggregate; no joins at all.
    Q("a39_srm",
      (s, d) => {
        val pu = events(s, d).select(col("user_id")).distinct()
          .select((col("user_id") % 2).as("variant"))
        pu.agg(count(lit(1)).as("n"),
            coalesce(sum(col("variant")), lit(0L)).as("n_b"))
          .select(col("n"), (col("n") - col("n_b")).as("n_a"), col("n_b"),
            expr("CAST(n - n_b - n_b AS DECIMAL(38,0))").as("diff"))
          .select(col("n"), col("n_a"), col("n_b"),
            expr("diff * diff * 1000 div nullif(n, 0)").as("z2_x1e3"),
            expr("""CAST(diff * diff * 1000
                   | > CAST(10828 AS DECIMAL(38,0)) * n AS INT)"""
              .stripMargin).as("srm_alarm"))
      },
      Some("""WITH pu AS (
             |  SELECT DISTINCT user_id FROM events
             |), v AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(coalesce(sum(user_id % 2), 0) AS BIGINT) AS n_b
             |  FROM pu
             |), ab AS (
             |  SELECT n, n - n_b AS n_a, n_b,
             |    CAST(n - n_b - n_b AS HUGEINT) AS diff
             |  FROM v
             |)
             |SELECT n, n_a, n_b,
             |  CAST(diff * diff * 1000 // nullif(n, 0) AS BIGINT)
             |    AS z2_x1e3,
             |  CAST(diff * diff * 1000 > 10828::HUGEINT * n AS INT)
             |    AS srm_alarm
             |FROM ab""".stripMargin)),

    // W19: Theil–Sen robust trend — the median of all pairwise slopes of
    // the DAILY mean-cents series (Sen 1968), the estimator that
    // tolerates 29% contamination where a25's OLS slope is wrecked by
    // one bad day. Everything is exact integers: the day level is the
    // truncated mean y = (Σcents·100) div n (a defined statistic, stated
    // identically in both engines), each pair's slope is the truncated
    // (y_j − y_i)·1e6 div (d_j − d_i) ≤ 1e15 (y ≤ 1e9 at the x100 grain,
    // so every quotient rides int64 with no wide-integer product), and
    // the median is the exact lower-median order statistic (min slope
    // with 2·cum ≥ n_pairs, a30's discrete-quartile rule). Scale shape:
    // ONE partial-combining groupBy compresses the fact table to
    // calendar-bounded daily rows (≤ ~4k/decade regardless of corpus
    // size); the pair join is a broadcast over that bounded frame
    // (n_pairs ≤ days², still calendar-bounded), the slope histogram
    // re-compresses to distinct values, and the median rides
    // GlobalRank's two-phase cumulative pass — no single-partition
    // window, no shuffle proportional to the data.
    Q("w19_theil_sen",
      (s, d) => {
        import graft.operators.GlobalRank
        // daily level materialized to scratch (the a35/d5 discipline):
        // the pair join's two sides, the histogram, and the day count
        // all consume it, and lazy lineage would re-run the fact
        // aggregate once per consumer (PlanSpec pins the zero-fact-scan
        // consumer plan)
        val dir = graft.Scratch.dir(s, "w19_daily")
        events(s, d)
          .select(expr("ts div 86400000000000").as("day"),
            round(col("value") * 100).cast("long").as("c"))
          .groupBy(col("day"))
          .agg(expr("sum(CAST(c AS DECIMAL(38,0))) * 100 div count(1)")
            .as("y"))
          .write.mode("overwrite").parquet(dir)
        val daily = s.read.parquet(dir)
        val slopes = daily.as("a")
          .join(broadcast(daily.as("b")), col("b.day") > col("a.day"))
          .select(expr("(b.y - a.y) * 1000000 div (b.day - a.day)")
            .as("slope"))
        val hist = slopes.groupBy(col("slope"))
          .agg(count(lit(1)).as("m"))
        val cum = GlobalRank.withRankAndRunningTotals(hist,
          Seq(col("slope").asc), Seq("m"), "vr", Seq("cum"))
        val tot = hist.agg(sum(col("m")).as("n_pairs"))
        val nd = daily.agg(count(lit(1)).as("n_days"))
        // the median comes off its own aggregate (one row even when the
        // series has < 2 days and cum is EMPTY — a groupBy here would
        // emit zero rows while the oracle's scalar subquery still emits
        // the (n_days, NULL, NULL) row)
        val med = cum.crossJoin(broadcast(tot))
          .agg(min(when(col("cum") * 2 >= col("n_pairs"), col("slope")))
            .as("ts_slope_x1e6"))
        nd.crossJoin(broadcast(tot)).crossJoin(broadcast(med))
          .select(col("n_days"), col("n_pairs"), col("ts_slope_x1e6"))
      },
      Some("""WITH ev AS (
             |  SELECT epoch_ns(ts) // 86400000000000 AS day,
             |    CAST(round(value * 100) AS BIGINT) AS c
             |  FROM events
             |), daily AS (
             |  SELECT day,
             |    CAST(sum(CAST(c AS HUGEINT)) * 100 // count(*) AS BIGINT)
             |      AS y
             |  FROM ev GROUP BY day
             |), pr AS (
             |  SELECT (b.y - a.y) * 1000000 // (b.day - a.day) AS slope
             |  FROM daily a JOIN daily b ON b.day > a.day
             |), hist AS (
             |  SELECT slope, CAST(count(*) AS BIGINT) AS m
             |  FROM pr GROUP BY slope
             |), cum AS (
             |  SELECT slope, m,
             |    CAST(sum(m) OVER (ORDER BY slope ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS cm
             |  FROM hist
             |), tot AS (
             |  SELECT CAST(sum(m) AS BIGINT) AS n_pairs FROM hist
             |), dd AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily
             |)
             |SELECT n_days, n_pairs,
             |  (SELECT min(slope) FROM cum, tot WHERE cm * 2 >= n_pairs)
             |    AS ts_slope_x1e6
             |FROM dd, tot""".stripMargin))
  )
}
