package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** The reference's relational operator inventory (SURVEY.md §2.2-2.7),
  * re-expressed over the synthetic star schema so each operator is checkable
  * against a DuckDB oracle. Each query cites the SURVEY §2 row it covers.
  *
  * Scale notes (100 TB thinking) are on each query; the common rules:
  *  - dimension tables (nation, region, customer at small SF) are broadcast;
  *  - aggregations are partial (map-side combine) by construction —
  *    `groupBy.agg` of sum/count/min/max lowers to HashAggregate(partial) →
  *    shuffle → HashAggregate(final);
  *  - filters/projections sit directly on the parquet scan so Catalyst
  *    pushes them down (verified via explain in BenchSpec).
  */
object RelationalQueries {
  import Tables._

  val all: Seq[Q] = Seq(
    // ----- §2.2 projections / filters / scalar predicates ---------------
    // P1: column projection + predicate; both reach the parquet scan
    // (PushedFilters + pruned ReadSchema at any scale).
    Q("p1_project_filter",
      (s, d) => lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .filter(col("l_quantity") > 45)
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_quantity > 45
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // P2: nested-field extraction out of array<struct> (the reference's
    // `recommendations.track_idx`, param_train_1st.py:58). Built by
    // collect_list(struct(..)) then GetArrayStructFields. The extracted
    // array is serialized to CSV text for the driver comparator (top-level
    // array columns are not hashable on the oracle side).
    Q("p2_nested_field",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"), col("l_partkey").as("pk")))).as("recs"))
        .select(col("l_orderkey"),
          array_join(col("recs.pk").cast("array<string>"), ",").as("parts"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             |  array_to_string(list(l_partkey ORDER BY l_linenumber, l_partkey), ',') AS parts
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // P6: null normalize / replace (EDA cell 46: year 0 -> null).
    Q("p6_null_normalize",
      (s, d) => events(s, d)
        .select(
          col("event_id"),
          when(col("value") < 1.0, lit(null)).otherwise(col("value")).as("value_n"),
          coalesce(when(col("value") < 1.0, lit(null)).otherwise(col("value")), lit(0.0))
            .as("value_filled"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CASE WHEN value < 1.0 THEN NULL ELSE value END AS value_n,
             |  coalesce(CASE WHEN value < 1.0 THEN NULL ELSE value END, 0.0) AS value_filled
             |FROM events ORDER BY event_id""".stripMargin)),

    // P7: integer arithmetic (EDA cell 34: 1-based -> 0-based ids).
    Q("p7_int_arith",
      (s, d) => events(s, d)
        .select(col("event_id"), (col("user_id") - 1).as("user0"),
          (col("event_id") % 7).as("bucket7"))
        .orderBy("event_id"),
      Some("""SELECT event_id, user_id - 1 AS user0, event_id % 7 AS bucket7
             |FROM events ORDER BY event_id""".stripMargin)),

    // P8: regex cleanup (EDA cell 99 clean_word: extract-or-'NA'), on the
    // JSON-ish events.props string.
    Q("p8_regex_clean",
      (s, d) => events(s, d)
        .select(col("event_id"),
          coalesce(nullif(regexp_extract(col("props"), "\"k\": (\\d+)", 1), lit("")),
            lit("NA")).as("kval"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
             |  coalesce(nullif(regexp_extract(props, '"k": (\d+)', 1), ''), 'NA') AS kval
             |FROM events ORDER BY event_id""".stripMargin)),

    // ----- §2.3 joins ----------------------------------------------------
    // J1: broadcast inner equi-join (param_train_1st.py:60). customer is the
    // dimension side — at 100 TB fact scale the dim still fits an executor,
    // so the explicit broadcast() hint keeps this a BroadcastHashJoin with
    // no shuffle of the fact table.
    Q("j1_broadcast_agg",
      (s, d) => orders(s, d)
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy("c_mktsegment"),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // J2: full-outer equi-join (EDA cell 35 tag assembly). Aggregate the
    // fact side first (partial agg shrinks the shuffle), then outer-join the
    // dimension.
    Q("j2_outer_join",
      (s, d) => {
        val liAgg = lineitem(s, d).groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n_li"))
        part(s, d).join(liAgg, col("p_partkey") === col("l_partkey"), "full_outer")
          .select(coalesce(col("p_partkey"), col("l_partkey")).as("partkey"),
            col("p_name"), col("n_li"))
          .orderBy("partkey")
      },
      Some("""SELECT coalesce(p_partkey, l_partkey) AS partkey, p_name, n_li
             |FROM part FULL OUTER JOIN
             |  (SELECT l_partkey, count(*) AS n_li FROM lineitem GROUP BY l_partkey) li
             |  ON p_partkey = l_partkey
             |ORDER BY partkey""".stripMargin)),

    // J3: inner equi-join chain (EDA cells 45-52), TPC-H Q5 shaped.
    // lineitem⨝orders shuffles on orderkey; customer and nation broadcast.
    Q("j3_join_chain",
      (s, d) => lineitem(s, d)
        // range predicate, not year(col): a function over the column would
        // defeat parquet predicate pushdown / row-group pruning — at 100 TB
        // that is the difference between scanning a year and the full table.
        .join(orders(s, d).filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1997-01-01")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("n_name"),
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // B2: TPC-H Q5 (local supplier volume) — the canonical 6-table
    // benchmark join, registered as a flagship shape the relational
    // layer is judged by: region->nation prune, one-year orderdate
    // range (plain range predicate so it pushes to the parquet scan,
    // j3's rule), customer/supplier co-nationality, revenue per nation.
    // Broadcast discipline at 100 TB: region/nation are true dims
    // (broadcast), supplier is SF x 10k (broadcast holds to ~SF100 and
    // AQE demotes it beyond), but customer is FACT-scale (SF x 150k) —
    // it stays a shuffle join on purpose; broadcasting it here would be
    // a bench-scale lie that dies on a real cluster. Revenue is the
    // EXACT integer form cents x (100 - discount_pct) — a 1e-4 dollar
    // grain with no float sum anywhere (j3 keeps the round(sum) float
    // variant; this row is its exactified twin), accumulated in
    // DECIMAL(38,0) vs HUGEINT since a 100 TB year of cents x pct
    // overflows int64.
    Q("b2_tpch_q5",
      (s, d) => {
        val asia = region(s, d).filter(col("r_name") === "ASIA")
        val nat = nation(s, d)
          .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val ord = orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01")
            && col("o_orderdate") < lit("1997-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        val cust = customer(s, d)
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"))
        val sup = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_x1e4"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey")
            && col("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
            .as("revenue_x1e4"), count(lit(1)).as("n_rows"))
          .orderBy(col("revenue_x1e4").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS revenue_x1e4,
             |  count(*) AS n_rows
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |  AND s_nationkey = c_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue_x1e4 DESC, n_name""".stripMargin)),

    // B3: TPC-H Q3 (shipping priority) — the second flagship beside
    // b2's Q5: the date brackets push to both fact scans (o_orderdate
    // on orders, l_shipdate on lineitem — PushedFilters carry the prune
    // at 100 TB), revenue exactified to cents x (100−pct) like b2, and
    // the top-10 lowers to TakeOrderedAndProject — a billion-group
    // result never globally sorts. b2's broadcast discipline: customer
    // is FACT-scale at TPC-H proportions (1/10 of orders), so the
    // segment-filtered side carries no broadcast hint — it joins by
    // shuffle unless AQE measures it small (it does at test SF, and
    // that adaptivity, not a hard-coded hint, is the 100 TB-safe call).
    // o_orderdate emits as an exact epoch-day long (raw timestamps
    // crash the driver comparator).
    Q("b3_tpch_q3",
      (s, d) => {
        val cut = "1998-06-01"
        val cust = customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = orders(s, d)
          .filter(col("o_orderdate") < lit(cut))
          .select(col("o_orderkey"), col("o_custkey"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
              .as("o_day"),
            col("o_orderpriority"))
        val li = lineitem(s, d)
          .filter(col("l_shipdate") > lit(cut))
          .select(col("l_orderkey"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_x1e4"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_day"), col("o_orderpriority"))
          .agg(sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
            .as("revenue_x1e4"))
          .orderBy(col("revenue_x1e4").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  epoch_us(o_orderdate) // 86400000000 AS o_day,
             |  o_orderpriority,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS revenue_x1e4
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-01'
             |  AND l_shipdate > TIMESTAMP '1998-06-01'
             |GROUP BY l_orderkey, o_day, o_orderpriority
             |ORDER BY revenue_x1e4 DESC, l_orderkey LIMIT 10""".stripMargin)),

    // B4: TPC-H Q1 (pricing summary report) — the wide-aggregate scan
    // face of the flagship trio (b2 Q5 = deep join, b3 Q3 = top-k join,
    // b4 = pure scan+agg): ONE pass over lineitem, 8 aggregates, 4
    // groups. This is the query whole-stage codegen exists for — filter
    // and all partial aggregates run inside a single codegen'd stage
    // over the scan, and the shuffle moves 4 rows x 32 partitions. At
    // 100 TB the plan is identical: the date bracket pushes to the
    // parquet scan, partial agg absorbs everything map-side, no
    // operator's footprint grows with the data. Money exactification is
    // b2's: cents x (100-disc_pct) x (100+tax_pct) in DECIMAL(38,0) vs
    // HUGEINT (per-row <= ~1e11, so 1e13 rows stays ~1e24 << 1e38);
    // quantities are integral in this corpus (checked across all SFs)
    // so sum_qty is an exact long; the three averages are truncating
    // integer divides of the exact sums (the a25 div discipline — both
    // engines divide the SAME exact integers, so no float ever forms).
    Q("b4_tpch_q1",
      (s, d) => {
        val cents = round(col("l_extendedprice") * 100).cast("long")
        val pct = round(col("l_discount") * 100).cast("long")
        val tax = round(col("l_tax") * 100).cast("long")
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02"))
          .select(col("l_returnflag"), col("l_linestatus"),
            round(col("l_quantity")).cast("long").as("qty"),
            cents.as("cents"), pct.as("pct"), tax.as("tax"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("qty").cast("decimal(38,0)")).cast("long").as("sum_qty"),
            sum(col("cents").cast("decimal(38,0)")).cast("long")
              .as("sum_base_x100"),
            sum((col("cents") * (lit(100L) - col("pct")))
              .cast("decimal(38,0)")).cast("long").as("sum_disc_x1e4"),
            sum((col("cents").cast("decimal(38,0)")
              * (lit(100L) - col("pct")) * (lit(100L) + col("tax"))))
              .cast("long").as("sum_charge_x1e6"),
            sum(col("pct").cast("decimal(38,0)")).cast("long")
              .as("sum_pct"),
            count(lit(1)).as("n_rows"))
          .select(col("l_returnflag"), col("l_linestatus"),
            col("sum_qty"), col("sum_base_x100"), col("sum_disc_x1e4"),
            col("sum_charge_x1e6"),
            expr("CAST(sum_qty AS DECIMAL(38,0)) * 100 div n_rows")
              .as("avg_qty_x100"),
            expr("sum_base_x100 div n_rows").as("avg_price_x100"),
            expr("CAST(sum_pct AS DECIMAL(38,0)) * 100 div n_rows")
              .as("avg_disc_x1e4"),
            col("n_rows"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             |    AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |    AS BIGINT) AS sum_base_x100,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS sum_disc_x1e4,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT))
             |    * (100 + CAST(round(l_tax * 100) AS BIGINT)))
             |    AS BIGINT) AS sum_charge_x1e6,
             |  CAST(sum(CAST(round(l_quantity) AS BIGINT)) * 100
             |    // count(*) AS BIGINT) AS avg_qty_x100,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |    // count(*) AS BIGINT) AS avg_price_x100,
             |  CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) * 100
             |    // count(*) AS BIGINT) AS avg_disc_x1e4,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // B5: TPC-H Q18 (large-volume customers) — the HAVING-subquery face:
    // per-order quantity totals filtered at > 300, joined back to orders
    // and customer, top-100 by order value. The classic formulation
    // joins lineitem AGAIN inside the outer query to re-sum quantity;
    // that second fact scan is pure waste — the per-order aggregate
    // already IS the outer sum (order grain == group grain), so this
    // plan aggregates lineitem exactly once. Scale shape: the heavy step
    // is one partial-combining groupBy on l_orderkey (bounded fan-in —
    // TPC-H orders carry <= 7 lines, so no hot key; a genuinely skewed
    // feed is sk2's salting territory and AQE's skew split covers the
    // join). After the > 300 filter the survivor set is a vanishing
    // fraction (p99 of per-order totals is ~265 across SFs), so per
    // b3's discipline neither join side carries a broadcast hint — AQE
    // measures the filtered side and picks BHJ at test SF, shuffle at
    // fact scale. Top-100 lowers to TakeOrderedAndProject (never a
    // global sort); o_totalprice emits as exact cents and o_orderdate
    // as an epoch-day long (the comparator rules), with o_orderkey as
    // the unique tie-break.
    Q("b5_tpch_q18",
      (s, d) => {
        val big = lineitem(s, d)
          .select(col("l_orderkey"),
            round(col("l_quantity")).cast("long").as("qty"))
          .groupBy(col("l_orderkey"))
          .agg(sum(col("qty").cast("decimal(38,0)")).cast("long")
            .as("sum_qty"))
          .filter(col("sum_qty") > 300L)
        val ord = orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")
            .as("o_day"),
          round(col("o_totalprice") * 100).cast("long").as("price_x100"))
        big.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select(col("c_custkey"), col("c_name")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_day"), col("price_x100"), col("sum_qty"))
          .orderBy(col("price_x100").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey,
             |  epoch_us(o_orderdate) // 86400000000 AS o_day,
             |  CAST(round(o_totalprice * 100) AS BIGINT) AS price_x100,
             |  t.sum_qty
             |FROM (SELECT l_orderkey,
             |        CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             |          AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300) t
             |JOIN orders ON o_orderkey = t.l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |ORDER BY price_x100 DESC, o_orderkey LIMIT 100""".stripMargin)),

    // B6: TPC-H Q6 (forecasting revenue change) — the pure scan-filter-
    // aggregate face: three column predicates (date bracket, discount
    // band, quantity cap) all push to the parquet scan, one decimal38
    // accumulator, ONE output row. The whole query is a single
    // whole-stage-codegen span over a pruned ReadSchema — at 100 TB it
    // is the I/O-bound lower bound every other lineitem query is judged
    // against. Revenue = cents · pct (discount AS the revenue, per the
    // spec's extendedprice·discount), exact at the x1e4 grain.
    Q("b6_tpch_q6",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01")
          && col("l_quantity") < 24)
        .select((round(col("l_extendedprice") * 100).cast("long"))
            .as("cents"),
          round(col("l_discount") * 100).cast("long").as("pct"))
        .filter(col("pct").between(4L, 6L))
        .agg(sum((col("cents") * col("pct")).cast("decimal(38,0)"))
          .cast("long").as("revenue_x1e4"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             |    AS revenue_x1e4,
             |  count(*) AS n_rows
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_quantity < 24
             |  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 4 AND 6"""
        .stripMargin)),

    // B7: TPC-H Q14 (promotion effect) — the conditional-aggregate
    // ratio face: one lineitem-part join (part is the DIMENSION side —
    // broadcast), promo revenue vs total revenue in a single pass, and
    // the percentage emitted as an exact cross-multiplied x1e6 integer
    // (100·promo·1e4 div total — Q14's 100·sum/sum with both sums exact
    // cents·pct). The month bracket pushes to the lineitem scan.
    Q("b7_tpch_q14",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-06-01")
          && col("l_shipdate") < lit("1996-07-01"))
        .select(col("l_partkey"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_x1e4"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(sum(when(col("p_type") === "PROMO", col("rev_x1e4"))
            .cast("decimal(38,0)")).cast("long").as("promo_x1e4"),
          sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
            .as("total_x1e4"),
          count(lit(1)).as("n_rows"))
        .select(col("promo_x1e4"), col("total_x1e4"),
          expr("""CAST(promo_x1e4 AS DECIMAL(38,0)) * 100000000
                 | div nullif(total_x1e4, 0)""".stripMargin)
            .as("promo_pct_x1e6"),
          col("n_rows")),
      Some("""SELECT
             |  CAST(sum(CASE WHEN p_type = 'PROMO' THEN
             |    CAST(round(l_extendedprice * 100) AS HUGEINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) END)
             |    AS BIGINT) AS promo_x1e4,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS total_x1e4,
             |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN
             |      CAST(round(l_extendedprice * 100) AS HUGEINT)
             |        * (100 - CAST(round(l_discount * 100) AS BIGINT)) END)
             |      AS HUGEINT) * 100000000
             |    // nullif(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT))), 0)
             |    AS BIGINT) AS promo_pct_x1e6,
             |  count(*) AS n_rows
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-06-01'
             |  AND l_shipdate < TIMESTAMP '1996-07-01'""".stripMargin)),

    // B8: TPC-H Q10 (returned-item reporting) — the fact-fact join +
    // top-k face: returned lineitems (l_returnflag = 'R') joined to a
    // date-bracketed orders quarter, revenue per customer, nation
    // broadcast on, top-20 by lost revenue. b3's discipline end to end:
    // both brackets push to their scans, neither fact side carries a
    // broadcast hint (AQE decides), and the top-20 lowers to
    // TakeOrderedAndProject with c_custkey as the unique tie-break.
    Q("b8_tpch_q10",
      (s, d) => {
        val ord = orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01")
            && col("o_orderdate") < lit("1996-04-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_x1e4"))
        val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("n_name"))
          .agg(sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
            .as("revenue_x1e4"), count(lit(1)).as("n_rows"))
          .orderBy(col("revenue_x1e4").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, n_name,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS revenue_x1e4,
             |  count(*) AS n_rows
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |GROUP BY c_custkey, n_name
             |ORDER BY revenue_x1e4 DESC, c_custkey LIMIT 20""".stripMargin)),

    // B9: TPC-H Q17 (small-quantity-order revenue) — the CORRELATED
    // SCALAR SUBQUERY face (VERDICT r13 #5): each lineitem row of the
    // selected brand is compared against 0.2·avg(l_quantity) OF ITS OWN
    // PART. Every engine must decorrelate this into a per-part aggregate
    // joined back to the probe side; here the decorrelation is expressed
    // as a PARTITIONED WINDOW over l_partkey — the per-part sum/count
    // and the probe rows meet in ONE shuffle of ONE lineitem scan
    // (the classic two-scan aggregate-join form reads the fact table
    // twice and shuffles the probe side anyway; the window form is the
    // plan you'd want at 100 TB, and PlanSpec pins the single scan).
    // Exactness: l_qty < 0.2·avg(qty) ⟺ qty·5·cnt < sum_qty on exact
    // longs (quantity is integral at the data's grain) — no float
    // division on the decision path; avg_yearly emits as the truncating
    // cents quotient div 7 (Q17's sum/7.0 at the x100 grain).
    // Scale: the brand dimension filter broadcasts (1/25 of parts);
    // window state is one part's lineitems — bounded by the hottest
    // part, never the corpus; no cartesian anywhere.
    Q("b9_tpch_q17",
      (s, d) => {
        val sel = part(s, d).filter(col("p_brand") === "Brand#23")
          .select(col("p_partkey"))
        val byPart = Window.partitionBy(col("l_partkey"))
        lineitem(s, d)
          .select(col("l_partkey"),
            round(col("l_quantity")).cast("long").as("qty"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"))
          .join(broadcast(sel), col("l_partkey") === col("p_partkey"))
          .withColumn("sum_qty", sum(col("qty")).over(byPart))
          .withColumn("cnt", count(lit(1)).over(byPart))
          .filter(col("qty") * 5 * col("cnt") < col("sum_qty"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("cents").cast("decimal(38,0)")).cast("long")
              .as("sum_price_x100"))
          .select(col("n_rows"), col("sum_price_x100"),
            expr("CAST(CAST(sum_price_x100 AS DECIMAL(38,0)) div 7 AS BIGINT)")
              .as("avg_yearly_x100"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey,
             |    CAST(round(l_quantity) AS BIGINT) AS qty,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_brand = 'Brand#23'
             |), ag AS (
             |  -- the correlated scalar subquery, decorrelated: per-part
             |  -- sum/count instead of 0.2*avg, so the threshold compare
             |  -- is exact integer cross-multiplication
             |  SELECT l_partkey AS pk, sum(qty) AS sum_qty,
             |    count(*) AS cnt
             |  FROM li GROUP BY l_partkey
             |)
             |SELECT CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CAST(cents AS HUGEINT)) AS BIGINT)
             |    AS sum_price_x100,
             |  CAST(sum(CAST(cents AS HUGEINT)) // 7 AS BIGINT)
             |    AS avg_yearly_x100
             |FROM li JOIN ag ON l_partkey = pk
             |WHERE qty * 5 * cnt < sum_qty""".stripMargin)),

    // B10: TPC-H Q19 (discounted revenue, adapted to this schema's
    // part columns) — the DISJUNCTIVE-PREDICATE face: an OR of three
    // (brand, size-band, quantity-band) conjunctions mixing columns of
    // BOTH join sides. The plan question every engine faces here is
    // whether the per-side IMPLICATIONS of the disjunction reach the
    // scans — brand/size bands to the part scan, the quantity envelope
    // (BETWEEN 1 AND 30, the union of the three bands) to the lineitem
    // scan — instead of filtering only after the join. Catalyst's
    // constraint propagation does NOT derive cross-side OR implications
    // from a join condition, so the single-side unions are stated
    // explicitly (the CNF-derived residuals a Q19-aware planner emits);
    // the full disjunction then decides post-join. PlanSpec pins both
    // pushdowns. Quantity predicates compare the raw integral-grain
    // double (b6's rule — a round() would kill parquet pushdown);
    // revenue is b2's exact cents x (100 - pct).
    Q("b10_tpch_q19",
      (s, d) => {
        val li = lineitem(s, d)
          .filter(col("l_quantity").between(1, 30)) // union envelope
          .select(col("l_partkey"), col("l_quantity"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_x1e4"))
        val p = part(s, d)
          .filter((col("p_brand") === "Brand#12"
              && col("p_size").between(1, 5))
            || (col("p_brand") === "Brand#23"
              && col("p_size").between(1, 10))
            || (col("p_brand") === "Brand#4"
              && col("p_size").between(1, 15)))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        val cond = (col("p_brand") === "Brand#12"
            && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23"
            && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#4"
            && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey") && cond)
          .agg(sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
            .as("revenue_x1e4"), count(lit(1)).as("n_rows"))
      },
      Some("""SELECT
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS revenue_x1e4,
             |  count(*) AS n_rows
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // B11: TPC-H Q15 (top supplier) — the AGGREGATE-EQUALS-MAX face:
    // a per-supplier revenue view consumed TWICE, once for its maximum
    // and once to select the row(s) attaining it. Lazy lineage would
    // re-run the fact aggregate per consumer, so the tiny per-supplier
    // ledger is materialized to scratch (the w19/a35 discipline —
    // PlanSpec pins the zero-fact-scan consumer plan); the 1-row max
    // then broadcasts against the ledger, and only the winners (a
    // handful of rows) join the supplier dimension. No unpartitioned
    // window anywhere: at 1e7 suppliers the ledger is a real table, and
    // max-selection must stay an aggregate + broadcast equality, never
    // a global rank. Ties: Q15 returns every supplier at the max (the
    // spec's own semantics); s_suppkey is the total order.
    Q("b11_tpch_q15",
      (s, d) => {
        val dir = graft.Scratch.dir(s, s"b11_rev_${graft.Scratch.key(d)}")
        lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01")
            && col("l_shipdate") < lit("1996-04-01"))
          .select(col("l_suppkey"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_x1e4"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
            .as("total_rev_x1e4"))
          .write.mode("overwrite").parquet(dir)
        val rev = s.read.parquet(dir)
        val winners = rev
          .join(broadcast(rev.agg(max(col("total_rev_x1e4")).as("mx"))),
            col("total_rev_x1e4") === col("mx"))
          .select(col("l_suppkey"), col("total_rev_x1e4"))
        supplier(s, d).select(col("s_suppkey"), col("s_name"))
          .join(broadcast(winners), col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_x1e4"))
          .orderBy("s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |      AS BIGINT) AS total_rev_x1e4
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'
             |  GROUP BY l_suppkey
             |)
             |SELECT s_suppkey, s_name, total_rev_x1e4
             |FROM supplier JOIN rev ON s_suppkey = l_suppkey
             |WHERE total_rev_x1e4 = (SELECT max(total_rev_x1e4) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // B12: TPC-H Q22 (global sales opportunity, adapted: mktsegment for
    // the missing phone country code, a quarter window for the order
    // anti-join since every customer here has SOME order) — the
    // SCALAR-THRESHOLD + ANTI-JOIN face: customers whose balance
    // exceeds the average positive balance AND who placed no order in
    // 1996Q1, counted per segment. The average is never computed as a
    // float: the threshold bal > sum_pos/n_pos is the exact
    // cross-multiplication bal·n_pos > sum_pos on cents (strict >,
    // both engines), riding decimal38/HUGEINT. Scale shape: one
    // customer scan feeds the 1-row positive-balance aggregate
    // (partial-combined), a second probe scan takes the broadcast
    // threshold, and the NOT EXISTS is a distributed left-anti join
    // against the date-bracketed orders scan (bracket pushed) — the
    // driver-side set-difference this family replaced in round 1.
    Q("b12_tpch_q22",
      (s, d) => {
        val cust = customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"),
            round(col("c_acctbal") * 100).cast("long").as("bal_c"))
        val thr = cust.filter(col("bal_c") > 0)
          .agg(sum(col("bal_c").cast("decimal(38,0)")).as("sp"),
            count(lit(1)).as("np"))
        cust.join(broadcast(thr))
          .filter(col("bal_c").cast("decimal(38,0)") * col("np")
            > col("sp"))
          .join(orders(s, d)
              .filter(col("o_orderdate") >= lit("1996-01-01")
                && col("o_orderdate") < lit("1996-04-01"))
              .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal_c").cast("decimal(38,0)")).cast("long")
              .as("totacctbal_x100"))
          .orderBy("c_mktsegment")
      },
      Some("""WITH c AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
             |  FROM customer
             |), t AS (
             |  SELECT CAST(sum(CAST(bal_c AS HUGEINT)) AS HUGEINT) AS sp,
             |    CAST(count(*) AS BIGINT) AS np
             |  FROM c WHERE bal_c > 0
             |)
             |SELECT c_mktsegment,
             |  CAST(count(*) AS BIGINT) AS numcust,
             |  CAST(sum(CAST(bal_c AS HUGEINT)) AS BIGINT)
             |    AS totacctbal_x100
             |FROM c, t
             |WHERE CAST(bal_c AS HUGEINT) * np > sp
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |    WHERE o_custkey = c_custkey
             |      AND o_orderdate >= TIMESTAMP '1996-01-01'
             |      AND o_orderdate < TIMESTAMP '1996-04-01')
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // B13: TPC-H Q7 (volume shipping, adapted nation names) — the
    // DUAL-DIMENSION-CHAIN face: one fact table reaches the nation
    // dimension through TWO independent chains (lineitem→supplier→
    // nation for the shipping side, lineitem→orders→customer→nation
    // for the receiving side), with the (FRANCE,GERMANY)|(GERMANY,
    // FRANCE) pair filter spanning BOTH chains — it can only decide
    // after both joins, but each chain's nation/supplier lookup is a
    // broadcast so the fact rows are filtered down before the
    // orders/customer fact-fact joins (AQE decides those, b3's rule).
    // The two-year bracket is a pushed RANGE on l_shipdate; the year
    // GROUPING extracts after the scan (the j3 lesson: year() in a
    // FILTER kills pushdown, year() in a projection costs nothing).
    Q("b13_tpch_q7",
      (s, d) => {
        val nat = nation(s, d).select(col("n_nationkey"), col("n_name"))
        val li = lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1995-01-01")
            && col("l_shipdate") < lit("1997-01-01"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("yr"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev_x1e4"))
        li.join(broadcast(supplier(s, d)
              .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat.as("n1")),
            col("s_nationkey") === col("n1.n_nationkey"))
          .withColumnRenamed("n_name", "supp_nation")
          .filter(col("supp_nation").isin("NATION_3", "NATION_7"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat.as("n2")),
            col("c_nationkey") === col("n2.n_nationkey"))
          .withColumnRenamed("n_name", "cust_nation")
          .filter((col("supp_nation") === "NATION_3"
              && col("cust_nation") === "NATION_7")
            || (col("supp_nation") === "NATION_7"
              && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"), col("yr"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("rev_x1e4").cast("decimal(38,0)")).cast("long")
              .as("revenue_x1e4"))
          .orderBy("supp_nation", "cust_nation", "yr")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS BIGINT) AS yr,
             |  count(*) AS n_rows,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS HUGEINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS revenue_x1e4
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
             |  AND l_shipdate >= TIMESTAMP '1995-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // B14: TPC-H Q4 (order-priority checking, adapted) — the CORRELATED
    // EXISTS face: count orders per priority where at least one lineitem
    // satisfies a cross-table predicate. The testdata has no
    // l_commitdate/l_receiptdate, so "late commit" adapts to "shipped
    // more than 60 days after the order date" — which keeps the part
    // that matters: the EXISTS correlates on the order key AND compares
    // a column from EACH side, so it cannot collapse to a semi-join on
    // a precomputed lineitem set. Spark-first: a LEFT SEMI join with the
    // non-equi residual riding the equi key — one pass over each fact
    // table, no decorrelation subquery, no count(*) > 0 materialization.
    // Scale: the quarter bracket pushes to the orders scan (1/26 of the
    // date range); lineitem reads two columns; the semi-join shuffles
    // both sides on the order key once and emits at most one row per
    // order — output is 5 rows regardless of scale.
    Q("b14_tpch_q4",
      (s, d) => orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01")
          && col("o_orderdate") < lit("1996-04-01"))
        .select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .join(lineitem(s, d).select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate")
              + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey
             |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // B15: TPC-H Q12 (shipping-mode priority split, adapted) — the
    // CONDITIONAL DUAL-COUNT face: one fact-fact join, then two
    // mutually-exclusive CASE counts per group in a single aggregate
    // pass (never two filtered scans unioned). Adaptation: the testdata
    // has no l_shipmode/l_receiptdate, so the group key is l_linestatus
    // and Q12's "received late" chain becomes the same 60-day lateness
    // predicate b14 uses. Scale: the year bracket pushes to the
    // lineitem scan; the lateness predicate rides the join as a
    // residual (it references both sides, so it CANNOT push — putting
    // it post-join in a filter would be equivalent, but on the join it
    // drops rows before the aggregate's map side); counts are exact
    // integers partial-aggregated map-side; 2 output rows at any scale.
    Q("b15_tpch_q12",
      (s, d) => lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01")
          && col("l_shipdate") < lit("1997-01-01"))
        .select(col("l_orderkey"), col("l_shipdate"), col("l_linestatus"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") > col("o_orderdate")
              + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(count(when(col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH"), 1)).as("high_line_count"),
          count(when(!col("o_orderpriority")
            .isin("1-URGENT", "2-HIGH"), 1)).as("low_line_count"))
        .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |    THEN 1 END) AS high_line_count,
             |  count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
             |    THEN 1 END) AS low_line_count
             |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)),

    // B16: TPC-H Q13 (customer order-count distribution, adapted) — the
    // OUTER-JOIN + DOUBLE-AGGREGATION face: customers who placed ZERO
    // qualifying orders must appear (c_count = 0), so the join is LEFT
    // OUTER with the order-side filter ON THE JOIN (a WHERE would turn
    // it back into an inner join — the classic outer-join-filter trap),
    // and count(o_orderkey) counts non-null matches only. The
    // o_comment NOT LIKE filter adapts to an o_orderpriority selection
    // (same shape: a cheap dimension predicate that disqualifies a
    // fixed fraction of orders — '1-URGENT' keeps 1/5, so the zero
    // bucket is populated at every test scale and the outer join is
    // genuinely exercised, which TpchCompletionSpec guards against
    // vacuity). Scale: the first groupBy shuffles on
    // c_custkey — the SAME key the join shuffled on, so Catalyst reuses
    // the partitioning and the aggregate is shuffle-free; the second
    // aggregate's key space (distinct order counts per customer) is
    // tiny at any scale.
    Q("b16_tpch_q13",
      (s, d) => customer(s, d).select(col("c_custkey"))
        .join(orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, count(*) AS custdist FROM (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey
             |    AND o_orderpriority = '1-URGENT'
             |  GROUP BY c_custkey) t
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // B17: TPC-H Q8 (national market share) — the widest join face in
    // the family: the fact table reaches FIVE dimensions through two
    // independent chains (customer→nation→region restricts the demand
    // side to one region; supplier→nation labels the supply side), plus
    // the part-type filter, and the answer is a per-year RATIO of one
    // nation's volume to the total. Every dimension lookup broadcasts;
    // the region restriction is a LEFT SEMI against the ~5-row Asian
    // nation-key set (never a join that would duplicate or widen rows);
    // the two fact-fact joins (orders, customer) are unhinted — AQE
    // decides from measured sizes (b3's rule). The share emits as the
    // exact cross-multiplied truncating quotient nation·1e6 div total
    // (b7's discipline) — no float division. Scale: part filter (1/6)
    // and the two-year bracket (~1/3.3) cut the fact stream before the
    // wide joins; output is one row per year.
    Q("b17_tpch_q8",
      (s, d) => {
        val asiaKeys = nation(s, d)
          .join(broadcast(region(s, d)
              .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            (round(col("l_extendedprice") * 100).cast("long")
              * (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("vol_x1e4"))
          .join(broadcast(part(s, d).filter(col("p_type") === "ECONOMY")
              .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .join(orders(s, d)
              .filter(col("o_orderdate") >= lit("1996-01-01")
                && col("o_orderdate") < lit("1998-01-01"))
              .select(col("o_orderkey"), col("o_custkey"),
                year(col("o_orderdate")).cast("long").as("yr")),
            col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaKeys),
            col("c_nationkey") === col("n_nationkey"), "left_semi")
          .join(broadcast(supplier(s, d)
              .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation(s, d)
              .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("yr"))
          .agg(sum(when(col("n_name") === "NATION_13", col("vol_x1e4"))
              .otherwise(lit(0L)).cast("decimal(38,0)")).cast("long")
              .as("nation_vol_x1e4"),
            sum(col("vol_x1e4").cast("decimal(38,0)")).cast("long")
              .as("total_vol_x1e4"),
            count(lit(1)).as("n_rows"))
          .select(col("yr"), col("nation_vol_x1e4"), col("total_vol_x1e4"),
            expr("""CAST(CAST(nation_vol_x1e4 AS DECIMAL(38,0)) * 1000000
                   | div nullif(total_vol_x1e4, 0) AS BIGINT)""".stripMargin)
              .as("share_x1e6"),
            col("n_rows"))
          .orderBy("yr")
      },
      Some("""SELECT yr,
             |  CAST(sum(CASE WHEN supp_nation = 'NATION_13' THEN vol
             |    ELSE 0 END) AS BIGINT) AS nation_vol_x1e4,
             |  CAST(sum(vol) AS BIGINT) AS total_vol_x1e4,
             |  CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_13' THEN vol
             |      ELSE 0 END) AS HUGEINT) * 1000000
             |    // nullif(sum(vol), 0) AS BIGINT) AS share_x1e6,
             |  count(*) AS n_rows
             |FROM (
             |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             |    n2.n_name AS supp_nation,
             |    CAST(round(l_extendedprice * 100) AS HUGEINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS vol
             |  FROM lineitem
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
             |  JOIN region ON r_regionkey = n1.n_regionkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
             |  JOIN part ON p_partkey = l_partkey
             |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1998-01-01') v
             |GROUP BY yr ORDER BY yr""".stripMargin)),

    // B18: TPC-H Q21 (suppliers who kept orders waiting, adapted) —
    // the DUAL-CORRELATED EXISTS/NOT-EXISTS face: a supplier qualifies
    // in an order iff it shipped late, ANOTHER supplier participated
    // (EXISTS), and NO other supplier shipped late (NOT EXISTS). The
    // textbook form self-joins lineitem twice; b9's window-
    // decorrelation discipline collapses BOTH correlations into
    // per-order window counts over ONE pass: reduce to one row per
    // (order, supplier) with an any_late flag, then n_supp >= 2 (the
    // EXISTS) and n_late = 1 (the NOT EXISTS — the late one is the
    // probe itself) as window aggregates. Lateness adapts to b14's
    // ship-lag (> 90 days; no commit/receipt dates in the testdata).
    // Scale: ONE lineitem scan, ONE orders scan (status filter
    // pushed); the join, the (order, supplier) aggregate, and BOTH
    // windows all cluster on l_orderkey, so the whole reduction rides
    // a single shuffle; window state is one order's suppliers (≤ a few
    // dozen), never the corpus; top-25 lowers to TakeOrdered.
    Q("b18_tpch_q21",
      (s, d) => {
        val byOrder = Window.partitionBy(col("l_orderkey"))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(orders(s, d).filter(col("o_orderstatus") === "F")
              .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(col("l_shipdate") > col("o_orderdate")
              + expr("INTERVAL 90 DAYS"), 1L).otherwise(0L)).as("any_late"))
          .withColumn("n_supp", count(lit(1)).over(byOrder))
          .withColumn("n_late", sum(col("any_late")).over(byOrder))
          .filter(col("any_late") === 1 && col("n_supp") >= 2
            && col("n_late") === 1)
          .join(broadcast(supplier(s, d)
              .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(25)
      },
      Some("""WITH ol AS (
             |  SELECT l_orderkey, l_suppkey,
             |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
             |      THEN 1 ELSE 0 END) AS any_late
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |  WHERE o_orderstatus = 'F'
             |  GROUP BY l_orderkey, l_suppkey
             |), w AS (
             |  SELECT l_suppkey, any_late,
             |    count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
             |    CAST(sum(any_late) OVER (PARTITION BY l_orderkey)
             |      AS BIGINT) AS n_late
             |  FROM ol)
             |SELECT s_name, count(*) AS numwait
             |FROM w JOIN supplier ON s_suppkey = l_suppkey
             |WHERE any_late = 1 AND n_supp >= 2 AND n_late = 1
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin)),

    // The remaining five TPC-H faces (Q9, Q16, Q20, Q2, Q11) all read
    // PARTSUPP, which the testdata does not ship. Each face below uses
    // the same documented surrogate: the (part, supplier) relationships
    // implied by lineitem history, with p_retailprice standing in for
    // ps_supplycost where a unit cost is needed. What each query
    // preserves is the OPERATOR SHAPE the original exercises — that is
    // what a user of the reference would port.

    // B19: TPC-H Q9 (product-type profit, adapted) — the MULTI-CHAIN
    // PROFIT face: revenue minus cost per lineitem, aggregated by the
    // SUPPLIER's nation and the order year — the fact row needs part
    // (name filter + cost), supplier→nation (group key), and orders
    // (year) simultaneously. Cost surrogate: 90% of p_retailprice per
    // unit (ps_supplycost is missing). All three lookups broadcast;
    // orders is the one fact-fact join (AQE decides). profit stays an
    // exact integer at the x1e4 grain: cents·(100−pct) −
    // qty·retail_cents·90. The p_name LIKE pushes to the part scan as
    // a StringContains.
    Q("b19_tpch_q9",
      (s, d) => lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          round(col("l_quantity")).cast("long").as("qty"),
          (round(col("l_extendedprice") * 100).cast("long")
            * (lit(100L) - round(col("l_discount") * 100).cast("long")))
            .as("rev_x1e4"))
        .join(broadcast(part(s, d).filter(col("p_name").contains("gear"))
            .select(col("p_partkey"),
              round(col("p_retailprice") * 100).cast("long")
                .as("retail_cents"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(orders(s, d).select(col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("yr")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"), col("yr"))
        .agg(sum((col("rev_x1e4") - col("qty") * col("retail_cents") * 90)
            .cast("decimal(38,0)")).cast("long").as("profit_x1e4"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("n_name"), col("yr").desc),
      Some("""SELECT n_name, yr,
             |  CAST(sum(profit) AS BIGINT) AS profit_x1e4,
             |  count(*) AS n_rows
             |FROM (
             |  SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
             |    CAST(round(l_extendedprice * 100) AS HUGEINT)
             |      * (100 - CAST(round(l_discount * 100) AS BIGINT))
             |    - CAST(round(l_quantity) AS HUGEINT)
             |      * CAST(round(p_retailprice * 100) AS BIGINT) * 90
             |      AS profit
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON n_nationkey = s_nationkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  WHERE p_name LIKE '%gear%') p
             |GROUP BY n_name, yr
             |ORDER BY n_name, yr DESC""".stripMargin)),

    // B20: TPC-H Q16 (supplier relationships, adapted) — the
    // DISTINCT-COUNT + BLACKLIST-ANTI-JOIN face: how many distinct
    // suppliers serve each (brand, type, size) class, excluding a
    // supplier blacklist (negative account balance stands in for the
    // missing 'customer complaints' comment filter). The partsupp
    // surrogate is the implied (part, supplier) pairs of lineitem;
    // count(DISTINCT l_suppkey) dedups them inside the aggregate, so
    // no separate distinct pass is paid. Scale: part predicates
    // (brand/type/size-IN) all push to the broadcast part side; the
    // blacklist anti-join broadcasts (it is a supplier subset); the
    // distinct aggregate partial-aggregates per (group, suppkey)
    // map-side before the final shuffle.
    Q("b20_tpch_q16",
      (s, d) => lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(part(s, d)
            .filter(col("p_brand") =!= "Brand#1"
              && col("p_type") =!= "PROMO"
              && col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
            .select(col("p_partkey"), col("p_brand"), col("p_type"),
              col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d).filter(col("s_acctbal") < 0)
            .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size")),
      Some("""SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
             |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
             |  AND l_suppkey NOT IN
             |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
        .stripMargin)),

    // B21: TPC-H Q20 (potential part promotion, adapted) — the
    // NESTED-THRESHOLD SEMI-JOIN CHAIN face: suppliers (in one nation)
    // who DOMINATE some promo part's 1996 shipments — their shipped
    // quantity exceeds half the part's total (availqty > 0.5·sum is
    // the missing-partsupp original; "more than half of what shipped"
    // is its lineitem-derived analog). The half threshold is the exact
    // integer cross-multiplication 2·qty > tot (b9's rule: never a
    // 0.5· float multiply). Scale: part-type filter broadcasts; the
    // (part, supplier) reduction and the per-part window cluster on
    // l_partkey — one shuffle; the dominant-supplier key set then
    // SEMI-joins the supplier dimension, so the big fact derivation
    // never widens the output side.
    Q("b21_tpch_q20",
      (s, d) => {
        val byPart = Window.partitionBy(col("l_partkey"))
        val dom = lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01")
            && col("l_shipdate") < lit("1997-01-01"))
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_quantity")).cast("long").as("q"))
          .join(broadcast(part(s, d).filter(col("p_type") === "PROMO")
              .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("q")).as("qty"))
          .withColumn("tot", sum(col("qty")).over(byPart))
          .filter(col("qty") * 2 > col("tot"))
          .select(col("l_suppkey")).distinct()
        supplier(s, d)
          .join(broadcast(nation(s, d)
              .filter(col("n_name") === "NATION_13")
              .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .join(dom, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"),
            round(col("s_acctbal") * 100).cast("long").as("bal_x100"))
          .orderBy("s_name")
      },
      Some("""WITH pq AS (
             |  SELECT l_partkey, l_suppkey,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             |      AS qty
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_type = 'PROMO'
             |    AND l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY 1, 2
             |), dom AS (
             |  SELECT l_suppkey FROM (
             |    SELECT l_suppkey, qty,
             |      sum(qty) OVER (PARTITION BY l_partkey) AS tot
             |    FROM pq) x
             |  WHERE 2 * qty > tot GROUP BY 1)
             |SELECT s_name,
             |  CAST(round(s_acctbal * 100) AS BIGINT) AS bal_x100
             |FROM supplier JOIN nation ON n_nationkey = s_nationkey
             |WHERE n_name = 'NATION_13'
             |  AND s_suppkey IN (SELECT l_suppkey FROM dom)
             |ORDER BY s_name""".stripMargin)),

    // B22: TPC-H Q2 (minimum-cost supplier, adapted) — the PER-GROUP
    // ARGMIN face: for each part in a class, the European supplier
    // offering the lowest unit price. The cost surrogate is lineitem's
    // own offer history (extendedprice/quantity); the ratio argmin is
    // made exact by quantizing to the 1e-6-dollar grain FIRST — the
    // truncating integer quotient cents·1e6 div qty — and totalizing
    // the order with l_suppkey, so both engines pick the identical row
    // (a float ratio min would be a cross-engine coin flip on ties).
    // row_number() = 1 under that total order IS Q2's correlated
    // min-subquery, decorrelated per b9's window discipline. Scale:
    // all four dimension lookups broadcast; one lineitem scan; the
    // final top-100 lowers to TakeOrderedAndProject.
    Q("b22_tpch_q2",
      (s, d) => {
        val euro = supplier(s, d)
          .join(broadcast(nation(s, d).select(col("n_nationkey"),
              col("n_name"), col("n_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")
              .select(col("r_regionkey"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("n_name"),
            round(col("s_acctbal") * 100).cast("long").as("bal_x100"))
        val byPartPrice = Window.partitionBy(col("p_partkey"))
          .orderBy(col("unit_x1e6"), col("l_suppkey"))
        lineitem(s, d)
          .filter(col("l_quantity") > 0)
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            round(col("l_quantity")).cast("long").as("qty"))
          .join(broadcast(part(s, d)
              .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
              .select(col("p_partkey"), col("p_name"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(euro), col("l_suppkey") === col("s_suppkey"))
          .withColumn("unit_x1e6",
            expr("(cents * CAST(1000000 AS BIGINT)) div qty"))
          .withColumn("rn", row_number().over(byPartPrice))
          .filter(col("rn") === 1)
          .select(col("p_partkey"), col("p_name"), col("s_name"),
            col("n_name"), col("bal_x100"), col("unit_x1e6"))
          .orderBy(col("bal_x100").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""WITH offers AS (
             |  SELECT p_partkey, p_name, s_name, n_name,
             |    CAST(round(s_acctbal * 100) AS BIGINT) AS bal_x100,
             |    l_suppkey,
             |    CAST(round(l_extendedprice * 100) AS BIGINT)
             |      * 1000000::BIGINT
             |      // CAST(round(l_quantity) AS BIGINT) AS unit_x1e6
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON n_nationkey = s_nationkey
             |  JOIN region ON r_regionkey = n_regionkey
             |  WHERE r_name = 'EUROPE' AND p_type = 'LARGE'
             |    AND p_size <= 10 AND l_quantity > 0
             |), ranked AS (
             |  SELECT *, row_number() OVER (PARTITION BY p_partkey
             |      ORDER BY unit_x1e6, l_suppkey) AS rn
             |  FROM offers)
             |SELECT p_partkey, p_name, s_name, n_name, bal_x100,
             |  unit_x1e6
             |FROM ranked WHERE rn = 1
             |ORDER BY bal_x100 DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // B23: TPC-H Q11 (important stock, adapted) — the
    // FRACTION-OF-GLOBAL-TOTAL face: per-part inventory value (from
    // the nation-restricted lineitem surrogate, qty·retail_cents)
    // kept only where its share exceeds TWICE THE MEAN share. Q11's
    // literal fraction is 0.0001/SF — scaled by data size precisely
    // because a fixed fraction stops discriminating as the part count
    // grows; tying the threshold to the ledger's own count keeps the
    // face (a global scalar computed from the aggregate, broadcast
    // back over it) scale-free: val·n_parts > 2·total, exact on the
    // DECIMAL(38,0)/HUGEINT ledger values — never sum·0.0002·….
    // b11's materialization discipline: the per-part
    // ledger is computed ONCE into scratch parquet, then BOTH the
    // 1-row total (broadcast back, b12's rule) and the probe read the
    // ledger — the consumer plan never rescans lineitem. Emitted
    // values ride int64 within the documented envelope (see
    // HeadroomAudit b23 entry).
    Q("b23_tpch_q11",
      (s, d) => {
        val dir = graft.Scratch.dir(s, s"b23_pv_${graft.Scratch.key(d)}")
        val natSupp = supplier(s, d)
          .join(broadcast(nation(s, d)
              .filter(col("n_name")
                .isin("NATION_13", "NATION_3", "NATION_8"))
              .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .select(col("s_suppkey"))
        lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            round(col("l_quantity")).cast("long").as("qty"))
          .join(broadcast(natSupp),
            col("l_suppkey") === col("s_suppkey"), "left_semi")
          .join(broadcast(part(s, d).select(col("p_partkey"),
              round(col("p_retailprice") * 100).cast("long")
                .as("retail_cents"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"))
          .agg(sum((col("qty") * col("retail_cents"))
            .cast("decimal(38,0)")).as("val"))
          .write.mode("overwrite").parquet(dir)
        val pv = s.read.parquet(dir)
        pv.join(broadcast(pv.agg(sum(col("val")).as("tv"),
            count(lit(1)).as("np"))))
          .filter(col("val") * col("np") > col("tv") * 2)
          .select(col("l_partkey").as("p_partkey"),
            col("val").cast("long").as("value_x100"))
          .orderBy(col("value_x100").desc, col("p_partkey"))
      },
      Some("""WITH pv AS (
             |  SELECT l_partkey, sum(CAST(round(l_quantity) AS HUGEINT)
             |    * CAST(round(p_retailprice * 100) AS BIGINT)) AS val
             |  FROM lineitem
             |  JOIN part ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN nation ON n_nationkey = s_nationkey
             |  WHERE n_name IN ('NATION_13', 'NATION_3', 'NATION_8')
             |  GROUP BY 1
             |), tot AS (SELECT sum(val) AS tv, count(*) AS np FROM pv)
             |SELECT l_partkey AS p_partkey, CAST(val AS BIGINT)
             |  AS value_x100
             |FROM pv, tot WHERE val * np > 2 * tv
             |ORDER BY value_x100 DESC, p_partkey""".stripMargin)),

    // J4: anti-join (sample_indexer.py:32-33 driver set-difference,
    // rebuilt distributed — SURVEY §7.3 hazard 1).
    Q("j4_anti_join",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN
             |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // J4b/P4: left-semi join — the scalable rewrite of the reference's
    // driver-built `isin` membership filter (sample_indexer.py:39).
    Q("j5_semi_join",
      (s, d) => customer(s, d)
        .join(orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
             |WHERE c_custkey IN
             |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // J5/J7: union + distinct of key sets (sample_indexer.py:32).
    Q("set_union_distinct",
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .union(supplier(s, d).select(col("s_nationkey").as("nk")))
        .distinct()
        .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
             |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    // §2.7: except ≈ the driver set-difference, distributed.
    Q("set_except",
      (s, d) => orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("ck"))
        .except(orders(s, d).filter(col("o_orderpriority") === "5-LOW")
          .select(col("o_custkey").as("ck")))
        .orderBy("ck"),
      Some("""SELECT o_custkey AS ck FROM orders WHERE o_orderpriority = '1-URGENT'
             |EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
             |ORDER BY ck""".stripMargin)),

    Q("set_intersect",
      (s, d) => customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(supplier(s, d).select(col("s_nationkey").as("nk")))
        .orderBy("nk"),
      Some("""SELECT c_nationkey AS nk FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin)),

    // ----- §2.4 aggregations --------------------------------------------
    // A1: the ground-truth list build (param_train_1st.py:39-41), with the
    // reference's sort-before-groupBy hazard fixed by sort_array inside the
    // agg (SURVEY §7.3 hazard 2).
    Q("a1_collect_list",
      (s, d) => orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))).cast("array<string>"), ",")
          .as("orderkeys"))
        .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
             |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS orderkeys
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // A2: distinct (sample_indexer.py:28-30).
    Q("a2_distinct",
      (s, d) => orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
        .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // A3: group-by sum (EDA cell 73: play count per track).
    Q("a3_group_sum",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy("l_partkey"),
      Some("""SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_price
             |FROM lineitem GROUP BY l_partkey ORDER BY l_partkey""".stripMargin)),

    // A4: count-by-group (EDA cell 72 value_counts).
    Q("a4_count_by_group",
      (s, d) => events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""SELECT event_type, count(*) AS n FROM events
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // A5: map-of-pairs per group (EDA cells 36-37 {tag→val} dicts), emitted
    // as parallel sorted arrays serialized to CSV text (top-level array
    // columns are not hashable by the driver comparator). Doubles are scaled
    // to cent-integers so both engines format identically.
    Q("a5_group_entries",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"), col("l_quantity").as("qty")))).as("e"))
        .select(col("l_orderkey"),
          array_join(col("e.ln").cast("array<string>"), ",").as("lns"),
          array_join(transform(col("e.qty"),
            q => round(q * 100).cast("long").cast("string")), ",").as("qtys_c"))
        .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             |  array_to_string(list(l_linenumber ORDER BY l_linenumber, l_quantity), ',') AS lns,
             |  array_to_string(list(CAST(round(l_quantity * 100) AS BIGINT)
             |    ORDER BY l_linenumber, l_quantity), ',') AS qtys_c
             |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin)),

    // A5 (true map form): map_from_entries, serialized via to_json so the
    // MapType column survives the driver's hash path. Entry order inside the
    // map is pinned by sort_array before map construction; values scaled to
    // cent-integers for identical JSON number formatting in both engines.
    Q("a5_map_from_entries",
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .agg(to_json(map_from_entries(sort_array(collect_list(struct(
          col("event_id"), round(col("value") * 100).cast("long").as("v")))))).as("event_values"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  CAST(to_json(map_from_entries(list(
             |    row(event_id, CAST(round(value * 100) AS BIGINT)) ORDER BY event_id)))
             |    AS VARCHAR) AS event_values
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // A6: rank over an aggregate (EDA cell 86 genre popularity rank).
    // TinyWindow: the frame is the event_type aggregate — cardinality is
    // the number of distinct event types (single digits at any corpus
    // size), so the single-partition rank is deliberate and bounded.
    Q("a6_rank_agg",
      (s, d) => events(s, d).groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .withColumn("rnk",
          rank().over(graft.operators.TinyWindow.total(col("event_type"))(desc("n"), col("event_type")))
            .cast("long"))
        .orderBy("rnk", "event_type"),
      Some("""SELECT event_type, n, rank() OVER (ORDER BY n DESC, event_type) AS rnk
             |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type) t
             |ORDER BY rnk, event_type""".stripMargin)),

    // A7: describe/summary (EDA cell 59) — mean/sd derived from exact
    // grain-rounded sums so both engines compute bit-identical doubles.
    Q("a7_summary_stats",
      (s, d) => events(s, d).agg(
        count(col("value")).as("cnt"),
        round(round(sum(col("value")), 2) / count(col("value")), 4).as("mean"),
        round(sqrt(
          (round(sum(col("value") * col("value")), 4)
            - round(sum(col("value")), 2) * round(sum(col("value")), 2) / count(col("value")))
            / (count(col("value")) - 1)), 4).as("sd"),
        round(min(col("value")), 2).as("mn"),
        round(max(col("value")), 2).as("mx")),
      Some("""SELECT count(value) AS cnt,
             |  round(round(sum(value), 2) / count(value), 4) AS mean,
             |  round(sqrt((round(sum(value*value), 4)
             |      - round(sum(value), 2) * round(sum(value), 2) / count(value))
             |    / (count(value) - 1)), 4) AS sd,
             |  round(min(value), 2) AS mn,
             |  round(max(value), 2) AS mx
             |FROM events""".stripMargin)),

    // A8: histogram binning + proportions (EDA cells 77-82).
    Q("a8_histogram",
      (s, d) => {
        val bin = when(col("value") < 2, "0_under2")
          .when(col("value") < 5, "1_2to5")
          .when(col("value") < 10, "2_5to10")
          .when(col("value") < 20, "3_10to20")
          .otherwise("4_20plus")
        // TinyWindow: the grand-total window runs over the 5-bucket
        // histogram aggregate — bounded by the CASE arms, not the data
        events(s, d).select(bin.as("bin"))
          .groupBy(col("bin")).agg(count(lit(1)).as("n"))
          .withColumn("pct",
            round(col("n") * lit(100.0)
              / sum(col("n")).over(graft.operators.TinyWindow.whole(col("bin"))), 4))
          .orderBy("bin")
      },
      Some("""WITH b AS (SELECT CASE WHEN value < 2 THEN '0_under2'
             |  WHEN value < 5 THEN '1_2to5' WHEN value < 10 THEN '2_5to10'
             |  WHEN value < 20 THEN '3_10to20' ELSE '4_20plus' END AS bin FROM events)
             |SELECT bin, count(*) AS n,
             |  round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
             |FROM b GROUP BY bin ORDER BY bin""".stripMargin)),

    // A9: argmax per group with ties kept (EDA cell 96 select_genre).
    Q("a9_argmax",
      (s, d) => orders(s, d)
        .withColumn("r", rank().over(
          Window.partitionBy(col("o_custkey")).orderBy(desc("o_totalprice"))))
        .filter(col("r") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice FROM
             |  (SELECT o_custkey, o_orderkey, o_totalprice,
             |     rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS r
             |   FROM orders) t
             |WHERE r = 1 ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // A10: RMSE (learning_curve.py:75-76) — value vs. its per-type mean,
    // from exact grain-rounded sums (bit-identical across engines).
    Q("a10_rmse",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(round(sum(col("value") * col("value")), 4).as("ssq"),
          round(sum(col("value")), 2).as("sv"),
          count(lit(1)).as("n"))
        .agg(round(sqrt(sum(col("ssq") - col("sv") * col("sv") / col("n")) / sum(col("n"))), 4)
          .as("rmse")),
      Some("""WITH g AS (SELECT event_type, round(sum(value*value), 4) AS ssq,
             |  round(sum(value), 2) AS sv, count(*) AS n FROM events GROUP BY event_type)
             |SELECT round(sqrt(sum(ssq - sv*sv/n) / sum(n)), 4) AS rmse FROM g""".stripMargin)),

    // A12: rollup — hierarchical subtotals in one pass (groupBy + rollup
    // lowers to a single Expand + partial aggregate; at scale this beats
    // N separate group-bys re-reading the fact table N times).
    Q("a12_rollup",
      (s, d) => events(s, d)
        .rollup(col("event_type"), (col("user_id") % 10).as("user_bucket"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("user_bucket"), lit(-1)).as("user_bucket"), col("n"))
        .orderBy("event_type", "user_bucket"),
      Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
             |  coalesce(user_id % 10, -1) AS user_bucket, count(*) AS n
             |FROM events GROUP BY ROLLUP (event_type, (user_id % 10))
             |ORDER BY event_type, user_bucket""".stripMargin)),

    // A13: pivot — event counts per user spread across type columns; the
    // Spark pivot lowers to one pass of conditional aggregates (same plan
    // the oracle states explicitly with FILTER).
    Q("a13_pivot",
      (s, d) => events(s, d)
        .groupBy(col("user_id"))
        .pivot(col("event_type"), Seq("click", "view", "purchase"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS click,
             |  count(*) FILTER (event_type = 'view') AS view,
             |  count(*) FILTER (event_type = 'purchase') AS purchase
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // P12: unpivot/melt — a13's inverse, the wide->long reshape every
    // metrics pipeline runs before a generic per-metric aggregation.
    // Spark's native Dataset.unpivot lowers to Expand (each input row
    // emits one output row per value column in a single pass — no
    // shuffle, no join); the oracle states the same reshape as the
    // explicit UNION ALL it is equivalent to. Values are 2-dp-quantized
    // on disk, so round(v, 2) is the identity on both engines
    // (storedPass discipline).
    Q("p12_unpivot",
      (s, d) => lineitem(s, d)
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "v")
        .select(col("l_orderkey"), col("l_linenumber"), col("metric"),
          round(col("v"), 2).as("v"))
        .orderBy("l_orderkey", "l_linenumber", "metric"),
      Some("""WITH base AS (
             |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |    l_discount
             |  FROM lineitem WHERE l_orderkey < 2000
             |)
             |SELECT l_orderkey, l_linenumber, metric, round(v, 2) AS v FROM (
             |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
             |    l_quantity AS v FROM base
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
             |  FROM base
             |  UNION ALL
             |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM base
             |)
             |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin)),

    // ----- §2.5 windows --------------------------------------------------
    // W2: per-key top-N by score (the top-500-per-user pattern, O4/W2).
    Q("w2_topk_per_key",
      (s, d) => events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(desc("value"), col("event_id")))
          .cast("long"))
        .filter(col("rn") <= 5)
        .select("user_id", "event_id", "value", "rn")
        .orderBy("user_id", "rn"),
      Some("""SELECT user_id, event_id, value, rn FROM
             |  (SELECT user_id, event_id, value,
             |     row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             |   FROM events) t
             |WHERE rn <= 5 ORDER BY user_id, rn""".stripMargin)),

    // W9: the SAME per-key top-N through the bounded-buffer Aggregator
    // (operators/TopK) instead of a rank window — w2 shuffles and sorts
    // every event before its rn<=5 filter; here partial aggregation caps
    // the buffer at k per (user x map partition) BEFORE the exchange, so
    // the shuffle carries candidates, not the corpus (PlanSpec pins the
    // two-level ObjectHashAggregate). Identical rows to w2 by the same
    // (value desc, event_id) total order — the oracle is w2's. Honest
    // bench note: at sf0.1 (100k events, ~7 rows/user) wall-time is
    // PARITY with w2 (~0.7 s both) — UDAF object handling offsets the
    // shuffle savings when keys are this thin; the lever is shuffle
    // VOLUME, which caps at k x keys x partitions instead of the corpus.
    Q("w9_topk_agg",
      (s, d) => {
        val top5 = graft.operators.TopK.topK(5)
        events(s, d)
          .groupBy(col("user_id"))
          .agg(top5(col("value"), col("event_id")).as("top"))
          .select(col("user_id"),
            posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("user_id"), col("t.id").as("event_id"),
            col("t.score").as("value"), (col("pos") + 1).cast("long").as("rn"))
          .orderBy("user_id", "rn")
      },
      Some("""SELECT user_id, event_id, value, rn FROM
             |  (SELECT user_id, event_id, value,
             |     row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
             |   FROM events) t
             |WHERE rn <= 5 ORDER BY user_id, rn""".stripMargin)),

    // W3: event-time tumbling window aggregation — the batch face of the
    // Structured Streaming surface (graft.streaming.EventStream shares this
    // exact aggregation; EventStreamSpec checks stream==batch). events.ts is
    // nanos-since-epoch (see Tables.eventTime).
    Q("w3_tumbling_window",
      (s, d) => graft.streaming.EventStream.tumblingTypeCounts(
        events(s, d).withColumn("ts", Tables.eventTime(col("ts"))), "1 hour")
        // epoch seconds, not raw timestamps: the comparator's datetime
        // handling is engine-sensitive (ns vs us resolution), integers not
        .withColumn("win_start", col("win_start").cast("long"))
        .orderBy("win_start", "event_type"),
      Some("""SELECT epoch(time_bucket(INTERVAL '1 hour', ts))::BIGINT AS win_start,
             |  event_type, count(*) AS n, round(sum(value), 2) AS sv
             |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin)),

    // W4: session windows — per-user sessions split at 30-minute gaps.
    // Spark's session_window is a merging group-by (streaming-capable,
    // state = one open session per key); the oracle derives the identical
    // sessions with gaps-and-islands SQL (lag + running sum). Session
    // boundary semantics: an event exactly 30 min after the previous one
    // starts a NEW session (Spark merges only while ts < previous + gap).
    Q("w4_session_window",
      (s, d) => events(s, d)
        .withColumn("ts", Tables.eventTime(col("ts")))
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").cast("long").as("session_start"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("""WITH x AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
             |    THEN 1 ELSE 0 END AS new_s
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), y AS (
             |  SELECT user_id, ts, sum(new_s) OVER (
             |    PARTITION BY user_id ORDER BY ts
             |    ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x
             |)
             |SELECT user_id, epoch_us(min(ts)) // 1000000 AS session_start,
             |  count(*) AS n_events
             |FROM y GROUP BY user_id, sid
             |ORDER BY user_id, session_start""".stripMargin)),

    // J8: as-of join — each click joined to the user's latest purchase at
    // or before it (graft.operators.AsOfJoin: union + running window, one
    // shuffle, no key-local cross product). The oracle runs DuckDB's
    // NATIVE ASOF JOIN, so this row cross-checks the composed operator
    // against an engine-native implementation.
    Q("j8_asof_join",
      (s, d) => {
        val ev = events(s, d).withColumn("ts", Tables.eventTime(col("ts")))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id").as("src_id"),
            round(col("value"), 2).as("src_val"))
        graft.operators.AsOfJoin
          .asOfInner(clicks, purchases, "user_id", "ts", Seq("src_id", "src_val"))
          .select(col("event_id"), col("user_id"),
            col("asof_src_id"), col("asof_src_val"))
          .orderBy("event_id")
      },
      Some("""SELECT c.event_id, c.user_id,
             |  p.event_id AS asof_src_id, round(p.value, 2) AS asof_src_val
             |FROM (SELECT * FROM events WHERE event_type = 'click') c
             |ASOF JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY c.event_id""".stripMargin)),

    // J9: range join — events matched to (overlapping) value bands via the
    // bucketed rewrite (graft.operators.RangeJoin): intervals explode to
    // the buckets they cover, points equi-join their bucket, exact
    // predicate refines. The oracle states the raw inequality join.
    Q("j9_range_join",
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("low", 0.0, 2.0), ("mid", 2.0, 10.0), ("high", 10.0, 30.0),
          ("xhigh", 30.0, 1000.0), ("overlap", 5.0, 15.0)
        ).toDF("band", "lo", "hi")
        graft.operators.RangeJoin
          .pointInInterval(
            events(s, d).select(col("event_id"), col("value")),
            bands, "value", "lo", "hi", 5.0)
          .select(col("event_id"), col("band"))
          .orderBy("event_id", "band")
      },
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('low', 0.0, 2.0), ('mid', 2.0, 10.0), ('high', 10.0, 30.0),
             |  ('xhigh', 30.0, 1000.0), ('overlap', 5.0, 15.0))
             |SELECT event_id, band
             |FROM events JOIN bands ON value >= lo AND value < hi
             |ORDER BY event_id, band""".stripMargin)),

    // J15: INTERPOLATING as-of join — the temporal op past j8's
    // last-value-carry: each click is priced at the LINEAR INTERPOLATION
    // of the user's surrounding purchase values (the sensor/market-data
    // standard where "the last observation" is too stale). Implemented
    // as the merge-streams window shape: union both streams, one shuffle
    // on user_id, and two frames over the SAME sort (last-non-null
    // preceding = bracket left, first-non-null following = bracket
    // right) — no inequality join, no per-row probe; state is one
    // ordered pass per user at any scale. Exactness discipline: all
    // arithmetic is non-negative integers — timestamps as exact micros
    // (nanos div 1000; micros NOT nanos so cents*span stays ~600x under
    // Long.Max at multi-year spans), values as cents, and the
    // interpolation in the cross form vp*(tn-t) + vn*(t-tp) (every term
    // >= 0, so Spark's truncating `div` and DuckDB's flooring `//`
    // agree). Quotes sort BEFORE clicks at equal timestamps (kind 0 < 1),
    // so a quote exactly at t brackets left and interp collapses to vp
    // exactly; (t_us, kind, id) is a total per-user order.
    Q("j15_interp_asof",
      (s, d) => {
        val ev = events(s, d).withColumn("t_us", expr("ts div 1000"))
        val m = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("t_us"), lit(0).as("kind"),
            col("event_id").as("id"),
            round(col("value") * 100).cast("long").as("cents"))
          .unionByName(ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("t_us"), lit(1).as("kind"),
              col("event_id").as("id"), lit(null).cast("long").as("cents")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t_us"), col("kind"), col("id"))
        val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val qt = when(col("kind") === 0, col("t_us"))
        m.withColumn("p_cents", last(col("cents"), ignoreNulls = true).over(wp))
          .withColumn("p_t", last(qt, ignoreNulls = true).over(wp))
          .withColumn("n_cents", first(col("cents"), ignoreNulls = true).over(wn))
          .withColumn("n_t", first(qt, ignoreNulls = true).over(wn))
          .filter(col("kind") === 1
            && col("p_cents").isNotNull && col("n_cents").isNotNull
            && col("n_t") > col("p_t"))
          .select(col("user_id"), col("id").as("event_id"), col("t_us"),
            col("p_cents"), col("n_cents"),
            (col("t_us") - col("p_t")).as("dt_prev_us"),
            (col("n_t") - col("t_us")).as("dt_next_us"),
            expr("(p_cents * (n_t - t_us) + n_cents * (t_us - p_t)) div (n_t - p_t)")
              .as("interp_cents"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id AS id, epoch_ns(ts) // 1000 AS t_us,
             |    event_type, value
             |  FROM events
             |), m AS (
             |  SELECT user_id, t_us, 0 AS kind, id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM ev WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, t_us, 1, id, NULL
             |  FROM ev WHERE event_type = 'click'
             |), x AS (
             |  SELECT *,
             |    last_value(cents IGNORE NULLS) OVER wp AS p_cents,
             |    last_value(CASE WHEN kind = 0 THEN t_us END IGNORE NULLS)
             |      OVER wp AS p_t,
             |    first_value(cents IGNORE NULLS) OVER wn AS n_cents,
             |    first_value(CASE WHEN kind = 0 THEN t_us END IGNORE NULLS)
             |      OVER wn AS n_t
             |  FROM m
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY t_us, kind, id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wn AS (PARTITION BY user_id ORDER BY t_us, kind, id
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |)
             |SELECT user_id, id AS event_id, t_us, p_cents, n_cents,
             |  t_us - p_t AS dt_prev_us, n_t - t_us AS dt_next_us,
             |  (p_cents * (n_t - t_us) + n_cents * (t_us - p_t)) // (n_t - p_t)
             |    AS interp_cents
             |FROM x
             |WHERE kind = 1 AND p_cents IS NOT NULL AND n_cents IS NOT NULL
             |  AND n_t > p_t
             |ORDER BY event_id""".stripMargin)),

    // J17: NEAREST as-of join (pandas merge_asof direction='nearest') —
    // the fourth member of the as-of family: j8 carries the LAST value
    // backward, j11 bounds it with a tolerance, j15 interpolates between
    // brackets; sensor/market alignment often wants the temporally
    // CLOSEST observation in EITHER direction. Same merge-streams shape
    // as j15 (both bracket frames over ONE user_id exchange — no
    // inequality join, no second shuffle); the winner is decided by an
    // exact integer micros comparison with ties pinned to the earlier
    // observation, and a click with any bracket at all matches (one-
    // sided brackets take the side that exists). direction = -1 (prev) /
    // +1 (next) makes the decision part of the row.
    Q("j17_nearest_asof",
      (s, d) => {
        val ev = events(s, d).withColumn("t_us", expr("ts div 1000"))
        val m = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("t_us"), lit(0).as("kind"),
            col("event_id").as("id"),
            round(col("value") * 100).cast("long").as("cents"))
          .unionByName(ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("t_us"), lit(1).as("kind"),
              col("event_id").as("id"), lit(null).cast("long").as("cents")))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("t_us"), col("kind"), col("id"))
        val wp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val qt = when(col("kind") === 0, col("t_us"))
        val qid = when(col("kind") === 0, col("id"))
        val br = m
          .withColumn("p_t", last(qt, ignoreNulls = true).over(wp))
          .withColumn("p_id", last(qid, ignoreNulls = true).over(wp))
          .withColumn("p_cents", last(col("cents"), ignoreNulls = true).over(wp))
          .withColumn("n_t", first(qt, ignoreNulls = true).over(wn))
          .withColumn("n_id", first(qid, ignoreNulls = true).over(wn))
          .withColumn("n_cents", first(col("cents"), ignoreNulls = true).over(wn))
          .filter(col("kind") === 1
            && (col("p_t").isNotNull || col("n_t").isNotNull))
        val takePrev = col("p_t").isNotNull && (col("n_t").isNull
          || (col("t_us") - col("p_t")) <= (col("n_t") - col("t_us")))
        br.select(col("user_id"), col("id").as("event_id"), col("t_us"),
            when(takePrev, col("p_id")).otherwise(col("n_id"))
              .as("nearest_id"),
            when(takePrev, col("p_cents")).otherwise(col("n_cents"))
              .as("nearest_cents"),
            when(takePrev, col("t_us") - col("p_t"))
              .otherwise(col("n_t") - col("t_us")).as("dt_us"),
            when(takePrev, lit(-1)).otherwise(lit(1)).as("direction"))
          .orderBy("event_id")
      },
      Some("""WITH ev AS (
             |  SELECT user_id, event_id AS id, epoch_ns(ts) // 1000 AS t_us,
             |    event_type, value
             |  FROM events
             |), m AS (
             |  SELECT user_id, t_us, 0 AS kind, id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM ev WHERE event_type = 'purchase'
             |  UNION ALL
             |  SELECT user_id, t_us, 1, id, NULL
             |  FROM ev WHERE event_type = 'click'
             |), x AS (
             |  SELECT *,
             |    last_value(CASE WHEN kind = 0 THEN t_us END IGNORE NULLS)
             |      OVER wp AS p_t,
             |    last_value(CASE WHEN kind = 0 THEN id END IGNORE NULLS)
             |      OVER wp AS p_id,
             |    last_value(cents IGNORE NULLS) OVER wp AS p_cents,
             |    first_value(CASE WHEN kind = 0 THEN t_us END IGNORE NULLS)
             |      OVER wn AS n_t,
             |    first_value(CASE WHEN kind = 0 THEN id END IGNORE NULLS)
             |      OVER wn AS n_id,
             |    first_value(cents IGNORE NULLS) OVER wn AS n_cents
             |  FROM m
             |  WINDOW wp AS (PARTITION BY user_id ORDER BY t_us, kind, id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wn AS (PARTITION BY user_id ORDER BY t_us, kind, id
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             |), n AS (
             |  SELECT user_id, id AS event_id, t_us,
             |    p_t IS NOT NULL AND (n_t IS NULL
             |      OR t_us - p_t <= n_t - t_us) AS take_prev,
             |    p_t, p_id, p_cents, n_t, n_id, n_cents
             |  FROM x
             |  WHERE kind = 1 AND (p_t IS NOT NULL OR n_t IS NOT NULL)
             |)
             |SELECT user_id, event_id, t_us,
             |  CASE WHEN take_prev THEN p_id ELSE n_id END AS nearest_id,
             |  CASE WHEN take_prev THEN p_cents ELSE n_cents END
             |    AS nearest_cents,
             |  CASE WHEN take_prev THEN t_us - p_t ELSE n_t - t_us END
             |    AS dt_us,
             |  CASE WHEN take_prev THEN -1 ELSE 1 END AS direction
             |FROM n ORDER BY event_id""".stripMargin)),

    // ----- §2.6 sorts / limits / top-k / sampling ------------------------
    // O1: global sort (param_train_1st.py:58).
    Q("o1_sort",
      (s, d) => orders(s, d).select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), col("o_orderkey")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin)),

    // O2: limit (EDA cell 43) — made deterministic with an order.
    Q("o2_limit",
      (s, d) => orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey").limit(1000),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 1000""".stripMargin)),

    // O3: top-k after aggregate (EDA cell 74) → TakeOrderedAndProject.
    Q("o3_topk",
      (s, d) => lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(round(sum(col("l_extendedprice")), 2).as("rev"))
        .orderBy(desc("rev"), col("l_partkey"))
        .limit(20),
      Some("""SELECT l_partkey, round(sum(l_extendedprice), 2) AS rev
             |FROM lineitem GROUP BY l_partkey
             |ORDER BY rev DESC, l_partkey LIMIT 20""".stripMargin)),

    // O5: Bernoulli row sampling (als_model_extension_2.py:38). Seeded Spark
    // sampling is engine-specific → rows-only check (no oracle) — so the
    // row carries its OWN evidence (VERDICT r4 #8): per-group population
    // count and an in_bounds flag asserting the sampled count sits within
    // ±6σ binomial bounds of rate·N (P(violation) < 1e-8 for a correct
    // sampler, so the column is deterministic-in-practice AND meaningful).
    Q("o5_row_sample",
      (s, d) => {
        val li = lineitem(s, d)
        val rate = 0.1
        val sampled = li.sample(withReplacement = false, rate, 66)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        val pop = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("pop_n"))
        // evidence must fail CLOSED: the population side is the base and
        // the sampled counts left-join onto it, so a group the sampler
        // lost entirely still emits its row — with n=0 and in_bounds=0 —
        // instead of silently vanishing from the output
        pop.join(sampled, Seq("l_returnflag"), "left")
          .select(col("l_returnflag"),
            coalesce(col("n"), lit(0L)).as("n"), col("pop_n"),
            (abs(coalesce(col("n"), lit(0L)) - col("pop_n") * rate)
              <= lit(6.0) * sqrt(col("pop_n") * rate * (1 - rate)))
              .cast("long").as("in_bounds"))
          .orderBy("l_returnflag")
      },
      None),

    // O6: key-level sampling, distributed (sample_indexer.py:36-39 rebuilt:
    // sample the *keys*, keep all their rows via semi-join — no driver
    // collect, no giant isin literal). Self-evidencing: `complete` asserts
    // the semi-join kept EVERY event of each sampled user (the whole point
    // of key-level over row-level sampling — a 0 anywhere means the join
    // dropped interactions).
    Q("o6_user_sample",
      (s, d) => {
        val ev = events(s, d)
        val users = ev.select(col("user_id")).distinct()
          .sample(withReplacement = false, 0.5, 42)
        val kept = ev.join(users, Seq("user_id"), "left_semi")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
        val all = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_total"))
        // fail CLOSED: the sampled key set is the base — a sampled user
        // whose events the semi-join lost entirely still emits a row with
        // n_events=0 / complete=0 rather than disappearing
        users.join(kept, Seq("user_id"), "left").join(all, Seq("user_id"))
          .select(col("user_id"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            (coalesce(col("n_events"), lit(0L)) === col("n_total"))
              .cast("long").as("complete"))
          .orderBy("user_id")
      },
      None)
  )
}
