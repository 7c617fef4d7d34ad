package graft.audit

/** Overflow-headroom audit for every DECIMAL(38,0)/HUGEINT product in the
  * registry (VERDICT r12 #1).
  *
  * The decimal-overflow class drew hand-fixed advice three rounds running
  * (r9 a25 scaling; r11 a25/a26/a27/a28 — each an UNBOUNDED product of two
  * non-constant integer terms that exhausts decimal38/HUGEINT once the data
  * grows past the scale the author pictured: d_num² at a billion-point KS
  * sample, |n·Σxy − Σx·Σy|² on price-proportional OLS groups, …). The fixes
  * (992f140) are mechanical disciplines — divide-through-before-squaring,
  * adaptive shared-digit truncation — but nothing SCANNED the registry for
  * the next unbounded product the way OracleTypeGuardSpec scans result
  * types. This audit is that scanner:
  *
  *   - `suspects` tokenizes a query text (oracle SQL, or a Scala query
  *     block with `//`-comment lines stripped) and, when the text touches
  *     wide-integer surface (HUGEINT / DECIMAL(38), reports every product
  *     `X * Y` whose BOTH sides are non-literal terms — a constant factor
  *     only shifts magnitude by a known amount; two data-dependent factors
  *     are where headroom silently dies;
  *   - every query with a suspect product MUST have an `entries` row that
  *     states the product's magnitude BOUND (with an explicit power of
  *     ten) and pins the SQL fragments that carry the bounding mechanism —
  *     if a later edit drops e.g. a29's divide-through-by-nm before the
  *     square, the pin fails in the builder's test loop, not the driver's
  *     gate;
  *   - HeadroomAuditSpec proves the detector fires on the round-11 a28
  *     reject_05 text (the d_num²·1e6 form that overflowed past
  *     d_num ≈ 3.2e15) replayed verbatim, and runs the registry scan over
  *     both the oracle SQL map and the per-query Scala source blocks —
  *     0 unaudited products is the green condition.
  *
  * Magnitude conventions used in the bounds below: fact-table rows at
  * 100 TB ≈ 1e13; cents per row ≤ 1e7 (order values ≤ $100k); decimal38
  * ceiling 1e38, HUGEINT ceiling ≈ 1.7e38, int64 ceiling ≈ 9.2e18 (every
  * `div`/`//` of decimals lowers to LONG, so each truncating QUOTIENT must
  * also be int64-bounded — the r11 lesson).
  */
object HeadroomAudit {

  /** One audited query: the stated headroom bound (must name a power of
    * ten) and the oracle-SQL fragments that carry the bounding mechanism.
    */
  final case class Headroom(bound: String, pins: Seq[String])

  private val margin = "\\n\\s*\\|".r
  private val ws = "\\s+".r
  private val numeric = "^[0-9]+$".r

  /** True when the text computes on wide-integer surface at all — only
    * those queries can host a decimal/HUGEINT product.
    */
  def wideInteger(text: String): Boolean =
    text.contains("HUGEINT") || text.contains("DECIMAL(38") ||
      text.contains("decimal(38")

  /** Every product site `X * Y` in `text` where both operands are
    * non-literal terms. Operates on a whitespace-normalized view with
    * stripMargin pipes removed, so Scala-wrapped SQL and plain SQL scan
    * identically. A term ending in `)` or an identifier char counts as
    * non-constant; a bare integer (optionally `::`-cast or parenthesized)
    * is a constant factor.
    */
  def nonConstProducts(text: String): Seq[String] = {
    val t0 = ws.replaceAllIn(margin.replaceAllIn(text, " "), " ")
    // Constant factors are TRANSPARENT, not terminal: in `qty * 5 * cnt`
    // neither adjacent site is var·var (`qty * 5` and `5 * cnt` are both
    // const-sided), yet the composite product qty·cnt is exactly as
    // unbounded as `qty * cnt` — the var·const·var sibling of the
    // const-led chain ADVICE r13 flagged. Deleting bare integer factors
    // (`* 123` and `123 *`) to a fixpoint makes the variable factors
    // adjacent so the var·var scan below sees the composite site.
    // Lookarounds keep digit-bearing identifiers (theta_x1e6) intact.
    val dropRight = "\\*\\s*[0-9]+(?![0-9A-Za-z_.(])".r
    val dropLeft = "(?<![0-9A-Za-z_.)])[0-9]+\\s*\\*".r
    var t = t0
    var prev = ""
    while (t != prev) {
      prev = t
      t = dropLeft.replaceAllIn(dropRight.replaceAllIn(t, ""), "")
    }
    // The right operand is a zero-width LOOKAHEAD so product sites can
    // overlap: in `2 * n1 * n2` the first match (`2 * `, filtered as
    // constant) must not consume `n1`, or the unbounded `n1 * n2` that
    // follows is never examined — exactly the const·var·var chain the
    // scanner exists to catch (ADVICE r13).
    val prod = "([A-Za-z0-9_().\\]]+|\\))\\s*\\*\\s*(?=([A-Za-z0-9_(:.]+))".r
    prod.findAllMatchIn(t).flatMap { m =>
      val l = m.group(1).replaceAll("^\\(+|\\)+$", "")
      val r = m.group(2)
      val lConst = numeric.findFirstIn(l).isDefined
      val rConst = r.headOption.exists(_.isDigit)
      if (lConst || rConst) None else Some(m.matched + r)
    }.toSeq
  }

  /** The audit trigger: suspect products of a wide-integer query text
    * (empty = nothing to audit in this text).
    */
  def suspects(text: String): Seq[String] =
    if (wideInteger(text)) nonConstProducts(text) else Nil

  /** Every query whose oracle SQL or Scala block carries a suspect
    * product, with its stated bound and mechanism pins. Adding a new
    * wide-integer product WITHOUT a row here fails HeadroomAuditSpec.
    */
  val entries: Map[String, Headroom] = Map(
    "a25_ols_trend" -> Headroom(
      "sufficient statistics: n,Σx,Σy,Σx²,Σxy,Σy² ≤ 1e13·(1e7)² = 1e27 in " +
        "decimal38; slope/intercept numerators n·Σxy−Σx·Σy ≤ 1e40-risky " +
        "ONLY via R² squaring, so both engines drop the same adaptive " +
        "tr = 10^max(0, digits(|rnum|)−16, digits(rdenx)−18, " +
        "digits(rdeny)−18) low digits first: |rnum/tr| ≤ 1e16 keeps " +
        "rnum_t²·1e6 ≤ 1e38 and den_t·den_t ≤ 1e36; the −18 branches keep " +
        "every truncating quotient inside int64",
      Seq("length(CAST(abs(rnum) AS VARCHAR)) - 16",
        "length(CAST(rdenx AS VARCHAR)) - 18",
        "(rnum // tr) * (rnum // tr) * 1000000")),
    "a26_chi_square" -> Headroom(
      "cell terms u = O·N−R·C ≤ 1e13·1e13 = 1e26 and den = R·C·N ≤ 1e39-" +
        "risky; the a25 adaptive truncation drops tr = 10^max(0, " +
        "digits(|u|)−16, digits(den)−18) shared digits so (u/tr)²·1e6 ≤ " +
        "1e38 and every den//tr//tr quotient is int64",
      Seq("length(CAST(abs(u) AS VARCHAR)) - 16",
        "(u // tr) * (u // tr) * 1000000")),
    "a31_cramers_v" -> Headroom(
      "a26's contingency arithmetic verbatim (u ≤ 1e26, adaptive tr caps " +
        "(u/tr)²·1e6 ≤ 1e38); the extra V² step divides chi2 ≤ 1e19-ish " +
        "by N·(min(nl,ns)−1) ≤ 1e15 — one more int64-safe quotient",
      Seq("length(CAST(abs(u) AS VARCHAR))",
        "(CAST(nn AS HUGEINT) * (least(nl, ns) - 1))")),
    "a27_rank_correlation" -> Headroom(
      "ranks ≤ n ≤ 1e9 parts → Σd² ≤ n³ ≤ 1e27 in decimal38; " +
        "6·Σd²·1e6 ≤ 6e33 and the denominator n³−n ≤ 1e27 — both inside " +
        "decimal38/HUGEINT, and the emitted mean_d2 = Σd²/n ≤ n² ≤ 1e18 " +
        "stays int64 (the raw sum would not past ~3e6 keys)",
      Seq("6 * sd2 * 1000000", "sd2 // nullif(n, 0)")),
    "a28_ks_test" -> Headroom(
      "D numerator d_num = max|cum_a·n_b − cum_b·n_a| ≤ n_a·n_b ≤ 1e26 at " +
        "1e13-point samples; the α=.05 decision divides through by n_a·n_b " +
        "BEFORE squaring (q = d_num·1e6 div n_a·n_b ≤ 1e6, so q²·1e6 ≤ " +
        "1e18 rides int64) — the r11 d_num²·1e6 form died at " +
        "d_num ≈ 3.2e15",
      Seq("1844164", "// nullif(CAST(n_a AS HUGEINT) * n_b, 0)")),
    "a29_mann_whitney" -> Headroom(
      "rank sums ≤ n² ≤ 1e26 ride decimal38 from the first aggregate; the " +
        "decision divides |u2−nm| through by nm before squaring: each " +
        "quotient ≤ 1e6, so the squared form ·1e4 ≤ 1e16 and the RHS " +
        "38416·(nn+1)·1e12 // nm stays int64",
      Seq("38416", "(abs(u2 - nm) * 1000000 // nullif(nm, 0))")),
    "a32_two_proportion" -> Headroom(
      "x1·n2−x2·n1 ≤ n1·n2 ≤ 1e26 in HUGEINT; the pooled z² decision " +
        "divides through by (n1·n2)²·N: each |Δ|·1e6 // n1·n2 quotient " +
        "≤ 1e6, the square ·1e4 ≤ 1e16, and the RHS 38416·x·(N−x)·1e12 // " +
        "(n1·n2·N) ≤ 38416·1e12 — all int64 at any scale or imbalance",
      Seq("38416", "// (CAST(n1 AS HUGEINT) * n2 * (n1 + n2))")),
    "a34_runs_test" -> Headroom(
      "m = n1·n2 ≤ nn² ≤ 1e14 at hourly grain (nn ≤ 3e7 bins even over " +
        "four millennia); q = |nn·(runs−1)−2m|·1e6 div 2m ≤ 1e6·nn, so " +
        "q²·(nn−1)·1e4 ≤ 1e38-safe decimal38 and the RHS " +
        "38416·(2m−nn)·1e12 div 2m ≤ 38416·1e12 stays int64",
      Seq("38416", "// nullif(2 * CAST(n1 AS HUGEINT) * n2, 0)")),
    "a35_acf" -> Headroom(
      "hourly bin sums x ≤ 3e5 rows/bin · 1e7 cents = 3e12 at 1e13-row " +
        "hourly grain; deviations d = x − (S div n) ≤ 3e12, products " +
        "d_i·d_{i+k} ≤ 1e25, sums N_k, D ≤ 3e32 in decimal38; since " +
        "|N_k| ≤ D (Cauchy-Schwarz), N_k·1e6 can reach 3e38 — the a25 " +
        "adaptive truncation tr = 10^max(0, digits(|N_k|)−31, " +
        "digits(D)−18) keeps (N_k/tr)·1e6 ≤ 1e37 and D/tr ≤ 1e18, every " +
        "lowered quotient int64",
      Seq("length(CAST(abs(nk) AS VARCHAR)) - 31",
        "(nk // tr) * 1000000",
        "// nullif(d2 // tr, 0)")),
    "a36_odds_ratio" -> Headroom(
      "num = x1·(n2−x2) and den = x2·(n1−x1) ≤ n1·n2 ≤ 1e26 in HUGEINT; " +
        "the true OR is UNBOUNDED, so the statistic saturates at 1e6x: " +
        "the CASE tests num > den·1e6 (den·1e6 ≤ 1e32) FIRST and only " +
        "forms num·1e6 when num ≤ den·1e6 — then num·1e6 ≤ 1e32 fits " +
        "decimal38 and the lowered quotient is ≤ 1e12, inside int64 at " +
        "any scale or imbalance",
      Seq("WHEN den = 0 OR num > den * 1000000",
        "ELSE num * 1000000 // den END")),
    "c16_mixture_raking" -> Headroom(
      "IPF runs on x1e12 SHARES, not counts (counts would put the " +
        "int64-lowered quotients past 9e18 at 1e13 docs): every w, tl, " +
        "tsrc, and marginal sum is ≤ 1e12·|cells| ≈ 1e15, each round's " +
        "product w·t ≤ 1e27 rides DECIMAL(38,0) vs HUGEINT, and every " +
        "truncating quotient is ≤ 1e12 — int64-safe at any corpus size " +
        "or category skew",
      Seq("* 1000000000000 // nn",
        "CAST(CAST(w AS HUGEINT) * tl // nullif(sm, 0) AS BIGINT)")),
    "a37_cuped" -> Headroom(
      "per-user lifetime cents x, y ≤ 1e10, so Σx ≤ 1e19 and the moment " +
        "sums Σxy ≤ 1e29 at 1e9 users ride decimal38; n·Σxy − Σx·Σy can " +
        "reach 1e38 — theta and rho² take a25's adaptive truncation " +
        "(|rnum/tr| ≤ 1e16, den/tr ≤ 1e18, every lowered quotient " +
        "int64); the adjusted means fix their own truncation points: " +
        "the centered pre-mean diff (Sx_a·n − Sx·n_a) ≤ 1e28 is divided " +
        "by n_a·n at the x100 grain FIRST (quotient ≤ 1e12), then the " +
        "theta_x1e6 product ≤ 1e19 EXCEEDS int64 (9.2e18) — theta is " +
        "unbounded when Var(X) is small — so the Spark side lifts the " +
        "long-lowered theta back to DECIMAL(38,0) before the multiply " +
        "(the a25 rule; DuckDB rides HUGEINT) and divides back down to " +
        "≤ 1e17 — exact at any scale or split imbalance",
      Seq("length(CAST(abs(rnum) AS VARCHAR)) - 16",
        "(rnum // tr) * 1000000 // nullif(rdenx // tr, 0)",
        "(sx_a * n - sx * n_a) * 100",
        "// nullif(n_a * n, 0)) // 100")),
    "a39_srm" -> Headroom(
      "assignment diff = n_a − n_b is bounded by the user count n ≤ 1e10, " +
        "so diff²·1000 ≤ 1e23 rides DECIMAL(38,0) vs HUGEINT (int64 wraps " +
        "past |diff| ≈ 3e9 users); the RHS 10828·n ≤ 1e14 and the emitted " +
        "z2_x1e3 = diff²·1000 div n ≤ 1000·n ≤ 1e13 are int64-safe at any " +
        "imbalance",
      Seq("diff * diff * 1000", "10828::HUGEINT * n")),
    "m17_calibration" -> Headroom(
      "per-row squared Brier error (pred_x1e6 − label·1e6)² ≤ 1e12; the " +
        "per-bin sum ≤ 1e13 rows · 1e12 = 1e25 rides DECIMAL(38,0) vs " +
        "HUGEINT (int64 dies past ~9e6 rows/bin), and the emitted " +
        "brier_x1e12 quotient ≤ 1e12 plus the mean_pred/emp_rate " +
        "quotients ≤ 1e6 are int64-safe; pred_x1e6 = c·1e6 div cmax ≤ " +
        "1e13 per row never leaves int64",
      Seq("CAST(pred_x1e6 - label * 1000000 AS HUGEINT)",
        "* 1000000 // count(*)")),
    "c18_distribution_drift" -> Headroom(
      "per-category cross-multiplied gap |n1·t2 − n2·t1| ≤ t1·t2 ≤ 1e26 " +
        "in decimal38/HUGEINT (int64 wraps past ~3e9 rows/half); ·1e6 ≤ " +
        "1e32 stays inside decimal38, the divisor t1·t2 ≤ 1e26 likewise, " +
        "and every truncating quotient (shares, gaps, the TVD half-sum) " +
        "is ≤ 1e6·|categories| — int64 at any scale or split imbalance",
      Seq("abs(CAST(n1 AS HUGEINT) * t2",
        "// nullif(CAST(t1 AS HUGEINT) * t2, 0)")),
    "m18_gains_table" -> Headroom(
      "cum_pos·nn ≤ 1e13·1e13 = 1e26 rides decimal38 vs HUGEINT; rank " +
        "deciles guarantee cum_n ≥ nn div 10, so the lift quotient " +
        "cum_pos·nn·1e6 div (pp·cum_n) ≤ (cum_pos div pp)·11·1e6 ≤ " +
        "1.1e7 and capture ≤ 1e6 both ride int64 at any positive rate",
      Seq("CAST(cum_pos AS HUGEINT) * nn * 1000000",
        "// nullif(CAST(pp AS HUGEINT) * cum_n, 0)")),
    "f9_survival_km" -> Headroom(
      "the product-limit step multiplies the running survival s ≤ 1e12 " +
        "by the risk-set remainder (n_t − d_t) ≤ N ≤ 1e10 users, so the " +
        "intermediate ≤ 1e22 rides DECIMAL(38,0) vs HUGEINT (int64 wraps " +
        "past N ≈ 9e6) and the floored quotient returns to ≤ 1e12 every " +
        "step — the fold never grows past one step's headroom",
      Seq("CAST(acc[len(acc)][5] AS HUGEINT)",
        "* (e[1][2] - e[1][3]) // e[1][2]")),
    "a38_mde" -> Headroom(
      "per-type moments with c ≤ 1e7 cents: Q = Σc² ≤ n·1e14, so the " +
        "risky product n·Q ≤ n²·1e14 stays inside decimal38 for " +
        "n ≤ 1e12 rows PER TYPE — the stated envelope of this query " +
        "(1e13 total rows over ≥ 10 types holds it; a single hotter " +
        "type must pre-aggregate to per-user means first, the a37 " +
        "shape, which divides n by the events-per-user factor); " +
        "var_c2 = (n·Q − S²) div n² ≤ σ² ≤ 1e14, the final product " +
        "7848963·2·var_c2·1e4 ≤ 1.6e25 rides decimal38, and its " +
        "quotient ≤ 1e14 is int64-safe",
      Seq("(n * q - sc * sc) // (n * n)",
        "7848963::HUGEINT * 2 * var_c2 * 10000")),
    "b2_tpch_q5" -> Headroom(
      "per-row cents·(100−pct) ≤ 1e7·100 = 1e9; the decimal38 accumulator " +
        "holds 1e13 rows · 1e9 = 1e22 ≪ 1e38 (int64 would die at ~9e9 " +
        "rows); no further product downstream",
      Seq("round(l_extendedprice * 100)",
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")),
    "b3_tpch_q3" -> Headroom(
      "b2's bound verbatim: per-row cents·(100−pct) ≤ 1e9, decimal38 " +
        "accumulator ≤ 1e22 at 1e13 rows ≪ 1e38",
      Seq("round(l_extendedprice * 100)",
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")),
    "b6_tpch_q6" -> Headroom(
      "per-row cents·pct ≤ 1e7·6 = 6e7 under the pushed discount band; " +
        "the decimal38 accumulator holds 1e13 rows · 6e7 = 6e20 ≪ 1e38 " +
        "(int64 would die at ~1.5e11 rows); nothing downstream",
      Seq("round(l_extendedprice * 100)",
        "* CAST(round(l_discount * 100) AS BIGINT)")),
    "b7_tpch_q14" -> Headroom(
      "b2's bound per row (cents·(100−pct) ≤ 1e9, decimal38 accumulator " +
        "≤ 1e22 at 1e13 rows); the ratio lifts promo ≤ 1e22 by 1e8 to " +
        "≤ 1e30, still inside decimal38/HUGEINT, and the truncating " +
        "quotient ≤ 1e8 is int64",
      Seq("(100 - CAST(round(l_discount * 100) AS BIGINT))",
        "* 100000000")),
    "b8_tpch_q10" -> Headroom(
      "b2's bound verbatim: per-row cents·(100−pct) ≤ 1e9, decimal38 " +
        "accumulator ≤ 1e22 at 1e13 rows ≪ 1e38; no further product",
      Seq("round(l_extendedprice * 100)",
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")),
    "b9_tpch_q17" -> Headroom(
      "the decision product qty·5·cnt: qty ≤ 1e4 at the data's integral " +
        "grain and cnt = lineitems per part ≤ 1e9 even on a pathological " +
        "hot part, so qty·5·cnt ≤ 5e13 rides int64 (dies only past " +
        "cnt ≈ 1.8e14 rows on ONE part); sum_qty ≤ qty·cnt ≤ 1e13 " +
        "likewise; the cents accumulator holds 1e13 rows · 1e9 cents = " +
        "1e22 in decimal38 vs HUGEINT and its div-7 quotient emits at " +
        "the same magnitude",
      Seq("qty * 5 * cnt < sum_qty", "// 7")),
    "b10_tpch_q19" -> Headroom(
      "b2's bound verbatim under a MORE selective predicate: per-row " +
        "cents·(100−pct) ≤ 1e9, decimal38 accumulator ≤ 1e22 at 1e13 " +
        "rows ≪ 1e38; no further product",
      Seq("round(l_extendedprice * 100)",
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")),
    "b11_tpch_q15" -> Headroom(
      "b2's bound per supplier: per-row cents·(100−pct) ≤ 1e9 and even " +
        "a single supplier carrying the whole 1e13-row quarter keeps its " +
        "decimal38 accumulator ≤ 1e22 ≪ 1e38; the max/equality consumers " +
        "compare the emitted longs, no further product",
      Seq("round(l_extendedprice * 100)",
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")),
    "b17_tpch_q8" -> Headroom(
      "b2's bound per (year, nation) slice: per-row cents·(100−pct) ≤ " +
        "1e7·100 = 1e9, decimal38 accumulators ≤ 1e22 at 1e13 rows ≪ " +
        "1e38; the share ratio lifts nation_vol ≤ 1e22 by 1e6 to ≤ 1e28 " +
        "(still ≪ decimal38/HUGEINT) and its truncating quotient ≤ 1e6 " +
        "is int64 by construction (nation_vol ≤ total_vol)",
      Seq("(100 - CAST(round(l_discount * 100) AS BIGINT))",
        "* 1000000")),
    "b19_tpch_q9" -> Headroom(
      "per-row revenue cents·(100−pct) ≤ 1e7·100 = 1e9 and cost " +
        "qty·retail_cents·90 ≤ 1e4·1e7·90 = 9e12; |profit| per row ≤ " +
        "~1e13, so the decimal38 accumulator holds 1e13 rows · 1e13 = " +
        "1e26 ≪ 1e38 (int64 would die at ~9e5 rows); no further product " +
        "downstream of the sum",
      Seq("(100 - CAST(round(l_discount * 100) AS BIGINT))",
        "* CAST(round(p_retailprice * 100) AS BIGINT) * 90")),
    "b23_tpch_q11" -> Headroom(
      "per-row qty·retail_cents ≤ 1e4·1e7 = 1e11; a part's decimal38 " +
        "ledger value ≤ 1e11·1e9 rows-per-part = 1e20 ≪ 1e38; the " +
        "threshold cross-products val·np ≤ 1e20·1e10 = 1e30 and 2·tv ≤ " +
        "2e24 (tv ≤ 1e13 rows · 1e11) both ride decimal38/HUGEINT; the " +
        "emitted CAST(val AS BIGINT) is int64-bounded for parts " +
        "carrying ≤ 9e7 lineitems at the 1e11/row cap (the b12 " +
        "documented-envelope class)",
      Seq("* CAST(round(p_retailprice * 100) AS BIGINT)",
        "val * np > 2 * tv")),
    "m19_roc_auc" -> Headroom(
      "per-level product pos_s·(2·cumneg−neg) ≤ n1·2·n0 with n1,n0 ≤ " +
        "1e13 docs, so the decimal38 numerator Σ ≤ 2e26 and its ·1e6 " +
        "lift ≤ 2e32 ≪ 1e38; the denominator 2·n1·n0 ≤ 2e26 rides the " +
        "same width and the truncating AUC quotient ≤ 1e6 is int64 by " +
        "construction (numerator ≤ denominator·1e6)",
      Seq("* (2 * cum_neg - neg)", "* 1000000")),
    "b13_tpch_q7" -> Headroom(
      "b2's bound verbatim on the two-chain join: per-row " +
        "cents·(100−pct) ≤ 1e9, each (nation-pair, year) decimal38 " +
        "accumulator ≤ 1e22 at 1e13 rows ≪ 1e38; no further product",
      Seq("round(l_extendedprice * 100)",
        "(100 - CAST(round(l_discount * 100) AS BIGINT))")),
    "b12_tpch_q22" -> Headroom(
      "threshold cross-multiplication bal_c·n_pos: |bal_c| ≤ 1e9 cents " +
        "(balances are bounded account values, not revenue sums) and " +
        "n_pos ≤ 1e10 customers, so the product ≤ 1e19 EXCEEDS int64 — " +
        "both engines ride it in DECIMAL(38,0)/HUGEINT (≪ 1e38); sum_pos " +
        "≤ 1e19 likewise; the per-segment totals ≤ 1e19 emit after the " +
        "rich-customer filter cuts them far below (documented envelope: " +
        "output totals ≤ int64 at any segment skew because rich " +
        "customers are a strict subset of positive balances ≤ 1e19 " +
        "cents... the emitted cast stays within int64 for n_rich ≤ 9e9 " +
        "at the 1e9-cent cap)",
      Seq("CAST(bal_c AS HUGEINT) * np > sp",
        "round(c_acctbal * 100)")),
    "b4_tpch_q1" -> Headroom(
      "charge per row cents·(100−pct)·(100+tax) ≤ 1e7·100·210 ≈ 2e11; the " +
        "decimal38 accumulator holds 1e13 rows · 2e11 = 2e24 ≪ 1e38; the " +
        "three averages divide exact sums ≤ 2e24 by n ≥ group rows — each " +
        "truncating quotient ≤ per-row magnitude ·100 ≤ 2e13, int64-safe",
      Seq("(100 - CAST(round(l_discount * 100) AS BIGINT))",
        "(100 + CAST(round(l_tax * 100) AS BIGINT))",
        "// count(*) AS BIGINT) AS avg_qty_x100")),
    "g13_assortativity" -> Headroom(
      "degree moments: Σ(dx·dy) ≤ 2E·dmax² ≤ 1e13·(1e9)² = 1e31 in " +
        "decimal38; R² then rides a25's adaptive truncation (|rnum/tr| ≤ " +
        "1e16, den_t ≤ 1e18) so the square ·1e6 ≤ 1e38 and every quotient " +
        "is int64",
      Seq("length(CAST(abs(rnum) AS VARCHAR))",
        "(rnum // tr) * (rnum // tr) * 1000000")),
    "g14_clustering_coeff" -> Headroom(
      "n_tri ≤ deg²/2 ≤ 5e17 on a 1e9-degree mega-hub; n_tri·2·1e6 ≤ 1e24 " +
        "and deg·(deg−1) ≤ 1e18 both ride decimal38/HUGEINT (int64 wraps " +
        "2e6·n_tri at deg ≈ 3e6); the quotient is ≤ 1e6, int64-safe",
      Seq("AS HUGEINT) * 2 * 1000000",
        "// (CAST(deg AS HUGEINT) * (deg - 1))")),
    "t25_bigram_lift" -> Headroom(
      "lift·1e6 = c_ab·U²·1e6/(c_a·c_b·B) staged as two truncating " +
        "divisions: c_ab ≤ c_a bounds the first quotient c_ab·U·1e4 // " +
        "c_a by U·1e4 ≤ 1e17 (U ≤ 1e13 tokens), then ·U·100 ≤ 1e32 rides " +
        "HUGEINT/decimal38 over c_b·B ≤ 1e26 — final quotient ≤ 1e6·1e4, " +
        "int64-safe at a 1e13-token corpus",
      Seq("* u * 10000 // ca) * u * 100", "// (CAST(cb AS HUGEINT) * b)")),
    "w16_changepoint" -> Headroom(
      "prefix sums sl,st ≤ 1e13 rows · 1e7 cents = 1e20 in decimal38; the " +
        "cross-multiplied gap |sl·(n−idx) − (st−sl)·idx| ≤ st·n ≤ 1e20·3e7 " +
        "= 3e27 ≪ 1e38, and ·100 div idx·(n−idx) keeps the quotient at " +
        "mean-gap scale ≤ 1e9 cents — int64-safe",
      Seq("abs(CAST(sl AS HUGEINT) * (n - idx) - (st - sl) * idx)",
        "// (idx * (n - idx))")),
    "w17_bollinger_bands" -> Headroom(
      "windowed sums over 24 hourly bins: sw ≤ 24·(1e7·4e6) ≈ 1e15 cents " +
        "(bin sum = cents·rows-per-bin), sxx ≤ 24·(4e13)² ≈ 4e28 in " +
        "decimal38; the squared-inequality sides (x·n−sw)² ≤ (24·4e13)² ≈ " +
        "1e30 and 4·(n·sxx−sw²) ≤ 4e30 both ≪ 1e38 — no sqrt, no quotient " +
        "bigger than mean·100 ≤ 1e15",
      Seq("(CAST(x AS HUGEINT) * n - sw)", "> 4 * (n * sxx - sw * sw)"))
  )
}
