package graft

/** Output laws for the round-12 additions — invariants the DuckDB hash
  * can't state (the hash proves cross-engine equality, not that the
  * numbers obey the operator's own algebra). Runs on sf0.001 like the
  * other law suites; every query here is additionally hash-checked by
  * the driver at sf0.01.
  */
class Round12LawsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("a29: U matches an independent midrank recomputation; AUC and decision exact") {
    val rows = q("a29_mann_whitney").collect()
    assert(rows.length === 1)
    val r = rows.head
    val (na, nb, u2, auc, rej) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
    assert(na > 0L && nb > 0L)
    assert(u2 >= 0L && u2 <= 2L * na * nb, "2U bounded by 2*n_a*n_b")
    assert(auc >= 0L && auc <= 1000000L)
    // independent recomputation: collect the raw cents, assign doubled
    // midranks by explicit sort, sum over cohort A
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(round(col("value") * 100).cast("long"),
        (col("event_type") === "click").cast("long"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1) == 1L))
    val sorted = raw.sortBy(_._1)
    // doubled midrank per distinct value: 2*(count below) + ties + 1
    val byVal = sorted.groupBy(_._1).map { case (c, xs) =>
      (c, xs.length.toLong, xs.count(_._2).toLong)
    }.toSeq.sortBy(_._1)
    var below = 0L
    var r2a = BigInt(0)
    byVal.foreach { case (_, m, ca) =>
      r2a += BigInt(ca) * (2 * below + m + 1)
      below += m
    }
    val wantNa = BigInt(raw.count(_._2))
    val wantU2 = r2a - wantNa * (wantNa + 1)
    assert(BigInt(na) === wantNa)
    assert(BigInt(u2) === wantU2, "2U mismatch vs explicit midrank sum")
    val nm = BigInt(na) * nb
    assert(BigInt(auc) === BigInt(u2) * 1000000 / (2 * nm))
    val qq = (wantU2 - nm).abs * 1000000 / nm
    val rhs = BigInt(38416) * (na + nb + 1) * BigInt("1000000000000") / nm
    assert(rej === (if (3 * qq * qq * 10000 > rhs) 1 else 0))
  }

  test("a30: quartiles are the discrete order statistics; fences classify exactly") {
    val rows = q("a30_tukey_fences").collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r0 => (r0.getString(0), r0.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sorted) }
    rows.foreach { r =>
      val (t, n, q1, q3, lo, hi) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val xs = raw(t)
      assert(n === xs.length.toLong)
      // q1 = min c with 4*cum >= n  <=>  element at 0-based index
      // ceil(n/4) - 1; q3 at ceil(3n/4) - 1
      assert(q1 === xs(((xs.length + 3) / 4) - 1), s"$t q1")
      assert(q3 === xs(((3 * xs.length + 3) / 4) - 1), s"$t q3")
      assert(q1 <= q3)
      val lo2 = 2 * q1 - 3 * (q3 - q1)
      val hi2 = 2 * q3 + 3 * (q3 - q1)
      assert(lo === xs.count(c => 2 * c < lo2).toLong, s"$t n_low")
      assert(hi === xs.count(c => 2 * c > hi2).toLong, s"$t n_high")
      assert(lo + hi <= n)
    }
  }

  test("t25: lift exact vs BigInt recomputation, ordered descending, floor respected") {
    val rows = q("t25_bigram_lift").collect()
    assert(rows.length === 20)
    // independent counts from the raw corpus
    val texts = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.lower(
        org.apache.spark.sql.functions.col("text")))
      .collect().map(_.getString(0).split(" ", -1).toSeq)
    val uni = texts.flatten.groupBy(identity).map { case (w, xs) =>
      (w, BigInt(xs.length)) }
    val u = uni.values.sum
    val b = texts.map(t => BigInt(math.max(t.length - 1, 0))).sum
    val big = texts.flatMap(t => t.sliding(2).filter(_.length == 2)
      .map(_.mkString(" "))).groupBy(identity)
      .map { case (g, xs) => (g, BigInt(xs.length)) }
    val lifts = rows.map { r =>
      val (bg, np, nf, ns, lift) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np >= 5L, "min-count floor")
      assert(np <= math.min(nf, ns), "pair count bounded by word counts")
      val Array(w1, w2) = bg.split(" ")
      assert(BigInt(np) === big(bg) && BigInt(nf) === uni(w1)
        && BigInt(ns) === uni(w2))
      val want = (BigInt(np) * u * 10000 / nf) * u * 100 / (BigInt(ns) * b)
      assert(BigInt(lift) === want, s"lift mismatch for '$bg'")
      lift
    }
    assert(lifts.toSeq === lifts.toSeq.sortBy(-_), "descending lift order")
  }

  test("sk2: salted distinct equals the plain count(DISTINCT) exactly") {
    val got = q("sk2_skew_salted_agg").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    import org.apache.spark.sql.functions._
    val want = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("f7: LTV cumulative is the running sum, revenue conserves, buyers bounded") {
    val rows = q("f7_cohort_ltv").collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val totalCents = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .agg(sum(round(col("value") * 100).cast("long")))
      .collect().head.getLong(0)
    assert(rows.map(_.getLong(3)).sum === totalCents,
      "every purchase cent lands in exactly one (cohort, age) cell")
    rows.groupBy(_.getLong(0)).foreach { case (_, cells) =>
      val sortedCells = cells.sortBy(_.getLong(1))
      var running = 0L
      sortedCells.foreach { c =>
        running += c.getLong(3)
        assert(c.getLong(4) === running, "cum_rev is the exact running sum")
        assert(c.getLong(2) > 0L, "a cell with revenue has buyers")
      }
    }
  }

  test("m15: patches tile each resized image exactly, edge clips consistent") {
    val patches = q("m15_patch_grid").collect()
      .groupBy(_.getLong(0))
    val dims = q("m3_media_resize").collect()
      .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
    assert(patches.keySet === dims.keySet)
    patches.foreach { case (id, ps) =>
      val (w, h) = dims(id)
      val nx = (w + 63) / 64; val ny = (h + 63) / 64
      assert(ps.length.toLong === nx * ny, s"media $id patch count")
      // areas tile the image exactly — no gap, no overlap
      assert(ps.map(p => p.getLong(5) * p.getLong(6)).sum === w * h,
        s"media $id patch areas must sum to the image area")
      ps.foreach { p =>
        val (px, py, x0, y0, pw, ph) = (p.getLong(1), p.getLong(2),
          p.getLong(3), p.getLong(4), p.getLong(5), p.getLong(6))
        assert(x0 === px * 64 && y0 === py * 64)
        assert(pw >= 1L && pw <= 64L && ph >= 1L && ph <= 64L)
        assert(x0 + pw <= w && y0 + ph <= h)
        assert((pw == 64L) == (x0 + 64 <= w), s"media $id clip rule (w)")
        assert((ph == 64L) == (y0 + 64 <= h), s"media $id clip rule (h)")
      }
    }
  }

  test("a31: V² consistent with a26's chi2, bounded, df/k from the grid") {
    val v = q("a31_cramers_v").collect()
    assert(v.length === 1)
    val r = v.head
    val (nDocs, chi2, df, kMin, v2) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val a26 = q("a26_chi_square").collect()
    assert(chi2 === a26.head.getLong(5), "chi2 must equal a26's total")
    assert(df === a26.head.getLong(6))
    assert(nDocs === a26.map(_.getLong(2)).sum)
    val nl = a26.map(_.getString(0)).distinct.length.toLong
    val ns = a26.map(_.getString(1)).distinct.length.toLong
    assert(kMin === math.min(nl, ns))
    assert(v2 === chi2 / (nDocs * (kMin - 1)))
    assert(v2 >= 0L && v2 <= 1000000L)
  }

  test("t26: hapax <= vocab <= tokens; ratio exact; totals match the corpus") {
    val rows = q("t26_hapax_ratio").collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val totalTokens = Tables.documents(spark, sfDir)
      .select(size(split(lower(col("text")), " ")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(rows.map(_.getLong(1)).sum === totalTokens)
    rows.foreach { r =>
      val (tok, vocab, hapax, ratio) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(hapax <= vocab && vocab <= tok)
      assert(ratio === hapax * 1000000L / vocab)
    }
  }

  test("w16: split maximizes the gap over an exhaustive BigInt recomputation") {
    val rows = q("w16_changepoint").collect()
    assert(rows.length === 1)
    val r = rows.head
    import org.apache.spark.sql.functions._
    val bins = Tables.events(spark, sfDir)
      .select(expr("ts div 3600000000000").as("bin"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("bin").agg(sum(col("c")).as("sb"))
      .collect().map(b => (b.getLong(0), BigInt(b.getLong(1))))
      .sortBy(_._1)
    val n = bins.length
    val st = bins.map(_._2).sum
    var best: (BigInt, Int) = (BigInt(-1), -1)
    var sl = BigInt(0)
    bins.zipWithIndex.dropRight(1).foreach { case ((_, sb), i) =>
      sl += sb
      val s = i + 1
      val gap = (sl * (n - s) - (st - sl) * s).abs * 100 / (BigInt(s) * (n - s))
      if (gap > best._1) best = (gap, s)
    }
    assert(r.getLong(1) === best._2.toLong, "argmax split index")
    assert(r.getLong(2) === n.toLong)
    assert(r.getLong(0) === bins(best._2 - 1)._1, "split bin id")
    assert(BigInt(r.getLong(5)) === best._1, "gap value")
    val s = best._2
    assert(BigInt(r.getLong(3)) ===
      bins.take(s).map(_._2).sum * 100 / s)
    assert(BigInt(r.getLong(4)) ===
      bins.drop(s).map(_._2).sum * 100 / (n - s))
  }

  test("g14: LCC exact vs brute-force neighborhood check on the top hubs") {
    val rows = q("g14_clustering_coeff").collect()
    assert(rows.length === 100)
    // brute-force adjacency from the same co-occurrence definition
    import org.apache.spark.sql.functions._
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = pairs.as("x").join(pairs.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey")
          && col("x.l_partkey") < col("y.l_partkey"))
      .groupBy(col("x.l_partkey").as("u"), col("y.l_partkey").as("v"))
      .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
      .select("u", "v").collect().map(e => (e.getLong(0), e.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (u, v) =>
      adj(u) = adj(u) + v; adj(v) = adj(v) + u
    }
    val degs = rows.map(_.getLong(1))
    assert(degs.toSeq === degs.toSeq.sortBy(-_), "descending degree order")
    rows.foreach { r =>
      val (node, deg, tri, lcc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val nbrs = adj(node)
      assert(deg === nbrs.size.toLong, s"node $node degree")
      val wantTri = nbrs.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
      assert(tri === wantTri.toLong, s"node $node triangles")
      assert(lcc === tri * 2L * 1000000L / (deg * (deg - 1)))
      assert(lcc >= 0L && lcc <= 1000000L)
    }
  }

  test("c15: phases partition the corpus into length-ordered quarters") {
    val rows = q("c15_curriculum_phases").collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum === nDocs)
    assert(rows.map(_.getLong(0)).toSeq === (0L until rows.length).toSeq)
    // quarter sizes differ by at most 1; char ranges non-overlapping in
    // phase order (equal n_chars may straddle a boundary only via the
    // doc_id tie-break, so ranges are monotone, not strictly disjoint)
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1L)
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getLong(3) <= hi.getLong(2),
          "max_chars of an earlier phase cannot exceed min_chars of a later")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(4) >= r.getLong(1) * r.getLong(2)
        && r.getLong(4) <= r.getLong(1) * r.getLong(3))
    }
  }

  test("b3: top-10 matches a plain recomputation; revenue order total") {
    val rows = q("b3_tpch_q3").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getLong(3))
    assert(revs.toSeq === revs.toSeq.sortBy(-_), "descending revenue")
    assert(revs.forall(_ > 0L))
    import org.apache.spark.sql.functions._
    val want = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1998-06-01"))
      .join(Tables.orders(spark, sfDir)
        .filter(col("o_orderdate") < lit("1998-06-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
        .filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(sum((round(col("l_extendedprice") * 100).cast("long")
        * (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .cast("decimal(38,0)")).cast("long").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (k, rev) => (-rev, k) }.take(rows.length)
    assert(rows.map(r => (r.getLong(0), r.getLong(3))).toSeq === want.toSeq)
  }

  test("j18: bloom-filtered join result identical to the plain join") {
    val got = q("j18_bloom_filtered_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    import org.apache.spark.sql.functions._
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir).filter(col("p_size") < 10),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("sq"))
      .orderBy("p_brand")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq,
      "bloom prefilter must not change the join result (no false negatives)")
  }

  test("a32: counts and decision match an exact BigInt recomputation") {
    val rows = q("a32_two_proportion").collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n1, x1, n2, x2) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    import org.apache.spark.sql.functions._
    val want = Tables.events(spark, sfDir)
      .select((col("user_id") % 2).as("v"), col("user_id"),
        (col("event_type") === "purchase").cast("long").as("p"))
      .groupBy("v", "user_id").agg(max(col("p")).as("pu"))
      .groupBy("v").agg(count(lit(1)).as("n"), sum(col("pu")).as("x"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2)))
      .sortBy(_._1)
    assert((n1, x1) === ((want(0)._2, want(0)._3)))
    assert((n2, x2) === ((want(1)._2, want(1)._3)))
    assert(r.getLong(4) === x1 * 1000000L / n1)
    assert(r.getLong(5) === x2 * 1000000L / n2)
    val d = (BigInt(x1) * n2 - BigInt(x2) * n1).abs
    val qd = d * 1000000 / (BigInt(n1) * n2)
    val rhs = BigInt(38416) * (x1 + x2) * (n1 + n2 - x1 - x2) *
      BigInt("1000000000000") / (BigInt(n1) * n2 * (n1 + n2))
    assert(r.getInt(6) === (if (qd * qd * 10000 > rhs) 1 else 0))
  }

  test("t27: boundaries match a JVM md5 recomputation; chunk algebra exact") {
    val rows = q("t27_cdc_chunking").collect()
    assert(rows.nonEmpty)
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val texts = Tables.tokenizedDocs(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ", -1).toSeq)).toMap
    rows.foreach { r =>
      val (id, n, nc, avg, first, last) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val w = texts(id)
      assert(n === w.length.toLong)
      val bs = (3 to w.length).filter(p =>
        h32(w.slice(p - 3, p).mkString(" ")) % 64 == 0)
      assert(nc === bs.length + 1L, s"doc $id chunk count")
      assert(avg === n * 1000 / (bs.length + 1))
      assert(first === bs.headOption.map(_.toLong).getOrElse(n))
      assert(last === n - bs.lastOption.map(_.toLong).getOrElse(0L))
    }
  }

  test("d15: duplicate-chunk groups match a JVM md5 recomputation") {
    val rows = q("d15_chunk_dedup").collect()
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val occs = Tables.tokenizedDocs(spark, sfDir)
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val id = r.getLong(0)
        val w = r.getString(1).toLowerCase.split(" ", -1).toSeq
        val bs = (3 until w.length).filter(p =>
          h32(w.slice(p - 3, p).mkString(" ")) % 64 == 0)
        val starts = 1 +: bs.map(_ + 1)
        val ends = bs :+ w.length
        starts.zip(ends).map { case (s0, e0) =>
          (id, h32(w.slice(s0 - 1, e0).mkString(" ")))
        }
      }
    val want = occs.groupBy(_._2)
      .map { case (h, xs) =>
        (h, xs.map(_._1).distinct.length.toLong, xs.length.toLong,
          xs.map(_._1).min, xs.map(_._1).max)
      }
      .filter(_._2 >= 2L).toSeq
      .sortBy { case (h, _, nOcc, _, _) => (-nOcc, h) }
      .take(20)
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4)))
    assert(got.toSeq === want,
      "cross-doc duplicate chunk groups must match the JVM recomputation")
  }

  test("w17: bands match an explicit trailing-window BigInt recomputation") {
    val rows = q("w17_bollinger_bands").collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val series = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("ts div 3600000000000").as("bin"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type", "bin").agg(sum(col("c")).as("x"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    val byType = series.keys.groupBy(_._1)
      .map { case (t, ks) => (t, ks.map(_._2).toSeq.sorted) }
    rows.foreach { r =>
      val (t, bin, x, nWin) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val bins = byType(t)
      val idx = bins.indexOf(bin)
      val windowBins = bins.slice(math.max(0, idx - 23), idx + 1)
      assert(nWin === windowBins.length.toLong, s"$t/$bin window size")
      val xs = windowBins.map(b => BigInt(series((t, b))))
      assert(BigInt(x) === xs.last)
      val n = BigInt(xs.length); val sw = xs.sum
      assert(BigInt(r.getLong(4)) === sw * 100 / n, s"$t/$bin mean")
      assert(BigInt(r.getLong(5)) === (BigInt(x) * n - sw) * 100 / n)
      if (nWin == 24L) {
        val sxx = xs.map(v => v * v).sum
        val want = if ((BigInt(x) * n - sw).pow(2) > 4 * (n * sxx - sw * sw))
          1 else 0
        assert(r.getInt(6) === want, s"$t/$bin flag")
      } else assert(r.isNullAt(6), s"$t/$bin warm-up row must be NULL")
    }
  }

  test("a33: median/MAD are the exact order statistics; outlier mass exact") {
    val rows = q("a33_mad_outliers").collect()
    assert(rows.nonEmpty)
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r0 => (r0.getString(0), r0.getLong(1)))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sorted) }
    rows.foreach { r =>
      val (t, n, med, mad, nOut) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      val xs = raw(t)
      assert(n === xs.length.toLong)
      // min value with 2*cum >= n == 0-based index ceil(n/2) - 1
      assert(med === xs(((xs.length + 1) / 2) - 1), s"$t median")
      val ds = xs.map(v => math.abs(v - med)).sorted
      assert(mad === ds(((ds.length + 1) / 2) - 1), s"$t MAD")
      assert(nOut === xs.count(v => math.abs(v - med) > 3 * mad).toLong)
      assert(nOut <= n / 2, "MAD's breakdown bound")
    }
  }

  test("a34: runs/median/decision match an explicit sequence recomputation") {
    val rows = q("a34_runs_test").collect()
    assert(rows.length === 1)
    val r = rows.head
    import org.apache.spark.sql.functions._
    val series = Tables.events(spark, sfDir)
      .select(expr("ts div 3600000000000").as("bin"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("bin").agg(sum(col("c")).as("x"))
      .collect().map(b => (b.getLong(0), b.getLong(1))).sortBy(_._1)
    val xs = series.map(_._2).sorted
    val med = xs(((xs.length + 1) / 2) - 1)
    val kept = series.filter(_._2 != med).map(_._2 > med)
    val n1 = kept.count(identity).toLong
    val n2 = kept.count(!_).toLong
    val runs = if (kept.isEmpty) 1L
      else 1L + kept.sliding(2).count(p => p.length == 2 && p(0) != p(1))
    assert(r.getLong(0) === n1 && r.getLong(1) === n2)
    assert(r.getLong(2) === n1 + n2)
    assert(r.getLong(3) === runs, "runs count")
    val nn = BigInt(n1 + n2); val m = BigInt(n1) * n2
    assert(BigInt(r.getLong(4)) === (2 * m * 100 + nn * 100) / nn)
    val qd = (nn * (runs - 1) - 2 * m).abs * 1000000 / (2 * m)
    val rhs = BigInt(38416) * (2 * m - nn) * BigInt("1000000000000") / (2 * m)
    assert(r.getInt(5) === (if (qd * qd * (nn - 1) * 10000 > rhs) 1 else 0))
  }

  test("u8: survivors match a window recomputation; deleted keys absent") {
    val got = q("u8_cdc_apply").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap
    import org.apache.spark.sql.functions._
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long"))
      .collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2),
        r0.getString(3), r0.getLong(4)))
      .groupBy(_._1)
    raw.foreach { case (uid, evs) =>
      val last = evs.maxBy(e => (e._2, e._3))
      val op = last._4 match {
        case "view" => "I"; case "purchase" => "D"; case _ => "U"
      }
      if (op == "D") assert(!got.contains(uid), s"user $uid tombstoned")
      else {
        val (nOps, lastOp, cents) = got(uid)
        assert(nOps === evs.length.toLong)
        assert(lastOp === op && cents === last._5, s"user $uid payload")
      }
    }
    assert(got.keySet.subsetOf(raw.keySet))
  }
}
