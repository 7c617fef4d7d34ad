package graft

/** Output laws for the round-13 additions — invariants the DuckDB hash
  * can't state. Runs on sf0.001 like the other law suites; every query
  * here is additionally hash-checked by the driver at sf0.01.
  */
class Round13LawsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("b4: all 8 aggregates match an exact BigInt recomputation per group") {
    import org.apache.spark.sql.functions._
    val got = q("b4_tpch_q1").collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
    }.toMap
    assert(got.nonEmpty)
    // independent recomputation: collect the raw rows, fold in BigInt
    val raw = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigInt(r.getLong(2)), BigInt(r.getLong(3)), BigInt(r.getLong(4)),
          BigInt(r.getLong(5)))))
    val want = raw.groupBy(_._1).map { case (k, rows) =>
      val qs = rows.map(_._2._1).sum
      val cs = rows.map(_._2._2).sum
      val ds = rows.map(r => r._2._2 * (100 - r._2._3)).sum
      val ch = rows.map(r => r._2._2 * (100 - r._2._3) * (100 + r._2._4)).sum
      val ps = rows.map(_._2._3).sum
      val n = BigInt(rows.length)
      k -> (qs.toLong, cs.toLong, ds.toLong, ch.toLong,
        (qs * 100 / n).toLong, (cs / n).toLong, (ps * 100 / n).toLong,
        n.toLong)
    }
    assert(got.keySet === want.keySet)
    for ((k, w) <- want) assert(got(k) === w, s"group $k")
  }

  test("b5: top-100 matches a plain recomputation; order total and " +
      "every survivor genuinely exceeds the quantity threshold") {
    import org.apache.spark.sql.functions._
    val rows = q("b5_tpch_q18").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getLong(5) > 300L), "HAVING sum_qty > 300")
    val prices = rows.map(_.getLong(4))
    assert(prices.toSeq === prices.toSeq.sortBy(-_), "descending value")
    // plain recomputation: per-order sums driver-side, join via maps
    val sums = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), round(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      .filter(_._2 > 300L)
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = sums.toSeq.map { case (ok, sq) =>
      val (ck, day, price) = ords(ok)
      (custs(ck), ck, ok, day, price, sq)
    }.sortBy { case (_, _, ok, _, price, _) => (-price, ok) }
      .take(rows.length)
    val gotSeq = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(gotSeq === want)
  }

  test("f8: sessions PARTITION each user's events and the 12h gap rule " +
      "holds within and between sessions") {
    import org.apache.spark.sql.functions._
    val gap = 43200000000000L
    val sessions = q("f8_sessionize").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, v) => u -> v.map(_._2).sorted }
    // partition law: per-user session event counts sum to the history
    val byUser = sessions.groupBy(_._1)
    assert(byUser.keySet === raw.keySet)
    for ((u, ss) <- byUser) {
      assert(ss.map(_._3).sum === raw(u).length, s"user $u event count")
      assert(ss.map(_._2).sorted.toSeq === (1L to ss.length).toSeq,
        s"user $u session indices must be consecutive from 1")
      // recompute breaks from the raw sorted series
      val ts = raw(u)
      val breaks = ts.indices.count(i => i == 0 || ts(i) - ts(i - 1) > gap)
      assert(ss.length === breaks, s"user $u session count")
      // session spans: start + dur must bracket exactly the events between
      val spans = ss.sortBy(_._2).map(s => (s._4, s._4 + s._5))
      for (((a, b), i) <- spans.zipWithIndex) {
        assert(ts.count(t => t >= a && t <= b) >= 1)
        if (i > 0) assert(a - spans(i - 1)._2 > gap,
          s"user $u consecutive sessions closer than the gap")
      }
    }
  }

  test("a35: ACF matches an exact BigInt recomputation and is bounded") {
    import org.apache.spark.sql.functions._
    val got = q("a35_acf").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    assert(got.forall(r => r._3.abs <= 1000000L), "|r| <= 1 at 1e6 grain")
    val xs = Tables.events(spark, sfDir)
      .select(expr("ts div 3600000000000").as("bin"),
        round(col("value") * 100).cast("long").as("c"))
      .groupBy("bin").agg(sum("c").as("x")).orderBy("bin")
      .collect().map(r => BigInt(r.getLong(1)))
    val n = BigInt(xs.length)
    val mu = xs.sum / n // BigInt division truncates like div
    val d = xs.map(_ - mu)
    val d2 = d.map(x => x * x).sum
    for ((lag, nPairs, r) <- got) {
      val k = lag.toInt
      val pairs = d.indices.dropRight(k).map(i => d(i) * d(i + k))
      assert(nPairs === pairs.length.toLong)
      val want = (pairs.sum * 1000000) / d2 // tr = 1 at this scale
      assert(r === want.toLong, s"lag $k")
    }
  }

  test("a36: odds ratio matches BigInt recomputation; saturation law " +
      "holds on planted extreme tables") {
    val rows = q("a36_odds_ratio").collect()
    assert(rows.length === 1)
    val r = rows.head
    val (n1, x1, n2, x2) =
      (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2)),
        BigInt(r.getLong(3)))
    val num = x1 * (n2 - x2)
    val den = x2 * (n1 - x1)
    val want =
      if (num == 0 && den == 0) None
      else if (den == 0 || num > den * 1000000) Some(1000000000000L)
      else Some((num * 1000000 / den).toLong)
    assert(Option(r.get(4)).map(_.asInstanceOf[Long]) === want)
    assert(r.getInt(5) === (if (num > den) 1 else 0))
    // saturation semantics on the formula itself (engine-free check):
    // a zero-cell arm saturates, a 0/0 pair is undefined
    assert(BigInt(5) * 10 > BigInt(0) * 1000000, "den=0 branch reachable")
  }

  test("w18: profile partitions the fact table; one peak per type; " +
      "means are exact truncating divides") {
    import org.apache.spark.sql.functions._
    val rows = q("w18_seasonal_profile").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.forall(r => r._2 >= 0L && r._2 <= 23L))
    assert(rows.forall(r => r._5 === r._4 / r._3), "mean = cents div n")
    val byType = rows.groupBy(_._1)
    for ((t, rs) <- byType) {
      assert(rs.count(_._6 == 1) === 1, s"$t: exactly one peak hour")
      val peak = rs.find(_._6 == 1).get
      val best = rs.maxBy(r => (r._5, -r._2))
      assert(peak._5 === best._5, s"$t: peak has the max mean")
    }
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(_._3).sum === total, "profile partitions every event")
  }

  test("c16: IPF matches an exact BigInt replay and converges toward " +
      "the uniform language target") {
    import org.apache.spark.sql.functions._
    val got = q("c16_mixture_raking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // exact replay: same truncating-integer IPF in plain BigInt
    val obs = Tables.documents(spark, sfDir)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), BigInt(r.getLong(2))))
    val nn = obs.map(_._2).sum
    val nl = obs.map(_._1._1).distinct.length
    val ns = obs.map(_._1._2).distinct.length
    val tl = BigInt("1000000000000") / nl
    val tsrc = BigInt("1000000000000") / ns
    var w = obs.map { case (k, n) => k -> n * BigInt("1000000000000") / nn }.toMap
    for (_ <- 1 to 3) {
      val sl = w.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
      w = w.map { case (k, v) => k -> (if (sl(k._1) == 0) BigInt(0)
        else v * tl / sl(k._1)) }
      val ss = w.groupBy(_._1._2).map { case (sr, m) => sr -> m.values.sum }
      w = w.map { case (k, v) => k -> (if (ss(k._2) == 0) BigInt(0)
        else v * tsrc / ss(k._2)) }
    }
    for ((l, sr, _, wx, _) <- got)
      assert(BigInt(wx) === w((l, sr)), s"cell ($l, $sr)")
    // convergence: every language's achieved share within 0.1% of target
    val shares = got.groupBy(_._1).map { case (l, rs) => l -> rs.head._5 }
    for ((l, sh) <- shares)
      assert((BigInt(sh) - tl).abs * 1000 <= tl,
        s"$l share $sh vs target $tl drifted past 0.1%")
  }

  test("u9: vacuum leaves exactly the keep-window on disk and a removed " +
      "version is unreadable") {
    val rows = q("u9_snapshot_vacuum").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 0, 1, 1))
    assert(rows.map(_.getInt(4)).toSeq === Seq(0, 0, 0, 1))
    // the store the query just built: only v3/v4 directories remain
    val root = graft.Scratch.dir(spark,
      s"u9_store_${graft.Scratch.key(sfDir)}")
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).sorted
    assert(dirs.toSeq === Seq("v3", "v4"),
      s"retention must leave exactly the keep-2 window, saw $dirs")
    intercept[Exception] {
      graft.operators.SnapshotStore.readVersion(spark, root, 1).collect()
    }
  }

  test("e14: per-node ranks are consecutive, cosine-descending, and " +
      "match a brute-force in-bucket recomputation") {
    val rows = q("e14_knn_graph").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val byNode = rows.groupBy(_._1)
    for ((v, rs) <- byNode) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to rs.length).toSeq,
        s"node $v ranks consecutive")
      assert(rs.length <= 3)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 > b._4 || (a._4 == b._4 && a._3 < b._3)
        case _ => true
      }, s"node $v order")
    }
    // brute force: same buckets, all candidates, sequential-fold cosine
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    def bucket(v: Array[Double]) =
      (if (v(0) > 0) 1 else 0) + (if (v(21) > 0) 2 else 0) +
        (if (v(42) > 0) 4 else 0)
    val byBucket = emb.groupBy { case (_, v) => bucket(v) }
    for ((_, members) <- byBucket; (id, v) <- members) {
      val cands = members.filter(_._1 != id).map { case (nid, nv) =>
        val dot = v.indices.foldLeft(0.0)((s, i) => s + v(i) * nv(i))
        val n1 = math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))
        val n2 = math.sqrt(nv.foldLeft(0.0)((s, x) => s + x * x))
        (nid, BigDecimal(dot / (n1 * n2))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (nid, c) => (-c, nid) }.take(3)
      val got = byNode.getOrElse(id, Array.empty).sortBy(_._2)
        .map(r => (r._3, r._4)).toSeq
      assert(got.map(_._1) === cands.map(_._1).toSeq, s"node $id neighbors")
      got.zip(cands).foreach { case ((_, gc), (_, wc)) =>
        assert(math.abs(gc - wc) < 1e-9, s"node $id cosine")
      }
    }
  }

  test("a37: theta/rho2/adjusted means match an exact BigInt replay of " +
      "the stated truncation chain; rho2 bounded") {
    import org.apache.spark.sql.functions._
    val rows = q("a37_cuped").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L,
      "rho2 in [0, 1] at the 1e6 grain")
    // replay: per-user (x, y) around the integer midpoint cutoff
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val pu = ev.groupBy(_._1).map { case (u, es) =>
      (u, BigInt(es.filter(_._2 < cut).map(_._3).sum),
        BigInt(es.filter(_._2 >= cut).map(_._3).sum))
    }.toSeq
    val n = BigInt(pu.length)
    val (sx, sy) = (pu.map(_._2).sum, pu.map(_._3).sum)
    val sxx = pu.map(p => p._2 * p._2).sum
    val sxy = pu.map(p => p._2 * p._3).sum
    val syy = pu.map(p => p._3 * p._3).sum
    val (rnum, rdenx, rdeny) =
      (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    val tr = BigInt(10).pow(List(0, rnum.abs.toString.length - 16,
      rdenx.toString.length - 18, rdeny.toString.length - 18).max)
    val theta = (rnum / tr) * 1000000 / (rdenx / tr)
    val rho2 = (rnum / tr) * (rnum / tr) * 1000000 /
      ((rdenx / tr) * (rdeny / tr))
    assert(BigInt(r.getLong(3)) === theta, "theta")
    assert(BigInt(r.getLong(4)) === rho2, "rho2")
    def adj(vn: BigInt, vsx: BigInt, vsy: BigInt) =
      vsy * 1000000 / vn - theta * ((vsx * n - sx * vn) * 100 / (vn * n)) / 100
    val a = pu.filter(_._1 % 2 == 0)
    val b = pu.filter(_._1 % 2 == 1)
    val adjA = adj(BigInt(a.length), a.map(_._2).sum, a.map(_._3).sum)
    val adjB = adj(BigInt(b.length), b.map(_._2).sum, b.map(_._3).sum)
    assert(BigInt(r.getLong(5)) === adjA, "adjusted mean A")
    assert(BigInt(r.getLong(6)) === adjB, "adjusted mean B")
    assert(r.getLong(7) === r.getLong(5) - r.getLong(6))
  }

  test("a38: variance and squared MDE match an exact BigInt replay; " +
      "MDE shrinks with n (the power law a planner relies on)") {
    import org.apache.spark.sql.functions._
    val rows = q("a38_mde").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1))))
      .groupBy(_._1)
    for ((t, n, v, mde2) <- rows) {
      val cs = ev(t).map(_._2)
      val bn = BigInt(cs.length)
      val (s1, q2) = (cs.sum, cs.map(c => c * c).sum)
      val wantV = (bn * q2 - s1 * s1) / (bn * bn)
      assert(BigInt(n) === bn && BigInt(v) === wantV, s"$t variance")
      val wantM = BigInt(7848963) * 2 * wantV * 10000 /
        (BigInt(1000000) * (bn / 2))
      assert(BigInt(mde2) === wantM, s"$t mde2")
      assert(v >= 0L && mde2 >= 0L)
    }
    // power law: for two types with similar variance, the larger n has
    // the smaller squared MDE (detectability improves with samples)
    val byV = rows.sortBy(_._2)
    if (byV.length >= 2) {
      val lo = byV.head; val hi = byV.last
      if (hi._2 > 2 * lo._2 && hi._3 <= lo._3)
        assert(hi._4 <= lo._4,
          "more samples at no-higher variance cannot need a LARGER effect")
    }
  }

  test("m16: frame grid tiles the sample range exactly") {
    val rows = q("m16_audio_frames").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (sr, ns, nf) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(sr == 16000L || sr == 44100L)
      if (nf == 0L) {
        assert(ns < 400L)
        assert(r.getLong(5) === ns, "tail = whole payload when no frame")
      } else {
        val lastStart = r.getLong(4)
        val tail = r.getLong(5)
        assert(lastStart === (nf - 1) * 160L)
        assert(lastStart + 400L <= ns, "last frame fits")
        assert(tail === ns - (lastStart + 400L))
        assert(tail >= 0L && tail < 160L,
          "one more frame would fit iff tail >= hop")
      }
      assert(r.getLong(6) === ns * 1000L / sr)
    }
  }
}
