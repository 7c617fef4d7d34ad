package graft

/** Output laws for the round-11 additions — invariants the DuckDB hash
  * can't state (the hash proves cross-engine equality, not that the
  * numbers obey the operator's own algebra). Runs on sf0.001 like the
  * other law suites; every oracled query here is additionally
  * hash-checked by the driver at sf0.01.
  */
class Round11LawsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("a25: r2 bounded and the decimal pipeline matches an exact BigInt recomputation") {
    val rows = q("a25_ols_trend").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L) // n
      val r2 = r.getLong(4)
      assert(r2 >= 0L && r2 <= 1000000L, s"r2_x1e6 out of [0,1e6]: $r2")
      // note: NO slope-sign law — the synthetic generator draws
      // extendedprice independently of quantity (corr ~ 0), so the sign
      // is sampling noise; correctness is the exactness check below
    }
    // independent implementation: exact BigInt arithmetic over the raw
    // rows (BigInt '/' truncates toward zero — the div semantics both
    // engines share), vs the query's DECIMAL(38,0) pipeline
    val s = spark
    import org.apache.spark.sql.functions._
    val raw = Tables.lineitem(s, sfDir)
      .join(Tables.supplier(s, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(s, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("l_quantity").cast("long"),
        round(col("l_extendedprice") * 100).cast("long"))
      .collect()
      .map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val want = raw.groupBy(_._1).map { case (name, xs) =>
      val n = BigInt(xs.length)
      val sx = xs.map(_._2).sum; val sy = xs.map(_._3).sum
      val sxx = xs.map(t => t._2 * t._2).sum
      val sxy = xs.map(t => t._2 * t._3).sum
      val syy = xs.map(t => t._3 * t._3).sum
      val den = n * sxx - sx * sx
      val num = n * sxy - sx * sy
      val deny = n * syy - sy * sy
      // r2 rides the ADAPTIVE shared-digit truncation (round 12): tr =
      // 10^max(0, digits(|num|)-16, digits(den)-18, digits(deny)-18)
      val tr = BigInt(10).pow(List(num.abs.toString.length - 16,
        den.toString.length - 18, deny.toString.length - 18, 0).max)
      name -> ((num * 1000000 / den,
        (sy * den - num * sx) * 100 / (n * den),
        (num / tr) * (num / tr) * 1000000 / ((den / tr) * (deny / tr))))
    }
    rows.foreach { r =>
      val (slope, icept, r2) = want(r.getString(0))
      assert(BigInt(r.getLong(2)) === slope, s"slope mismatch for ${r.getString(0)}")
      assert(BigInt(r.getLong(3)) === icept, s"intercept mismatch for ${r.getString(0)}")
      assert(BigInt(r.getLong(4)) === r2, s"r2 mismatch for ${r.getString(0)}")
    }
  }

  test("a26: counts conserve, chi2 is exactly the term sum, df matches the grid") {
    val rows = q("a26_chi_square").collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(2)).sum === nDocs) // sum of O over all cells
    val chi2 = rows.head.getLong(5)
    assert(rows.forall(_.getLong(5) == chi2))
    assert(rows.map(_.getLong(4)).sum === chi2) // chi2 = sum of terms, exactly
    val nl = rows.map(_.getString(0)).distinct.length
    val ns = rows.map(_.getString(1)).distinct.length
    assert(rows.length === nl * ns) // zero-observed cells present
    assert(rows.head.getLong(6) === (nl - 1).toLong * (ns - 1))
    rows.foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L) // e, term
    }
  }

  test("c14: hits bounded by grams, flag consistent with the 20 % threshold") {
    val rows = q("c14_ngram_contamination").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ng, nh, ov, fl) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(ng > 0L && nh >= 0L && nh <= ng)
      assert(ov === nh * 10000L / ng)
      assert(fl === (if (ov >= 2000L) 1 else 0))
    }
  }

  test("t24: cumulative curves monotone, vocab bounded by tokens, last checkpoint is the total") {
    val rows = q("t24_heaps_law").collect()
    assert(rows.length >= 2)
    val ranks = rows.map(_.getLong(0))
    assert(ranks.sameElements(ranks.sorted.distinct))
    val ct = rows.map(_.getLong(2))
    val cv = rows.map(_.getLong(3))
    assert(ct.sameElements(ct.sorted) && ct.distinct.length == ct.length,
      "cum_tokens must strictly increase (every doc has >= 3 tokens)")
    assert(cv.sameElements(cv.sorted), "cum_vocab must be non-decreasing")
    rows.foreach(r => assert(r.getLong(3) <= r.getLong(2)))
    // the final checkpoint is rank == n_docs, so its cums are the totals
    val s = spark
    import org.apache.spark.sql.functions._
    val docs = Tables.tokenizedDocs(s, sfDir)
    val totTokens = docs.select(sum(size(col("w")).cast("long")))
      .head.getLong(0)
    val totVocab = docs
      .select(explode(col("w")).as("t")).distinct().count()
    assert(ct.last === totTokens)
    assert(cv.last === totVocab)
  }

  test("g12: canonical non-edges, floor respected, score order total and consistent") {
    val rows = q("g12_common_neighbors").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // a < b canonical
      assert(r.getLong(2) >= 2L) // the >= 2 common-neighbor floor
      assert(r.getLong(5) === r.getLong(3) * r.getLong(4)) // pa = deg_a*deg_b
      assert(r.getLong(2) <= math.min(r.getLong(3), r.getLong(4)),
        "common neighbors can't exceed either degree")
    }
    val keys = rows.map(r =>
      (-r.getLong(2), -r.getLong(5), r.getLong(0), r.getLong(1))).toSeq
    assert(keys == keys.sorted, "output must follow the declared score order")
  }

  test("w15: single-event users carry zero trend/seasonality; identities hold") {
    val rows = q("w15_holt_winters").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) >= 1)
      if (r.getInt(1) == 1) {
        assert(r.getDouble(3) === 0.0, "one event: trend must be the seed 0")
        assert(r.getDouble(4) === 0.0, "one event: seasonal slots still 0")
        assert(r.getDouble(5) === r.getDouble(2), "forecast = level")
      }
    }
  }

  test("a27: rho and mean_d2 match an independent BigInt rank recomputation") {
    val rows = q("a27_rank_correlation").collect()
    assert(rows.length === 1)
    val (n, meanD2, rho) =
      (rows.head.getLong(0), rows.head.getLong(1), rows.head.getLong(2))
    assert(n > 0L && meanD2 >= 0L)
    assert(rho >= -1000000L && rho <= 1000000L)
    // independent path: collect the per-part metrics, rank in plain Scala
    // under the same total orders, and replay the closed form in BigInt
    val s = spark
    import org.apache.spark.sql.functions._
    val m = Tables.lineitem(s, sfDir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"),
        sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.length.toLong === n)
    def ranks(key: ((Long, Long, Long)) => (Long, Long)): Map[Long, Long] =
      m.sortBy { t => val (v, k) = key(t); (-v, k) }
        .zipWithIndex.map { case (t, i) => t._1 -> (i + 1L) }.toMap
    val rq = ranks(t => (t._2, t._1))
    val rr = ranks(t => (t._3, t._1))
    val sd2 = m.map { t =>
      val d = BigInt(rq(t._1) - rr(t._1)); d * d }.sum
    val bn = BigInt(n)
    assert(BigInt(meanD2) === sd2 / bn)
    assert(BigInt(rho) ===
      BigInt(1000000) - BigInt(6) * sd2 * 1000000 / (bn * bn * bn - bn))
  }

  test("g13: symmetrized point count even, sign in range, r2 bounded") {
    val rows = q("g13_assortativity").collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) > 0L && r.getLong(0) % 2 === 0L,
      "symmetrized edge points must come in pairs")
    assert(Set(-1, 0, 1).contains(r.getInt(1)))
    val r2 = r.getLong(2)
    assert(r2 >= 0L && r2 <= 1000000L)
  }

  test("a28: KS statistic bounded, decision matches the BigInt threshold form") {
    val rows = q("a28_ks_test").collect()
    assert(rows.length === 1)
    val r = rows.head
    val (na, nb, dn, ks, rej) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4))
    assert(na > 0L && nb > 0L)
    assert(dn >= 0L && dn <= na * nb, "D numerator bounded by n_a*n_b")
    assert(ks >= 0L && ks <= 10000L)
    assert(ks === dn * 10000L / (na * nb))
    // round-12 overflow-safe decision: divided through by (n_a*n_b)^2
    // BEFORE squaring, truncating to the 1e-6 lattice on both sides
    // (BigInt '/' truncates toward zero — the shared div semantics)
    val nm = BigInt(na) * nb
    val qq = BigInt(dn) * 1000000 / nm
    val rhs = BigInt(1844164) * (na + nb) * 1000000 / nm
    assert(rej === (if (qq * qq > rhs) 1 else 0))
  }

  test("d14: agreement bounded by the signature, scaled values consistent") {
    val rows = q("d14_minhash_calibration").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getLong(2)
      assert(m >= 0L && m <= 16L)
      assert(r.getLong(3) === m * 1000L / 16L)
      assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000L)
      assert(r.getLong(5) === math.abs(r.getLong(3) - r.getLong(4)))
    }
  }

  test("u7: the restored version carries the rolled-back-to content, live flag on the head") {
    val rows = q("u7_snapshot_rollback").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // restore = v1's content re-committed: identical count AND digest
    assert(rows(2).getLong(1) === rows(0).getLong(1))
    assert(rows(2).getString(2) === rows(0).getString(2))
    // the "bad" v2 differs and stays in history
    assert(rows(1).getString(2) !== rows(0).getString(2))
    assert(rows.map(_.getInt(3)).toSeq === Seq(0, 0, 1))
  }

  test("m3: resized dims fit the box, aspect clamp never upsizes") {
    val rows = q("m3_media_resize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (iw, ih, ow, oh, fit) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5))
      assert(ow >= 1L && oh >= 1L)
      assert(ow <= iw && oh <= ih, "resize must never upscale")
      if (fit == 0) assert(ow <= 256L && oh <= 256L,
        "a resized record must fit the 256x256 box")
      else assert(iw <= 256L && ih <= 256L,
        "already_fit means the input was inside the box")
    }
  }

  test("b2: one row per in-region nation, revenue-ordered, all-positive") {
    val rows = q("b2_tpch_q5").collect()
    assert(rows.nonEmpty && rows.length <= 25)
    val revs = rows.map(_.getLong(1))
    assert(revs.forall(_ > 0L))
    assert(revs.sameElements(revs.sortBy(-_)), "Q5 orders by revenue desc")
    assert(rows.map(_.getLong(2)).forall(_ > 0L))
  }

  test("f6: stationary mass conserves to the leak bound, pi non-negative") {
    val rows = q("f6_markov_stationary").collect()
    assert(rows.nonEmpty)
    val mass = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) == mass))
    // uniform seed loses <= (n_states - 1) at t=0; each of 8 rounds leaks
    // < n_states from per-edge floor division
    val n = rows.length.toLong
    assert(mass <= 1000000L && mass >= 1000000L - (n - 1) - 8L * n * n,
      s"mass_x1e6 $mass outside the floor-leak bound")
    rows.foreach { r =>
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L)
      assert(r.getLong(1) <= 1000000L)
    }
  }

  test("m14: positives conserve across thresholds, recall monotone non-increasing") {
    val rows = q("m14_pr_curve").collect()
    assert(rows.length === 6)
    val pos = rows.head.getLong(1) + rows.head.getLong(3) // tp + fn
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) === pos)
      assert(r.getLong(1) >= 0L && r.getLong(2) >= 0L && r.getLong(3) >= 0L)
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 10000L)
    }
    assert(rows.head.getLong(5) === 10000L, "t=0 predicts everything: recall 1")
    val tps = rows.map(_.getLong(1))
    assert(tps.sameElements(tps.sortBy(-_)), "tp non-increasing in threshold")
    val recalls = rows.map(_.getLong(5))
    assert(recalls.sameElements(recalls.sortBy(-_)))
  }
}
