package graft

import org.apache.spark.sql.functions._

/** Output laws for the round-10 additions — invariants the DuckDB hash
  * can't state (it only proves cross-engine equality, not that the
  * numbers obey the operator's own algebra). Each oracled query here is
  * additionally hash-checked by the driver at sf0.01; these laws run on
  * sf0.001 like the rest of the law suites.
  */
class Round10LawsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("g9: authorities normalize to max exactly 1000, ordered, bounded") {
    val rows = q("g9_hits").collect()
    assert(rows.nonEmpty)
    val auth = rows.map(_.getLong(2))
    assert(auth.head === 1000L) // the max rescale pins the top score
    assert(auth.forall(a => a >= 0L && a <= 1000L))
    assert(auth.sameElements(auth.sortBy(-_)))
    assert(rows.map(_.getLong(3)).forall(_ >= 1L)) // every authority has buyers
  }

  test("a22: Gini is in [0, 1) scaled, and 0 only for degenerate groups") {
    val rows = q("a22_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getLong(4)
      assert(g >= 0L && g < 10000L)
      // n >= 2 real spenders never tie exactly on total cents here
      if (r.getLong(2) >= 2L) assert(g > 0L)
    }
  }

  test("a24: clip bounds ordered, counts bounded, winsorized sum inside [n*lo, n*hi]") {
    val rows = q("a24_winsorize").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (cl, ch, sw) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(lo <= hi)
      assert(cl >= 0L && ch >= 0L && cl + ch <= n)
      assert(sw >= n * lo && sw <= n * hi)
    }
  }

  test("a23: nine digits, counts conserve, shares sum to 10000 within floor loss") {
    val rows = q("a23_benford").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 9L))
    val nTotal = rows.head.getLong(2)
    assert(rows.map(_.getLong(1)).sum === nTotal)
    val pctSum = rows.map(_.getLong(3)).sum
    assert(pctSum <= 10000L && pctSum >= 10000L - 9L) // 9 floored divisions
  }

  test("g10: power-of-two buckets hold their degree ranges and shares") {
    val rows = q("g10_degree_histogram").collect()
    assert(rows.nonEmpty)
    val buckets = rows.map(_.getLong(0))
    assert(buckets.sameElements(buckets.sorted.distinct))
    rows.foreach { r =>
      val (b, mn, mx) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(mn >= (1L << b) && mx < (1L << (b + 1)))
      assert(mn <= mx)
    }
    assert(rows.map(_.getLong(5)).sum <= 10000L)
  }

  test("m13: dense ranks, non-increasing popularity, hits bounded by val users") {
    val rows = q("m13_popularity_baseline").collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to rows.length.toLong))
    val cnts = rows.map(_.getLong(2))
    assert(cnts.sameElements(cnts.sortBy(-_)))
    val nv = rows.head.getLong(4)
    assert(rows.map(_.getLong(3)).forall(h => h >= 0L && h <= nv))
  }

  test("o17: emitted positions are exactly the 7 mod 20 stride, increasing") {
    val pos = q("o17_systematic_sample").collect().map(_.getLong(3))
    assert(pos.nonEmpty)
    assert(pos.forall(_ % 20L === 7L))
    assert(pos.sameElements(pos.sorted))
    // an exact stride: consecutive emitted positions differ by exactly 20
    assert(pos.sliding(2).forall(w => w.length < 2 || w(1) - w(0) === 20L))
  }

  test("c13: per-source fills respect quota and never exceed source size") {
    val rows = q("c13_temperature_mix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rn, nDocs, alloc) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(rn >= 1L && rn <= alloc)
      assert(alloc <= nDocs)
    }
    // sqrt upweighting: allocation per doc must not DECREASE with source
    // size rank reversed — i.e. smaller sources get >= share per doc
    val bySrc = rows.groupBy(_.getString(0)).map { case (s, rs) =>
      (s, rs.head.getLong(3), rs.head.getLong(5))
    }.toSeq
    for {
      (_, n1, a1) <- bySrc; (_, n2, a2) <- bySrc
      if n1 < n2 && a1 > 0 && a2 > 0
    } assert(a1.toDouble / n1 >= a2.toDouble / n2 - 1e-9)
  }

  test("t23: hapax <= distinct <= tokens and scaled ratios bounded") {
    val rows = q("t23_lexical_diversity").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nt, nd, nh) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nh <= nd && nd <= nt)
      assert(r.getLong(4) <= 10000L && r.getLong(5) <= 10000L)
    }
  }

  test("w14: MAE non-negative and the winner flag is consistent with floored MAEs") {
    val rows = q("w14_backtest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, ms, flag) = (r.getLong(2), r.getLong(3), r.getInt(4))
      assert(mn >= 0L && ms >= 0L)
      // flag decides on raw sums; floored means can tie but never invert
      if (flag == 1) assert(ms <= mn)
      if (ms > mn) assert(flag === 0)
    }
  }

  test("g11: degree sums conserve 2m, coverage bounded, Q in (-1, 1) scaled") {
    val rows = q("g11_modularity").collect()
    assert(rows.nonEmpty)
    val m = rows.head.getLong(4)
    assert(rows.forall(_.getLong(4) === m))
    assert(rows.map(_.getLong(3)).sum === 2 * m) // sum d_c == 2m exactly
    assert(rows.map(_.getLong(2)).sum <= m)      // within-edges <= all edges
    rows.foreach { r =>
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000000L)
      assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L)
    }
    val qTotal = rows.map(_.getLong(7)).sum
    assert(qTotal > -1000000L && qTotal < 1000000L)
  }

  test("s12: valid + quarantined = total per source, plant rate near 1/13") {
    val rows = q("s12_csv_quarantine").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) === r.getLong(1))
      assert(r.getLong(4) > 0L) // valid rows carried their n_chars through
    }
    val total = rows.map(_.getLong(1)).sum
    val quar = rows.map(_.getLong(3)).sum
    // doc_id % 13 == 4 plants ~1/13 of rows; generous band for small sf
    assert(quar * 13 > total / 2 && quar * 13 < total * 2)
  }

  test("u6: the red batch never publishes, the green batch does") {
    val rows = q("u6_wap_audit").collect()
    assert(rows.length === 2)
    val bad = rows(0); val good = rows(1)
    assert(bad.getInt(4) === 0 && bad.getLong(5) === 1L) // v1 stays live
    assert(bad.getLong(2) > 0L)                          // nulls were the reason
    assert(good.getInt(4) === 1 && good.getLong(5) === 2L)
    assert(good.getLong(2) === 0L && good.getLong(3) === 0L)
  }

  test("e13: recall is monotone in nprobe and covers every query") {
    val rows = q("e13_probe_sweep").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    assert(rows.forall(_.getLong(1) === 8L)) // all queries always counted
    val recalls = rows.map(_.getLong(3))
    assert(recalls.sameElements(recalls.sorted), "recall not monotone in nprobe")
    assert(rows.forall(_.getInt(4) === 1))   // in-row monotone evidence agrees
    assert(recalls.forall(r => r >= 0L && r <= 10000L))
  }

  test("e12: l1 column equals the recomputed abs-sum of the 8 signatures") {
    val rows = q("e12_random_projection").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val l1 = (1 to 8).map(i => math.abs(r.getLong(i))).sum
      assert(r.getLong(9) === l1)
    }
    // the md5-parity sign matrix is roughly balanced (not constant)
    val signs = for (j <- 0 until 8; i <- 0 until 64) yield
      if (graft.expressions.Md5Hash32
        .hashBytes(s"rp:$j:$i".getBytes("UTF-8")) % 2 == 0) 1 else -1
    val pos = signs.count(_ == 1)
    assert(pos > 150 && pos < 360) // 512 coins, generous 6-sigma-ish band
  }
}
