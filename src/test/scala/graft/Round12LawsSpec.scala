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
