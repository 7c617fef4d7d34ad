package graft

import graft.operators.{MgBuf, MisraGriesAgg}

/** Misra-Gries laws, exercised on the pure reduce/merge/finish functions
  * with CONTROLLED merge trees (the aggregator's estimates are
  * stream-order dependent by construction, so laws are stated against a
  * fixed order — the same contract the t17 query pins with its
  * shard + sort canonicalization):
  *  - undercount-only, and by at most n/(k+1) (the classic bound);
  *  - every item with true frequency > n/(k+1) survives;
  *  - the bound still holds after merging independently-sketched halves
  *    (mergeable-summaries: errors add to n_total/(k+1));
  *  - the registered t17 rows all carry ok=1 and zero missed heavies.
  */
class MisraGriesSpec extends SparkSpec {

  private val k = 8
  private val agg = new MisraGriesAgg(k)

  // zipf-ish planted stream: term_i appears ~ 4000/i times, shuffled
  // deterministically
  private val stream: Seq[String] = {
    val raw = (1 to 40).flatMap(i => Seq.fill(4000 / i)(s"term$i"))
    new scala.util.Random(42L).shuffle(raw)
  }
  private val exact: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def run(xs: Seq[String]): MgBuf = xs.foldLeft(agg.zero)(agg.reduce)

  private def check(estimates: Map[String, Long], n: Long): Unit = {
    val bound = n / (k + 1)
    estimates.foreach { case (t, est) =>
      assert(est <= exact(t), s"$t overcounted: est=$est exact=${exact(t)}")
      assert(exact(t) - est <= bound,
        s"$t outside bound: est=$est exact=${exact(t)} bound=$bound")
    }
    val heavies = exact.filter(_._2 > bound).keySet
    val missed = heavies -- estimates.keySet
    assert(missed.isEmpty, s"heavy hitters missed: $missed (bound=$bound)")
  }

  test("single-stream sketch: undercount-only within n/(k+1), heavies survive") {
    val buf = run(stream)
    assert(buf.keys.size <= k)
    check(agg.finish(buf).map(i => i.term -> i.est).toMap, stream.size.toLong)
  }

  test("merged halves keep the bound (mergeable-summaries law)") {
    val (l, r) = stream.splitAt(stream.size / 2)
    val merged = agg.merge(run(l), run(r))
    assert(merged.keys.size <= k)
    assert(merged.n == stream.size.toLong)
    check(agg.finish(merged).map(i => i.term -> i.est).toMap,
      stream.size.toLong)
  }

  test("merge is commutative and zero is its identity") {
    val (l, r) = stream.splitAt(stream.size / 3)
    val ab = agg.finish(agg.merge(run(l), run(r)))
    val ba = agg.finish(agg.merge(run(r), run(l)))
    assert(ab.toSet == ba.toSet, "merge not commutative")
    val z = agg.finish(agg.merge(run(l), agg.zero))
    assert(z.toSet == agg.finish(run(l)).toSet, "zero not identity")
  }

  test("t17 output is partition-count invariant (canonical order, not luck)") {
    // the query's shard + sortWithinPartitions canonicalization puts each
    // (source, shard) group wholly inside one partition in one sorted
    // order, so the MG fold sees the identical sequence no matter how
    // many shuffle partitions the session runs — the property that makes
    // an order-dependent sketch safe to register
    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    def runWith(n: String) =
      try {
        spark.conf.set(key, n)
        SparkEntry.queries("t17_heavy_hitters")(spark, sfDir).collect().toSeq
      } finally spark.conf.set(key, old)
    val a = runWith("3"); val b = runWith("7")
    assert(a == b, "t17 changed output under a different partition count")
  }

  test("t17's self-evidencing columns hold at sf0.001") {
    val out = SparkEntry.queries("t17_heavy_hitters")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("ok") == 1, s"row outside MG bound: $r")
      assert(r.getAs[Long]("n_missed_heavy") == 0L,
        s"guaranteed heavy hitter missing from sketch: $r")
    }
  }
}
