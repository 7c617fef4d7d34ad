package graft

/** Suite-pass A/B for a SHARED cut's net effect (VERDICT r17 #5: the
  * lshBandFrame cut landed plan-proven but never bench-measured). Unlike
  * CensusCrossoverExperiment — which resets the cut memo per query and so
  * measures each consumer ALONE paying the full write — this times a
  * consumer SET the way Bench does: one pass in sorted order with the
  * session memo intact (first consumer pays the write, the rest read),
  * against the same pass with `cutMaterialize=false` (every consumer
  * re-derives). The delta is the cut's real per-suite-run value.
  *
  * Run: sbt "Test/runMain graft.CutShareExperiment [runs] [q1,q2,...]"
  * (defaults: runs=3, the lshb sharers c11/d3/d6 + the d7/c17 cluster
  * build they feed). Per-form time is the MIN over runs of the PASS
  * total; per-query MINs are printed for the mechanism.
  */
object CutShareExperiment {

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).headOption
      .map(_.split(',').toSeq)
      .getOrElse(Seq("c11_quality_survivor", "c17_survivor_quality",
        "d3_lsh_pairs", "d6_dedup_apply", "d7_dup_components"))
      .sorted
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    Tables.documents(spark, sfDir).groupBy("lang").count()
      .write.format("noop").mode("overwrite").save()

    def pass(mat: Boolean): Map[String, Double] = {
      spark.conf.set(Scratch.CutKey, mat.toString)
      try {
        Scratch.resetCuts() // one write per pass, Bench's per-run rule
        names.map { n =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          n -> (System.nanoTime() - t0) / 1e9
        }.toMap
      } finally spark.conf.set(Scratch.CutKey, "true")
    }

    val mats = (1 to runs).map(_ => pass(mat = true))
    val lives = (1 to runs).map(_ => pass(mat = false))
    def best(ps: Seq[Map[String, Double]], n: String) = ps.map(_(n)).min
    println(f"CUTSHARE ${"query"}%-24s   mat_s  live_s")
    var (tm, tl) = (0.0, 0.0)
    for (n <- names) {
      val (m, l) = (best(mats, n), best(lives, n))
      tm += m; tl += l
      println(f"CUTSHARE $n%-24s $m%7.2f $l%7.2f")
    }
    println(f"CUTSHARE ${"PASS TOTAL"}%-24s $tm%7.2f $tl%7.2f")
    Scratch.sweep(spark)
    spark.stop()
  }
}
