package graft

/** The Scratch.cut toggle changes PLANS, never results: every census
  * query must produce byte-identical rows with the shared frame
  * materialized (default) and with the live lineage
  * (`spark.graft.cutMaterialize=false`). This is the differential that
  * licenses CensusCrossoverExperiment to time the two forms as the same
  * query — the d16 `hashedAnchors` precedent (ExactSubstrSpec).
  */
class CutDifferentialSpec extends SparkSpec {

  test("census queries: cut-materialized results == live-lineage results") {
    def results(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, sfDir)
        .collect().map(_.toString).toSeq
    for (name <- ScanCensus.censusCuts) {
      spark.conf.set(Scratch.CutKey, "true")
      val mat =
        try results(name)
        finally spark.conf.set(Scratch.CutKey, "true")
      spark.conf.set(Scratch.CutKey, "false")
      val live =
        try results(name)
        finally spark.conf.set(Scratch.CutKey, "true")
      assert(mat == live,
        s"$name diverges between materialized and live lineage forms:\n" +
          s"  mat : ${mat.take(3).mkString(" | ")}\n" +
          s"  live: ${live.take(3).mkString(" | ")}")
    }
  }

  test("the toggle actually switches the plan (live form re-scans the fact)") {
    // d13 is the canonical case: 24 documents scans live, 0 in the
    // consumer plan when cut. If this stops discriminating, the toggle
    // is dead and the differential above proves nothing.
    spark.conf.set(Scratch.CutKey, "false")
    try {
      val live = SparkEntry.queries("d13_containment")(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(ScanCensus.counts(live).getOrElse("documents", 0) >= 10,
        "live d13 no longer multiplies documents scans — toggle broken?")
    } finally spark.conf.set(Scratch.CutKey, "true")
    val mat = SparkEntry.queries("d13_containment")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(ScanCensus.counts(mat).getOrElse("documents", 0) == 0)
  }
}
