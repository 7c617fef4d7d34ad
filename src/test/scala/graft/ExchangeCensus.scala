package graft

/** Registry-wide per-query EXCHANGE BUDGET machinery (VERDICT r15 #2 /
  * r16 #2) — the shuffle-side sibling of [[ScanCensus]]. The scan budget
  * mechanized the hidden-RE-SCAN class; the analogous silent regression is
  * the hidden EXTRA EXCHANGE: a groupBy that loses its partial aggregate,
  * a small-side join that silently stops broadcasting (and starts
  * shuffling BOTH sides), a window that sneaks in a repartition. Each is
  * invisible to the scan census (same scans, more shuffles) and is
  * exactly the class that turns a working sf0.1 plan into a 100 TB
  * bottleneck. [[ExchangeBudgetSpec]] walks every registered query's
  * executed plan, counts shuffle and broadcast exchange nodes, and
  * compares against a committed per-query budget — exact match in BOTH
  * directions, so a count UP is the defect and a count DOWN forces a
  * reviewed re-commit.
  */
object ExchangeCensus {

  /** Shuffle exchanges: `Exchange hashpartitioning(...)` /
    * `rangepartitioning` / `SinglePartition` / `RoundRobinPartitioning`
    * nodes in the executed-plan tree (the AQE-initial plan — the shape
    * the optimizer REQUESTED; AQE may still upgrade an SMJ to broadcast
    * at runtime, but the static request is what the budget pins).
    * `ReusedExchange` deliberately does NOT count: a reused exchange
    * executes once, which is the point of the d3-class diamond pins.
    */
  private val shuffleRe =
    """(?m)(?<![A-Za-z])Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)""".r

  /** BroadcastExchange nodes — counted separately: a broadcast is CHEAP
    * and usually the right call, but an unbudgeted new one still marks a
    * plan change worth reviewing (and a broadcast that DISAPPEARS while
    * shuffles go up is the classic lost-BHJ regression).
    */
  private val broadcastRe = """(?<![A-Za-z])BroadcastExchange""".r

  def counts(plan: String): Map[String, Int] = {
    val sh = shuffleRe.findAllIn(plan).length
    val bc = broadcastRe.findAllIn(plan).length
    Seq("shuffle" -> sh, "broadcast" -> bc).filter(_._2 > 0).toMap
  }

  /** Compact committed form: "shuffle=2,broadcast=1"; "" = fully
    * exchange-free, map-side only (c7_epoch_shuffle, o2_limit,
    * o11_compaction). Note b1_bucketed_join is NOT a "" row: the bucketed
    * JOIN plans no exchange (BucketingSpec pins that), but its downstream
    * aggregate + total-order sort are ordinary shuffles — the budget
    * counts the whole query.
    */
  def render(c: Map[String, Int]): String =
    Seq("shuffle", "broadcast")
      .flatMap(k => c.get(k).map(n => s"$k=$n")).mkString(",")

  def parse(s: String): Map[String, Int] = ScanCensus.parse(s)
}

/** Regenerates ExchangeBudgetSpec's committed budget table:
  * {{{
  *   sbt "Test/runMain graft.ExchangeCensusMain"
  * }}}
  * prints one `"name" -> "counts",` line per non-skipped registered query
  * (grep XCENSUS). Paste into ExchangeBudgetSpec.budget after REVIEWING
  * every diff line — a shuffle count that went UP is exactly the defect
  * the budget exists to catch; regeneration is for reviewed plan changes,
  * never for making the spec pass.
  */
object ExchangeCensusMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sfDir = "/root/testdata/sf0.001"
    spark.catalog.clearCache()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if !ScanCensus.skip(name)) {
      val c = scala.util.Try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        ExchangeCensus.render(ExchangeCensus.counts(p))
      }.getOrElse("ERROR")
      println(s"""XCENSUS    "$name" -> "$c",""")
    }
    spark.stop()
  }
}
