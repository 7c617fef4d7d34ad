package graft

/** Every registered query must (a) run at sf0.001 and return a
  * well-formed result, and (b) be DETERMINISTIC — two runs identical —
  * because the driver's correctness gate hash-compares a single run
  * against DuckDB, and the rows-only queries (seeded samples, sketches)
  * are graded on their recorded output too. Only the expensive model
  * fits (ALS / KMeans / indexer) are exempted from the double-run
  * (seed-reproducibility for those is AlsSpec/IvfIndexSpec's job).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val expensiveFit = Set(
    "m4_als_recommend", "m5_als_rmse", "e4_ann_ivf", "m1_indexer_pipeline")

  test("all registered queries run and are run-to-run stable") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val r1 = fn(spark, sfDir).collect().toSeq
        if (!expensiveFit(name)) {
          val r2 = fn(spark, sfDir).collect().toSeq
          if (r1 != r2) failures += s"$name: nondeterministic across runs"
        }
        if (r1 == null) failures += s"$name: null result"
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage.take(120)}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every oracled name is registered and the flagship entry has rows") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
