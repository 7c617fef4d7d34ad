package graft

/** Every registered query must (a) run at sf0.001 and return a
  * well-formed result, and (b) for the oracled ones, be DETERMINISTIC —
  * two runs hash-identical — because the driver's correctness gate
  * hash-compares a single run against DuckDB. Seeded-model queries
  * (ALS / KMeans / samples) are exempted from the double-run (they are
  * deterministic per session but expensive).
  */
class QueriesSmokeSpec extends SparkSpec {

  private val modelBacked = Set(
    "m4_als_recommend", "m5_als_rmse", "e4_ann_ivf", "m1_indexer_pipeline",
    "o5_row_sample", "o6_user_sample")

  test("all registered queries run; oracled queries are run-to-run stable") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val r1 = fn(spark, sfDir).collect().toSeq
        if (!modelBacked(name) && SparkEntry.oracleSql.contains(name)) {
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
