package graft

import org.apache.spark.sql.functions._

/** c5_quality_classifier — the distilled model must actually reproduce the
  * teacher rule it was trained from, measured the way a real distillation
  * is accepted: ranking AUC of p_keep against the weak label, plus a
  * sanity check on the calibration table the query emits.
  */
class QualityClassifierSpec extends SparkSpec {

  private def featured =
    pipeline.QualityClassifier.featurize(Tables.tokenizedDocs(spark, sfDir))

  test("distilled model ranks teacher-keep docs above teacher-drop (AUC)") {
    val f = featured
    val model = pipeline.QualityClassifier.fit(f)
    val scored = pipeline.QualityClassifier.score(model, f)
      .select("label", "p_keep").collect()
      .map(r => (r.getAs[Double]("label"), r.getAs[Double]("p_keep")))
    val pos = scored.filter(_._1 == 1.0).map(_._2)
    val neg = scored.filter(_._1 == 0.0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty,
      s"degenerate labels: ${pos.length} pos / ${neg.length} neg")
    // exact Mann-Whitney AUC over all pos x neg pairs (test-sized data)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc >= 0.90, s"distilled AUC $auc below acceptance floor 0.90")
  }

  test("c5 calibration table: higher deciles carry higher keep rates") {
    val rows = SparkEntry.queries("c5_quality_classifier")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val kept = rows.map(_.getAs[Long]("n_keep_label")).sum
    assert(total > 0 && kept > 0 && kept < total,
      s"degenerate corpus: $kept keep of $total")
    // keep-rate in the top populated decile must beat the bottom one
    val byDecile = rows.sortBy(_.getAs[Long]("decile"))
    val bottom = byDecile.head
    val top = byDecile.last
    def rate(r: org.apache.spark.sql.Row) =
      r.getAs[Long]("n_keep_label").toDouble / r.getAs[Long]("n_docs")
    assert(rate(top) > rate(bottom),
      s"calibration inverted: top ${rate(top)} vs bottom ${rate(bottom)}")
  }
}
