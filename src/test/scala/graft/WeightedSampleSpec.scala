package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.hash32

/** o13's A-Res weighted sampler: determinism, shape, and the WEIGHTING
  * law itself — across many independent salts, documents are selected
  * with frequency increasing in their weight (the property that
  * separates this from o5/o8's uniform samplers).
  */
class WeightedSampleSpec extends SparkSpec {

  test("o13: 5 rows per source, deterministic across runs") {
    val q = SparkEntry.queries("o13_weighted_sample")
    val r1 = q(spark, sfDir).collect().toSeq
    val r2 = q(spark, sfDir).collect().toSeq
    assert(r1 == r2, "weighted sample not deterministic")
    val bySource = r1.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.size == 5),
      s"expected 5 rows per source: ${bySource.view.mapValues(_.size).toMap}")
  }

  test("selection frequency increases with weight (A-Res law, 64 salts)") {
    // k=1 per salt so the law is exact: P(doc wins) = w_doc / sum(w).
    // Aggregate over 64 independent salts and compare the mean weight of
    // winners against the corpus mean — winners must be heavier.
    val docs = Tables.documents(spark, sfDir)
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars")).cache()
    val salts = (0 until 64).map(i => lit(s"salt$i:"))
    val winners = salts.map { salt =>
      val u = (hash32(concat(salt, col("doc_id").cast("string")))
        .cast("double") + 0.5) / 4294967296.0
      docs.select(col("doc_id"), col("n_chars"),
          (log(u) / col("n_chars")).as("k"))
        .orderBy(desc("k"), col("doc_id")).limit(1)
    }.reduce(_ unionByName _)
    val meanWinner = winners.agg(avg(col("n_chars"))).head.getDouble(0)
    val meanCorpus = docs.agg(avg(col("n_chars"))).head.getDouble(0)
    docs.unpersist()
    assert(meanWinner > meanCorpus * 1.1,
      s"winners not weight-biased: mean winner $meanWinner vs corpus $meanCorpus")
  }

  test("the oracle's rank definition matches Spark's exactly at sf0.001") {
    // same guard style as the w2 family: the Spark window and the SQL
    // window must share the full (k DESC, doc_id) tie-break
    val w = Window.partitionBy(col("source")).orderBy(desc("k"), col("doc_id"))
    val u = (hash32(concat(lit("wsample:"), col("doc_id").cast("string")))
      .cast("double") + 0.5) / 4294967296.0
    val mine = Tables.documents(spark, sfDir).filter(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), (log(u) / col("n_chars")).as("k"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("source"), col("doc_id"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val registered = SparkEntry.queries("o13_weighted_sample")(spark, sfDir)
      .select(col("source"), col("doc_id"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mine == registered)
  }
}
