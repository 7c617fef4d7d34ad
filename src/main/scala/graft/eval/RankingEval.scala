package graft.eval

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-partition partial sums for the ranking metrics — mergeable, so the
  * aggregation is map-side partial + one shuffle of four doubles per
  * partition (never a collect of the pair lists to the driver).
  */
final case class RankingBuf(
    sumPrecK: Double, sumMap: Double, sumNdcgK: Double, n: Long)

/** Corpus-level ranking metrics. */
final case class RankingSummary(
    meanAveragePrecision: Double, precisionAtK: Double, ndcgAtK: Double, users: Long)

/** DataFrame-native ranking evaluation (SURVEY.md §2.4 A11, §7.2).
  *
  * The reference evaluates recommendations by bridging to RDDs and
  * `mllib.RankingMetrics` (/root/reference/ALS_model/param_train_1st.py:61-66).
  * Here the same three metrics are a typed `Aggregator` over
  * (predicted, truth) id-list pairs, which keeps evaluation inside Catalyst:
  * partial aggregation per partition, a four-double shuffle, no RDD bridge.
  * Per-pair semantics replicate `mllib.evaluation.RankingMetrics` exactly
  * (binary relevance; precision@k divides by k even when fewer predictions
  * exist; MAP divides by |truth|; NDCG idcg over min(|truth|, k)) and are
  * parity-tested against it in RankingEvalSpec.
  *
  * DOMAIN: a prediction list is a ranking of DISTINCT items — every
  * ranking source in the engine (recommendForUserSubset, top-k windows)
  * emits distinct ids. On duplicate predicted ids mllib's MAP counts each
  * duplicate hit's precision mass and can exceed 1; this aggregator
  * mirrors that by parity contract rather than silently deduplicating
  * (scalacheck surfaced the out-of-domain case in round 9 —
  * RankingProperties generates distinct preds accordingly).
  */
class RankingAggregator(k: Int)
    extends Aggregator[(Seq[Int], Seq[Int]), RankingBuf, RankingSummary] {

  override def zero: RankingBuf = RankingBuf(0.0, 0.0, 0.0, 0L)

  override def reduce(b: RankingBuf, pair: (Seq[Int], Seq[Int])): RankingBuf = {
    val (pred, truth) = pair
    val labSet = truth.toSet
    if (labSet.isEmpty) {
      // mllib counts the user with all-zero metrics (and logs a warning).
      RankingBuf(b.sumPrecK, b.sumMap, b.sumNdcgK, b.n + 1)
    } else {
      var hitsK = 0
      var i = 0
      val nK = math.min(pred.length, k)
      while (i < nK) { if (labSet.contains(pred(i))) hitsK += 1; i += 1 }

      var hits = 0
      var ap = 0.0
      i = 0
      while (i < pred.length) {
        if (labSet.contains(pred(i))) { hits += 1; ap += hits.toDouble / (i + 1) }
        i += 1
      }

      var dcg = 0.0
      i = 0
      while (i < nK) {
        if (labSet.contains(pred(i))) dcg += 1.0 / (math.log(i + 2) / math.log(2))
        i += 1
      }
      var idcg = 0.0
      i = 0
      val nIdeal = math.min(labSet.size, k)
      while (i < nIdeal) { idcg += 1.0 / (math.log(i + 2) / math.log(2)); i += 1 }

      RankingBuf(
        b.sumPrecK + hitsK.toDouble / k,
        b.sumMap + ap / labSet.size,
        b.sumNdcgK + (if (idcg > 0) dcg / idcg else 0.0),
        b.n + 1)
    }
  }

  override def merge(a: RankingBuf, b: RankingBuf): RankingBuf =
    RankingBuf(a.sumPrecK + b.sumPrecK, a.sumMap + b.sumMap,
      a.sumNdcgK + b.sumNdcgK, a.n + b.n)

  override def finish(r: RankingBuf): RankingSummary =
    if (r.n == 0) RankingSummary(0.0, 0.0, 0.0, 0L)
    else RankingSummary(r.sumMap / r.n, r.sumPrecK / r.n, r.sumNdcgK / r.n, r.n)

  override def bufferEncoder: Encoder[RankingBuf] = Encoders.product[RankingBuf]
  override def outputEncoder: Encoder[RankingSummary] = Encoders.product[RankingSummary]
}

object RankingEval {

  /** Ground-truth id list per user (SURVEY §2.4 A1), order pinned inside the
    * agg — the reference's sort-before-groupBy has no ordering guarantee
    * (/root/reference/ALS_model/param_train_1st.py:39-41; SURVEY §7.3).
    * Truth lists are membership sets downstream, so key order is fine.
    */
  def truthLists(df: DataFrame, userCol: String, itemCol: String): DataFrame =
    df.groupBy(col(userCol))
      .agg(sort_array(collect_list(col(itemCol).cast("int"))).as("truth"))

  /** (pred, truth) pairs from recommendations ⋈ truth (the reference's
    * join, param_train_1st.py:60-61). Deliberately UNHINTED: both sides
    * are evaluation-subset-sized (users x top-k lists — at MSD scale 100k
    * users x 500 ints each, hundreds of MB), so forcing a broadcast risks
    * the driver; AQE broadcasts when the truth side actually fits and
    * falls back to a user-keyed shuffle join of two same-sized relations
    * when it doesn't.
    */
  def pairs(recs: DataFrame, truth: DataFrame, userCol: String): DataFrame =
    recs.join(truth, Seq(userCol))
      .select(col("pred"), col("truth"))

  /** All three metrics via the typed Aggregator (one pass, partial agg). */
  def evaluate(pairsDf: DataFrame, k: Int): RankingSummary = {
    val spark = pairsDf.sparkSession
    import spark.implicits._
    val ds: Dataset[(Seq[Int], Seq[Int])] =
      pairsDf.select(col("pred").cast("array<int>"), col("truth").cast("array<int>"))
        .as[(Seq[Int], Seq[Int])]
    ds.select(new RankingAggregator(k).toColumn).head()
  }

  /** mllib.RankingMetrics over the same pairs — the reference's exact path
    * (param_train_1st.py:62-66), kept as the parity oracle for the
    * Aggregator. Array[Int] keys on both sides: a Seq[Int]/Seq[Double]
    * mismatch silently zeroes every metric (SURVEY §7.3 hazard 5).
    */
  def evaluateMllib(pairsDf: DataFrame, k: Int): RankingSummary = {
    val spark = pairsDf.sparkSession
    import spark.implicits._
    val rdd = pairsDf
      .select(col("pred").cast("array<int>"), col("truth").cast("array<int>"))
      .as[(Array[Int], Array[Int])].rdd
    // each metric accessor (and the count) is its own Spark job — persist
    // so the upstream join/collect_list pipeline executes once, not 4x
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val m = new org.apache.spark.mllib.evaluation.RankingMetrics[Int](rdd)
      RankingSummary(m.meanAveragePrecision, m.precisionAt(k), m.ndcgAt(k), rdd.count())
    } finally { rdd.unpersist(); () }
  }

  /** RMSE of a prediction column against a label column (A10) — expressed
    * as sqrt(avg(err^2)), a partial-aggregable shape. NaN when no rows are
    * scoreable (e.g. every validation pair was cold-start-dropped) — the
    * honest "undefined", instead of a ROW_VALUE_IS_NULL crash deep in Row
    * accessors.
    */
  def rmse(df: DataFrame, labelCol: String, predCol: String): Double = {
    val row = df.select(sqrt(avg(pow(col(predCol) - col(labelCol), 2))).as("rmse"))
      .head()
    if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
  }
}
