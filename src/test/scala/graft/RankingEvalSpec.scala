package graft

import graft.eval.{RankingAggregator, RankingEval}
import scala.util.Random

/** The typed Aggregator must replicate mllib.RankingMetrics exactly — the
  * reference's evaluation path (param_train_1st.py:62-66) is the oracle for
  * the DataFrame-native reimplementation (SURVEY §7.2).
  */
class RankingEvalSpec extends SparkSpec {

  private def pairsDf(pairs: Seq[(Seq[Int], Seq[Int])]) = {
    val s = spark
    import s.implicits._
    pairs.toDF("pred", "truth")
  }

  private val rnd = new Random(42)
  private val randomPairs: Seq[(Seq[Int], Seq[Int])] = Seq.tabulate(60) { _ =>
    val pred = Seq.fill(10)(rnd.nextInt(40))
    val truth = Seq.fill(1 + rnd.nextInt(8))(rnd.nextInt(40)).distinct
    (pred, truth)
  }

  test("parity with mllib.RankingMetrics on random pairs (k=5)") {
    val df = pairsDf(randomPairs).cache()
    val ours = RankingEval.evaluate(df, 5)
    val ref = RankingEval.evaluateMllib(df, 5)
    assert(math.abs(ours.meanAveragePrecision - ref.meanAveragePrecision) < 1e-12)
    assert(math.abs(ours.precisionAtK - ref.precisionAtK) < 1e-12)
    assert(math.abs(ours.ndcgAtK - ref.ndcgAtK) < 1e-12)
    assert(ours.users == ref.users)
  }

  test("parity at k larger than every prediction list") {
    val df = pairsDf(randomPairs)
    val ours = RankingEval.evaluate(df, 500)
    val ref = RankingEval.evaluateMllib(df, 500)
    assert(math.abs(ours.precisionAtK - ref.precisionAtK) < 1e-12)
    assert(math.abs(ours.ndcgAtK - ref.ndcgAtK) < 1e-12)
  }

  test("hand-computed single pair") {
    // pred 1,2,3; truth {2,4}: P@2 = 1/2; AP = (1/2)/2 = 0.25;
    // DCG@2 = 1/log2(3), IDCG@2 = 1 + 1/log2(3)
    val m = RankingEval.evaluate(pairsDf(Seq((Seq(1, 2, 3), Seq(2, 4)))), 2)
    assert(math.abs(m.precisionAtK - 0.5) < 1e-12)
    assert(math.abs(m.meanAveragePrecision - 0.25) < 1e-12)
    val dcg = 1.0 / (math.log(3) / math.log(2))
    assert(math.abs(m.ndcgAtK - dcg / (1.0 + dcg)) < 1e-12)
  }

  test("metrics bounded in [0,1]; perfect ranking scores 1") {
    val m = RankingEval.evaluate(pairsDf(randomPairs), 5)
    for (v <- Seq(m.meanAveragePrecision, m.precisionAtK, m.ndcgAtK))
      assert(v >= 0.0 && v <= 1.0)
    val perfect = RankingEval.evaluate(
      pairsDf(Seq((Seq(1, 2, 3), Seq(1, 2, 3)))), 3)
    assert(math.abs(perfect.meanAveragePrecision - 1.0) < 1e-12)
    assert(math.abs(perfect.precisionAtK - 1.0) < 1e-12)
    assert(math.abs(perfect.ndcgAtK - 1.0) < 1e-12)
  }

  test("appending non-relevant items past k leaves P@k and NDCG@k unchanged") {
    val base = Seq((Seq(1, 2, 3), Seq(2)))
    val padded = Seq((Seq(1, 2, 3, 90, 91, 92), Seq(2)))
    val a = RankingEval.evaluate(pairsDf(base), 3)
    val b = RankingEval.evaluate(pairsDf(padded), 3)
    assert(math.abs(a.precisionAtK - b.precisionAtK) < 1e-12)
    assert(math.abs(a.ndcgAtK - b.ndcgAtK) < 1e-12)
  }

  test("empty truth contributes zero metrics but counts the user (mllib parity)") {
    val df = pairsDf(Seq((Seq(1, 2), Seq(3)), (Seq(1, 2), Seq())))
    val ours = RankingEval.evaluate(df, 2)
    assert(ours.users == 2)
    val ref = RankingEval.evaluateMllib(df, 2)
    assert(math.abs(ours.precisionAtK - ref.precisionAtK) < 1e-12)
    assert(math.abs(ours.meanAveragePrecision - ref.meanAveragePrecision) < 1e-12)
  }

  test("rmse matches hand computation") {
    val s = spark
    import s.implicits._
    val df = Seq((1.0, 2.0), (3.0, 3.0), (0.0, 2.0)).toDF("label", "prediction")
    // errs 1, 0, 2 -> sqrt(5/3)
    assert(math.abs(RankingEval.rmse(df, "label", "prediction")
      - math.sqrt(5.0 / 3.0)) < 1e-12)
  }
}
