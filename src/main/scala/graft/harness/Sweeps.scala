package graft.harness

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import graft.eval.{RankingEval, RankingSummary}
import graft.model.{AlsConfig, AlsTrainer}

/** Hyperparameter sweep / learning-curve harnesses (SURVEY.md §2.9 M7-M9).
  *
  * The reference runs these as driver for-loops re-fitting ALS per config
  * (1-D sweeps /root/reference/ALS_model/param_train_1st.py:43-52; 3x3x3 grid
  * param_train_2nd.py:43-53; learning curve learning_curve.py:46-111 and
  * timing als_model_extension_2.py:37-79). Per-config metrics must be
  * reported, so a driver loop — not CrossValidator — is the right shape here
  * too. The train set is persisted around the loop (the reference considered
  * and commented this out; at any scale re-reading parquet per config is
  * pure waste — SURVEY §4).
  */
object Sweeps {

  final case class SweepPoint(
      rank: Int, regParam: Double, alpha: Double, fraction: Double,
      metrics: RankingSummary, rmse: Double, fitSeconds: Double)

  /** Fit one config and evaluate ranking metrics + RMSE on the validation
    * set. `evalUsers` = distinct validation users (the recommend subset).
    */
  def fitEval(train: DataFrame, valDf: DataFrame, cfg: AlsConfig, k: Int,
      fraction: Double = 1.0): SweepPoint = {
    val t0 = System.nanoTime()
    val model = AlsTrainer.fit(train, cfg)
    val fitSec = (System.nanoTime() - t0) / 1e9
    val users = valDf.select(cfg.userCol).distinct()
    val recs = AlsTrainer.recommendLists(model, users, k, cfg.userCol)
    val truth = RankingEval.truthLists(valDf, cfg.userCol, cfg.itemCol)
    val pairs = RankingEval.pairs(recs, truth, cfg.userCol)
    val metrics = RankingEval.evaluate(pairs, k)
    val rmse = RankingEval.rmse(AlsTrainer.scores(model, valDf),
      cfg.ratingCol, "prediction")
    SweepPoint(cfg.rank, cfg.regParam, cfg.alpha, fraction, metrics, rmse, fitSec)
  }

  /** M7: 1-D sweep — one hyperparameter varies, the rest pinned. */
  def sweep1D(train: DataFrame, valDf: DataFrame, base: AlsConfig, k: Int,
      ranks: Seq[Int]): Seq[SweepPoint] =
    withPersisted(train) { t =>
      ranks.map(r => fitEval(t, valDf, base.copy(rank = r), k))
    }

  /** M8: full grid — rank x regParam x alpha (3x3x3 in the reference). */
  def grid(train: DataFrame, valDf: DataFrame, base: AlsConfig, k: Int,
      ranks: Seq[Int], regs: Seq[Double], alphas: Seq[Double]): Seq[SweepPoint] =
    withPersisted(train) { t =>
      for (r <- ranks; reg <- regs; a <- alphas)
        yield fitEval(t, valDf, base.copy(rank = r, regParam = reg, alpha = a), k)
    }

  /** M9: learning curve — metric (and fit time) vs training fraction.
    * Row-level Bernoulli sample per the timing extension
    * (als_model_extension_2.py:38); seeded for reproducibility.
    */
  def learningCurve(train: DataFrame, valDf: DataFrame, base: AlsConfig, k: Int,
      fractions: Seq[Double], seed: Long = 66L): Seq[SweepPoint] =
    withPersisted(train) { t =>
      fractions.map { f =>
        val sampled = if (f >= 1.0) t else t.sample(withReplacement = false, f, seed)
        fitEval(sampled, valDf, base, k, f).copy(fraction = f)
      }
    }

  private def withPersisted[T](df: DataFrame)(body: DataFrame => T): T = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    try body(df)
    finally { df.unpersist(); () }
  }
}
