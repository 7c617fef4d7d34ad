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
    val recs = AlsTrainer.recommendLists(model, users, k)
    val truth = RankingEval.truthLists(valDf, cfg.userCol, cfg.itemCol)
    val pairs = RankingEval.pairs(recs, truth, cfg.userCol)
    val metrics = RankingEval.evaluate(pairs, k)
    val rmse = RankingEval.rmse(AlsTrainer.scores(model, valDf),
      cfg.ratingCol, "prediction")
    SweepPoint(cfg.rank, cfg.regParam, cfg.alpha, fraction, metrics, rmse, fitSec)
  }

  /** M7: 1-D sweep — one hyperparameter varies, the rest pinned. Configs
    * are independent, so they fit CONCURRENTLY (Par.inParallel): each
    * seeded fit's result is interleaving-invariant, and overlapping the
    * fits fills the barrier idle time a serial loop leaves on the table.
    * fitSeconds measures overlapped wall-clock under fan-out — still fine
    * for the registered queries, which exclude it from output.
    */
  def sweep1D(train: DataFrame, valDf: DataFrame, base: AlsConfig, k: Int,
      ranks: Seq[Int]): Seq[SweepPoint] =
    withPersisted(train, valDf) { (t, v) =>
      Par.inParallel(ranks, width = 4)(r => fitEval(t, v, base.copy(rank = r), k))
    }

  /** M8: full grid — rank x regParam x alpha (3x3x3 in the reference),
    * fit concurrently like sweep1D.
    */
  def grid(train: DataFrame, valDf: DataFrame, base: AlsConfig, k: Int,
      ranks: Seq[Int], regs: Seq[Double], alphas: Seq[Double]): Seq[SweepPoint] =
    withPersisted(train, valDf) { (t, v) =>
      val cfgs = for (r <- ranks; reg <- regs; a <- alphas)
        yield base.copy(rank = r, regParam = reg, alpha = a)
      Par.inParallel(cfgs, width = 4)(c => fitEval(t, v, c, k))
    }

  /** M9: learning curve — metric (and fit time) vs training fraction.
    * Row-level Bernoulli sample per the timing extension
    * (als_model_extension_2.py:38); seeded for reproducibility. STAYS
    * SERIAL deliberately: the fitSeconds-vs-fraction relationship is this
    * harness's deliverable, and concurrent fits would contend for cores
    * and corrupt exactly that measurement.
    */
  def learningCurve(train: DataFrame, valDf: DataFrame, base: AlsConfig, k: Int,
      fractions: Seq[Double], seed: Long = 66L): Seq[SweepPoint] =
    withPersisted(train, valDf) { (t, v) =>
      fractions.map { f =>
        val sampled = if (f >= 1.0) t else t.sample(withReplacement = false, f, seed)
        fitEval(sampled, v, base, k, f)
      }
    }

  /** BOTH loop-invariant frames persist — validation lineage re-executes
    * 2-3 times per config (users+recs, truth, rmse) — and both MATERIALIZE
    * before the loop: persist is lazy, so without the count() the FIRST
    * config's timed fit would pay the scan + cache fill and report a
    * systematically inflated fitSeconds (the exact comparison sweeps
    * exist to make).
    */
  private def withPersisted[T](train: DataFrame, valDf: DataFrame)(
      body: (DataFrame, DataFrame) => T): T = {
    train.persist(StorageLevel.MEMORY_AND_DISK)
    valDf.persist(StorageLevel.MEMORY_AND_DISK)
    train.count()
    valDf.count()
    try body(train, valDf)
    finally { train.unpersist(); valDf.unpersist(); () }
  }
}
