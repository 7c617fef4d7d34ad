package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed user-universe algebra (SURVEY.md §7.1 step 3).
  *
  * The reference computes this on the driver: collect() three ~1.1M-id user
  * sets, Python set union/difference, random.sample, then an isin() filter
  * with a giant literal list (/root/reference/ALS_model/sample_indexer.py:28-39).
  * That caps out at driver memory. Here the same semantics stay distributed:
  * distinct -> anti-join -> seeded key sample -> semi-join; nothing ever
  * leaves the executors, so the same code runs at 100 TB.
  */
object Downsample {

  /** Users present in `train` but in neither `val` nor `test`
    * (sample_indexer.py:32-33 as joins: union+distinct then left_anti).
    */
  def trainOnlyUsers(train: DataFrame, valDf: DataFrame, testDf: DataFrame,
      userCol: String): DataFrame = {
    val valTest = valDf.select(userCol).union(testDf.select(userCol)).distinct()
    train.select(userCol).distinct()
      .join(valTest, Seq(userCol), "left_anti")
  }

  /** Uniform sample over USERS (all interactions of a sampled user kept),
    * seeded for reproducibility — the reference's `random.sample` is
    * unseeded (SURVEY §7.3), fixed here. keyUniverse is sampled key-level,
    * then a left-semi join restores every row of the kept users.
    */
  def sampleByUser(interactions: DataFrame, keyUniverse: DataFrame,
      userCol: String, fraction: Double, seed: Long): DataFrame = {
    val sampledKeys = keyUniverse.sample(withReplacement = false, fraction, seed)
    interactions.join(sampledKeys.select(userCol), Seq(userCol), "left_semi")
  }
}
