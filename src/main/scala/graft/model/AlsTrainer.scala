package graft.model

import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Implicit-feedback ALS configuration surface (SURVEY.md §2.9 M3-M5,
  * §2.6 O4).
  *
  * Defaults mirror the reference's fixed settings
  * (/root/reference/ALS_model/one_train.py:41-45): implicitPrefs,
  * nonnegative, seed 123, 50x50 user/item blocks; rank/regParam/alpha are
  * the swept hyperparameters. Blocks control ALS's shuffle parallelism — at
  * cluster scale they should track executor count; tests shrink them so a
  * toy fixture doesn't pay 2500 empty block pairs.
  */
final case class AlsConfig(
    rank: Int = 30,
    regParam: Double = 1.0,
    alpha: Double = 10.0,
    maxIter: Int = 10,
    userBlocks: Int = 50,
    itemBlocks: Int = 50,
    seed: Long = 123L,
    userCol: String = "user_idx",
    itemCol: String = "item_idx",
    ratingCol: String = "count")

object AlsTrainer {

  def fit(train: DataFrame, cfg: AlsConfig): ALSModel =
    new ALS()
      .setImplicitPrefs(true)
      .setNonnegative(true)
      .setRank(cfg.rank)
      .setRegParam(cfg.regParam)
      .setAlpha(cfg.alpha)
      .setMaxIter(cfg.maxIter)
      .setNumUserBlocks(cfg.userBlocks)
      .setNumItemBlocks(cfg.itemBlocks)
      .setSeed(cfg.seed)
      .setUserCol(cfg.userCol)
      .setItemCol(cfg.itemCol)
      .setRatingCol(cfg.ratingCol)
      // drop unseen keys at transform instead of emitting NaN scores
      // (SURVEY §7.3 hazard 4; the reference relies on indexer skip upstream)
      .setColdStartStrategy("drop")
      .fit(train)

  /** Top-k recommendations for a user subset (O4/M5) then the nested-field
    * projection the reference applies (P2, param_train_1st.py:57-58):
    * array<struct<item,rating>> -> pred: array<int>. Both column names
    * come from the model itself — a caller-supplied name could silently
    * disagree with the column the model was fitted on.
    */
  def recommendLists(model: ALSModel, users: DataFrame, k: Int): DataFrame =
    model.recommendForUserSubset(users, k)
      .select(col(model.getUserCol),
        col(s"recommendations.${model.getItemCol}").cast("array<int>").as("pred"))

  /** Predicted preference scores for held-out (user, item) pairs (M4). */
  def scores(model: ALSModel, df: DataFrame): DataFrame = model.transform(df)
}
