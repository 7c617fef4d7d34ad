package graft.export

import org.apache.spark.ml.recommendation.ALSModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latent-factor export contracts (SURVEY.md §2.12, §7.1 step 9).
  *
  * The reference exports ALS factor matrices to CSV for the out-of-Spark
  * UMAP stage: `user_matrix.csv` rows are `(index, "[f0 f1 ...]")` (EDA
  * cells 11-23), and the UMAP input `df_final.csv` is
  * `(track_genre_val, year-like label, item_factor-string)` (cells
  * 105-108, built there by positional concat — here it is a keyed join).
  * Only the CONTRACT is preserved; UMAP itself is not portable.
  */
object Factors {

  /** `(id, "[f0 f1 ...]")` — the factor-matrix CSV row shape. */
  def factorRows(factors: DataFrame): DataFrame =
    factors.select(col("id"),
      concat(lit("["),
        array_join(col("features").cast("array<string>"), " "),
        lit("]")).as("features"))

  def userFactorRows(model: ALSModel): DataFrame = factorRows(model.userFactors)
  def itemFactorRows(model: ALSModel): DataFrame = factorRows(model.itemFactors)

  /** The UMAP-input contract: per-item dominant label + serialized factor
    * vector, glued by KEY (the reference's positional concat hazard,
    * SURVEY §7.3) — `labels` must carry (id, label).
    */
  def umapInput(model: ALSModel, labels: DataFrame): DataFrame =
    itemFactorRows(model)
      .join(labels, Seq("id"))
      .select(col("label").as("item_label"), col("id"), col("features").as("item_factor"))
}
