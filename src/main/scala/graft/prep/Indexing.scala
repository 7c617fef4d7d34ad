package graft.prep

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.sql.DataFrame

/** String-id indexing ETL (SURVEY.md §2.9 M1-M2, §2.1 S3).
  *
  * The reference fits two StringIndexers in a Pipeline over the training
  * interactions, persists the fitted model, and reloads it in every later
  * job (/root/reference/ALS_model/sample_indexer.py:41-48, reloaded at
  * param_train_1st.py:31). `handleInvalid="skip"` makes transform an
  * implicit filter: unseen users/tracks are dropped, which is what keeps the
  * implicit-ALS evaluation free of cold-start NaNs downstream.
  *
  * Scale: StringIndexerModel holds the label array on the driver and
  * broadcasts it; index lookup is then a map-side hash probe, no shuffle.
  * Fitting is one countByValue-style aggregation per column.
  */
object Indexing {

  /** Two-stage indexer pipeline: userCol -> {userCol}_idx,
    * itemCol -> {itemCol}_idx, most-frequent label = index 0 (the default
    * frequencyDesc order, ties alphabetical).
    */
  def indexerPipeline(userCol: String, itemCol: String): Pipeline = {
    val userIndexer = new StringIndexer()
      .setInputCol(userCol).setOutputCol(s"${userCol}_idx")
      .setHandleInvalid("skip")
    val itemIndexer = new StringIndexer()
      .setInputCol(itemCol).setOutputCol(s"${itemCol}_idx")
      .setHandleInvalid("skip")
    new Pipeline().setStages(Array(userIndexer, itemIndexer))
  }

  /** Fit on train, persist, reload — the reference's save/load contract
    * (S3). Returns the RELOADED model so callers exercise the same artifact
    * later jobs would.
    */
  def fitAndSave(train: DataFrame, userCol: String, itemCol: String,
      path: String): PipelineModel = {
    val model = indexerPipeline(userCol, itemCol).fit(train)
    model.write.overwrite().save(path)
    PipelineModel.load(path)
  }
}
