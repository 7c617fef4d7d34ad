package graft

import org.apache.spark.sql.functions._
import graft.eval.RankingEval
import graft.model.{AlsConfig, AlsTrainer}
import graft.prep.Indexing

/** Golden end-to-end: the reference's one_train flow
  * (/root/reference/ALS_model/one_train.py:29-54) on the MSD-shaped fixture —
  * vestigial-column drop, indexing with save/load, handleInvalid=skip as an
  * implicit filter, implicit ALS, recommendForUserSubset, broadcast-join
  * truth, Aggregator metrics with mllib parity, RMSE.
  */
class OneTrainSpec extends SparkSpec {

  test("one_train flow end-to-end on the MSD-shaped fixture") {
    val data = MsdFixture.build(spark)
    // S8/P5: readers tolerate and drop the pandas index residue
    val train = data.train.drop("__index_level_0__")
    val valDf = data.valDf.drop("__index_level_0__")

    // M1/M2/S3: index on train, persist, reload
    val indexer = Indexing.fitAndSave(train, "user_id", "track_id",
      "/root/repo/target/test-tmp/msd_indexer")
    val trainIdx = indexer.transform(train)
      .select(col("user_id_idx").cast("int").as("user_idx"),
        col("track_id_idx").cast("int").as("item_idx"),
        col("count").cast("float").as("count"))
    val valIdx = indexer.transform(valDf)
      .select(col("user_id_idx").cast("int").as("user_idx"),
        col("track_id_idx").cast("int").as("item_idx"),
        col("count").cast("float").as("count"))

    // handleInvalid=skip dropped exactly the unseen-user and unseen-track rows
    assert(valIdx.count() == valDf.count() - 2)

    // M3: implicit ALS (reference config shape, shrunk for the fixture)
    val cfg = AlsConfig(rank = 8, regParam = 0.1, alpha = 10.0, maxIter = 5,
      userBlocks = 2, itemBlocks = 2)
    val model = AlsTrainer.fit(trainIdx, cfg)

    // M5/O4 -> P2 -> A1 -> J1 -> A11
    val users = valIdx.select("user_idx").distinct()
    val recs = AlsTrainer.recommendLists(model, users, 20)
    val truth = RankingEval.truthLists(valIdx, "user_idx", "item_idx")
    val pairs = RankingEval.pairs(recs, truth, "user_idx").cache()

    val m = RankingEval.evaluate(pairs, 20)
    val ref = RankingEval.evaluateMllib(pairs, 20)
    assert(m.users == 25)
    assert(math.abs(m.meanAveragePrecision - ref.meanAveragePrecision) < 1e-12)
    assert(math.abs(m.precisionAtK - ref.precisionAtK) < 1e-12)
    // planted structure: 20 structural tracks per user, k=20 → random
    // chance P@20 ≈ 20/200 = 0.1; the model must do far better
    assert(m.precisionAtK > 0.4, s"P@20 = ${m.precisionAtK}")

    // M4/A10
    val rmse = RankingEval.rmse(AlsTrainer.scores(model, valIdx),
      "count", "prediction")
    assert(!rmse.isNaN && rmse > 0)
  }
}
