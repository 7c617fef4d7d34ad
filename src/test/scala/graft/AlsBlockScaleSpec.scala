package graft

import org.apache.spark.sql.functions._
import graft.eval.RankingEval
import graft.model.{AlsConfig, AlsTrainer}
import graft.prep.Indexing

/** Reference-scale ALS blocking (VERDICT r4 #5): the reference tunes
  * numUserBlocks = numItemBlocks = 50 with rank 150
  * (/root/reference/ALS_model/param_train_1st.py:53-55, report §2.3.1) —
  * every other suite shrinks blocks to 2-8 so toy fixtures don't pay empty
  * block pairs, which left the block-scaling path itself untested. This
  * spec fits rank 50 with 50x50 blocks — blocks far above local cores, so
  * the blocked normal-equation exchange actually runs multi-block — and
  * asserts the fit completes AND still recovers the planted structure
  * (block count must affect parallelism only, never the solution quality).
  */
class AlsBlockScaleSpec extends SparkSpec {

  test("rank 50 with 50x50 blocks completes and recovers planted structure") {
    val data = MsdFixture.build(spark)
    val train = data.train.drop("__index_level_0__")
    val indexer = Indexing.fitAndSave(train, "user_id", "track_id",
      "/root/repo/target/test-tmp/block_scale_indexer")
    val trainIdx = indexer.transform(train)
      .select(col("user_id_idx").cast("int").as("user_idx"),
        col("track_id_idx").cast("int").as("item_idx"),
        col("count").cast("float").as("count"))
      .cache()
    trainIdx.count()

    val cfg = AlsConfig(rank = 50, regParam = 0.1, alpha = 10.0, maxIter = 3,
      userBlocks = 50, itemBlocks = 50)
    val model = AlsTrainer.fit(trainIdx, cfg)

    // factor matrices are complete and rank-wide
    assert(model.rank == 50)
    assert(model.userFactors.count() == trainIdx.select("user_idx").distinct().count())
    assert(model.itemFactors.count() == trainIdx.select("item_idx").distinct().count())

    // structure recovery: 20 structural tracks of 200 per user -> random
    // P@10 = 0.1; the planted signal must dominate regardless of blocking
    val users = trainIdx.select("user_idx").distinct()
    val recs = AlsTrainer.recommendLists(model, users, 10)
    val truth = RankingEval.truthLists(
      trainIdx.filter(col("count") >= 3), "user_idx", "item_idx")
    val pairs = RankingEval.pairs(recs, truth, "user_idx")
    val m = RankingEval.evaluate(pairs, 10)
    assert(m.precisionAtK > 0.5, s"P@10 = ${m.precisionAtK}")
    trainIdx.unpersist()
  }
}
