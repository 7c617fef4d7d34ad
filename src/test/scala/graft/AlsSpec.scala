package graft

import graft.eval.RankingEval
import graft.model.{AlsConfig, AlsTrainer}

/** Golden end-to-end for the ALS slice (the CORRECTNESS equivalent for the
  * non-SQL-expressible model path): fixed-seed fixture with planted block
  * structure -> train -> recommendForUserSubset -> metrics. Mirrors
  * one_train.py:29-54 end to end.
  */
class AlsSpec extends SparkSpec {

  // 20 users x 15 items; user u repeatedly plays items with
  // item % 5 == u % 5 (3 structural items each) plus one noise item.
  private lazy val ratings = {
    val s = spark
    import s.implicits._
    val rows = for {
      u <- 0 until 20
      i <- 0 until 15
      if i % 5 == u % 5 || (u * 7 + i) % 31 == 0
    } yield (u, i, if (i % 5 == u % 5) 5f else 1f)
    rows.toDF("user_idx", "item_idx", "count")
  }

  private val cfg = AlsConfig(rank = 4, regParam = 0.05, alpha = 10.0,
    maxIter = 5, userBlocks = 2, itemBlocks = 2)

  test("implicit ALS recovers planted structure (P@3 well above chance)") {
    val model = AlsTrainer.fit(ratings, cfg)
    val users = ratings.select("user_idx").distinct()
    val recs = AlsTrainer.recommendLists(model, users, 3)
    val truth = RankingEval.truthLists(
      ratings.filter("count > 1"), "user_idx", "item_idx")
    val pairs = RankingEval.pairs(recs, truth, "user_idx")
    val m = RankingEval.evaluate(pairs, 3)
    assert(m.users == 20)
    // 3 structural items of 15: random P@3 = 0.2; planted structure must
    // push it far above that.
    assert(m.precisionAtK > 0.6, s"P@3 = ${m.precisionAtK}")
    assert(m.meanAveragePrecision > 0.5, s"MAP = ${m.meanAveragePrecision}")
  }

  test("Aggregator and mllib agree on ALS outputs; same seed reproduces") {
    val model = AlsTrainer.fit(ratings, cfg)
    val users = ratings.select("user_idx").distinct()
    val recs = AlsTrainer.recommendLists(model, users, 3).cache()
    val truth = RankingEval.truthLists(
      ratings.filter("count > 1"), "user_idx", "item_idx")
    val pairs = RankingEval.pairs(recs, truth, "user_idx").cache()
    val ours = RankingEval.evaluate(pairs, 3)
    val ref = RankingEval.evaluateMllib(pairs, 3)
    assert(math.abs(ours.precisionAtK - ref.precisionAtK) < 1e-12)
    assert(math.abs(ours.meanAveragePrecision - ref.meanAveragePrecision) < 1e-12)

    val model2 = AlsTrainer.fit(ratings, cfg)
    val recs2 = AlsTrainer.recommendLists(model2, users, 3)
    assert(recs.orderBy("user_idx").collect().toSeq
      == recs2.orderBy("user_idx").collect().toSeq)
  }

  test("transform scores + RMSE run with coldStartStrategy=drop") {
    val model = AlsTrainer.fit(ratings, cfg)
    val scored = AlsTrainer.scores(model, ratings)
    val rmse = RankingEval.rmse(scored, "count", "prediction")
    assert(!rmse.isNaN && rmse > 0.0)
    // unseen user is dropped, not NaN (SURVEY §7.3 hazard 4)
    val s = spark
    import s.implicits._
    val unseen = Seq((999, 0, 1f)).toDF("user_idx", "item_idx", "count")
    assert(AlsTrainer.scores(model, unseen).count() == 0)
  }

  test("m11: coverage/novelty rollup obeys its structural laws") {
    val row = SparkEntry.queries("m11_rec_coverage")(spark, sfDir).head()
    val nUsers = row.getAs[Long]("n_users")
    val nPairs = row.getAs[Long]("n_pairs")
    val nItems = row.getAs[Long]("n_distinct_items")
    val catalog = row.getAs[Long]("catalog")
    val coverage = row.getAs[Long]("coverage_x1e4")
    val novelty = row.getAs[Long]("mean_novelty_x1000")
    assert(nUsers > 0 && nPairs == nUsers * 5,
      s"every user must get exactly 5 recs: users=$nUsers pairs=$nPairs")
    assert(nItems > 0 && nItems <= catalog,
      "recommended-distinct cannot exceed the catalog")
    assert(coverage == nItems * 10000 / catalog)
    assert(coverage > 0 && coverage <= 10000)
    // self-information class of an interaction share is >= 0 and bounded
    // by the class of the rarest possible item (share 1/total)
    assert(novelty >= 0 && novelty <= 64000)
  }
}
