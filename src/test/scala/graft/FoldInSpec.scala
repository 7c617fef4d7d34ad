package graft

import org.apache.spark.sql.functions._
import graft.model.{AlsConfig, AlsTrainer, FoldIn}

/** The fold-in operator's correctness weight: folding in a user the model
  * ALREADY trained on must reproduce that user's trained factor (ALS's
  * user half-step solves the same normal equations the closed form
  * states), and the folded factors must SERVE — ranking items for a
  * folded user agrees with the model's own recommendations.
  */
class FoldInSpec extends SparkSpec {

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
    maxIter = 10, userBlocks = 2, itemBlocks = 2)

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("folding in trained users reproduces their trained factors") {
    val s = spark
    import s.implicits._
    val model = AlsTrainer.fit(ratings, cfg)
    val folded = FoldIn.userFactors(model, ratings, cfg.alpha, cfg.regParam)
      .as[(Int, Array[Double])].collect().toMap
    val trained = model.userFactors
      .select(col("id"), col("features"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    assert(folded.keySet == trained.keySet)
    val cosines = trained.map { case (u, tf) => cosine(tf, folded(u)) }
    val median = cosines.toSeq.sorted.apply(cosines.size / 2)
    assert(median > 0.98,
      s"median trained-vs-folded cosine $median (all: ${cosines.toSeq.sorted.take(3)}...)")
    assert(cosines.forall(_ > 0.9),
      s"worst cosine ${cosines.min} below floor")
  }

  test("folded factors serve: top-3 by dot product matches model recs") {
    val s = spark
    import s.implicits._
    val model = AlsTrainer.fit(ratings, cfg)
    val items = model.itemFactors.collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val folded = FoldIn.userFactors(model, ratings, cfg.alpha, cfg.regParam)
      .as[(Int, Array[Double])].collect().toMap
    val modelRecs = AlsTrainer
      .recommendLists(model, ratings.select("user_idx").distinct(), 3)
      .as[(Int, Array[Int])].collect().toMap
    val overlaps = modelRecs.map { case (u, recs) =>
      val mine = items.map { case (i, y) =>
        i -> folded(u).zip(y).map { case (a, b) => a * b }.sum
      }.sortBy { case (i, sc) => (-sc, i) }.take(3).map(_._1).toSet
      (recs.toSet intersect mine).size
    }
    val meanOverlap = overlaps.sum.toDouble / overlaps.size
    assert(meanOverlap >= 2.5, s"mean top-3 overlap $meanOverlap of 3")
  }

  test("a genuinely NEW user folds in toward its taste cluster") {
    val s = spark
    import s.implicits._
    val model = AlsTrainer.fit(ratings, cfg)
    // new user 999 behaves like the u%5==2 cluster
    val newU = Seq((999, 2, 5f), (999, 7, 5f), (999, 12, 5f))
      .toDF("user_idx", "item_idx", "count")
    val folded = FoldIn.userFactors(model, newU, cfg.alpha, cfg.regParam)
      .as[(Int, Array[Double])].collect().toMap
    val twin = model.userFactors.filter(col("id") === 2)
      .collect().head.getSeq[Float](1).map(_.toDouble).toArray
    assert(cosine(folded(999), twin) > 0.9,
      "new user's folded factor should align with its taste twin")
  }
}
