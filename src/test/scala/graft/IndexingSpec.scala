package graft

import graft.prep.{Downsample, Indexing}
import org.apache.spark.sql.functions._

class IndexingSpec extends SparkSpec {

  private lazy val train = {
    val s = spark
    import s.implicits._
    Seq(("u1", "tA"), ("u1", "tB"), ("u2", "tA"), ("u2", "tA"), ("u3", "tC"))
      .toDF("user_id", "track_id")
  }

  test("frequencyDesc indexing with save/load round trip (M1/M2/S3)") {
    val model = Indexing.fitAndSave(train, "user_id", "track_id",
      "/root/repo/target/test-tmp/indexer")
    val out = model.transform(train)
    val userIdx = out.select("user_id", "user_id_idx").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // u1 and u2 both appear twice -> tie broken alphabetically; u3 last
    assert(userIdx("u1") == 0.0 && userIdx("u2") == 1.0 && userIdx("u3") == 2.0)
    val trackIdx = out.select("track_id", "track_id_idx").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(trackIdx("tA") == 0.0) // most frequent
  }

  test("handleInvalid=skip drops unseen labels at transform (implicit filter)") {
    val model = Indexing.fitAndSave(train, "user_id", "track_id",
      "/root/repo/target/test-tmp/indexer2")
    val s = spark
    import s.implicits._
    val withUnseen = Seq(("u1", "tA"), ("uNEW", "tA"), ("u1", "tNEW"))
      .toDF("user_id", "track_id")
    assert(model.transform(withUnseen).count() == 1)
  }

  test("distributed user algebra: train-only users and user-level sampling") {
    val s = spark
    import s.implicits._
    val tr = Seq("a", "b", "c", "d").flatMap(u => Seq((u, 1), (u, 2)))
      .toDF("user_id", "count")
    val va = Seq(("b", 1)).toDF("user_id", "count")
    val te = Seq(("c", 1)).toDF("user_id", "count")
    val only = Downsample.trainOnlyUsers(tr, va, te, "user_id")
      .collect().map(_.getString(0)).toSet
    assert(only == Set("a", "d"))

    val universe = only.toSeq.toDF("user_id")
    val sampled = Downsample.sampleByUser(tr, universe, "user_id", 0.5, 42L)
    // every kept user keeps ALL its interactions
    val counts = sampled.groupBy("user_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ == 2L))
    assert(counts.keySet.subsetOf(Set("a", "d")))
  }
}
