package graft

import graft.meta.GenrePipeline

class GenrePipelineSpec extends SparkSpec {

  test("dominant tag: argmax with ties broken by global popularity rank") {
    val s = spark
    import s.implicits._
    // u1: a and b tied at 5.0 — a is carried by both users, b only by u1,
    // so the popularity tie-break picks a (the reference's select_genre rule)
    val df = Seq(
      ("u1", "a", 5.0), ("u1", "b", 5.0), ("u1", "c", 1.0),
      ("u2", "a", 2.0), ("u2", "c", 7.0)
    ).toDF("user_id", "tag", "value")
    val out = GenrePipeline.dominant(df, "user_id", "tag", "value")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("u1") == ("a", 500L))
    assert(out("u2") == ("c", 700L))
  }

  test("tag popularity rank counts carrying keys, ties alphabetical") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("u1", "x", 1.0), ("u2", "x", 1.0), ("u1", "y", 1.0), ("u2", "z", 1.0)
    ).toDF("user_id", "tag", "value")
    val maps = GenrePipeline.tagMap(
      GenrePipeline.tagScores(df, "user_id", "tag", "value"), "user_id", "tag")
    val ranks = GenrePipeline.tagRank(maps)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(ranks("x") == 1L) // carried by 2 keys
    assert(ranks("y") == 2L && ranks("z") == 3L) // tie -> alphabetical
  }
}
