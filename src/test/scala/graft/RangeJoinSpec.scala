package graft

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals the naive inequality join, incl. overlaps") {
    val s = spark
    import s.implicits._
    val points = Seq(1L -> 0.0, 2L -> 4.999, 3L -> 5.0, 4L -> 9.99,
      5L -> 10.0, 6L -> 14.3, 7L -> 99.0).toDF("id", "p")
    val ivs = Seq(("a", 0.0, 5.0), ("b", 5.0, 10.0), ("c", 10.0, 15.0),
      ("wide", 2.0, 12.0)).toDF("k", "lo", "hi")

    val got = RangeJoin.pointInInterval(points, ivs, "p", "lo", "hi", 3.0)
      .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val naive = points.join(ivs,
      points("p") >= ivs("lo") && points("p") < ivs("hi"))
      .select("id", "k").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == naive)
    // boundary: hi exclusive, lo inclusive; overlapping intervals both match
    assert(got.contains((3L, "b")) && !got.contains((2L, "b")))
    assert(got.filter(_._1 == 5L).map(_._2) == Set("c", "wide")) // 10.0 in both
    assert(got.filter(_._1 == 7L).isEmpty) // 99.0 beyond every interval
  }
}
