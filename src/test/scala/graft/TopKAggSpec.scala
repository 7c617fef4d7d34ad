package graft

import org.apache.spark.sql.functions._
import graft.operators.{ScoredId, TopKAgg}

/** operators/TopK — the bounded-buffer semantics directly (the w9 oracle
  * row covers the end-to-end query; this pins the buffer algebra the
  * partial/final split depends on).
  */
class TopKAggSpec extends SparkSpec {

  private val agg = new TopKAgg(3)

  test("reduce keeps at most k, ordered by (score desc, id asc)") {
    val buf = Seq(5.0 -> 1L, 4.0 -> 2L, 3.0 -> 3L, 6.0 -> 4L, 3.0 -> 0L)
      .foldLeft(agg.zero) { case (b, (s, i)) => agg.reduce(b, ScoredId(s, i)) }
    assert(buf == Seq(ScoredId(6.0, 4L), ScoredId(5.0, 1L), ScoredId(4.0, 2L)))
  }

  test("reduce fast-path: a row worse than the current k-th is a no-op") {
    val full = agg.merge(agg.zero,
      Seq(ScoredId(9.0, 1), ScoredId(8.0, 2), ScoredId(7.0, 3)))
    assert(agg.reduce(full, ScoredId(1.0, 99)) eq full)
  }

  test("merge of partial buffers equals aggregating the union") {
    val xs = (1 to 20).map(i => ScoredId((i * 7 % 13).toDouble, i.toLong))
    val (a, b) = xs.splitAt(9)
    val viaMerge = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    val direct = xs.foldLeft(agg.zero)(agg.reduce)
    assert(viaMerge == direct)
  }

  test("ties on score resolve by ascending id — identical to the window") {
    val buf = Seq(ScoredId(2.0, 5), ScoredId(2.0, 1), ScoredId(2.0, 3),
      ScoredId(2.0, 2)).foldLeft(agg.zero)(agg.reduce)
    assert(buf.map(_.id) == Seq(1L, 2L, 3L))
  }

  test("w9 equals w2 row-for-row (aggregator == rank window)") {
    val a = SparkEntry.queries("w9_topk_agg")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("w2_topk_per_key")(spark, sfDir).collect().toSeq
    assert(a == b)
  }
}
