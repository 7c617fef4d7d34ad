package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sketch buffer: parallel key/count arrays (product-encodable, like
  * eval.RankingBuf) holding at most k counters.
  */
final case class MgBuf(keys: Seq[String], counts: Seq[Long], n: Long)

final case class MgItem(term: String, est: Long)

/** Misra-Gries heavy hitters — the third member of the mergeable-sketch
  * family beside a17's HLL (distinct counts) and a18's DDSketch
  * (quantiles): "which items dominate this stream" in k counters, no
  * global sort, no full frequency table.
  *
  * Classic guarantee (Misra & Gries 1982): with k counters over n items,
  * every estimate UNDERCOUNTS by at most n/(k+1), so any item with true
  * frequency above n/(k+1) is guaranteed to survive. The merge rule —
  * add counters pointwise, then subtract the (k+1)-th largest count and
  * drop non-positive entries — preserves exactly that bound across
  * partials (Agarwal et al., "Mergeable Summaries", PODS 2012), which is
  * what makes this a shuffle-kilobytes partial aggregate at 100 TB: each
  * partition summarizes locally, the exchange carries k counters per
  * group, and the driver never sees a raw term.
  *
  * Estimates depend on arrival order within a partition (inherent to MG),
  * so outputs are deterministic per (data, partitioning) — same contract
  * as w11's ordered fold — and the registered query is rows-only with
  * in-row exact-count evidence. Ties trim deterministically by
  * (count desc, term asc).
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, MgBuf, Seq[MgItem]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: MgBuf = MgBuf(Nil, Nil, 0L)

  override def reduce(b: MgBuf, term: String): MgBuf = {
    val m = scala.collection.mutable.LinkedHashMap.from(b.keys.zip(b.counts))
    if (m.contains(term)) m(term) += 1L
    else if (m.size < k) m(term) = 1L
    else {
      // decrement step: every counter loses 1 (the arriving item's count
      // cancels against them); zeros evict
      val dead = Seq.newBuilder[String]
      m.mapValuesInPlace((_, c) => c - 1L)
      m.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.result().foreach(m.remove)
    }
    MgBuf(m.keys.toSeq, m.values.toSeq, b.n + 1)
  }

  override def merge(a: MgBuf, b: MgBuf): MgBuf = {
    val m = scala.collection.mutable.Map.from(a.keys.zip(a.counts))
    b.keys.zip(b.counts).foreach { case (t, c) =>
      m(t) = m.getOrElse(t, 0L) + c
    }
    val trimmed =
      if (m.size <= k) m.toSeq
      else {
        val sorted = m.toSeq.sortBy { case (t, c) => (-c, t) }
        val cut = sorted(k)._2 // (k+1)-th largest count
        sorted.map { case (t, c) => (t, c - cut) }.filter(_._2 > 0L)
      }
    MgBuf(trimmed.map(_._1), trimmed.map(_._2), a.n + b.n)
  }

  override def finish(b: MgBuf): Seq[MgItem] =
    b.keys.zip(b.counts).map { case (t, c) => MgItem(t, c) }
      .sortBy(i => (-i.est, i.term))

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Seq[MgItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
