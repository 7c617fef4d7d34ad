package graft.operators

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Bounded per-key top-k as a typed Aggregator — the scale-path
  * alternative to the rank-window form (w2): a window partitioned by key
  * shuffles and sorts EVERY row of every key before the rn<=k filter can
  * drop anything, so the exchange carries the full table. This aggregator
  * keeps at most k (score, id) pairs per key per map partition and merges
  * bounded buffers, so partial aggregation prunes BEFORE the shuffle —
  * the exchange carries <= k rows per (key x map partition) regardless of
  * how many rows a key has. At 100 TB with k=500 that is the difference
  * between shuffling the corpus and shuffling a capped candidate list.
  *
  * Ladder note (SURVEY §7): this is tier (b) — a typed Aggregator/
  * TypedColumn — chosen over a custom LogicalPlan+SparkPlan because
  * Spark's ObjectHashAggregate already gives the partial/final machinery,
  * spill handling, and codegen boundary for free; only the per-key state
  * (a bounded buffer) is custom.
  *
  * Determinism: ties break on ascending id after descending score — a
  * total order, so results are identical to the window form row-for-row.
  */
final case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  // buffers stay sorted and <= k long at every step; k is query-sized so
  // sort-and-trim per update is O(k log k) on tiny arrays (a binary heap
  // saves nothing at these sizes and loses the sorted-merge property)
  private def trim(xs: Seq[ScoredId]): Seq[ScoredId] = xs.sorted(ord).take(k)

  override def zero: Seq[ScoredId] = Vector.empty
  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.length == k && ord.gteq(x, buf.last)) buf else trim(buf :+ x)
  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    trim(a ++ b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder = ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder = ExpressionEncoder[Seq[ScoredId]]()
}

object TopK {
  /** DataFrame-facing UDAF: `topK(5)(col("value"), col("event_id"))`
    * aggregates to `array<struct<score, id>>`, already in rank order.
    */
  def topK(k: Int): UserDefinedFunction = udaf(new TopKAgg(k))
}
