package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.{MgBuf, MgItem, MisraGriesAgg}

final case class TokenRec(source: String, pos: Long, term: String)
final case class SourceHeavyHitters(source: String, n: Long, terms: Seq[MgItem])

/** Streaming heavy hitters — the stream face of t17: a Misra-Gries sketch
  * per source key maintained across micro-batches with mapGroupsWithState.
  * The state IS the mergeable sketch (k counters + a count, kilobytes per
  * key, bounded by k — never by stream length), the same property that
  * makes a18's bucket table the right streaming quantile state. Each
  * micro-batch folds its tokens into the carried buffer with the EXACT
  * reduce the batch Aggregator runs, so a drained stream equals the batch
  * fold of the same token sequence — Misra-Gries is arrival-order-
  * dependent (inherent), so the parity contract is w11's: identical
  * per-key order in, identical sketch out. Within a micro-batch tokens
  * fold in `pos` order (the stable document position), mirroring
  * runningEwma's full-resolution sort — iterator order from shuffle is
  * not deterministic, the explicit sort is load-bearing.
  *
  * TokenStreamSpec pins stream==batch equality across a mid-stream batch
  * split and the classic undercount bound on the drained state.
  */
object TokenStream {

  def streamingHeavyHitters(tokens: Dataset[TokenRec],
      k: Int): Dataset[SourceHeavyHitters] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val agg = new MisraGriesAgg(k)
    tokens.groupByKey(_.source)
      .mapGroupsWithState[MgBuf, SourceHeavyHitters](
        GroupStateTimeout.NoTimeout) {
        case (src, batch, state: GroupState[MgBuf]) =>
          val next = batch.toSeq.sortBy(_.pos)
            .foldLeft(state.getOption.getOrElse(agg.zero)) {
              (b, t) => agg.reduce(b, t.term)
            }
          state.update(next)
          SourceHeavyHitters(src, next.n, agg.finish(next))
      }
  }
}
