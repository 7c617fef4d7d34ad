package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: points p joined to every interval
  * [lo, hi) containing them.
  *
  * Spark plans a raw inequality join as BroadcastNestedLoop (fine only
  * while the interval side broadcasts) or a cartesian product. The scale
  * path here: intervals are EXPLODED to the fixed-width buckets they
  * overlap, points hash to their single bucket, and the join becomes an
  * equi-join on the bucket id refined by the exact predicate. Each point
  * meets only the intervals overlapping its bucket — cost is
  * |P| + sum(interval_width/bucket_width), never |P| x |R|. A point
  * matches each containing interval exactly once (its bucket is unique).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(!points.columns.contains("_b") && !intervals.columns.contains("_b"),
      "inputs must not carry the reserved column _b")
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    // floor(hi/w) can emit one bucket the (hi-exclusive) interval never
    // reaches when hi lies exactly on a bucket edge — the exact filter
    // below discards it, and each point still matches each containing
    // interval exactly once (its bucket is unique). An epsilon-nudged
    // bound would be worse: it drops real matches within eps of hi and
    // is a floating-point no-op once |hi| is large.
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    // inverted (lo > hi) or null-bounded intervals contain no point; they
    // must expand to an EMPTY bucket list — sequence() with start > stop
    // counts DOWN (step -1), which would silently explode a corrupted row
    // into |lo-hi| buckets
    val bucketed = intervals.withColumn("_b",
      explode(when(loB <= hiB, sequence(loB, hiB))
        .otherwise(array().cast("array<long>"))))
    points.withColumn("_b", floor(col(pointCol) / bucketWidth).cast("long"))
      .join(bucketed, Seq("_b"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_b")
  }
}
