package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DDSketch — a fully-mergeable quantile sketch with relative-error
  * guarantees (Masson, Rim & Lee, VLDB 2019). Positive values map to
  * geometric buckets i = ceil(log_gamma(x)); the sketch state is the tiny
  * (key, bucket) -> count table, merging two sketches is vector addition
  * (a groupBy-sum — the same associative-merge property u4 relies on),
  * and a q-quantile read-off returns the midpoint of the bucket holding
  * rank ceil(q*n), which is within alpha = (gamma-1)/(gamma+1) RELATIVE
  * error of the true order statistic.
  *
  * Why this sketch at 100 TB: the state is O(log(max/min)/log(gamma))
  * buckets per key (~550 for gamma=1.02 over a 0.01..500 domain) — it
  * partial-aggregates map-side, ships kilobytes through the shuffle, and
  * two corpus halves sketched independently merge into EXACTLY the sketch
  * of the union (DdSketchSpec pins that as an equality law, not an
  * approximation). The companion of a17's HLL (distinct counts) for the
  * quantile column of the warehouse: percentile dashboards, SLO burn,
  * per-cohort latency — anything that cannot afford a global sort.
  *
  * All read-off arithmetic (ln, pow) runs on identical inputs in any
  * engine but buckets near a boundary can flip on the last ulp of ln() —
  * which is why the registered query (a18) is rows-only with in-row error
  * evidence instead of a DuckDB hash oracle (see DecisionAudit).
  */
object DdSketch {

  /** Geometric bucket index for a positive value. */
  def bucket(value: Column, gamma: Double): Column =
    ceil(log(value) / math.log(gamma)).cast("long")

  /** Sketch a frame: per (keys, bucket) counts. Non-positive values are
    * outside the relative-error contract and are dropped; callers that
    * need them track a zero-count beside the sketch.
    */
  def sketch(df: DataFrame, keys: Seq[String], valueCol: String,
      gamma: Double): DataFrame =
    df.filter(col(valueCol) > 0)
      .groupBy((keys.map(col) :+ bucket(col(valueCol), gamma).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge sketches: vector addition of bucket counts. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Quantile read-off: for each requested q, the midpoint
    * 2*gamma^b/(gamma+1) of the smallest bucket whose cumulative count
    * reaches rank ceil(q*n). The per-key window is bounded by the bucket
    * count (hundreds), never the data size.
    */
  def quantiles(sk: DataFrame, keys: Seq[String], gamma: Double,
      qs: Seq[Double]): DataFrame = {
    val keyCols = keys.map(col)
    val wCum = Window.partitionBy(keyCols: _*).orderBy(col("bucket"))
    val wAll = Window.partitionBy(keyCols: _*)
    val cum = sk
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val spark = sk.sparkSession
    import spark.implicits._
    val qdf = qs.toDF("q")
    cum.crossJoin(broadcast(qdf))
      .filter(col("cum") >= ceil(col("q") * col("n")))
      .groupBy((keyCols :+ col("q")): _*)
      .agg(min(col("bucket")).as("b"))
      .withColumn("estimate",
        lit(2.0) * pow(lit(gamma), col("b")) / lit(gamma + 1.0))
      .drop("b")
  }

  /** The sketch's relative-error guarantee for a given gamma. */
  def alpha(gamma: Double): Double = (gamma - 1.0) / (gamma + 1.0)
}
