package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter build/probe over a column — the membership primitive that
  * replaces a shuffle join when one side is a SET that fits in a sketch
  * but not in an equi-join you want to pay for: benchmark-contamination
  * gates, URL blocklists, already-ingested-id checks. Spark uses exactly
  * this pair of expressions for its own runtime join filtering
  * (InjectRuntimeFilter); here they are exposed as library calls so a
  * pipeline can build the sketch once and probe it from any later job.
  *
  * Scale shape: the build is a distributed partial-combining aggregate
  * (each partition fills a local sketch, merge is bitwise-OR) and the ONLY
  * driver-side object is the fixed-size bit array — never the member set.
  * The probe ships those bytes to executors in the task binary and
  * evaluates as a codegen'd predicate: zero shuffle, zero join, map-side.
  * Semantics: no false negatives ever; false-positive rate set by
  * bits-per-item (~1% at n*9.6 bits). Build and probe MUST hash the same
  * way — both sides here go through xxhash64 (seed 42, the SQL function's
  * default), which is also what BloomFilterAggregate expects as input.
  */
object Bloom {

  /** Aggregate `c` (hashed to 64-bit) from every row of `df` into one
    * bloom sketch sized `numBits`; returns the serialized sketch.
    *
    * BloomFilterAggregate silently CLAMPS its arguments to the session's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` / `.maxNumBits`
    * (defaults 4M items / 64M bits ≈ 8 MB): a caller who computed numBits
    * via [[optimalNumBits]] for a larger set would get a sketch with a
    * silently worse FP rate than requested. Refuse instead — the fix is a
    * one-line session conf raise, and an explicit error beats a quietly
    * contaminated training set.
    */
  def build(df: DataFrame, c: Column, expectedItems: Long, numBits: Long)
      : Array[Byte] = {
    val conf = df.sparkSession.conf
    val maxItems = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "4000000").toLong
    val maxBits = conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "67108864").toLong
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"requested sketch ($expectedItems items / $numBits bits) exceeds the " +
        s"session cap ($maxItems items / $maxBits bits) and WOULD BE SILENTLY " +
        "CLAMPED to a worse FP rate; raise " +
        "spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits first")
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(GraftBridge.expression(c))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = df.select(GraftBridge.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bytes != null) bytes
    else {
      // zero input rows: Spark's aggregate yields null, but an EMPTY set's
      // sketch must probe false (not null) for every value — "empty
      // benchmark, nothing contaminated" has to hold without the caller
      // special-casing it
      val out = new java.io.ByteArrayOutputStream()
      org.apache.spark.util.sketch.BloomFilter.create(1).writeTo(out)
      out.toByteArray
    }
  }

  /** Bits for a target false-positive rate (spark-sketch's own formula). */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)

  /** Codegen'd membership predicate against a sketch from [[build]]. */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    GraftBridge.column(new BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(GraftBridge.expression(c)))))
}
