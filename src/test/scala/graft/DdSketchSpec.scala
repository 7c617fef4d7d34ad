package graft

import org.apache.spark.sql.functions._
import graft.operators.DdSketch

/** DDSketch laws: the merge-EQUALITY property (two halves sketched
  * independently merge into exactly the sketch of the union — the whole
  * point of a mergeable sketch), the paper's relative-error guarantee on
  * planted data with a known distribution, and the registered a18 query's
  * self-evidencing `ok` column at sf0.001.
  */
class DdSketchSpec extends SparkSpec {
  import spark.implicits._

  private val gamma = 1.02
  private val keys = Seq("k")

  // deterministic planted data: two keys, geometric + linear value mixes
  private lazy val planted = (1 to 4000).map { i =>
    val v = if (i % 2 == 0) 0.01 * i else math.pow(1.01, i % 900) * 0.5
    (if (i % 3 == 0) "a" else "b", i.toLong, v)
  }.toDF("k", "id", "v")

  test("merge of independently-sketched halves equals the sketch of the union") {
    val full = DdSketch.sketch(planted, keys, "v", gamma)
    val merged = DdSketch.merge(
      DdSketch.sketch(planted.filter($"id" % 2 === 0), keys, "v", gamma),
      DdSketch.sketch(planted.filter($"id" % 2 === 1), keys, "v", gamma),
      keys)
    val l = full.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val r = merged.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(l == r, "merged sketch differs from union sketch")
  }

  test("quantile read-off is within alpha relative error of the true order statistic") {
    val sk = DdSketch.sketch(planted, keys, "v", gamma)
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val est = DdSketch.quantiles(sk, keys, gamma, qs).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byKey = planted.collect().map(r => (r.getString(0), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val bound = DdSketch.alpha(gamma) + 1e-9
    for ((k, vs) <- byKey; q <- qs) {
      // DDSketch read-off targets rank ceil(q*n) (1-based)
      val rank = math.max(1, math.ceil(q * vs.length).toInt)
      val truth = vs(rank - 1)
      val e = est((k, q))
      val rel = math.abs(e - truth) / truth
      assert(rel <= bound, s"key=$k q=$q est=$e true=$truth rel=$rel > $bound")
    }
  }

  test("bucket midpoint is within alpha of every value in the bucket") {
    val vals = Seq(0.01, 0.5, 1.0, 3.14159, 42.0, 499.99).toDF("v")
    val rows = vals.select(col("v"),
      DdSketch.bucket(col("v"), gamma).as("b")).collect()
    val bound = DdSketch.alpha(gamma) + 1e-9
    rows.foreach { r =>
      val v = r.getDouble(0); val b = r.getLong(1)
      val mid = 2.0 * math.pow(gamma, b.toDouble) / (gamma + 1.0)
      assert(math.abs(mid - v) / v <= bound,
        s"v=$v bucket=$b midpoint=$mid outside alpha")
    }
  }

  test("streaming sketch state equals the batch sketch of the same events") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.UserEvent]
    val events = (1 to 300).map { i =>
      graft.streaming.UserEvent(i % 7L,
        if (i % 2 == 0) "click" else "view",
        new java.sql.Timestamp(i * 60000L), 0.01 * i)
    }
    val q = graft.streaming.EventStream
      .streamingSketch(mem.toDF(), gamma)
      .writeStream.format("memory").queryName("dd_sketch")
      .outputMode("complete").start()
    try {
      // three micro-batches — the state must accumulate across them
      events.grouped(100).foreach { g =>
        mem.addData(g: _*); q.processAllAvailable()
      }
      val streamed = s.table("dd_sketch")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val batch = DdSketch.sketch(events.toDF(), Seq("event_type"), "value",
        gamma).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch, "drained stream sketch differs from batch sketch")
    } finally q.stop()
  }

  test("a18's self-evidencing ok column holds at sf0.001") {
    val out = SparkEntry.queries("a18_ddsketch_quantiles")(spark, sfDir)
      .collect()
    assert(out.nonEmpty)
    val bad = out.filter(r => r.getAs[Int]("ok") != 1)
    assert(bad.isEmpty,
      s"rows outside the error bound:\n${bad.mkString("\n")}")
  }
}
