package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, UserEvent}

class EventStreamSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(3600_000L * 24 + minute * 60_000L)

  private val fixture = Seq(
    UserEvent(1L, "click", ts(5), 1.0),
    UserEvent(2L, "click", ts(20), 2.0),
    UserEvent(1L, "view", ts(65), 3.0),
    UserEvent(2L, "click", ts(70), 4.0),
    UserEvent(1L, "click", ts(130), 5.0))

  test("streaming windowed counts equal the batch aggregation (same logic)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = EventStream.streamingTypeCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val streamed = s.table("win_counts")
        .orderBy("win_start", "event_type").collect().toSeq
      val batch = EventStream.tumblingTypeCounts(fixture.toDF(), "1 hour")
        .orderBy("win_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.size == 4) // (h0 click n=2), (h1 click), (h1 view), (h2 click)
    } finally q.stop()
  }

  test("flatMapGroupsWithState closes sessions on gap jump and on watermark timeout") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = EventStream.closedSessions(mem.toDS(), gapMs = 30 * 60_000L,
      watermarkDelay = "10 minutes")
      .writeStream.format("memory").queryName("closed_sessions")
      .outputMode("append").start()
    try {
      // session A: u1 at min 0 and 5
      mem.addData(UserEvent(1L, "click", ts(0), 1.0), UserEvent(1L, "click", ts(5), 2.0))
      q.processAllAvailable()
      assert(s.table("closed_sessions").count() == 0) // still open

      // min 60 jumps the 30-min gap: session A closes in-batch
      mem.addData(UserEvent(1L, "view", ts(60), 3.0))
      q.processAllAvailable()
      val afterJump = s.table("closed_sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60_000, r.getLong(2)))
      assert(afterJump.toSeq == Seq((1L, 24 * 60 + 0, 2L)))

      // u2 far in the future advances the watermark past u1's open session
      // (60 + 30 gap = 90 < watermark 170): event-time timeout closes it
      mem.addData(UserEvent(2L, "click", ts(180), 9.0))
      q.processAllAvailable()
      mem.addData(UserEvent(2L, "click", ts(181), 1.0))
      q.processAllAvailable()
      val users = s.table("closed_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(users.contains((1L, 1L)), s"timeout session missing: ${users.mkString(",")}")
    } finally q.stop()
  }

  test("streaming dedup drops redelivered events across micro-batches " +
      "(== batch dropDuplicates)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val keys = Seq("user_id", "event_type", "ts")
    val mem = MemoryStream[UserEvent]
    val q = EventStream.dedupedStream(mem.toDF(), "1 hour", keys)
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      mem.addData(fixture(1), fixture(3)) // redelivery in a later micro-batch
      q.processAllAvailable()
      val streamed = s.table("deduped").orderBy("ts", "user_id").collect().toSeq
      val batch = (fixture ++ Seq(fixture(1), fixture(3))).toDF()
        .dropDuplicates(keys).orderBy("ts", "user_id").collect().toSeq
      assert(streamed == batch)
      assert(streamed.size == fixture.size) // the 2 redeliveries are gone
    } finally q.stop()
  }

  test("stream-static join enriches each micro-batch from a broadcast dimension") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val mem = MemoryStream[UserEvent]
    val q = EventStream.enrichedStream(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(fixture: _*)
      q.processAllAvailable()
      val tiers = s.table("enriched").select("user_id", "tier")
        .distinct().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(tiers == Map(1L -> "gold", 2L -> "basic"))
      assert(s.table("enriched").count() == fixture.size)
    } finally q.stop()
  }

  test("late in-watermark events widen the open session instead of " +
      "dragging last_ms backwards; far-late events become their own session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[UserEvent]
    // generous watermark so the late events are NOT dropped, 30-min gap
    val q = EventStream.closedSessions(mem.toDS(), gapMs = 30 * 60_000L,
      watermarkDelay = "3 hours")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      mem.addData(UserEvent(1L, "click", ts(60), 1.0), UserEvent(1L, "click", ts(65), 2.0))
      q.processAllAvailable()
      // batch 2, out of order: min 10 is >gap before the session (own
      // closed session); min 50 is within the gap BEFORE start (merges,
      // start moves back to 50, last stays 65)
      mem.addData(UserEvent(1L, "view", ts(10), 4.0), UserEvent(1L, "view", ts(50), 8.0))
      q.processAllAvailable()
      val early = s.table("late_sessions")
        .collect().map(r => (r.getTimestamp(1).getTime / 60_000 - 24 * 60, r.getLong(2), r.getDouble(3)))
      assert(early.toSet == Set((10L, 1L, 4.0)), s"got: ${early.mkString(",")}")
      // min 120 jumps the gap from last=65: the widened session closes
      mem.addData(UserEvent(1L, "click", ts(120), 16.0))
      q.processAllAvailable()
      val all = s.table("late_sessions")
        .collect().map(r => (r.getTimestamp(1).getTime / 60_000 - 24 * 60, r.getLong(2), r.getDouble(3)))
      assert(all.toSet == Set((10L, 1L, 4.0), (50L, 3L, 11.0)),
        s"widened session wrong: ${all.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to prior clicks " +
      "(== the batch interval join)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val clicks = Seq(
      UserEvent(1L, "click", ts(0), 10.0),   // -> purchase @15 (within 30 min)
      UserEvent(1L, "click", ts(10), 11.0),  // -> purchase @15 too (both match)
      UserEvent(2L, "click", ts(5), 12.0),   // no purchase for u2 in window
      UserEvent(1L, "click", ts(100), 13.0)) // purchase @15 is BEFORE it: no pair
    val purchases = Seq(
      UserEvent(1L, "purchase", ts(15), 99.0),
      UserEvent(2L, "purchase", ts(50), 42.0)) // 45 min after u2's click: outside
    val cMem = MemoryStream[UserEvent]
    val pMem = MemoryStream[UserEvent]
    val cDf = cMem.toDF().withColumn("event_id",
      concat(col("user_id"), lit("_"), col("value")))
    val pDf = pMem.toDF().withColumn("event_id",
      concat(col("user_id"), lit("_"), col("value")))
    val q = EventStream.attributedPurchases(cDf, pDf, "10 minutes", 30 * 60L)
      .writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      cMem.addData(clicks: _*)
      pMem.addData(purchases: _*)
      q.processAllAvailable()
      val streamed = s.table("attributed")
        .select("user_id", "click_id", "purchase_id")
        .orderBy("user_id", "click_id").collect().toSeq
      val batch = EventStream.attributedPurchases(
          clicks.toDF().withColumn("event_id",
            concat(col("user_id"), lit("_"), col("value"))),
          purchases.toDF().withColumn("event_id",
            concat(col("user_id"), lit("_"), col("value"))),
          "10 minutes", 30 * 60L)
        .select("user_id", "click_id", "purchase_id")
        .orderBy("user_id", "click_id").collect().toSeq
      assert(streamed == batch)
      // exactly u1's two in-window clicks pair with the one purchase
      assert(streamed.map(r => (r.getLong(0), r.getString(1))).toSet
        == Set((1L, "1_10.0"), (1L, "1_11.0")))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user totals across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = EventStream.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("user_totals")
      .outputMode("update").start()
    try {
      mem.addData(fixture.take(2): _*)
      q.processAllAvailable()
      mem.addData(fixture.drop(2): _*)
      q.processAllAvailable()
      // last update per user reflects ALL events seen (state carried over)
      val last = s.table("user_totals")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("t"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(last(1L) == ((3L, 9.0)))
      assert(last(2L) == ((2L, 6.0)))
    } finally q.stop()
  }

  test("streaming EWMA equals the batch fold over any stream prefix") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[UserEvent]
    val q = EventStream.runningEwma(mem.toDS(), alpha = 0.2)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("update").start()
    try {
      // split MID-USER so state must carry the recurrence across batches
      mem.addData(fixture.take(3): _*)
      q.processAllAvailable()
      mem.addData(fixture.drop(3): _*)
      q.processAllAvailable()
      val last = s.table("ewma_out")
        .groupBy("user_id").agg(max("n_events").as("n"), max_by(col("ewma"), col("n_events")).as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .map(t => t._1 -> (t._2, t._3)).toMap
      // batch-fold references, seeded with the first value:
      // user 1: 1.0 -> .8*1+.2*3 = 1.4 -> .8*1.4+.2*5 = 2.12
      // user 2: 2.0 -> .8*2+.2*4 = 2.4
      assert(last(1L)._1 == 3L && math.abs(last(1L)._2 - 2.12) < 1e-12)
      assert(last(2L)._1 == 2L && math.abs(last(2L)._2 - 2.4) < 1e-12)
      // parity with the registered batch expression over the same rows
      val batch = fixture.toDF()
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"ts", $"value"))).as("xs"))
        .select($"user_id", aggregate(
          transform($"xs", x => x.getField("value")),
          lit(null).cast("double"),
          (acc, x) => coalesce(acc * lit(0.8) + lit(0.2) * x, x)).as("e"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(math.abs(batch(1L) - last(1L)._2) < 1e-12)
      assert(math.abs(batch(2L) - last(2L)._2) < 1e-12)
    } finally q.stop()
  }
}
