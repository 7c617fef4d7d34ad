package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Int) = new Timestamp(m * 60_000L)

  test("hand fixture: latest prior right row, <= boundary, inner drop") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", ts(10)), // after r@5 -> 50
      (2L, "u1", ts(20)), // r@20 ties exactly -> 200 (<= includes equal)
      (3L, "u1", ts(25)), // still 200
      (4L, "u2", ts(9)),  // u2 has no right row at all -> dropped
      (5L, "u3", ts(1))   // before u3's only right row -> dropped
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", ts(5), 50), ("u1", ts(20), 200), ("u3", ts(2), 999)
    ).toDF("user_id", "ts", "v")

    val out = AsOfJoin.asOfInner(left, right, "user_id", "ts", Seq("v"))
      .select("event_id", "asof_v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 50, 2L -> 200, 3L -> 200))
  }

  test("rightCols carrying the ts column or the reserved _rts name are rejected") {
    val s = spark
    import s.implicits._
    val left = Seq(("u1", ts(10), 1L)).toDF("user_id", "ts", "event_id")
    val right = Seq(("u1", ts(5), 50)).toDF("user_id", "ts", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfInner(left, right, "user_id", "ts", Seq("v", "ts"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfInner(left, right.withColumnRenamed("v", "_rts"),
        "user_id", "ts", Seq("_rts"))
    }
  }

  test("tolerance: matches at the gap bound are kept, older ones dropped") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "u1", ts(10)), // r@5, gap 5 min == tolerance -> kept (inclusive)
      (2L, "u1", ts(30)), // latest r@20, gap 10 min > 5 -> dropped, NOT r@5
      (3L, "u1", ts(22))  // r@20, gap 2 min -> kept
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(("u1", ts(5), 50), ("u1", ts(20), 200))
      .toDF("user_id", "ts", "v")
    val out = AsOfJoin
      .asOfInnerWithin(left, right, "user_id", "ts", Seq("v"),
        maxGapSeconds = 5 * 60.0)
      .select("event_id", "asof_v").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 50, 3L -> 200))
  }

  test("plan shape: one shuffle on the key, no cartesian/range explosion") {
    val s = spark
    import s.implicits._
    val left = (1 to 100).map(i => (i.toLong, s"u${i % 5}", ts(i))).toDF("event_id", "user_id", "ts")
    val right = (1 to 50).map(i => (s"u${i % 5}", ts(i), i)).toDF("user_id", "ts", "v")
    val plan = AsOfJoin.asOfInner(left, right, "user_id", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
    assert(plan.contains("Window"))
  }
}
