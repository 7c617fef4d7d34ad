package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("same-bucketed fact-fact join plans with no shuffle exchange") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, sfDir)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "b_orders", "l_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast join path so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")

      // and it returns the same rows as the plain shuffled join
      val plain = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, sfDir)
          .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
          Seq("l_orderkey"))
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
