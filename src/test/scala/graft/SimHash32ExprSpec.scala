package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class SimHash32ExprSpec extends SparkSpec {

  test("native simhash equals the HOF composition on real docs") {
    val df = Tables.documents(spark, sfDir)
      .select(simhashNative(col("text")).as("native"),
        simhash32(tokens(col("text"))).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.count() > 0)
  }
}
