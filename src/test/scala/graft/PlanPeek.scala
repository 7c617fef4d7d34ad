package graft

/** Dev-loop plan dumper: prints the executed plan of the named queries
  * at sf0.001 so PlanSpec pins can be written against the REAL text.
  *   sbt "Test/runMain graft.PlanPeek b10_tpch_q19 w20_ohlc_candles"
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("8")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"========== $name ==========")
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
