package graft

import org.apache.spark.sql.SparkSession

/** Scratch-directory resolution for queries that materialize intermediates
  * (IO round-trips, the d5 shingle table, d7 checkpoints, saved ML models).
  *
  * The location is a session conf — `spark.graft.scratchDir` — so the query
  * modules carry no absolute paths and a deployment points it at job-local
  * or HDFS/object-store scratch space. The default preserves this repo's
  * historical layout (everything under target/, which the build cleans).
  */
object Scratch {
  val ConfKey = "spark.graft.scratchDir"
  val Default = "/root/repo/target/qtmp"

  def dir(spark: SparkSession, name: String): String =
    s"${spark.conf.get(ConfKey, Default)}/$name"
}
