package graft

import org.apache.spark.sql.SparkSession

/** Scratch-directory resolution for queries that materialize intermediates
  * (IO round-trips, the d5 shingle table, d7 checkpoints, saved ML models).
  *
  * The location is a session conf — `spark.graft.scratchDir` — so the query
  * modules carry no absolute paths and a deployment points it at job-local
  * or HDFS/object-store scratch space. The default is the fastest local
  * ephemeral storage (tmpfs): scratch content is per-run intermediates by
  * contract, and this host's disk serves synced small writes at single-digit
  * MB/s (see BENCH_NOTES.md) — measuring the engine, not a degrading
  * virtual device, requires keeping ephemera off it. On a cluster, set the
  * conf to executor-local NVMe or the job's object-store staging prefix.
  */
object Scratch {
  val ConfKey = "spark.graft.scratchDir"
  val Default = "/dev/shm/graft_qtmp"

  def dir(spark: SparkSession, name: String): String =
    s"${spark.conf.get(ConfKey, Default)}/$name"
}
