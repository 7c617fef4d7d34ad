package graft

import org.apache.spark.sql.SparkSession

/** Scratch-directory resolution for queries that materialize intermediates
  * (IO round-trips, the d5 shingle table, d7 checkpoints, saved ML models).
  *
  * The location is a session conf — `spark.graft.scratchDir` — so the query
  * modules carry no absolute paths and a deployment points it at job-local
  * or HDFS/object-store scratch space. The DEFAULT is disk-backed
  * (`java.io.tmpdir`): portable and bounded only by real disk, so a stock
  * container (where /dev/shm is 64 MB) never hits tmpfs ENOSPC. Hosts with
  * a degrading virtual disk (this bench VM syncs small writes at
  * single-digit MB/s, see BENCH_NOTES.md) opt INTO tmpfs: Sessions.local
  * points the conf at /dev/shm only when that mount demonstrably has
  * headroom. On a cluster, set the conf to executor-local NVMe or the
  * job's object-store staging prefix.
  *
  * Lifecycle: scratch content is per-run ephemera by contract. The harness
  * mains (Bench, Verify) call [[sweep]] on exit so repeated driver runs
  * can't accumulate — RAM-backed tmpfs especially must not retain stale
  * per-run parquet between invocations.
  */
object Scratch {
  val ConfKey = "spark.graft.scratchDir"
  val Default: String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp").stripSuffix("/") + "/graft_qtmp"

  /** tmpfs scratch root, offered only when the mount has real headroom
    * (>= 4 GiB usable) — the opt-in path Sessions.local wires up.
    */
  val TmpfsCandidate = "/dev/shm/graft_qtmp"
  def tmpfsUsable: Boolean = {
    val shm = new java.io.File("/dev/shm")
    shm.isDirectory && shm.canWrite && shm.getUsableSpace >= 4L * 1024 * 1024 * 1024
  }

  def dir(spark: SparkSession, name: String): String =
    s"${spark.conf.get(ConfKey, Default)}/$name"

  /** Delete the session's resolved scratch root recursively. Refuses roots
    * that don't end in the graft_qtmp leaf — a misconfigured conf must not
    * turn teardown into `rm -rf` of a shared directory.
    */
  def sweep(spark: SparkSession): Unit = {
    val root = spark.conf.get(ConfKey, Default)
    if (root.endsWith("graft_qtmp")) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root))
    }
  }
}
