package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession construction for the engine's runnable surfaces.
  *
  * Conf decisions, and how they move to a 1000-executor cluster:
  *  - AQE on (default in Spark 4): runtime coalescing of shuffle
  *    partitions, skew-join splitting, and dynamic join-strategy switches
  *    are the first line of defense at 100 TB; nothing here disables them.
  *  - `spark.sql.shuffle.partitions` is sized to the local core count; on a
  *    real cluster set it to 2-3x total executor cores and let AQE coalesce
  *    down (with `spark.sql.files.maxPartitionBytes` at its 128 MB default,
  *    a 100 TB scan yields ~800k input splits — shuffle width, not input
  *    width, is the knob that matters).
  *  - graft.plans.GraftExtensions installs the engine's optimizer rules in
  *    every session, so SQL-text users get the native-expression rewrites.
  *  - UTC session timezone: parquet timestamp comparisons (and the DuckDB
  *    oracle) are timezone-sensitive.
  *  - heartbeat/network timeouts are raised well above the defaults (10 s /
  *    120 s): on a CPU-steal-throttled host the default heartbeat starves
  *    and the driver kills the executor mid-suite (round 7's bench died
  *    exactly this way — "unable to send heartbeats to driver more than 60
  *    times"). A starved run must degrade to SLOW, never to DEAD; the same
  *    settings are standard practice on busy multi-tenant clusters.
  */
object Sessions {

  def local(cores: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); set at build time so reads
      // don't mutate session conf (Tables.table keeps a defensive set for
      // caller-supplied sessions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Scratch opt-in: tmpfs only when this host's /dev/shm has headroom
    // (the disk on the bench VM syncs small writes at ~10 MB/s; a stock
    // container's 64 MB /dev/shm must fall through to the disk default).
    // An explicit user conf always wins.
    if (s.conf.getOption(Scratch.ConfKey).isEmpty && Scratch.tmpfsUsable)
      s.conf.set(Scratch.ConfKey, Scratch.TmpfsCandidate)
    s
  }
}
