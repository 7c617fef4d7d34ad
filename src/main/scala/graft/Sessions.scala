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
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
