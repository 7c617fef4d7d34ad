package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins: both sides pre-hashed into the same bucket
  * layout on the join key at WRITE time, so the join reads bucket i against
  * bucket i with no shuffle exchange on either side.
  *
  * This is the storage-level answer to the biggest 100 TB cost: a
  * fact-fact join (lineitem ⨝ orders) otherwise shuffles both full tables
  * every run. Bucketing pays one shuffle once, at write, and every
  * subsequent join/aggregation on the key is exchange-free.
  * BucketingSpec asserts the no-Exchange plan.
  */
object Bucketing {

  /** Persist as a bucketed, bucket-sorted table (requires saveAsTable —
    * bucket metadata lives in the catalog).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    // single-part names only: a dotted name would back-tick-quote into one
    // identifier (dropping nothing) while the real location is
    // warehouse/<db>.db/<tbl>; and the stale-dir path below is the
    // LOWERCASED name the catalog uses for the managed location
    require(!table.contains("."),
      s"writeBucketed takes a single-part table name, got '$table'")
    val spark = df.sparkSession
    // a managed-table location can survive a previous session whose
    // in-memory catalog is gone; overwrite then refuses to reuse it —
    // drop both the catalog entry and any stale directory first
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    deleteRecursively(new java.io.File(warehouse, table.toLowerCase))
    reapDeadPidTables(warehouse)
    df.write.format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Reap per-pid bucketed-table directories whose owning JVM is gone —
    * table names are pid-suffixed (IoQueries.bucketTables) so concurrent
    * JVMs never share a managed location, and this keeps the shared
    * warehouse from accumulating one table set per past run. Same
    * liveness + staleness double guard as Scratch.sweep: pid liveness is
    * judged in THIS process's pid namespace, so only reap dirs that are
    * also old by wall-clock.
    */
  private def reapDeadPidTables(warehouse: String): Unit = {
    val pidDir = "q_b_.*_p(\\d+)".r
    val staleMs = 60L * 60 * 1000
    Option(new java.io.File(warehouse).listFiles())
      .getOrElse(Array.empty).foreach { f =>
        f.getName match {
          case pidDir(pid) if f.isDirectory =>
            val alive = scala.util.Try(
              ProcessHandle.of(pid.toLong).isPresent).getOrElse(true)
            val old = System.currentTimeMillis() - f.lastModified() > staleMs
            if (!alive && old) deleteRecursively(f)
          case _ => ()
        }
      }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    // listFiles() is null on IO errors or if the dir vanished after the
    // isDirectory check — tolerate both, this is best-effort pre-cleaning
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    if (f.exists) { f.delete(); () }
  }

  /** Join two same-bucketed tables on their bucket key. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
