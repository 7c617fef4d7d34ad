package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.streaming.{EventStream, UserEvent}

/** End-to-end file-source streaming: parquet in, checkpointed
  * Trigger.AvailableNow incremental runs, parquet append sink out.
  * The MemoryStream specs check logic; this one checks the PIPELINE —
  * schema'd file source, watermark-gated append emission, and
  * exactly-once across restarts via the checkpoint's consumed-file log.
  */
class FileStreamSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(3600_000L * 24 + minute * 60_000L)

  test("AvailableNow runs drain only new files and append each closed " +
      "window exactly once") {
    val s = spark
    import s.implicits._
    val root = Scratch.dir(spark, "filestream")
    val src = s"$root/src"
    val dest = s"$root/dest"
    val ckpt = s"$root/ckpt"
    // fresh dirs: checkpoint state must not leak across test runs
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)

    val slice1 = Seq(
      UserEvent(1L, "click", ts(5), 1.0), UserEvent(2L, "click", ts(20), 2.0),
      UserEvent(1L, "view", ts(65), 3.0), UserEvent(2L, "click", ts(70), 4.0))
    val slice2 = Seq(
      UserEvent(1L, "click", ts(200), 5.0), UserEvent(2L, "view", ts(210), 6.0))

    // run 1: only slice1 exists; watermark = 01:10 - 10min = 01:00, so
    // exactly the [00:00, 01:00) window has closed
    slice1.toDF().write.mode("append").parquet(src)
    EventStream.processFilesOnce(s, src, dest, ckpt, "1 hour", "10 minutes")
    val after1 = s.read.parquet(dest)
      .select(col("win_start").cast("long").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after1 == Set((86400L, "click", 2L)), s"run1 emitted: $after1")

    // run 2: slice2 lands; the checkpoint skips slice1's files, the
    // advanced watermark (03:30 - 10min) closes the [01:00, 02:00) window
    slice2.toDF().write.mode("append").parquet(src)
    EventStream.processFilesOnce(s, src, dest, ckpt, "1 hour", "10 minutes")
    val after2 = s.read.parquet(dest)
      .select(col("win_start").cast("long").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // no duplicates (exactly-once), and the newly closed window arrived
    assert(after2.size == after2.toSet.size, s"duplicate emissions: $after2")
    assert(after2.toSet == Set(
      (86400L, "click", 2L),          // [00:00, 01:00): clicks @5, @20
      (86400L + 3600L, "click", 1L),  // [01:00, 02:00): click @70
      (86400L + 3600L, "view", 1L)),  // [01:00, 02:00): view @65
      s"run2 emitted: $after2")

    // parity: the emitted (closed) windows match the batch aggregation of
    // everything, restricted to the closed-window set
    val batch = EventStream.tumblingTypeCounts((slice1 ++ slice2).toDF(), "1 hour")
      .select(col("win_start").cast("long").as("w"), col("event_type"), col("n"))
      .filter(col("w") < 86400L + 2 * 3600L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after2.toSet == batch)
  }
}
