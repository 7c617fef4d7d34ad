package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Measurement harness for VERDICT r13 #6: does keying d16's anchor
  * self-join on xxhash64(span) (8 bytes) instead of the verbatim 8-token
  * span text cut shuffle bytes / wall time enough to justify the
  * documented Lee-et-al. collision concession (~2^-64 per anchor pair)?
  *
  * Run once per mode in a fresh JVM (no cache crosstalk):
  *   sbt "Test/runMain graft.ExactSubstrHashExperiment text"
  *   sbt "Test/runMain graft.ExactSubstrHashExperiment hash"
  * Prints one JSON line: rows, wall seconds, total shuffle-write bytes.
  * The decision + numbers live in BENCH_NOTES.md; measured outcome
  * (sf0.1, calm host): hash 2.03x fewer shuffle bytes, wall-neutral —
  * kept as the opt-in `hashedAnchors` parameter with the collision
  * concession documented, while the registered d16 stays exact.
  */
object ExactSubstrHashExperiment {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("text")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleWrite +=
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
    })
    val occ = graft.operators.ExactSubstr.anchors(
      Tables.tokenizedDocs(spark, sf), col("text"), 8)
    val t0 = System.nanoTime()
    val res = graft.operators.ExactSubstr.maximalSpans(
      occ, k = 8, minLen = 12, hashedAnchors = mode == "hash")
    val n = res.count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let stage-completion events drain
    println(f"""RESULT {"mode":"$mode","sf":"$sf","rows":$n,"secs":$secs%.3f,"shuffle_write_bytes":$shuffleWrite}""")
    spark.stop()
  }
}
