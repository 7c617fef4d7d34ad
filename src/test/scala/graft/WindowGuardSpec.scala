package graft

import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structural guard against the m10 bug class (VERDICT r8 #2): a bare
  * `Window.orderBy(...)` coalesces its whole input to ONE partition — the
  * single-partition sort GlobalRank exists to kill — and nothing fails
  * until the input is corpus-sized. Repo rule (TinyWindow scaladoc):
  * every global window in main either goes through operators/GlobalRank
  * (unbounded frames) or names operators/TinyWindow (frames bounded by
  * construction, partitioned by a constant so the intent is visible in
  * the plan). This spec enforces the rule mechanically over the whole
  * registry: any registered query whose OPTIMIZED plan contains a Window
  * node with an empty partitionSpec fails here, naming the query.
  */
class WindowGuardSpec extends SparkSpec {

  private def unpartitionedWindows(plan: LogicalPlan): Seq[String] = {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach {
      case w: LWindow if w.partitionSpec.isEmpty =>
        bad += w.windowExpressions.map(_.toString.take(120)).mkString("; ")
      case _ => ()
    }
    bad.toSeq
  }

  // model-fitting queries execute training at construction (same skip set
  // rationale as LambdaCseGuardSpec); their specs own their shape. m10 is
  // deliberately NOT skipped — it is the query this guard was built for,
  // and its 3 classifier fits are cheap at sf0.001.
  private val skip = Set("m1_indexer_pipeline", "m3_ranking_metrics",
    "m4_als_recommend", "m5_als_rmse", "m6_item_similarity", "m7_sweep",
    "m8_grid", "m9_curve", "m11_rec_coverage", "m12_fold_in",
    // streaming queries execute a full stream drain at construction; the
    // returned frame is a sink read (no windows), StreamingQueries owns it
    "st1_stream_hourly", "st2_stream_dedup", "st3_stream_ingest",
    "st4_stream_cdc", "st5_stream_join", "st6_stream_session",
    "st7_stream_ewma", "st8_stream_heavy")

  test("no registered query plans a Window with an empty partitionSpec") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .flatMap { case (name, fn) =>
        unpartitionedWindows(fn(spark, sfDir).queryExecution.optimizedPlan)
          .map(e => s"$name: $e")
      }
    assert(offenders.isEmpty,
      "unpartitioned (single-partition) Window in a registered query — " +
        "use GlobalRank for unbounded frames or TinyWindow for " +
        "bounded-by-construction frames:\n" + offenders.mkString("\n"))
  }

  test("the detector flags the bare global-window shape") {
    val broken = Tables.events(spark, sfDir)
      .withColumn("rn", row_number().over(Window.orderBy(col("event_id"))))
    assert(unpartitionedWindows(broken.queryExecution.optimizedPlan).nonEmpty,
      "detector failed to flag a bare Window.orderBy")
  }

  test("TinyWindow's constant partition key survives the optimizer") {
    val ok = Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .withColumn("rn",
        row_number().over(graft.operators.TinyWindow
          .total(col("event_type"))(desc("n"), col("event_type"))))
    assert(unpartitionedWindows(ok.queryExecution.optimizedPlan).isEmpty,
      "a foldable partition key was optimized away — the guard and the " +
        "WindowExec warning would both regress")
  }
}
