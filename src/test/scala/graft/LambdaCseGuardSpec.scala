package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Structural guard against the t6 bug class (VERDICT r3 #1, and the
  * documented hazard at TextFunctions.scala): HOF lambdas are interpreted
  * with NO common-subexpression elimination, so an expensive expression
  * inside a lambda body that does not depend on any lambda variable is
  * loop-INVARIANT — it re-evaluates once per element instead of once per
  * row. `shingles(tokens(text), 2)` re-tokenized every document once per
  * bigram (O(tokens²), 6x at sf0.1); the fix is projecting the token array
  * to a column first. This spec fails if that shape — or any sibling of it —
  * is ever reintroduced into a registered query.
  *
  * Scans the OPTIMIZED plan: that is what executes, and it is where
  * CollapseProject could silently re-inline a single-use projection back
  * into a lambda.
  */
class LambdaCseGuardSpec extends SparkSpec {

  /** Expensive-to-evaluate expression heads. Cheap per-element arithmetic
    * (comparisons, casts, struct field access) is exempt — the hazard needs
    * real per-evaluation cost to matter.
    */
  private def expensiveHead(e: Expression): Boolean = e match {
    case _: Md5 | _: Sha1 | _: Sha2 | _: Crc32 | _: Murmur3Hash | _: XxHash64 => true
    case _: StringSplit | _: RegExpReplace | _: RegExpExtract | _: Levenshtein => true
    case _: graft.expressions.Md5Hash32 => true
    case _: graft.expressions.MinHashSig => true
    case _: graft.expressions.SimHash32Expr => true
    case _: HigherOrderFunction => true
    case _ => false
  }

  /** Subtrees inside any lambda body that are expensive AND reference no
    * lambda variable (loop-invariant — the bug shape).
    */
  private def invariantExpensive(plan: LogicalPlan): Seq[String] = {
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case lf: LambdaFunction =>
            lf.function.foreach { sub =>
              if (expensiveHead(sub)
                  && !sub.exists(_.isInstanceOf[NamedLambdaVariable]))
                bad += sub.toString.take(160)
            }
          case _ => ()
        }
      }
    }
    bad.toSeq.distinct
  }

  // model-fitting queries execute training at construction; their output
  // plans are model-shaped (no text HOFs) and AlsSpec/SweepsSpec own them
  private val skip = Set("m1_indexer_pipeline", "m3_ranking_metrics",
    "m4_als_recommend", "m5_als_rmse", "m6_item_similarity", "m7_sweep",
    "m11_rec_coverage", "m12_fold_in",
    // streaming queries execute a full stream drain at construction and
    // return a sink-read aggregate (no text HOFs in the consumer plan)
    "st1_stream_hourly", "st2_stream_dedup", "st3_stream_ingest",
    "st4_stream_cdc", "st5_stream_join", "st6_stream_session",
    "st7_stream_ewma", "st8_stream_heavy")

  test("no registered query evaluates an expensive loop-invariant " +
      "expression inside a HOF lambda") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .flatMap { case (name, fn) =>
        invariantExpensive(fn(spark, sfDir).queryExecution.optimizedPlan)
          .map(e => s"$name: $e")
      }
    assert(offenders.isEmpty,
      "HOF lambdas re-evaluating loop-invariant expensive expressions " +
        "(project them to a column first):\n" + offenders.mkString("\n"))
  }

  test("the detector flags t6's original defective shape") {
    val broken = Tables.documents(spark, sfDir)
      .select(explode(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 2)).as("bigram"))
    assert(invariantExpensive(broken.queryExecution.optimizedPlan).nonEmpty,
      "detector failed to flag tokens() inlined into the shingles lambda")
  }

  test("the fixed t6 shape stays clean through the optimizer " +
      "(CollapseProject must not re-inline the token projection)") {
    val fixed = Tables.documents(spark, sfDir)
      .select(TextFunctions.tokens(col("text")).as("w"))
      .select(explode(TextFunctions.shingles(col("w"), 2)).as("bigram"))
    assert(invariantExpensive(fixed.queryExecution.optimizedPlan).isEmpty)
  }
}
