package graft
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Benchmark main: wall-times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Harness rules (VERDICT r1 findings 2-5, r3 findings 2-3, 9):
  *  - each query executes via a `noop`-format write, not `.count()` — count
  *    lets Catalyst prune all projected columns and elide sorts, which would
  *    benchmark p1/o1-style queries as near-empty scans;
  *  - one throwaway warmup query absorbs JVM/Spark startup (~8 s) so the
  *    first measured query isn't charged for it;
  *  - the shared ALS model is pre-trained BEFORE timing and reported as its
  *    own "_als_fit" entry, so m4/m5/m6 measure recommend/transform only —
  *    fit variance (±10 s) polluted the query table in rounds 2-3;
  *  - the whole suite runs SPARK_GRAFT_BENCH_RUNS times (default 2) and each
  *    query reports its MIN across runs — per-query noise at sf0.1 ran up to
  *    3.7x in round 3, and min-of-n is the standard variance-proofing;
  *  - a "_floor" entry times a noop write of a 1000-row in-memory plan: the
  *    fixed harness overhead (~0.2-0.9 s/query) to read real numbers net of;
  *  - "total" sums real queries only (no "_"-prefixed harness entries);
  *  - queries run in sorted name order (stable across rounds);
  *  - a query records -1 only when EVERY run failed; `errors` records any
  *    per-run failure even when another run succeeded, so flaky queries
  *    surface in the errors array while still reporting their best time —
  *    a query is healthy only if it has a time AND no error entry;
  *  - the JSON line goes to stdout AND to a file (sbt [info] noise made the
  *    stdout-only line unparseable in round 1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)

    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warmup: a real scan+agg through the whole stack, not measured.
    try execute((s, d) => Tables.lineitem(s, d).groupBy("l_returnflag").count())
    catch { case _: Throwable => () }

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // Optional args = query-name filter (dev loop: time one query without
    // the full suite). The driver passes no args → full suite, unchanged.
    // A misspelled name must fail loudly — matching nothing would record a
    // spotless empty artifact.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.mkString(", ")}")
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => args.isEmpty || args.contains(n) }
    val selected = names.map(_._1).toSet

    // Model/index artifacts are built once, outside the query loops (the
    // TrieMap caches make every later m4/m5/m6/e4 construction reuse them):
    // ALS fit -> "_als_fit", IVF quantizer build -> "_ivf_build". Skipped
    // when the name filter selects no query that uses them — a filtered
    // 0.6 s query must not pay ~9 s of pretraining.
    val needsAls = selected.exists(Set("m4_als_recommend", "m5_als_rmse",
      "m6_item_similarity"))
    val needsIvf = selected.exists(Set("e4_ann_ivf", "e6_semdedup"))
    val needsQc = selected.contains("c5_quality_classifier")
    val needsBuckets = selected.contains("b1_bucketed_join")
    val fitSec =
      if (!needsAls) -1.0
      else try timed(graft.queries.MlQueries.pretrainAls(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val ivfSec =
      if (!needsIvf) -1.0
      else try timed(graft.queries.PipelineQueries.pretrainIvf(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val qcSec =
      if (!needsQc) -1.0
      else try timed(graft.queries.MlQueries.pretrainQuality(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val bucketSec =
      if (!needsBuckets) -1.0
      else try timed(graft.queries.IoQueries.prepareBuckets(spark, sfDir))
      catch { case _: Throwable => -1.0 }
    val errors = scala.collection.mutable.LinkedHashSet.empty[String]
    val best = scala.collection.mutable.Map.empty[String, Double]
    def record(name: String, sec: Double): Unit =
      if (sec >= 0) {
        val prev = best.getOrElse(name, Double.MaxValue)
        best(name) = if (prev < 0) sec else math.min(prev, sec)
      } else best.getOrElseUpdate(name, -1.0)

    for (_ <- 1 to runs) {
      record("_floor", timed(execute((s, _) => s.range(1000).toDF("id"))))
      for ((name, fn) <- names) {
        val sec =
          try timed(execute(fn))
          catch { case e: Throwable =>
            errors += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}"
            -1.0
          }
        record(name, sec)
      }
    }
    if (needsAls) record("_als_fit", fitSec)
    if (needsIvf) record("_ivf_build", ivfSec)
    if (needsQc) record("_qc_fit", qcSec)
    if (needsBuckets) record("_bucket_write", bucketSec)
    val results = best.toSeq.sortBy(_._1)

    // ms precision, trailing zeros stripped: the driver keeps only the last
    // 2000 chars of stdout (minus sbt's ~75-char success trailer) and
    // parses the JSON line out of that tail — full-precision doubles pushed
    // the line to ~2.1k chars in round 2 and its head got truncated. As the
    // registry grows, precision steps down 3 -> 2 -> 1 dp until it fits.
    def fmt(v: Double, dp: Int) = {
      val s = BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
      if (s == "-0") "0" else s
    }
    def qsJson(dp: Int) = results
      .map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }.mkString("{", ",", "}")
    val total = results.collect {
      case (n, v) if v >= 0 && !n.startsWith("_") => v
    }.sum
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val errJson = errors.toSeq.map(e => "\"" + esc(e) + "\"").mkString("[", ",", "]")
    def wrap(qs: String) =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","runs":$runs,"queries":$qs,"sf":"$sfDir","errors":$errJson}"""
    def line(dp: Int) = wrap(qsJson(dp))
    // If even 1 dp can't fit, keep the 40 slowest individually and fold the
    // rest into one "_other_Nq" entry — per-query detail for the cheap tail
    // lives in the file, which always gets the full 3-dp line.
    def topLine = {
      val sorted = results.sortBy(-_._2)
      val (top, rest) = sorted.splitAt(40)
      val restSum = rest.collect { case (_, v) if v >= 0 => v }.sum
      wrap((top.map { case (k, v) => "\"" + k + "\":" + fmt(v, 2) }
        :+ ("\"_other_" + rest.size + "q\":" + fmt(restSum, 2)))
        .mkString("{", ",", "}"))
    }
    // ~75 chars of sbt "[success] ..." trailer share the 2000-char tail
    val json = (3 to 1 by -1).map(line).find(_.length <= 1880).getOrElse(topLine)
    println(json)
    // A name-filtered run must never clobber the full-suite artifact that
    // tools/bench_notes.py reads — partial results default to their own
    // file unless an output path was explicitly given.
    val defaultOut = if (args.isEmpty) "BENCH.json" else "BENCH_partial.json"
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    Files.writeString(Paths.get(outFile), line(3) + "\n")
    graft.queries.MlQueries.clearCaches()
    graft.queries.PipelineQueries.clearCaches()
    graft.queries.IoQueries.clearCaches()
    spark.stop()
  }
}
