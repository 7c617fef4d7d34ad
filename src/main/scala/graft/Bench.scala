package graft
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Benchmark main: wall-times every registered query at SPARK_GRAFT_SF_DIR.
  *
  * Harness rules (VERDICT r1 findings 2-5):
  *  - each query executes via a `noop`-format write, not `.count()` — count
  *    lets Catalyst prune all projected columns and elide sorts, which would
  *    benchmark p1/o1-style queries as near-empty scans;
  *  - one throwaway warmup query absorbs JVM/Spark startup (~8 s) so the
  *    first measured query isn't charged for it;
  *  - queries run in sorted name order (stable across rounds);
  *  - a failing query records -1 and its error, never a bogus fast time;
  *  - the JSON line goes to stdout AND to a file (sbt [info] noise made the
  *    stdout-only line unparseable in round 1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))

    def execute(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Warmup: a real scan+agg through the whole stack, not measured.
    try execute((s, d) => Tables.lineitem(s, d).groupBy("l_returnflag").count())
    catch { case _: Throwable => () }

    val errors = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { execute(fn); true }
        catch { case e: Throwable =>
          errors += s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(200)}"
          false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
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
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val errJson = errors.map(e => "\"" + esc(e) + "\"").mkString("[", ",", "]")
    def wrap(qs: String) =
      s"""{"metric":"total","value":${fmt(total, 3)},"unit":"sec","queries":$qs,"sf":"$sfDir","errors":$errJson}"""
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
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    Files.writeString(Paths.get(outFile), line(3) + "\n")
    spark.stop()
  }
}
