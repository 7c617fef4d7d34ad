package graft

import java.nio.file.{Files, Paths}
import scala.sys.process._

/** Registry-wide guard for the ORACLE RESULT-TYPE bug class (VERDICT r9
  * #2): `a16_zscore_anomaly` was rows-green/schema-green/hash-RED for two
  * rounds because DuckDB silently widens an uncast integer `sum()` to
  * HUGEINT (int128) — a dtype nothing Spark emits can match, so the
  * driver's content hash diverges while every VALUE is identical. The
  * builder's own value-compare loop coerces ints and floats, so it can
  * never see what the driver's hasher sees; only the result TYPE exposes
  * it. Same class: `to_json()` types as JSON vs Spark's VARCHAR.
  *
  * The only reliable detector is DuckDB's own DESCRIBE of each oracle
  * (static SQL scans can't type `sum(x)` without knowing x's type — the
  * o12/p11 oracles legitimately contain inner uncast sums that an outer
  * CAST fixes). So this spec shells out to the shared implementation,
  * `tools/check_oracle.py --types` — a LIMIT-0 drill: DESCRIBE every
  * registered oracle against the real tables, fail on any column typing
  * outside the allowlist (HUGEINT and JSON out). The value gate
  * (check_oracle.py without --types) additionally enforces spark==oracle
  * type IDENTITY per column using the Verify parquet dumps; here, with no
  * dumps, the allowlist half runs registry-wide on every `sbt test`.
  *
  * duckdb lives in the container's system python (the driver's gate runs
  * there); if it's ever absent the suite cancels rather than fails.
  */
class OracleTypeGuardSpec extends SparkSpec {

  private def duckdbAvailable: Boolean =
    scala.util.Try("python3 -c \"import duckdb\"".! == 0).getOrElse(false)

  // Verify.scala's JSON escape, kept in sync (control chars < 0x20 — a
  // tab in SQL otherwise breaks json.load on the other side).
  private def jq(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def runDrill(oracles: Map[String, String]): Int = {
    val dir = Files.createTempDirectory("oracle_type_guard")
    val json = oracles.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(dir.resolve("oracle_sql.json"), json)
    Seq("python3", "tools/check_oracle.py", "--types",
      dir.toString, sfDir).!
  }

  test("every registered oracle types inside the allowlist (no HUGEINT/JSON)") {
    assume(duckdbAvailable, "duckdb not importable in system python3")
    assert(runDrill(SparkEntry.oracleSql) == 0,
      "an oracle result column types outside the allowlist — see " +
        "TYPE-FAIL lines above; CAST the offending expression " +
        "(uncast integer sum() -> HUGEINT, to_json() -> JSON)")
  }

  test("the drill flags an uncast integer sum (HUGEINT) and a bare to_json") {
    assume(duckdbAvailable, "duckdb not importable in system python3")
    val planted = Map(
      "bad_hugeint" ->
        "SELECT sum(CASE WHEN n_nationkey >= 0 THEN 1 ELSE 0 END) AS n FROM nation",
      "bad_json" ->
        "SELECT to_json(map_from_entries([row('k', 1)])) AS j FROM nation LIMIT 1")
    assert(runDrill(planted) != 0,
      "type drill failed to flag planted HUGEINT/JSON oracles")
  }
}
