package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.audit.DecisionAudit

/** Mechanical enforcement of the float-decision audit (VERDICT r8 #2):
  * every oracle whose hash could depend on a floating-point decision must
  * carry a reviewed, pinned decision path in DecisionAudit, and the data
  * premise the GrainMargin class rests on is re-verified against the
  * CURRENT testdata so a hostile regeneration fails HERE (builder loop)
  * before it fails in the driver's correctness gate.
  */
class DecisionAuditSpec extends SparkSpec {

  test("every float-suspect oracle has a decision-path entry") {
    val uncovered = SparkEntry.oracleSql.toSeq.sortBy(_._1).collect {
      case (name, sql) if DecisionAudit.suspects(sql).nonEmpty &&
          !DecisionAudit.entries.contains(name) =>
        s"$name (${DecisionAudit.suspects(sql).mkString(",")})"
    }
    assert(uncovered.isEmpty,
      s"oracled queries with unclassified float decisions:\n${uncovered.mkString("\n")}")
  }

  test("every audit entry names a real oracled query") {
    val phantom = DecisionAudit.entries.keySet -- SparkEntry.oracleSql.keySet
    assert(phantom.isEmpty, s"audit entries without an oracle: $phantom")
  }

  test("every entry's pinned SQL fragments are still present") {
    val broken = for {
      (name, path) <- DecisionAudit.entries.toSeq.sortBy(_._1)
      sql = SparkEntry.oracleSql(name)
      pin <- path.pins if !sql.contains(pin)
    } yield s"$name: missing pin «$pin»"
    assert(broken.isEmpty,
      s"decision-path pins no longer in the oracle SQL:\n${broken.mkString("\n")}")
  }

  test("rows-only float decisions map to existing specs and registered queries") {
    val unregistered = DecisionAudit.rowsOnlyCovered.keySet --
      SparkEntry.queries.keySet
    assert(unregistered.isEmpty, s"rowsOnlyCovered names unknown queries: $unregistered")
    val oracled = DecisionAudit.rowsOnlyCovered.keySet
      .filter(SparkEntry.oracleSql.contains)
    assert(oracled.isEmpty,
      s"rowsOnlyCovered entries that actually have oracles (move to entries): $oracled")
    val missingSpec = DecisionAudit.rowsOnlyCovered.values.toSet.filterNot { s =>
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"src/test/scala/graft/$s.scala"))
    }
    assert(missingSpec.isEmpty, s"covering specs not found on disk: $missingSpec")
  }

  test("st7 premise: no same-user same-ts event collisions in the current testdata") {
    // st7_stream_ewma's BitPinned path rests on ts-only stream order
    // equaling the oracle's (ts, event_id) order, which holds iff no user
    // has two events at the identical (nanosecond) timestamp. Verified
    // against whatever testdata THIS run sees — a regeneration that
    // introduces collisions fails here, in the builder loop, instead of
    // as a hash red at the driver gate.
    val collisions = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("ts"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") > 1)
      .count()
    assert(collisions == 0L,
      s"$collisions same-user-same-ts collision groups — st7_stream_ewma's " +
        "ts-only fold order is no longer total; add an id tie-break to " +
        "UserEvent/runningEwma or retire the oracle")
  }

  test("GrainMargin premise: base value columns are 2-dp-quantized in the current testdata") {
    // the load-bearing assumption behind every round(sum(x), 2) oracle: the
    // stored values sit on the 0.01 grid (so true sums do too). Verified
    // against whatever testdata THIS run sees — a regeneration that breaks
    // the grain breaks this test, loudly, in the builder's own loop.
    val cols = Seq(
      "events" -> "value", "lineitem" -> "l_quantity",
      "lineitem" -> "l_extendedprice", "lineitem" -> "l_discount",
      "orders" -> "o_totalprice", "customer" -> "c_acctbal",
      "part" -> "p_retailprice")
    val offGrid = cols.flatMap { case (t, c) =>
      val d = spark.read.parquet(s"$sfDir/$t.parquet")
        .agg(max(abs(col(c) * 100 - round(col(c) * 100))).cast("double"))
        .head.getDouble(0)
      if (d > 1e-4) Some(s"$t.$c off the 0.01 grid by $d") else None
    }
    assert(offGrid.isEmpty, offGrid.mkString("\n"))
  }

  test("j3 premise: price*(1-discount) products sit on the 1e-4 grid") {
    val d = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
      .agg(max(abs(col("rev") * 10000 - round(col("rev") * 10000)))
        .cast("double"))
      .head.getDouble(0)
    assert(d < 1e-3, s"j3 revenue terms off the 1e-4 grid by $d")
  }

  test("every Double/Float output column of an oracled query is audited") {
    // belt-and-braces beyond the SQL scanner: a raw (un-rounded, un-pinned)
    // double output would hash-diverge even without tripping the textual
    // patterns. Analysis only — .schema does not execute the plan (IO
    // queries still run their in-function writes, at sf0.001 cost).
    val missing = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) if SparkEntry.oracleSql.contains(name) &&
          !DecisionAudit.entries.contains(name) =>
        val floaty = fn(spark, sfDir).schema.fields.collect {
          case f if f.dataType == DoubleType || f.dataType == FloatType =>
            f.name
        }
        if (floaty.nonEmpty) Some(s"$name: ${floaty.mkString(",")}") else None
      case _ => None
    }
    assert(missing.isEmpty,
      s"unaudited float output columns:\n${missing.mkString("\n")}")
  }
}
