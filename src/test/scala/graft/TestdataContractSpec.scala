package graft

import org.apache.spark.sql.functions._

/** Pins the driver-side testdata CONTRACT the whole registry is built on.
  *
  * The driver regenerates /root/testdata between rounds, and regenerations
  * have already shifted semantics twice: round 8's events.ts nanos→micros
  * change flipped 8 oracles, and a value landing in a float-threshold
  * disagreement band cost a16 its hash. DecisionAuditSpec guards the value
  * GRAIN premise; this spec guards the SCHEMA and key-integrity premises,
  * so a regeneration that changes a column type, timestamp precision, or
  * referential shape is diagnosed here in one line — in the builder's own
  * loop — instead of surfacing as a pile of opaque red oracle rows.
  */
class TestdataContractSpec extends SparkSpec {

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double")
  )

  test("every table's schema matches the contract (names, order, types)") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (t, cols) =>
      val actual = spark.read.parquet(s"$sfDir/$t.parquet").schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      // region carries only the pinned prefix check if the generator adds
      // trailing columns; everything else must match the prefix we use
      if (actual.take(cols.size) != cols)
        Some(s"$t: expected ${cols.mkString(",")} got ${actual.mkString(",")}")
      else None
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("keys are non-null and unique where queries assume it") {
    val uniqueKeys = Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "part" -> "p_partkey", "supplier" -> "s_suppkey",
      "events" -> "event_id", "documents" -> "doc_id",
      "embeddings" -> "vec_id")
    val bad = uniqueKeys.flatMap { case (t, k) =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      val r = df.agg(count(lit(1)), count_distinct(col(k)),
        sum(when(col(k).isNull, 1).otherwise(0))).head
      if (r.getLong(0) != r.getLong(1) || r.getLong(2) != 0L)
        Some(s"$t.$k: ${r.getLong(0)} rows, ${r.getLong(1)} distinct, " +
          s"${r.getLong(2)} null")
      else None
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("foreign keys resolve (the join families assume closed references)") {
    val fks = Seq(
      ("orders", "o_custkey", "customer", "c_custkey"),
      ("lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("lineitem", "l_partkey", "part", "p_partkey"),
      ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("customer", "c_nationkey", "nation", "n_nationkey"),
      ("nation", "n_regionkey", "region", "r_regionkey"))
    val dangling = fks.flatMap { case (ft, fk, pt, pk) =>
      val n = spark.read.parquet(s"$sfDir/$ft.parquet").select(col(fk))
        .join(spark.read.parquet(s"$sfDir/$pt.parquet").select(col(pk)),
          col(fk) === col(pk), "left_anti").count()
      if (n != 0L) Some(s"$ft.$fk -> $pt.$pk: $n dangling") else None
    }
    assert(dangling.isEmpty, dangling.mkString("\n"))
  }

  test("events timestamps are microsecond-grain (the r8 regeneration pin)") {
    // round 8's regeneration moved events.ts from nanos to micros and
    // flipped 8 oracles; both engines read parquet timestamp[us], so the
    // contract is: reading at microsecond precision loses nothing.
    val n = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("ts").isNull).count()
    assert(n == 0L, s"$n null event timestamps")
  }
}
