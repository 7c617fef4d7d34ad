package graft

/** Output laws for the round-13 additions — invariants the DuckDB hash
  * can't state. Runs on sf0.001 like the other law suites; every query
  * here is additionally hash-checked by the driver at sf0.01.
  */
class Round13LawsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("b4: all 8 aggregates match an exact BigInt recomputation per group") {
    import org.apache.spark.sql.functions._
    val got = q("b4_tpch_q1").collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
    }.toMap
    assert(got.nonEmpty)
    // independent recomputation: collect the raw rows, fold in BigInt
    val raw = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"),
        round(col("l_tax") * 100).cast("long"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (BigInt(r.getLong(2)), BigInt(r.getLong(3)), BigInt(r.getLong(4)),
          BigInt(r.getLong(5)))))
    val want = raw.groupBy(_._1).map { case (k, rows) =>
      val qs = rows.map(_._2._1).sum
      val cs = rows.map(_._2._2).sum
      val ds = rows.map(r => r._2._2 * (100 - r._2._3)).sum
      val ch = rows.map(r => r._2._2 * (100 - r._2._3) * (100 + r._2._4)).sum
      val ps = rows.map(_._2._3).sum
      val n = BigInt(rows.length)
      k -> (qs.toLong, cs.toLong, ds.toLong, ch.toLong,
        (qs * 100 / n).toLong, (cs / n).toLong, (ps * 100 / n).toLong,
        n.toLong)
    }
    assert(got.keySet === want.keySet)
    for ((k, w) <- want) assert(got(k) === w, s"group $k")
  }

  test("b5: top-100 matches a plain recomputation; order total and " +
      "every survivor genuinely exceeds the quantity threshold") {
    import org.apache.spark.sql.functions._
    val rows = q("b5_tpch_q18").collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getLong(5) > 300L), "HAVING sum_qty > 300")
    val prices = rows.map(_.getLong(4))
    assert(prices.toSeq === prices.toSeq.sortBy(-_), "descending value")
    // plain recomputation: per-order sums driver-side, join via maps
    val sums = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), round(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      .filter(_._2 > 300L)
    val ords = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"),
        round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val custs = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = sums.toSeq.map { case (ok, sq) =>
      val (ck, day, price) = ords(ok)
      (custs(ck), ck, ok, day, price, sq)
    }.sortBy { case (_, _, ok, _, price, _) => (-price, ok) }
      .take(rows.length)
    val gotSeq = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(gotSeq === want)
  }
}
