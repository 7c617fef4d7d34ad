package graft

import org.apache.spark.sql.functions._

/** Output laws for the five TPC-H faces that complete the family at
  * round 14 (b14 Q4, b15 Q12, b16 Q13, b17 Q8, b18 Q21) — each query's
  * result replayed against an independent driver-side BigInt/Scala
  * computation at sf0.001, the same differential style as
  * Round14LawsSpec. Every query here is additionally hash-checked
  * against DuckDB by the driver at sf0.01.
  *
  * Date arithmetic note: the session runs UTC, orderdate/shipdate are
  * midnight UTC timestamps, and `+ INTERVAL n DAYS` on a UTC timestamp
  * is exactly n·86400 seconds — so the replay compares epoch millis.
  */
class TpchCompletionSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  private val dayMs = 86400000L

  /** (orderkey, custkey, orderdate millis, priority, status) — dates
    * collected as epoch millis (the stored NTZ timestamps are midnight
    * wall-clock; the UTC session makes the cast an identity mapping).
    */
  private lazy val ordersRows: Array[(Long, Long, Long, String, String)] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_millis(col("o_orderdate").cast("timestamp")),
        col("o_orderpriority"), col("o_orderstatus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))

  /** (orderkey, suppkey, shipdate millis, linestatus) */
  private lazy val liRows: Array[(Long, Long, Long, String)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"),
        unix_millis(col("l_shipdate").cast("timestamp")),
        col("l_linestatus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))

  private def ts(s: String): Long =
    java.time.Instant.parse(s + "T00:00:00Z").toEpochMilli

  test("b14: Q4's priority counts match a replay of the correlated " +
      "EXISTS (some lineitem shipped > 60 days after the order date)") {
    val got = q("b14_tpch_q4").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val lateOrders = liRows.groupBy(_._1) // orderkey -> max shipdate
      .map { case (ok, xs) => ok -> xs.map(_._3).max }
    val want = ordersRows
      .filter(o => o._3 >= ts("1996-01-01") && o._3 < ts("1996-04-01"))
      .filter(o => lateOrders.get(o._1).exists(_ > o._3 + 60 * dayMs))
      .groupBy(_._4).map { case (p, xs) => (p, xs.length.toLong) }
      .toSeq.sortBy(_._1)
    assert(want.nonEmpty, "replay selected no orders — predicate broken")
    assert(got === want, "b14 priority counts must match the replay")
  }

  test("b15: Q12's high/low line counts match a replay of the " +
      "conditional dual count over late lines") {
    val got = q("b15_tpch_q12").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val ordByKey = ordersRows.map(o => o._1 -> (o._3, o._4)).toMap
    val want = liRows
      .filter(l => l._3 >= ts("1996-01-01") && l._3 < ts("1997-01-01"))
      .flatMap { l =>
        ordByKey.get(l._1).collect {
          case (odate, prio) if l._3 > odate + 60 * dayMs => (l._4, prio)
        }
      }
      .groupBy(_._1).map { case (st, xs) =>
        val high = xs.count(x => x._2 == "1-URGENT" || x._2 == "2-HIGH")
        (st, high.toLong, (xs.length - high).toLong)
      }.toSeq.sortBy(_._1)
    assert(want.nonEmpty && want.map(x => x._2 + x._3).sum > 0)
    assert(got === want, "b15 dual counts must match the replay")
  }

  test("b16: Q13's order-count distribution matches a replay INCLUDING " +
      "zero-order customers (the outer-join-filter trap)") {
    val got = q("b16_tpch_q13").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val perCust = ordersRows
      .filter(_._4 == "1-URGENT")
      .groupBy(_._2).map { case (ck, xs) => ck -> xs.length.toLong }
    val custKeys = Tables.customer(spark, sfDir).select(col("c_custkey"))
      .collect().map(_.getLong(0))
    val want = custKeys.map(ck => perCust.getOrElse(ck, 0L))
      .groupBy(identity).map { case (c, xs) => (c, xs.length.toLong) }
      .toSeq.sortBy(x => (-x._2, -x._1))
    // the zero bucket must be non-empty at sf0.001, or the outer join
    // isn't being exercised (every customer ordered => inner join would
    // produce the same answer and the law is vacuous)
    assert(want.exists(_._1 == 0L),
      "no zero-order customers at this scale — law is vacuous")
    assert(got === want, "b16 distribution must match the replay")
  }

  test("b17: Q8's per-year nation volume, total, and exact share " +
      "quotient match a BigInt replay of the five-dimension join") {
    val got = q("b17_tpch_q8").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val natName = Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(r => (r.getInt(0), (r.getString(1), r.getInt(2)))).toMap
    val asiaRegion = Tables.region(spark, sfDir)
      .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      .collect().map(_.getInt(0)).toSet
    val custAsian = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), asiaRegion(natName(r.getInt(1))._2))).toMap
    val suppNation = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey")).collect()
      .map(r => (r.getLong(0), natName(r.getInt(1))._1)).toMap
    val econParts = Tables.part(spark, sfDir)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
      .collect().map(_.getLong(0)).toSet
    val ordInfo = ordersRows.map(o => o._1 -> (o._2, o._3)).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .collect().flatMap { r =>
        val (ck, odate) = ordInfo(r.getLong(0))
        val in = econParts(r.getLong(1)) && custAsian(ck) &&
          odate >= ts("1996-01-01") && odate < ts("1998-01-01")
        if (!in) None
        else {
          val yr = java.time.Instant.ofEpochMilli(odate)
            .atZone(java.time.ZoneOffset.UTC).getYear.toLong
          val vol = BigInt(r.getLong(3)) * (100 - r.getLong(4))
          Some((yr, suppNation(r.getLong(2)), vol))
        }
      }
    val want = rows.groupBy(_._1).map { case (yr, xs) =>
      val nat = xs.filter(_._2 == "NATION_13").map(_._3).sum
      val tot = xs.map(_._3).sum
      (yr, nat.toLong, tot.toLong, (nat * 1000000 / tot).toLong,
        xs.length.toLong)
    }.toSeq.sortBy(_._1)
    assert(want.exists(_._2 > 0L),
      "NATION_13 has zero volume at this scale — share law is vacuous")
    assert(got === want, "b17 share table must match the replay")
  }

  test("b18: Q21's waiting-supplier counts match a replay of the dual " +
      "EXISTS/NOT-EXISTS (sole late supplier in a multi-supplier order)") {
    val got = q("b18_tpch_q21").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val fOrders = ordersRows.filter(_._5 == "F")
      .map(o => o._1 -> o._3).toMap
    val perPair = liRows
      .flatMap(l => fOrders.get(l._1).map(od =>
        ((l._1, l._2), l._3 > od + 90 * dayMs)))
      .groupBy(_._1).map { case (k, xs) => (k, xs.exists(_._2)) }
    val byOrder = perPair.groupBy(_._1._1)
    val qualifying = byOrder.toSeq.flatMap { case (_, pairs) =>
      val late = pairs.filter(_._2)
      if (pairs.size >= 2 && late.size == 1) late.keys.map(_._2) else Nil
    }
    val suppName = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = qualifying.map(suppName)
      .groupBy(identity).map { case (n, xs) => (n, xs.length.toLong) }
      .toSeq.sortBy(x => (-x._2, x._1)).take(25)
    assert(want.nonEmpty, "replay found no waiting suppliers")
    assert(got === want, "b18 numwait table must match the replay")
  }

  // ---- the partsupp-surrogate faces (b19-b23) -------------------------

  /** partkey -> (name, brand, type, size, retail cents) */
  private lazy val partRows: Map[Long, (String, String, String, Int, Long)] =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"),
        round(col("p_retailprice") * 100).cast("long"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4), r.getLong(5))).toMap

  /** suppkey -> (name, nationkey, balance cents) */
  private lazy val suppRows: Map[Long, (String, Int, Long)] =
    Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        round(col("s_acctbal") * 100).cast("long"))
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2),
        r.getLong(3))).toMap

  /** nationkey -> (name, regionkey) */
  private lazy val natRows: Map[Int, (String, Int)] =
    Tables.nation(spark, sfDir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getInt(2)))
      .toMap

  /** (orderkey, partkey, suppkey, qty, cents, pct) */
  private lazy val liWide: Array[(Long, Long, Long, Long, Long, Long)] =
    Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("b19: Q9's profit table matches a BigInt replay of revenue minus " +
      "the retail-cost surrogate, grouped by supplier nation and year") {
    val got = q("b19_tpch_q9").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val ordYear = ordersRows.map(o => o._1 ->
      java.time.Instant.ofEpochMilli(o._3)
        .atZone(java.time.ZoneOffset.UTC).getYear.toLong).toMap
    val want = liWide.flatMap { l =>
      val p = partRows(l._2)
      if (!p._1.contains("gear")) None
      else {
        val nat = natRows(suppRows(l._3)._2)._1
        val profit = BigInt(l._5) * (100 - l._6) -
          BigInt(l._4) * p._5 * 90
        Some(((nat, ordYear(l._1)), profit))
      }
    }.groupBy(_._1).map { case ((n, y), xs) =>
      (n, y, xs.map(_._2).sum.toLong, xs.length.toLong)
    }.toSeq.sortBy(x => (x._1, -x._2))
    assert(want.nonEmpty, "replay selected no gear parts")
    assert(got === want, "b19 profit table must match the replay")
  }

  test("b20: Q16's distinct supplier counts match a replay of the " +
      "implied (part, supplier) pairs minus the balance blacklist") {
    val got = q("b20_tpch_q16").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq
    val sizes = Set(1, 4, 9, 14, 19, 23, 36, 45)
    val blacklist = suppRows.collect {
      case (k, (_, _, bal)) if bal < 0 => k
    }.toSet
    val want = liWide
      .map(l => (l._2, l._3)).distinct
      .flatMap { case (pk, sk) =>
        val p = partRows(pk)
        if (p._2 != "Brand#1" && p._3 != "PROMO" && sizes(p._4) &&
          !blacklist(sk)) Some(((p._2, p._3, p._4), sk))
        else None
      }
      .groupBy(_._1).map { case ((b, t, sz), xs) =>
        (b, t, sz, xs.map(_._2).distinct.length.toLong)
      }.toSeq.sortBy(x => (-x._4, x._1, x._2, x._3))
    assert(want.nonEmpty)
    assert(got === want, "b20 supplier counts must match the replay")
  }

  test("b21: Q20's dominant-supplier list matches a replay of the exact " +
      "2·qty > total threshold over 1996 promo shipments") {
    val got = q("b21_tpch_q20").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val ship96 = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => partRows(x._1)._3 == "PROMO")
    val perPair = ship96.groupBy(x => (x._1, x._2))
      .map { case (k, xs) => (k, xs.map(_._3).sum) }
    val perPart = perPair.groupBy(_._1._1)
      .map { case (pk, m) => pk -> m.values.sum }
    val dom = perPair.collect {
      case ((pk, sk), q) if 2 * q > perPart(pk) => sk
    }.toSet
    val want = suppRows.toSeq.collect {
      case (sk, (name, nk, bal)) if dom(sk)
        && natRows(nk)._1 == "NATION_13" => (name, bal)
    }.sortBy(_._1)
    assert(want.nonEmpty, "replay found no dominant suppliers")
    assert(got === want, "b21 supplier list must match the replay")
  }

  test("b22: Q2's per-part minimum-cost supplier matches a replay of " +
      "the exact (unit_x1e6, suppkey) argmin over European offers") {
    val got = q("b22_tpch_q2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5))).toSeq
    val euroRegion = Tables.region(spark, sfDir)
      .filter(col("r_name") === "EUROPE").select(col("r_regionkey"))
      .collect().map(_.getInt(0)).toSet
    val offers = liWide.flatMap { l =>
      val p = partRows(l._2)
      val (sname, nk, bal) = suppRows(l._3)
      val (nname, rk) = natRows(nk)
      if (p._3 == "LARGE" && p._4 <= 10 && euroRegion(rk) && l._4 > 0) {
        val unit = (BigInt(l._5) * 1000000 / l._4).toLong
        Some((l._2, p._1, sname, nname, bal, unit, l._3))
      } else None
    }
    val want = offers.groupBy(_._1).map { case (_, xs) =>
      val best = xs.minBy(x => (x._6, x._7))
      (best._1, best._2, best._3, best._4, best._5, best._6)
    }.toSeq.sortBy(x => (-x._5, x._4, x._3, x._1)).take(100)
    assert(want.nonEmpty)
    assert(got === want, "b22 argmin table must match the replay")
  }

  test("b23: Q11's important-stock ledger matches a BigInt replay of " +
      "the exact val·n_parts > 2·total share threshold") {
    val got = q("b23_tpch_q11").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nations = Set("NATION_13", "NATION_3", "NATION_8")
    val natSupp = suppRows.collect {
      case (sk, (_, nk, _)) if nations(natRows(nk)._1) => sk
    }.toSet
    val pv = liWide.filter(l => natSupp(l._3))
      .groupBy(_._2).map { case (pk, xs) =>
        pk -> xs.map(l => BigInt(l._4) * partRows(pk)._5).sum
      }
    val tv = pv.values.sum
    val np = pv.size
    val want = pv.collect {
      case (pk, v) if v * np > tv * 2 => (pk, v.toLong)
    }.toSeq.sortBy(x => (-x._2, x._1))
    assert(want.nonEmpty && want.size < pv.size,
      "threshold kept everything or nothing — law is vacuous")
    assert(got === want, "b23 ledger must match the replay")
  }
}
