package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.{MgItem, MisraGriesAgg}
import graft.streaming.{TokenStream, TokenRec}

/** Stream==batch parity for the streaming Misra-Gries face: the sketch a
  * drained stream carries must equal the batch fold of the same token
  * sequence (per-key order fixed by `pos`), no matter where the
  * micro-batch boundary falls — the same parity contract as the EWMA and
  * DDSketch stream faces. Plus the classic MG laws on the drained state.
  */
class TokenStreamSpec extends SparkSpec {

  // 60 tokens on one key: 'a' dominates (24), 'b' next (18), tail c..h
  private val terms: Seq[String] =
    (Seq.fill(24)("a") ++ Seq.fill(18)("b") ++ Seq.fill(6)("c") ++
      Seq.fill(4)("d") ++ Seq.fill(3)("e") ++ Seq.fill(3)("f") ++
      Seq.fill(1)("g") ++ Seq.fill(1)("h"))
  private val toks: Seq[TokenRec] =
    terms.zipWithIndex.map { case (t, i) => TokenRec("src0", i.toLong, t) }

  private def batchFold(seq: Seq[TokenRec], k: Int): Seq[MgItem] = {
    val agg = new MisraGriesAgg(k)
    agg.finish(seq.sortBy(_.pos).foldLeft(agg.zero)((b, t) => agg.reduce(b, t.term)))
  }

  test("drained stream sketch equals the batch fold across a mid-key batch split") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val mem = MemoryStream[TokenRec]
    val q = TokenStream.streamingHeavyHitters(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      // split INSIDE the key's sequence — the state handoff is what's tested
      val (first, second) = toks.splitAt(23)
      mem.addData(first: _*)
      q.processAllAvailable()
      mem.addData(second: _*)
      q.processAllAvailable()
      val rows = s.table("hh").collect()
      // update mode emits one row per batch; the LAST row is the drained state
      val last = rows.last
      assert(last.getString(0) == "src0")
      assert(last.getLong(1) == terms.size.toLong)
      val streamed = last.getSeq[org.apache.spark.sql.Row](2)
        .map(r => MgItem(r.getString(0), r.getLong(1)))
      assert(streamed == batchFold(toks, 3),
        s"stream $streamed != batch ${batchFold(toks, 3)}")
    } finally q.stop()
  }

  test("drained state keeps every guaranteed-frequent item within the MG bound") {
    val n = terms.size
    val k = 3
    val out = batchFold(toks, k)
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // any item with true count > n/(k+1) must survive
    exact.filter(_._2 > n / (k + 1)).keys.foreach { t =>
      assert(out.exists(_.term == t), s"guaranteed-frequent '$t' missing")
    }
    // estimates undercount by at most n/(k+1), never overcount
    out.foreach { i =>
      assert(i.est <= exact(i.term), s"overcount on $i")
      assert(exact(i.term) - i.est <= n / (k + 1), s"bound broken on $i")
    }
  }

  test("keys sketch independently (a second source never perturbs the first)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val other = Seq.fill(40)("zzz").zipWithIndex
      .map { case (t, i) => TokenRec("src1", i.toLong, t) }
    val mem = MemoryStream[TokenRec]
    val q = TokenStream.streamingHeavyHitters(mem.toDS(), k = 3)
      .writeStream.format("memory").queryName("hh2")
      .outputMode("update").start()
    try {
      mem.addData((toks ++ other): _*)
      q.processAllAvailable()
      val bySrc = s.table("hh2").collect()
        .map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1 + 1)
          .map(x => MgItem(x.getString(0), x.getLong(1)))).toMap
      assert(bySrc("src0") == batchFold(toks, 3))
      assert(bySrc("src1") == Seq(MgItem("zzz", 40L)))
    } finally q.stop()
  }
}
