package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class NormalizeNFCSpec extends SparkSpec {

  test("decomposed sequences compose; already-NFC text passes through " +
      "unchanged; dedup hashes converge after normalization") {
    val s = spark
    import s.implicits._
    val decomposed = "e\u0301cole"   // e + COMBINING ACUTE
    val precomposed = "\u00e9cole"   // e-acute as one code point
    val df = Seq((1L, decomposed), (2L, precomposed), (3L, "plain ascii"))
      .toDF("id", "t")
      .select(col("id"), nfc(col("t")).as("n"), length(col("t")).as("lin"),
        length(nfc(col("t"))).as("lout"), md5(nfc(col("t"))).as("h"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    // both spellings normalize to the same bytes -> same dedup hash
    assert(rows(1L)._1 == precomposed && rows(1L)._4 == rows(2L)._4)
    assert(rows(1L)._2 == 6 && rows(1L)._3 == 5, "composition dropped one code point")
    // NFC input untouched (incl. the isNormalized fast path)
    assert(rows(2L)._1 == precomposed && rows(3L)._1 == "plain ascii")
  }

  test("null propagates") {
    val s = spark
    import s.implicits._
    assert(Seq(Tuple1(null: String)).toDF("t")
      .select(nfc(col("t"))).collect()(0).isNullAt(0))
  }
}
