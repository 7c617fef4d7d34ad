package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** ShinglesExpr (native) == shingles(tokens(text), n) (HOF reference
  * semantics), including the contract edges: null text, short docs,
  * consecutive spaces (empty tokens are kept), non-ASCII lowercasing,
  * and widths 1-4.
  */
class ShinglesExprSpec extends SparkSpec {

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      Some("The Quick Brown Fox Jumps"),
      Some("one two"),                       // < 3 tokens
      Some("a"),                             // single token
      Some(""),                              // empty string -> [""] token
      Some("double  space   run"),           // empty tokens preserved
      Some("İstanbul STRASSE ÉCOLE Čech"),   // non-ASCII lowercase paths
      Some(" leading and trailing "),
      None                                   // null -> null
    ).toDF("text")
  }

  test("native == HOF for widths 1 through 4, including all contract edges") {
    for (n <- 1 to 4) {
      val diff = docs.select(
          shinglesNative(col("text"), n).as("native"),
          shingles(tokens(col("text")), n).as("hof"))
        .filter(
          // null-safe inequality: both-null rows agree, one-null rows differ
          !(col("native") <=> col("hof")))
        .count()
      assert(diff == 0, s"native != HOF at n=$n")
    }
  }

  test("native == HOF on the real documents table") {
    val diff = Tables.documents(spark, sfDir).select(
        shinglesNative(col("text"), 3).as("native"),
        shingles(tokens(col("text")), 3).as("hof"))
      .filter(!(col("native") <=> col("hof"))).count()
    assert(diff == 0)
  }

  test("null propagates and short docs produce the empty array") {
    val rows = docs.select(shinglesNative(col("text"), 3)).collect()
    assert(rows.last.isNullAt(0))
    val one = docs.filter(col("text") === "a")
      .select(shinglesNative(col("text"), 3)).head
    assert(one.getSeq[String](0).isEmpty)
  }
}
