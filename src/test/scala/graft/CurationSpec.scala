package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Curation._

class CurationSpec extends SparkSpec {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog again today"),
      (2L, "en", "the quick brown fox jumps over the lazy dog again today"), // dup of 1
      (3L, "en", "tiny"),                                                    // fails gate
      (4L, "de", "der schnelle braune fuchs springt heute wieder sehr hoch"),
      (5L, "de", "der schnelle braune fuchs springt heute wieder sehr hoch"), // dup of 4
      (6L, "en", "a different english document with enough ordinary words here")
    ).toDF("doc_id", "lang", "text")
      .withColumn("w", split(lower(col("text")), " "))
  }

  test("dedup keeps the smallest id per distinct text") {
    val kept = dedupExactKeepFirst(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 6L))
  }

  test("quality annotate + gate drop the degenerate doc") {
    val gated = qualityGate(qualityAnnotate(docs, "w"),
      minTokens = 5, maxTokens = 100, minMtlX1000 = 2000, maxMtlX1000 = 12000)
    assert(!gated.select("doc_id").collect().map(_.getLong(0)).contains(3L))
    // annotate arithmetic: doc 1 has 11 tokens, 45 letters -> 4091
    val r = qualityAnnotate(docs, "w").filter(col("doc_id") === 1L)
      .select("n_tokens", "mtl_x1000").head()
    assert(r.getLong(0) == 11L && r.getLong(1) == 4091L, r.toString)
  }

  test("topPerKey keeps n rows per stratum under a total order") {
    val top = topPerKey(docs, "lang", Seq(col("doc_id")), n = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top == Set(1L, 2L, 4L, 5L))
  }

  test("helper columns never clobber same-named user columns") {
    val s = spark
    import s.implicits._
    // a frame that already carries the helper names with REAL data in them
    val tricky = Seq(
      (1L, "en", "same text", 100L, 200L),
      (2L, "en", "same text", 101L, 201L),
      (3L, "de", "other text", 102L, 202L)
    ).toDF("doc_id", "lang", "text", "_keep_rn", "_top_rn")
    val deduped = dedupExactKeepFirst(tricky, "text", "doc_id")
    assert(deduped.columns.contains("_keep_rn"), "user column dropped")
    assert(deduped.filter(col("doc_id") === 1L).select("_keep_rn").head().getLong(0) == 100L,
      "user _keep_rn data clobbered")
    val top = topPerKey(tricky, "lang", Seq(col("doc_id")), n = 1)
    assert(top.columns.contains("_top_rn"), "user column dropped")
    assert(top.filter(col("doc_id") === 1L).select("_top_rn").head().getLong(0) == 200L,
      "user _top_rn data clobbered")
  }

  test("chained stages equal the inlined c1 flow on the real table") {
    // the registered c1 query IS this composition; its DuckDB oracle row
    // protects the semantics — here we just pin the chain runs end-to-end
    val out = SparkEntry.queries("c1_curation_apply")(spark, sfDir).collect()
    assert(out.nonEmpty && out.forall(_.getLong(1) > 0))
  }
}
