package graft

import org.apache.spark.sql.functions._

/** Planted end-to-end tests for the curation queries added in round 7
  * (t12_repetition, c3_decontaminate, c4_mixture_sample): a tiny documents
  * table with KNOWN repetition / contamination structure is written as a
  * real sf-dir, and the registered queries run against it — so the asserted
  * numbers are hand-computed, independent of the DuckDB oracle (which only
  * proves engine-vs-engine agreement).
  */
class CurationQueriesSpec extends SparkSpec {

  private lazy val plantedDir: String = {
    val s = spark
    import s.implicits._
    val dir = "/root/repo/target/test-tmp/curation_docs"
    val rows = Seq(
      // doc 0 and 20: the benchmark split (doc_id % 20 == 0)
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "srcA"),
      (20L, "red orange yellow green blue indigo violet ultraviolet", "en", "srcA"),
      // doc 1: verbatim copy of benchmark doc 0 -> overlap 6/6
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "srcA"),
      // doc 2: fully disjoint -> overlap 0/4
      (2L, "one two three four five six", "en", "srcB"),
      // doc 3: shares the first 2 of its 5 shingles with doc 0 -> 400/1000
      (3L, "alpha beta gamma delta nine ten eleven", "en", "srcB"),
      // doc 4: heavy repetition - top token 4/5, top bigram 3/4
      (4L, "spam spam spam spam ham", "en", "srcB"),
      // doc 5: 11 distinct tokens - top token 1/11, top bigram 1/10
      (5L, "zero one two three four five six seven eight nine ten", "en", "srcB")
    )
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String) =
    SparkEntry.queries(name)(spark, plantedDir)

  test("c3_decontaminate flags the copy and the half-overlap, not the disjoint doc") {
    val got = run("c3_decontaminate").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // columns: doc_id, n_sh, n_hits, overlap_x1000, contaminated
    assert(got(1L) == ((6L, 1000L, 1)), s"verbatim copy: ${got(1L)}")
    assert(got(2L) == ((0L, 0L, 0)), s"disjoint doc: ${got(2L)}")
    assert(got(3L) == ((2L, 400L, 1)), s"half overlap: ${got(3L)}")
    // benchmark docs themselves are not in the train output
    assert(!got.contains(0L) && !got.contains(20L))
  }

  test("t12_repetition computes top-token and top-bigram shares exactly") {
    val got = run("t12_repetition").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    // doc 4: 5 tokens, top token "spam" 4/5 = 800; bigrams
    // [spam spam, spam spam, spam spam, spam ham], top 3/4 = 750 -> drop
    assert(got(4L) == ((5L, 800L, 750L, 0)), s"repetitive doc: ${got(4L)}")
    // doc 5: 11 distinct tokens -> 1/11 = 91, 1/10 = 100 -> keep
    assert(got(5L) == ((11L, 91L, 100L, 1)), s"diverse doc: ${got(5L)}")
  }

  test("c4_mixture_sample accounting is consistent, bounded, and deterministic") {
    val a = run("c4_mixture_sample").collect()
    val b = run("c4_mixture_sample").collect()
    assert(a.toSeq == b.toSeq, "hash-threshold sampling must be run-stable")
    // columns: source, weight_x1000, pop_n, n_kept, chars_kept
    val bySource = a.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(bySource.keySet == Set("srcA", "srcB"))
    for ((src, (w, pop, kept, chars)) <- bySource) {
      assert(w >= 100 && w < 1000, s"$src weight $w out of range")
      assert(kept >= 0 && kept <= pop, s"$src kept $kept of $pop")
      assert(chars >= 0, s"$src chars_kept $chars")
      if (kept == 0) assert(chars == 0, s"$src: no docs kept but chars $chars")
    }
    assert(bySource("srcA")._2 == 3L && bySource("srcB")._2 == 4L)
  }
}
