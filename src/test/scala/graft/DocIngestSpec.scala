package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** streaming.DocIngest — incremental corpus ingest with ledger dedup:
  * each run drains only newly-landed files (checkpoint), dedups within
  * the batch and against everything ever ingested, and grows the ledger
  * alongside the corpus.
  */
class DocIngestSpec extends SparkSpec {

  test("ingest runs dedup within batch, against ledger, and drain-once") {
    val root = Files.createTempDirectory("doc_ingest").toString
    val (src, corpus, ledger, ckpt) =
      (s"$root/src", s"$root/corpus", s"$root/ledger", s"$root/ckpt")
    val s = spark
    import s.implicits._

    // batch 1: docs 0-9, with 9 a within-batch copy of 0's text
    Seq.tabulate(10)(i =>
        (i.toLong, if (i == 9) "text 0" else s"text $i", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
      .repartition(2).write.mode("append").parquet(src)
    streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, ckpt)
    val after1 = spark.read.parquet(corpus)
    assert(after1.count() == 9, "within-batch dup not dropped")
    assert(after1.filter(col("doc_id") === 9).count() == 0,
      "keep-first rule dropped the wrong copy")
    assert(spark.read.parquet(ledger).distinct().count() == 9)

    // batch 2: two redeliveries of old content under new ids + two new docs
    Seq((100L, "text 3", "srcX"), (101L, "text 7", "srcX"),
        (102L, "genuinely new", "srcX"), (103L, "also new", "srcX"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, ckpt)
    val after2 = spark.read.parquet(corpus)
    assert(after2.count() == 11, s"expected 9+2, got ${after2.count()}")
    assert(after2.filter(col("doc_id").isin(100L, 101L)).count() == 0,
      "ledger dedup failed: redelivered content re-ingested")
    assert(after2.filter(col("doc_id").isin(102L, 103L)).count() == 2)

    // run 3 with nothing new: checkpoint must make it a no-op
    streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, ckpt)
    assert(spark.read.parquet(corpus).count() == 11,
      "re-run without new files re-ingested old batches")
  }

  test("batch curation stages compose onto the stream; gated docs stay " +
      "out of the ledger for a later relaxed re-crawl") {
    val root = Files.createTempDirectory("doc_ingest_curate").toString
    val (src, corpus, ledger, ckpt) =
      (s"$root/src", s"$root/corpus", s"$root/ledger", s"$root/ckpt")
    val s = spark
    import s.implicits._
    // doc 2 is looped boilerplate the repetition gate must drop
    Seq((1L, "a genuinely varied document body", "srcA"),
        (2L, "spam spam spam spam spam spam", "srcA"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    val ttrGate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => df.filter(
        size(array_distinct(split(lower(col("text")), " ")))
          * 1.0 / size(split(lower(col("text")), " ")) >= 0.45)
    streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, ckpt, ttrGate)
    assert(spark.read.parquet(corpus).collect().map(_.getAs[Long]("doc_id"))
      .toSeq == Seq(1L), "gate failed to drop the boilerplate doc")
    // the gated doc is NOT in the ledger: a relaxed re-crawl readmits it
    assert(spark.read.parquet(ledger).count() == 1)
    Seq((3L, "spam spam spam spam spam spam", "srcB"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, s"$root/ckpt2")
    assert(spark.read.parquet(corpus).count() >= 2,
      "relaxed re-crawl could not readmit a previously gated doc")
  }

  test("bloom decontamination gate composes onto the stream (c8's shape, " +
      "zero shuffle inside the micro-batch)") {
    val root = Files.createTempDirectory("doc_ingest_bloom").toString
    val (src, corpus, ledger, ckpt) =
      (s"$root/src", s"$root/corpus", s"$root/ledger", s"$root/ckpt")
    val s = spark
    import s.implicits._
    // the benchmark set whose content must never enter the corpus
    val benchmark = Seq("the quick brown fox jumps over the lazy dog")
    val grams = benchmark.flatMap(_.split(" ").sliding(3).map(_.mkString(" ")))
    val bloom = operators.Bloom.build(grams.toDF("g"), col("g"),
      expectedItems = 1000L, numBits = operators.Bloom.optimalNumBits(1000L, 0.01))
    // map-side gate: drop a doc when most of its grams hit the sketch —
    // a pure projection+filter, so the stream stays shuffle-free
    val gate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      df => {
        val gs = graft.functions.TextFunctions.shinglesNative(col("text"), 3)
        val hits = filter(gs,
          g => operators.Bloom.mightContain(bloom, g))
        df.filter(size(gs) === 0 || size(hits) * 2 < size(gs))
      }
    Seq((1L, "the quick brown fox jumps over the lazy dog", "srcA"),
        (2L, "a perfectly original document about graphs", "srcA"))
      .toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, ckpt, gate)
    val ids = spark.read.parquet(corpus).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(ids == Seq(2L),
      s"benchmark-contaminated doc not gated (corpus has $ids)")
  }

  test("ingest before any file has landed is a no-op, not a crash") {
    val root = Files.createTempDirectory("doc_ingest_empty").toString
    streaming.DocIngest.ingestOnce(spark, s"$root/never_written",
      s"$root/corpus", s"$root/ledger", s"$root/ckpt")
    assert(!Files.exists(java.nio.file.Paths.get(s"$root/corpus")),
      "no-op drain must not create a corpus")
  }

  test("a ledger that exists but cannot be read fails the batch (fail-closed)") {
    val root = Files.createTempDirectory("doc_ingest_bad").toString
    val (src, corpus, ledger, ckpt) =
      (s"$root/src", s"$root/corpus", s"$root/ledger", s"$root/ckpt")
    val s = spark
    import s.implicits._
    Seq((1L, "some text", "srcA")).toDF("doc_id", "text", "source")
      .write.mode("append").parquet(src)
    // a ledger directory with garbage where parquet should be — the
    // failure mode of a crash mid-append
    Files.createDirectories(java.nio.file.Paths.get(ledger))
    Files.write(java.nio.file.Paths.get(s"$ledger/part-corrupt.parquet"),
      "not parquet".getBytes("UTF-8"))
    intercept[Exception] {
      streaming.DocIngest.ingestOnce(spark, src, corpus, ledger, ckpt)
    }
    // and nothing was silently ingested without the dedup check
    assert(!Files.exists(java.nio.file.Paths.get(corpus))
        || spark.read.parquet(corpus).count() == 0,
      "batch half-applied despite unreadable ledger")
  }
}
