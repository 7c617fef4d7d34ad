package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Planted-fixture tests for the dedup / similarity / text-analysis
  * primitives — the non-oracle half of their coverage (the oracle rows in
  * PipelineQueries check engine-vs-engine; these check the MATH against
  * hand-built duplicates and hand-computed values).
  */
class PipelineOpsSpec extends SparkSpec {

  private lazy val docs: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the old river bank today"),
      (2L, "the quick brown fox jumps over the lazy cat near the old river bank today"),
      (3L, "completely different words about spark shuffles joins aggregates windows partitions buckets"),
      (4L, "dog bank the quick brown fox jumps over the lazy near the old river today")
    ).toDF("doc_id", "text")
  }

  private def sigOf(df: DataFrame) =
    df.select(col("doc_id"),
      minhashSignature(shingleHashes(col("text")), 16).as("sig"))

  test("exact dedup groups identical texts, keeps min doc_id") {
    val kept = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    val dup = kept.filter(col("n") > 1).collect()
    assert(dup.length == 1 && dup(0).getLong(1) == 0L && dup(0).getLong(2) == 2L)
    assert(kept.count() == 4)
  }

  test("identical docs share the full minhash signature; disjoint docs do not") {
    val sigs = sigOf(docs).collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    // one-word edit: most signature slots still agree
    val agree = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree >= 6, s"only $agree/16 slots agree for a 1-word edit (J~0.6 => E[agree]~10)")
  }

  test("LSH banding pairs the exact duplicate and not the disjoint doc") {
    val bands = sigOf(docs)
      .select(col("doc_id"),
        posexplode(lshBands(col("sig"), 4, 4)).as(Seq("bi", "bk")))
    val pairs = bands.as("x").join(bands.as("y"),
      col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("3-gram jaccard matches a hand-computed set calculation") {
    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val expected = {
      val a = shingleSet(docs.collect()(0).getString(1))
      val c = shingleSet(docs.collect()(2).getString(1))
      a.intersect(c).size.toDouble / a.union(c).size
    }
    val sh = docs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), 3)).as("sh"))
    val got = sh.as("a").join(sh.as("b"),
      col("a.doc_id") === 0L && col("b.doc_id") === 2L)
      .select(size(array_intersect(col("a.sh"), col("b.sh")))
        / size(array_union(col("a.sh"), col("b.sh"))))
      .head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("simhash: hamming(identical)=0 and edit distance orders as expected") {
    val sims = docs.select(col("doc_id"), simhash32(tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0L), sims(1L)) == 0)
    assert(hamming(sims(0L), sims(2L)) < hamming(sims(0L), sims(3L)))
  }

  test("fingerprint is order-sensitive, content-hash dedup is not") {
    val fps = docs.select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(0L) == fps(1L))
    // doc 4 is doc 0's tokens reordered — same token multiset, different order
    assert(fps(0L) != fps(4L))
    val h0 = docs.filter(col("doc_id") === 0).select(md5(col("text"))).head().getString(0)
    val h4 = docs.filter(col("doc_id") === 4).select(md5(col("text"))).head().getString(0)
    assert(h0 != h4)
  }

  test("fingerprint: empty token array is 0 (no crash), per-step mod " +
      "equals the mathematical mod-after-sum") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("alpha")),
      (3L, Seq("alpha", "beta"))
    ).toDF("id", "w").select(col("id"), fingerprint(col("w")).as("fp"))
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L, "empty doc must fingerprint to 0, not crash")
    // reference arithmetic: sum(i * hash32(token_i)) % P computed driver-side
    def h32(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    assert(got(2L) == h32("alpha") % 2147483647L)
    assert(got(3L) == (h32("alpha") + 2 * h32("beta")) % 2147483647L)
  }

  test("cosine: orthogonal=0, identical=1, hand value for known vectors") {
    val s = spark
    import s.implicits._
    val v = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(1.0, 1.0, 0.0)), (4L, Seq(2.0, 0.0, 0.0))
    ).toDF("id", "v")
    val cos = v.as("a").crossJoin(v.as("b"))
      .select(col("a.id").as("ai"), col("b.id").as("bi"),
        cosine(col("a.v"), col("b.v")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cos((1L, 2L))) < 1e-12)
    assert(math.abs(cos((1L, 4L)) - 1.0) < 1e-12)
    assert(math.abs(cos((1L, 3L)) - 1.0 / math.sqrt(2)) < 1e-12)
  }

  test("sign buckets partition the embeddings table (no empty universe)") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", signBucket(col("v"), Seq(0, 21, 42)))
    val n = emb.select("bucket").distinct().count()
    assert(n > 1 && n <= 8)
  }

  test("d11: a batch doc with verbatim corpus text resolves as a full-agreement dup") {
    val s = spark
    import s.implicits._
    val out = SparkEntry.queries("d11_incremental_neardup")(spark, sfDir).cache()
    try {
      // identical text => identical signature => same bands => candidate
      // with all 16 slots agreeing; the probe may not miss it
      val td = Tables.tokenizedDocs(spark, sfDir).select($"doc_id", $"text")
      val verbatim = td.filter($"doc_id" % 4 === 0).as("b")
        .join(td.filter($"doc_id" % 4 =!= 0).as("c"),
          col("b.text") === col("c.text"))
        .select(col("b.doc_id")).distinct()
      val flagged = out.filter($"best_agree" === 16).select($"doc_id")
      assert(verbatim.exceptAll(flagged).isEmpty,
        "a verbatim corpus copy in the batch was not flagged at agreement 16")
      // structural laws: dup implies a candidate; agreement is in range
      assert(out.filter($"is_dup" === 1 && $"n_cand" === 0).isEmpty)
      assert(out.filter($"best_agree" < 0 || $"best_agree" > 16).isEmpty)
    } finally out.unpersist()
  }

  test("a19: debiasing estimator recovers the global rate; coins are balanced") {
    val s = spark
    import s.implicits._
    val out = SparkEntry.queries("a19_randomized_response")(spark, sfDir).cache()
    try {
      // per-source bookkeeping is consistent
      assert(out.filter($"n_yes" < 0 || $"n_yes" > $"n").isEmpty)
      assert(out.filter($"n_true" < 0 || $"n_true" > $"n").isEmpty)
      // global estimator: |est - true| well inside the RR sampling noise
      // (sd of the estimator ~ sqrt(3/4n); at n=500 that's ~550 x1e4
      // units — 2000 is ~3.6 sigma)
      val g = out.agg(sum($"n").as("n"), sum($"n_yes").as("yes"),
        sum($"n_true").as("tru")).head()
      val (n, yes, tru) = (g.getLong(0), g.getLong(1), g.getLong(2))
      val est = 20000L * yes / n - 5000L
      val tr = 10000L * tru / n
      assert(math.abs(est - tr) < 2000L,
        s"estimator $est strayed from true rate $tr (n=$n)")
      // the hash-parity coin is balanced enough to debias (6-sigma band)
      val coins = Tables.documents(spark, sfDir)
        .select((hash32(concat(lit("rr1:"), $"doc_id".cast("string"))) % 2)
          .as("c"))
      val heads = coins.agg(sum($"c")).head().getLong(0)
      val total = coins.count()
      assert(math.abs(heads - total / 2.0) < 6 * math.sqrt(total / 4.0),
        s"keep-truth coin unbalanced: $heads/$total")
    } finally out.unpersist()
  }
}
