package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Production-parameter-scale evidence for the similarity operators. The
  * registered queries run MinHash at 16 permutations / 4 bands and ANN at
  * 3 hyperplanes — sized for the tiny fixtures. This suite runs the SAME
  * code at production parameters (k=128 / 16 bands x 8 rows; 8 hyperplanes
  * = 256 cells) and asserts what should change (candidate volume shrinks,
  * precision rises) and what must not (true duplicates still collide, the
  * join stays an equi-join — no cartesian, plan shape identical).
  */
class SimilarityScaleSpec extends SparkSpec {

  /** 200 deterministic docs: a 15-word shared prefix (pairwise shingle
    * Jaccard ~0.3 — the regime where banding parameters matter) plus 15
    * hash-derived unique words, and one planted verbatim copy of doc 0.
    */
  private lazy val corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val prefix = "the quick brown fox jumps over a lazy dog near an old river bank today"
    val docs = (0 until 200).map { i =>
      val unique = (0 until 15)
        .map(j => s"w${math.abs((i + "_" + j).hashCode) % 100000}")
      (i.toLong, s"$prefix ${unique.mkString(" ")}")
    }
    (docs :+ (1000L, docs.head._2)).toDF("doc_id", "text")
  }

  private def candidatePairs(k: Int, bands: Int, rows: Int): DataFrame = {
    val banded = corpus
      .select(col("doc_id"), minhashSigNative(col("text"), k).as("sig"))
      .select(col("doc_id"), posexplode(lshBands(col("sig"), bands, rows))
        .as(Seq("bi", "bk")))
    banded.as("x").join(banded.as("y"),
        col("x.bi") === col("y.bi") && col("x.bk") === col("y.bk")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  test("16x8 banding at k=128 keeps the true dup and sheds ~0.3-Jaccard noise") {
    val toy = candidatePairs(16, 4, 4)
    val prod = candidatePairs(128, 16, 8)
    assert(!toy.queryExecution.executedPlan.toString.contains("Cartesian"))
    assert(!prod.queryExecution.executedPlan.toString.contains("Cartesian"))
    val toyPairs = toy.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prodPairs = prod.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the verbatim copy (J=1) collides on every band at any parameter scale
    assert(toyPairs.contains((0L, 1000L)), s"toy params lost the true dup")
    assert(prodPairs.contains((0L, 1000L)), s"prod params lost the true dup")
    // the ~0.3-Jaccard background floods 4x4 banding and is exactly what
    // 16x8 exists to suppress: candidate volume must shrink sharply
    assert(toyPairs.size > 50,
      s"fixture regression: expected a flooded toy candidate set, got ${toyPairs.size}")
    assert(prodPairs.size < toyPairs.size / 3,
      s"prod banding should shed candidates: ${prodPairs.size} vs ${toyPairs.size}")
  }

  test("minhash native expression == HOF composition at k=128") {
    val both = corpus.limit(20).select(
      minhashSigNative(col("text"), 128).as("native"),
      minhashSignature(shingleHashes(col("text")), 128).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("IVF at production shape (sf0.1, 64 cells): recall floor at nprobe=4, " +
      "monotone in nprobe, candidate join never cartesian") {
    // The registered e4 runs 8 cells on the tiny fixture; this is the SAME
    // code at the shape a real corpus uses — cells ~ sqrt(N) (64 for the
    // 5k-vector sf0.1 table) with a multi-cell probe. What must hold:
    // recall far above the probed-cell fraction (4/64 = 6%), recall
    // monotone in nprobe (more probes = superset of candidates), and the
    // plan still a broadcast centroid probe + cell_id equi-join.
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .cache()
    try {
      val model = graft.similarity.IvfIndex.build(emb, nCells = 64)
      val queries = emb.filter(col("vec_id") % 200 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val truth = graft.similarity.ExactCosine.topK(emb, queries, 10)
        .select("q_id", "cand_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      def meanRecall(nprobe: Int): Double = {
        val got = graft.similarity.IvfIndex.topK(model, queries, 10, nprobe)
          .select("q_id", "cand_id").collect()
          .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
        val r = truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
        r.sum / r.size
      }
      val plan = graft.similarity.IvfIndex.topK(model, queries, 10, 4)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        "IVF probe must never degenerate to an unbroadcast cross product")
      val r4 = meanRecall(4)
      val r16 = meanRecall(16)
      assert(r4 >= 0.3, s"recall@10 with 4/64 cells probed = $r4 " +
        "(must far exceed the 6% cell fraction)")
      assert(r16 >= r4, s"recall must be monotone in nprobe: $r16 < $r4")
    } finally emb.unpersist()
  }

  test("8 hyperplanes (256 cells) shrink ANN candidate volume; exact copies still collide") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val withCopy = emb.unionByName(
      emb.filter(col("vec_id") === 0).select(lit(99999L).as("vec_id"), col("v")))
    val toyDims = Seq(0, 21, 42)
    val prodDims = Seq(0, 8, 16, 24, 32, 40, 48, 56)
    def volume(dims: Seq[Int]): Long = withCopy
      .groupBy(signBucket(col("v"), dims).as("b")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
      .head.getLong(0)
    val toyVol = volume(toyDims)
    val prodVol = volume(prodDims)
    assert(prodVol < toyVol / 4,
      s"256 cells should cut the bucket-join volume: $prodVol vs $toyVol")
    // the planted identical vector lands in its twin's cell at any depth
    val cells = withCopy.filter(col("vec_id").isin(0L, 99999L))
      .select(signBucket(col("v"), prodDims)).distinct().count()
    assert(cells == 1L)
  }

  test("e10: the norm-augmentation reduction preserves the MIPS order " +
      "(augmented norms == M, augmented-cosine rank == ip rank)") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // M = max corpus norm (the reduction's constant)
    val m = emb.select(max(l2Norm(col("v"))).as("m")).head().getDouble(0)
    val aug = emb.select(col("vec_id"),
      concat(col("v"), array(sqrt(lit(m * m) - dot(col("v"), col("v")))))
        .as("va"))
    // every augmented norm equals M (the property that makes MIPS
    // indexable by any cosine/L2 structure)
    val worst = aug.select(max(abs(l2Norm(col("va")) - lit(m)))).head().getDouble(0)
    assert(worst < 1e-9 * math.max(1.0, m), s"augmented norm strays: $worst")
    // ranking parity: for a query, order by ip == order by cosine of
    // augmented vectors (query augmented with 0 — its extra term adds 0)
    val q = emb.filter(col("vec_id") === 0L)
      .select(col("v").as("qv")).head().getSeq[Double](0)
    val s2 = spark
    import s2.implicits._
    val qlit = typedLit(q)
    val ranked = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), dot(col("v"), qlit).as("ip"),
        (dot(col("v"), qlit) / (lit(m) * lit(math.sqrt(q.map(x => x * x).sum))))
          .as("cos_aug"))
      .orderBy(desc("ip"), col("vec_id"))
      .limit(50).collect()
    val byIp = ranked.map(_.getLong(0)).toSeq
    val byCos = ranked.sortBy(r => (-r.getDouble(2), r.getLong(0)))
      .map(_.getLong(0)).toSeq
    assert(byIp == byCos, "augmented-cosine order diverged from ip order")
  }
}
