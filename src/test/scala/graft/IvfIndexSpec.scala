package graft

import graft.similarity.IvfIndex
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class IvfIndexSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val emb = Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .cache()

  // the session is shared across suites, and CacheManager substitutes this
  // cached subtree into ANY later query that contains it (it changed the
  // e2/e3 plans PlanSpec pins) — release it when this suite is done
  override def afterAll(): Unit = { emb.unpersist(); super.afterAll() }

  test("IVF top-k: sane shape, probed-cell pruning, recall vs brute force") {
    val model = IvfIndex.build(emb, nCells = 8)
    assert(model.centroids.count() == 8)
    // every vector lands in exactly one cell
    assert(model.assigned.count() == emb.count())

    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    val approx = IvfIndex.topK(model, queries, k = 5, nprobe = 3)
      .select("q_id", "cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // brute-force ground truth — the SHARED exact-baseline definition
    val exact = graft.similarity.ExactCosine.topK(emb, queries, 5)
      .select("q_id", "cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // 3 of 8 cells probed: recall must be far above the ~3/8 cell fraction
    assert(mean >= 0.5, s"mean recall@5 = $mean")
    assert(approx.values.forall(_.size <= 5))
  }

  test("save/load round-trips the index and searches identically " +
      "(cell-partitioned layout prunes probes at the file level)") {
    val model = IvfIndex.build(emb, nCells = 8)
    val dir = Scratch.dir(spark, "ivf_index")
    IvfIndex.save(model, dir)
    val loaded = IvfIndex.load(spark, dir)
    assert(loaded.centroids.count() == 8)
    assert(loaded.assigned.count() == emb.count())
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("qv"))
    def rows(m: IvfIndex.Model) =
      IvfIndex.topK(m, queries, k = 5, nprobe = 2)
        .select("q_id", "cand_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(loaded) == rows(model), "loaded index search differs")
  }

  test("e9: maintained index honors deletes/inserts without refit " +
      "(planted insert ranks first, deleted ids never surface)") {
    val out = SparkEntry.queries("e9_ivf_maintain")(spark, sfDir).collect()
    assert(out.length == 3, s"expected 3 query rows, got ${out.length}")
    out.foreach { r =>
      assert(r.getAs[Int]("top1_planted") == 1,
        s"planted duplicate not ranked first: $r")
      assert(r.getAs[Long]("n_deleted_hits") == 0L,
        s"deleted id surfaced in search results: $r")
      assert(r.getAs[Long]("n_after") ==
        r.getAs[Long]("n_base") - r.getAs[Long]("n_del") + r.getAs[Long]("n_ins"),
        s"index bookkeeping broken: $r")
    }
  }
}
