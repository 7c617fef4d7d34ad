package graft

import org.apache.spark.sql.functions._

/** e6_semdedup — SemDeDup over the planted corpus (see the query comment:
  * vec_id < 25 re-enters at id+10000 as a near-identical copy, and the
  * natural corpus has no pair above cosine ~0.51, so ground truth is exact:
  * the true duplicate pairs are precisely (i, i+10000) for i < 25).
  */
class SemdedupSpec extends SparkSpec {

  test("e6 flags only planted pairs (precision 1) and finds most of them") {
    val rows = SparkEntry.queries("e6_semdedup")(spark, sfDir).collect()
    assert(rows.nonEmpty, "no semantic duplicates flagged at all")
    // precision: every flagged pair is a planted (source, copy) pair —
    // the in-row `planted` evidence column must be 1 on every row
    rows.foreach { r =>
      assert(r.getAs[Long]("planted") == 1L,
        s"non-planted pair flagged as semantic dup: $r")
      val ids = Set(r.getAs[Long]("drop_id"), r.getAs[Long]("kept_id"))
      assert(ids.map(_ % 10000L).size == 1,
        s"flagged pair is not a (source, copy) pair: $r")
      assert(r.getAs[Long]("cos_x100000") >= 99000L,
        s"planted copy should be near-identical: $r")
    }
    // recall: a copy can only be missed if the 1.02-scale nudge pushed it
    // across a k-means cell boundary — rare by construction. Require >=80%.
    val nPlanted = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") < 25).count()
    assert(rows.length >= (nPlanted * 8 / 10).toInt,
      s"found ${rows.length} of $nPlanted planted duplicates")
  }

  test("e6 keeps the pair member farther from its centroid (keep-outlier)") {
    // Reconstruct csim for both members of each flagged pair via
    // IvfIndex.assign and check the drop rule: drop_id has the HIGHER
    // (csim, vec_id) — survivors are the diversity-preserving outliers.
    val d = sfDir
    val emb = spark.read.parquet(s"$d/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val planted = emb.filter(col("vec_id") < 25)
      .select((col("vec_id") + 10000L).as("vec_id"),
        transform(col("v"),
          (x, i) => when(i === 0, x * 1.02 + 0.01).otherwise(x * 1.02)).as("v"))
    val model = similarity.IvfIndex.build(emb, nCells = 8)
    val csim = similarity.IvfIndex.assign(model, emb.unionByName(planted))
      .select(col("vec_id"), col("csim")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("csim")).toMap
    val rows = SparkEntry.queries("e6_semdedup")(spark, d).collect()
    rows.foreach { r =>
      val drop = r.getAs[Long]("drop_id"); val kept = r.getAs[Long]("kept_id")
      assert(csim(drop) > csim(kept)
          || (csim(drop) == csim(kept) && drop > kept),
        s"drop rule violated: dropped $drop (csim=${csim(drop)}) " +
          s"but kept $kept (csim=${csim(kept)})")
    }
  }
}
