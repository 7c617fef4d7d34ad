package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class DotProductSpec extends SparkSpec {

  test("native dot equals the HOF composition bit-for-bit on real embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val pairs = emb.as("a").join(emb.as("b"),
      col("b.vec_id") === col("a.vec_id") + 1)
      .select(dot(col("a.v"), col("b.v")).as("native"),
        dotHof(col("a.v"), col("b.v")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.count() > 0)
  }

  test("hand values, null propagation, mismatched lengths") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(1.0), Seq(2.0, 3.0))
    ).toDF("a", "b").select(dot(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0)) // length mismatch -> null
  }

  test("null ELEMENTS null the product like the HOF form — never read as 0") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq[Option[Double]](Some(1.0), None), Seq[Option[Double]](Some(2.0), Some(3.0)))
    ).toDF("a", "b")
      .select(dot(col("a"), col("b")).as("native"),
        dotHof(col("a"), col("b")).as("hof"))
    val r = df.collect()(0)
    assert(r.isNullAt(0), "native read a null slot as 0.0")
    assert(r.isNullAt(1)) // the semantics baseline agrees
  }
}
