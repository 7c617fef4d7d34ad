package graft

import graft.export.Factors
import graft.model.{AlsConfig, AlsTrainer}
import graft.sources.Sources
import org.apache.spark.sql.functions._

class FactorsSpec extends SparkSpec {

  private lazy val model = {
    val s = spark
    import s.implicits._
    val ratings = (for { u <- 0 until 10; i <- 0 until 8 if (u + i) % 3 == 0 }
      yield (u, i, 2f)).toDF("user_idx", "item_idx", "count")
    AlsTrainer.fit(ratings, AlsConfig(rank = 3, maxIter = 1,
      userBlocks = 2, itemBlocks = 2))
  }

  test("factor rows follow the (id, \"[f0 f1 ...]\") CSV contract") {
    val rows = Factors.userFactorRows(model)
    assert(rows.columns.toSeq == Seq("id", "features"))
    val f = rows.orderBy("id").head().getString(1)
    assert(f.startsWith("[") && f.endsWith("]"))
    assert(f.stripPrefix("[").stripSuffix("]").split(" ").length == 3)
  }

  test("umap input is keyed (not positional) and exports through the CSV sink") {
    val s = spark
    import s.implicits._
    val labels = (0 until 8).map(i => (i, s"genre${i % 3}")).toDF("id", "label")
    val out = Factors.umapInput(model, labels)
    assert(out.columns.toSeq == Seq("item_label", "id", "item_factor"))
    val dir = "/root/repo/target/test-tmp/umap_input"
    Sources.writeSingleCsv(out, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == out.count())
    assert(back.columns.toSeq == out.columns.toSeq)
  }
}
