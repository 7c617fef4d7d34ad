package graft

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Phase profile of the `_pq_build` / `_ivf_build` / `_qc_fit` harness
  * builds (VERDICT r17 #7: "profile one; measured reduction or a
  * documented cost-is-honest-training verdict with the profile"). Times
  * each phase of PqIndex.build's exact shape — sample+cache, the m
  * concurrent seeded k-means fits (mllib runs maxIter driver-synchronized
  * rounds, each a Spark job over the cached sample), the single-pass
  * encode write — plus the other two builds whole, so the verdict has
  * numbers instead of a guess.
  *
  * Run: sbt "Test/runMain graft.PqBuildProfile"
  */
object PqBuildProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Tables.embeddings(spark, sfDir).groupBy().count()
      .write.format("noop").mode("overwrite").save()
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PQPROFILE $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f")
      r
    }

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val (m, k, seed) = (4, 16, 123L)
    val dim = emb.select(size(col("v"))).head().getInt(0)
    val subDim = dim / m
    val total = emb.count()
    val target = 200L * k
    val fitInput = t("pq: sample+cache+count") {
      val fi = (if (total <= target) emb
        else emb.sample(withReplacement = false, target.toDouble / total, seed))
        .select(col("v")).cache()
      fi.count(); fi
    }
    def slice1(si: Int) = slice(col("v"), si * subDim + 1, subDim)
    t("pq: ONE kmeans fit (maxIter=20)") {
      new KMeans().setK(k).setSeed(seed).setFeaturesCol("fv")
        .setInitMode("random")
        .fit(fitInput.select(array_to_vector(slice1(0)).as("fv")))
    }
    t("pq: ONE kmeans fit (maxIter=5)") {
      new KMeans().setK(k).setSeed(seed).setFeaturesCol("fv")
        .setInitMode("random").setMaxIter(5)
        .fit(fitInput.select(array_to_vector(slice1(0)).as("fv")))
    }
    val centers = t("pq: m=4 concurrent fits") {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      (0 until m).map { si => Future {
        new KMeans().setK(k).setSeed(seed + si).setFeaturesCol("fv")
          .setInitMode("random")
          .fit(fitInput.select(array_to_vector(slice1(si)).as("fv")))
          .clusterCenters.map(_.toArray)
      } }.map(Await.result(_, Duration.Inf))
    }
    fitInput.unpersist()
    t("pq: encode+write corpus codes") {
      val codesCol = array((0 until m).map { si =>
        val cb = typedLit(centers(si).map(_.toSeq).toSeq)
        val scores = transform(cb, c =>
          aggregate(zip_with(slice1(si), c, (a, b) => (a - b) * (a - b)),
            lit(0.0), (acc, x) => acc + x))
        (array_position(scores, array_min(scores)) - 1).cast("int")
      }: _*)
      emb.select(col("vec_id"), codesCol.as("codes"))
        .write.mode("overwrite").parquet(Scratch.dir(spark, "pqprof_codes"))
    }
    t("ivf: whole pretrainIvf") {
      graft.queries.PipelineQueries.pretrainIvf(spark, sfDir)
    }
    t("qc: whole pretrainQuality") {
      graft.queries.MlQueries.pretrainQuality(spark, sfDir)
    }
    Scratch.sweep(spark)
    spark.stop()
  }
}
