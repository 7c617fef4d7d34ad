package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** g8_kcore leg of the checkpoint-cadence measurement (HitsCadenceExperiment
  * is the g9 leg; same VERDICT r17 #6 item). Each peel round references the
  * previous active set TWICE (the u- and v-side left-semi joins), so a
  * skipped checkpoint inlines that round's subtree twice in the next plan —
  * ReusedExchange dedups the shuffle, and whether the residual re-execution
  * beats the saved write+read cycle is exactly what to measure, at sf0.1
  * and the x10 fact replica. Results are integer sets — asserted identical
  * across cadences.
  *
  * Run: sbt "Test/runMain graft.KcoreCadenceExperiment [runs]"
  */
object KcoreCadenceExperiment {

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val baseDir = "/root/testdata/sf0.1"
    val x10 = "/tmp/graft_graph_x10"
    GraphScaleExperiment.generate(spark, baseDir, x10, 10)

    Tables.lineitem(spark, baseDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    // the co-occurrence edge table built ONCE per dir outside timing —
    // the `_edges_build` convention (both cadence arms read the same
    // parquet, so the A/B measures only the rounds)
    def edgesFor(d: String): String = {
      val p = Scratch.dir(spark, s"g8cad_edges_${Scratch.key(d)}")
      if (!new java.io.File(p, "_SUCCESS").exists()) {
        val pairs = Tables.lineitem(spark, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        pairs.as("x")
          .join(pairs.as("y"),
            col("x.l_orderkey") === col("y.l_orderkey")
              && col("x.l_partkey") < col("y.l_partkey"))
          .groupBy(col("x.l_partkey").as("u"), col("y.l_partkey").as("v"))
          .agg(count(lit(1)).as("w")).filter(col("w") >= 2)
          .select(col("u"), col("v"))
          .write.mode("overwrite").parquet(p)
      }
      p
    }

    val seq = new java.util.concurrent.atomic.AtomicLong()
    def kcore(s: SparkSession, d: String, every: Int): DataFrame = {
      val (kk, rounds) = (2, 8)
      val scratch = Scratch.dir(s, s"g8cad_${seq.incrementAndGet()}")
      def ckpt(df: DataFrame, name: String) = {
        df.write.mode("overwrite").parquet(s"$scratch/$name")
        s.read.parquet(s"$scratch/$name")
      }
      val e0 = s.read.parquet(edgesFor(d))
      def among(act: DataFrame) = e0
        .join(act.select(col("n").as("u")), Seq("u"), "left_semi")
        .join(act.select(col("n").as("v")), Seq("v"), "left_semi")
      def degrees(ee: DataFrame) = ee
        .select(col("u").as("n")).union(ee.select(col("v")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
      var act = ckpt(e0.select(col("u").as("n"))
        .union(e0.select(col("v"))).distinct(), "a0")
      var prev = act
      for (r <- 1 to rounds) {
        prev = act
        val next = degrees(among(act)).filter(col("deg") >= kk).select(col("n"))
        act = if (r % every == 0 || r == rounds) ckpt(next, s"a$r") else next
      }
      val degF = degrees(among(act))
      val cPrev = prev.agg(count(lit(1)).as("np"))
      val cCur = act.agg(count(lit(1)).as("nc"))
      act.join(degF, Seq("n"), "left")
        .crossJoin(broadcast(cPrev)).crossJoin(broadcast(cCur))
        .select(col("n").as("p_partkey"),
          coalesce(col("deg"), lit(0L)).as("deg_core"),
          (col("np") === col("nc")).cast("int").as("converged"))
        .orderBy("p_partkey")
    }

    println(f"KCORECADENCE ${"scale"}%-6s ${"cadence"}%-8s ${"sec"}%7s")
    val resultsAt = scala.collection.mutable.Map[String, Seq[String]]()
    for ((label, dir) <- Seq(("sf0.1", baseDir), ("x10", x10));
         every <- Seq(1, 2)) {
      val rows = scala.collection.mutable.Buffer.empty[Seq[String]]
      val sec = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val out = kcore(spark, dir, every)
        out.write.format("noop").mode("overwrite").save()
        rows += out.collect().map(_.toString).toSeq
        (System.nanoTime() - t0) / 1e9
      }.min
      require(rows.distinct.size == 1, s"cadence $every nondeterministic?")
      resultsAt.get(label).foreach(prev => require(prev == rows.head,
        s"$label: cadence $every diverges from cadence 1 results"))
      resultsAt(label) = rows.head
      println(f"KCORECADENCE $label%-6s $every%-8d $sec%7.2f")
    }
    Scratch.sweep(spark)
    spark.stop()
  }
}
