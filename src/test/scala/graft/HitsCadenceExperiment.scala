package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-cadence A/B for the iterative graph family's per-step
  * scratch checkpoints (VERDICT r17 #6: "the fuse-vs-recompute argument
  * is recorded but never A/B-measured — measure it rather than assert
  * it"). g9_hits is the family member where fusing is most plausible:
  * each half-step's PRE-checkpoint frame is referenced twice inside its
  * own plan (the rows and the broadcast max that rescales them), so
  * skipping a checkpoint doubles that subtree's inlining in the next
  * step's plan — bounded at cadence 2 (one skipped level), exponential
  * if every checkpoint is dropped. This times g9's exact step shape at
  * cadence 1 (checkpoint every half-step — the registered query) vs
  * cadence 2 (checkpoint h1 + the final a2 only) at sf0.1 and the x10
  * fact replica (GraphScaleExperiment's generator), Bench protocol
  * (noop sink, MIN over runs).
  *
  * Run: sbt "Test/runMain graft.HitsCadenceExperiment [runs]"
  * (g2's cadence leg of the same verdict item is settled differently:
  * the r18 runDense fold removed g2's checkpoints outright — its node
  * space is schema-bounded, which no other family member's is.)
  */
object HitsCadenceExperiment {

  def main(args: Array[String]): Unit = {
    val runs = args.headOption.map(_.toInt).getOrElse(2)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val baseDir = "/root/testdata/sf0.1"
    val x10 = "/tmp/graft_graph_x10"
    GraphScaleExperiment.generate(spark, baseDir, x10, 10)

    Tables.lineitem(spark, baseDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    val seq = new java.util.concurrent.atomic.AtomicLong()
    def hits(s: SparkSession, d: String, every: Int): DataFrame = {
      val scratch = Scratch.dir(s, s"g9cad_${seq.incrementAndGet()}")
      def ckpt(df: DataFrame, name: String, step: Int, force: Boolean) =
        if (force || step % every == 0) {
          df.write.mode("overwrite").parquet(s"$scratch/$name")
          s.read.parquet(s"$scratch/$name")
        } else df
      val ew = {
        val e = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .agg(count(lit(1)).as("w"))
        e.write.mode("overwrite").parquet(s"$scratch/ew")
        s.read.parquet(s"$scratch/ew")
      }
      def authStep(hub: DataFrame, r: Int, step: Int, force: Boolean) = {
        val a = ew.join(hub, Seq("c")).groupBy(col("s"))
          .agg(sum(col("h") * col("w")).as("a"))
        ckpt(a.crossJoin(broadcast(a.agg(max(col("a")).as("m"))))
          .select(col("s"), expr("a * 1000 div m").as("a")), s"a$r", step, force)
      }
      def hubStep(auth: DataFrame, r: Int, step: Int) = {
        val h = ew.join(auth, Seq("s")).groupBy(col("c"))
          .agg(sum(col("a") * col("w")).as("h"))
        ckpt(h.crossJoin(broadcast(h.agg(max(col("h")).as("m"))))
          .select(col("c"), expr("h * 1000 div m").as("h")), s"h$r", step,
          force = false)
      }
      val hub0 = ew.select(col("c")).distinct().withColumn("h", lit(1000L))
      val a2 = authStep(
        hubStep(authStep(hub0, 1, step = 1, force = false), 1, step = 2),
        2, step = 3, force = true)
      val deg = ew.groupBy(col("s")).agg(count(lit(1)).as("n_customers"))
      a2.join(deg, Seq("s"))
        .select(col("s"), col("a").as("auth_x1000"), col("n_customers"))
        .orderBy(desc("auth_x1000"), col("s")).limit(100)
    }

    println(f"HITSCADENCE ${"scale"}%-6s ${"cadence"}%-8s ${"sec"}%7s")
    val resultsAt = scala.collection.mutable.Map[String, Seq[String]]()
    for ((label, dir) <- Seq(("sf0.1", baseDir), ("x10", x10));
         every <- Seq(1, 2)) {
      val rows = scala.collection.mutable.Buffer.empty[Seq[String]]
      val sec = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val out = hits(spark, dir, every)
        out.write.format("noop").mode("overwrite").save()
        rows += out.collect().map(_.toString).toSeq
        (System.nanoTime() - t0) / 1e9
      }.min
      // cadence must never change results (integer arithmetic, total
      // order): assert it across runs AND across cadences per scale
      require(rows.distinct.size == 1, s"cadence $every nondeterministic?")
      resultsAt.get(label).foreach(prev => require(prev == rows.head,
        s"$label: cadence $every diverges from cadence 1 results"))
      resultsAt(label) = rows.head
      println(f"HITSCADENCE $label%-6s $every%-8d $sec%7.2f")
    }
    Scratch.sweep(spark)
    spark.stop()
  }
}
