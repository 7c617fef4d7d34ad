package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-ratio measurement for the bounded-round graph family (VERDICT
  * r15 #6 / r16 #6): g2_pagerank, g8_kcore, g9_hits,
  * g16_harmonic_centrality each claim near-linear scaling — bounded
  * rounds, per-round scratch checkpoints so lineage stays O(1), scalar-
  * only driver — but until this experiment the claim was an argument,
  * not a measurement. This times each query at sf0.1 and at x10/x40
  * fact replications and prints wall-vs-scale ratios for BENCH_NOTES
  * ("Round 17" table); superlinear growth would expose a per-round
  * lineage or state leak the fixed-point specs can't see.
  *
  * Scaled generation reuses CensusCrossoverExperiment's key-offset
  * scheme on the two tables this family reads — orders and lineitem
  * replicated R-fold with orderkeys offset in BOTH (join integrity
  * preserved) — while part/supplier/customer key domains stay fixed, so
  * per-key row counts grow R-fold: the direction real corpora grow, and
  * the direction that stresses the peel/relax aggregates. Dimension
  * tables are byte-copied unscaled. Consequence worth naming: order
  * replicas repeat their part composition, so every co-occurrence
  * pair's support multiplies by R and pairs at support 1 cross g3's
  * support>=2 floor — the EDGE set grows toward the support-1 closure
  * and then saturates (nodes are capped by the fixed part domain).
  * Wall-clock is therefore expected to grow SUBlinearly in R for the
  * post-edges rounds and about linearly for the fact-side edge builds.
  *
  * Timing protocol is Bench's: per-query MIN over `runs` fresh
  * constructions, noop sink, whole-query wall. The shared co-occurrence
  * artifact is prebuilt per dir and timed once as `_edges_build` (the
  * bench-artifact convention), so g8/g16 measure their rounds, while
  * g2/g9 pay their own edge materialization per run exactly as they do
  * under Bench.
  *
  * Run: sbt "Test/runMain graft.GraphScaleExperiment [scalesCsv] [runs]"
  * (defaults 10,40 and 2).
  */
object GraphScaleExperiment {

  private val Family =
    Seq("g2_pagerank", "g8_kcore", "g9_hits", "g16_harmonic_centrality")

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.map(_.split(',').toSeq.map(_.trim.toInt))
      .getOrElse(Seq(10, 40))
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val baseDir = "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))

    val dirs = ("sf0.1", baseDir) +: scales.map { r =>
      val d = s"/tmp/graft_graph_x$r"
      generate(spark, baseDir, d, r)
      (s"x$r", d)
    }

    // warmup through the whole stack (Bench's rule)
    Tables.lineitem(spark, baseDir).groupBy("l_returnflag").count()
      .write.format("noop").mode("overwrite").save()

    def timeOne(name: String, dir: String): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.min

    val base = scala.collection.mutable.Map[String, Double]()
    println(f"GRAPHSCALE ${"query"}%-26s ${"scale"}%-6s ${"sec"}%7s  vs_sf0.1")
    for ((label, dir) <- dirs) {
      // cached per (session, dir): first call builds, timed once — the
      // `_edges_build` convention (excluded from per-query time in Bench)
      val tE = {
        val t0 = System.nanoTime()
        graft.queries.GraphTemporalQueries.pretrainEdges(spark, dir)
        (System.nanoTime() - t0) / 1e9
      }
      report("_edges_build", label, tE, base)
      for (name <- Family)
        report(name, label, timeOne(name, dir), base)
    }
    Scratch.sweep(spark)
    spark.stop()
  }

  private def report(name: String, label: String, sec: Double,
      base: scala.collection.mutable.Map[String, Double]): Unit = {
    if (label == "sf0.1") base(name) = sec
    val ratio = base.get(name).map(b => f"${sec / b}%8.2f").getOrElse("       -")
    println(f"GRAPHSCALE $name%-26s $label%-6s $sec%7.2f $ratio")
  }

  /** Replicate orders+lineitem R-fold with offset orderkeys (the census
    * generator's scheme, facts only) and byte-copy the dim tables.
    */
  def generate(s: SparkSession, baseDir: String, outDir: String, r: Int): Unit = {
    val done = new java.io.File(s"$outDir/_OK")
    if (done.exists()) { println(s"GRAPHSCALE scaled dir $outDir reused"); return }
    new java.io.File(outDir).mkdirs()
    val rep = explode(sequence(lit(0L), lit(r - 1L))).as("rep")

    val ord = Tables.orders(s, baseDir)
    val oOff = ord.agg(max(col("o_orderkey"))).head.getLong(0) + 1
    ord.select(rep, col("*"))
      .select((col("o_orderkey") + col("rep") * oOff).as("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    Tables.lineitem(s, baseDir).select(rep, col("*"))
      .select((col("l_orderkey") + col("rep") * oOff).as("l_orderkey"),
        col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate"))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")

    for (dim <- Seq("region", "nation", "supplier", "customer", "part"))
      copyTree(Paths.get(baseDir, s"$dim.parquet"),
        Paths.get(outDir, s"$dim.parquet"))

    done.createNewFile()
    println(s"GRAPHSCALE generated $outDir at x$r")
  }

  private def copyTree(from: Path, to: Path): Unit =
    if (Files.isDirectory(from)) {
      Files.createDirectories(to)
      val walk = Files.walk(from)
      try walk.forEach { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
        ()
      } finally walk.close()
    } else {
      Files.copy(from, to, StandardCopyOption.REPLACE_EXISTING); ()
    }
}
