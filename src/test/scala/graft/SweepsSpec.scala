package graft

import graft.harness.Sweeps
import graft.model.AlsConfig

/** Sweep harnesses (M7-M9) on a tiny fixture: per-config metrics come back
  * in order, the BASELINE.md-shaped table renders, timing fields populate.
  */
class SweepsSpec extends SparkSpec {

  private lazy val ratings = {
    val s = spark
    import s.implicits._
    val rows = for {
      u <- 0 until 12
      i <- 0 until 10
      if i % 4 == u % 4 || (u + i) % 7 == 0
    } yield (u, i, 3f)
    rows.toDF("user_idx", "item_idx", "count")
  }

  private val cfg = AlsConfig(rank = 2, regParam = 0.1, alpha = 5.0,
    maxIter = 1, userBlocks = 2, itemBlocks = 2)

  test("M7: 1-D rank sweep returns one point per config with metrics") {
    val pts = Sweeps.sweep1D(ratings, ratings, cfg, 3, Seq(2, 3))
    assert(pts.map(_.rank) == Seq(2, 3))
    assert(pts.forall(p => p.fitSeconds > 0 && p.metrics.users == 12))
    assert(pts.forall(p => p.metrics.precisionAtK >= 0 && p.metrics.precisionAtK <= 1))
  }

  test("M9: learning curve over fractions populates fraction and timing") {
    val pts = Sweeps.learningCurve(ratings, ratings, cfg, 3, Seq(0.6, 1.0))
    assert(pts.map(_.fraction) == Seq(0.6, 1.0))
    assert(pts.forall(_.fitSeconds > 0))
  }

  test("M8: grid covers the cross product") {
    val pts = Sweeps.grid(ratings, ratings, cfg, 3,
      Seq(2), Seq(0.1, 1.0), Seq(5.0))
    assert(pts.map(p => (p.rank, p.regParam, p.alpha))
      == Seq((2, 0.1, 5.0), (2, 1.0, 5.0)))
  }
}
