package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.LshPlanner

/** Hand-computed values and monotonicity laws for the LSH parameter
  * planner (no Spark session needed — pure arithmetic).
  */
class LshPlannerSpec extends AnyFunSuite {

  test("collision probability: boundary values and the hand-computed point") {
    assert(LshPlanner.collisionProb(0.0, 4, 4) == 0.0)
    assert(LshPlanner.collisionProb(1.0, 4, 4) == 1.0)
    // b=4, r=4, s=0.8: 1 - (1 - 0.8^4)^4 = 1 - (1 - 0.4096)^4
    val expected = 1.0 - math.pow(1.0 - math.pow(0.8, 4), 4)
    assert(math.abs(LshPlanner.collisionProb(0.8, 4, 4) - expected) < 1e-15)
    assert(math.abs(expected - 0.87850) < 5e-5) // hand-computed: 1-0.5904^4
  }

  test("collision probability is monotone in similarity") {
    val ps = (0 to 100).map(i => LshPlanner.collisionProb(i / 100.0, 8, 2))
    assert(ps.zip(ps.tail).forall { case (a, b) => a <= b })
  }

  test("curve thresholds: registered d2/d3 shape and the high/low ends") {
    // the registry's 16-hash / 4x4 banding targets ~0.707 Jaccard
    assert(math.abs(LshPlanner.curveThreshold(4, 4)
      - math.pow(0.25, 0.25)) < 1e-15)
    // more bands -> lower threshold (catches fainter similarity)
    assert(LshPlanner.curveThreshold(8, 2) < LshPlanner.curveThreshold(4, 4))
    assert(LshPlanner.curveThreshold(2, 8) > LshPlanner.curveThreshold(4, 4))
  }

  test("plan picks the factorization nearest the target, both directions") {
    val low = LshPlanner.plan(16, 0.35)
    assert((low.bands, low.rows) == (8, 2),
      s"0.35 target should pick 8x2 (threshold ~0.354), got $low")
    val high = LshPlanner.plan(16, 0.75)
    assert((high.bands, high.rows) == (4, 4),
      s"0.75 target should pick 4x4 (threshold ~0.707), got $high")
    // degenerate budgets still plan
    assert(LshPlanner.factorizations(1) == Seq((1, 1)))
  }

  test("error areas: tightening the budget at the same target cannot " +
      "improve both error areas") {
    val small = LshPlanner.plan(16, 0.5)
    val big = LshPlanner.plan(128, 0.5)
    // a 128-hash curve is steeper: both areas shrink vs 16 hashes
    assert(big.fpArea <= small.fpArea + 1e-12)
    assert(big.fnArea <= small.fnArea + 1e-12)
    assert(small.fpArea > 0 && small.fnArea > 0)
  }
}
