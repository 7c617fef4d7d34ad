package graft.similarity

/** MinHash-LSH parameter planner — the design-time companion to the d2/d3
  * banding operators: given a signature budget of k hashes and a target
  * Jaccard threshold, choose the (bands b, rows r) factorization whose
  * S-curve threshold (1/b)^(1/r) sits closest to the target, and report
  * the curve's false-positive / false-negative areas so the trade-off is
  * a number, not a vibe (Mining of Massive Datasets §3.4; the same
  * analysis behind every production near-dup configuration). Pure driver-
  * side arithmetic over O(divisors(k)) candidates — nothing here touches
  * data; the chosen (b, r) parameterizes the distributed banding join.
  */
object LshPlanner {

  /** One candidate configuration. `threshold` is the similarity at which
    * collision probability crosses ~1/2; `fpArea` integrates collision
    * probability below the target (pairs you'll verify and discard);
    * `fnArea` integrates miss probability above it (true pairs lost).
    */
  final case class Plan(bands: Int, rows: Int, threshold: Double,
      fpArea: Double, fnArea: Double)

  /** P(signature collision in >= 1 band) at Jaccard similarity s. */
  def collisionProb(s: Double, bands: Int, rows: Int): Double = {
    require(s >= 0 && s <= 1, s"similarity out of range: $s")
    1.0 - math.pow(1.0 - math.pow(s, rows.toDouble), bands.toDouble)
  }

  /** The similarity where the S-curve is steepest, ~ the collision-prob
    * 1/2 crossing: (1/b)^(1/r).
    */
  def curveThreshold(bands: Int, rows: Int): Double =
    math.pow(1.0 / bands, 1.0 / rows)

  private def areas(bands: Int, rows: Int, target: Double,
      steps: Int = 1000): (Double, Double) = {
    var fp = 0.0
    var fn = 0.0
    var i = 0
    while (i < steps) {
      val s = (i + 0.5) / steps
      val p = collisionProb(s, bands, rows)
      if (s < target) fp += p else fn += (1.0 - p)
      i += 1
    }
    (fp / steps, fn / steps)
  }

  /** All (b, r) with b * r == k, b >= 1, r >= 1. */
  def factorizations(k: Int): Seq[(Int, Int)] = {
    require(k >= 1, s"signature budget must be >= 1, got $k")
    (1 to k).filter(k % _ == 0).map(b => (b, k / b))
  }

  /** Pick the factorization whose curve threshold is closest to `target`
    * (ties: fewer bands — cheaper candidate volume).
    */
  def plan(k: Int, target: Double): Plan = {
    require(target > 0 && target < 1, s"target must be in (0,1), got $target")
    val (b, r) = factorizations(k)
      .minBy { case (b, r) =>
        (math.abs(curveThreshold(b, r) - target), b)
      }
    val (fp, fn) = areas(b, r, target)
    Plan(b, r, curveThreshold(b, r), fp, fn)
  }
}
