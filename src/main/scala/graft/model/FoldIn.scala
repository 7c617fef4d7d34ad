package graft.model

import org.apache.spark.ml.recommendation.ALSModel
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Implicit-ALS FOLD-IN: factors for users who arrived after training,
  * computed from the FROZEN item factors — the production serving op that
  * makes "retrain nightly, fold in continuously" possible (a full refit
  * per new user is the thing no deployment does). For implicit feedback
  * (Hu-Koren-Volinsky), given item factors Y, a user with confidences
  * c_i = 1 + alpha*r_i over observed items has the closed form
  *
  *   x_u = (YtY + sum_i alpha*|r_i| * y_i y_i^T + n_u*lambda*I)^-1
  *         * sum_{i: r_i > 0} (1 + alpha*r_i) y_i
  *
  * where n_u counts the user's r_i > 0 interactions — Spark scales the
  * ridge by numExplicits before solving (ALS.computeFactors), so the
  * fold-in must too or heavy users come out under-regularized by n_u
  *
  * — exactly one least-squares solve per user against the SAME normal
  * equations ALS's user half-step solves, so a fold-in of a user the
  * model already trained on reproduces (up to the final half-step's
  * convergence state) that user's trained factor; FoldInSpec pins the
  * cosine floor and the serving consistency.
  *
  * Scale shape: YtY is k x k (rank 8 -> 64 doubles) — computed ONCE by a
  * distributed outer-product aggregate and broadcast, never a driver
  * matmul over the item table. Each new user then needs only ITS OWN
  * (y_i, r_i) list: one groupByKey over the new interactions joined to
  * item factors, with per-user state bounded by that user's history (the
  * w11 ordered-collect class), and an 8x8 dense solve per user — trivially
  * parallel, no shuffle beyond the one user_id grouping.
  */
object FoldIn {

  /** Gram matrix Y^T Y as a flat row-major k*k array, via a distributed
    * partial-aggregable sum of per-item outer products.
    */
  def gram(itemFactors: DataFrame, rank: Int): Array[Double] = {
    val k = rank
    itemFactors.select(col("features")).rdd
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .aggregate(new Array[Double](k * k))(
        (acc, y) => {
          var i = 0
          while (i < k) {
            var j = 0
            while (j < k) { acc(i * k + j) += y(i) * y(j); j += 1 }
            i += 1
          }
          acc
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) += b(i); i += 1 }; a })
  }

  /** Solve A x = b for symmetric positive-definite A (row-major k x k)
    * by Gaussian elimination with partial pivoting — k is the ALS rank
    * (single digits to low hundreds), so this is microseconds per user.
    */
  private[model] def solve(aIn: Array[Double], bIn: Array[Double]): Array[Double] = {
    val k = bIn.length
    val a = aIn.clone(); val b = bIn.clone()
    var col = 0
    while (col < k) {
      var p = col
      var r = col + 1
      while (r < k) { if (math.abs(a(r * k + col)) > math.abs(a(p * k + col))) p = r; r += 1 }
      if (p != col) {
        var j = 0
        while (j < k) { val t = a(col * k + j); a(col * k + j) = a(p * k + j); a(p * k + j) = t; j += 1 }
        val t = b(col); b(col) = b(p); b(p) = t
      }
      val piv = a(col * k + col)
      require(math.abs(piv) > 1e-12, "singular normal equations in fold-in")
      r = col + 1
      while (r < k) {
        val f = a(r * k + col) / piv
        var j = col
        while (j < k) { a(r * k + j) -= f * a(col * k + j); j += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](k)
    var i = k - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < k) { s -= a(i * k + j) * x(j); j += 1 }
      x(i) = s / a(i * k + i)
      i -= 1
    }
    x
  }

  /** Fold-in factors for every user in `ratings` (user_idx, item_idx,
    * count): returns (user_idx, features array<double>). Items absent
    * from the model are dropped (cold items have no factor — the same
    * coldStartStrategy=drop stance as transform). `nonnegative` clips
    * the unconstrained solution at zero: the trainer fits with NNLS
    * (AlsConfig sets nonnegative), and clipping is the standard fold-in
    * approximation of the constrained solve — FoldInSpec measures the
    * residual gap (median cosine > 0.98 against trained factors; the
    * worst users are exactly those whose unconstrained optimum is
    * negative in some coordinate).
    */
  def userFactors(model: ALSModel, ratings: DataFrame,
      alpha: Double, regParam: Double,
      nonnegative: Boolean = true): DataFrame = {
    val spark = ratings.sparkSession
    import spark.implicits._
    val k = model.rank
    val yty = spark.sparkContext.broadcast(gram(model.itemFactors, k))
    val withY = ratings
      .select(col("user_idx").cast("int"), col("item_idx").cast("int"),
        col("count").cast("double"))
      .join(model.itemFactors.select(col("id").as("item_idx"),
        col("features")), Seq("item_idx"))
      .select(col("user_idx"), col("count"), col("features"))
    withY.groupByKey(_.getInt(0))
      .mapGroups { (uid: Int, rows: Iterator[Row]) =>
        // Mirrors spark-mllib's implicit-ALS half-step exactly (ALS
        // .computeFactors / NormalEquation.add in 4.1.2): confidence from
        // |r| so it is never negative; A accumulates c1*y*y^T for EVERY
        // rating but b only for r > 0 (the preference of a non-positive
        // rating is 0); and the ridge term is numExplicits * regParam —
        // Spark counts the user's r > 0 ratings and SCALES the
        // regularizer by it before LeastSquaresNESolver.solve. A flat
        // +regParam (the pre-r10 bug) under-regularizes every user with
        // n > 1 interactions by a factor of n, so fold-in would drift
        // from the trained factors exactly for the heavy users that
        // matter most in serving.
        val a = yty.value.clone()
        val b = new Array[Double](k)
        var nExplicit = 0L
        rows.foreach { row =>
          val r = row.getDouble(1)
          val y = row.getSeq[Float](2).map(_.toDouble).toArray
          val c1 = alpha * math.abs(r)
          val pref = if (r > 0.0) { nExplicit += 1; 1.0 + c1 } else 0.0
          var p = 0
          while (p < k) {
            var q = 0
            while (q < k) { a(p * k + q) += c1 * y(p) * y(q); q += 1 }
            b(p) += pref * y(p)
            p += 1
          }
        }
        var i = 0
        while (i < k) { a(i * k + i) += regParam * nExplicit; i += 1 }
        val x = solve(a, b)
        if (nonnegative) { var j = 0; while (j < k) { if (x(j) < 0) x(j) = 0.0; j += 1 } }
        (uid, x)
      }
      .toDF("user_idx", "features")
  }
}
