package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * First line of defense at runtime is AQE's skew-join split
  * (spark.sql.adaptive.skewJoin.enabled, on by default) — it needs no code
  * change and should be preferred. Salting is the plan-level fallback for
  * the cases AQE can't fix: a single hot key whose rows exceed one
  * executor's memory on BOTH sides, or a non-shuffle consumer downstream
  * that must inherit the salted distribution.
  *
  * Mechanics: the skewed (big) side gets a deterministic salt in [0, n)
  * derived from a high-cardinality column, splitting each hot key into n
  * sub-keys; the other side is replicated n times (explode), so the join on
  * (key, salt) meets every row — same result set, n-way parallel hot keys,
  * at the cost of replicating the small side n times.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
      saltColumns: Seq[String], n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    // withColumn silently REPLACES an existing column — a caller's _salt
    // data would vanish from the output with no error
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs must not carry the reserved column _salt")
    val salted = big.withColumn("_salt",
      pmod(hash(saltColumns.map(col): _*), lit(n)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
