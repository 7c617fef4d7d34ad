package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** The ONE definition of exact cosine top-k — the brute-force baseline
  * every approximate path (LSH buckets, IVF probes) is measured against.
  * Kept in a single place so e1's oracle row, e4's self-reported recall,
  * and IvfIndexSpec's recall floor can never drift onto different
  * tie-break or norm conventions.
  *
  * `emb` must carry (vec_id, v: array<double>), `queries` (q_id,
  * qv: array<double>). The query side is broadcast (evaluation sets are
  * small by construction — at corpus scale recall is estimated on a
  * sample, never all queries), the big side streams once with no
  * shuffle, self-pairs are excluded, and the (cos desc, cand_id) order
  * is total.
  */
object ExactCosine {

  /** Ranking is over the 5-dp ROUNDED cosine (then cand_id) — the
    * convention e1's DuckDB oracle uses; ranking on the raw cosine would
    * break ties differently whenever two candidates agree at 5 dp.
    */
  def topK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    // norms are per-vector: computed once per row BEFORE the join, never
    // inside the pair expression
    val e = emb.withColumn("_nrm", l2Norm(col("v")))
    val q = queries.withColumn("_qnrm", l2Norm(col("qv")))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        round(dot(col("v"), col("qv")) / (col("_nrm") * col("_qnrm")), 5).as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(desc("cos"), col("cand_id"))))
      .filter(col("rn") <= k)
  }
}
