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

  /** Multi-prefix variant for dimension-truncation (Matryoshka) evals:
    * top-k under the cosine of each `v[1..p]` prefix for every p in
    * `dims`, in ONE pass over the corpus — the pair join emits one
    * (dim, cos) row per prefix via explode instead of streaming the
    * corpus once per prefix. Same conventions as `topK` (5-dp rounded
    * cosine, (cos desc, cand_id) total order, per-row norms computed
    * before the join, query side broadcast), so prefix-vs-full overlap
    * is measured on the same lattice e1/e4 report on. Output carries
    * (q_id, cand_id, dim, cos, rn).
    */
  def topKPrefixes(emb: DataFrame, queries: DataFrame, k: Int,
      dims: Seq[Int]): DataFrame = {
    val e = emb.withColumn("_nrms",
      array(dims.map(p => l2Norm(slice(col("v"), 1, p))): _*))
    val q = queries.withColumn("_qnrms",
      array(dims.map(p => l2Norm(slice(col("qv"), 1, p))): _*))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        explode(array(dims.zipWithIndex.map { case (p, i) =>
          struct(lit(p.toLong).as("dim"),
            round(dot(slice(col("v"), 1, p), slice(col("qv"), 1, p))
              / (col("_nrms")(i) * col("_qnrms")(i)), 5).as("cos"))
        }: _*)).as("dc"))
      .select(col("q_id"), col("cand_id"), col("dc.dim").as("dim"),
        col("dc.cos").as("cos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dim"), col("q_id"))
          .orderBy(desc("cos"), col("cand_id"))))
      .filter(col("rn") <= k)
  }
}
