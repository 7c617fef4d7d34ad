package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable corpus-curation stages — the library form of the flow the
  * c1_curation_apply query runs end-to-end. Each stage is DataFrame in /
  * DataFrame out so they chain in any order a pipeline needs, and each is
  * a single well-shaped distributed op:
  *
  *  - dedupExactKeepFirst: one shuffle keyed on the content hash; the
  *    deterministic keep rule is min(idCol) (window rank, not groupBy +
  *    self-join — half the shuffles);
  *  - qualityAnnotate/qualityGate: map-side projections, no shuffle;
  *  - topPerKey: one shuffle keyed on the stratum, per-key rank window —
  *    never a global sort.
  */
object Curation {

  /** First helper-column name of the family `base`, `base1`, `base2`, …
    * absent from `df` — withColumn silently REPLACES an existing column of
    * the same name, so a fixed helper name would eat user data on frames
    * that happen to carry it.
    */
  private def fresh(df: DataFrame, base: String): String =
    (Iterator(base) ++ Iterator.from(1).map(i => s"$base$i"))
      .find(n => !df.columns.contains(n)).get

  /** Keep exactly one row per distinct `textCol` value — the one with the
    * smallest `idCol`.
    */
  def dedupExactKeepFirst(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val rn = fresh(docs, "_keep_rn")
    docs.withColumn(rn, row_number().over(
        Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))))
      .filter(col(rn) === 1)
      .drop(rn)
  }

  /** Token count and mean token length (x1000, integer — exact equality
    * across engines) from a pre-tokenized array column.
    */
  def qualityAnnotate(docs: DataFrame, tokensCol: String): DataFrame = {
    val nTok = size(col(tokensCol))
    val charSum = aggregate(transform(col(tokensCol), t => length(t).cast("long")),
      lit(0L), (a, x) => a + x)
    docs.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("mtl_x1000", round(charSum * 1000 / nTok).cast("long"))
  }

  /** The t2 keep rule: length and mean-token-length windows. Expects the
    * `qualityAnnotate` columns.
    */
  def qualityGate(docs: DataFrame, minTokens: Long, maxTokens: Long,
      minMtlX1000: Long, maxMtlX1000: Long): DataFrame =
    docs.filter(col("n_tokens").between(minTokens, maxTokens)
      && col("mtl_x1000").between(minMtlX1000, maxMtlX1000))

  /** Top `n` rows per `keyCol`, ranked by `ordering` (which must be a
    * total order for determinism — tie-break on a unique id).
    */
  def topPerKey(df: DataFrame, keyCol: String, ordering: Seq[Column],
      n: Int): DataFrame = {
    val rn = fresh(df, "_top_rn")
    df.withColumn(rn, row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(ordering: _*)))
      .filter(col(rn) <= n)
      .drop(rn)
  }
}
