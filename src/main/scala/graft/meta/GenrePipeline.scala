package graft.meta

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The metadata/genre pipeline (SURVEY.md §3.3, EDA cells 24-108),
  * re-expressed as one distributed flow. The reference runs this in pandas
  * on the driver: per-track {tag -> val} dicts (cells 36-37), tag popularity
  * count+rank (cells 85-87), then `select_genre` picks the argmax-value tag
  * breaking ties by global popularity rank (cell 96), glued back by row
  * position (cells 102-104). Here every step is a DataFrame op and the glue
  * is a keyed join; the same code runs at any scale.
  *
  * Column roles below use the synthetic schema (user ~ track, event_type ~
  * tag, value ~ tag weight); the flow is schema-parameterized.
  */
object GenrePipeline {

  /** Per-(key, tag) weight, scaled to cent-integers so downstream equality
    * (argmax ties) is exact.
    */
  def tagScores(df: DataFrame, keyCol: String, tagCol: String,
      valCol: String): DataFrame =
    // a null tag is "untagged", not a tag: it must not flow downstream,
    // where map_from_entries would throw NULL_MAP_KEY on it at runtime
    df.filter(col(tagCol).isNotNull)
      .groupBy(col(keyCol), col(tagCol))
      .agg(round(sum(col(valCol)) * 100).cast("long").as("score_c"))

  /** A5: the {tag -> score} map per key, entry order pinned. */
  def tagMap(scores: DataFrame, keyCol: String, tagCol: String): DataFrame =
    scores.groupBy(col(keyCol))
      .agg(map_from_entries(sort_array(collect_list(
        struct(col(tagCol), col("score_c"))))).as("tags"))

  /** A4/A6 (explode-map-keys form): global tag popularity rank — tags
    * ranked by how many keys carry them, ties alphabetical. The tag table
    * is genre-sized here but VOCABULARY-sized in general (a web-scale tag
    * set is tens of millions of rows), so the rank is computed via
    * GlobalRank's range-partition + offset pattern, never a global
    * `row_number` window (which Spark plans as a single partition).
    */
  def tagRank(maps: DataFrame): DataFrame =
    graft.operators.GlobalRank.withRowNumber(
      maps.select(explode(map_keys(col("tags"))).as("tag"))
        .groupBy(col("tag")).agg(count(lit(1)).as("n_keys")),
      Seq(desc("n_keys"), col("tag")), "pop_rank")

  /** A9 (map-HOF argmax) + the reference's tie rule: among the tags tied at
    * the maximum score, keep the one with the best (lowest) global
    * popularity rank (select_genre, EDA cell 96).
    */
  def dominantTag(maps: DataFrame, ranks: DataFrame, keyCol: String): DataFrame = {
    // the max is hoisted into its own column BEFORE the map_filter: HOF
    // lambdas have no common-subexpression elimination, so referencing
    // array_max(map_values(m)) inside the lambda would recompute it per
    // map entry — O(n^2) per row
    val cands = maps
      .withColumn("mx", array_max(map_values(col("tags"))))
      .select(col(keyCol),
        explode(map_keys(map_filter(col("tags"), (_, v) => v === col("mx"))))
          .as("tag"),
        col("mx").as("score_c"))
    // UNHINTED like t7's vocabulary join: the rank table is genre-sized
    // here (AQE will broadcast it) but vocabulary-sized in general — a
    // forced broadcast of a 10-100M-term rank table risks the driver
    cands.join(ranks.select(col("tag"), col("pop_rank")), Seq("tag"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(keyCol)).orderBy(col("pop_rank"), col("tag"))))
      .filter(col("rn") === 1)
      .select(col(keyCol), col("tag").as("dom_tag"), col("score_c"), col("pop_rank"))
  }

  /** The full flow: scores -> maps -> popularity rank -> dominant tag. */
  /** `cutName`: materialize the per-key tag-map frame through
    * [[graft.Scratch.cut]] under that scratch name. The map frame feeds
    * BOTH the popularity rank and the argmax — left live, each consumer
    * re-plans the per-(key, tag) aggregation from the fact table
    * (g1 planned three events scans, round-15 scan census).
    */
  def dominant(df: DataFrame, keyCol: String, tagCol: String,
      valCol: String, cutName: Option[String] = None): DataFrame = {
    val scores = tagScores(df, keyCol, tagCol, valCol)
    val maps = cutName.foldLeft(tagMap(scores, keyCol, tagCol))(
      (m, n) => graft.Scratch.cut(df.sparkSession, n)(m))
    val ranks = tagRank(maps)
    dominantTag(maps, ranks, keyCol)
  }
}
