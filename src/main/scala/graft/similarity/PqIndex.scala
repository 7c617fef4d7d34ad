package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) approximate nearest neighbour — the
  * compressed-scan counterpart to the cell-pruning IVF path: IVF reads
  * FEWER vectors, PQ reads SMALLER ones. The vector space is split into
  * `m` subspaces; each subspace trains its own k-means codebook
  * (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
  * Search"); every corpus vector is stored as `m` small codes. Search is
  * ADC (asymmetric distance computation): the query stays full-precision,
  * each (subspace, code) pair's partial squared distance is computed ONCE
  * into a lookup table, and a corpus vector's approximate distance is the
  * sum of its m table entries.
  *
  * Scale shape: the codebook is m*k centroids — model-sized, always
  * broadcast. The codes table is m small ints per vector (~64x smaller
  * than float64 at m=4, dim=64), so the "exhaustive" scan streams a
  * compressed corpus. The per-query LUT is m*k rows — broadcast-sized for
  * any sane query batch — and the score aggregate partial-aggregates the
  * m per-subspace terms map-side, so the shuffle carries one row per
  * (query, vector), never m. On a real deployment PQ composes WITH IVF
  * (probe nprobe cells, ADC-score inside them); here the paths are
  * separate operators so each shape is pinned on its own.
  */
object PqIndex {

  /** codebooks: (sub_idx, code, cv: array<double>); codes: (vec_id,
    * codes: array<int>) — one code per subspace, ordered by sub_idx.
    */
  final case class Model(m: Int, subDim: Int,
      codebooks: DataFrame, codes: DataFrame)

  private def subvector(v: Column, subIdx: Int, subDim: Int): Column =
    slice(v, subIdx * subDim + 1, subDim)

  /** Train one codebook per subspace and encode the corpus. `emb` must
    * have (vec_id, v: array<double>) with a fixed dimension divisible by
    * `m`. Seeded per subspace, so the index is run-to-run deterministic.
    */
  def build(emb: DataFrame, m: Int = 4, k: Int = 16,
      seed: Long = 123L): Model = {
    val spark = emb.sparkSession
    val dim = emb.select(size(col("v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val trained = (0 until m).map { si =>
      val sub = emb.select(col("vec_id"),
        array_to_vector(subvector(col("v"), si, subDim)).as("fv"))
      val km = new KMeans().setK(k).setSeed(seed + si).setFeaturesCol("fv")
      val model = km.fit(sub)
      val assigned = model.transform(sub)
        .select(col("vec_id"), lit(si).as("sub_idx"),
          col("prediction").as("code"))
      (model.clusterCenters.map(_.toArray), assigned)
    }
    import spark.implicits._
    val codebooks = trained.zipWithIndex.flatMap { case ((centers, _), si) =>
      centers.zipWithIndex.map { case (c, code) => (si, code, c.toSeq) }
    }.toDF("sub_idx", "code", "cv")
    val codes = trained.map(_._2).reduce(_.unionByName(_))
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("sub_idx"), col("code"))))
        .as("sc"))
      .select(col("vec_id"),
        transform(col("sc"), x => x.getField("code")).as("codes"))
    Model(m, subDim, codebooks, codes)
  }

  /** Squared euclidean distance between two double arrays. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** ADC top-k: every query scores the WHOLE compressed corpus via its
    * lookup table; ties broken by candidate id so the cut is total.
    * `queries` must have (q_id, qv: array<double>).
    */
  def adcTopK(model: Model, queries: DataFrame, k: Int): DataFrame = {
    // per-(query, subspace, code) partial distances — the LUT
    val lut = queries.join(broadcast(model.codebooks))
      .select(col("q_id"), col("sub_idx"), col("code"),
        sqDist(subviewOf(col("qv"), col("sub_idx"), model.subDim), col("cv"))
          .as("pd"))
    // corpus codes unrolled to (vec_id, sub_idx, code): m rows per vector
    val unrolled = model.codes
      .select(col("vec_id"),
        posexplode(col("codes")).as(Seq("sub_idx", "code")))
    unrolled.join(lut, Seq("sub_idx", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adist"), count(lit(1)).as("n_terms"))
      // a (query, vector) pair must contribute all m subspace terms;
      // enforcing it keeps a miscoded row from silently shrinking dists
      .filter(col("n_terms") === model.m)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adist"), col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id").as("cand_id"), col("rn"))
  }

  /** ADC top-k restricted to a CANDIDATE set — the IVF-PQ composition's
    * scoring half: `cand` is (q_id, vec_id) (typically the vectors in
    * each query's probed cells), and only those pairs are scored. Same
    * LUT + partial-aggregate shape as [[adcTopK]]; the semi-join onto
    * the candidate pairs happens before the LUT join, so the compressed
    * scan shrinks from the whole corpus to the probed lists.
    */
  def adcTopKWithin(model: Model, queries: DataFrame, cand: DataFrame,
      k: Int): DataFrame = {
    val lut = queries.join(broadcast(model.codebooks))
      .select(col("q_id"), col("sub_idx"), col("code"),
        sqDist(subviewOf(col("qv"), col("sub_idx"), model.subDim), col("cv"))
          .as("pd"))
    val unrolled = cand.join(model.codes, Seq("vec_id"))
      .select(col("q_id").as("c_qid"), col("vec_id"),
        posexplode(col("codes")).as(Seq("sub_idx", "code")))
    unrolled.join(lut,
        col("c_qid") === col("q_id")
          && unrolled("sub_idx") === lut("sub_idx")
          && unrolled("code") === lut("code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("pd")).as("adist"), count(lit(1)).as("n_terms"))
      .filter(col("n_terms") === model.m)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adist"), col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id").as("cand_id"), col("rn"))
  }

  /** The sub_idx-th subvector when the index is a COLUMN, not a literal
    * (slice() needs fold-ability for its start argument only in the
    * literal API; the expr form accepts any expression).
    */
  private def subviewOf(v: Column, subIdx: Column, subDim: Int): Column =
    slice(v, (subIdx * subDim + 1).cast("int"), lit(subDim))
}
