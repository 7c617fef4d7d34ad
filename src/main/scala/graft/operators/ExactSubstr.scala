package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact maximal-substring detection via anchor k-grams + implicit
  * longest-common-extension (Lee et al. 2022 ExactSubstr, distributed).
  *
  * Suffix arrays don't distribute; this is the equivalent join/window
  * form. Fix a document pair and a diagonal (pa − pb). If tokens
  * pa..pa+m−1 of A equal pb..pb+m−1 of B maximally (m >= k), every
  * k-gram start in [pa, pa+m−k] is an anchor hit on that diagonal,
  * consecutive by construction; two maximal runs on one diagonal are
  * separated by a mismatch, so their anchor-start sets sit >= 2 apart.
  * Gaps-and-islands over anchor starts per (pair, diagonal) therefore
  * reconstructs EXACTLY the maximal common extensions of length >= k —
  * no text re-comparison needed, because anchors join on the verbatim
  * k-gram text (not a hash). ExactSubstrSpec pins the edge cases:
  * overlapping islands, adjacent-but-mismatched runs, multi-diagonal
  * pairs, sub-k and sub-minLen suppression.
  *
  * Scale shape: the anchor self-join shuffles (span, doc, pos) — fanout
  * per anchor is its doc-frequency, which IS the pair semantics; both
  * sides are the same exploded subtree (one exchange, reused), and the
  * islands window partitions by (pair, diagonal), its state bounded by
  * one run. Reference counterpart: the ExactSubstr pass of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better" (2022).
  */
object ExactSubstr {

  /** Maximal cross-document shared token spans of length >= minLen.
    *
    * @param occ anchor occurrences: (doc_id LONG, p LONG 1-based token
    *            position, span STRING the k-gram text)
    * @param hashedAnchors join anchors on xxhash64(span) (8 bytes)
    *            instead of the verbatim k-gram text. Measured at sf0.1
    *            (BENCH_NOTES round 14): 2.03x fewer shuffle-write bytes,
    *            wall-neutral locally — the shuffle cut is the knob that
    *            matters on a 1000-executor corpus run. The price is
    *            EXACTNESS: a 64-bit collision between two different
    *            k-grams can pair unrelated positions or fuse two
    *            genuinely-separate runs on one diagonal (an endpoint
    *            re-check cannot restore strictness — a MIDDLE collision
    *            bridges two real runs whose endpoints verify), so this
    *            is Lee et al.'s documented corpus-scale concession
    *            (~2^-64 per anchor pair), NOT the default. The default
    *            keeps the verbatim-text key: anchors that join equal ARE
    *            equal, no re-comparison, no probabilistic caveat.
    *            ExactSubstrSpec holds both modes output-identical on the
    *            seeded differential fixtures and the registered d16 stays
    *            exact.
    * @return (doc_a, doc_b, start_a, start_b, len) with doc_a < doc_b,
    *         positions 1-based, len in tokens
    */
  def maximalSpans(occ: DataFrame, k: Int, minLen: Int,
      hashedAnchors: Boolean = false): DataFrame = {
    // d3's self-join discipline: repartition both (identical) sides on
    // the join key and hint shuffle_hash — broadcasting one side of a
    // corpus-derived self-join is wrong at scale anyway, and with both
    // sides shuffled identically AQE dedups them into ONE exchange + a
    // ReusedExchange, so the corpus is scanned and exploded exactly once
    // (PlanSpec pins it).
    val keyed =
      if (hashedAnchors)
        occ.select(col("doc_id"), col("p"), xxhash64(col("span")).as("span"))
      else occ
    val anch = keyed.repartition(col("span"))
    val pairs = anch.as("a")
      .join(anch.as("b").hint("shuffle_hash"),
        col("a.span") === col("b.span")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.p").as("pa"), col("b.p").as("pb"))
      .withColumn("off", col("pa") - col("pb"))
    val byDiag = Window.partitionBy(col("da"), col("db"), col("off"))
      .orderBy(col("pa"))
    pairs
      .withColumn("grp", col("pa") - row_number().over(byDiag))
      .groupBy(col("da"), col("db"), col("off"), col("grp"))
      .agg(min(col("pa")).as("start_a"),
        (max(col("pa")) - min(col("pa")) + lit(k.toLong)).as("len"))
      .filter(col("len") >= minLen)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("start_a"), (col("start_a") - col("off")).as("start_b"),
        col("len"))
  }

  /** Maximal WITHIN-document repeated token spans of length >= minLen
    * (Lee et al.'s other excision source: the same span repeated inside
    * ONE document — structurally excluded from `maximalSpans` by its
    * `doc_a < doc_b` pair guard).
    *
    * Same anchor+LCE machinery on same-doc anchor pairs with `pa < pb`:
    * the strict order keeps each occurrence pair counted once and drops
    * the trivial self-diagonal (off = 0, every anchor matching itself).
    * Maximality per (doc, off > 0) diagonal is d16's islands argument
    * verbatim — tokens pa..pa+m−1 == (pa+off)..(pa+off+m−1) maximally
    * iff the k-gram anchors on that diagonal are consecutive over
    * [pa, pa+m−k]. Tandem repeats with period < k are one long diagonal
    * run (the two sides OVERLAP — that is a valid repeat, not an
    * artifact), and three occurrences of one span yield runs on all
    * three pairwise diagonals, exactly the pair semantics
    * ExactSubstrSpec's brute-force differential replays.
    *
    * @param occ anchor occurrences as in `maximalSpans`
    * @return (doc_id, start_a, start_b, len) with start_a < start_b,
    *         positions 1-based, len in tokens
    */
  def selfMaximalSpans(occ: DataFrame, k: Int, minLen: Int): DataFrame = {
    val anch = occ.repartition(col("span"))
    val pairs = anch.as("a")
      .join(anch.as("b").hint("shuffle_hash"),
        col("a.span") === col("b.span")
          && col("a.doc_id") === col("b.doc_id")
          && col("a.p") < col("b.p"))
      .select(col("a.doc_id").as("doc"), col("a.p").as("pa"),
        (col("b.p") - col("a.p")).as("off"))
    val byDiag = Window.partitionBy(col("doc"), col("off"))
      .orderBy(col("pa"))
    pairs
      .withColumn("grp", col("pa") - row_number().over(byDiag))
      .groupBy(col("doc"), col("off"), col("grp"))
      .agg(min(col("pa")).as("start_a"),
        (max(col("pa")) - min(col("pa")) + lit(k.toLong)).as("len"))
      .filter(col("len") >= minLen)
      .select(col("doc").as("doc_id"), col("start_a"),
        (col("start_a") + col("off")).as("start_b"), col("len"))
  }

  /** Anchor occurrences for a (doc_id, text) frame: one row per k-gram
    * with its 1-based start position.
    */
  def anchors(docs: DataFrame, textCol: Column, k: Int): DataFrame =
    docs.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.shinglesNative(textCol, k))
        .as(Seq("p0", "span")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        col("span"))

  /** Anchor occurrences for an already-tokenized (doc_id, tokens) frame —
    * the entry point for callers that transform the token array before
    * anchoring (d17's planted-repeat fixture).
    */
  def anchorsFromTokens(docs: DataFrame, tokensCol: Column, k: Int): DataFrame =
    docs.select(col("doc_id"),
      posexplode(graft.functions.TextFunctions.shingles(tokensCol, k))
        .as(Seq("p0", "span")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        col("span"))
}
