package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, fingerprinting, quality scoring). Everything here is built from
  * codegen'd Spark SQL functions — no UDFs — so the expressions stay inside
  * whole-stage codegen and are reproducible in any ANSI engine (the DuckDB
  * oracle re-states the same arithmetic).
  */
object TextFunctions {

  /** Deterministic 32-bit hash of a string, identical across engines:
    * first 8 hex chars of md5 (= first 4 digest bytes big-endian), as an
    * unsigned int. Used instead of Spark's murmur `hash()` because the
    * oracle engine must reproduce it. Implemented as a native codegen
    * Expression (graft.expressions.Md5Hash32) — equivalent to
    * `conv(substring(md5(c), 1, 8), 16, 10).cast("long")` without the hex
    * string round trip (Md5Hash32Spec asserts the equivalence).
    */
  def hash32(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.Md5Hash32(org.apache.spark.sql.GraftBridge.expression(c)))

  /** Whitespace tokens of lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Unicode NFC canonical normalization (graft.expressions.NormalizeNFC) —
    * run BEFORE hashing/shingling so precomposed and decomposed spellings
    * of the same character dedup together.
    */
  def nfc(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.NormalizeNFC(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Distinct-free word n-gram shingles (duplicates kept; min-hashing is
    * insensitive to multiplicity). Empty when the doc has < n tokens;
    * null when the token array is null (a null doc must stay null so the
    * HOF pipeline agrees with the native expressions, which are
    * null-propagating — `otherwise` would silently turn null docs into
    * the neutral empty shingle set).
    */
  def shingles(w: Column, n: Int): Column =
    when(w.isNull, lit(null).cast("array<string>"))
      .when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Native compiled form of `shingles(tokens(text), n)` — one eval per
    * row, immune to the lambda re-inlining hazard (see ShinglesExpr).
    * The HOF composition above stays as the reference semantics
    * (ShinglesExprSpec asserts equality).
    */
  def shinglesNative(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.ShinglesExpr(
        org.apache.spark.sql.GraftBridge.expression(text), n))

  /** 32-bit hashes of the 3-gram shingles of `text`. */
  def shingleHashes(text: Column): Column =
    transform(shingles(tokens(text), 3), s => hash32(s))

  /** MinHash signature (k permutations) over pre-hashed shingles.
    * Permutation j: h -> ((2j+3)*h + (7919j+1)) mod p, p = 2^31-1. The
    * multipliers stay below 2^6 so products fit comfortably in a long.
    *
    * Shape matters: HOF lambdas are interpreted with no common-subexpression
    * elimination, so a `transform(sequence(0,k), j -> min over hashes)`
    * nesting would re-evaluate the (md5-based) hash array k times per row.
    * Instead each shingle hash is expanded once to its k permuted values
    * (the hash enters as a lambda VARIABLE, already computed), and the
    * signature is a slot-wise min fold — md5 runs exactly once per shingle.
    */
  def minhashSignature(shingleHashes: Column, k: Int): Column = {
    val perShingle = transform(shingleHashes,
      h => array((0 until k).map(j =>
        (h * (j * 2 + 3) + (j * 7919 + 1)) % 2147483647L): _*))
    val top = array(Seq.fill(k)(lit(2147483647L)): _*)
    aggregate(perShingle, top, (acc, arr) => zip_with(acc, arr, (a, b) => least(a, b)))
  }

  /** The whole tokenize->shingle->hash->minhash pipeline as ONE native
    * expression (graft.expressions.MinHashSig) — bit-identical to
    * `minhashSignature(shingleHashes(text), k)` but the inner loop is
    * compiled Scala instead of ~4k interpreted HOF evals per document.
    * This is the production entry point; the HOF composition above stays as
    * the reference semantics (MinHashSigSpec asserts equality).
    */
  def minhashSigNative(text: Column, k: Int): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.MinHashSig(
        org.apache.spark.sql.GraftBridge.expression(text), k))

  /** LSH band keys: the signature split into `bands` contiguous chunks of
    * `rows` values, each serialized to one join key. Near-duplicates agree
    * on at least one full band with high probability.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    // static array build, not transform-over-band-index: referencing `sig`
    // inside a lambda would re-evaluate the whole signature per band. With
    // multiple textual references to a non-cheap expression, CollapseProject
    // keeps the signature in its own projection — evaluated once per row.
    array((0 until bands).map(b =>
      concat_ws("_", slice(sig, b * rows + 1, rows).cast("array<string>"))): _*)

  /** 32-bit SimHash over the token multiset: bit b is set when the sum of
    * (+1 / -1) votes from each token's hash bit b is positive.
    */
  def simhash32(w: Column): Column = {
    // Same evaluation-shape rule as minhashSignature: hash each token once
    // (inner transform), expand to 32 +/-1 votes with the hash bound as a
    // lambda variable, then fold vote vectors slot-wise. A
    // `transform(0..31, b -> aggregate(hashes, ...))` nesting would md5
    // every token 32 times per row.
    val votes = transform(transform(w, t => hash32(t)),
      h => array((0 until 32).map(b =>
        when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L)): _*))
    val sums = aggregate(votes, array(Seq.fill(32)(lit(0L)): _*),
      (acc, arr) => zip_with(acc, arr, (a, b) => a + b))
    aggregate(sums, lit(0L),
      (acc, s) => acc * 2 + when(s > 0, 1L).otherwise(0L))
  }

  /** Native whole-document SimHash over the raw text column — bit-identical
    * to `simhash32(tokens(text))` with the inner loop compiled
    * (SimHash32ExprSpec asserts equality).
    */
  def simhashNative(text: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.SimHash32Expr(
        org.apache.spark.sql.GraftBridge.expression(text)))

  /** Order-sensitive document fingerprint: position-weighted sum of token
    * hashes mod 2^31-1. Reordering any two distinct tokens changes it.
    *
    * The mod is applied INSIDE the fold, not after the sum: the raw sum
    * of i * hash32 (i up to n, hash up to 2^32) overflows a long around
    * ~90k tokens — a realistic web document — which under ANSI mode is a
    * query-killing ARITHMETIC_OVERFLOW. Per-step reduction keeps acc < P
    * with the identical final value. The index-lambda transform also
    * makes the empty array yield 0 (sequence(1, 0) would count DOWN and
    * element_at would throw).
    */
  def fingerprint(w: Column): Column =
    aggregate(
      transform(w, (t, i) => (i + 1).cast("long") * hash32(t)),
      lit(0L), (acc, x) => (acc + x) % 2147483647L)

  /** DEFLATE-compressed byte length (expressions/DeflateLen, codegen'd) —
    * the primitive of the t19 compression-ratio quality signal.
    */
  def deflateLen(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.expressions.DeflateLen(
        org.apache.spark.sql.GraftBridge.expression(c)))
}
