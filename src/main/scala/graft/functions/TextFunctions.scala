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
    * first 8 hex chars of md5, parsed as an unsigned int. Used instead of
    * Spark's murmur `hash()` because the oracle engine must reproduce it.
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Whitespace tokens of lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Distinct-free word n-gram shingles (duplicates kept; min-hashing is
    * insensitive to multiplicity). Empty when the doc has < n tokens.
    */
  def shingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** 32-bit hashes of the 3-gram shingles of `text`. */
  def shingleHashes(text: Column): Column =
    transform(shingles(tokens(text), 3), s => hash32(s))

  /** MinHash signature (k permutations) over pre-hashed shingles.
    * Permutation k: h -> ((2k+3)*h + (7919k+1)) mod p, p = 2^31-1. The
    * multipliers stay below 2^6 so products fit comfortably in a long.
    */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingleHashes,
        h => ((j * 2 + 3) * h + (j * 7919 + 1)) % 2147483647L)))

  /** LSH band keys: the signature split into `bands` contiguous chunks of
    * `rows` values, each serialized to one join key. Near-duplicates agree
    * on at least one full band with high probability.
    */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => concat_ws("_", slice(sig, b * rows + 1, lit(rows)).cast("array<string>")))

  /** 32-bit SimHash over the token multiset: bit b is set when the sum of
    * (+1 / -1) votes from each token's hash bit b is positive.
    */
  def simhash32(w: Column): Column = {
    val th = transform(w, t => hash32(t))
    val bits = transform(sequence(lit(0), lit(31)),
      b => when(
        aggregate(th, lit(0L),
          (acc, v) => acc +
            when(call_function("shiftright", v, b) % 2 === 1, 1L).otherwise(-1L)) > 0,
        1L).otherwise(0L))
    aggregate(bits, lit(0L), (acc, bit) => acc * 2 + bit)
  }

  /** Order-sensitive document fingerprint: position-weighted sum of token
    * hashes mod 2^31-1. Reordering any two distinct tokens changes it.
    */
  def fingerprint(w: Column): Column =
    aggregate(
      transform(sequence(lit(1), size(w)),
        i => i.cast("long") * hash32(call_function("element_at", w, i))),
      lit(0L), (acc, x) => acc + x) % 2147483647L
}
