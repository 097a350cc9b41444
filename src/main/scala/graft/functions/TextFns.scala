package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the text-analysis and dedup
  * operators. Everything here is a pure Catalyst expression (no UDFs):
  * tokenization, shingling and hashing all run inside codegen/eval on the
  * scan side, so at 100 TB they cost one pass over the corpus with no
  * shuffle.
  *
  * The string→int64 hash is the first 60/28 bits of md5 — chosen because
  * both Spark (`conv(substr(md5(x),1,n), 16, 10)`) and DuckDB
  * (`('0x' || substr(md5(x),1,n))::BIGINT`) can compute it bit-identically,
  * which is what makes the MinHash/SimHash oracles exact rather than
  * statistical.
  */
object TextFns {

  /** Large prime modulus for MinHash permutations; small enough that
    * a*h+b stays under 2^63 for 28-bit h and small a.
    */
  val MinHashPrime = 1000000007L

  /** lower/trim/whitespace-split token sequence (duplicates kept). */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** distinct w-shingle set over the token sequence (w=3):
    * "a b c d" -> {"a b c", "b c d"}. Callers must filter size>=w tokens.
    */
  def shingles(toks: Column, w: Int = 3): Column =
    array_distinct(transform(
      sequence(lit(0), size(toks) - w),
      i => concat_ws(" ", (0 until w).map(o => element_at(toks, i + o + 1)): _*)))

  /** 28-bit md5-prefix hash (safe to scale by small multipliers in int64). */
  def hash28(c: Column): Column =
    conv(substring(md5(c), 1, 7), 16, 10).cast("long")

  /** 60-bit md5-prefix hash (SimHash bit source). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL twins of the primitives above, spliced into the oracle
    * strings. ONE definition per contract: these are parity-critical —
    * a drifted copy in an operator file is a silent oracle divergence.
    */
  val toksSql = "regexp_split_to_array(lower(trim(text)), '\\s+')"
  def hash28Sql(x: String): String = s"('0x' || substr(md5($x), 1, 7))::BIGINT"
  def hash60Sql(x: String): String = s"('0x' || substr(md5($x), 1, 15))::BIGINT"

  /** MinHash value j over a pre-hashed shingle array: min((a_j*h+b_j) mod p). */
  def minhash(h28s: Column, j: Int): Column = {
    val a = 2L * j + 3L
    val b = 101L * j + 7L
    array_min(transform(h28s, h => (lit(a) * h + lit(b)) % MinHashPrime))
  }

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Canonical whitespace-normalized form used for fingerprinting. */
  def normalized(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")
}
