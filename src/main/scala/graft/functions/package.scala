package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core column-expression library.
  *
  * Everything here is pure `Column` algebra over Spark's built-in
  * (codegen'd) functions — no UDFs — so every derived expression stays
  * inside whole-stage codegen and is usable at 100 TB scale.
  *
  * Cross-engine determinism: several helpers ([[md5Long]], [[tokens]],
  * [[wordShingles]]) are designed so a DuckDB oracle can reproduce them
  * bit-for-bit, which is what the driver's correctness gate checks.
  */
package object functions {

  /** Stable positive 60-bit hash of a column, identical across engines:
    * first 15 hex digits of md5, read base-16.
    * DuckDB equivalent: `('0x' || substr(md5(x), 1, 15))::BIGINT`.
    * Used as the deterministic hash primitive for MinHash, SimHash,
    * fingerprinting and pseudo-random sampling (rand() is not
    * reproducible across engines; md5 is).
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 15), 16, 10).cast(LongType)

  /** Salted variant — independent hash family member `i`. */
  def md5Long(c: Column, salt: Int): Column =
    md5Long(concat_ws(":", lit(salt.toString), c.cast(StringType)))

  /** Dosage recode of a raw diploid GT string: 0 (hom-ref), 1 (het),
    * 2 (hom-alt), NULL otherwise. Behavioral parity with the reference
    * engine's `gt2snp` (VCFdbR `pipeline/02-build-db.R:101-108`):
    * substring-regex alternation tested in order ref→het→hom-alt, so
    * e.g. "0/." is 0 and "./1" is 1, and any multi-allelic ("2/1") or
    * fully-missing ("./.") genotype is NULL.
    */
  def gt2snp(gtRaw: Column): Column =
    when(gtRaw.rlike("0/\\.|\\./0|0/0|0\\|0|^0$"), lit(0d))
      .when(gtRaw.rlike("0/1|1/0|0\\|1|1\\|0|\\./1|1/\\.|\\.\\|1|1\\|\\.|^1$"), lit(1d))
      .when(gtRaw.rlike("1/1|1\\|1"), lit(2d))
      .otherwise(lit(null).cast(DoubleType))

  /** Lowercase word tokens: split on runs of non-alphanumerics, drop
    * empties. DuckDB equivalent:
    * `list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> len(t) > 0)`.
    */
  def tokens(text: Column): Column = {
    val raw = split(lower(text), "[^a-z0-9]+")
    filter(raw, t => length(t) > lit(0))
  }

  /** Word n-gram shingles of a token array, joined by a single space. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))

  /** Character n-gram shingles of a string. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast(ArrayType(StringType)))
      .otherwise(
        transform(
          sequence(lit(1), length(text) - lit(n - 1)),
          i => text.substr(i, lit(n))))

  /** Dot product of two numeric arrays, computed as a sequential fold
    * in double precision (deterministic order ⇒ reproducible in the
    * oracle engine).
    */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0d),
      (acc, v) => acc + v)

  /** L2 norm of a numeric array (double). */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity of two numeric arrays in double precision. */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Jaccard similarity of two string arrays treated as sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(array_union(a, b)).cast(DoubleType)
    when(union === 0, lit(0d)).otherwise(inter / union)
  }

  /** MinHash signature: for each of `k` salted hash functions, the
    * minimum [[md5Long]] over the elements of `set`. Empty sets get
    * Long.MaxValue sentinels (never collide with real hashes).
    */
  def minHashSignature(set: Column, k: Int): Column =
    array((0 until k).map { i =>
      coalesce(
        array_min(transform(set, e => md5Long(e, i))),
        lit(Long.MaxValue))
    }: _*)

  /** SimHash fingerprint over `bits` bit positions (≤ 30): for each bit
    * b, sum ±1 over elements according to bit b of the element hash;
    * bit set iff the sum is positive. Returns an integer fingerprint.
    * Near-duplicate texts differ in few bits (small Hamming distance).
    */
  def simHash(set: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 30, "simHash supports 1..30 bits")
    val contrib = (0 until bits).map { b =>
      val vote = aggregate(
        set,
        lit(0L),
        (acc, e) =>
          acc + when(shiftright(md5Long(e), b).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L)))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    contrib.reduce(_ + _)
  }

  /** Hamming distance between two long fingerprints. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Canonical text normalization for exact-dup fingerprinting:
    * lowercase, strip non-alphanumerics to single spaces, trim.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Deterministic document fingerprint = md5 of normalized text. */
  def textFingerprint(text: Column): Column = md5(normalizeText(text))

  /** Empty string → NULL (reference `03-index-db.R:95` semantics). */
  def emptyToNull(c: Column): Column =
    when(c === "", lit(null).cast(StringType)).otherwise(c)
}
