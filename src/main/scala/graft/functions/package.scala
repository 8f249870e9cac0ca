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
    *
    * Every alternation branch of the reference regex is a literal
    * (the only anchored forms, `^0$`/`^1$`, are whole-string
    * equality under regex `find`), so the recode compiles to plain
    * `contains`/equality tests — same truth table as the rlike form
    * (FunctionsSpec keeps the regex oracle as the property test), at
    * substring-search cost instead of a regex engine pass per
    * genotype row of the build's widest table.
    */
  def gt2snp(gtRaw: Column): Column = {
    def anyOf(subs: Seq[String], exact: Seq[String]): Column =
      (subs.map(gtRaw.contains) ++ exact.map(s => gtRaw === s))
        .reduce(_ || _)
    when(anyOf(Seq("0/.", "./0", "0/0", "0|0"), Seq("0")), lit(0d))
      .when(anyOf(Seq("0/1", "1/0", "0|1", "1|0", "./1", "1/.", ".|1", "1|."),
        Seq("1")), lit(1d))
      .when(anyOf(Seq("1/1", "1|1"), Nil), lit(2d))
      .otherwise(lit(null).cast(DoubleType))
  }

  /** Lowercase word tokens: split on runs of non-alphanumerics, drop
    * empties. DuckDB equivalent:
    * `list_filter(string_split_regex(lower(x), '[^a-z0-9]+'), t -> len(t) > 0)`.
    */
  def tokens(text: Column): Column = {
    val raw = split(lower(text), "[^a-z0-9]+")
    filter(raw, t => length(t) > lit(0))
  }

  /** Word n-gram shingles of a token array, joined by a single space.
    *
    * Capture-free by construction: `toks` appears only as a ROW-level
    * argument of the higher-order functions (arguments evaluate once
    * per row), never inside a lambda body. The previous form —
    * `transform(sequence(…), i => array_join(slice(toks, i, n)))` —
    * re-evaluated the whole `toks` expression once PER SHINGLE
    * POSITION, so an inline `tokens(text)` argument paid ~L regex
    * tokenizations per row (measured 6× end-to-end on the 3-gram
    * corpus gates). Results are bit-identical: `concat_ws` skips NULL
    * operands exactly like `array_join` skips NULL elements, so the
    * shifted zip_with chain composes the same strings for every input,
    * and the trailing partial positions are cut by the same
    * `size − (n−1)` slice the old form never generated.
    */
  def wordShingles(toks: Column, n: Int): Column =
    if (n <= 1)
      // array_join of a 1-slice maps a NULL element to "" — replicate
      when(size(toks) < n, array().cast(ArrayType(StringType)))
        .otherwise(transform(toks, t => coalesce(t, lit(""))))
    else {
      val joined = (1 until n).foldLeft(toks)((acc, k) =>
        zip_with(acc,
          slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
          (a, b) => concat_ws(" ", a, b)))
      when(size(toks) < n, array().cast(ArrayType(StringType)))
        .otherwise(slice(joined, lit(1), size(toks) - lit(n - 1)))
    }

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

  /** Jaccard for arrays already deduplicated (e.g. via array_distinct):
    * |A∩B| / (|A|+|B|−|A∩B|) — one set operation instead of two.
    */
  def jaccardDistinct(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast(DoubleType)
    val union = size(a) + size(b) - inter
    when(union === 0, lit(0d)).otherwise(inter / union)
  }

  /** Deduplicated 60-bit hashes of a string set ([[md5Long]] per
    * element): set operations over fixed-width longs are far cheaper
    * than over strings, and |hashed set| = |set| up to md5 collisions
    * (~2⁻⁶⁰ per pair — negligible at any corpus size).
    */
  def hashedSet(set: Column): Column =
    array_distinct(transform(set, e => md5Long(e)))

  /** MinHash hash-family parameters: h_i(x) = (a_i·x + b_i) mod P over
    * a 28-bit md5 base hash. One md5 per element for the whole family
    * (k salted md5s would dominate signature cost); all products stay
    * < 2⁶⁰, so the arithmetic is overflow-free in any int64 engine —
    * which is what makes the family reproducible in the DuckDB oracle.
    */
  val MinHashP = 2147483647L // 2^31 − 1
  def minHashA(i: Int): Long = (i * 2654435761L) % (MinHashP - 1) + 1
  def minHashB(i: Int): Long = (i * 40503L * 65537L) % MinHashP

  /** 28-bit base hash: first 7 hex digits of md5.
    * DuckDB: `('0x' || substr(md5(x), 1, 7))::BIGINT`.
    */
  def md5Base28(c: Column): Column =
    conv(substring(md5(c.cast(StringType)), 1, 7), 16, 10).cast(LongType)

  /** MinHash signature from a pre-hashed base column (see
    * [[md5Base28]]): for each of `k` family members, the minimum of
    * h_i(base) over the elements. Empty sets get Long.MaxValue
    * sentinels (never collide with real hashes). Callers should stage
    * `bases` as a materialized column — passing an expression tree here
    * re-evaluates it per family member.
    */
  def minHashSignatureFromBases(bases: Column, k: Int): Column =
    array((0 until k).map { i =>
      coalesce(
        array_min(transform(bases,
          b => pmod(b * minHashA(i) + minHashB(i), lit(MinHashP)))),
        lit(Long.MaxValue))
    }: _*)

  /** MinHash signature of a string set. Convenience form; prefer
    * staging [[md5Base28]] bases first in hot paths.
    */
  def minHashSignature(set: Column, k: Int): Column =
    minHashSignatureFromBases(transform(set, e => md5Base28(e)), k)

  /** SimHash fingerprint over `bits` bit positions (≤ 30): for each bit
    * b, sum ±1 over elements according to bit b of the element hash;
    * bit set iff the sum is positive. Returns an integer fingerprint.
    * Near-duplicate texts differ in few bits (small Hamming distance).
    *
    * The element hashes are computed once in a single fold that builds
    * a per-bit vote array (not once per bit — md5 is the dominant cost).
    */
  def simHash(set: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 30, "simHash supports 1..30 bits")
    simHashOfHashes(transform(set, e => md5Long(e)), bits)
  }

  /** SimHash from pre-hashed elements (see [[simHash]]). */
  def simHashOfHashes(hashes: Column, bits: Int): Column = {
    val votes = aggregate(
      hashes,
      array_repeat(lit(0L), bits),
      (acc, h) => {
        val contrib = array((0 until bits).map { b =>
          when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))
        }: _*)
        zip_with(acc, contrib, (a, c) => a + c)
      })
    val weights = array((0 until bits).map(b => lit(1L << b)): _*)
    aggregate(
      zip_with(votes, weights, (v, w) => when(v > 0, w).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
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
