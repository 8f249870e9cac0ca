package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All variants follow the same scale discipline:
  *   - per-row signatures are computed map-side (narrow, codegen'd
  *     column expressions — no UDFs);
  *   - candidate generation is an equi-join / groupBy on a signature
  *     (hash-partitioned shuffle, never an all-pairs product);
  *   - only candidate pairs (a tiny fraction of n²) pay a verification
  *     predicate.
  *
  * Hashes are md5-derived ([[graft.functions.md5Long]]) so results are
  * deterministic and reproducible across engines.
  */
object Dedup {

  /** Exact deduplication on a canonical fingerprint of `textCol`:
    * keeps the row with the smallest `idCol` per fingerprint group.
    * One hash-aggregate shuffle; survivors are recovered with a
    * self-semi-join on (fingerprint, id) rather than a window over all
    * rows, so the heavy payload columns don't transit the shuffle twice.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val withFp = df.withColumn("__fp", textFingerprint(col(textCol)))
    val keep = withFp.groupBy("__fp").agg(min(col(idCol)).as(idCol))
    withFp.join(keep, Seq("__fp", idCol), "left_semi").drop("__fp")
  }

  /** Per-group duplicate statistics for exact dedup (group size ≥ 2). */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(textFingerprint(col(textCol)).as("fingerprint"))
      .agg(
        count(lit(1)).as("n_dups"),
        min(col(idCol)).as("keep_id"),
        sort_array(collect_list(col(idCol))).as("member_ids"))
      .where(col("n_dups") >= 2)

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * Signature: `numHashes` md5-salted min-hashes over word
    * `shingleSize`-grams. Banding: `bands` bands of `numHashes/bands`
    * rows; two docs are candidates iff they agree on all rows of at
    * least one band. Each candidate pair is then verified with exact
    * shingle-set Jaccard ≥ `threshold`.
    *
    * Scale: the only shuffles are (a) the groupBy-free explode+join on
    * (band, bandHash) — i.e. an equi-join on the LSH bucket key — and
    * (b) the final pair dedup. Bucket skew (a degenerate shingle set
    * shared by millions of docs) is the known hazard; callers can
    * pre-filter boilerplate or raise `bands` granularity.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, one row per pair.
    */
  def minHashLsh(
      df: DataFrame,
      textCol: String,
      idCol: String,
      numHashes: Int = 16,
      bands: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val docs = df
      .select(
        col(idCol).as("id"),
        array_distinct(wordShingles(tokens(col(textCol)), shingleSize)).as("shingles"))
      .where(size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), numHashes))

    // band key = (band index, joined band slice of the signature)
    val banded = docs.select(
      col("id"), col("shingles"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          array_join(
            transform(
              slice(col("sig"), b * rowsPerBand + 1, rowsPerBand),
              h => h.cast("string")),
            "_").as("bucket"))
      }: _*)).as("bk"))
      .select(col("id"), col("shingles"), col("bk.band"), col("bk.bucket"))

    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .distinct() // a pair may collide in several bands
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash fingerprints (per doc). Exact-fingerprint groups are
    * near-certain duplicates; Hamming-ball search over the fingerprints
    * finds near-duplicates (see [[simHashNearPairs]]).
    */
  def simHashFingerprints(
      df: DataFrame, textCol: String, idCol: String, bits: Int = 24): DataFrame =
    df.select(
      col(idCol).as("id"),
      simHash(array_distinct(tokens(col(textCol))), bits).as("simhash"))

  /** Near-duplicate pairs by SimHash: block on fingerprint chunks
    * (pigeonhole: two fingerprints within Hamming distance d must agree
    * on at least one of d+1 chunks), verify with bit_count(xor) ≤ maxHamming.
    */
  def simHashNearPairs(
      df: DataFrame, textCol: String, idCol: String,
      bits: Int = 24, maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val chunkBits = math.max(1, bits / chunks)
    val fps = simHashFingerprints(df, textCol, idCol, bits)
    val blocked = fps.select(
      col("id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(
          lit(c).as("chunk"),
          shiftright(col("simhash"), c * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("simhash"), col("bk.chunk"), col("bk.key"))
    val a = blocked.as("a"); val b = blocked.as("b")
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        hammingDistance(col("a.simhash"), col("b.simhash")).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** N-gram Jaccard near-dup pairs within explicit blocking keys
    * (e.g. language, length bucket): candidate pairs come from an
    * equi-join on the block columns, then exact Jaccard ≥ threshold.
    * Use when a cheap natural blocking key exists; otherwise prefer
    * [[minHashLsh]].
    */
  def ngramJaccardPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      blockCols: Seq[String],
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val docs = df.select(
      (col(idCol).as("id") +: blockCols.map(col)) :+
        array_distinct(wordShingles(tokens(col(textCol)), shingleSize)).as("shingles"): _*)
      .where(size(col("shingles")) > 0)
    val a = docs.as("a"); val b = docs.as("b")
    val blockPred = blockCols.map(c => col(s"a.$c") === col(s"b.$c")).reduce(_ && _)
    a.join(b, blockPred && col("a.id") < col("b.id"))
      .withColumn("jaccard", jaccard(col("a.shingles"), col("b.shingles")))
      .where(col("jaccard") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("jaccard"))
  }

  /** Embedding cosine near-duplicate pairs, LSH-bucketed: block on
    * random-hyperplane sign signatures (deterministic md5-derived
    * planes, see [[Similarity.hyperplaneSignature]]), verify cosine ≥
    * threshold inside buckets.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      threshold: Double = 0.95,
      planes: Int = 8): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.hyperplaneSignature(col(vecCol), planes).as("sig"))
    val a = sigs.as("a"); val b = sigs.as("b")
    a.join(b, col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .withColumn("cosine", cosineSimilarity(col("a.vec"), col("b.vec")))
      .where(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }
}
