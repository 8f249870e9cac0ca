package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.tokens

/** Real byte-pair-encoding tokenizer (Sennrich et al. 2016): merge
  * learning over a word-frequency dictionary and rank-greedy encoding.
  *
  * Scale shape (the one real BPE trainers use): the corpus-sized pass
  * is ONE distributed word count; the iterative pair-merging runs on
  * the resulting small dictionary driver-side (bounded by `topWords` —
  * a frequency dict is tiny even for a 100 TB corpus). Encoding
  * broadcasts the merge ranks and runs per partition — the same
  * mapPartitions seam as [[Multimodal.decodeImages]].
  *
  * No pretrained vocabulary ships in this environment, so [[learn]]
  * trains from the caller's own corpus; a production deployment loads
  * published merges into [[tokenize]] unchanged.
  * [[TextAnalysis.tokenCountBpeIsh]] remains the cheap column-only
  * estimate for survey-scale scans.
  */
object Bpe {

  type Merge = (String, String)

  /** Word-end marker, as in the original BPE formulation. */
  val EndMarker = "</w>"

  /** Learn up to `numMerges` merges from a word→frequency dictionary.
    * Tie-break: highest count, then lexicographically smallest pair —
    * fully deterministic, so oracles can pin results.
    */
  def learnFromFreqs(freqs: Map[String, Long], numMerges: Int): Seq[Merge] = {
    var words: Map[Vector[String], Long] = freqs
      .groupBy { case (w, _) => w.map(_.toString).toVector :+ EndMarker }
      .map { case (toks, g) => toks -> g.values.sum }
    val merges = Seq.newBuilder[Merge]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val counts = mutable.Map.empty[Merge, Long]
      words.foreach { case (toks, f) =>
        var j = 0
        while (j < toks.length - 1) {
          val p = (toks(j), toks(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.groupBy { case (toks, _) => mergePair(toks, best) }
          .map { case (toks, g) => toks -> g.values.sum }
        i += 1
      }
    }
    merges.result()
  }

  private def mergePair(toks: Vector[String], p: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < toks.length) {
      if (j < toks.length - 1 && toks(j) == p._1 && toks(j + 1) == p._2) {
        out += toks(j) + toks(j + 1)
        j += 2
      } else {
        out += toks(j)
        j += 1
      }
    }
    out.result()
  }

  /** Encode one word with rank-greedy merging: repeatedly merge the
    * present pair with the lowest rank until none applies.
    */
  def encode(word: String, ranks: Map[Merge, Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var toks = word.map(_.toString).toVector :+ EndMarker
    var continue = true
    while (continue && toks.length > 1) {
      var bestRank = Int.MaxValue
      var best: Merge = null
      var j = 0
      while (j < toks.length - 1) {
        val r = ranks.getOrElse((toks(j), toks(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (toks(j), toks(j + 1)) }
        j += 1
      }
      if (best == null) continue = false
      else toks = mergePair(toks, best)
    }
    toks
  }

  /** Distributed merge learning: one corpus-wide word count (whitespace
    * pre-tokenization via [[graft.functions.tokens]], lowercased),
    * capped at the `topWords` most frequent words, then local BPE
    * training on the dict.
    */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
      topWords: Int = 50000): Seq[Merge] = {
    val freqs = df
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc)
      .limit(topWords)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    learnFromFreqs(freqs, numMerges)
  }

  /** Fully-distributed BPE merge learning — the 100-TB path.
    *
    * [[learn]] collects a `topWords`-capped dictionary to the driver;
    * this variant never does: the vocabulary stays a DataFrame and each
    * round is (a) one map-side-combined pair count over it and (b) a
    * broadcast-literal merge applied as a string `replace`. Only the
    * single argmax row crosses to the driver per round, so vocabulary
    * size is unbounded.
    *
    * Representation: a word's token sequence is one string with every
    * token pipe-wrapped and space-separated — `quick` →
    * `|q| |u| |i| |c| |k|`. Merging pair (a, b) is then the plain
    * non-overlapping left-to-right `replace("|a| |b|", "|ab|")`, which
    * is exactly BPE's merge order ("a a a a" → "aa aa", "a a a" →
    * "aa a"): the wrapping pipes anchor whole tokens (no token contains
    * `|`), and because the pattern consumes no delimiter OUTSIDE the
    * two tokens, adjacent occurrences never share consumed characters.
    * Identical semantics in any engine with standard `replace` — the
    * oracle replays every round in SQL.
    *
    * Tokenization differs from [[learn]] deliberately: `[a-z0-9]+` runs
    * (the house [[graft.functions.tokens]] alphabet, no end-marker) so
    * token characters can never collide with the `|`/space delimiters.
    *
    * Tie-break per round: highest weighted count, then lexicographically
    * smallest (left, right) — deterministic, same as [[learnFromFreqs]].
    *
    * @return one row per learned merge:
    *         `round, left_tok, right_tok, merged, pair_count`
    */
  def learnDistributed(df: DataFrame, textCol: String,
      numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      // '|a| |b| ... ' then rtrim the trailing space
      .select(col("f"),
        rtrim(regexp_replace(col("word"), "(.)", "|$1| ")).as("w"))
      .persist() // materialized by round 1's argmax job
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var vocab = words
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      val best = vocab
        .select(col("f"),
          expr("split(trim(BOTH '|' FROM w), '\\\\| \\\\|')").as("l"))
        .filter(size(col("l")) > 1)
        .select(col("f"), explode(expr(
          """transform(sequence(1, size(l) - 1),
               i -> named_struct('a', element_at(l, i),
                                 'b', element_at(l, i + 1)))""")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, a + b, cnt))
        // tokens are [a-z0-9]+ concatenations — no quoting hazards
        vocab = vocab.withColumn("w",
          expr(s"replace(w, '|$a| |$b|', '|$a$b|')"))
        r += 1
      }
    }
    val out = merges.result()
      .toDF("round", "left_tok", "right_tok", "merged", "pair_count")
    words.unpersist()
    out
  }

  /** Tokenize `textCol` with the given merges: appends `bpe_tokens`
    * (flattened across the text's words) and `n_bpe_tokens`. Merge
    * ranks are broadcast; encoding runs per partition.
    */
  def tokenize(df: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val spark = df.sparkSession
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("bpe_tokens", ArrayType(StringType), nullable = true),
      StructField("n_bpe_tokens", LongType, nullable = true)))
    val idx = df.schema.fieldIndex(textCol)
    val rdd = df.rdd.mapPartitions { rows =>
      val r = bc.value
      rows.map { row =>
        val text = row.getString(idx)
        if (text == null) Row.fromSeq(row.toSeq ++ Seq(null, null))
        else {
          val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
            .flatMap(w => encode(w, r)).toSeq
          Row.fromSeq(row.toSeq ++ Seq(toks, toks.size.toLong))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
