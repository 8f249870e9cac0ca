package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs), deterministic, and expressible in
  * ANSI SQL for oracle verification.
  */
object TextAnalysis {

  /** Tiny high-frequency function-word lists per language. Word-boundary
    * hits are counted per language; argmax wins (ties → lexicographic
    * language code, "und" when nothing matches).
    */
  val markerWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une", "dans"),
    "es" -> Seq("el", "la", "de", "que", "los", "es", "una", "para"))

  private def markerRegex(lang: String): String =
    markerWords(lang).mkString("\\b(", "|", ")\\b")

  /** Per-language marker-word hit counts. */
  def langScores(text: Column): Seq[(String, Column)] =
    markerWords.keys.toSeq.sorted.map { lang =>
      lang -> regexp_count(lower(text), lit(markerRegex(lang)))
    }

  /** Heuristic language ID: argmax of marker hits, "und" if all zero.
    * Lexicographically-first language wins ties (deterministic).
    */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Whitespace-ish token count (runs of non-space characters). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: alphanumeric runs contribute
    * ceil(len/4) tokens (≈ 4 chars/token), plus one per non-space
    * symbol character. A cheap, deterministic stand-in for a real
    * tokenizer at data-survey scale.
    */
  def tokenCountBpeIsh(text: Column): Column = {
    val wordPieces = aggregate(
      tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))
    val symbols = length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))
    wordPieces + symbols.cast("long")
  }

  /** Quality heuristics, one struct column:
    *   n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    *   and a composite quality_score in [0,1]:
    *     0.4·lengthOk + 0.3·(1−punctRatio) + 0.3·stopwordSignal.
    */
  def qualityStruct(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nTokens = size(toks).cast("double")
    val meanTokLen = when(nTokens > 0,
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") / nTokens)
      .otherwise(lit(0d))
    val punct = length(regexp_replace(text, "[^!-/:-@\\[-`{-~]", "")).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0d))
    val stop = regexp_count(lower(text),
      lit("\\b(the|and|of|to|is|in|a|that|it|der|die|und|le|la|et|el|de|que)\\b"))
      .cast("double")
    val stopRatio = when(nTokens > 0, stop / nTokens).otherwise(lit(0d))
    val lengthOk = when(nTokens >= 5 && nTokens <= 100000, lit(1d)).otherwise(lit(0d))
    val score = round(
      lit(0.4) * lengthOk +
        lit(0.3) * (lit(1d) - least(punctRatio * 5, lit(1d))) +
        lit(0.3) * least(stopRatio * 4, lit(1d)), 6)
    struct(
      nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      round(meanTokLen, 4).as("mean_token_len"),
      round(punctRatio, 4).as("punct_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      score.as("quality_score"))
  }

  /** Rolling-hash document fingerprint (md5 of normalized text). */
  def fingerprint(text: Column): Column = textFingerprint(text)

  /** Training-data scrubbing: mask URLs, email addresses and long
    * digit runs (phone/SSN-ish) with stable placeholder tokens.
    * Pure regexp_replace chain — codegen'd, and reproducible in any
    * engine with global regex replace.
    */
  def scrubPii(text: Column): Column = {
    val noUrl = regexp_replace(text,
      "(https?://|www\\.)[^\\s]+", "<URL>")
    val noEmail = regexp_replace(noUrl,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    regexp_replace(noEmail, "\\d{7,}", "<NUM>")
  }

  /** Token frequency table over a corpus: (token, freq), descending. */
  def tokenFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
}
