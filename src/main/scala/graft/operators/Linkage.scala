package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (Fellegi &
  * Sunter, JASA 1969; the framework behind Splink/RecordLinkage): each
  * field comparator contributes a log-likelihood-ratio weight —
  * positive on agreement (`ln(m/u)` for match probability m, chance
  * agreement u), negative on disagreement — and the summed match
  * weight classifies a candidate pair `link` / `possible` /
  * `non_link` against two thresholds (the `possible` band is the
  * clerical-review zone).
  *
  * Scale shape: candidate pairs come from an equi-join on `blockCols`
  * (standard blocking — NEVER an all-pairs product); comparators are
  * row-local column expressions on the joined pair, and the verdict is
  * a map-side CASE. Cost is Σ_blocks |L_b|·|R_b| — the blocking key's
  * quality, not the corpus size, is the lever, exactly like the dedup
  * family's signature joins. A skewed block is the [[Skew]] salting
  * case; the weight pass itself holds no state.
  */
object Linkage {

  /** One field comparison: `agree` is any row-local predicate over the
    * joined pair (reference both sides through their join aliases
    * `l` / `r`); `agreeWeight` / `disagreeWeight` are the
    * log-likelihood-ratio weights — callers estimate them from m/u
    * probabilities (or EM) upstream and pass plain doubles so the
    * scoring stays engine-reproducible.
    */
  final case class Comparator(
      name: String, agree: Column, agreeWeight: Double, disagreeWeight: Double)

  /** Classic weight pair from (m, u): `(ln(m/u), ln((1-m)/(1-u)))`. */
  def weightsFrom(m: Double, u: Double): (Double, Double) = {
    require(m > 0 && m < 1 && u > 0 && u < 1 && m > u, s"need 0<u<m<1: m=$m u=$u")
    (math.log(m / u), math.log((1 - m) / (1 - u)))
  }

  /** Score all blocked candidate pairs. `left` is aliased `l`, `right`
    * `r`; `blockCols` must exist on both sides under the same names.
    * Emits the two ids, one `agree_<name>` flag per comparator, the
    * summed `score` (rounded to 4), and the `verdict`.
    */
  def fellegiSunter(
      left: DataFrame, right: DataFrame,
      leftId: String, rightId: String,
      blockCols: Seq[String],
      comparators: Seq[Comparator],
      linkThreshold: Double, nonLinkThreshold: Double): DataFrame = {
    require(comparators.nonEmpty, "need at least one comparator")
    require(linkThreshold >= nonLinkThreshold,
      "link threshold must not sit below the non-link threshold")
    val joined = left.as("l").join(right.as("r"), blockCols)
    val flags = comparators.map(c => c.agree.as(s"agree_${c.name}"))
    val score = comparators.map(c =>
      when(c.agree, lit(c.agreeWeight)).otherwise(lit(c.disagreeWeight)))
      .reduce(_ + _)
    joined.select(
      (Seq(col(s"l.$leftId"), col(s"r.$rightId")) ++ flags :+
        round(score, 4).as("score")): _*)
      .withColumn("verdict",
        when(col("score") >= linkThreshold, lit("link"))
          .when(col("score") > nonLinkThreshold, lit("possible"))
          .otherwise(lit("non_link")))
  }

  /** Reciprocal-best-match 1:1 assignment over scored candidate pairs
    * — the deduplicating step after [[fellegiSunter]]: a pair survives
    * iff it is simultaneously the best-scoring partner for its LEFT id
    * and for its RIGHT id (ties broken deterministically by ascending
    * partner id), so no id appears twice in the output. This is the
    * standard mutual-best heuristic (Splink's
    * `unique matching`-style post-pass, reciprocal best hits in
    * bioinformatics): greedy-stable, deterministic, and one pass —
    * not a maximum-weight matching (which is inherently sequential);
    * unmatched ids simply emit no row.
    *
    * Scale shape: two `row_number` windows over the pair set, keyed by
    * either id. The `rank = 1` filters push a partial WindowGroupLimit
    * below each exchange (Spark 4), so each shuffle moves only
    * per-key top rows, and the pair set itself is already
    * blocking-bounded.
    */
  def oneToOne(pairs: DataFrame, leftId: String, rightId: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy(leftId)
      .orderBy(col(scoreCol).desc, col(rightId).asc)
    val wr = Window.partitionBy(rightId)
      .orderBy(col(scoreCol).desc, col(leftId).asc)
    pairs
      .withColumn("__rl", row_number().over(wl))
      .withColumn("__rr", row_number().over(wr))
      .where(col("__rl") === 1 && col("__rr") === 1)
      .drop("__rl", "__rr")
  }
}
