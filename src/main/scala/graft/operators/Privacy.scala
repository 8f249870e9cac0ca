package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Privacy-governance operators for a training-data store: re-
  * identification risk audits and noise-protected aggregate release.
  * (Content-level PII detection/scrubbing lives in
  * [[TextAnalysis.scrubPii]] / the q111 audit; this module covers the
  * record-level side.)
  */
object Privacy {

  /** k-anonymity audit over a set of quasi-identifier columns: every
    * row falls into an equivalence class (its exact quasi-identifier
    * combination); classes smaller than `k` are re-identification
    * risks. Emits the class-SIZE histogram — one row per observed
    * class size: `(class_size, n_classes, n_rows, violating,
    * row_share)` — the shape an anonymity report actually wants
    * (the full class list would itself be sensitive). `row_share` is
    * each size's fraction of all rows.
    *
    * Scale shape: one combinable count per class, one count-of-counts
    * aggregate (class-size-bounded output), a 1-row total broadcast.
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    val classes = df.groupBy(quasiCols: _*).agg(count(lit(1)).as("__sz"))
    val bySize = classes.groupBy(col("__sz").as("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("class_size") * col("n_classes"))
    val total = bySize.agg(sum("n_rows").as("__total"))
    bySize.crossJoin(broadcast(total))
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        (col("class_size") < k).as("violating"),
        round(col("n_rows").cast("double") / col("__total"), 6).as("row_share"))
  }

  /** ε-DP-style noisy count release via the two-sided geometric
    * (discrete Laplace) mechanism: each group's count is perturbed by
    * `G₁ − G₂` with `Gᵢ` geometric of rate `α = e^(−ε)` — the classic
    * integer-valued counterpart of Laplace noise for counting queries
    * (sensitivity 1). Draws are md5-SEEDED (inverse-CDF on the
    * `(md5 mod 1e6 + 0.5)/1e6` uniform), making the release
    * reproducible and oracle-replayable; a production deployment
    * would swap the seeded uniform for a secure RNG at this one
    * expression. Emits `(groupCol, n, noise, noisy_n)` — `n` is kept
    * so the gate can audit the mechanism; a real release would drop
    * it.
    *
    * Scale shape: one combinable count per group; the noise is
    * row-local arithmetic on the group key.
    */
  def dpNoisyCounts(df: DataFrame, groupCol: String,
      epsilon: Double): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    val lnAlpha = -epsilon // ln(e^−ε)
    def geom(salt: Int): Column = {
      val u = (pmod(md5Long(col(groupCol), salt), lit(1000000L))
        .cast("double") + lit(0.5)) / lit(1000000d)
      floor(log(u) / lit(lnAlpha))
    }
    df.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .withColumn("noise", (geom(1) - geom(2)).cast("long"))
      .withColumn("noisy_n", col("n") + col("noise"))
  }
}
