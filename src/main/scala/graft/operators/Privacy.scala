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

  /** ε-DP noisy SUM release — [[dpNoisyCounts]]' real-valued sibling
    * (the Laplace mechanism with contribution clipping, the standard
    * recipe for DP aggregates over unbounded user values): each row's
    * value is clipped to `[lo, hi]` — which CAPS the query's
    * sensitivity at `Δ = max(|lo|, |hi|)` instead of leaving it
    * unbounded — then each group's clipped sum is perturbed by
    * `Laplace(Δ/ε)` noise, drawn by inverse CDF
    * (`−(Δ/ε)·sgn(u−½)·ln(1−2|u−½|)`) from the same md5-seeded
    * uniform as the count mechanism (reproducible and
    * oracle-replayable; swap that one expression for a secure RNG in
    * production). Emits `(groupCol, n, clipped_sum, noise,
    * noisy_sum)` (4dp) — the raw columns stay so the gate can audit
    * the mechanism; a real release drops them.
    *
    * Scale shape: clipping is map-side row-local; one combinable sum
    * per group; noise is row-local arithmetic on the group key.
    */
  def dpNoisySums(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, epsilon: Double): DataFrame = {
    require(epsilon > 0, "epsilon must be positive")
    require(lo < hi, "need a non-empty clip range")
    val delta = math.max(math.abs(lo), math.abs(hi))
    val clipped = least(greatest(col(valueCol).cast("double"), lit(lo)),
      lit(hi))
    val u = (pmod(md5Long(col(groupCol), 3), lit(1000000L))
      .cast("double") + lit(0.5)) / lit(1000000d)
    val centered = u - lit(0.5)
    val lap = lit(-delta / epsilon) * signum(centered) *
      log(lit(1d) - lit(2d) * abs(centered))
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(clipped).as("__s"))
      .select(col(groupCol), col("n"),
        round(col("__s"), 4).as("clipped_sum"),
        round(lap, 4).as("noise"),
        round(col("__s") + lap, 4).as("noisy_sum"))
  }

  /** t-closeness audit (Li/Li/Venkatasubramanian, ICDE 2007 — the
    * refinement [[kAnonymityAudit]] and l-diversity miss: a class can
    * be large AND diverse yet still leak when its sensitive-value
    * DISTRIBUTION diverges from the table's). Per quasi-identifier
    * equivalence class, distance = the ordered-attribute Earth Mover's
    * Distance the paper specifies for numeric sensitive attributes:
    * with the `m` distinct values of `sensitive` in order, class
    * distribution `p` and global distribution `q`,
    * `EMD = (1/(m−1)) · Σ_{i<m} |Σ_{j≤i}(p_j − q_j)|`. The cumulative
    * differences are kept INTEGER (`cnt_j·N − g_j·class_n`, exact in
    * int64 for N < 3·10⁹ rows — shard first above that) and divided
    * once at the end, so the audit replays bit-identically in any
    * engine. Emits `(quasi…, class_n, t_closeness, violating)` (6dp;
    * a class equal to the global distribution scores 0, a class
    * concentrated on one extreme value scores → 1).
    *
    * Scale shape: one class×value count, the distinct-value dimension
    * (bounded by construction — callers pass a BINNED attribute) and
    * the global histogram cross in as broadcasts, the dense-grid
    * cumsum window partitions by class over m rows — no global window,
    * no driver state.
    */
  def tClosenessAudit(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "need quasi-identifier columns")
    require(t > 0 && t < 1, "t must be in (0, 1)")
    val q = quasiCols.map(col)
    val rows = df.select(q :+ sensitive.cast("long").as("__v"): _*)
      .where(col("__v").isNotNull)
    val cells = rows.groupBy(q :+ col("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val classes = rows.groupBy(q: _*).agg(count(lit(1)).as("class_n"))
    val vals = rows.groupBy("__v").agg(count(lit(1)).as("__g"))
    val total = vals.agg(sum("__g").as("__N"), count(lit(1)).as("__m"))
    val grid = classes
      .crossJoin(broadcast(vals))
      .join(cells, quasiCols :+ "__v", "left")
      .crossJoin(broadcast(total))
      .withColumn("__diff",
        coalesce(col("__cnt"), lit(0L)) * col("__N") -
          col("__g") * col("class_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(q: _*).orderBy(col("__v"))
    grid
      .withColumn("__cum", sum("__diff").over(w).cast("long"))
      .groupBy(q :+ col("class_n") :+ col("__N") :+ col("__m"): _*)
      .agg(sum(abs(col("__cum"))).as("__emd_num"))
      .select(q :+ col("class_n") :+
        when(col("__m") > 1L,
          round(col("__emd_num").cast("double") /
            (col("class_n").cast("double") * col("__N").cast("double") *
              (col("__m") - 1L).cast("double")), 6))
          .otherwise(lit(0d)).as("t_closeness"): _*)
      .withColumn("violating", col("t_closeness") > t)
  }

  /** Warner randomized response — LOCAL differential privacy for a
    * sensitive boolean (each record lies with probability 1−p before
    * it ever reaches the store; the central [[dpNoisyCounts]] trusts
    * the aggregator, this does not). Per group, the debiased share
    * estimator p̂ = (obs − (1−p)) / (2p − 1) inverts the known flip
    * rate; the audit emits the true share next to it so calibration is
    * gated, not assumed. ε = ln(p/(1−p)) per response.
    *
    * The flip coin is an md5 fraction on the 2⁻⁴⁰ grid (deterministic
    * replay; swap for a secure RNG in production, exactly like
    * [[dpNoisyCounts]]). All counts are integers; shares and the
    * estimator land on the 1e-6 floor grid. Output:
    * `group, n, reported_yes, reported_share, est_share, true_share`.
    */
  def randomizedResponse(df: DataFrame, groupCol: String, idCol: String,
      sensitive: Column, p: Double = 0.75): DataFrame = {
    require(p > 0.5 && p < 1, s"truth probability p=$p must be in (0.5, 1)")
    val coin = (md5Long(concat(lit("rr:"), col(idCol).cast("string")))
      % 1099511627776L).cast("double") / lit(1099511627776d)
    val truth = when(sensitive, 1L).otherwise(0L)
    val reported = when(coin < lit(p), truth).otherwise(lit(1L) - truth)
    def g6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    def g6s(c: Column): Column =
      when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5)) / 1e6
    df.select(col(groupCol).as("group"), truth.as("__t"),
        reported.as("__r"))
      .groupBy("group")
      .agg(count(lit(1)).as("n"), sum("__r").as("reported_yes"),
        sum("__t").as("__trueYes"))
      .select(col("group"), col("n"), col("reported_yes"),
        g6(col("reported_yes").cast("double") / col("n"))
          .as("reported_share"),
        g6s((col("reported_yes").cast("double") / col("n") - lit(1 - p))
          / lit(2 * p - 1)).as("est_share"),
        g6(col("__trueYes").cast("double") / col("n")).as("true_share"))
      .orderBy("group")
  }
}
