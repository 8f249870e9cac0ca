package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.md5Long

/** Approximate sketches — the cardinality/frequency layer a 100 TB
  * survey runs when exact answers would dominate the job. Everything
  * here is MERGEABLE state: sketch once per group/partition/day,
  * union the small sketch payloads for any rollup, never rescan the
  * corpus. Uses Spark's built-in sketch aggregates (Apache
  * DataSketches HLL, Spark's CountMinSketch) — codegen'd aggregation,
  * zero UDFs in the distributed path.
  */
object Sketches {

  /** Per-group HLL distinct sketches alongside the exact count:
    * `group, n_exact, sketch`. The sketch column is the reusable
    * artifact (store it; union it later); `n_exact` is the audit
    * column for tolerance checks.
    */
  def hllByGroup(df: DataFrame, valueCol: String, groupCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCol).agg(
      count_distinct(col(valueCol)).as("n_exact"),
      hll_sketch_agg(col(valueCol), lgK).as("sketch"))

  /** Distinct-count tolerance report: per group plus an `ALL` rollup
    * row, each with the exact distinct count and whether the HLL
    * estimate lands within `tol` (relative). The rollup row is the
    * point of the exercise: its estimate comes from `hll_union_agg`
    * over the per-group sketches — no second pass over the data —
    * while its exact count needs a full re-aggregation.
    */
  def hllToleranceReport(df: DataFrame, valueCol: String, groupCol: String,
      lgK: Int = 12, tol: Double = 0.05): DataFrame = {
    val perGroup = hllByGroup(df, valueCol, groupCol, lgK)
    def okCol(est: org.apache.spark.sql.Column) =
      (abs(est - col("n_exact")) <= col("n_exact") * tol).as("hll_ok")
    val groups = perGroup.select(col(groupCol), col("n_exact"),
      okCol(hll_sketch_estimate(col("sketch"))))
    val rollup = perGroup.agg(
        hll_sketch_estimate(hll_union_agg(col("sketch"))).as("_est"))
      .crossJoin(broadcast(df.agg(count_distinct(col(valueCol)).as("n_exact"))))
      .select(lit("ALL").as(groupCol), col("n_exact"),
        (abs(col("_est") - col("n_exact")) <= col("n_exact") * tol).as("hll_ok"))
    groups.unionAll(rollup)
  }

  /** Audience-overlap (intersection) audit via HLL inclusion-
    * exclusion: for each group pair, `|A∩B| ≈ est(A) + est(B) −
    * est(A∪B)` with the union answered by a SKETCH MERGE (the
    * mergeable-sketch selling point — no second corpus pass), audited
    * against the exact intersection. Inclusion-exclusion compounds
    * the union's relative error onto a possibly-small intersection,
    * so the tolerance is `tol` RELATIVE TO THE UNION — the honest
    * bound for this estimator. Emits one row per pair:
    * `(group_a, group_b, n_a, n_b, n_union, n_inter, hll_ok)` (exact
    * counts; `hll_ok` certifies the sketch path).
    *
    * Scale shape: one sketch+exact pass per group; pair arithmetic on
    * the groups-sized table; the exact intersection/union come from
    * one distinct (group, value) self-join.
    */
  def hllIntersectionAudit(df: DataFrame, valueCol: String,
      groupCol: String, lgK: Int = 12, tol: Double = 0.05): DataFrame = {
    val perGroup = hllByGroup(df, valueCol, groupCol, lgK)
    val pairsSk = perGroup.as("a").join(perGroup.as("b"),
        col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as("group_a"),
        col(s"b.$groupCol").as("group_b"),
        col("a.n_exact").as("n_a"), col("b.n_exact").as("n_b"),
        hll_sketch_estimate(hll_union(col("a.sketch"), col("b.sketch")))
          .as("__est_union"),
        (hll_sketch_estimate(col("a.sketch"))
          + hll_sketch_estimate(col("b.sketch"))).as("__est_sum"))
    val dv = df.select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .distinct()
    val exactInter = dv.as("a").join(dv.as("b"),
        col("a.__v") === col("b.__v") && col("a.__g") < col("b.__g"))
      .groupBy(col("a.__g").as("group_a"), col("b.__g").as("group_b"))
      .agg(count(lit(1)).as("n_inter"))
    pairsSk.join(exactInter, Seq("group_a", "group_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("n_union"), col("n_inter"),
        (abs(col("__est_sum") - col("__est_union") - col("n_inter"))
          <= col("n_union") * tol + lit(1d)).as("hll_ok"))
  }

  /** Rolling-distinct tolerance report — the SKETCH path promised by
    * [[Events.rollingDistinct]]: one HLL sketch per period (one corpus
    * pass), trailing windows answered by UNIONING the period sketches
    * (periods-sized payloads — the corpus is never rescanned per
    * window, which is the entire point of a mergeable sketch), audited
    * against the exact sliding distinct count. Emits per full window:
    * `(period, period_start_ns, n_distinct_1, n_distinct_w, hll_ok)`
    * with `hll_ok` = estimate within `tol` relative of exact.
    */
  def rollingDistinctHll(df: DataFrame, keyCol: String, tsNs: String,
      periodNs: Long, periods: Int, lgK: Int = 12,
      tol: Double = 0.05): DataFrame = {
    val exact = Events.rollingDistinct(df, keyCol, tsNs, periodNs, periods)
    val perPeriod = df
      .select(expr(s"$tsNs div $periodNs").as("p"), col(keyCol).as("k"))
      .groupBy("p").agg(hll_sketch_agg(col("k"), lgK).as("sk"))
    val est = perPeriod
      .withColumn("period",
        explode(sequence(col("p"), col("p") + lit(periods - 1L))))
      .groupBy("period")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("__est"))
    exact.join(est, "period")
      .select(col("period"), col("period_start_ns"),
        col("n_distinct_1"), col("n_distinct_w"),
        (abs(col("__est") - col("n_distinct_w")) <=
          col("n_distinct_w") * tol).as("hll_ok"))
  }

  /** Approximate-quantile tolerance report (the [[hllToleranceReport]]
    * pattern for order statistics): per group and probe probability,
    * the EXACT interpolated quantile (the audit column — both engines
    * compute the same linear interpolation at rank `p·(n−1)`) and
    * whether the mergeable approx-percentile sketch's answer honors its
    * rank-error contract. Spark's `approx_percentile` guarantees the
    * returned value's rank is within `n/accuracy` of the target rank —
    * that is the contract checked (`approx_ok`), NOT value distance,
    * which has no bound on skewed data. Output:
    * `(groupCol, p, n, q_exact, approx_ok)`.
    *
    * Scale shape: both aggregates are map-side-combinable single-pass
    * (the approx side is the mergeable artifact — sketch per
    * partition/day, merge for any rollup); the rank audit joins the
    * |groups|·|probs|-row estimate table back (broadcast) and
    * re-counts ranks in one more combinable pass. The exact quantile
    * is the only non-mergeable piece, and it exists precisely to
    * audit the sketch.
    */
  def quantileToleranceReport(df: DataFrame, valueCol: String,
      groupCol: String, probs: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.9),
      accuracy: Int = 1000): DataFrame = {
    require(probs.nonEmpty, "need at least one probe probability")
    val pArr = typedLit(probs)
    val agg = df.groupBy(groupCol).agg(
      count(lit(1)).as("n"),
      percentile(col(valueCol), pArr).as("__ex"),
      approx_percentile(col(valueCol), pArr, lit(accuracy)).as("__ap"))
    val est = agg
      .select(col(groupCol), col("n"), col("__ex"), col("__ap"),
        posexplode(pArr).as(Seq("__i", "p")))
      .select(col(groupCol), col("n"), col("p"),
        element_at(col("__ex"), col("__i") + 1).as("q_exact"),
        element_at(col("__ap"), col("__i") + 1).as("__est"))
    // rank audit: a tied estimate value occupies the rank INTERVAL
    // [#{x < est}+1, #{x ≤ est}]; the contract is that this interval
    // intersects the target window p·n ± (n/accuracy + 1 interpolation
    // slack) — auditing the point rank #{x ≤ est} alone falsely fails
    // an exact order statistic that sits inside a run of duplicates
    val ranks = df.select(col(groupCol), col(valueCol).cast("double").as("__v"))
      .join(broadcast(est.select(col(groupCol), col("p"), col("__est"))), Seq(groupCol))
      .groupBy(groupCol, "p")
      .agg(
        (count(when(col("__v") < col("__est"), lit(1))) + 1).as("__lo"),
        count(when(col("__v") <= col("__est"), lit(1))).as("__hi"))
    val tol = col("n").cast("double") / accuracy + 1
    est.join(ranks, Seq(groupCol, "p"))
      .select(col(groupCol), col("p"), col("n"),
        round(col("q_exact"), 6).as("q_exact"),
        (col("__lo") <= col("p") * col("n") + tol &&
          col("__hi") >= col("p") * col("n") - tol).as("approx_ok"))
  }

  /** Count-min-sketch frequency estimates for a bounded candidate
    * list: builds ONE distributed sketch (a few KB of mergeable
    * state), reads it driver-side, and returns `(value, estimate)`
    * rows. The CMS contract: estimates NEVER undercount, and
    * overcount by at most `eps·N` with probability `confidence`.
    * The candidate list must be driver-bounded (heavy-hitter probes,
    * a watchlist) — the sketch itself answers point queries only.
    */
  def cmsEstimates(df: DataFrame, valueCol: String, candidates: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate")
    val bytes = df.agg(
      count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("sk")).head().getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val session = df.sparkSession
    import session.implicits._
    candidates.map(c => (c, cms.estimateCount(c)))
      .toDF(valueCol, "estimate")
  }

  /** Count-min inner-product join-size estimation audit (Cormode &
    * Muthukrishnan 2005 §4.2): the equi-join cardinality
    * `|A ⋈_k B| = Σ_k a_k·b_k` is upper-bounded by
    * `min_d Σ_w cmsA[d][w]·cmsB[d][w]` — the row-wise inner product
    * of the two sides' count-min sketches. This is the classic
    * sketch a distributed optimizer consults BEFORE committing to a
    * join strategy: the estimate never undercounts, and overcounts by
    * ≤ N_a·N_b/width per row with high probability. Emits one audit
    * row `(exact_size, est_size, rel_err, never_under)` — exact from
    * the per-key count join, estimate from the sketches.
    *
    * Scale shape: each side collapses to a depth×width cell table in
    * ONE pass (a row-local ×depth explode feeding a combinable
    * count) — the shuffle payload IS the sketch (`depth·width` rows,
    * metadata-scale, independent of corpus size). The exact reference
    * is itself key-count-bounded (per-key counts, then a counts-join),
    * never a materialized join. Hash family: [[graft.functions.md5Long]]
    * salted by depth, cross-engine deterministic.
    */
  def cmsJoinSize(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth > 0 && width > 0, "depth and width must be positive")
    def cells(df: DataFrame, key: String, out: String): DataFrame =
      df.select(explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"),
            pmod(md5Long(col(key), d), lit(width)).as("w"))): _*)).as("cell"))
        .groupBy(col("cell.d").as("d"), col("cell.w").as("w"))
        .agg(count(lit(1)).as(out))
    val est = cells(a, aKey, "c_a").join(cells(b, bKey, "c_b"), Seq("d", "w"))
      .groupBy("d").agg(sum(col("c_a") * col("c_b")).as("__est_d"))
      .agg(min("__est_d").as("est_size"))
    val exact = a.groupBy(col(aKey).as("__k")).agg(count(lit(1)).as("__na"))
      .join(b.groupBy(col(bKey).as("__k")).agg(count(lit(1)).as("__nb")),
        Seq("__k"))
      .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as("exact_size"))
    exact.crossJoin(broadcast(est))
      .select(col("exact_size"), col("est_size"),
        when(col("exact_size") > 0,
          round((col("est_size") - col("exact_size")).cast("double")
            / col("exact_size"), 6)).as("rel_err"),
        (col("est_size") >= col("exact_size")).as("never_under"))
  }
}
