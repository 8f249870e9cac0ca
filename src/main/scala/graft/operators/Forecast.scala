package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponential-smoothing forecasters over event streams.
  *
  * Holt's linear-trend (double exponential) smoothing per key over a
  * zero-filled daily count grid. The recursion
  *
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * is inherently sequential, but the SERIES is tiny (days, not events):
  * the corpus-sized work is one `groupBy(key, day)` count with map-side
  * partial aggregation; the per-key fold then runs over a bounded
  * day-grid array collected per key — at 100 TB the fold input is
  * `keys × days` rows, metadata scale. Initialization: l_1 = y_1,
  * b_1 = 0 (first update at t = 2).
  *
  * Determinism: with dyadic α, β (the 0.5 defaults) and integer counts,
  * every intermediate is a dyadic rational — double arithmetic is EXACT
  * and any engine replaying the same fold produces bit-identical
  * levels/trends/forecasts, so outputs need no rounding grid.
  */
object Forecast {

  private val DayNs = 86400L * 1000 * 1000 * 1000

  /** Per-key Holt forecast over daily event counts.
    *
    * Output: `key, n_days, level, trend, f{h}` for each horizon h
    * (forecast = level + h·trend days past the last grid day).
    *
    * @param tsNsCol int64 epoch-nanosecond event-time column
    */
  def holtDaily(df: DataFrame, keyCol: String, tsNsCol: String,
      alpha: Double = 0.5, beta: Double = 0.5,
      horizons: Seq[Int] = Seq(1, 3, 7)): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"smoothing parameters out of range: alpha=$alpha beta=$beta")
    // `div`, not `/`: long / long promotes to double and epoch-ns
    // magnitudes sit past 2^53 where doubles quantize (NOTES footgun)
    val ev = df.select(col(keyCol),
      expr(s"$tsNsCol div ${DayNs}L").as("__d"))
    // corpus-sized pass: one partial-aggregated count per (key, day)
    val cnts = ev.groupBy(keyCol, "__d")
      .agg(count(lit(1)).cast("double").as("__y"))
    // global day bounds (1 row, broadcast by the cross join) × keys
    val bounds = ev.agg(min("__d").as("__d0"), max("__d").as("__d1"))
    val grid = ev.select(keyCol).distinct()
      .crossJoin(bounds)
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"))).as("__d"))
    val series = grid.join(cnts, Seq(keyCol, "__d"), "left")
      .na.fill(0d, Seq("__y"))
    // per-key bounded fold: sort by day, run the Holt recursion.
    // The inner level expression repeats inside the trend update —
    // lambda bodies get no CSE, but the series is day-grid-sized.
    val a = alpha
    val b = beta
    val fold =
      s"""aggregate(
            transform(sort_array(collect_list(struct(__d, __y))), p -> p.__y),
            named_struct('i', 0L, 'l', CAST(0 AS DOUBLE), 'b', CAST(0 AS DOUBLE)),
            (acc, y) -> named_struct(
              'i', acc.i + 1L,
              'l', CASE WHEN acc.i = 0L THEN y
                        ELSE ${a}D * y + ${1 - a}D * (acc.l + acc.b) END,
              'b', CASE WHEN acc.i = 0L THEN CAST(0 AS DOUBLE)
                        ELSE ${b}D * ((${a}D * y + ${1 - a}D * (acc.l + acc.b)) - acc.l)
                             + ${1 - b}D * acc.b END))"""
    val folded = series.groupBy(keyCol)
      .agg(count(lit(1)).as("n_days"), expr(fold).as("__st"))
    val fcols = horizons.map(h =>
      (col("__st.l") + lit(h.toDouble) * col("__st.b")).as(s"f$h"))
    folded.select(
      Seq(col(keyCol), col("n_days"),
        col("__st.l").as("level"), col("__st.b").as("trend")) ++ fcols: _*)
  }

  /** Trig literals for [[periodogramDaily]]: cos/sin(2π·t/p) for every
    * (period, day-index) cell, computed ONCE driver-side and rounded
    * half-away-from-zero to the 1e-12 grid. Exposed so the oracle
    * renders the SAME numbers — neither engine's libm trig is ever in
    * the comparison path.
    */
  def trigTable(periods: Seq[Int], maxT: Int): Seq[(Int, Int, Double, Double)] = {
    def g12(x: Double): Double =
      if (x >= 0) math.floor(x * 1e12 + 0.5) / 1e12
      else -math.floor(-x * 1e12 + 0.5) / 1e12
    for (p <- periods; t <- 0 until maxT) yield {
      val a = 2d * math.Pi * t / p
      (p, t, g12(math.cos(a)), g12(math.sin(a)))
    }
  }

  /** Schuster periodogram of the daily event-count series at candidate
    * periods (in days): P(p) = C(p)² + S(p)² with C = Σ_t y_t·cos(2πt/p)
    * and S the sine sum — the spectral "is there a p-day cycle?" audit
    * that needs no phase alignment (unlike a day-of-week η², which only
    * sees period 7 at offset 0).
    *
    * Determinism: y_t are integer counts; the trig factors are shared
    * 1e-12-grid literals ([[trigTable]]); each product quantizes to a
    * 1e-6-grid integer before the per-period sums, so accumulation
    * order is irrelevant; power lands on the 1e-4 floor grid.
    * `maxDays` bounds the literal table — the operator requires the
    * observed span to fit (the oracle carries the same table).
    *
    * Scale shape: one (day)-grained count aggregate (metadata-scale),
    * then a broadcast join against the |periods|·T literal table and
    * one combinable rollup. Output:
    * `period, n_days, power, power_share` ordered by period.
    */
  def periodogramDaily(df: DataFrame, tsNsCol: String, periods: Seq[Int],
      maxDays: Int = 31): DataFrame = {
    require(periods.nonEmpty && periods.forall(_ >= 2),
      "periods must be >= 2 days")
    val spark = df.sparkSession
    import spark.implicits._
    val ev = df.select(expr(s"$tsNsCol div ${DayNs}L").as("__d"))
    // day-grained (metadata-scale) — persisted so the span guard's
    // 1-row action and the power sums share one corpus pass
    val cnts = Dedup.persistTracked(
      ev.groupBy("__d").agg(count(lit(1)).as("__y"))
        .crossJoin(ev.agg(min("__d").as("__d0")))
        .select((col("__d") - col("__d0")).cast("int").as("t"),
          col("__y")))
    val trig = trigTable(periods, maxDays)
      .toDF("period", "t", "__cos", "__sin")
    val joined = cnts.join(broadcast(trig), Seq("t"))
    // counts × 1e-12-grid literals, quantized to 1e-6 integers before
    // the sum — exact regardless of partition order
    def q6(c: Column): Column =
      when(c >= 0, floor(c * 1e6 + 0.5)).otherwise(-floor(-c * 1e6 + 0.5))
        .cast("long")
    val sums = joined.groupBy("period")
      .agg(count(lit(1)).as("n_days"),
        sum(q6(col("__y") * col("__cos"))).as("__c6"),
        sum(q6(col("__y") * col("__sin"))).as("__s6"))
    val maxT = cnts.agg(max("t")).head().getInt(0)
    require(maxT < maxDays,
      s"observed span ${maxT + 1} days exceeds maxDays=$maxDays — " +
        "raise maxDays (the oracle literal table must match)")
    val cS = col("__c6").cast("double") / 1e6
    val sS = col("__s6").cast("double") / 1e6
    val power = cS * cS + sS * sS
    val withP = sums.select(col("period"), col("n_days"),
      (floor(power * 1e4 + 0.5) / 1e4).as("power"),
      floor(power * 1e6 + 0.5).cast("long").as("__p6"))
    val tot = withP.agg(sum("__p6").as("__tot"))
    withP.crossJoin(tot)
      .select(col("period"), col("n_days"), col("power"),
        when(col("__tot") > 0,
          floor(col("__p6").cast("double") / col("__tot") * 1e6 + 0.5)
            / 1e6).as("power_share"))
      .orderBy("period")
  }
}
