package graft.operators

import org.apache.spark.sql.DataFrame
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
}
