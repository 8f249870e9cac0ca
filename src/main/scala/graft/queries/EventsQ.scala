package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Events

/** Event-time operator surface over the `events` table.
  *
  * `events.ts` is nanosecond-precision parquet; Spark reads it as int64
  * nanoseconds (`spark.sql.legacy.parquet.nanosAsLong`, set by
  * [[graft.Tables.events]]) and every query below does pure integer
  * arithmetic on it. DuckDB oracles use `epoch_ns(ts)` — both engines
  * see identical int64 values, so results are exact, with no timestamp
  * precision/zone hazards.
  */
object EventsQ {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val GapNs = 30L * 60 * 1000 * 1000 * 1000 // 30 min session gap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- tumbling-window aggregation (batch form of streaming window) ----
    "q27_tumbling_hourly" -> ((s, d) => {
      Events.tumblingAgg(
          Tables.events(s, d), "ts", HourNs, Seq("event_type"),
          Seq(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value")))
        .orderBy("window_start_ns", "event_type")
    }),

    // ---- semi-structured props: typed JSON extraction + aggregate ----
    "q93_json_props" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .withColumn("k", col("j.k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          round(avg("k"), 4).as("avg_k"),
          count(when(col("k") > 50, lit(1))).as("n_big"))
        .orderBy("event_type")
    }),

    // ---- hopping (sliding) windows: 1h windows every 30min ----
    "q92_hopping_halfhour" -> ((s, d) => {
      Events.hoppingAgg(
          Tables.events(s, d), "ts", HourNs, HourNs / 2, Seq("event_type"),
          Seq(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value")))
        .orderBy("window_start_ns", "event_type")
    }),

    // ---- gap-based sessionization (lag + running sum windows) ----
    "q28_sessionize" -> ((s, d) => {
      Events.sessionize(Tables.events(s, d), "user_id", "ts", GapNs)
        .groupBy("user_id")
        .agg(
          max("session_id").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- purged + embargoed temporal split: train before the 60%
    //      time cut, purge gap to 70%, test after — minus every user
    //      active inside the gap (embargoed: their post-gap rows carry
    //      boundary state a naive time cut leaks) ----
    "q301_embargo_split" -> ((s, d) => {
      Events.embargoSplit(Tables.events(s, d), "user_id", "ts",
          trainFrac = (3, 5), testFrac = (7, 10))
        .select("event_id", "user_id", "split")
        .orderBy("event_id")
    }),

    // ---- as-of join: each purchase matched to latest prior view ----
    "q29_asof_purchase_view" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val views = ev.filter(col("event_type") === "view")
        .select("user_id", "ts", "value")
      // output µs (not ns): DuckDB truncates parquet ns timestamps to µs
      // on read, so µs is the finest precision both engines agree on
      Events.asofJoin(purchases, views, Seq("user_id"), "ts", "ts", Seq("value"))
        .select(
          col("user_id"), col("event_id"),
          expr("asof_ts div 1000").as("asof_ts_us"),
          round(col("asof_value"), 2).as("view_value"))
        .orderBy("user_id", "event_id")
    }),

    // ---- Structured Streaming forms (AvailableNow over the static
    //      table; must equal their batch counterparts exactly) ----
    "q49_stream_tumbling" -> ((s, d) => {
      graft.streaming.EventsStream.runTumblingOnce(s, d, HourNs)
        .orderBy("window_start_ns", "event_type")
    }),
    "q50_stream_sessionize" -> ((s, d) => {
      graft.streaming.EventsStream.runSessionizeOnce(s, d, GapNs)
        .groupBy("user_id")
        .agg(
          max("session_id").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- streaming in-flight dedup: a duplicated subset must collapse
    //      back to the source's distinct events ----
    "q67_stream_dedup" -> ((s, d) => {
      graft.streaming.EventsStream.runDedupOnce(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_ids"))
        .orderBy("event_type")
    }),

    // ---- watermarked stream-stream interval join: purchases × the
    //      same user's views in the preceding 24 h (bounded state) ----
    "q98_stream_join" -> ((s, d) => {
      graft.streaming.EventsStream.runJoinOnce(s, d)
        .orderBy("purchase_id", "view_id")
    }),

    // ---- LEFT OUTER stream-stream join: view-less purchases emit
    //      NULL rows on watermark-driven state eviction (a sentinel
    //      flush row drains the tail) — result equals the batch
    //      left join ----
    "q311_stream_outer_join" -> ((s, d) => {
      graft.streaming.EventsStream.runOuterJoinOnce(s, d)
        .orderBy("purchase_id", "view_id")
    }),

    // ---- stream-static dimension enrichment: events stream ⨝
    //      broadcast user-tier dim, Complete-mode aggregate ----
    "q318_stream_static_enrich" -> ((s, d) => {
      graft.streaming.EventsStream.runStreamStaticOnce(s, d)
        .orderBy("tier", "event_type")
    }),

    // ---- native session_window streaming agg (30-min gap) vs the
    //      batch gaps-and-islands oracle ----
    "q320_stream_session_window" -> ((s, d) => {
      graft.streaming.EventsStream.runSessionWindowOnce(s, d)
        .orderBy("user_id", "session_start_us")
    }),

    // ---- time-weighted average value per user (TWAP): interval-
    //      weighted, integer cents × integer ms ⇒ exact ----
    "q333_twap" -> ((s, d) => {
      Events.twap(Tables.events(s, d), "user_id", "ts", "value")
        .orderBy("user_id")
    }),

    // ---- Holt double-exponential daily-volume forecast per event
    //      type: α=β=1/2 keeps every intermediate a dyadic rational,
    //      so the sequential fold is float-EXACT and the oracle's
    //      recursive-CTE replay matches bit-for-bit unrounded ----
    "q334_holt_forecast" -> ((s, d) => {
      graft.operators.Forecast.holtDaily(
          Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type")
    }),

    // ---- event-time RANGE window frame: per-user rolling 7-day spend
    //      (RANGE BETWEEN 6 days PRECEDING — peers at equal ts all
    //      included, integer cents ⇒ exact) ----
    "q328_rolling_range_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"))
        .rangeBetween(-6L * 86400L * 1000000000L, 0L)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          floor(col("value").cast("double") * 100d + 0.5).cast("long")
            .as("__c"))
        .withColumn("rolling_7d_cents", sum("__c").over(w))
        .select(col("user_id"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("rolling_7d_cents"))
        .orderBy("user_id", "ts_us", "event_id")
    }),

    // ---- Wald SPRT per md5 user-cohort: sequential test of the
    //      purchase rate (H0 p=0.15 vs H1 p=0.35), first boundary
    //      crossing decides; shared 1e-12-grid ln constants keep
    //      both engines' LLR bit-identical ----
    "q343_sprt" -> ((s, d) => {
      graft.operators.Eval.sprt(
        Tables.events(s, d).withColumn("cohort",
          pmod(graft.functions.md5Long(
            concat(lit("sprt:"), col("user_id"))), lit(8))),
        "cohort", "ts", "event_id",
        success = col("event_type") === "purchase",
        p0 = 0.15, p1 = 0.35)
    }),

    // ---- bounded-state streaming dedup: dropDuplicatesWithinWatermark
    //      evicts per-key state at the re-delivery horizon (q67's
    //      plain dropDuplicates keeps state forever) ----
    "q349_stream_dedup_ttl" -> ((s, d) => {
      graft.streaming.EventsStream.runDedupTtlOnce(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_ids"))
        .orderBy("event_type")
    }),

    // ---- stationary distribution of the event-type Markov chain
    //      (vᵀP power iteration, integer-grid accumulation) ----
    "q351_markov_stationary" -> ((s, d) => {
      Events.markovStationary(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", iters = 12)
    }),

    // ---- Markov removal-effect attribution: journeys → absorbing
    //      chain → per-channel conversion-probability drop; exact
    //      integer fixed-point shared bit-for-bit with the oracle ----
    "q353_markov_attribution" -> ((s, d) => {
      Events.markovAttribution(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", convType = "purchase", iters = 16)
    }),

    // ---- Shapley-value attribution over journey channel sets (the
    //      cooperative-game companion of q353; exact integer
    //      factorial-weighted marginals) ----
    "q354_shapley_attribution" -> ((s, d) => {
      Events.shapleyAttribution(Tables.events(s, d), "user_id", "ts",
        "event_type", "event_id", convType = "purchase")
    }),

    // ---- quantile normalization of value across event types: each
    //      group's distribution mapped onto the pooled quantiles
    //      (integer tie-high ranks, grid-sized windows) ----
    "q355_quantile_normalize" -> ((s, d) => {
      graft.operators.Eval.quantileNormalizeGrid(
        Tables.events(s, d), "event_type", "value")
    }),

    // ---- one-way ANOVA F on value by event type (the parametric
    //      companion of q324's Kruskal–Wallis) ----
    "q344_anova_f" -> ((s, d) => {
      graft.operators.Eval.anovaF(Tables.events(s, d), "event_type", "value")
    }),

    // ---- Welch unequal-variance t for every event-type pair ----
    "q345_welch_t" -> ((s, d) => {
      graft.operators.Eval.welchT(Tables.events(s, d), "event_type", "value")
    }),

    // ---- Schuster periodogram of the daily volume series at 2/3/5/7/
    //      10/15-day candidate periods (shared 1e-12-grid trig
    //      literals — no libm trig in either engine) ----
    "q346_periodogram" -> ((s, d) => {
      graft.operators.Forecast.periodogramDaily(
        Tables.events(s, d), "ts", Seq(2, 3, 5, 7, 10, 15))
    }),

    // ---- Kruskal–Wallis H: do event types draw value from the same
    //      distribution? (tie-corrected, grid-exact ranks) ----
    "q324_kruskal_wallis" -> ((s, d) => {
      graft.operators.Eval.kruskalWallis(
        Tables.events(s, d), "event_type", "value")
    }),

    // ---- Huber robust mean per event type (IRLS ×3, k = $20) next
    //      to the plain mean it robustifies ----
    "q322_huber_mean" -> ((s, d) => {
      graft.operators.Eval.huberMean(
          Tables.events(s, d), "event_type", "value", k = 20.0)
        .orderBy("event_type")
    }),

    // ---- Hurst exponent of the daily volume series (R/S analysis
    //      over 4/8/16-day blocks, ln-ln regression on shared
    //      integer-grid points) ----
    "q364_hurst" -> ((s, d) => {
      graft.operators.Forecast.hurstDaily(Tables.events(s, d), "ts")
    }),

    // ---- cross-correlation of daily view vs purchase volumes at
    //      ±3-day lags: does one series lead the other? ----
    "q365_ccf" -> ((s, d) => {
      graft.operators.Forecast.ccfDaily(Tables.events(s, d), "ts",
        "event_type", "view", "purchase")
    }),

    // ---- classical additive seasonal decomposition of daily volume
    //      (centered MA(7) trend, zero-centered weekday indices) ----
    "q366_seasonal_decompose" -> ((s, d) => {
      graft.operators.Forecast.seasonalIndicesDaily(
        Tables.events(s, d), "ts")
    }),

    // ---- normalized spectral entropy over q346's candidate periods:
    //      is the volume energy concentrated or flat? ----
    "q367_spectral_entropy" -> ((s, d) => {
      graft.operators.Forecast.spectralEntropyDaily(
        Tables.events(s, d), "ts", Seq(2, 3, 5, 7, 10, 15))
    }),

    // ---- CEP sequence pattern via flatMapGroupsWithState: every
    //      purchase pairs with its latest strictly-earlier view
    //      within 1 h (exclusive-latest — the q98 join can't) ----
    "q375_stream_pattern" -> ((s, d) => {
      graft.streaming.EventsStream.runPatternOnce(s, d)
        .orderBy("purchase_id")
    }),

    // ---- DTW between the view and purchase diurnal profiles:
    //      optimal time-warped alignment vs the rigid diagonal ----
    "q411_dtw" -> ((s, d) => {
      graft.operators.Forecast.dtwDiurnal(Tables.events(s, d), "ts",
        "event_type", "view", "purchase")
    }),

    // ---- Mann–Kendall: distribution-free monotone-trend screen on
    //      daily volume (presence test before q213's Theil–Sen) ----
    "q413_mann_kendall" -> ((s, d) => {
      graft.operators.Forecast.mannKendallDaily(Tables.events(s, d), "ts")
    }),

    // ---- lag-1 Granger causality: does yesterday's view volume
    //      predict today's purchases beyond purchases' own past? ----
    "q414_granger" -> ((s, d) => {
      graft.operators.Forecast.grangerDaily(Tables.events(s, d), "ts",
        "event_type", "view", "purchase")
    }),

    // ---- Chow test: structural break of the daily linear trend at
    //      the grid midpoint ----
    "q415_chow" -> ((s, d) => {
      graft.operators.Forecast.chowDaily(Tables.events(s, d), "ts")
    }),

    // ---- Spearman rank correlation between daily view and purchase
    //      volumes (monotone association next to q372's tau) ----
    "q416_spearman" -> ((s, d) => {
      graft.operators.Forecast.spearmanDaily(Tables.events(s, d), "ts",
        "event_type", "view", "purchase")
    }),

    // ---- diurnal stationarity: chi-square homogeneity of the
    //      24-hour profile, weekday vs weekend ----
    "q417_diurnal_chi2" -> ((s, d) => {
      graft.operators.Forecast.diurnalStationarity(Tables.events(s, d),
        "ts")
    }),

    // ---- Jarque-Bera: is daily volume even roughly Gaussian?
    //      (moment-based normality screen before z-scored rules) ----
    "q418_jarque_bera" -> ((s, d) => {
      graft.operators.Forecast.jarqueBeraDaily(Tables.events(s, d), "ts")
    }),

    // ---- Durbin-Watson: serial correlation of the residuals around
    //      the daily linear trend ----
    "q419_durbin_watson" -> ((s, d) => {
      graft.operators.Forecast.durbinWatsonDaily(Tables.events(s, d),
        "ts")
    }),

    // ---- Bartlett's equal-variance test across event types — the
    //      parametric sibling of q377's Levene (χ²_{k−1} under
    //      normality; more powerful there, fragile off it) ----
    "q420_bartlett" -> ((s, d) => {
      graft.operators.Eval.bartlett(Tables.events(s, d), "event_type",
        "value")
    }),

    // ---- Cox-Stuart trend test: sign test on maximally-separated
    //      daily-count pairs (q413 Mann-Kendall's O(T) cousin) ----
    "q421_cox_stuart" -> ((s, d) => {
      graft.operators.Forecast.coxStuartDaily(Tables.events(s, d), "ts")
    }),

    // ---- PACF lags 1-3 via Durbin-Levinson: the AR-order cutoff
    //      diagnostic raw ACF can't give ----
    "q422_pacf" -> ((s, d) => {
      graft.operators.Forecast.pacfDaily(Tables.events(s, d), "ts")
    }),

    // ---- Bradley-Terry strengths over daily volume duels: each day,
    //      each event-type pair, higher daily count wins; two MM
    //      iterations from p=1 (the Arena-style pairwise ranker) ----
    "q424_bradley_terry" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .select(expr("ts div 86400000000000").as("d"), col("event_type"))
        .groupBy("d", "event_type").agg(count(lit(1)).as("n"))
      val duels = daily.as("a").join(daily.as("b"),
          col("a.d") === col("b.d") && col("a.n") > col("b.n"))
        .select(col("a.event_type").as("winner"),
          col("b.event_type").as("loser"))
      graft.operators.Eval.bradleyTerry(duels, "winner", "loser",
          iters = 2)
        .orderBy("item")
    }),

    // ---- Fisher's exact 2×2 per event type: are the two sparse
    //      flags associated? (the small-count complement of the χ²
    //      association gates; margins ~n/97 keep the enumeration
    //      grid-sized) ----
    "q425_fisher_exact" -> ((s, d) => {
      graft.operators.Eval.fisherExact(
        Tables.events(s, d)
          .withColumn("fa", pmod(col("user_id"), lit(97L)) === 0L)
          .withColumn("fb", pmod(col("event_id"), lit(89L)) === 0L),
        "event_type", "fa", "fb")
    }),

    // ---- Cochran-Armitage trend across 5 ordered dose levels ----
    "q426_cochran_armitage" -> ((s, d) => {
      graft.operators.Eval.cochranArmitage(
        Tables.events(s, d)
          .withColumn("dose", pmod(col("user_id"), lit(5L)))
          .withColumn("hit", pmod(col("event_id"), lit(3L)) === 0L),
        "dose", "hit")
    }),

    // ---- Brown-Forsythe: q377's Levene re-centered on exact group
    //      medians (the robust form for skewed values) ----
    "q427_brown_forsythe" -> ((s, d) => {
      graft.operators.Eval.brownForsythe(Tables.events(s, d),
        "event_type", "value")
    }),

    // ---- Tukey HSD pairwise q statistics against the pooled MSE:
    //      the equal-variance post-hoc after q344's ANOVA ----
    "q428_tukey_hsd" -> ((s, d) => {
      graft.operators.Eval.tukeyHsd(Tables.events(s, d), "event_type",
        "value")
    }),

    // ---- Dunn's rank post-hoc after q324's Kruskal-Wallis ----
    "q429_dunn" -> ((s, d) => {
      graft.operators.Eval.dunnTest(Tables.events(s, d), "event_type",
        "value")
    }),

    // ---- Mantel-Haenszel pooled OR + CMH χ² across event-type
    //      strata (the Simpson-safe pooled 2×2) ----
    "q430_mantel_haenszel" -> ((s, d) => {
      graft.operators.Eval.mantelHaenszel(
        Tables.events(s, d)
          .withColumn("ex", pmod(col("user_id"), lit(2L)) === 0L)
          .withColumn("ou", pmod(col("event_id"), lit(2L)) === 0L),
        "event_type", "ex", "ou")
    }),

    // ---- two-sample Cramér-von Mises distance between the value
    //      distributions of two user cohorts (body-sensitive where
    //      q152's KS sees only the largest gap) ----
    "q431_cramer_von_mises" -> ((s, d) => {
      graft.operators.Eval.cramerVonMises(
        Tables.events(s, d)
          .withColumn("side", pmod(col("user_id"), lit(2L)) === 0L),
        "value", "side")
    }),

    // ---- Page's trend test: do daily volumes follow the
    //      hypothesized (lexicographic) type order? ----
    "q432_page_trend" -> ((s, d) => {
      graft.operators.Forecast.pageTrendDaily(Tables.events(s, d),
        "ts", "event_type")
    }),

    // ---- Kendall's W: day-over-day concordance of the type ranking
    //      (the effect size behind q373's Friedman χ²) ----
    "q433_kendall_w" -> ((s, d) => {
      graft.operators.Forecast.kendallWDaily(Tables.events(s, d),
        "ts", "event_type")
    }),

    // ---- Breusch-Pagan: does residual VARIANCE around the daily
    //      trend grow with time? (q419 DW's scale sibling) ----
    "q434_breusch_pagan" -> ((s, d) => {
      graft.operators.Forecast.breuschPaganDaily(Tables.events(s, d),
        "ts")
    }),

    // ---- Dickey-Fuller lag-0 unit-root t: mean-reversion screen
    //      before the q422 PACF's AR closed forms ----
    "q435_dickey_fuller" -> ((s, d) => {
      graft.operators.Forecast.dickeyFullerDaily(Tables.events(s, d),
        "ts")
    }),

    // ---- Mood's median test: one-bit-per-row location comparison
    //      against the exact grand median (the assumption-free end of
    //      the q324/q344 location-test spectrum) ----
    "q438_mood_median" -> ((s, d) => {
      graft.operators.Eval.moodMedian(Tables.events(s, d),
        "event_type", "value")
    }),

    // ---- Jonckheere-Terpstra ordered-alternative test across 3
    //      dose groups (continuous sibling of q426's CA trend) ----
    "q439_jonckheere" -> ((s, d) => {
      graft.operators.Eval.jonckheereTerpstra(
        Tables.events(s, d)
          .withColumn("dose", pmod(col("user_id"), lit(3L))),
        "dose", "value")
    }),

    // ---- Viterbi HMM decode of per-user gap-bucket sequences:
    //      max-probability regime score + terminal state, exact
    //      integer micro-nat DP ----
    "q440_viterbi" -> ((s, d) => {
      graft.operators.Events.viterbiDecode(Tables.events(s, d),
        "user_id", "ts", "event_id")
    }),

    // ---- Mann-Whitney U, click vs view values: the pairwise rank
    //      test under q324's Kruskal-Wallis omnibus ----
    "q441_mann_whitney" -> ((s, d) => {
      graft.operators.Eval.mannWhitney(Tables.events(s, d),
        "event_type", "value", "click", "view")
    }),

    // ---- Pettitt nonparametric change-point on daily volumes (the
    //      rank-based member of the CUSUM/Chow/binary-seg family) ----
    "q443_pettitt" -> ((s, d) => {
      graft.operators.Forecast.pettittDaily(Tables.events(s, d), "ts")
    }),

    // ---- Ansari-Bradley rank scale test, click vs view: dispersion
    //      without the normality/deviation models of q420/q377/q427 ----
    "q444_ansari_bradley" -> ((s, d) => {
      graft.operators.Eval.ansariBradley(Tables.events(s, d),
        "event_type", "value", "click", "view")
    }),

    // ---- Fleiss' kappa: do the event types agree on which users
    //      produce high-value activity? (multi-rater agreement) ----
    "q408_fleiss_kappa" -> ((s, d) => {
      graft.operators.Eval.fleissKappa(Tables.events(s, d), "user_id",
        "event_type", col("value") > 300)
    }),

    // ---- Gumbel fit to weekly block maxima with return levels ----
    "q409_gumbel" -> ((s, d) => {
      graft.operators.Forecast.gumbelMaximaDaily(Tables.events(s, d),
        "ts")
    }),

    // ---- Wilcoxon signed-rank on the per-user purchase-vs-view
    //      value gap (the rank companion of q378's sign-flip) ----
    "q406_wilcoxon" -> ((s, d) => {
      graft.operators.Eval.wilcoxonSignedRank(Tables.events(s, d),
        "user_id", "value", col("event_type") === "purchase",
        col("event_type") === "view")
    }),

    // ---- 2×2 odds-ratio / relative-risk panel: do high-value
    //      errors co-occur with high-value purchases per user? ----
    "q407_odds_ratio" -> ((s, d) => {
      graft.operators.Eval.oddsRatioPanel(Tables.events(s, d),
        "user_id",
        col("event_type") === "error" && col("value") > 200,
        col("event_type") === "purchase" && col("value") > 200)
    }),

    // ---- 1-D DBSCAN over value cents (eps $1, minPts 5): density
    //      bands + noise without choosing k ----
    "q404_dbscan" -> ((s, d) => {
      graft.operators.Eval.dbscan1d(Tables.events(s, d),
        floor(col("value") * 100 + 0.5), eps = 100L, minPts = 5L)
    }),

    // ---- Haar wavelet energy by time scale over the 32-day window ----
    "q401_haar_energy" -> ((s, d) => {
      graft.operators.Forecast.haarEnergyDaily(Tables.events(s, d),
        "ts")
    }),

    // ---- Ljung–Box whiteness test over the first 7 daily lags ----
    "q402_ljung_box" -> ((s, d) => {
      graft.operators.Forecast.ljungBoxDaily(Tables.events(s, d), "ts")
    }),

    // ---- eventually-follows matrix (process mining): does type a
    //      strictly precede type b somewhere in a user's history? ----
    "q397_eventually_follows" -> ((s, d) => {
      graft.operators.Events.eventuallyFollows(Tables.events(s, d),
        "user_id", "ts", "event_type")
    }),

    // ---- Seasonal-ESD day anomalies: generalized ESD on the
    //      weekly-decomposed residuals (Twitter S-H-ESD shape) ----
    "q395_seasonal_esd" -> ((s, d) => {
      graft.operators.Forecast.seasonalEsdDaily(Tables.events(s, d),
        "ts")
    }),

    // ---- Grubbs' single-outlier test on event values ----
    "q390_grubbs" -> ((s, d) => {
      graft.operators.Eval.grubbs(Tables.events(s, d), "value")
    }),

    // ---- jackknife SE of the revenue-per-event ratio (users are
    //      the exchangeable unit, not rows) ----
    "q391_jackknife_ratio" -> ((s, d) => {
      graft.operators.Eval.jackknifeRatio(
        Tables.events(s, d).where(col("value").isNotNull), "user_id",
        when(col("event_type") === "purchase",
          floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L),
        lit(1L))
    }),

    // ---- Markov entropy rate: predictability of the next event
    //      type given the current one ----
    "q392_entropy_rate" -> ((s, d) => {
      graft.operators.Events.markovEntropyRate(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id")
    }),

    // ---- matrix profile of daily volume: nearest-neighbor squared
    //      distance per 5-day window (motif/discord detector) ----
    "q386_matrix_profile" -> ((s, d) => {
      graft.operators.Forecast.matrixProfileDaily(
        Tables.events(s, d), "ts")
    }),

    // ---- Hill tail-index estimator over the top-50 value order
    //      statistics (heavy-tail audit) ----
    "q387_hill_tail" -> ((s, d) => {
      graft.operators.Eval.hillTail(
        Tables.events(s, d).where(col("value").isNotNull),
        floor(col("value") * 100 + 0.5))
    }),

    // ---- naive vs seasonal-naive forecast-error panel (MAE/RMSE/
    //      MASE over the shared valid range) ----
    "q388_forecast_errors" -> ((s, d) => {
      graft.operators.Forecast.naiveForecastErrorsDaily(
        Tables.events(s, d), "ts")
    }),

    // ---- Cochran's Q: do high-value events fire at the same rate
    //      across event types for the same users? (binary Friedman) ----
    "q382_cochran_q" -> ((s, d) => {
      graft.operators.Eval.cochranQ(Tables.events(s, d), "user_id",
        "event_type", col("value") > 300)
    }),

    // ---- Wald–Wolfowitz runs test on daily volume up/down moves ----
    "q385_runs_test" -> ((s, d) => {
      graft.operators.Forecast.runsTestDaily(Tables.events(s, d), "ts")
    }),

    // ---- isotonic (PAVA) calibration of the basis-point pseudo-
    //      probability against the purchase label: exact minimax fit
    //      over 12 score buckets, monotone by construction ----
    "q381_isotonic" -> ((s, d) => {
      graft.operators.Eval.isotonicCalibration(
        Tables.events(s, d).where(col("value").isNotNull),
        pmod(floor(col("value") * 100 + 0.5).cast("long"), lit(101L)),
        col("event_type") === "purchase")
    }),

    // ---- streaming token-bucket rate limiter: 3-token buckets,
    //      1 token/hour refill, integer micro-token admission ----
    "q380_token_bucket" -> ((s, d) => {
      graft.streaming.EventsStream.runTokenBucketOnce(s, d)
        .orderBy("user_id")
    }),

    // ---- effect-size panel (Cohen's d / Hedges' g / Cliff's delta)
    //      for every event-type pair — magnitude next to q345's t ----
    "q376_effect_sizes" -> ((s, d) => {
      graft.operators.Eval.effectSizes(Tables.events(s, d),
        "event_type", "value")
    }),

    // ---- Levene's equal-variance test across event types (ANOVA on
    //      |x − group mean|, the q344 precondition check) ----
    "q377_levene" -> ((s, d) => {
      graft.operators.Eval.leveneMean(Tables.events(s, d),
        "event_type", "value")
    }),

    // ---- paired sign-flip permutation test: per-user purchase-vs-
    //      view value gap, 200 deterministic md5 re-signings ----
    "q378_sign_flip" -> ((s, d) => {
      graft.operators.Eval.signFlipTest(Tables.events(s, d), "user_id",
        "value", col("event_type") === "purchase",
        col("event_type") === "view")
    }),

    // ---- Kendall τ-b between daily view and purchase volumes:
    //      tie-corrected pair concordance over the day grid ----
    "q372_kendall_tau" -> ((s, d) => {
      graft.operators.Forecast.kendallTauDaily(Tables.events(s, d),
        "ts", "event_type", "view", "purchase")
    }),

    // ---- Friedman rank test: do event types keep the same daily
    //      volume ordering? (within-day tie-averaged ranks) ----
    "q373_friedman" -> ((s, d) => {
      graft.operators.Forecast.friedmanDaily(Tables.events(s, d),
        "ts", "event_type")
    }),

    // ---- McNemar paired test: do high-value errors and high-value
    //      purchases fire for the SAME users? (paired proportions —
    //      only the discordant cells carry information) ----
    "q360_mcnemar" -> ((s, d) => {
      graft.operators.Eval.mcnemar(Tables.events(s, d), "user_id",
        col("event_type") === "error" && col("value") > 200,
        col("event_type") === "purchase" && col("value") > 200)
    }),

    // ---- log-rank test: time from first event to first purchase
    //      (censored at last activity), even vs odd user cohorts ----
    "q361_logrank" -> ((s, d) => {
      val per = Tables.events(s, d).groupBy("user_id").agg(
        min("ts").as("t0"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tp"),
        max("ts").as("t1"))
      val dur = per.select(pmod(col("user_id"), lit(2)).as("grp"),
        expr(s"(coalesce(tp, t1) - t0) div ${24 * HourNs}").as("dur"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("evt"))
      graft.operators.Eval.logRank(dur, "grp", "dur", "evt")
    }),

    // ---- average precision (PR-AUC): does value rank purchases
    //      ahead of the rest? (q180 ROC AUC's imbalance-robust twin) ----
    "q362_pr_auc" -> ((s, d) => {
      graft.operators.Eval.averagePrecision(
        Tables.events(s, d).where(col("value").isNotNull),
        floor(col("value") * 100 + 0.5).cast("long"),
        col("event_type") === "purchase")
    }),

    // ---- Murphy decomposition of the Brier score for a basis-point
    //      pseudo-probability against the purchase label ----
    "q363_brier_decomposition" -> ((s, d) => {
      graft.operators.Eval.brierDecomposition(
        Tables.events(s, d).where(col("value").isNotNull),
        pmod(floor(col("value") * 100 + 0.5).cast("long"), lit(101L)),
        col("event_type") === "purchase")
    }),

    // ---- funnel: ordered view→click→purchase completion within 7d ----
    "q120_funnel" -> ((s, d) => {
      Events.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), 7L * 24 * HourNs)
    }),

    // ---- weekly cohort retention matrix ----
    "q121_cohort_retention" -> ((s, d) => {
      Events.cohortRetention(Tables.events(s, d), "user_id", "ts",
          7L * 24 * HourNs)
        .orderBy("cohort_start_ns", "period_offset")
    }),

    // ---- first-order event-type transition matrix ----
    "q122_transitions" -> ((s, d) => {
      Events.transitions(Tables.events(s, d), "user_id", "ts",
          "event_type", "event_id")
        .orderBy("from_type", "to_type")
    }),

    // ---- exponential time-decay activity score (recency weighting,
    //      half-life 7 days, anchored at the corpus max ts) ----
    "q138_decayed_activity" -> ((s, d) => {
      Events.decayedActivity(Tables.events(s, d), "user_id", "ts", "value",
          halfLifeNs = 7L * 24 * HourNs)
        .orderBy("user_id")
    }),

    // ---- hourly volume anomalies per event type (|z| >= 2) ----
    "q156_volume_anomalies" -> ((s, d) => {
      Events.volumeAnomalies(Tables.events(s, d), "ts", HourNs,
          Seq("event_type"), zThreshold = 2.0)
        .orderBy("event_type", "window_start_ns")
    }),

    // ---- inter-event cadence: mean/std gaps + burstiness ----
    "q157_burstiness" -> ((s, d) => {
      Events.interEventStats(Tables.events(s, d), "user_id", "ts")
        .orderBy("user_id")
    }),

    // ---- rolling 7-day distinct users by day (exact sliding distinct) ----
    "q161_rolling_distinct" -> ((s, d) => {
      Events.rollingDistinct(Tables.events(s, d), "user_id", "ts",
          periodNs = 24 * HourNs, periods = 7)
        .orderBy("period")
    }),

    // ---- CUSUM sustained-shift detection on hourly volumes ----
    "q162_cusum_shifts" -> ((s, d) => {
      Events.cusumShifts(Tables.events(s, d), "event_type", "ts",
          windowNs = HourNs, slack = 0.5)
        .orderBy("event_type")
    }),

    // ---- streaming daily-active users (cross-batch dedup state +
    //      windowed count — the streaming DAU counter) ----
    "q170_stream_daily_active" -> ((s, d) => {
      graft.streaming.EventsStream.runDailyActiveOnce(s, d, "user_id",
          periodNs = 24 * HourNs)
        .orderBy("period_start_ns")
    }),

    // ---- rolling distinct via mergeable HLL sketches, audited ----
    "q171_rolling_distinct_hll" -> ((s, d) => {
      graft.operators.Sketches.rollingDistinctHll(Tables.events(s, d),
          "user_id", "ts", periodNs = 24 * HourNs, periods = 7)
        .orderBy("period")
    }),

    // ---- per-type volume trend (integer-exact OLS over hourly counts) ----
    "q176_volume_trend" -> ((s, d) => {
      Events.volumeTrend(Tables.events(s, d), "event_type", "ts", HourNs)
        .orderBy("event_type")
    }),

    // ---- per-type diurnal (hour-of-day) activity profile ----
    "q177_diurnal_profile" -> ((s, d) => {
      Events.diurnalProfile(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type", "hour_of_day")
    }),

    // ---- Gini coefficient of per-user event concentration ----
    "q184_gini_users" -> ((s, d) => {
      graft.operators.Profile.giniConcentration(Tables.events(s, d), "user_id")
    }),

    // ---- quadratic volume trend (curvature: growing but slowing?) ----
    "q187_quadratic_trend" -> ((s, d) => {
      Events.volumeTrendQuadratic(Tables.events(s, d), "event_type", "ts",
          HourNs)
        .orderBy("event_type")
    }),

    // ---- frequent event-type triples per user basket (a-priori L3) ----
    "q188_triple_lift" -> ((s, d) => {
      graft.operators.Itemsets.tripleLift(Tables.events(s, d),
          "user_id", "event_type", minSupport = 2)
        .orderBy("item_a", "item_b", "item_c")
    }),

    // ---- next-event majority predictor: train on even-hash users,
    //      per-from-type accuracy on the held-out half ----
    "q191_next_event_eval" -> ((s, d) => {
      Events.nextEventEval(Tables.events(s, d), "user_id", "ts",
          "event_type", "event_id")
        .orderBy("from_type")
    }),

    // ---- streaming CUSUM alert monitor vs a known reference mean
    //      (drift increments are exact multiples of 0.5 ⇒ the whole
    //      recurrence is float-exact cross-engine) ----
    "q202_stream_cusum" -> ((s, d) => {
      graft.streaming.EventsStream.runCusumOnce(s, d, 6 * HourNs,
          mu0 = 2.5, slack = 0.5, h = 20.0)
        .orderBy("event_type", "window_start_ns")
    }),

    // ---- item-item CF cosine over user×event-type count vectors ----
    "q214_item_item_cosine" -> ((s, d) => {
      graft.operators.Itemsets.itemItemCosine(Tables.events(s, d),
          "user_id", "event_type")
        .orderBy("item_a", "item_b")
    }),

    // ---- HLL audience-overlap audit (inclusion-exclusion vs exact) ----
    "q215_hll_overlap" -> ((s, d) => {
      graft.operators.Sketches.hllIntersectionAudit(Tables.events(s, d),
          "user_id", "event_type")
        .orderBy("group_a", "group_b")
    }),

    // ---- last-touch purchase attribution ----
    "q216_last_touch" -> ((s, d) => {
      Events.lastTouchAttribution(Tables.events(s, d), "user_id", "ts",
          "event_type", convType = "purchase", tieBreak = "event_id")
        .orderBy("event_type")
    }),

    // ---- A/B two-proportion z-test: purchase conversion across the
    //      md5-parity user split ----
    "q211_ab_test" -> ((s, d) => {
      graft.operators.Eval.abTest(Tables.events(s, d), "user_id",
          groupPred = pmod(graft.functions.md5Long(col("user_id")), lit(2L)) === 0,
          convPred = col("event_type") === "purchase")
    }),

    // ---- Mann-Kendall non-parametric trend test (daily volumes) ----
    "q212_mann_kendall" -> ((s, d) => {
      Events.mannKendall(Tables.events(s, d), "event_type", "ts",
          windowNs = 24 * HourNs)
        .orderBy("event_type")
    }),

    // ---- Theil-Sen robust slope (median of pairwise slopes) ----
    "q213_theil_sen" -> ((s, d) => {
      Events.theilSen(Tables.events(s, d), "event_type", "ts",
          windowNs = 24 * HourNs)
        .orderBy("event_type")
    }),

    // ---- Kaplan-Meier time-to-first-purchase survival curve ----
    "q205_kaplan_meier" -> ((s, d) => {
      val durations = Events.timeToEvent(Tables.events(s, d), "user_id",
          "ts", col("event_type") === "purchase", windowNs = 24 * HourNs)
      Events.kaplanMeier(durations, "duration", "censored")
        .orderBy("duration")
    }),

    // ---- SAX motif mining over per-type volume series ----
    "q206_sax_motifs" -> ((s, d) => {
      Events.saxMotifs(Tables.events(s, d), "event_type", "ts", HourNs,
          paa = 4, wordLen = 3, minCount = 2)
        .orderBy("event_type", "motif")
    }),

    // ---- hour-of-day seasonality strength (η² of the diurnal layout) ----
    "q207_seasonality_strength" -> ((s, d) => {
      Events.seasonalityStrength(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type")
    }),

    // ---- ε-DP noisy count release (seeded two-sided geometric) ----
    "q200_dp_noisy_counts" -> ((s, d) => {
      graft.operators.Privacy.dpNoisyCounts(Tables.events(s, d),
          "event_type", epsilon = 0.5)
        .orderBy("event_type")
    }),

    // ---- RFM segmentation on quintile cutpoints ----
    "q221_rfm" -> ((s, d) => {
      Events.rfmSegments(Tables.events(s, d), "user_id", "ts", "value",
          "event_type")
        .orderBy("r_score", "f_score", "m_score")
    }),

    // ---- robust median/MAD volume outliers ----
    "q222_mad_outliers" -> ((s, d) => {
      Events.madOutliers(Tables.events(s, d), "event_type", "ts", HourNs,
          threshold = 2.0)
        .orderBy("event_type", "t")
    }),

    // ---- best single changepoint per key (binary-segmentation step) ----
    "q223_changepoint" -> ((s, d) => {
      Events.changepoint(Tables.events(s, d), "event_type", "ts", HourNs)
        .orderBy("event_type")
    }),

    // ---- truncated-kernel EWMA spike windows ----
    "q224_ewma_spikes" -> ((s, d) => {
      Events.ewmaSpikes(Tables.events(s, d), "event_type", "ts", HourNs,
          lookback = 16, spikeFactor = 1.5)
        .orderBy("event_type", "t")
    }),

    // ---- top ordered session paths ----
    "q225_session_paths" -> ((s, d) => {
      Events.sessionPaths(Tables.events(s, d), "user_id", "ts",
          "event_type", "event_id", GapNs, maxLen = 5, topK = 20)
    }),

    // ---- autocorrelation of daily volumes at lags 1..7 ----
    "q230_acf" -> ((s, d) => {
      Events.acf(Tables.events(s, d), "event_type", "ts",
          windowNs = 24 * HourNs, maxLag = 7)
        .orderBy("event_type", "lag")
    }),

    // ---- position-based (U-shaped) multi-touch attribution ----
    "q233_position_attribution" -> ((s, d) => {
      Events.positionAttribution(Tables.events(s, d), "user_id", "ts",
          "event_type", convType = "purchase", tieBreak = "event_id")
        .orderBy("event_type")
    }),

    // ---- SCD type-2 history build from the event change log ----
    "q234_scd2" -> ((s, d) => {
      Events.scd2Intervals(Tables.events(s, d), "user_id", "ts",
          "event_type", "event_id")
        .orderBy("user_id", "version")
    }),

    // ---- inter-arrival stats + exponential MLE per type ----
    "q235_interarrival" -> ((s, d) => {
      Events.interArrival(Tables.events(s, d), "event_type", "ts",
          "event_id")
        .orderBy("event_type")
    }),

    // ---- session entry/exit audit (bounce rate, modal exit) ----
    "q236_entry_exit" -> ((s, d) => {
      Events.sessionEntryExit(Tables.events(s, d), "user_id", "ts",
          "event_type", "event_id", GapNs)
        .orderBy("entry_type")
    }),

    // ---- difference-in-differences: md5-parity treatment × pre/post
    //      at the data-range midpoint, on event value ----
    "q246_diff_in_diff" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val mid = ev.agg(expr("(min(ts) + max(ts)) div 2").as("__mid"))
      graft.operators.Eval.diffInDiff(ev.crossJoin(broadcast(mid)),
        pmod(graft.functions.md5Long(col("user_id")), lit(2L)) === 1,
        col("ts") >= col("__mid"), "value")
    }),

    // ---- circular peak hour + concentration per type ----
    "q284_circular_peak" -> ((s, d) => {
      Events.circularPeakHour(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type")
    }),

    // ---- sampling-error audit: md5 10% sample estimates vs exact ----
    "q282_sample_estimate_audit" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val exact = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val est = ev
        .where(pmod(graft.functions.md5Long(col("event_id")), lit(10L)) === 0)
        .groupBy("event_type")
        .agg((count(lit(1)) * 10).as("est"))
      exact.join(est, Seq("event_type"), "left")
        .select(col("event_type"), col("n"),
          coalesce(col("est"), lit(0L)).as("est_n"),
          round(abs(coalesce(col("est"), lit(0L)) - col("n"))
            .cast("double") / col("n"), 6).as("rel_err"))
        .orderBy("event_type")
    }),

    // ---- consecutive-pair transition latency table ----
    "q277_transition_latency" -> ((s, d) => {
      Events.transitionLatency(Tables.events(s, d), "user_id", "ts",
          "event_type", "event_id")
        .orderBy("from_type", "to_type")
    }),

    // ---- per-user purchase regularity (gap CV) ----
    "q278_purchase_regularity" -> ((s, d) => {
      Events.interEventRegularity(Tables.events(s, d), "user_id", "ts",
          "event_type", ofType = "purchase", tieBreak = "event_id",
          minGaps = 3)
        .orderBy("user_id")
    }),

    // ---- the STATEFUL streaming twin of q273: per-user sequential
    //      fold in flatMapGroupsWithState, same oracle ----
    "q274_stream_ledger" -> ((s, d) => {
      graft.streaming.EventsStream.runLedgerOnce(s, d,
          when(col("event_type") === "purchase", -col("value"))
            .otherwise(col("value")))
        .orderBy("user_id")
    }),

    // ---- consistent-hash ring resize: 8 → 9 nodes over customer
    //      keys ----
    "q275_consistent_hash" -> ((s, d) => {
      graft.operators.Layout.consistentHashMovement(Tables.orders(s, d),
        "o_custkey", nBefore = 8)
    }),

    // ---- floor-clamped running balance via the running-min identity
    //      (purchases debit, everything else credits) ----
    "q273_clamped_balance" -> ((s, d) => {
      Events.clampedBalance(Tables.events(s, d), "user_id", "ts",
          "event_id",
          when(col("event_type") === "purchase", -col("value"))
            .otherwise(col("value")))
        .orderBy("user_id")
    }),

    // ---- smoothed target encoding of event_type on value ----
    "q265_target_encoding" -> ((s, d) => {
      graft.operators.Eval.targetEncode(Tables.events(s, d),
          "event_type", col("value"), m = 20.0)
        .orderBy("category")
    }),

    // ---- Poisson overdispersion (index of dispersion) per type ----
    "q247_dispersion" -> ((s, d) => {
      Events.dispersionIndex(Tables.events(s, d), "event_type", "ts",
          windowNs = 24 * HourNs)
        .orderBy("event_type")
    }),

    // ---- daily first-seen growth curve (new + cumulative users) ----
    "q249_growth_accounting" -> ((s, d) => {
      Events.firstSeenGrowth(Tables.events(s, d), "user_id", "ts",
          24 * HourNs)
        .orderBy("period")
    }),

    // ---- streaming heavy-hitter state + top-k report (q30's
    //      streaming form) ----
    "q257_stream_topk" -> ((s, d) => {
      graft.streaming.EventsStream.runTopKeysOnce(s, d, "user_id", k = 10)
    }),

    // ---- streaming first-seen state (Complete-mode min agg) + batch
    //      growth report; must equal batch q249 exactly ----
    "q252_stream_first_seen" -> ((s, d) => {
      graft.streaming.EventsStream.runFirstSeenOnce(s, d, "user_id",
          24 * HourNs)
        .orderBy("period")
    }),

    // ---- weekly growth accounting: new/retained/resurrected/churned ----
    "q250_user_states" -> ((s, d) => {
      Events.userStateAccounting(Tables.events(s, d), "user_id", "ts",
          7 * 24 * HourNs)
        .orderBy("period")
    }),

    // ---- entropy l-diversity of (event_type, day) vs user_id ----
    "q239_l_diversity" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("day", expr(s"ts div ${24 * HourNs}"))
      graft.operators.Eval.lDiversity(ev, Seq("event_type", "day"),
          "user_id", minL = 5)
        .orderBy("event_type", "day")
    }),

    // ---- point-in-time (as-of) read of the q234 SCD2 history at the
    //      data-range midpoint ----
    "q241_asof_snapshot" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val scd = Events.scd2Intervals(ev, "user_id", "ts", "event_type",
        "event_id")
      val t = ev.agg(expr("(min(ts) + max(ts)) div 2").as("__t"))
      scd.crossJoin(broadcast(t))
        .where(col("valid_from_ns") <= col("__t") &&
          (col("valid_to_ns").isNull || col("__t") < col("valid_to_ns")))
        .select("user_id", "version", "event_type", "valid_from_ns",
          "n_events")
        .orderBy("user_id")
    }),

    // ---- heavy hitters ----
    "q30_top_users" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy(col("n").desc, col("user_id").asc)
        .limit(10)
    }))

  // gap-filled hourly grid shared by the q222/q223/q224 oracles —
  // replicates Events.gridCounts exactly (same CTEs as q176)
  private val GridCte =
    s"""c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w, b.w0 FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w - g.w0 AS t, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w))"""

  // q224's 16 one-step lag terms, renormalized over the lags present —
  // weights are exact dyadics so the sums replay bit-identically
  private val EwmaNum = (1 to 16).map(j =>
    s"CASE WHEN x$j IS NULL THEN 0 ELSE power(0.5, ${j - 1}) * x$j END")
    .mkString(" + ")
  private val EwmaDen = (1 to 16).map(j =>
    s"CASE WHEN x$j IS NULL THEN 0 ELSE power(0.5, ${j - 1}) END")
    .mkString(" + ")
  private val EwmaLags = (1 to 16).map(j =>
    s"lag(n, $j) OVER (PARTITION BY k ORDER BY t) AS x$j").mkString(", ")

  val oracle: Map[String, String] = Map(
    // R/S per complete block from exact integer moments (sqrt is
    // IEEE-exact); regression over 1e-6-grid integer (ln n, ln R/S)
    // points — the ln-n axis is the operator's own literal table
    "q364_hurst" -> {
      val nsRows = graft.operators.Forecast.hurstLnTable(Seq(4, 8, 16))
        .map { case (n, x6) => s"($n, CAST($x6 AS BIGINT))" }.mkString(", ")
      s"""WITH ns(n, x6) AS (VALUES $nsRows),
          ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d,
            d1 - d0 + 1 AS tt FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y, g.tt
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          rows_ AS (
            SELECT s.t, s.y, ns.n, ns.x6, s.t // ns.n AS blk
            FROM series s CROSS JOIN ns
            WHERE (s.t // ns.n + 1) * ns.n <= s.tt),
          staged AS (
            SELECT *,
              sum(y) OVER (PARTITION BY n, blk ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
              row_number() OVER (PARTITION BY n, blk ORDER BY t) AS k,
              sum(y) OVER (PARTITION BY n, blk) AS sb,
              sum(y * y) OVER (PARTITION BY n, blk) AS qb
            FROM rows_),
          per AS (
            SELECT n, x6, blk,
              max(CAST(cs AS DOUBLE) - k * (CAST(sb AS DOUBLE) / n))
                AS zmax,
              min(CAST(cs AS DOUBLE) - k * (CAST(sb AS DOUBLE) / n))
                AS zmin,
              max(sb) AS sbx, max(qb) AS qbx
            FROM staged GROUP BY n, x6, blk),
          calc AS (
            SELECT n, x6, zmax, zmin,
              (CAST(qbx AS DOUBLE) - n * (CAST(sbx AS DOUBLE) / n)
                * (CAST(sbx AS DOUBLE) / n)) / n AS varp
            FROM per),
          pern AS (
            SELECT n, x6, count(*) AS n_blocks,
              CAST(sum(CAST(floor((zmax - zmin) / sqrt(varp) * 1e6 + 0.5)
                AS BIGINT)) AS BIGINT) AS rs6
            FROM calc WHERE varp > 0 GROUP BY n, x6),
          pts AS (
            SELECT n, n_blocks, x6,
              CAST(rs6 AS DOUBLE) / n_blocks / 1e6 AS mrs,
              CASE WHEN CAST(rs6 AS DOUBLE) / n_blocks / 1e6 >= 1 THEN
                  CAST(floor(ln(CAST(rs6 AS DOUBLE) / n_blocks / 1e6)
                    * 1e6 + 0.5) AS BIGINT)
                ELSE -CAST(floor(-ln(CAST(rs6 AS DOUBLE) / n_blocks / 1e6)
                    * 1e6 + 0.5) AS BIGINT) END AS y6
            FROM pern),
          st AS (
            SELECT count(*) AS kk, CAST(sum(x6) AS BIGINT) AS sx,
              CAST(sum(y6) AS BIGINT) AS sy,
              CAST(sum(x6 * y6) AS BIGINT) AS sxy,
              CAST(sum(x6 * x6) AS BIGINT) AS sxx
            FROM pts),
          hh AS (
            SELECT CASE WHEN kk >= 2 THEN
              CASE WHEN CAST(kk * sxy - sx * sy AS DOUBLE)
                  / CAST(kk * sxx - sx * sx AS DOUBLE) >= 0 THEN
                  floor(CAST(kk * sxy - sx * sy AS DOUBLE)
                    / CAST(kk * sxx - sx * sx AS DOUBLE) * 1e4 + 0.5)
                ELSE -floor(-(CAST(kk * sxy - sx * sy AS DOUBLE)
                    / CAST(kk * sxx - sx * sx AS DOUBLE)) * 1e4 + 0.5)
                END / 1e4 + 0.0 END AS hurst
            FROM st)
         SELECT n AS block_size, n_blocks,
           floor(mrs * 1e6 + 0.5) / 1e6 AS mean_rs, hurst
         FROM pts, hh ORDER BY block_size"""
    },
    // per-lag Pearson r over the zero-filled day grid from exact
    // integer moments; grid-sized lag self-join
    "q365_ccf" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d, event_type
            FROM events),
          cnts AS (
            SELECT d,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS b
            FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.a, 0) AS a,
              coalesce(c.b, 0) AS b
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          lags(lg) AS (VALUES (-3), (-2), (-1), (0), (1), (2), (3)),
          joined AS (
            SELECT l.lg, s1.a, s2.b
            FROM series s1 CROSS JOIN lags l
            JOIN series s2 ON s2.t = s1.t + l.lg),
          mom AS (
            SELECT lg, count(*) AS n_overlap,
              CAST(sum(a) AS BIGINT) AS sa2,
              CAST(sum(b) AS BIGINT) AS sb2,
              CAST(sum(a * b) AS BIGINT) AS sab,
              CAST(sum(a * a) AS BIGINT) AS saa,
              CAST(sum(b * b) AS BIGINT) AS sbb
            FROM joined GROUP BY lg)
         SELECT lg AS lag, n_overlap,
           CASE WHEN CAST(n_overlap * saa - sa2 * sa2 AS DOUBLE) > 0
               AND CAST(n_overlap * sbb - sb2 * sb2 AS DOUBLE) > 0 THEN
             CASE WHEN CAST(n_overlap * sab - sa2 * sb2 AS DOUBLE)
                 / (sqrt(CAST(n_overlap * saa - sa2 * sa2 AS DOUBLE))
                   * sqrt(CAST(n_overlap * sbb - sb2 * sb2 AS DOUBLE)))
                 >= 0 THEN
               floor(CAST(n_overlap * sab - sa2 * sb2 AS DOUBLE)
                 / (sqrt(CAST(n_overlap * saa - sa2 * sa2 AS DOUBLE))
                   * sqrt(CAST(n_overlap * sbb - sb2 * sb2 AS DOUBLE)))
                 * 1e6 + 0.5)
             ELSE -floor(-(CAST(n_overlap * sab - sa2 * sb2 AS DOUBLE)
                 / (sqrt(CAST(n_overlap * saa - sa2 * sa2 AS DOUBLE))
                   * sqrt(CAST(n_overlap * sbb - sb2 * sb2 AS DOUBLE))))
                 * 1e6 + 0.5) END / 1e6 + 0.0 END AS r
         FROM mom ORDER BY lag""",
    // centered-MA detrend over full windows, per-phase 1e-6-grid
    // integer indices, grand-mean re-centering as a ratio of longs
    "q366_seasonal_decompose" ->
      """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          win AS (
            SELECT t, y,
              sum(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
                3 FOLLOWING) AS ws,
              count(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
                3 FOLLOWING) AS wc
            FROM series),
          detr AS (
            SELECT t % 7 AS phase,
              CAST(y AS DOUBLE) - CAST(ws AS DOUBLE) / 7 AS dt
            FROM win WHERE wc = 7),
          per AS (
            SELECT phase, count(*) AS n_terms,
              CAST(sum(CASE WHEN dt >= 0
                THEN CAST(floor(dt * 1e6 + 0.5) AS BIGINT)
                ELSE -CAST(floor(-dt * 1e6 + 0.5) AS BIGINT) END)
                AS BIGINT) AS s6
            FROM detr GROUP BY phase),
          raw AS (
            SELECT phase, n_terms,
              CASE WHEN CAST(s6 AS DOUBLE) / n_terms >= 0 THEN
                  CAST(floor(CAST(s6 AS DOUBLE) / n_terms + 0.5)
                    AS BIGINT)
                ELSE -CAST(floor(-(CAST(s6 AS DOUBLE) / n_terms) + 0.5)
                    AS BIGINT) END AS raw6
            FROM per),
          g AS (SELECT CAST(sum(raw6) AS BIGINT) AS g6v, count(*) AS np
            FROM raw)
         SELECT phase, n_terms,
           CASE WHEN CAST(raw6 AS DOUBLE) / 1e6 >= 0 THEN
               floor(CAST(raw6 AS DOUBLE) / 1e6 * 1e6 + 0.5)
             ELSE -floor(-(CAST(raw6 AS DOUBLE) / 1e6) * 1e6 + 0.5) END
             / 1e6 + 0.0 AS raw_index,
           CASE WHEN (CAST(raw6 AS DOUBLE) - CAST(g6v AS DOUBLE) / np)
               / 1e6 >= 0 THEN
               floor((CAST(raw6 AS DOUBLE) - CAST(g6v AS DOUBLE) / np)
                 / 1e6 * 1e6 + 0.5)
             ELSE -floor(-((CAST(raw6 AS DOUBLE) - CAST(g6v AS DOUBLE)
                 / np) / 1e6) * 1e6 + 0.5) END / 1e6 + 0.0 AS seasonal
         FROM raw, g ORDER BY phase""",
    // q346's power integers re-folded into −Σ q·ln q; the ln(k)
    // normalizer is the operator's 1e-12-grid literal
    "q367_spectral_entropy" -> {
      val trigRows = graft.operators.Forecast
        .trigTable(Seq(2, 3, 5, 7, 10, 15), 31)
        .map { case (p, t, c, s) => s"($p, $t, $c, $s)" }
        .mkString(",\n            ")
      val lnK = graft.operators.Forecast.lnLit(6d)
      s"""WITH trig(period, t, c, s) AS (VALUES
            $trigRows),
          ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (
            SELECT CAST(d - (SELECT min(d) FROM ev) AS INT) AS t,
              count(*) AS y
            FROM ev GROUP BY d),
          joined AS (
            SELECT tr.period, c2.t, c2.y, tr.c, tr.s
            FROM cnts c2 JOIN trig tr ON tr.t = c2.t),
          sums AS (
            SELECT period,
              CAST(sum(CASE WHEN y * c >= 0
                THEN floor(y * c * 1e6 + 0.5)
                ELSE -floor(-(y * c) * 1e6 + 0.5) END) AS BIGINT) AS c6,
              CAST(sum(CASE WHEN y * s >= 0
                THEN floor(y * s * 1e6 + 0.5)
                ELSE -floor(-(y * s) * 1e6 + 0.5) END) AS BIGINT) AS s6
            FROM joined GROUP BY period),
          pp AS (
            SELECT period,
              CAST(floor(((CAST(c6 AS DOUBLE) / 1e6)
                * (CAST(c6 AS DOUBLE) / 1e6)
                + (CAST(s6 AS DOUBLE) / 1e6) * (CAST(s6 AS DOUBLE) / 1e6))
                * 1e6 + 0.5) AS BIGINT) AS p6
            FROM sums),
          tot AS (SELECT CAST(sum(p6) AS BIGINT) AS tv,
            CAST(max(p6) AS BIGINT) AS mx FROM pp),
          folded AS (
            SELECT count(*) AS n_periods,
              CAST(sum(CASE WHEN p6 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS k_positive,
              CAST(sum(CASE WHEN p6 > 0 THEN
                CAST(floor(-(CAST(p6 AS DOUBLE) / tv)
                  * ln(CAST(p6 AS DOUBLE) / tv) * 1e9 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS h9,
              max(tv) AS totx, max(mx) AS mxx
            FROM pp CROSS JOIN tot)
         SELECT n_periods, k_positive,
           floor(CAST(h9 AS DOUBLE) / 1e9 * 1e6 + 0.5) / 1e6 AS entropy,
           CASE WHEN n_periods > 1 THEN
             floor(CAST(h9 AS DOUBLE) / 1e9 / $lnK * 1e6 + 0.5) / 1e6
             END AS entropy_norm,
           CASE WHEN totx > 0 THEN
             floor(CAST(mxx AS DOUBLE) / totx * 1e6 + 0.5) / 1e6
             END AS max_share
         FROM folded"""
    },
    // the DP unrolled over 23 anti-diagonals — pure int64 end to end
    // exact integer S, tie sum and 18·Var; only the final z divides —
    // identical double path both engines
    "q413_mann_kendall" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          mom AS (
            SELECT coalesce(CAST(sum(CASE WHEN s2.y > s1.y THEN 1
                WHEN s2.y < s1.y THEN -1 ELSE 0 END) AS BIGINT), 0)
              AS s_stat
            FROM series s1 JOIN series s2 ON s1.t < s2.t),
          nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM series),
          ties AS (
            SELECT CAST(count(*) AS BIGINT) AS n_value_groups,
              CAST(sum(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tsum
            FROM (SELECT CAST(count(*) AS BIGINT) AS tg FROM series
              GROUP BY y)),
          alg AS (
            SELECT n_days, s_stat, n_value_groups,
              n_days * (n_days - 1) * (2 * n_days + 5) - tsum AS var18
            FROM nd, mom, ties)
         SELECT n_days, s_stat, n_value_groups, var18,
           CASE WHEN var18 > 0 THEN
             CASE WHEN s_stat > 0 THEN
               floor((CAST(s_stat AS DOUBLE) - 1)
                 / sqrt(CAST(var18 AS DOUBLE) / 18) * 1e6 + 0.5) / 1e6
                 + 0.0
             WHEN s_stat < 0 THEN
               -floor(-((CAST(s_stat AS DOUBLE) + 1)
                 / sqrt(CAST(var18 AS DOUBLE) / 18)) * 1e6 + 0.5) / 1e6
                 + 0.0
             ELSE 0.0 END
           END AS z
         FROM alg""",
    // restricted/unrestricted OLS via the ols2 determinant discipline:
    // exact integer moments, layered-CTE double algebra textually
    // mirroring the Column expressions
    "q414_granger" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d, event_type
            FROM events),
          cnts AS (
            SELECT d,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS b
            FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.a, 0) AS a,
              coalesce(c.b, 0) AS b
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          obs AS (
            SELECT yv, x1, x2 FROM (
              SELECT b AS yv, lag(b, 1) OVER (ORDER BY t) AS x1,
                lag(a, 1) OVER (ORDER BY t) AS x2
              FROM series)
            WHERE x1 IS NOT NULL),
          mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n_obs,
              CAST(sum(x1) AS BIGINT) AS sx1,
              CAST(sum(x2) AS BIGINT) AS sx2,
              CAST(sum(yv) AS BIGINT) AS sy,
              CAST(sum(CAST(x1 AS HUGEINT) * x1) AS HUGEINT) AS sx11,
              CAST(sum(CAST(x1 AS HUGEINT) * x2) AS HUGEINT) AS sx12,
              CAST(sum(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS sx22,
              CAST(sum(CAST(x1 AS HUGEINT) * yv) AS HUGEINT) AS sx1y,
              CAST(sum(CAST(x2 AS HUGEINT) * yv) AS HUGEINT) AS sx2y,
              CAST(sum(CAST(yv AS HUGEINT) * yv) AS HUGEINT) AS syy
            FROM obs),
          dbl AS (
            SELECT n_obs, CAST(n_obs AS DOUBLE) AS nd,
              CAST(sx1 AS DOUBLE) AS x1, CAST(sx2 AS DOUBLE) AS x2,
              CAST(sy AS DOUBLE) AS y, CAST(sx11 AS DOUBLE) AS x11,
              CAST(sx12 AS DOUBLE) AS x12, CAST(sx22 AS DOUBLE) AS x22,
              CAST(sx1y AS DOUBLE) AS x1y, CAST(sx2y AS DOUBLE) AS x2y,
              CAST(syy AS DOUBLE) AS yy
            FROM mom),
          alg1 AS (
            SELECT *,
              nd * (x11 * x22 - x12 * x12) - x1 * (x1 * x22 - x12 * x2)
                + x2 * (x1 * x12 - x11 * x2) AS dd,
              y * (x11 * x22 - x12 * x12) - x1 * (x1y * x22 - x12 * x2y)
                + x2 * (x1y * x12 - x11 * x2y) AS d0,
              nd * (x1y * x22 - x12 * x2y) - y * (x1 * x22 - x12 * x2)
                + x2 * (x1 * x2y - x1y * x2) AS d1,
              nd * (x11 * x2y - x1y * x12) - x1 * (x1 * x2y - x1y * x2)
                + y * (x1 * x12 - x11 * x2) AS d2,
              nd * x11 - x1 * x1 AS mxx,
              (nd * x1y - x1 * y) / (nd * x11 - x1 * x1) AS c1
            FROM dbl),
          alg2 AS (
            SELECT *,
              yy - (d0 / dd * y + d1 / dd * x1y + d2 / dd * x2y)
                AS sse_u_raw,
              yy - ((y - c1 * x1) / nd * y + c1 * x1y) AS sse_r_raw
            FROM alg1)
         SELECT n_obs,
           CASE WHEN n_obs > 3 AND mxx > 0 AND dd <> 0 THEN
             CASE WHEN sse_r_raw >= 0 THEN
               floor(sse_r_raw * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-sse_r_raw * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS sse_r,
           CASE WHEN n_obs > 3 AND mxx > 0 AND dd <> 0 THEN
             CASE WHEN sse_u_raw >= 0 THEN
               floor(sse_u_raw * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-sse_u_raw * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS sse_u,
           CASE WHEN n_obs > 3 AND mxx > 0 AND dd <> 0
               AND sse_u_raw > 0 THEN
             floor(greatest((sse_r_raw - sse_u_raw) * (nd - 3)
               / sse_u_raw, 0) * 1e4 + 0.5) / 1e4 + 0.0
           END AS f_stat
         FROM alg2""",
    // four exact integer power sums; central-moment algebra mirrored
    // operation for operation
    "q418_jarque_bera" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(y) AS BIGINT) AS s1,
              CAST(sum(CAST(y AS HUGEINT) * y) AS DOUBLE) AS s2,
              CAST(sum(CAST(y AS HUGEINT) * y * y) AS DOUBLE) AS s3,
              CAST(sum(CAST(y AS HUGEINT) * y * y * y) AS DOUBLE) AS s4
            FROM series),
          alg AS (
            SELECT n_days, CAST(n_days AS DOUBLE) AS nd,
              CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean,
              s2, s3, s4
            FROM mom),
          alg2 AS (
            SELECT *,
              s2 / nd - mean * mean AS m2,
              s3 / nd - 3 * mean * (s2 / nd)
                + 2 * (mean * mean * mean) AS m3,
              s4 / nd - 4 * mean * (s3 / nd)
                + 6 * (mean * mean) * (s2 / nd)
                - 3 * (mean * mean * mean * mean) AS m4
            FROM alg),
          alg3 AS (
            SELECT *, m3 / (sqrt(m2) * m2) AS skew,
              m4 / (m2 * m2) AS kurt
            FROM alg2)
         SELECT n_days,
           CASE WHEN m2 > 0 THEN
             CASE WHEN skew >= 0 THEN
               floor(skew * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-skew * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS skewness,
           CASE WHEN m2 > 0 THEN
             CASE WHEN kurt >= 0 THEN
               floor(kurt * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-kurt * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS kurtosis,
           CASE WHEN m2 > 0 THEN
             floor(nd / 6 * (skew * skew
               + (kurt - 3) * (kurt - 3) / 4) * 1e4 + 0.5) / 1e4 + 0.0
           END AS jb_stat
         FROM alg3""",
    // residuals quantized to the 1e-6 grid BEFORE the two integer
    // sums — DW is a ratio of exact sums, order-free
    "q419_durbin_watson" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          mom AS (
            SELECT CAST(count(*) AS BIGINT) AS kk,
              CAST(count(*) AS DOUBLE) AS kd,
              CAST(sum(t) AS DOUBLE) AS std,
              CAST(sum(t * t) AS DOUBLE) AS sttd,
              CAST(sum(t * y) AS DOUBLE) AS styd,
              CAST(sum(y) AS DOUBLE) AS syd
            FROM series),
          alg AS (
            SELECT *, kd * sttd - std * std AS den,
              (kd * styd - std * syd) / (kd * sttd - std * std) AS c1
            FROM mom),
          alg2 AS (SELECT *, (syd - c1 * std) / kd AS c0 FROM alg),
          resid AS (
            SELECT t, kk, den,
              CASE WHEN e >= 0 THEN CAST(floor(e * 1e6 + 0.5) AS BIGINT)
              ELSE CAST(-floor(-e * 1e6 + 0.5) AS BIGINT) END AS e6
            FROM (
              SELECT s.t, a.kk, a.den,
                CAST(s.y AS DOUBLE) - (a.c0 + a.c1 * CAST(s.t AS DOUBLE))
                  AS e
              FROM series s, alg2 a)),
          lagged AS (
            SELECT kk, den, e6, lag(e6, 1) OVER (ORDER BY t) AS pe6
            FROM resid),
          folded AS (
            SELECT max(kk) AS n_days, max(den) AS den,
              sum(CAST(e6 AS HUGEINT) * e6) AS see,
              sum(CASE WHEN pe6 IS NOT NULL THEN
                CAST(e6 - pe6 AS HUGEINT) * (e6 - pe6)
                ELSE CAST(0 AS HUGEINT) END) AS sdd
            FROM lagged)
         SELECT n_days,
           CASE WHEN den > 0 AND see > 0 AND n_days > 1 THEN
             CASE WHEN CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE) >= 0
               THEN floor(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS dw
         FROM folded""",
    // per-group integer moments; variance numerators pooled in
    // 100-cents² integer units, ln terms and 1/(n−1) as grid longs —
    // every cross-group fold is of exact integers
    "q420_bartlett" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          per AS (
            SELECT g, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
              sum(CAST(c AS HUGEINT) * c) AS q
            FROM base GROUP BY g HAVING count(*) >= 2),
          numed AS (
            SELECT n,
              CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n AS num
            FROM per),
          terms AS (
            SELECT n,
              CAST(floor(num / 100 + 0.5) AS BIGINT) AS num2,
              CASE WHEN num > 0 THEN
                CAST(floor(ln(num / CAST(n - 1 AS DOUBLE)) * 1e6 + 0.5)
                  AS BIGINT) ELSE 0 END AS ln6,
              num <= 0 AS degen,
              CAST(floor(1e9 / CAST(n - 1 AS DOUBLE) + 0.5) AS BIGINT)
                AS inv9
            FROM numed),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
              CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(num2) AS BIGINT) AS pool2,
              CAST(sum((n - 1) * ln6) AS BIGINT) AS wln6,
              CAST(sum(inv9) AS BIGINT) AS sinv9,
              max(CASE WHEN degen THEN 1 ELSE 0 END) AS bad
            FROM terms),
          calc AS (
            SELECT k_groups, n, pool2, bad,
              (CAST(n - k_groups AS DOUBLE)
                * floor(ln(CAST(pool2 AS DOUBLE) * 100
                    / CAST(n - k_groups AS DOUBLE)) * 1e6 + 0.5)
                - CAST(wln6 AS DOUBLE)) / 1e6 AS t_num,
              1 + (CAST(sinv9 AS DOUBLE) / 1e9
                  - 1 / CAST(n - k_groups AS DOUBLE))
                / (3 * CAST(k_groups - 1 AS DOUBLE)) AS cf
            FROM roll WHERE pool2 > 0)
         SELECT k_groups, n,
           CASE WHEN k_groups > 1 AND n > k_groups AND bad = 0
               AND pool2 > 0 THEN
             CASE WHEN t_num / cf >= 0 THEN
               floor(t_num / cf * 1e4 + 0.5) / 1e4 + 0.0
             ELSE -floor(-(t_num / cf) * 1e4 + 0.5) / 1e4 + 0.0 END
           END AS t_stat,
           CASE WHEN k_groups > 1 AND n > k_groups AND bad = 0
               AND pool2 > 0 THEN
             floor(cf * 1e6 + 0.5) / 1e6 + 0.0
           END AS c_factor
         FROM calc""",
    // T/2 maximally-separated day pairs; everything except z exact
    // int64, z with the Mann-Kendall ±1 continuity convention
    "q421_cox_stuart" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM series),
          mom AS (
            SELECT max(tot.n) AS n_days,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(coalesce(sum(CASE WHEN b.y > a.y THEN 1 ELSE 0 END),
                0) AS BIGINT) AS n_pos,
              CAST(coalesce(sum(CASE WHEN b.y < a.y THEN 1 ELSE 0 END),
                0) AS BIGINT) AS n_neg
            FROM series a, tot, series b
            WHERE a.t < tot.n // 2 AND b.t = a.t + (tot.n + 1) // 2)
         SELECT n_days, n_pairs, n_pos, n_neg,
           n_pairs - n_pos - n_neg AS n_ties,
           CASE WHEN n_pos + n_neg > 0 THEN
             CASE WHEN n_pos - n_neg > 0 THEN
               floor((CAST(n_pos - n_neg AS DOUBLE) - 1)
                 / sqrt(CAST(n_pos + n_neg AS DOUBLE)) * 1e6 + 0.5)
                 / 1e6 + 0.0
             WHEN n_pos - n_neg < 0 THEN
               -floor(-((CAST(n_pos - n_neg AS DOUBLE) + 1)
                 / sqrt(CAST(n_pos + n_neg AS DOUBLE))) * 1e6 + 0.5)
                 / 1e6 + 0.0
             ELSE 0.0 END
           END AS z
         FROM mom""",
    // centered-integer moments in HUGEINT; Durbin-Levinson closed
    // forms staged so each denominator is computed once, like the
    // Column tree
    "q422_pacf" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
              CAST(sum(y) AS BIGINT) AS s FROM series),
          z AS (SELECT t, y * tot.n - tot.s AS z, tot.n FROM series, tot),
          zl AS (
            SELECT n, z,
              lead(z, 1) OVER (ORDER BY t) AS z1,
              lead(z, 2) OVER (ORDER BY t) AS z2,
              lead(z, 3) OVER (ORDER BY t) AS z3
            FROM z),
          mom AS (
            SELECT max(n) AS n_days,
              sum(CAST(z AS HUGEINT) * z) AS zz,
              sum(CASE WHEN z1 IS NOT NULL THEN CAST(z AS HUGEINT) * z1
                ELSE CAST(0 AS HUGEINT) END) AS m1,
              sum(CASE WHEN z2 IS NOT NULL THEN CAST(z AS HUGEINT) * z2
                ELSE CAST(0 AS HUGEINT) END) AS m2,
              sum(CASE WHEN z3 IS NOT NULL THEN CAST(z AS HUGEINT) * z3
                ELSE CAST(0 AS HUGEINT) END) AS m3
            FROM zl),
          rr AS (
            SELECT n_days, zz,
              CAST(m1 AS DOUBLE) / CAST(zz AS DOUBLE) AS r1,
              CAST(m2 AS DOUBLE) / CAST(zz AS DOUBLE) AS r2,
              CAST(m3 AS DOUBLE) / CAST(zz AS DOUBLE) AS r3
            FROM mom),
          dl1 AS (SELECT *, 1 - r1 * r1 AS p22den FROM rr),
          dl2 AS (SELECT *, (r2 - r1 * r1) / p22den AS p22 FROM dl1),
          dl3 AS (SELECT *, r1 * (1 - p22) AS p21 FROM dl2),
          dl4 AS (SELECT *,
              1 - p21 * r1 - p22 * r2 AS p33den FROM dl3),
          dl5 AS (SELECT *,
              (r3 - p21 * r2 - p22 * r1) / p33den AS p33 FROM dl4)
         SELECT n_days,
           CASE WHEN zz > 0 AND n_days > 3 THEN
             CASE WHEN r1 >= 0 THEN floor(r1 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-r1 * 1e6 + 0.5) / 1e6 + 0.0 END END AS r1,
           CASE WHEN zz > 0 AND n_days > 3 THEN
             CASE WHEN r2 >= 0 THEN floor(r2 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-r2 * 1e6 + 0.5) / 1e6 + 0.0 END END AS r2,
           CASE WHEN zz > 0 AND n_days > 3 THEN
             CASE WHEN r3 >= 0 THEN floor(r3 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-r3 * 1e6 + 0.5) / 1e6 + 0.0 END END AS r3,
           CASE WHEN zz > 0 AND n_days > 3 THEN
             CASE WHEN r1 >= 0 THEN floor(r1 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-r1 * 1e6 + 0.5) / 1e6 + 0.0 END END AS pacf1,
           CASE WHEN zz > 0 AND n_days > 3 AND p22den <> 0 THEN
             CASE WHEN p22 >= 0 THEN floor(p22 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-p22 * 1e6 + 0.5) / 1e6 + 0.0 END END AS pacf2,
           CASE WHEN zz > 0 AND n_days > 3 AND p22den <> 0
               AND p33den <> 0 THEN
             CASE WHEN p33 >= 0 THEN floor(p33 * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-p33 * 1e6 + 0.5) / 1e6 + 0.0 END END AS pacf3
         FROM dl5""",
    // two unrolled MM iterations from p=1; per-opponent terms on the
    // 1e-9 grid, strengths on the 1e-6 grid — exact integer folds
    "q424_bradley_terry" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d, event_type
            FROM events),
          daily AS (
            SELECT d, event_type, count(*) AS n
            FROM ev GROUP BY d, event_type),
          duels AS (
            SELECT a.event_type AS w, b.event_type AS l
            FROM daily a JOIN daily b ON a.d = b.d AND a.n > b.n),
          winc AS (
            SELECT w, l, CAST(count(*) AS BIGINT) AS c
            FROM duels GROUP BY w, l),
          pairs AS (
            SELECT i, j, CAST(sum(c) AS BIGINT) AS wij FROM (
              SELECT w AS i, l AS j, c FROM winc
              UNION ALL SELECT l AS i, w AS j, 0 AS c FROM winc)
            GROUP BY i, j),
          nij AS (
            SELECT p.i, p.j, p.wij + q.wij AS nij
            FROM pairs p JOIN pairs q ON p.i = q.j AND p.j = q.i),
          itw AS (SELECT i, CAST(sum(wij) AS BIGINT) AS wins
            FROM pairs GROUP BY i),
          itc AS (SELECT i, CAST(sum(nij) AS BIGINT) AS comparisons
            FROM nij GROUP BY i),
          items AS (
            SELECT itw.i, wins, comparisons
            FROM itw JOIN itc ON itw.i = itc.i),
          p0 AS (SELECT i, CAST(1000000 AS BIGINT) AS p6 FROM items),
          den1 AS (
            SELECT n.i, CAST(sum(CAST(floor(CAST(n.nij AS DOUBLE)
                / (CAST(pi.p6 + pj.p6 AS DOUBLE) / 1e6) * 1e9 + 0.5)
                AS BIGINT)) AS BIGINT) AS den9
            FROM nij n JOIN p0 pi ON n.i = pi.i
              JOIN p0 pj ON n.j = pj.i
            GROUP BY n.i),
          p1 AS (
            SELECT items.i,
              CASE WHEN den9 > 0 THEN
                CAST(floor(CAST(wins AS DOUBLE)
                  / (CAST(den9 AS DOUBLE) / 1e9) * 1e6 + 0.5) AS BIGINT)
              ELSE 0 END AS p6
            FROM items JOIN den1 ON items.i = den1.i),
          den2 AS (
            SELECT n.i, CAST(sum(CAST(floor(CAST(n.nij AS DOUBLE)
                / (CAST(pi.p6 + pj.p6 AS DOUBLE) / 1e6) * 1e9 + 0.5)
                AS BIGINT)) AS BIGINT) AS den9
            FROM nij n JOIN p1 pi ON n.i = pi.i
              JOIN p1 pj ON n.j = pj.i
            GROUP BY n.i),
          p2 AS (
            SELECT items.i,
              CASE WHEN den9 > 0 THEN
                CAST(floor(CAST(wins AS DOUBLE)
                  / (CAST(den9 AS DOUBLE) / 1e9) * 1e6 + 0.5) AS BIGINT)
              ELSE 0 END AS p6
            FROM items JOIN den2 ON items.i = den2.i),
          norm AS (SELECT CAST(sum(p6) AS BIGINT) AS sp6,
              CAST(count(*) AS BIGINT) AS k FROM p2)
         SELECT items.i AS item, wins, comparisons,
           floor(CAST(p2.p6 AS DOUBLE) * norm.k / CAST(norm.sp6 AS DOUBLE)
             * 1e6 + 0.5) / 1e6 + 0.0 AS strength
         FROM items JOIN p2 ON items.i = p2.i, norm
         ORDER BY item""",
    // doubled tie-averaged ranks (exact int64) through a Pearson fold;
    // one division at the end
    "q416_spearman" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d, event_type
            FROM events),
          cnts AS (
            SELECT d,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS b
            FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT coalesce(c.a, 0) AS a, coalesce(c.b, 0) AS b
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          ranked AS (
            SELECT
              2 * rank() OVER (ORDER BY a)
                + count(*) OVER (PARTITION BY a) - 1 AS ra,
              2 * rank() OVER (ORDER BY b)
                + count(*) OVER (PARTITION BY b) - 1 AS rb
            FROM series),
          mom AS (
            SELECT CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(ra) AS BIGINT) AS sa,
              CAST(sum(rb) AS BIGINT) AS sb,
              CAST(sum(ra * ra) AS BIGINT) AS saa,
              CAST(sum(rb * rb) AS BIGINT) AS sbb,
              CAST(sum(ra * rb) AS BIGINT) AS sab
            FROM ranked),
          alg AS (
            SELECT n_days,
              CAST(n_days AS DOUBLE) * CAST(saa AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) AS da,
              CAST(n_days AS DOUBLE) * CAST(sbb AS DOUBLE)
                - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) AS db,
              CAST(n_days AS DOUBLE) * CAST(sab AS DOUBLE)
                - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) AS num
            FROM mom),
          alg2 AS (
            SELECT n_days, da, db, num / (sqrt(da) * sqrt(db)) AS raw
            FROM alg)
         SELECT n_days,
           CASE WHEN da > 0 AND db > 0 THEN
             CASE WHEN raw >= 0 THEN floor(raw * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-raw * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS rho
         FROM alg2""",
    // 24x2 exact contingency; per-cell terms 1e-9-quantized before
    // the order-free integer sum (the q146 discipline)
    "q417_diurnal_chi2" ->
      """WITH cells0 AS (
            SELECT (epoch_ns(ts) % 86400000000000) // 3600000000000 AS h,
              CASE WHEN ((epoch_ns(ts) // 86400000000000) + 4) % 7
                IN (0, 6) THEN 1 ELSE 0 END AS we,
              CAST(count(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2),
          grid AS (
            SELECT hh.h, ww.we
            FROM (SELECT unnest(generate_series(0, 23)) AS h) hh
            CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS we) ww),
          cells AS (
            SELECT g.h, g.we, coalesce(c.o, 0) AS o
            FROM grid g LEFT JOIN cells0 c
              ON g.h = c.h AND g.we = c.we),
          fullc AS (
            SELECT h, we, o,
              sum(o) OVER (PARTITION BY h) AS rt,
              sum(o) OVER (PARTITION BY we) AS ct,
              sum(o) OVER () AS n
            FROM cells),
          folded AS (
            SELECT CAST(sum(o) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN we = 1 THEN o ELSE 0 END) AS BIGINT)
                AS n_weekend_events,
              CAST(count(*) AS BIGINT) AS n_cells_used,
              CAST(sum(CAST(floor(
                (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                * (CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
                / (CAST(n AS DOUBLE) * CAST(rt AS DOUBLE)
                  * CAST(ct AS DOUBLE)) * 1e9 + 0.5) AS BIGINT))
                AS BIGINT) AS t9
            FROM fullc WHERE rt > 0 AND ct > 0)
         SELECT n_events, n_weekend_events, n_cells_used,
           CAST(t9 AS DOUBLE) / 1e9 AS chi2,
           CASE WHEN n_events > 0 THEN
             floor(sqrt(CAST(t9 AS DOUBLE) / 1e9
               / CAST(n_events AS DOUBLE)) * 1e6 + 0.5) / 1e6 + 0.0
           END AS cramers_v
         FROM folded""",
    // pooled-vs-halves simple-regression SSEs from one conditional
    // integer fold; the closed-form double algebra mirrors the Columns
    "q415_chow" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          nm AS (SELECT CAST(count(*) AS BIGINT) AS n,
            CAST(count(*) // 2 AS BIGINT) AS m FROM series),
          mom AS (
            SELECT
              CAST(sum(1) AS BIGINT) AS kp,
              CAST(sum(t) AS BIGINT) AS stp,
              CAST(sum(t * t) AS BIGINT) AS sttp,
              CAST(sum(t * y) AS BIGINT) AS styp,
              CAST(sum(y) AS BIGINT) AS syp,
              CAST(sum(y * y) AS BIGINT) AS syyp,
              CAST(sum(CASE WHEN t < m THEN 1 ELSE 0 END) AS BIGINT)
                AS ka,
              CAST(sum(CASE WHEN t < m THEN t ELSE 0 END) AS BIGINT)
                AS sta,
              CAST(sum(CASE WHEN t < m THEN t * t ELSE 0 END) AS BIGINT)
                AS stta,
              CAST(sum(CASE WHEN t < m THEN t * y ELSE 0 END) AS BIGINT)
                AS stya,
              CAST(sum(CASE WHEN t < m THEN y ELSE 0 END) AS BIGINT)
                AS sya,
              CAST(sum(CASE WHEN t < m THEN y * y ELSE 0 END) AS BIGINT)
                AS syya,
              CAST(sum(CASE WHEN t >= m THEN 1 ELSE 0 END) AS BIGINT)
                AS kb,
              CAST(sum(CASE WHEN t >= m THEN t ELSE 0 END) AS BIGINT)
                AS stb,
              CAST(sum(CASE WHEN t >= m THEN t * t ELSE 0 END)
                AS BIGINT) AS sttb,
              CAST(sum(CASE WHEN t >= m THEN t * y ELSE 0 END)
                AS BIGINT) AS styb,
              CAST(sum(CASE WHEN t >= m THEN y ELSE 0 END) AS BIGINT)
                AS syb,
              CAST(sum(CASE WHEN t >= m THEN y * y ELSE 0 END)
                AS BIGINT) AS syyb,
              max(m) AS break_t
            FROM series, nm),
          alg1 AS (
            SELECT *,
              CAST(kp AS DOUBLE) * CAST(sttp AS DOUBLE)
                - CAST(stp AS DOUBLE) * CAST(stp AS DOUBLE) AS denp,
              CAST(ka AS DOUBLE) * CAST(stta AS DOUBLE)
                - CAST(sta AS DOUBLE) * CAST(sta AS DOUBLE) AS dena,
              CAST(kb AS DOUBLE) * CAST(sttb AS DOUBLE)
                - CAST(stb AS DOUBLE) * CAST(stb AS DOUBLE) AS denb,
              (CAST(kp AS DOUBLE) * CAST(styp AS DOUBLE)
                - CAST(stp AS DOUBLE) * CAST(syp AS DOUBLE))
                / (CAST(kp AS DOUBLE) * CAST(sttp AS DOUBLE)
                  - CAST(stp AS DOUBLE) * CAST(stp AS DOUBLE)) AS c1p,
              (CAST(ka AS DOUBLE) * CAST(stya AS DOUBLE)
                - CAST(sta AS DOUBLE) * CAST(sya AS DOUBLE))
                / (CAST(ka AS DOUBLE) * CAST(stta AS DOUBLE)
                  - CAST(sta AS DOUBLE) * CAST(sta AS DOUBLE)) AS c1a,
              (CAST(kb AS DOUBLE) * CAST(styb AS DOUBLE)
                - CAST(stb AS DOUBLE) * CAST(syb AS DOUBLE))
                / (CAST(kb AS DOUBLE) * CAST(sttb AS DOUBLE)
                  - CAST(stb AS DOUBLE) * CAST(stb AS DOUBLE)) AS c1b
            FROM mom),
          alg2 AS (
            SELECT *,
              CAST(syyp AS DOUBLE) - ((CAST(syp AS DOUBLE)
                - c1p * CAST(stp AS DOUBLE)) / CAST(kp AS DOUBLE)
                * CAST(syp AS DOUBLE) + c1p * CAST(styp AS DOUBLE))
                AS ssep,
              CAST(syya AS DOUBLE) - ((CAST(sya AS DOUBLE)
                - c1a * CAST(sta AS DOUBLE)) / CAST(ka AS DOUBLE)
                * CAST(sya AS DOUBLE) + c1a * CAST(stya AS DOUBLE))
                AS ssea,
              CAST(syyb AS DOUBLE) - ((CAST(syb AS DOUBLE)
                - c1b * CAST(stb AS DOUBLE)) / CAST(kb AS DOUBLE)
                * CAST(syb AS DOUBLE) + c1b * CAST(styb AS DOUBLE))
                AS sseb
            FROM alg1)
         SELECT kp AS n_days, break_t,
           CASE WHEN denp > 0 AND dena > 0 AND denb > 0 THEN
             CASE WHEN ssep >= 0 THEN floor(ssep * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-ssep * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS sse_pooled,
           CASE WHEN denp > 0 AND dena > 0 AND denb > 0 THEN
             CASE WHEN ssea >= 0 THEN floor(ssea * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-ssea * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS sse_a,
           CASE WHEN denp > 0 AND dena > 0 AND denb > 0 THEN
             CASE WHEN sseb >= 0 THEN floor(sseb * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-sseb * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS sse_b,
           CASE WHEN denp > 0 AND dena > 0 AND denb > 0 AND kp > 4
               AND ssea + sseb > 0 THEN
             floor(greatest((ssep - ssea - sseb) / 2
               / ((ssea + sseb) / (CAST(kp AS DOUBLE) - 4)), 0)
               * 1e4 + 0.5) / 1e4 + 0.0
           END AS f_stat
         FROM alg2""",
    "q411_dtw" -> {
      val Big = 9000000000000000L
      def diagCte(k: Int): String = {
        val gjoin =
          if (k >= 2)
            s"LEFT JOIN dg${k - 2} g ON g.i = cost.i - 1 AND g.j = cost.j - 1"
          else ""
        val gsel =
          if (k >= 2) s"coalesce(g.d, $Big)" else s"CAST($Big AS BIGINT)"
        s"""dg$k AS MATERIALIZED (
            SELECT cost.i, cost.j,
              cost.c + least(coalesce(l.d, $Big), coalesce(u.d, $Big),
                $gsel) AS d
            FROM cost
            LEFT JOIN dg${k - 1} l
              ON l.i = cost.i - 1 AND l.j = cost.j
            LEFT JOIN dg${k - 1} u
              ON u.i = cost.i AND u.j = cost.j - 1
            $gjoin
            WHERE cost.i + cost.j = $k)"""
      }
      val diags = (1 to 22).map(diagCte).mkString(",\n          ")
      s"""WITH ev AS (
            SELECT (epoch_ns(ts) % 86400000000000) // 7200000000000
              AS b, event_type
            FROM events),
          grid AS (SELECT unnest(generate_series(0, 11)) AS b),
          pa AS (
            SELECT g.b, coalesce(x.ya, 0) AS ya FROM grid g
            LEFT JOIN (SELECT b, count(*) AS ya FROM ev
              WHERE event_type = 'view' GROUP BY b) x ON g.b = x.b),
          pb AS (
            SELECT g.b, coalesce(x.yb, 0) AS yb FROM grid g
            LEFT JOIN (SELECT b, count(*) AS yb FROM ev
              WHERE event_type = 'purchase' GROUP BY b) x
            ON g.b = x.b),
          cost AS MATERIALIZED (
            SELECT a.b AS i, b2.b AS j,
              (a.ya - b2.yb) * (a.ya - b2.yb) AS c
            FROM pa a CROSS JOIN pb b2),
          dg0 AS MATERIALIZED (SELECT i, j, c AS d FROM cost
            WHERE i = 0 AND j = 0),
          $diags
         SELECT 12 AS n_bins, t.d AS dtw_dist_sq,
           dd.s AS diag_dist_sq,
           CASE WHEN dd.s > 0 THEN
             floor((1 - CAST(t.d AS DOUBLE) / dd.s) * 1e6 + 0.5) / 1e6
             END AS warp_gain
         FROM (SELECT d FROM dg22 WHERE i = 11 AND j = 11) t,
           (SELECT CAST(sum(c) AS BIGINT) AS s FROM cost WHERE i = j)
             dd"""
    },
    // integer agreement moments over complete rater panels; κ is
    // double algebra of exact integers
    "q408_fleiss_kappa" ->
      """WITH cells AS (
            SELECT user_id AS i, event_type AS r,
              max(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS x
            FROM events GROUP BY 1, 2),
          m_ AS (SELECT count(DISTINCT r) AS m FROM cells),
          per AS (SELECT i, count(*) AS mr, CAST(sum(x) AS BIGINT)
            AS ni FROM cells GROUP BY i),
          exc AS (SELECT CAST(count(*) AS BIGINT) AS ex
            FROM per, m_ WHERE mr <> m),
          f AS (
            SELECT m, count(*) AS n_items,
              CAST(sum(ni) AS BIGINT) AS tp,
              CAST(sum(ni * (ni - 1) + (m - ni) * (m - ni - 1))
                AS BIGINT) AS agree
            FROM per, m_ WHERE mr = m GROUP BY m),
          calc AS (
            SELECT m, n_items, ex,
              CAST(agree AS DOUBLE) / (CAST(n_items AS DOUBLE)
                * (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1)))
                AS pbar,
              CAST(tp AS DOUBLE) / (CAST(n_items AS DOUBLE)
                * CAST(m AS DOUBLE)) AS p1
            FROM f, exc)
         SELECT n_items, m AS m_raters, ex AS n_excluded,
           CASE WHEN n_items > 0 THEN
             floor(pbar * 1e6 + 0.5) / 1e6 + 0.0 END AS p_bar,
           CASE WHEN n_items > 0 THEN
             floor((p1 * p1 + (1 - p1) * (1 - p1)) * 1e6 + 0.5) / 1e6
               + 0.0 END AS p_e,
           CASE WHEN n_items > 0
               AND p1 * p1 + (1 - p1) * (1 - p1) < 1 THEN
             CASE WHEN (pbar - (p1 * p1 + (1 - p1) * (1 - p1)))
                 / (1 - (p1 * p1 + (1 - p1) * (1 - p1))) >= 0 THEN
               floor((pbar - (p1 * p1 + (1 - p1) * (1 - p1)))
                 / (1 - (p1 * p1 + (1 - p1) * (1 - p1))) * 1e6 + 0.5)
             ELSE -floor(-((pbar - (p1 * p1 + (1 - p1) * (1 - p1)))
                 / (1 - (p1 * p1 + (1 - p1) * (1 - p1)))) * 1e6 + 0.5)
             END / 1e6 + 0.0 END AS kappa
         FROM calc""",
    // block maxima are exact integers; the four libm constants are
    // the operator's own 1e-12-grid literals (gumbelConstants)
    "q409_gumbel" -> {
      val (c6pi, gamma, f4, f52) =
        graft.operators.Forecast.gumbelConstants
      s"""WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT (g.d - g.d0) // 7 AS b, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          maxima AS (SELECT b, max(y) AS mx FROM series GROUP BY b),
          mom AS (SELECT count(*) AS n_blocks,
            CAST(sum(mx) AS BIGINT) AS s,
            sum(CAST(mx AS HUGEINT) * mx) AS q FROM maxima),
          calc AS (
            SELECT n_blocks, CAST(s AS DOUBLE) / n_blocks AS meanv,
              (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_blocks)
                / (n_blocks - 1) AS var
            FROM mom),
          calc2 AS (
            SELECT *, sqrt(var) * $c6pi AS beta,
              meanv - $gamma * (sqrt(var) * $c6pi) AS mu
            FROM calc)
         SELECT n_blocks,
           floor(meanv * 1e4 + 0.5) / 1e4 + 0.0 AS mean_max,
           CASE WHEN var > 0 THEN floor(sqrt(var) * 1e4 + 0.5) / 1e4
             + 0.0 END AS sd_max,
           CASE WHEN var > 0 THEN
             CASE WHEN mu >= 0 THEN floor(mu * 1e4 + 0.5)
               ELSE -floor(-mu * 1e4 + 0.5) END / 1e4 + 0.0
             END AS mu,
           CASE WHEN var > 0 THEN floor(beta * 1e4 + 0.5) / 1e4 + 0.0
             END AS beta,
           CASE WHEN var > 0 THEN
             CASE WHEN mu + beta * $f4 >= 0 THEN
                 floor((mu + beta * $f4) * 1e4 + 0.5)
               ELSE -floor(-(mu + beta * $f4) * 1e4 + 0.5) END
               / 1e4 + 0.0 END AS ret4,
           CASE WHEN var > 0 THEN
             CASE WHEN mu + beta * $f52 >= 0 THEN
                 floor((mu + beta * $f52) * 1e4 + 0.5)
               ELSE -floor(-(mu + beta * $f52) * 1e4 + 0.5) END
               / 1e4 + 0.0 END AS ret52
         FROM calc2"""
    },
    // doubled tie-averaged ranks over the distinct-|d| grid; exact
    // integers to the final z
    "q406_wilcoxon" ->
      """WITH per AS (
            SELECT user_id AS u,
              CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END)
                AS BIGINT) AS sa2,
              count(CASE WHEN event_type = 'purchase' THEN 1 END) AS na,
              CAST(sum(CASE WHEN event_type = 'view'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END)
                AS BIGINT) AS sb2,
              count(CASE WHEN event_type = 'view' THEN 1 END) AS nb
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('purchase', 'view')
            GROUP BY user_id
            HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END)
                > 0
              AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0),
          diffs AS (
            SELECT CASE WHEN CAST(sa2 AS DOUBLE) / na / 100
                - CAST(sb2 AS DOUBLE) / nb / 100 >= 0 THEN
                CAST(floor((CAST(sa2 AS DOUBLE) / na / 100
                  - CAST(sb2 AS DOUBLE) / nb / 100) * 1e4 + 0.5)
                  AS BIGINT)
              ELSE -CAST(floor(-(CAST(sa2 AS DOUBLE) / na / 100
                  - CAST(sb2 AS DOUBLE) / nb / 100) * 1e4 + 0.5)
                  AS BIGINT) END AS d4
            FROM per),
          grid AS (
            SELECT abs(d4) AS ad, count(*) AS t,
              CAST(sum(CASE WHEN d4 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS p
            FROM diffs WHERE d4 <> 0 GROUP BY abs(d4)),
          rk AS (
            SELECT *,
              2 * CAST(coalesce(sum(t) OVER (ORDER BY ad ROWS BETWEEN
                UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                + t + 1 AS rank2
            FROM grid),
          f AS (
            SELECT CAST(sum(t) AS BIGINT) AS n,
              CAST(sum(p * rank2) AS BIGINT) AS wp2,
              CAST(sum((t - p) * rank2) AS BIGINT) AS wm2,
              CAST(sum(t * t * t - t) AS BIGINT) AS ties
            FROM rk)
         SELECT n AS n_nonzero, CAST(wp2 AS DOUBLE) / 2 AS w_plus,
           CAST(wm2 AS DOUBLE) / 2 AS w_minus,
           CASE WHEN n > 0 AND CAST(n AS DOUBLE)
               * (CAST(n AS DOUBLE) + 1) * (2 * CAST(n AS DOUBLE) + 1)
               / 24 - CAST(ties AS DOUBLE) / 48 > 0 THEN
             CASE WHEN (CAST(wp2 AS DOUBLE) / 2 - CAST(n AS DOUBLE)
                 * (CAST(n AS DOUBLE) + 1) / 2 / 2)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                   * (2 * CAST(n AS DOUBLE) + 1) / 24
                   - CAST(ties AS DOUBLE) / 48) >= 0 THEN
               floor((CAST(wp2 AS DOUBLE) / 2 - CAST(n AS DOUBLE)
                 * (CAST(n AS DOUBLE) + 1) / 2 / 2)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                   * (2 * CAST(n AS DOUBLE) + 1) / 24
                   - CAST(ties AS DOUBLE) / 48) * 1e6 + 0.5)
             ELSE -floor(-((CAST(wp2 AS DOUBLE) / 2 - CAST(n AS DOUBLE)
                 * (CAST(n AS DOUBLE) + 1) / 2 / 2)
                 / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
                   * (2 * CAST(n AS DOUBLE) + 1) / 24
                   - CAST(ties AS DOUBLE) / 48)) * 1e6 + 0.5) END
               / 1e6 + 0.0 END AS z
         FROM f""",
    // Haldane-corrected 2×2 cells; ln/exp run once on identical
    // doubles, 1e-6 grids
    "q407_odds_ratio" ->
      """WITH per AS (
            SELECT user_id,
              max(CASE WHEN event_type = 'error' AND value > 200
                THEN 1 ELSE 0 END) AS e,
              max(CASE WHEN event_type = 'purchase' AND value > 200
                THEN 1 ELSE 0 END) AS o
            FROM events GROUP BY user_id),
          cells AS (
            SELECT
              CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS b,
              CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS c,
              CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS d
            FROM per),
          calc AS (
            SELECT *,
              CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                THEN CAST(a AS DOUBLE) + 0.5 ELSE CAST(a AS DOUBLE)
                END AS aa,
              CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                THEN CAST(b AS DOUBLE) + 0.5 ELSE CAST(b AS DOUBLE)
                END AS bb,
              CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                THEN CAST(c AS DOUBLE) + 0.5 ELSE CAST(c AS DOUBLE)
                END AS cc,
              CASE WHEN a = 0 OR b = 0 OR c = 0 OR d = 0
                THEN CAST(d AS DOUBLE) + 0.5 ELSE CAST(d AS DOUBLE)
                END AS dd
            FROM cells),
          calc2 AS (
            SELECT *, aa * dd / (bb * cc) AS orr,
              sqrt(1 / aa + 1 / bb + 1 / cc + 1 / dd) AS se,
              (aa / (aa + bb)) / (cc / (cc + dd)) AS rr
            FROM calc)
         SELECT a + b AS n_exposed, c + d AS n_unexposed, a, b, c, d,
           floor(orr * 1e6 + 0.5) / 1e6 + 0.0 AS odds_ratio,
           floor(se * 1e6 + 0.5) / 1e6 + 0.0 AS log_or_se,
           floor(exp(ln(orr) - 1.96 * se) * 1e6 + 0.5) / 1e6 + 0.0
             AS or_ci_lo,
           floor(exp(ln(orr) + 1.96 * se) * 1e6 + 0.5) / 1e6 + 0.0
             AS or_ci_hi,
           floor(rr * 1e6 + 0.5) / 1e6 + 0.0 AS relative_risk
         FROM calc2""",
    // grid-sized density window, core islands, nearest-core border
    // assignment — all exact integers
    "q404_dbscan" ->
      """WITH grid AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c,
              count(*) AS cnt
            FROM events WHERE value IS NOT NULL GROUP BY 1),
          dens AS (
            SELECT c, cnt,
              CAST(sum(cnt) OVER (ORDER BY c RANGE BETWEEN 100
                PRECEDING AND 100 FOLLOWING) AS BIGINT) AS nbr
            FROM grid),
          cores AS (SELECT c FROM dens WHERE nbr >= 5),
          isl AS (
            SELECT c AS core,
              CAST(sum(nw) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cl
            FROM (
              SELECT c, CASE WHEN lag(c) OVER (ORDER BY c) IS NULL
                OR c - lag(c) OVER (ORDER BY c) > 100 THEN 1 ELSE 0
                END AS nw
              FROM cores)),
          bord AS (
            SELECT c, cl FROM (
              SELECT d.c, i.core, i.cl,
                row_number() OVER (PARTITION BY d.c
                  ORDER BY abs(d.c - i.core), i.core) AS rn
              FROM dens d JOIN isl i
                ON d.c <> i.core AND abs(d.c - i.core) <= 100
              WHERE d.c NOT IN (SELECT core FROM isl))
            WHERE rn = 1),
          asg AS (
            SELECT g.c, g.cnt, i.cl FROM grid g
            JOIN isl i ON g.c = i.core
            UNION ALL
            SELECT g.c, g.cnt, b.cl FROM grid g
            JOIN bord b ON g.c = b.c
            UNION ALL
            SELECT g.c, g.cnt, CAST(-1 AS BIGINT) AS cl FROM grid g
            WHERE g.c NOT IN (SELECT core FROM isl)
              AND g.c NOT IN (SELECT c FROM bord))
         SELECT cl AS cluster, CAST(sum(cnt) AS BIGINT) AS n_points,
           min(c) AS min_value, max(c) AS max_value
         FROM asg GROUP BY cl ORDER BY cluster""",
    // five unrolled dyadic Haar levels — every coefficient is a
    // dyadic rational, so the double arithmetic is exact
    "q401_haar_energy" -> {
      def lvl(i: Int): String = {
        val prev = s"c${i - 1}"
        s"""p$i AS (
            SELECT t // 2 AS pt,
              sum(CASE WHEN t % 2 = 0 THEN v END) AS a,
              sum(CASE WHEN t % 2 = 1 THEN v END) AS b
            FROM $prev GROUP BY t // 2),
          c$i AS (SELECT pt AS t, (a + b) / 2 AS v, (a - b) / 2 AS df
            FROM p$i),
          e$i AS (SELECT $i AS level, count(*) AS n_coeffs,
            CAST(${1L << (i - 1)} AS BIGINT) AS scale_days,
            sum(df * df) AS e FROM c$i)"""
      }
      s"""WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          dz AS (SELECT min(d) AS d0 FROM ev),
          grid AS (SELECT unnest(generate_series(0, 31)) AS t),
          c0 AS (
            SELECT g.t, coalesce(CAST(c.y AS DOUBLE), 0) AS v
            FROM grid g CROSS JOIN dz
            LEFT JOIN cnts c ON dz.d0 + g.t = c.d),
          ${lvl(1)}, ${lvl(2)}, ${lvl(3)}, ${lvl(4)}, ${lvl(5)},
          e0 AS (SELECT 0 AS level, count(*) AS n_coeffs,
            CAST(32 AS BIGINT) AS scale_days, sum(v * v) AS e FROM c5),
          allr AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2
            UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4
            UNION ALL SELECT * FROM e5 UNION ALL SELECT * FROM e0),
          tot AS (SELECT sum(e) AS te FROM allr)
         SELECT level, CAST(n_coeffs AS BIGINT) AS n_coeffs, scale_days,
           floor(e * 1e6 + 0.5) / 1e6 AS energy,
           CASE WHEN te > 0 THEN floor(e / te * 1e6 + 0.5) / 1e6
             END AS share
         FROM allr, tot ORDER BY level"""
    },
    // exact integer autocovariances via z = y·n − Σy scaling; the
    // ρ²/(n−k) terms quantize to 1e-9 pre-fold
    "q402_ljung_box" ->
      """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          tot AS (SELECT count(*) AS n, CAST(sum(y) AS BIGINT) AS s
            FROM series),
          z AS (SELECT t, y * n - s AS z, n FROM series, tot),
          den AS (SELECT CAST(sum(z * z) AS BIGINT) AS zz,
            max(n) AS nn FROM z),
          lags AS (SELECT unnest(generate_series(1, 7)) AS lg),
          nums AS (
            SELECT lg, CAST(sum(z1.z * z2.z) AS BIGINT) AS num
            FROM z z1 CROSS JOIN lags
            JOIN z z2 ON z2.t = z1.t + lg
            GROUP BY lg),
          terms AS (
            SELECT nn,
              CAST(floor((CAST(num AS DOUBLE) / zz)
                * (CAST(num AS DOUBLE) / zz) / (nn - lg) * 1e9 + 0.5)
                AS BIGINT) AS t9
            FROM nums, den),
          folded AS (SELECT nn, CAST(sum(t9) AS BIGINT) AS s9
            FROM terms GROUP BY nn)
         SELECT nn AS n_days, 7 AS max_lag,
           floor(CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) + 2)
             * (CAST(s9 AS DOUBLE) / 1e9) * 1e4 + 0.5) / 1e4 AS q_stat
         FROM folded""",
    // per-user (type × type) min/max timestamp comparisons — never
    // event-pair work
    "q397_eventually_follows" ->
      """WITH per AS (
            SELECT user_id AS u, event_type AS ty,
              min(epoch_ns(ts)) AS mn, max(epoch_ns(ts)) AS mx
            FROM events GROUP BY 1, 2),
          j AS (
            SELECT a.ty AS from_type, b.ty AS to_type,
              CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END AS f
            FROM per a JOIN per b ON a.u = b.u AND a.ty <> b.ty),
          c AS (
            SELECT from_type, to_type, CAST(sum(f) AS BIGINT)
              AS n_follows, count(*) AS n_both
            FROM j GROUP BY 1, 2)
         SELECT from_type, to_type, n_follows, n_both,
           floor(CAST(n_follows AS DOUBLE) / n_both * 1e6 + 0.5) / 1e6
             AS share
         FROM c ORDER BY from_type, to_type""",
    // three unrolled ESD rounds on the exact 1e-6-grid residuals;
    // argmax by |r·n − Σr| integers, ties to the earlier day
    "q395_seasonal_esd" -> {
      def esdRound(i: Int): String = {
        val prev = if (i == 1) "resid" else s"rem${i - 1}"
        s"""mom$i AS (SELECT count(*) AS n, CAST(sum(r6) AS BIGINT)
              AS s, sum(CAST(r6 AS HUGEINT) * r6) AS q FROM $prev),
          pick$i AS (
            SELECT $i AS round, t, r6, n, s, q,
              abs(r6 * n - s) AS dv,
              row_number() OVER (ORDER BY abs(r6 * n - s) DESC, t ASC)
                AS rn
            FROM $prev, mom$i),
          sel$i AS (SELECT * FROM pick$i WHERE rn = 1),
          rem$i AS (SELECT t, r6 FROM $prev
            WHERE t NOT IN (SELECT t FROM sel$i))"""
      }
      val selOut = (1 to 3).map(i =>
        s"""SELECT round, t,
           CASE WHEN CAST(r6 AS DOUBLE) / 1e6 >= 0 THEN
               floor(CAST(r6 AS DOUBLE) / 1e6 * 1e6 + 0.5)
             ELSE -floor(-(CAST(r6 AS DOUBLE) / 1e6) * 1e6 + 0.5) END
             / 1e6 + 0.0 AS residual,
           CASE WHEN (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
               / (n - 1) / 1e12 > 0 AND n > 2 THEN
             floor(CAST(dv AS DOUBLE) / n / 1e6
               / sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (n - 1) / 1e12) * 1e4 + 0.5) / 1e4 END AS g_stat
         FROM sel$i""").mkString("\n         UNION ALL\n         ")
      s"""WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          win AS (
            SELECT t, y,
              sum(y) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
                3 FOLLOWING) AS ws,
              count(*) OVER (ORDER BY t ROWS BETWEEN 3 PRECEDING AND
                3 FOLLOWING) AS wc
            FROM series),
          detr AS (
            SELECT t, t % 7 AS ph,
              CAST(y AS DOUBLE) - CAST(ws AS DOUBLE) / 7 AS dt
            FROM win WHERE wc = 7),
          withd6 AS (
            SELECT t, ph,
              CASE WHEN dt >= 0
                THEN CAST(floor(dt * 1e6 + 0.5) AS BIGINT)
                ELSE -CAST(floor(-dt * 1e6 + 0.5) AS BIGINT) END AS d6
            FROM detr),
          perph AS (
            SELECT ph, count(*) AS np, CAST(sum(d6) AS BIGINT) AS s6
            FROM withd6 GROUP BY ph),
          idx AS (
            SELECT ph,
              CASE WHEN CAST(s6 AS DOUBLE) / np >= 0 THEN
                  CAST(floor(CAST(s6 AS DOUBLE) / np + 0.5) AS BIGINT)
                ELSE -CAST(floor(-(CAST(s6 AS DOUBLE) / np) + 0.5)
                    AS BIGINT) END AS raw6
            FROM perph),
          resid AS (
            SELECT w.t, w.d6 - i.raw6 AS r6
            FROM withd6 w JOIN idx i ON w.ph = i.ph),
          ${esdRound(1)},
          ${esdRound(2)},
          ${esdRound(3)}
         SELECT * FROM (
         $selOut
         ) ORDER BY round"""
    },
    // argmax outlier decided on exact |c·n − Σc| integers; G from
    // exact moments under IEEE sqrt
    "q390_grubbs" ->
      """WITH base AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          mom AS (SELECT count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
            sum(CAST(c AS HUGEINT) * c) AS q FROM base),
          far AS (
            SELECT c, abs(c * n - s) AS d, n, s, q,
              row_number() OVER (ORDER BY abs(c * n - s) DESC, c DESC)
                AS rn
            FROM base, mom),
          sel AS (SELECT * FROM far WHERE rn = 1),
          calc AS (
            SELECT n, s, c, d,
              (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / (n - 1)
                / 1e4 AS var
            FROM sel)
         SELECT n,
           CASE WHEN CAST(s AS DOUBLE) / n / 100 >= 0 THEN
               floor(CAST(s AS DOUBLE) / n / 100 * 1e6 + 0.5)
             ELSE -floor(-(CAST(s AS DOUBLE) / n / 100) * 1e6 + 0.5)
             END / 1e6 + 0.0 AS mean,
           CASE WHEN var > 0 THEN
             floor(sqrt(var) * 1e6 + 0.5) / 1e6 + 0.0 END AS sd,
           c AS outlier_value,
           CASE WHEN var > 0 AND n > 1 THEN
             floor(CAST(d AS DOUBLE) / n / 100 / sqrt(var) * 1e4 + 0.5)
               / 1e4 END AS g_stat
         FROM calc""",
    // leave-one-unit-out pseudo-ratios from broadcast totals,
    // 1e-9-quantized; variance from exact integer moments
    "q391_jackknife_ratio" ->
      """WITH per AS (
            SELECT user_id AS u,
              CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS a,
              CAST(sum(1) AS BIGINT) AS b
            FROM events WHERE value IS NOT NULL GROUP BY user_id),
          tot AS (SELECT CAST(sum(a) AS BIGINT) AS ta,
            CAST(sum(b) AS BIGINT) AS tb FROM per),
          loo AS (
            SELECT ta, tb,
              CASE WHEN ru >= 0 THEN CAST(floor(ru * 1e9 + 0.5)
                AS BIGINT)
              ELSE -CAST(floor(-ru * 1e9 + 0.5) AS BIGINT) END AS r9
            FROM (SELECT ta, tb, CAST(ta - a AS DOUBLE) / (tb - b)
                AS ru
              FROM per, tot WHERE tb - b > 0)),
          mom AS (
            SELECT ta, tb, count(*) AS n_units,
              CAST(sum(r9) AS BIGINT) AS sr,
              sum(CAST(r9 AS HUGEINT) * r9) AS qr
            FROM loo GROUP BY ta, tb),
          calc AS (
            SELECT n_units, CAST(ta AS DOUBLE) / tb AS ratio,
              (CAST(qr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / n_units)
                / 1e18 AS ss
            FROM mom),
          calc2 AS (
            SELECT n_units, ratio, ss,
              sqrt((CAST(n_units AS DOUBLE) - 1) / n_units * ss) AS se
            FROM calc)
         SELECT n_units,
           floor(ratio * 1e6 + 0.5) / 1e6 + 0.0 AS ratio,
           CASE WHEN n_units > 1 AND ss >= 0 THEN
             floor(se * 1e6 + 0.5) / 1e6 + 0.0 END AS jk_se,
           CASE WHEN n_units > 1 AND ss >= 0 THEN
             CASE WHEN ratio - 1.96 * se >= 0 THEN
                 floor((ratio - 1.96 * se) * 1e6 + 0.5)
               ELSE -floor(-(ratio - 1.96 * se) * 1e6 + 0.5) END
               / 1e6 + 0.0 END AS ci_lo,
           CASE WHEN n_units > 1 AND ss >= 0 THEN
             floor((ratio + 1.96 * se) * 1e6 + 0.5) / 1e6 + 0.0
             END AS ci_hi
         FROM calc2""",
    // the q146 ln-sum identity over transition counts; ln terms
    // 1e-6-quantized pre-sum
    "q392_entropy_rate" ->
      """WITH cells AS (
            SELECT f, t, count(*) AS c
            FROM (SELECT event_type AS f,
                lead(event_type, 1) OVER (PARTITION BY user_id
                  ORDER BY epoch_ns(ts), event_id) AS t
              FROM events)
            WHERE t IS NOT NULL GROUP BY f, t),
          a AS (
            SELECT CAST(sum(CAST(floor(CAST(c AS DOUBLE)
              * ln(CAST(c AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS la,
              CAST(sum(c) AS BIGINT) AS n
            FROM cells),
          b AS (
            SELECT CAST(sum(CAST(floor(CAST(nf AS DOUBLE)
              * ln(CAST(nf AS DOUBLE)) * 1e6 + 0.5) AS BIGINT))
              AS BIGINT) AS lb
            FROM (SELECT f, CAST(sum(c) AS BIGINT) AS nf FROM cells
              GROUP BY f)),
          k AS (
            SELECT CAST(count(DISTINCT s) AS BIGINT) AS n_states
            FROM (SELECT f AS s FROM cells
              UNION ALL SELECT t AS s FROM cells))
         SELECT n AS n_transitions, n_states,
           floor((CAST(lb AS DOUBLE) - CAST(la AS DOUBLE)) / 1e6 / n
             * 1e6 + 0.5) / 1e6 + 0.0 AS h_rate,
           floor(ln(CAST(n_states AS DOUBLE)) * 1e6 + 0.5) / 1e6 + 0.0
             AS h_max,
           CASE WHEN n_states > 1 THEN
             floor((1 - ((CAST(lb AS DOUBLE) - CAST(la AS DOUBLE))
               / 1e6 / n) / ln(CAST(n_states AS DOUBLE))) * 1e6 + 0.5)
               / 1e6 + 0.0 END AS predictability
         FROM a, b, k""",
    // exact integer squared distances over the (windows × m)
    // alignment; exclusion zone ⌈m/2⌉ = 3; argmin by (d², j)
    "q386_matrix_profile" ->
      """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d,
            d1 - d0 + 1 AS tt FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y, g.tt
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          offs AS (SELECT unnest(generate_series(0, 4)) AS k),
          win AS (
            SELECT s.t - o.k AS i, o.k, s.y
            FROM series s CROSS JOIN offs o
            WHERE s.t - o.k >= 0 AND s.t - o.k <= s.tt - 5),
          d2 AS (
            SELECT a.i, b.i AS j,
              CAST(sum((a.ya - b.yb) * (a.ya - b.yb)) AS BIGINT) AS dd
            FROM (SELECT i, k, y AS ya FROM win) a
            JOIN (SELECT i, k, y AS yb FROM win) b ON a.k = b.k
            WHERE abs(a.i - b.i) >= 3
            GROUP BY a.i, b.i),
          best AS (
            SELECT i, j, dd,
              row_number() OVER (PARTITION BY i ORDER BY dd, j) AS rn
            FROM d2)
         SELECT i AS window_start, j AS nn_index, dd AS dist_sq
         FROM best WHERE rn = 1 ORDER BY window_start""",
    // top-k order statistics; ln(x/x_k) terms 1e-9-quantized pre-fold
    "q387_hill_tail" ->
      """WITH base AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
            FROM events WHERE value IS NOT NULL
              AND CAST(floor(value * 100 + 0.5) AS BIGINT) > 0),
          top AS (SELECT x, row_number() OVER (ORDER BY x DESC) AS rn
            FROM base),
          tk AS (SELECT min(x) AS xk, CAST(max(rn) AS BIGINT) AS kk
            FROM top WHERE rn <= 50),
          terms AS (
            SELECT CAST(sum(CAST(floor(ln(CAST(x AS DOUBLE) / xk) * 1e9
              + 0.5) AS BIGINT)) AS BIGINT) AS s9
            FROM top, tk WHERE rn <= 50 AND rn < kk)
         SELECT kk AS k, xk AS threshold,
           floor(CAST(s9 AS DOUBLE) / 1e9 / (kk - 1) * 1e6 + 0.5) / 1e6
             AS hill_mean,
           CASE WHEN CAST(s9 AS DOUBLE) / 1e9 / (kk - 1) > 0 THEN
             floor(1 / (CAST(s9 AS DOUBLE) / 1e9 / (kk - 1)) * 1e4
               + 0.5) / 1e4 END AS tail_index
         FROM tk, terms""",
    // exact integer error sums over the shared t ≥ 7 range
    "q388_forecast_errors" ->
      """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          errs AS (
            SELECT y - p1 AS e1, y - ps AS es
            FROM (SELECT t, y, lag(y, 1) OVER (ORDER BY t) AS p1,
                lag(y, 7) OVER (ORDER BY t) AS ps FROM series)
            WHERE t >= 7),
          f AS (
            SELECT count(*) AS n,
              CAST(sum(abs(e1)) AS BIGINT) AS a1,
              CAST(sum(e1 * e1) AS BIGINT) AS q1,
              CAST(sum(abs(es)) AS BIGINT) AS a2,
              CAST(sum(es * es) AS BIGINT) AS q2
            FROM errs)
         SELECT n,
           floor(CAST(a1 AS DOUBLE) / n * 1e6 + 0.5) / 1e6
             AS mae_naive1,
           floor(sqrt(CAST(q1 AS DOUBLE) / n) * 1e6 + 0.5) / 1e6
             AS rmse_naive1,
           floor(CAST(a2 AS DOUBLE) / n * 1e6 + 0.5) / 1e6
             AS mae_snaive,
           floor(sqrt(CAST(q2 AS DOUBLE) / n) * 1e6 + 0.5) / 1e6
             AS rmse_snaive,
           CASE WHEN a1 > 0 THEN
             floor(CAST(a2 AS DOUBLE) / n / (CAST(a1 AS DOUBLE) / n)
               * 1e6 + 0.5) / 1e6 END AS mase
         FROM f""",
    // pure int64 marginals; absent (block, treatment) cells are
    // exact zeros in both engines
    "q382_cochran_q" ->
      """WITH cells AS (
            SELECT user_id AS b, event_type AS t,
              max(CASE WHEN value > 300 THEN 1 ELSE 0 END) AS x
            FROM events GROUP BY 1, 2),
          rows_ AS (
            SELECT CAST(count(*) AS BIGINT) AS n_blocks,
              CAST(sum(r) AS BIGINT) AS nn,
              CAST(sum(r * r) AS BIGINT) AS r2
            FROM (SELECT b, CAST(sum(x) AS BIGINT) AS r FROM cells
              GROUP BY b)),
          cols_ AS (
            SELECT CAST(sum(c * c) AS BIGINT) AS c2
            FROM (SELECT t, CAST(sum(x) AS BIGINT) AS c FROM cells
              GROUP BY t)),
          k_ AS (SELECT count(DISTINCT t) AS k FROM cells)
         SELECT n_blocks, k AS k_treatments,
           CASE WHEN CAST(k * nn - r2 AS DOUBLE) > 0 THEN
             floor(CAST((k - 1) * (k * c2 - nn * nn) AS DOUBLE)
               / CAST(k * nn - r2 AS DOUBLE) * 1e4 + 0.5) / 1e4
             END AS q_stat
         FROM rows_, cols_, k_""",
    // runs over the sign sequence of day-over-day moves; exact
    // integers until the final z ratio
    "q385_runs_test" ->
      """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          mv AS (
            SELECT t, CASE WHEN y > prev THEN 1 ELSE -1 END AS s
            FROM (SELECT t, y, lag(y) OVER (ORDER BY t) AS prev
              FROM series)
            WHERE prev IS NOT NULL AND y <> prev),
          r AS (
            SELECT count(*) AS n_moves,
              CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_up,
              CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_down,
              CAST(sum(CASE WHEN ps IS NULL OR ps <> s THEN 1 ELSE 0
                END) AS BIGINT) AS runs
            FROM (SELECT s, lag(s) OVER (ORDER BY t) AS ps FROM mv))
         SELECT n_moves, n_up, n_down, runs,
           CASE WHEN n_moves > 0 THEN
             floor((1 + CAST(2 * n_up * n_down AS DOUBLE) / n_moves)
               * 1e4 + 0.5) / 1e4 END AS expected_runs,
           CASE WHEN n_moves > 1
               AND CAST(2 * n_up * n_down AS DOUBLE)
                 * (CAST(2 * n_up * n_down AS DOUBLE) - n_moves)
                 / (CAST(n_moves AS DOUBLE) * n_moves * (n_moves - 1))
                 > 0 THEN
             CASE WHEN (CAST(runs AS DOUBLE)
                 - (1 + CAST(2 * n_up * n_down AS DOUBLE) / n_moves))
                 / sqrt(CAST(2 * n_up * n_down AS DOUBLE)
                   * (CAST(2 * n_up * n_down AS DOUBLE) - n_moves)
                   / (CAST(n_moves AS DOUBLE) * n_moves
                     * (n_moves - 1))) >= 0 THEN
               floor((CAST(runs AS DOUBLE)
                 - (1 + CAST(2 * n_up * n_down AS DOUBLE) / n_moves))
                 / sqrt(CAST(2 * n_up * n_down AS DOUBLE)
                   * (CAST(2 * n_up * n_down AS DOUBLE) - n_moves)
                   / (CAST(n_moves AS DOUBLE) * n_moves
                     * (n_moves - 1))) * 1e6 + 0.5)
             ELSE -floor(-((CAST(runs AS DOUBLE)
                 - (1 + CAST(2 * n_up * n_down AS DOUBLE) / n_moves))
                 / sqrt(CAST(2 * n_up * n_down AS DOUBLE)
                   * (CAST(2 * n_up * n_down AS DOUBLE) - n_moves)
                   / (CAST(n_moves AS DOUBLE) * n_moves
                     * (n_moves - 1)))) * 1e6 + 0.5) END / 1e6 + 0.0
             END AS z
         FROM r""",
    // closed-form isotonic fit: min_{j≥i} max_{k≤i} rate(k..j) over
    // bucket triples of exact cumulative integers
    "q381_isotonic" ->
      """WITH base AS (
            SELECT ((CAST(floor(value * 100 + 0.5) AS BIGINT) % 101) + 101)
                % 101 AS x,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS yy
            FROM events WHERE value IS NOT NULL),
          mm AS (SELECT min(x) AS mn, max(x) AS mx FROM base),
          per AS (
            SELECT ((x - mn) * 12) // (mx - mn + 1) AS b, count(*) AS w,
              CAST(sum(yy) AS BIGINT) AS s, max(x) AS thr
            FROM base, mm GROUP BY 1),
          cum AS (
            SELECT *,
              CAST(sum(w) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
              CAST(sum(s) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS cs
            FROM per),
          ks AS (SELECT b AS k, cw - w AS cwp, cs - s AS csp FROM cum),
          js AS (SELECT b AS j, cw AS cwj, cs AS csj FROM cum),
          isb AS (SELECT b AS i, w AS n, s AS si, thr AS max_score
            FROM cum),
          tri AS (
            SELECT isb.i, js.j, isb.n, isb.si, isb.max_score,
              CAST(csj - csp AS DOUBLE) / (cwj - cwp) AS avgr
            FROM ks JOIN js ON ks.k <= js.j
            JOIN isb ON ks.k <= isb.i AND isb.i <= js.j),
          inner_ AS (
            SELECT i, j, n, si, max_score, max(avgr) AS mx
            FROM tri GROUP BY i, j, n, si, max_score)
         SELECT i AS bucket, max_score, n,
           floor(CAST(si AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS raw_rate,
           floor(min(mx) * 1e6 + 0.5) / 1e6 AS fitted_rate
         FROM inner_ GROUP BY i, max_score, n, si
         ORDER BY bucket""",
    // sequential recurrence replayed as a recursive CTE over per-user
    // event ordinals; pure integer refill/admission arithmetic
    "q380_token_bucket" ->
      """WITH RECURSIVE e AS (
            SELECT user_id, epoch_ns(ts) AS tns, event_id,
              row_number() OVER (PARTITION BY user_id
                ORDER BY epoch_ns(ts), event_id) AS seq
            FROM events),
          r(user_id, seq, tns, tokens, adm) AS (
            SELECT user_id, seq, tns, CAST(2000000 AS BIGINT),
              CAST(1 AS BIGINT)
            FROM e WHERE seq = 1
            UNION ALL
            SELECT e.user_id, e.seq, e.tns,
              CASE WHEN least(3000000,
                  r.tokens + (e.tns - r.tns) // 3600000) >= 1000000
                THEN least(3000000,
                  r.tokens + (e.tns - r.tns) // 3600000) - 1000000
                ELSE least(3000000,
                  r.tokens + (e.tns - r.tns) // 3600000) END,
              r.adm + CASE WHEN least(3000000,
                  r.tokens + (e.tns - r.tns) // 3600000) >= 1000000
                THEN 1 ELSE 0 END
            FROM r JOIN e
              ON e.user_id = r.user_id AND e.seq = r.seq + 1),
          fin AS (
            SELECT user_id, seq, tokens, adm,
              row_number() OVER (PARTITION BY user_id ORDER BY seq DESC)
                AS rn
            FROM r)
         SELECT user_id, seq AS n_events, adm AS n_admitted,
           tokens AS final_tokens_micro
         FROM fin WHERE rn = 1 ORDER BY user_id""",
    // Cliff's delta from grid counting (Σ cntA·cumBelowB); d/g from
    // the q345 integer moments; pooled-sd algebra mirrored exactly
    "q376_effect_sizes" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          grid AS (SELECT g, c, count(*) AS cnt FROM base GROUP BY g, c),
          full_ AS (
            SELECT gg.g, cc.c, coalesce(gr.cnt, 0) AS cnt
            FROM (SELECT DISTINCT c FROM grid) cc
            CROSS JOIN (SELECT DISTINCT g FROM grid) gg
            LEFT JOIN grid gr ON gr.g = gg.g AND gr.c = cc.c),
          cum AS (
            SELECT g, c, cnt,
              CAST(coalesce(sum(cnt) OVER (PARTITION BY g ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS below
            FROM full_),
          per AS (
            SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
              CAST(sum(c * cnt) AS BIGINT) AS s,
              sum(CAST(c AS HUGEINT) * c * cnt) AS q
            FROM grid GROUP BY g HAVING sum(cnt) >= 2),
          cells AS (
            SELECT a.g AS ga, b.g AS gb, a.cnt AS ca, b.cnt AS cb,
              b.below
            FROM grid a JOIN cum b ON a.c = b.c AND a.g < b.g),
          counts AS (
            SELECT ga, gb, CAST(sum(ca * below) AS BIGINT) AS gt,
              CAST(sum(ca * cb) AS BIGINT) AS eq
            FROM cells GROUP BY ga, gb),
          pair AS (
            SELECT a.g AS ga, b.g AS gb, a.n AS n_a, b.n AS n_b,
              a.s AS sa2, b.s AS sb2, a.q AS qa, b.q AS qb
            FROM per a JOIN per b ON a.g < b.g),
          calc AS (
            SELECT pair.ga, pair.gb, n_a, n_b, sa2, sb2, gt, eq,
              (CAST(qa AS DOUBLE) - CAST(sa2 AS DOUBLE) * sa2 / n_a)
                / (n_a - 1) / 1e4 AS va,
              (CAST(qb AS DOUBLE) - CAST(sb2 AS DOUBLE) * sb2 / n_b)
                / (n_b - 1) / 1e4 AS vb
            FROM pair JOIN counts
              ON pair.ga = counts.ga AND pair.gb = counts.gb),
          calc2 AS (
            SELECT *,
              ((n_a - 1) * va + (n_b - 1) * vb)
                / CAST(n_a + n_b - 2 AS DOUBLE) AS pooled,
              CAST(sa2 AS DOUBLE) / n_a / 100
                - CAST(sb2 AS DOUBLE) / n_b / 100 AS md,
              CAST(gt - (n_a * n_b - gt - eq) AS DOUBLE)
                / (n_a * n_b) AS delta
            FROM calc),
          calc3 AS (
            SELECT *, md / sqrt(pooled) AS d,
              md / sqrt(pooled) * (1 - 3.0 / (4 * (n_a + n_b) - 9)) AS hg
            FROM calc2)
         SELECT ga AS group_a, gb AS group_b, n_a, n_b,
           CASE WHEN pooled > 0 THEN CASE WHEN d >= 0
             THEN floor(d * 1e6 + 0.5) ELSE -floor(-d * 1e6 + 0.5) END
             / 1e6 + 0.0 END AS cohens_d,
           CASE WHEN pooled > 0 THEN CASE WHEN hg >= 0
             THEN floor(hg * 1e6 + 0.5) ELSE -floor(-hg * 1e6 + 0.5) END
             / 1e6 + 0.0 END AS hedges_g,
           CASE WHEN delta >= 0 THEN floor(delta * 1e6 + 0.5)
             ELSE -floor(-delta * 1e6 + 0.5) END / 1e6 + 0.0
             AS cliffs_delta
         FROM calc3 ORDER BY group_a, group_b""",
    // ANOVA on 1e-6-grid |x − mean| longs — the q344 identities on
    // the finer grid
    "q377_levene" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          means AS (SELECT g, count(*) AS nm, CAST(sum(c) AS BIGINT)
            AS sm FROM base GROUP BY g),
          z AS (
            SELECT base.g,
              CAST(floor(abs(CAST(c AS DOUBLE) - CAST(sm AS DOUBLE) / nm)
                / 100 * 1e6 + 0.5) AS BIGINT) AS z
            FROM base JOIN means ON base.g = means.g),
          per AS (
            SELECT g, count(*) AS n, CAST(sum(z) AS BIGINT) AS s,
              sum(CAST(z AS HUGEINT) * z) AS q
            FROM z GROUP BY g),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
              CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(s) AS BIGINT) AS ts,
              CAST(sum(q) AS HUGEINT) AS tq,
              CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n / 1e12 * 1e6
                + 0.5) AS BIGINT)) AS BIGINT) AS sb6
            FROM per),
          calc AS (
            SELECT k_groups, n,
              CAST(sb6 AS DOUBLE) / 1e6
                - CAST(ts AS DOUBLE) * ts / n / 1e12 AS ssb,
              CAST(tq AS DOUBLE) / 1e12
                - CAST(ts AS DOUBLE) * ts / n / 1e12 AS sst
            FROM roll)
         SELECT k_groups, n,
           CASE WHEN k_groups > 1 AND n > k_groups AND sst - ssb > 0 THEN
             floor((ssb / (k_groups - 1)) / ((sst - ssb) / (n - k_groups))
               * 1e4 + 0.5) / 1e4 END AS w_stat
         FROM calc""",
    // exact integer re-signing: the md5 coin replays bit-identically
    "q378_sign_flip" ->
      """WITH per AS (
            SELECT user_id AS u,
              CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END)
                AS BIGINT) AS sa2,
              count(CASE WHEN event_type = 'purchase' THEN 1 END) AS na,
              CAST(sum(CASE WHEN event_type = 'view'
                THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END)
                AS BIGINT) AS sb2,
              count(CASE WHEN event_type = 'view' THEN 1 END) AS nb
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('purchase', 'view')
            GROUP BY user_id
            HAVING count(CASE WHEN event_type = 'purchase' THEN 1 END)
                > 0
              AND count(CASE WHEN event_type = 'view' THEN 1 END) > 0),
          diffs AS (
            SELECT u,
              CASE WHEN CAST(sa2 AS DOUBLE) / na / 100
                  - CAST(sb2 AS DOUBLE) / nb / 100 >= 0 THEN
                CAST(floor((CAST(sa2 AS DOUBLE) / na / 100
                  - CAST(sb2 AS DOUBLE) / nb / 100) * 1e4 + 0.5)
                  AS BIGINT)
              ELSE -CAST(floor(-(CAST(sa2 AS DOUBLE) / na / 100
                  - CAST(sb2 AS DOUBLE) / nb / 100) * 1e4 + 0.5)
                  AS BIGINT) END AS d4
            FROM per),
          obs AS (SELECT count(*) AS n_units,
            CAST(sum(d4) AS BIGINT) AS t4 FROM diffs),
          reps AS (SELECT unnest(generate_series(0, 199)) AS r),
          fl AS (
            SELECT r,
              CAST(sum((CASE WHEN ('0x' || substr(md5('sf:'
                || CAST(u AS VARCHAR) || ':' || CAST(r AS VARCHAR)),
                1, 15))::BIGINT % 2 = 0 THEN 1 ELSE -1 END) * d4)
                AS BIGINT) AS tr
            FROM diffs CROSS JOIN reps GROUP BY r)
         SELECT n_units, CAST(t4 AS DOUBLE) / 1e4 AS t_obs,
           200 AS n_reps,
           CAST(sum(CASE WHEN abs(tr) >= abs(t4) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_extreme,
           floor(CAST(sum(CASE WHEN abs(tr) >= abs(t4) THEN 1 ELSE 0
             END) AS DOUBLE) / 200 * 1e6 + 0.5) / 1e6 + 0.0 AS p_value
         FROM fl, obs GROUP BY n_units, t4""",
    // batch replay of the exclusive-latest match: per purchase the
    // min-gap (then max view id) strictly-earlier view within 1 h
    "q375_stream_pattern" ->
      """WITH e AS (
            SELECT user_id, event_id, epoch_ns(ts) AS tns, event_type
            FROM events WHERE event_type IN ('view', 'purchase')),
          p AS (SELECT user_id, event_id AS purchase_id, tns AS pts
            FROM e WHERE event_type = 'purchase'),
          v AS (SELECT user_id, event_id AS view_id, tns AS vts
            FROM e WHERE event_type = 'view'),
          j AS (
            SELECT p.user_id, p.purchase_id, v.view_id,
              p.pts - v.vts AS gap
            FROM p JOIN v ON p.user_id = v.user_id
              AND p.pts - v.vts > 0
              AND p.pts - v.vts <= 3600000000000),
          best AS (
            SELECT *, row_number() OVER (PARTITION BY purchase_id
              ORDER BY gap ASC, view_id DESC) AS rn
            FROM j)
         SELECT user_id, purchase_id, view_id, gap AS gap_ns
         FROM best WHERE rn = 1 ORDER BY purchase_id""",
    // day-grid pair self-join; pure integer concordance counting,
    // tie-corrected denominator under IEEE sqrt
    "q372_kendall_tau" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d, event_type
            FROM events),
          cnts AS (
            SELECT d,
              CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS a,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS b
            FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.a, 0) AS a,
              coalesce(c.b, 0) AS b
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          pairs AS (
            SELECT s1.a AS a1, s1.b AS b1, s2.a AS a2, s2.b AS b2
            FROM series s1 JOIN series s2 ON s1.t < s2.t),
          mom AS (
            SELECT count(*) AS n_pairs,
              CAST(sum(CASE WHEN (a1 - a2) * (b1 - b2) > 0 THEN 1
                ELSE 0 END) AS BIGINT) AS concordant,
              CAST(sum(CASE WHEN (a1 - a2) * (b1 - b2) < 0 THEN 1
                ELSE 0 END) AS BIGINT) AS discordant,
              CAST(sum(CASE WHEN a1 = a2 THEN 1 ELSE 0 END) AS BIGINT)
                AS ties_a,
              CAST(sum(CASE WHEN b1 = b2 THEN 1 ELSE 0 END) AS BIGINT)
                AS ties_b
            FROM pairs),
          nd AS (SELECT count(*) AS n_days FROM series)
         SELECT n_days, n_pairs, concordant, discordant, ties_a, ties_b,
           CASE WHEN CAST(n_pairs - ties_a AS DOUBLE) > 0
               AND CAST(n_pairs - ties_b AS DOUBLE) > 0 THEN
             CASE WHEN CAST(concordant - discordant AS DOUBLE)
                 / (sqrt(CAST(n_pairs - ties_a AS DOUBLE))
                   * sqrt(CAST(n_pairs - ties_b AS DOUBLE))) >= 0 THEN
               floor(CAST(concordant - discordant AS DOUBLE)
                 / (sqrt(CAST(n_pairs - ties_a AS DOUBLE))
                   * sqrt(CAST(n_pairs - ties_b AS DOUBLE)))
                 * 1e6 + 0.5)
             ELSE -floor(-(CAST(concordant - discordant AS DOUBLE)
                 / (sqrt(CAST(n_pairs - ties_a AS DOUBLE))
                   * sqrt(CAST(n_pairs - ties_b AS DOUBLE))))
                 * 1e6 + 0.5) END / 1e6 + 0.0 END AS tau_b
         FROM nd, mom""",
    // within-day tie-averaged doubled ranks (integers); rank sums are
    // exact .25-grid doubles so every fold is binary-exact
    "q373_friedman" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d, event_type AS ty
            FROM events),
          types AS (SELECT DISTINCT ty FROM ev),
          cnts AS (SELECT d, ty, count(*) AS c FROM ev GROUP BY d, ty),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (
            SELECT g.d, t.ty
            FROM (SELECT unnest(generate_series(d0, d1)) AS d FROM bd) g
            CROSS JOIN types t),
          cells AS (
            SELECT g.d, g.ty, coalesce(c.c, 0) AS c
            FROM grid g LEFT JOIN cnts c ON g.d = c.d AND g.ty = c.ty),
          vals AS (SELECT d, c, count(*) AS t FROM cells GROUP BY d, c),
          ranked AS (
            SELECT d, c, t,
              CAST(coalesce(sum(t) OVER (PARTITION BY d ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS below
            FROM vals),
          withr2 AS (
            SELECT cells.ty, 2 * below + t + 1 AS r2
            FROM cells JOIN ranked
              ON cells.d = ranked.d AND cells.c = ranked.c),
          pertype AS (
            SELECT ty, CAST(sum(r2) AS BIGINT) AS sr2, count(*) AS nb
            FROM withr2 GROUP BY ty),
          folded AS (
            SELECT count(*) AS k_treatments, max(nb) AS n_blocks,
              sum((CAST(sr2 AS DOUBLE) / 2) * (CAST(sr2 AS DOUBLE) / 2))
                AS s
            FROM pertype),
          tiesum AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS ts
            FROM vals),
          calc AS (
            SELECT n_blocks, k_treatments,
              12 / (CAST(n_blocks AS DOUBLE) * CAST(k_treatments AS
                DOUBLE) * (CAST(k_treatments AS DOUBLE) + 1)) * s
                - 3 * CAST(n_blocks AS DOUBLE)
                  * (CAST(k_treatments AS DOUBLE) + 1) AS chi2,
              1 - CAST(ts AS DOUBLE)
                / (CAST(n_blocks AS DOUBLE) * CAST(k_treatments AS
                  DOUBLE) * (CAST(k_treatments AS DOUBLE)
                    * CAST(k_treatments AS DOUBLE) - 1)) AS corr
            FROM folded, tiesum)
         SELECT n_blocks, k_treatments,
           CASE WHEN chi2 >= 0 THEN floor(chi2 * 1e4 + 0.5)
             ELSE -floor(-chi2 * 1e4 + 0.5) END / 1e4 + 0.0 AS chi2_f,
           floor(corr * 1e6 + 0.5) / 1e6 AS tie_correction,
           CASE WHEN corr > 0 THEN
             CASE WHEN chi2 / corr >= 0 THEN floor(chi2 / corr * 1e4 + 0.5)
               ELSE -floor(-(chi2 / corr) * 1e4 + 0.5) END / 1e4 + 0.0
             END AS chi2_adj
         FROM calc""",
    // discordant-cell algebra over per-user boolean reductions; the
    // continuity correction clamps |b−c|−1 = 0 (Edwards convention)
    "q360_mcnemar" ->
      """WITH per AS (
            SELECT user_id,
              max(CASE WHEN event_type = 'error' AND value > 200
                  THEN 1 ELSE 0 END) AS a,
              max(CASE WHEN event_type = 'purchase' AND value > 200
                  THEN 1 ELSE 0 END) AS b
            FROM events GROUP BY user_id),
          cells AS (
            SELECT count(*) AS n_units,
              CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_both,
              CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a_only,
              CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b_only,
              CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neither
            FROM per)
         SELECT n_units, n_both, n_a_only, n_b_only, n_neither,
           CASE WHEN n_a_only + n_b_only > 0 THEN
             floor((CAST(n_a_only AS DOUBLE) - n_b_only)
               * (CAST(n_a_only AS DOUBLE) - n_b_only)
               / (CAST(n_a_only AS DOUBLE) + n_b_only) * 1e6 + 0.5) / 1e6
             END AS chi2,
           CASE WHEN n_a_only + n_b_only > 0 THEN
             floor(greatest(abs(CAST(n_a_only AS DOUBLE) - n_b_only) - 1, 0)
               * greatest(abs(CAST(n_a_only AS DOUBLE) - n_b_only) - 1, 0)
               / (CAST(n_a_only AS DOUBLE) + n_b_only) * 1e6 + 0.5) / 1e6
             END AS chi2_cc
         FROM cells""",
    // at-risk counts = reverse-cumulative sums over the distinct-
    // duration grid; per-time E/V terms quantize to 1e-6 pre-sum
    "q361_logrank" ->
      """WITH per AS (
            SELECT user_id, min(epoch_ns(ts)) AS t0,
              min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) END)
                AS tp,
              max(epoch_ns(ts)) AS t1
            FROM events GROUP BY user_id),
          dur AS (
            SELECT user_id % 2 AS g,
              (coalesce(tp, t1) - t0) // 86400000000000 AS t,
              CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS e
            FROM per),
          grid AS (
            SELECT t,
              CAST(sum(CASE WHEN g = 1 THEN e ELSE 0 END) AS BIGINT) AS d1,
              CAST(sum(e) AS BIGINT) AS d,
              CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
              count(*) AS c
            FROM dur GROUP BY t),
          risk AS (
            SELECT *,
              CAST(sum(c1) OVER (ORDER BY t ASC ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS BIGINT) AS n1,
              CAST(sum(c) OVER (ORDER BY t ASC ROWS BETWEEN CURRENT ROW
                AND UNBOUNDED FOLLOWING) AS BIGINT) AS n
            FROM grid),
          terms AS (
            SELECT d1, d,
              CAST(floor(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
                * 1e6 + 0.5) AS BIGINT) AS e6,
              CASE WHEN n > 1 THEN
                CAST(floor(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
                  * (1 - CAST(n1 AS DOUBLE) / n)
                  * CAST(n - d AS DOUBLE) / (n - 1) * 1e6 + 0.5) AS BIGINT)
                ELSE 0 END AS v6
            FROM risk WHERE d > 0),
          sizes AS (
            SELECT CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_group1,
              CAST(sum(CASE WHEN g <> 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_group0
            FROM dur),
          roll AS (
            SELECT CAST(sum(d) AS BIGINT) AS deaths_total,
              CAST(sum(d1) AS BIGINT) AS o1,
              CAST(sum(e6) AS BIGINT) AS se6,
              CAST(sum(v6) AS BIGINT) AS sv6
            FROM terms)
         SELECT n_group1, n_group0, deaths_total, o1,
           CAST(se6 AS DOUBLE) / 1e6 + 0.0 AS e1,
           CAST(sv6 AS DOUBLE) / 1e6 + 0.0 AS variance,
           CASE WHEN sv6 > 0 THEN
             floor((CAST(o1 AS DOUBLE) - CAST(se6 AS DOUBLE) / 1e6)
               * (CAST(o1 AS DOUBLE) - CAST(se6 AS DOUBLE) / 1e6)
               / (CAST(sv6 AS DOUBLE) / 1e6) * 1e6 + 0.5) / 1e6 + 0.0
             END AS chi2
         FROM sizes, roll""",
    // step-wise AP over distinct score thresholds; per-threshold
    // precision terms quantize to 1e-9 before the fold
    "q362_pr_auc" ->
      """WITH counts AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS s,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS p,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END)
                AS BIGINT) AS n
            FROM events WHERE value IS NOT NULL GROUP BY s),
          cum AS (
            SELECT *,
              CAST(sum(p) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
              CAST(sum(n) OVER (ORDER BY s DESC ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
            FROM counts),
          roll AS (
            SELECT
              CAST(sum(CASE WHEN p > 0 THEN
                CAST(floor(CAST(p AS DOUBLE) * tp / (tp + fp) * 1e9 + 0.5)
                  AS BIGINT) ELSE 0 END) AS BIGINT) AS t9,
              CAST(sum(p) AS BIGINT) AS n_pos,
              CAST(sum(n) AS BIGINT) AS n_neg
            FROM cum)
         SELECT n_pos, n_neg,
           CASE WHEN n_pos > 0 THEN
             floor(CAST(t9 AS DOUBLE) / 1e9 / n_pos * 1e6 + 0.5) / 1e6
             END AS pr_auc,
           floor(CAST(n_pos AS DOUBLE) / (n_pos + n_neg) * 1e6 + 0.5) / 1e6
             AS prevalence
         FROM roll""",
    // Murphy decomposition from per-bin exact integer moments; the
    // direct Brier sum is an exact integer in 1e-4 units
    "q363_brier_decomposition" ->
      """WITH base AS (
            SELECT ((CAST(floor(value * 100 + 0.5) AS BIGINT) % 101) + 101)
                % 101 AS p,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events WHERE value IS NOT NULL),
          per AS (
            SELECT least(CAST(floor(p * 10 / 100) AS BIGINT), 9) AS b,
              count(*) AS nk, CAST(sum(p) AS BIGINT) AS sp,
              CAST(sum(y) AS BIGINT) AS sy,
              CAST(sum((p - 100 * y) * (p - 100 * y)) AS BIGINT) AS sse4
            FROM base GROUP BY 1),
          tot AS (
            SELECT CAST(sum(nk) AS BIGINT) AS nn,
              CAST(sum(sy) AS BIGINT) AS gsy,
              CAST(sum(sse4) AS BIGINT) AS gsse4
            FROM per),
          folded AS (
            SELECT max(nn) AS n, max(gsy) AS syx, max(gsse4) AS sse4x,
              CAST(sum(CAST(floor(nk * (CAST(sp AS DOUBLE) / nk / 100
                  - CAST(sy AS DOUBLE) / nk)
                * (CAST(sp AS DOUBLE) / nk / 100 - CAST(sy AS DOUBLE) / nk)
                * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS rel6,
              CAST(sum(CAST(floor(nk * (CAST(sy AS DOUBLE) / nk
                  - CAST(gsy AS DOUBLE) / nn)
                * (CAST(sy AS DOUBLE) / nk - CAST(gsy AS DOUBLE) / nn)
                * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS res6
            FROM per CROSS JOIN tot),
          calc AS (
            SELECT n,
              CAST(sse4x AS DOUBLE) / 1e4 / n AS brier,
              CAST(rel6 AS DOUBLE) / 1e6 / n AS rel,
              CAST(res6 AS DOUBLE) / 1e6 / n AS res,
              (CAST(syx AS DOUBLE) / n) * (1 - CAST(syx AS DOUBLE) / n)
                AS unc
            FROM folded)
         SELECT n,
           floor(brier * 1e6 + 0.5) / 1e6 + 0.0 AS brier,
           floor(rel * 1e6 + 0.5) / 1e6 + 0.0 AS reliability,
           floor(res * 1e6 + 0.5) / 1e6 + 0.0 AS resolution,
           floor(unc * 1e6 + 0.5) / 1e6 + 0.0 AS uncertainty,
           CASE WHEN brier - (rel - res + unc) >= 0 THEN
               floor((brier - (rel - res + unc)) * 1e6 + 0.5)
             ELSE -floor(-(brier - (rel - res + unc)) * 1e6 + 0.5) END
             / 1e6 + 0.0 AS residual
         FROM calc""",
    // integer-ns cut points (// = floor div, both engines); embargo =
    // membership in the distinct purge-window user set
    "q301_embargo_split" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) AS tns FROM events),
          b AS (SELECT min(tns) AS mn, max(tns) AS mx FROM e),
          c AS (SELECT mn + ((mx - mn) * 3) // 5 AS t0,
                  mn + ((mx - mn) * 7) // 10 AS t1 FROM b),
          pu AS (SELECT DISTINCT user_id
                 FROM e CROSS JOIN c WHERE tns > t0 AND tns <= t1)
         SELECT event_id, user_id,
           CASE WHEN tns <= t0 THEN 'train'
                WHEN tns <= t1 THEN 'purged'
                WHEN user_id IN (SELECT user_id FROM pu) THEN 'embargoed'
                ELSE 'test' END AS split
         FROM e CROSS JOIN c
         ORDER BY event_id""",
    // quintile cutpoint scoring over exact integer R/F/M values
    "q221_rfm" ->
      """WITH p AS (
            SELECT user_id, epoch_ns(ts) AS tns,
              CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'),
          tm AS (SELECT max(tns) AS tmax FROM p),
          u AS (
            SELECT user_id, max(tns) AS last_ts, count(*) AS freq,
              CAST(sum(cents) AS BIGINT) AS cents
            FROM p GROUP BY 1),
          ur AS (SELECT u.*, tm.tmax - u.last_ts AS rec FROM u CROSS JOIN tm),
          cu AS (
            SELECT quantile_cont(rec, [0.2, 0.4, 0.6, 0.8]) AS qr,
              quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS qf,
              quantile_cont(cents, [0.2, 0.4, 0.6, 0.8]) AS qm
            FROM ur),
          sc AS (
            SELECT user_id, cents,
              5 - ((rec > qr[1])::INT + (rec > qr[2])::INT
                 + (rec > qr[3])::INT + (rec > qr[4])::INT) AS r_score,
              1 + ((freq > qf[1])::INT + (freq > qf[2])::INT
                 + (freq > qf[3])::INT + (freq > qf[4])::INT) AS f_score,
              1 + ((cents > qm[1])::INT + (cents > qm[2])::INT
                 + (cents > qm[3])::INT + (cents > qm[4])::INT) AS m_score
            FROM ur CROSS JOIN cu)
         SELECT r_score, f_score, m_score,
           count(*) AS n_users,
           round(CAST(sum(cents) AS BIGINT)::DOUBLE / count(*)) / 100
             AS avg_spend
         FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",
    // interpolated medians land on the half-integer grid ⇒ exact
    "q222_mad_outliers" ->
      s"""WITH $GridCte,
          m AS (SELECT k, quantile_cont(n, 0.5) AS med FROM f GROUP BY k),
          d AS (
            SELECT f.k, f.t, f.n, m.med, abs(f.n - m.med) AS dev
            FROM f JOIN m USING (k)),
          md AS (SELECT k, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY k)
         SELECT d.k AS event_type, d.t, d.n,
           round(d.med, 1) AS med, round(md.mad, 1) AS mad,
           CASE WHEN md.mad > 0 THEN round(0.6745 * d.dev / md.mad, 4) END
             AS robust_z
         FROM d JOIN md USING (k)
         WHERE (md.mad > 0 AND 0.6745 * d.dev / md.mad > 2.0)
            OR (md.mad = 0 AND d.dev > 0)
         ORDER BY event_type, t""",
    // int64 prefix algebra, ONE double square/division per candidate —
    // window sums CAST to BIGINT (DuckDB widens to HUGEINT)
    "q223_changepoint" ->
      s"""WITH $GridCte,
          p AS (
            SELECT k, t, n,
              CAST(sum(n) OVER (PARTITION BY k ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS l,
              CAST(sum(n) OVER (PARTITION BY k) AS BIGINT) AS s2,
              count(*) OVER (PARTITION BY k) AS tt
            FROM f),
          cand AS (
            SELECT k, t + 1 AS s, l, s2, tt,
              CAST(l * tt - (t + 1) * s2 AS DOUBLE)
                * CAST(l * tt - (t + 1) * s2 AS DOUBLE)
                / CAST((t + 1) * (tt - (t + 1)) * tt AS DOUBLE) AS gain
            FROM p WHERE t + 1 < tt),
          r AS (
            SELECT *, row_number() OVER (
              PARTITION BY k ORDER BY gain DESC, s ASC) AS rn
            FROM cand)
         SELECT k AS event_type, s AS split_t, tt AS n_windows,
           round(l::DOUBLE / s, 4) AS mean_left,
           round((s2 - l)::DOUBLE / (tt - s), 4) AS mean_right,
           round(gain, 4) AS gain
         FROM r WHERE rn = 1 ORDER BY event_type""",
    // dyadic weights ⇒ exact weighted sums on any fold order
    "q224_ewma_spikes" ->
      s"""WITH $GridCte,
          lg AS (SELECT k, t, n, $EwmaLags FROM f),
          pr AS (
            SELECT k, t, n,
              CASE WHEN ($EwmaDen) > 0
                THEN ($EwmaNum) / ($EwmaDen) END AS pred
            FROM lg)
         SELECT k AS event_type, t, n,
           round(pred, 6) AS pred,
           round(n / greatest(pred, 1.0), 4) AS ratio
         FROM pr
         WHERE pred IS NOT NULL AND n > 1.5 * greatest(pred, 1.0)
         ORDER BY event_type, t""",
    // q28's sessionization + ordered list pack; deterministic tie order
    // by event_id inside equal timestamps
    "q225_session_paths" ->
      s"""WITH sess AS (
            SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type,
              sum(is_new) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS session_id
            FROM (
              SELECT *,
                CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) > $GapNs
                     OR lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS is_new
              FROM events)),
          paths AS (
            SELECT array_to_string(
              list_slice(list(event_type ORDER BY tns, event_id), 1, 5),
              '>') AS path
            FROM sess GROUP BY user_id, session_id),
          c AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY 1)
         SELECT path, n_sessions FROM c
         ORDER BY n_sessions DESC, path ASC LIMIT 20""",
    // gap-filled grid (as q212), then the W-scaled integer deviations
    // dev = W·n − S: numerator/denominator sums are int64-exact, one
    // final double division per (key, lag)
    "q230_acf" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // ${24 * HourNs} AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // ${24 * HourNs}) AS w0,
              max(epoch_ns(ts) // ${24 * HourNs}) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w AS t, CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          st AS (
            SELECT k, CAST(count(*) AS BIGINT) AS wn,
              CAST(sum(n) AS BIGINT) AS s
            FROM f GROUP BY 1),
          dv AS (
            SELECT f.k, f.t, st.wn * f.n - st.s AS d0
            FROM f JOIN st USING (k)),
          den AS (
            SELECT k, CAST(sum(d0 * d0) AS BIGINT) AS den
            FROM dv GROUP BY 1),
          lags AS (SELECT CAST(unnest(range(1, 8)) AS INT) AS lag),
          num AS (
            SELECT a.k, l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(a.d0 * b2.d0) AS BIGINT) AS num
            FROM dv a CROSS JOIN lags l
            JOIN dv b2 ON a.k = b2.k AND b2.t = a.t + l.lag
            GROUP BY 1, 2)
         SELECT num.k AS event_type, num.lag, n_pairs,
           CASE WHEN den.den > 0
             THEN round(num.num::DOUBLE / den.den, 6) ELSE 0.0 END AS acf
         FROM num JOIN den USING (k)
         ORDER BY event_type, lag""",
    // journey = touches since the user's previous purchase; first/last
    // 0.4 each, middles split 0.2 (1 touch → 1.0, 2 → 0.5/0.5); only
    // journeys that end in a purchase are credited
    "q233_position_attribution" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cv
           FROM events),
         j AS (
           SELECT *,
             sum(cv) OVER (PARTITION BY user_id ORDER BY tns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - cv + 1 AS jid
           FROM e),
         t AS (
           SELECT user_id, jid, event_type,
             row_number() OVER (PARTITION BY user_id, jid
               ORDER BY tns, event_id) AS rn,
             count(*) OVER (PARTITION BY user_id, jid) AS m
           FROM j WHERE cv = 0),
         nc AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS ncv
           FROM e WHERE cv = 1 GROUP BY 1),
         cr AS (
           SELECT t.event_type,
             CASE WHEN m = 1 THEN 1.0::DOUBLE
                  WHEN m = 2 THEN 0.5::DOUBLE
                  WHEN rn = 1 OR rn = m THEN 0.4::DOUBLE
                  ELSE 0.2::DOUBLE / (m - 2) END AS credit
           FROM t JOIN nc USING (user_id) WHERE t.jid <= nc.ncv)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
          round(sum(credit), 4) AS credit
        FROM cr GROUP BY 1 ORDER BY event_type""",
    // change marking + running version per user, run pack, interval
    // close-off by lead over the version grain
    "q234_scd2" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type
           FROM events),
         m AS (
           SELECT *,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
         v AS (
           SELECT *,
             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS version
           FROM m),
         runs AS (
           SELECT user_id, version, event_type,
             CAST(min(tns) AS BIGINT) AS valid_from_ns,
             CAST(count(*) AS BIGINT) AS n_events
           FROM v GROUP BY 1, 2, 3)
        SELECT user_id, version, event_type, valid_from_ns,
          lead(valid_from_ns) OVER uw AS valid_to_ns, n_events,
          lead(valid_from_ns) OVER uw IS NULL AS is_current
        FROM runs
        WINDOW uw AS (PARTITION BY user_id ORDER BY version)
        ORDER BY user_id, version""",
    // integer gap sums → exact mean and MLE rate; quantile_cont is the
    // same interpolated order statistic as Percentiles.exact
    "q235_interarrival" ->
      """WITH g AS (
           SELECT event_type, epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
             PARTITION BY event_type ORDER BY epoch_ns(ts), event_id)
             AS gap
           FROM events),
         f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
          round(CAST(sum(gap) AS DOUBLE) / count(*) / 1e9, 6)
            AS mean_gap_sec,
          round(CAST(count(*) AS DOUBLE) * 1e9 / sum(gap), 6)
            AS lambda_per_sec,
          round(quantile_cont(gap, 0.5) / 1e9, 6) AS p50_gap_sec
        FROM f GROUP BY event_type ORDER BY event_type""",
    // q28's sessionization, sessions packed to (entry, exit, n) by the
    // same lexicographic (tns, event_id) order as the struct min/max
    "q236_entry_exit" ->
      s"""WITH sess AS (
            SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type,
              sum(is_new) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS session_id
            FROM (
              SELECT *,
                CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) > $GapNs
                     OR lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS is_new
              FROM events)),
          pk AS (
            SELECT user_id, session_id,
              first(event_type ORDER BY tns, event_id) AS entry_type,
              last(event_type ORDER BY tns, event_id) AS exit_type,
              count(*) AS n
            FROM sess GROUP BY 1, 2),
          bp AS (
            SELECT entry_type, exit_type, CAST(count(*) AS BIGINT) AS np,
              CAST(count(CASE WHEN n = 1 THEN 1 END) AS BIGINT) AS nb
            FROM pk GROUP BY 1, 2),
          be AS (
            SELECT entry_type, CAST(sum(np) AS BIGINT) AS n_sessions,
              CAST(sum(nb) AS BIGINT) AS n_bounces
            FROM bp GROUP BY 1),
          te AS (
            SELECT entry_type, exit_type AS top_exit_type, np,
              row_number() OVER (
                PARTITION BY entry_type ORDER BY np DESC, exit_type) AS rk
            FROM bp)
         SELECT be.entry_type, n_sessions, n_bounces,
           round(CAST(n_bounces AS DOUBLE) / n_sessions, 6) AS bounce_rate,
           te.top_exit_type,
           round(CAST(np AS DOUBLE) / n_sessions, 6) AS top_exit_share
         FROM be JOIN te USING (entry_type) WHERE rk = 1
         ORDER BY entry_type""",
    // first-touch period per user, gap-filled day grid, one cumsum
    // over the bounded period axis
    "q249_growth_accounting" ->
      s"""WITH f AS (
            SELECT user_id, min(epoch_ns(ts)) // ${24 * HourNs} AS p
            FROM events GROUP BY 1),
          n AS (
            SELECT p, CAST(count(*) AS BIGINT) AS new_users
            FROM f GROUP BY 1),
          b AS (
            SELECT min(epoch_ns(ts)) // ${24 * HourNs} AS p0,
              max(epoch_ns(ts)) // ${24 * HourNs} AS p1
            FROM events),
          g AS (SELECT unnest(range(b.p0, b.p1 + 1)) AS p FROM b)
         SELECT g.p AS period,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY g.p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users
         FROM g LEFT JOIN n USING (p) ORDER BY period""",
    // commutative count/sum state ⇒ the streaming top-k equals batch
    "q257_stream_topk" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
         FROM events GROUP BY user_id
         ORDER BY n DESC, user_id ASC LIMIT 10""",
    // the streaming min-state decomposition equals the batch
    // first-seen curve (min is micro-batch-order-insensitive)
    "q252_stream_first_seen" ->
      s"""WITH f AS (
            SELECT user_id, min(epoch_ns(ts)) // ${24 * HourNs} AS p
            FROM events GROUP BY 1),
          n AS (
            SELECT p, CAST(count(*) AS BIGINT) AS new_users
            FROM f GROUP BY 1),
          b AS (
            SELECT min(epoch_ns(ts)) // ${24 * HourNs} AS p0,
              max(epoch_ns(ts)) // ${24 * HourNs} AS p1
            FROM events),
          g AS (SELECT unnest(range(b.p0, b.p1 + 1)) AS p FROM b)
         SELECT g.p AS period,
           CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY g.p
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_users
         FROM g LEFT JOIN n USING (p) ORDER BY period""",
    // (user, week) activity grid → lag/lead classification; churn
    // attaches to the period AFTER the last active one
    "q250_user_states" ->
      s"""WITH a AS (
            SELECT DISTINCT user_id AS u,
              epoch_ns(ts) // ${7 * 24 * HourNs} AS p
            FROM events),
          m AS (
            SELECT u, p, lag(p) OVER (PARTITION BY u ORDER BY p) AS prev,
              lead(p) OVER (PARTITION BY u ORDER BY p) AS nxt
            FROM a),
          st AS (
            SELECT p, CAST(count(*) AS BIGINT) AS n_active,
              CAST(count(CASE WHEN prev IS NULL THEN 1 END) AS BIGINT)
                AS n_new,
              CAST(count(CASE WHEN prev = p - 1 THEN 1 END) AS BIGINT)
                AS n_retained,
              CAST(count(CASE WHEN prev IS NOT NULL AND prev < p - 1
                THEN 1 END) AS BIGINT) AS n_resurrected
            FROM m GROUP BY 1),
          b AS (SELECT min(p) AS p0, max(p) AS p1 FROM a),
          ch AS (
            SELECT p + 1 AS p, CAST(count(*) AS BIGINT) AS n_churned
            FROM m CROSS JOIN b
            WHERE p < b.p1 AND (nxt IS NULL OR nxt > p + 1)
            GROUP BY 1),
          g AS (SELECT unnest(range(b.p0, b.p1 + 1)) AS p FROM b)
         SELECT g.p AS period,
           CAST(coalesce(n_active, 0) AS BIGINT) AS n_active,
           CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
           CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
           CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
           CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
         FROM g LEFT JOIN st USING (p) LEFT JOIN ch USING (p)
         ORDER BY period""",
    // one conditional-aggregate pass; DiD and t derive from the
    // 6dp-ROUNDED cell means on both sides
    "q246_diff_in_diff" ->
      """WITH m AS (
           SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS mid
           FROM events),
         e AS (
           SELECT
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 2 = 1 AS tr,
             epoch_ns(ts) >= m.mid AS post,
             CAST(value AS DOUBLE) AS v
           FROM events CROSS JOIN m),
         a AS (
           SELECT
             CAST(count(CASE WHEN NOT tr AND NOT post THEN 1 END) AS BIGINT) AS n_cp,
             CAST(count(CASE WHEN tr AND NOT post THEN 1 END) AS BIGINT) AS n_ct,
             CAST(count(CASE WHEN NOT tr AND post THEN 1 END) AS BIGINT) AS n_pp,
             CAST(count(CASE WHEN tr AND post THEN 1 END) AS BIGINT) AS n_pt,
             sum(CASE WHEN NOT tr AND NOT post THEN v END) AS s_cp,
             sum(CASE WHEN tr AND NOT post THEN v END) AS s_ct,
             sum(CASE WHEN NOT tr AND post THEN v END) AS s_pp,
             sum(CASE WHEN tr AND post THEN v END) AS s_pt,
             sum(CASE WHEN NOT tr AND NOT post THEN v * v END) AS q_cp,
             sum(CASE WHEN tr AND NOT post THEN v * v END) AS q_ct,
             sum(CASE WHEN NOT tr AND post THEN v * v END) AS q_pp,
             sum(CASE WHEN tr AND post THEN v * v END) AS q_pt
           FROM e),
         b AS (
           SELECT n_cp, n_ct, n_pp, n_pt,
             round(s_cp / n_cp, 6) AS mean_cp,
             round(s_ct / n_ct, 6) AS mean_ct,
             round(s_pp / n_pp, 6) AS mean_pp,
             round(s_pt / n_pt, 6) AS mean_pt,
             round(
               (CASE WHEN n_cp > 1
                 THEN (q_cp - s_cp * s_cp / n_cp) / (n_cp - 1) / n_cp
                 ELSE 0.0 END)
               + (CASE WHEN n_ct > 1
                 THEN (q_ct - s_ct * s_ct / n_ct) / (n_ct - 1) / n_ct
                 ELSE 0.0 END)
               + (CASE WHEN n_pp > 1
                 THEN (q_pp - s_pp * s_pp / n_pp) / (n_pp - 1) / n_pp
                 ELSE 0.0 END)
               + (CASE WHEN n_pt > 1
                 THEN (q_pt - s_pt * s_pt / n_pt) / (n_pt - 1) / n_pt
                 ELSE 0.0 END), 6) AS vv
           FROM a)
        SELECT n_cp, n_ct, n_pp, n_pt, mean_cp, mean_ct, mean_pp, mean_pt,
          round((mean_pt - mean_ct) - (mean_pp - mean_cp), 6) AS did,
          round(sqrt(vv), 6) AS se,
          CASE WHEN round(sqrt(vv), 6) > 0
            THEN round(round((mean_pt - mean_ct) - (mean_pp - mean_cp), 6)
              / round(sqrt(vv), 6), 4) END AS t_stat
        FROM b""",
    // the two float sums round at 6dp BEFORE atan2/sqrt, so both
    // engines feed the transcendentals identical doubles
    "q284_circular_peak" ->
      """WITH a AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             round(sum(cos(CAST(epoch_ns(ts) % 86400000000000 AS DOUBLE)
               / 86400000000000 * (2 * pi()))), 6) AS c,
             round(sum(sin(CAST(epoch_ns(ts) % 86400000000000 AS DOUBLE)
               / 86400000000000 * (2 * pi()))), 6) AS s
           FROM events GROUP BY 1)
        SELECT event_type, n,
          round((atan2(s, c) / (2 * pi()) * 24 + 24) % 24.0, 4)
            AS peak_hour,
          round(sqrt(c * c + s * s) / n, 6) AS concentration
        FROM a ORDER BY event_type""",
    // the md5 10% sample scaled ×10 vs the exact counts
    "q282_sample_estimate_audit" ->
      """WITH exact AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
         est AS (
           SELECT event_type, CAST(count(*) * 10 AS BIGINT) AS est
           FROM events
           WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
             % 10 = 0
           GROUP BY 1)
        SELECT exact.event_type, n,
          CAST(coalesce(est, 0) AS BIGINT) AS est_n,
          round(CAST(abs(coalesce(est, 0) - n) AS DOUBLE) / n, 6)
            AS rel_err
        FROM exact LEFT JOIN est USING (event_type)
        ORDER BY event_type""",
    // one lag window; integer gap sums → exact mean, min/max
    "q277_transition_latency" ->
      """WITH g AS (
           SELECT user_id,
             lag(event_type) OVER w AS from_type, event_type AS to_type,
             epoch_ns(ts) - lag(epoch_ns(ts)) OVER w AS gap
           FROM events
           WINDOW w AS (PARTITION BY user_id
             ORDER BY epoch_ns(ts), event_id))
        SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n,
          round(CAST(sum(gap) AS DOUBLE) / count(*) / 1e9, 4)
            AS mean_gap_sec,
          round(CAST(min(gap) AS BIGINT) / 1e9, 4) AS min_gap_sec,
          round(CAST(max(gap) AS BIGINT) / 1e9, 4) AS max_gap_sec
        FROM g WHERE from_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY from_type, to_type""",
    // per-user purchase gaps; CV = √(n·Σg² − (Σg)²)/Σg from the
    // integer core
    "q278_purchase_regularity" ->
      """WITH p AS (
           SELECT user_id, epoch_ns(ts) AS tns, event_id
           FROM events WHERE event_type = 'purchase'),
         g AS (
           SELECT user_id,
             (tns - lag(tns) OVER (PARTITION BY user_id
               ORDER BY tns, event_id)) // 1000000000 AS gap
           FROM p),
         a AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s,
             CAST(sum(gap * gap) AS BIGINT) AS q
           FROM g WHERE gap IS NOT NULL GROUP BY 1)
        SELECT user_id, n_gaps,
          round(CAST(s AS DOUBLE) / n_gaps, 4) AS mean_gap_sec,
          CASE WHEN s > 0
            THEN round(sqrt(CAST(n_gaps * q - s * s AS DOUBLE)) / s, 6)
          END AS cv
        FROM a WHERE n_gaps >= 3 ORDER BY user_id""",
    // the stateful streaming fold must equal the batch identity —
    // same oracle as q273
    "q274_stream_ledger" ->
      """WITH d AS (
           SELECT user_id, epoch_ns(ts) AS tns, event_id,
             CAST(round((CASE WHEN event_type = 'purchase'
               THEN -value ELSE value END) * 100) AS BIGINT) AS dd
           FROM events),
         w1 AS (
           SELECT *, CAST(sum(dd) OVER (PARTITION BY user_id
             ORDER BY tns, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS p
           FROM d),
         w2 AS (
           SELECT *, CAST(min(p) OVER (PARTITION BY user_id
             ORDER BY tns, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rm
           FROM w1)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          CAST(last(p - least(rm, 0) ORDER BY tns, event_id) AS BIGINT)
            AS final_balance_cents,
          CAST(-least(min(rm), 0) AS BIGINT) AS lost_to_floor_cents
        FROM w2 GROUP BY user_id ORDER BY user_id""",
    // ring successors over md5 positions; movement vs the 1/(n+1)
    // theory
    "q275_consistent_hash" ->
      """WITH r8 AS (
           SELECT ('0x' || substr(md5('node:' || CAST(i.i AS VARCHAR)),
               1, 15))::BIGINT AS p,
             CAST(i.i AS INT) AS node
           FROM (SELECT unnest(range(0, 8)) AS i) i),
         r9 AS (
           SELECT ('0x' || substr(md5('node:' || CAST(i.i AS VARCHAR)),
               1, 15))::BIGINT AS p,
             CAST(i.i AS INT) AS node
           FROM (SELECT unnest(range(0, 9)) AS i) i),
         keys AS (
           SELECT DISTINCT o_custkey AS k FROM orders),
         kp AS (
           SELECT k, ('0x' || substr(md5('key:' || CAST(k AS VARCHAR)),
               1, 15))::BIGINT AS kp
           FROM keys),
         a AS (
           SELECT k,
             coalesce((SELECT arg_min(node, p) FROM r8 WHERE p >= kp),
               (SELECT arg_min(node, p) FROM r8)) AS nb,
             coalesce((SELECT arg_min(node, p) FROM r9 WHERE p >= kp),
               (SELECT arg_min(node, p) FROM r9)) AS na
           FROM kp)
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
          CAST(count(CASE WHEN nb <> na THEN 1 END) AS BIGINT) AS moved,
          round(CAST(count(CASE WHEN nb <> na THEN 1 END) AS DOUBLE)
            / count(*), 6) AS moved_frac,
          round(1.0::DOUBLE / 9, 6) AS expected_frac
        FROM a""",
    // Lindley identity: clamped_t = prefix_t − min(0, runmin_t); all
    // integer cents, last row via ordered aggregate
    "q273_clamped_balance" ->
      """WITH d AS (
           SELECT user_id, epoch_ns(ts) AS tns, event_id,
             CAST(round((CASE WHEN event_type = 'purchase'
               THEN -value ELSE value END) * 100) AS BIGINT) AS dd
           FROM events),
         w1 AS (
           SELECT *, CAST(sum(dd) OVER (PARTITION BY user_id
             ORDER BY tns, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS p
           FROM d),
         w2 AS (
           SELECT *, CAST(min(p) OVER (PARTITION BY user_id
             ORDER BY tns, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rm
           FROM w1)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
          CAST(last(p - least(rm, 0) ORDER BY tns, event_id) AS BIGINT)
            AS final_balance_cents,
          CAST(-least(min(rm), 0) AS BIGINT) AS lost_to_floor_cents
        FROM w2 GROUP BY user_id ORDER BY user_id""",
    // per-category sums + 1-row prior; identical (s + m·prior)/(n + m)
    "q265_target_encoding" ->
      """WITH per AS (
           SELECT event_type AS category, CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DOUBLE)) AS s
           FROM events GROUP BY 1),
         g AS (SELECT sum(s) / sum(n) AS prior FROM per)
        SELECT category, n, round(s / n, 6) AS raw_mean,
          round((s + 20.0::DOUBLE * prior) / (n + 20.0::DOUBLE), 6)
            AS encoded
        FROM per CROSS JOIN g ORDER BY category""",
    // gap-filled grid (as q212); D = (W·Q − S²)/((W−1)·S), all int64
    // until the single division; the verdict compares integers
    "q247_dispersion" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // ${24 * HourNs} AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // ${24 * HourNs}) AS w0,
              max(epoch_ns(ts) // ${24 * HourNs}) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, CAST(coalesce(c.n, 0) AS BIGINT) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          a AS (
            SELECT k, CAST(count(*) AS BIGINT) AS w,
              CAST(sum(n) AS BIGINT) AS s,
              CAST(sum(n * n) AS BIGINT) AS q
            FROM f GROUP BY 1)
         SELECT k AS event_type, w AS n_windows,
           round(CAST(s AS DOUBLE) / w, 6) AS mean_rate,
           CASE WHEN w > 1 AND s > 0
             THEN round(CAST(w * q - s * s AS DOUBLE)
               / CAST((w - 1) * s AS DOUBLE), 6) END AS dispersion,
           w * q - s * s > (w - 1) * s AS overdispersed
         FROM a ORDER BY event_type""",
    // (quasi, sensitive) cell counts → per-group l and entropy from
    // exact integer ratios
    "q239_l_diversity" ->
      s"""WITH cells AS (
            SELECT event_type, epoch_ns(ts) // ${24 * HourNs} AS day,
              user_id, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2, 3),
          tot AS (
            SELECT event_type, day, CAST(sum(c) AS BIGINT) AS n
            FROM cells GROUP BY 1, 2),
          e AS (
            SELECT cells.event_type, cells.day, c, n
            FROM cells JOIN tot USING (event_type, day))
         SELECT event_type, day, n, CAST(count(*) AS BIGINT) AS l,
           round(sum(-(CAST(c AS DOUBLE) / n)
             * ln(CAST(c AS DOUBLE) / n)), 6) + 0.0 AS entropy,
           count(*) >= 5 AS meets_l
         FROM e GROUP BY event_type, day, n
         ORDER BY event_type, day""",
    // q234's history filtered to the version valid at the integer
    // midpoint of the data range (valid_from ≤ T < valid_to)
    "q241_asof_snapshot" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) AS tns, event_id, event_type
           FROM events),
         m AS (
           SELECT *,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
           FROM e
           WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
         v AS (
           SELECT *,
             CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY tns, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS version
           FROM m),
         runs AS (
           SELECT user_id, version, event_type,
             CAST(min(tns) AS BIGINT) AS valid_from_ns,
             CAST(count(*) AS BIGINT) AS n_events
           FROM v GROUP BY 1, 2, 3),
         iv AS (
           SELECT user_id, version, event_type, valid_from_ns,
             lead(valid_from_ns) OVER (
               PARTITION BY user_id ORDER BY version) AS valid_to_ns,
             n_events
           FROM runs),
         tt AS (
           SELECT (min(epoch_ns(ts)) + max(epoch_ns(ts))) // 2 AS t
           FROM events)
        SELECT user_id, version, event_type, valid_from_ns, n_events
        FROM iv CROSS JOIN tt
        WHERE valid_from_ns <= t AND (valid_to_ns IS NULL OR t < valid_to_ns)
        ORDER BY user_id""",
    // the streaming dedup-then-count decomposition equals a plain
    // DISTINCT count per period in batch
    "q170_stream_daily_active" ->
      s"""SELECT epoch_ns(ts) - epoch_ns(ts) % ${24 * HourNs} AS period_start_ns,
            count(DISTINCT user_id) AS n_active
          FROM events GROUP BY 1 ORDER BY 1""",
    // all four OLS sums are integer (re-based window ordinal × count),
    // so both engines hit the final division bit-identically
    "q176_volume_trend" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w, b.w0 FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w - g.w0 AS t, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          a AS (
            SELECT k, count(*) AS nw,
              CAST(sum(t) AS BIGINT) AS st, CAST(sum(n) AS BIGINT) AS sy,
              CAST(sum(t * n) AS BIGINT) AS sty,
              CAST(sum(t * t) AS BIGINT) AS stt
            FROM f GROUP BY k),
          s AS (
            SELECT k, nw, sy,
              CASE WHEN nw * stt - st * st > 0
                THEN (nw * sty - st * sy)::DOUBLE / (nw * stt - st * st)
                ELSE 0.0 END AS sl,
              st
            FROM a)
         SELECT k AS event_type, nw AS n_windows, sy AS total,
           round(sl, 8) AS slope,
           round((sy::DOUBLE - sl * st) / nw, 6) AS intercept
         FROM s ORDER BY event_type""",
    // single integer-sum ÷ count divisions — no float accumulation
    "q177_diurnal_profile" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          h AS (
            SELECT k, w % 24 AS hour_of_day, count(*) AS n_windows,
              CAST(sum(n) AS BIGINT) AS s
            FROM f GROUP BY 1, 2),
          o AS (
            SELECT k, CAST(sum(n) AS BIGINT) AS st, count(*) AS nt
            FROM f GROUP BY k)
         SELECT h.k AS event_type, h.hour_of_day, h.n_windows,
           round(h.s::DOUBLE / h.n_windows, 6) AS avg_n,
           CASE WHEN o.st > 0
             THEN round((h.s::DOUBLE / h.n_windows) / (o.st::DOUBLE / o.nt), 6)
             ELSE 0.0 END AS ratio
         FROM h JOIN o USING (k) ORDER BY event_type, hour_of_day""",
    // exact sides replayed; the HLL estimate is audited only through
    // its tolerance contract (q82 pattern) — the oracle pins ok = true
    "q171_rolling_distinct_hll" ->
      s"""WITH p AS (
            SELECT DISTINCT epoch_ns(ts) // ${24 * HourNs} AS p, user_id AS k
            FROM events),
          b AS (SELECT min(p) AS p0, max(p) AS p1 FROM p),
          e AS (
            SELECT u.rp AS period, p.p, p.k
            FROM p, unnest(range(p.p, p.p + 7)) AS u(rp)),
          g AS (
            SELECT period,
              count(DISTINCT CASE WHEN period = p THEN k END) AS n_distinct_1,
              count(DISTINCT k) AS n_distinct_w
            FROM e GROUP BY period)
         SELECT period, period * ${24 * HourNs} AS period_start_ns,
           n_distinct_1, n_distinct_w, true AS hll_ok
         FROM g CROSS JOIN b
         WHERE period BETWEEN b.p0 + 6 AND b.p1 ORDER BY period""",
    // (period, user) dedup first, then each pair feeds the 7 trailing
    // report periods it participates in — sliding distinct does not
    // decompose into per-period counts, so both engines re-count
    "q161_rolling_distinct" ->
      s"""WITH p AS (
            SELECT DISTINCT epoch_ns(ts) // ${24 * HourNs} AS p, user_id AS k
            FROM events),
          b AS (SELECT min(p) AS p0, max(p) AS p1 FROM p),
          e AS (
            SELECT u.rp AS period, p.p, p.k
            FROM p, unnest(range(p.p, p.p + 7)) AS u(rp)),
          g AS (
            SELECT period,
              count(DISTINCT CASE WHEN period = p THEN k END) AS n_distinct_1,
              count(DISTINCT k) AS n_distinct_w
            FROM e GROUP BY period)
         SELECT period, period * ${24 * HourNs} AS period_start_ns,
           n_distinct_1, n_distinct_w
         FROM g CROSS JOIN b
         WHERE period BETWEEN b.p0 + 6 AND b.p1 ORDER BY period""",
    // CUSUM via the running-minimum identity S_i = C_i − min(0, min C_j);
    // cumsums are ordered sequential double folds — identical on both
    // engines; struct-max with −w picks the earliest window on ties
    "q162_cusum_shifts" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          m AS (SELECT k, avg(n) AS mu, stddev_pop(n) AS sd FROM f GROUP BY k),
          z AS (
            SELECT f.k, f.w,
              CASE WHEN m.sd > 0 THEN (f.n - m.mu) / m.sd ELSE 0.0 END AS z
            FROM f JOIN m USING (k)),
          cs AS (
            SELECT k, w,
              sum(z - 0.5) OVER win AS cp, sum(-z - 0.5) OVER win AS cn
            FROM z WINDOW win AS (
              PARTITION BY k ORDER BY w ROWS UNBOUNDED PRECEDING)),
          s AS (
            SELECT k, w,
              cp - least(0, min(cp) OVER win) AS sp,
              cn - least(0, min(cn) OVER win) AS sn
            FROM cs WINDOW win AS (
              PARTITION BY k ORDER BY w ROWS UNBOUNDED PRECEDING)),
          agg AS (
            SELECT k, count(*) AS n_windows,
              max(struct_pack(s := sp, nw := -w)) AS mp,
              max(struct_pack(s := sn, nw := -w)) AS mn
            FROM s GROUP BY k)
         SELECT k AS event_type, n_windows,
           round(mp.s, 4) AS max_shift_up,
           CAST(-mp.nw * $HourNs AS BIGINT) AS window_up_ns,
           round(mn.s, 4) AS max_shift_down,
           CAST(-mn.nw * $HourNs AS BIGINT) AS window_down_ns
         FROM agg ORDER BY event_type""",
    "q156_volume_anomalies" ->
      s"""WITH c AS (
            SELECT event_type,
              epoch_ns(ts) - epoch_ns(ts) % $HourNs AS w, count(*) AS n
            FROM events GROUP BY 1, 2),
          m AS (
            SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sd
            FROM c GROUP BY 1)
         SELECT c.event_type, w AS window_start_ns, n,
           round(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END, 6) AS z
         FROM c JOIN m USING (event_type)
         WHERE abs(CASE WHEN sd > 0 THEN (n - mu) / sd ELSE 0.0 END) >= 2
         ORDER BY event_type, window_start_ns""",
    // gaps are diffs of the per-user SORTED ts sequence, so their
    // multiset is tie-order-invariant on both engines
    // exact integer moments (Σgap int64, Σgap² HUGEINT) then identical
    // double algebra + floor-grid — float avg/stddev diverged at sf0.1
    "q157_burstiness" ->
      """WITH g AS (
           SELECT user_id,
             epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
               PARTITION BY user_id ORDER BY ts) AS gap
           FROM events),
          a AS (
           SELECT user_id, count(*) AS n_gaps,
             CAST(sum(gap) AS BIGINT) AS s1,
             sum(CAST(gap AS HUGEINT) * gap) AS s2
           FROM g WHERE gap IS NOT NULL GROUP BY user_id),
          m AS (
           SELECT user_id, n_gaps,
             CAST(s1 AS DOUBLE) / n_gaps AS mu,
             sqrt(greatest(CAST(s2 AS DOUBLE) / n_gaps
               - (CAST(s1 AS DOUBLE) / n_gaps)
                 * (CAST(s1 AS DOUBLE) / n_gaps), 0.0)) AS sd
           FROM a)
         SELECT user_id, n_gaps,
           floor(mu / 1e9 * 1e6 + 0.5) / 1e6 AS mean_gap_s,
           floor(sd / 1e9 * 1e6 + 0.5) / 1e6 AS std_gap_s,
           CASE WHEN sd + mu = 0 THEN 0.0
                ELSE floor((sd - mu) / (sd + mu) * 1e6 + 0.5) / 1e6
           END AS burstiness
         FROM m ORDER BY user_id""",
    // same ns ages, same exact-double 0.5 base — power() and the
    // weighted sums replay within the 6dp rounding
    "q138_decayed_activity" ->
      s"""WITH t AS (SELECT max(epoch_ns(ts)) AS tmax FROM events),
          w AS (
            SELECT user_id, value, epoch_ns(ts) AS tns,
              power(0.5, (t.tmax - epoch_ns(ts))::DOUBLE / ${(7L * 24 * HourNs).toDouble}) AS w
            FROM events CROSS JOIN t)
         SELECT user_id, count(*) AS n_events,
           CAST(max(tns) // 1000 AS BIGINT) AS last_ts_us,
           round(sum(value * w), 6) AS decayed_value,
           round(sum(w), 6) AS decayed_count
         FROM w GROUP BY user_id ORDER BY user_id""",
    "q27_tumbling_hourly" ->
      s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $HourNs AS window_start_ns,
          event_type, count(*) AS n, round(sum(value), 2) AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY window_start_ns, event_type""",
    "q93_json_props" ->
      """SELECT event_type, count(*) AS n,
           CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
           count(CASE WHEN CAST(props->>'k' AS BIGINT) > 50 THEN 1 END) AS n_big
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q92_hopping_halfhour" ->
      s"""SELECT window_start_ns, event_type, count(*) AS n,
            round(sum(value), 2) AS sum_value
          FROM (
            SELECT unnest(generate_series(
                tns - tns % ${HourNs / 2} - ${HourNs - HourNs / 2},
                tns - tns % ${HourNs / 2}, ${HourNs / 2})) AS window_start_ns,
              event_type, value
            FROM (SELECT epoch_ns(ts) AS tns, event_type, value FROM events))
          GROUP BY 1, 2 ORDER BY window_start_ns, event_type""",
    // CAST AS BIGINT: session_id comes from sum(is_new) OVER ..., which
    // DuckDB types HUGEINT (int128); the driver's hash bridge canonicalizes
    // HUGEINT differently from BIGINT even when values are equal.
    "q28_sessionize" ->
      s"""SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
          FROM (
            SELECT user_id,
              sum(is_new) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
              SELECT user_id, ts,
                CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) > $GapNs
                     OR lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS is_new
              FROM events))
          GROUP BY user_id ORDER BY user_id""",
    "q29_asof_purchase_view" ->
      """SELECT p.user_id AS user_id, p.event_id AS event_id,
          v.asof_ts_us, round(v.asof_value, 2) AS view_value
          FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
          LEFT JOIN LATERAL (
            SELECT epoch_us(ts) AS asof_ts_us, value AS asof_value
            FROM events v
            WHERE v.event_type = 'view' AND v.user_id = p.user_id
              AND v.ts <= p.ts
            ORDER BY v.ts DESC LIMIT 1) v ON TRUE
          ORDER BY user_id, event_id""",
    "q30_top_users" ->
      """SELECT user_id, count(*) AS n, round(sum(value), 2) AS sum_value
          FROM events GROUP BY user_id
          ORDER BY n DESC, user_id ASC LIMIT 10""",
    // batch replay of the streaming recurrence through the running-min
    // identity S_i = P_i − min(0, min_{j≤i} P_j); per-key gap-filled
    // grid over the key's own observed span
    "q202_stream_cusum" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // ${6 * HourNs} AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (SELECT k, min(w) AS w0, max(w) AS w1 FROM c GROUP BY 1),
          grid AS (
            SELECT b.k, u.w FROM b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          p AS (
            SELECT k, w, n,
              sum(n - 3.0) OVER (PARTITION BY k ORDER BY w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
            FROM f),
          m AS (
            SELECT *,
              least(min(pre) OVER (PARTITION BY k ORDER BY w
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS mn
            FROM p)
         SELECT k AS event_type, w * ${6 * HourNs} AS window_start_ns,
           CAST(n AS BIGINT) AS n,
           round(pre - mn, 6) AS s_plus,
           (pre - mn) > 20.0 AS alert
         FROM m ORDER BY event_type, window_start_ns""",
    // integer dot products and norms; one ratio at the end
    "q214_item_item_cosine" ->
      """WITH c AS (
            SELECT user_id AS b, event_type AS i, CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2),
          norms AS (SELECT i, CAST(sum(c * c) AS BIGINT) AS n2 FROM c GROUP BY 1),
          p AS (
            SELECT a.i AS item_a, b2.i AS item_b,
              CAST(sum(a.c * b2.c) AS BIGINT) AS dot,
              CAST(count(*) AS BIGINT) AS n_co
            FROM c a JOIN c b2 ON a.b = b2.b AND a.i < b2.i
            GROUP BY 1, 2)
         SELECT p.item_a, p.item_b, p.n_co,
           round(p.dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)), 6)
             AS cosine
         FROM p
         JOIN norms na ON na.i = p.item_a
         JOIN norms nb ON nb.i = p.item_b
         ORDER BY item_a, item_b""",
    // exact counts; the sketch certification is the engine's claim —
    // the oracle pins the exact fields and expects hll_ok = true
    "q215_hll_overlap" ->
      """WITH dv AS (SELECT DISTINCT event_type AS g, user_id AS v FROM events),
          n AS (SELECT g, CAST(count(*) AS BIGINT) AS nd FROM dv GROUP BY 1),
          inter AS (
            SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS ni
            FROM dv a JOIN dv b ON a.v = b.v AND a.g < b.g
            GROUP BY 1, 2)
         SELECT na.g AS group_a, nb.g AS group_b,
           na.nd AS n_a, nb.nd AS n_b,
           na.nd + nb.nd - coalesce(i.ni, 0) AS n_union,
           coalesce(i.ni, 0) AS n_inter,
           true AS hll_ok
         FROM n na JOIN n nb ON na.g < nb.g
         LEFT JOIN inter i ON i.ga = na.g AND i.gb = nb.g
         ORDER BY group_a, group_b""",
    // same ignore-nulls last-touch window
    "q216_last_touch" ->
      """WITH cr AS (
            SELECT event_type,
              last_value(CASE WHEN event_type <> 'purchase'
                THEN event_type END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS credit
            FROM events),
          att AS (
            SELECT credit AS event_type, CAST(count(*) AS BIGINT)
              AS n_conversions
            FROM cr WHERE event_type = 'purchase' AND credit IS NOT NULL
            GROUP BY 1),
          t AS (SELECT CAST(sum(n_conversions) AS BIGINT) AS tot FROM att)
         SELECT event_type, n_conversions,
           round(n_conversions::DOUBLE / t.tot, 6) AS share
         FROM att CROSS JOIN t ORDER BY event_type""",
    // integer conversion counts; identical pooled-variance expression
    "q211_ab_test" ->
      """WITH pu AS (
            SELECT user_id,
              max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
              max(CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                % 2 = 0 THEN 1 ELSE 0 END) AS a
            FROM events GROUP BY 1),
          g AS (
            SELECT
              CAST(sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN a = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
              CAST(sum(CASE WHEN a = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
            FROM pu),
          z AS (
            SELECT *,
              conv_a::DOUBLE / n_a AS pa, conv_b::DOUBLE / n_b AS pb,
              (conv_a + conv_b)::DOUBLE / (n_a + n_b) AS pp
            FROM g)
         SELECT n_a, n_b, conv_a, conv_b,
           round(pa, 6) AS p_a, round(pb, 6) AS p_b,
           round(CASE WHEN n_a > 0 AND n_b > 0 AND
               sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)) > 0
             THEN (pa - pb) / sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b))
             ELSE 0 END, 6) AS z
         FROM z""",
    // S and 18·Var are integers; continuity-corrected z
    "q212_mann_kendall" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // ${24 * HourNs} AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // ${24 * HourNs}) AS w0,
              max(epoch_ns(ts) // ${24 * HourNs}) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w AS t, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          pr AS (
            SELECT a.k,
              CASE WHEN b2.n > a.n THEN 1 WHEN b2.n < a.n THEN -1
                ELSE 0 END AS sg
            FROM f a JOIN f b2 ON a.k = b2.k AND a.t < b2.t),
          s AS (SELECT k, CAST(sum(sg) AS BIGINT) AS s FROM pr GROUP BY 1),
          tg AS (SELECT k, n, CAST(count(*) AS BIGINT) AS t FROM f GROUP BY 1, 2),
          ties AS (
            SELECT k,
              CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt,
              CAST(sum(t) AS BIGINT) AS w
            FROM tg GROUP BY 1),
          v AS (
            SELECT s.k, s.s, ties.w,
              ties.w * (ties.w - 1) * (2 * ties.w + 5) - ties.tt AS var18
            FROM s JOIN ties USING (k))
         SELECT k AS event_type, w AS n_windows, s,
           round(CASE WHEN var18 > 0
             THEN (s - sign(s))::DOUBLE / sqrt(var18::DOUBLE / 18)
             ELSE 0 END, 6) AS z
         FROM v ORDER BY event_type""",
    // exact median (two central order statistics) of pairwise slopes
    "q213_theil_sen" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // ${24 * HourNs} AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // ${24 * HourNs}) AS w0,
              max(epoch_ns(ts) // ${24 * HourNs}) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w - (SELECT w0 FROM b) AS t, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          sl AS (
            SELECT a.k, (b2.n - a.n)::DOUBLE / (b2.t - a.t) AS s,
              a.t AS i, b2.t AS j
            FROM f a JOIN f b2 ON a.k = b2.k AND a.t < b2.t),
          r AS (
            SELECT k, s,
              row_number() OVER (PARTITION BY k ORDER BY s, i, j) AS rn
            FROM sl),
          m AS (SELECT k, CAST(count(*) AS BIGINT) AS n_pairs FROM r GROUP BY 1)
         SELECT r.k AS event_type, m.n_pairs, round(avg(r.s), 8) AS slope
         FROM r JOIN m USING (k)
         WHERE rn = (n_pairs + 1) // 2 OR rn = (n_pairs + 2) // 2
         GROUP BY 1, 2 ORDER BY event_type""",
    // at-risk from the exclusive cumulative; survival via exp-sum-ln
    // with an explicit extinction flag (ln(0) is NULL in Spark, an
    // error here — neither engine takes the log at d = risk)
    "q205_kaplan_meier" -> {
      val D = 24 * HourNs
      s"""WITH pu AS (
            SELECT user_id, min(epoch_ns(ts)) AS f,
              min(CASE WHEN event_type = 'purchase'
                THEN epoch_ns(ts) END) AS hit
            FROM events GROUP BY 1),
          e AS (SELECT max(epoch_ns(ts)) AS endts FROM events),
          lives AS (
            SELECT (coalesce(hit, e.endts) - f) // $D AS life,
              hit IS NULL AS cens
            FROM pu CROSS JOIN e),
          c AS (
            SELECT life,
              CAST(sum(CASE WHEN cens THEN 0 ELSE 1 END) AS BIGINT) AS d,
              CAST(count(*) AS BIGINT) AS cc
            FROM lives GROUP BY 1),
          t AS (SELECT CAST(sum(cc) AS BIGINT) AS n FROM c),
          r AS (
            SELECT c.life, c.d, c.cc,
              t.n - coalesce(sum(cc) OVER (ORDER BY life
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS risk
            FROM c CROSS JOIN t),
          s AS (
            SELECT *,
              sum(CASE WHEN d > 0 AND d < risk
                THEN ln(1 - d::DOUBLE / risk) ELSE 0 END)
                OVER (ORDER BY life
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnS,
              max(CASE WHEN d = risk THEN 1 ELSE 0 END)
                OVER (ORDER BY life
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
            FROM r)
         SELECT life AS duration, CAST(risk AS BIGINT) AS n_at_risk,
           d AS n_events,
           CASE WHEN dead = 1 THEN 0.0 ELSE round(exp(lnS), 6) END AS survival
         FROM s WHERE d > 0 ORDER BY duration"""
    },
    // same z-score → PAA → quartile-breakpoint letters → lead-window
    // sliding words
    "q206_sax_motifs" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w, b.w0 FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w - g.w0 AS t, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          mo AS (
            SELECT k, CAST(sum(n) AS BIGINT) AS S,
              CAST(sum(n * n) AS BIGINT) AS S2, count(*) AS N
            FROM f GROUP BY 1),
          m2 AS (
            SELECT k, S::DOUBLE / N AS mu,
              S2::DOUBLE / N - (S::DOUBLE / N) * (S::DOUBLE / N) AS var
            FROM mo),
          fr AS (
            SELECT k, t // 4 AS fidx,
              CAST(sum(n) AS BIGINT) AS fs, count(*) AS fc
            FROM f GROUP BY 1, 2),
          lt AS (
            SELECT zz.k, zz.fidx,
              CASE
                WHEN z < -0.6744897501960817 THEN 'a'
                WHEN z < 0 THEN 'b'
                WHEN z < 0.6744897501960817 THEN 'c'
                ELSE 'd' END AS l
            FROM (
              SELECT fr.k, fr.fidx,
                (fr.fs::DOUBLE / fr.fc - m2.mu)
                  / (CASE WHEN m2.var > 0 THEN sqrt(m2.var) ELSE 1 END) AS z
              FROM fr JOIN m2 USING (k)) zz),
          words AS (
            SELECT k,
              l || lead(l, 1) OVER (PARTITION BY k ORDER BY fidx)
                || lead(l, 2) OVER (PARTITION BY k ORDER BY fidx) AS motif
            FROM lt)
         SELECT k AS event_type, motif, CAST(count(*) AS BIGINT) AS n
         FROM words WHERE length(motif) = 3
         GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY event_type, motif""",
    // η² from pure integer sums: (Σ_h s²/c − S²/N)/(ΣX² − S²/N)
    "q207_seasonality_strength" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w % 24 AS h, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          byh AS (
            SELECT k, h, CAST(sum(n) AS BIGINT) AS s, count(*) AS cc
            FROM f GROUP BY 1, 2),
          byk AS (
            SELECT k, CAST(sum(n) AS BIGINT) AS S,
              CAST(sum(n * n) AS BIGINT) AS S2,
              CAST(count(*) AS BIGINT) AS N
            FROM f GROUP BY 1),
          bw AS (
            SELECT k, sum(s::DOUBLE * s / cc) AS btw FROM byh GROUP BY 1)
         SELECT byk.k AS event_type, byk.N AS n_windows,
           round(CASE WHEN S2::DOUBLE - S::DOUBLE * S / N > 0
             THEN (bw.btw - S::DOUBLE * S / N)
               / (S2::DOUBLE - S::DOUBLE * S / N)
             ELSE 0 END, 6) AS strength
         FROM byk JOIN bw USING (k) ORDER BY event_type""",
    // identical seeded inverse-CDF geometric draws (α = e^−0.5)
    "q200_dp_noisy_counts" ->
      """WITH c AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1),
          u AS (
            SELECT event_type, n,
              (('0x' || substr(md5('1:' || event_type), 1, 15))::BIGINT
                % 1000000 + 0.5) / 1000000.0 AS u1,
              (('0x' || substr(md5('2:' || event_type), 1, 15))::BIGINT
                % 1000000 + 0.5) / 1000000.0 AS u2
            FROM c)
         SELECT event_type, n,
           CAST(floor(ln(u1) / (-0.5)) - floor(ln(u2) / (-0.5)) AS BIGINT)
             AS noise,
           n + CAST(floor(ln(u1) / (-0.5)) - floor(ln(u2) / (-0.5)) AS BIGINT)
             AS noisy_n
         FROM u ORDER BY event_type""",
    // tie blocks collapse to one row per distinct count value; the
    // rank-weighted mass x·(m·cum_before + m(m+1)/2) keeps the whole
    // numerator integer — same closed form as the engine
    "q184_gini_users" ->
      """WITH bk AS (SELECT user_id, count(*) AS x FROM events GROUP BY 1),
          bc AS (SELECT x, count(*) AS m FROM bk GROUP BY 1),
          cb AS (
            SELECT x, m, coalesce(sum(m) OVER (ORDER BY x ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
            FROM bc),
          s AS (
            SELECT CAST(sum(m) AS BIGINT) AS n_keys,
              CAST(sum(x * m) AS BIGINT) AS total,
              CAST(sum(x * (m * c + (m * (m + 1)) // 2)) AS BIGINT) AS s1
            FROM cb)
         SELECT n_keys, total,
           round((2.0 * s1 - (n_keys + 1.0) * total)
             / (CAST(n_keys AS DOUBLE) * total), 6) AS gini
         FROM s""",
    // integer 8-sum aggregate, then the identical centered-u double
    // algebra (u = 2t−c makes Σu = Σu³ = 0 on the complete grid)
    "q187_quadratic_trend" ->
      s"""WITH c AS (
            SELECT event_type AS k, epoch_ns(ts) // $HourNs AS w,
              CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2),
          b AS (
            SELECT min(epoch_ns(ts) // $HourNs) AS w0,
              max(epoch_ns(ts) // $HourNs) AS w1
            FROM events),
          grid AS (
            SELECT k, u.w, b.w0 FROM (SELECT DISTINCT k FROM c)
            CROSS JOIN b, unnest(range(b.w0, b.w1 + 1)) AS u(w)),
          f AS (
            SELECT g.k, g.w - g.w0 AS t, coalesce(c.n, 0) AS n
            FROM grid g LEFT JOIN c USING (k, w)),
          a AS (
            SELECT k, count(*) AS nw,
              CAST(sum(t) AS BIGINT) AS st,
              CAST(sum(t * t) AS BIGINT) AS st2,
              CAST(sum(t * t * t) AS BIGINT) AS st3,
              CAST(sum(t * t * t * t) AS BIGINT) AS st4,
              CAST(sum(n) AS BIGINT) AS t0,
              CAST(sum(t * n) AS BIGINT) AS t1,
              CAST(sum(t * t * n) AS BIGINT) AS t2
            FROM f GROUP BY k),
          d1 AS (
            SELECT k, nw, t0,
              CAST(nw AS DOUBLE) AS w, CAST(nw AS DOUBLE) - 1 AS cc,
              CAST(st AS DOUBLE) AS s1, CAST(st2 AS DOUBLE) AS s2,
              CAST(st3 AS DOUBLE) AS s3, CAST(st4 AS DOUBLE) AS s4,
              CAST(t0 AS DOUBLE) AS y0, CAST(t1 AS DOUBLE) AS y1,
              CAST(t2 AS DOUBLE) AS y2
            FROM a),
          d2 AS (
            SELECT *,
              4 * s2 - 4 * cc * s1 + cc * cc * w AS s2u,
              16 * s4 - 32 * cc * s3 + 24 * cc * cc * s2
                - 8 * cc * cc * cc * s1 + cc * cc * cc * cc * w AS s4u,
              2 * y1 - cc * y0 AS t1u,
              4 * y2 - 4 * cc * y1 + cc * cc * y0 AS t2u
            FROM d1),
          d3 AS (
            SELECT *,
              CASE WHEN w * s4u - s2u * s2u > 0
                THEN (w * t2u - s2u * y0) / (w * s4u - s2u * s2u)
                ELSE 0 END AS a2u,
              CASE WHEN s2u > 0 THEN t1u / s2u ELSE 0 END AS a1u
            FROM d2),
          d4 AS (SELECT *, (y0 - a2u * s2u) / w AS a0u FROM d3)
         SELECT k AS event_type, nw AS n_windows, t0 AS total,
           round(a0u - a1u * cc + a2u * cc * cc, 6) AS a0,
           round(2 * a1u - 4 * a2u * cc, 8) AS a1,
           round(4 * a2u, 8) AS a2
         FROM d4 ORDER BY event_type""",
    // same md5-parity user split, same majority model (ties →
    // lexicographic min), pure integer accuracy counts
    "q191_next_event_eval" ->
      """WITH p AS (
            SELECT user_id, event_type AS cur,
              lead(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS nxt
            FROM events),
          pairs AS (
            SELECT user_id, cur, nxt,
              ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                % 2 = 0 AS train
            FROM p WHERE nxt IS NOT NULL),
          model AS (
            SELECT cur, nxt AS pred FROM (
              SELECT cur, nxt, row_number() OVER (PARTITION BY cur
                ORDER BY count(*) DESC, nxt ASC) AS rn
              FROM pairs WHERE train GROUP BY cur, nxt)
            WHERE rn = 1),
          test AS (SELECT cur, nxt FROM pairs WHERE NOT train)
         SELECT t.cur AS from_type, min(m.pred) AS predicted,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct,
           round(sum(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS accuracy
         FROM test t LEFT JOIN model m ON m.cur = t.cur
         GROUP BY 1 ORDER BY 1""",
    // a-priori level-3 replay: frequent items → (basket, frequent
    // pair) rows → third-item extension → triple counts; 3-way lift
    // against full independence
    "q188_triple_lift" ->
      """WITH r AS (SELECT DISTINCT user_id AS b, event_type AS i FROM events),
          itemn AS (
            SELECT i, CAST(count(*) AS BIGINT) AS n FROM r
            GROUP BY 1 HAVING count(*) >= 2),
          tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM r),
          freq AS (SELECT r.b, r.i FROM r JOIN itemn USING (i)),
          pairs AS (
            SELECT a.b, a.i AS ia, b2.i AS ib
            FROM freq a JOIN freq b2 ON a.b = b2.b AND a.i < b2.i),
          pairn AS (
            SELECT ia, ib FROM pairs GROUP BY 1, 2 HAVING count(*) >= 2),
          tri AS (
            SELECT p.ia, p.ib, f.i AS ic, CAST(count(*) AS BIGINT) AS n_abc
            FROM pairs p
            JOIN pairn USING (ia, ib)
            JOIN freq f ON f.b = p.b AND f.i > p.ib
            GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         SELECT t.ia AS item_a, t.ib AS item_b, t.ic AS item_c,
           na.n AS n_a, nb2.n AS n_b, nc.n AS n_c, t.n_abc,
           round(t.n_abc / CAST(tot.nb AS DOUBLE), 6) AS support,
           round(CAST(t.n_abc AS DOUBLE) * tot.nb * tot.nb
             / (CAST(na.n AS DOUBLE) * nb2.n * nc.n), 6) AS lift
         FROM tri t
         JOIN itemn na ON na.i = t.ia
         JOIN itemn nb2 ON nb2.i = t.ib
         JOIN itemn nc ON nc.i = t.ic
         CROSS JOIN tot
         ORDER BY item_a, item_b, item_c""",
    // chained per-stage minima as CTEs: t_i = earliest stage-i event
    // strictly after t_{i-1} and within the horizon of t_1 — the same
    // recurrence the engine's window chain computes
    "q120_funnel" -> {
      val h = 7L * 24 * HourNs
      s"""WITH t1 AS (
            SELECT user_id, min(epoch_ns(ts)) AS t1 FROM events
            WHERE event_type = 'view' GROUP BY user_id),
          t2 AS (
            SELECT e.user_id, min(epoch_ns(e.ts)) AS t2
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'click' AND epoch_ns(e.ts) > t1.t1
              AND epoch_ns(e.ts) - t1.t1 <= $h
            GROUP BY e.user_id),
          t3 AS (
            SELECT e.user_id, min(epoch_ns(e.ts)) AS t3
            FROM events e JOIN t2 ON e.user_id = t2.user_id
            JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) > t2.t2
              AND epoch_ns(e.ts) - t1.t1 <= $h
            GROUP BY e.user_id),
          n AS (SELECT (SELECT count(*) FROM t1) AS n1,
                       (SELECT count(*) FROM t2) AS n2,
                       (SELECT count(*) FROM t3) AS n3)
          SELECT * FROM (
            SELECT 1 AS stage_idx, 'view' AS stage, n1 AS n_users,
              round(CAST(n1 AS DOUBLE) / n1, 4) AS conversion FROM n
            UNION ALL SELECT 2, 'click', n2,
              round(CAST(n2 AS DOUBLE) / n1, 4) FROM n
            UNION ALL SELECT 3, 'purchase', n3,
              round(CAST(n3 AS DOUBLE) / n1, 4) FROM n)
          ORDER BY stage_idx""" },
    "q121_cohort_retention" -> {
      val w = 7L * 24 * HourNs
      s"""WITH f AS (
            SELECT user_id, min(epoch_ns(ts)) AS first_ns
            FROM events GROUP BY user_id),
          cells AS (
            SELECT DISTINCT e.user_id,
              f.first_ns - f.first_ns % $w AS cohort_start_ns,
              ((epoch_ns(e.ts) - epoch_ns(e.ts) % $w) -
               (f.first_ns - f.first_ns % $w)) // $w AS period_offset
            FROM events e JOIN f ON e.user_id = f.user_id)
          SELECT cohort_start_ns, CAST(period_offset AS BIGINT) AS period_offset,
            count(*) AS n_users
          FROM cells GROUP BY 1, 2 ORDER BY 1, 2""" },
    "q122_transitions" ->
      """WITH seq AS (
           SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS to_type
           FROM events),
         agg AS (
           SELECT from_type, to_type, count(*) AS n FROM seq
           WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6) AS prob
         FROM agg ORDER BY from_type, to_type""",
    "q49_stream_tumbling" ->
      s"""SELECT epoch_ns(ts) - epoch_ns(ts) % $HourNs AS window_start_ns,
          event_type, count(*) AS n, round(sum(value), 2) AS sum_value
          FROM events GROUP BY 1, 2 ORDER BY window_start_ns, event_type""",
    "q50_stream_sessionize" ->
      s"""SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
          FROM (
            SELECT user_id,
              sum(is_new) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
              SELECT user_id, ts,
                CASE WHEN epoch_ns(ts) - lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) > $GapNs
                     OR lag(epoch_ns(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) IS NULL
                     THEN 1 ELSE 0 END AS is_new
              FROM events))
          GROUP BY user_id ORDER BY user_id""",
    // the streamed union injected duplicates for event_id % 7 = 0; the
    // deduped output must equal the source's distinct rows exactly
    "q67_stream_dedup" ->
      """SELECT event_type, count(*) AS n,
            CAST(sum(event_id) AS BIGINT) AS sum_ids
         FROM events GROUP BY event_type ORDER BY event_type""",
    // µs-grain comparisons on both sides: the engine's watermark
    // columns are ns-to-µs truncated timestamps, so the oracle must
    // compare epoch_us, not raw ns timestamps
    "q98_stream_join" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
            p.user_id AS user_id,
            epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
         FROM events p JOIN events v
           ON p.event_type = 'purchase' AND v.event_type = 'view'
          AND p.user_id = v.user_id
          AND epoch_us(v.ts) >= epoch_us(p.ts) - 86400000000
          AND epoch_us(v.ts) < epoch_us(p.ts)
         ORDER BY purchase_id, view_id""",
    // the streaming left-outer result (with the watermark flushed
    // past every event) must equal the plain batch left join
    // native session_window ≡ batch gaps-and-islands (break at Δt ≥
    // gap; end = last event + gap)
    "q320_stream_session_window" ->
      """WITH e AS (
            SELECT user_id, epoch_us(ts) AS t, value FROM events),
          m AS (
            SELECT user_id, t, value,
              CASE WHEN lag(t) OVER w IS NULL
                     OR t - lag(t) OVER w >= 1800000000 THEN 1
                   ELSE 0 END AS brk
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
          s AS (
            SELECT user_id, t, value,
              CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY t
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
            FROM m)
         SELECT user_id, min(t) AS session_start_us,
           max(t) + 1800000000 AS session_end_us,
           count(*) AS n, round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, sid
         ORDER BY user_id, session_start_us""",
    // journeys (truncate at first purchase) → 1e-6-grid transition
    // matrix → 16-round integer absorption fixed-point, unrolled once
    // for the full chain and once per removed channel — every
    // accumulation is HUGEINT, the re-grid is integer division, and
    // only the final ratios touch doubles
    "q353_markov_attribution" -> {
      val chans = Seq("click", "error", "signup", "view")
      def rounds(tag: String, excl: Option[String]): String = {
        val exclCond = excl.map(c => s" AND p.t2 <> '$c'").getOrElse("")
        val base =
          s"""r${tag}0 AS (SELECT s, CAST(0 AS HUGEINT) AS v FROM states)"""
        val steps = (1 to 16).map { k =>
          s"""r$tag$k AS MATERIALIZED (
              SELECT st.s,
                (coalesce(sum(CASE
                    WHEN p.t2 = '__CONV__'
                      THEN CAST(p.p6 AS HUGEINT) * 1000000000000
                    WHEN p.t2 <> '__NULL__'
                      THEN CAST(p.p6 AS HUGEINT) * coalesce(pr.v, 0)
                    END), 0) + 500000) // 1000000 AS v
              FROM states st
              LEFT JOIN p ON p.f = st.s$exclCond
              LEFT JOIN r$tag${k - 1} pr ON pr.s = p.t2
              GROUP BY st.s)"""
        }
        (base +: steps).mkString(",\n          ")
      }
      val variants = chans.zipWithIndex
        .map { case (c, i) => rounds(s"x$i", Some(c)) }
        .mkString(",\n          ")
      val finalRows = chans.zipWithIndex.map { case (c, i) =>
        s"""SELECT '$c' AS channel,
              CAST(f.v AS DOUBLE) / 1e12 AS p_conv,
              CAST(r.v AS DOUBLE) / 1e12 AS p_conv_removed,
              CASE WHEN f.v > 0 THEN
                floor((1 - CAST(r.v AS DOUBLE) / CAST(f.v AS DOUBLE))
                  * 1e6 + 0.5) / 1e6 END AS removal_effect
            FROM rf16 f, rx${i}16 r
            WHERE f.s = '__START__' AND r.s = '__START__'"""
      }.mkString(" UNION ALL ")
      s"""WITH base AS (
            SELECT user_id AS u, event_type AS e,
              row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
          fp AS (
            SELECT u, e, rn,
              min(CASE WHEN e = 'purchase' THEN rn END)
                OVER (PARTITION BY u) AS fprn
            FROM base),
          kept AS (
            SELECT u, e, rn, fprn IS NOT NULL AS conv,
              row_number() OVER (PARTITION BY u ORDER BY rn) AS kr,
              lead(e) OVER (PARTITION BY u ORDER BY rn) AS nxt
            FROM fp
            WHERE e <> 'purchase' AND (fprn IS NULL OR rn < fprn)),
          trans AS (
            SELECT '__START__' AS f, e AS t2 FROM kept WHERE kr = 1
            UNION ALL SELECT e, nxt FROM kept WHERE nxt IS NOT NULL
            UNION ALL SELECT e,
              CASE WHEN conv THEN '__CONV__' ELSE '__NULL__' END
            FROM kept WHERE nxt IS NULL
            UNION ALL SELECT '__START__', '__CONV__' FROM (
              SELECT u,
                max(CASE WHEN e = 'purchase' THEN 1 ELSE 0 END) AS c,
                max(CASE WHEN e <> 'purchase'
                  AND (fprn IS NULL OR rn < fprn) THEN 1 ELSE 0 END) AS k
              FROM fp GROUP BY u) WHERE c = 1 AND k = 0),
          cnt AS (SELECT f, t2, count(*) AS n FROM trans GROUP BY 1, 2),
          p AS MATERIALIZED (
            SELECT f, t2,
              CAST(floor(CAST(n AS DOUBLE)
                / sum(n) OVER (PARTITION BY f) * 1e6 + 0.5) AS BIGINT)
                AS p6
            FROM cnt),
          states AS (SELECT unnest(['__START__', 'click', 'error',
            'signup', 'view']) AS s),
          ${rounds("f", None)},
          $variants
         SELECT * FROM ($finalRows) ORDER BY channel"""
    },
    // journey touch-set bitmasks (click=1, error=2, signup=4, view=8 —
    // the operator's sorted-channel order), v(S) = conversions with
    // mask ⊆ S via containment join, factorial weights as integer
    // literals (n = 4: |S|!·(3−|S|)! ∈ {6,2,2,6}), phi exact integer
    "q354_shapley_attribution" ->
      """WITH base AS (
            SELECT user_id AS u, event_type AS e,
              row_number() OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS rn
            FROM events),
          fp AS (
            SELECT u, e, rn,
              min(CASE WHEN e = 'purchase' THEN rn END)
                OVER (PARTITION BY u) AS fprn
            FROM base),
          journeys AS (
            SELECT u,
              max(CASE WHEN e = 'click'
                AND (fprn IS NULL OR rn < fprn) THEN 1 ELSE 0 END)
              + 2 * max(CASE WHEN e = 'error'
                AND (fprn IS NULL OR rn < fprn) THEN 1 ELSE 0 END)
              + 4 * max(CASE WHEN e = 'signup'
                AND (fprn IS NULL OR rn < fprn) THEN 1 ELSE 0 END)
              + 8 * max(CASE WHEN e = 'view'
                AND (fprn IS NULL OR rn < fprn) THEN 1 ELSE 0 END)
                AS mask,
              max(CASE WHEN e = 'purchase' THEN 1 ELSE 0 END) AS conv
            FROM fp GROUP BY u),
          perMask AS (
            SELECT mask, count(*) AS n, CAST(sum(conv) AS BIGINT) AS nc
            FROM journeys GROUP BY mask),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS J FROM perMask),
          subsets AS (SELECT unnest(generate_series(0, 15)) AS s),
          vs AS (
            SELECT s.s, CAST(coalesce(sum(pm.nc), 0) AS BIGINT) AS v
            FROM subsets s LEFT JOIN perMask pm
              ON (pm.mask & s.s) = pm.mask
            GROUP BY s.s),
          ch(channel, bit) AS (VALUES
            ('click', 1), ('error', 2), ('signup', 4), ('view', 8)),
          pairs AS (
            SELECT ch.channel, ch.bit, s.s,
              CASE bit_count(s.s) WHEN 0 THEN 6 WHEN 1 THEN 2
                WHEN 2 THEN 2 ELSE 6 END AS wgt
            FROM ch JOIN subsets s ON (s.s & ch.bit) = 0),
          phi AS (
            SELECT p.channel,
              CAST(sum(p.wgt * (va.v - vb.v)) AS BIGINT) AS phi_scaled
            FROM pairs p
            JOIN vs va ON va.s = (p.s | p.bit)
            JOIN vs vb ON vb.s = p.s
            GROUP BY p.channel)
         SELECT channel, J AS n_journeys, phi_scaled,
           CASE WHEN J > 0 THEN
             floor(CAST(phi_scaled AS DOUBLE) / 24 / J * 1e6 + 0.5) / 1e6
           END AS shapley
         FROM phi, tot ORDER BY channel""",
    // integer tie-high ranks over the distinct-cents grids, target
    // rank by integer ceil-division, pooled lookup via the reversed
    // rank-axis running last(IGNORE NULLS)
    "q355_quantile_normalize" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          gg AS (SELECT g, c, count(*) AS n_rows FROM base GROUP BY 1, 2),
          gr AS (
            SELECT g, c, n_rows,
              CAST(sum(n_rows) OVER (PARTITION BY g ORDER BY c
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS R
            FROM gg),
          tt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM base
            GROUP BY g),
          mm AS (SELECT CAST(count(*) AS BIGINT) AS M FROM base),
          tgt AS (
            SELECT gr.g, gr.c, gr.n_rows,
              (gr.R * mm.M + tt.n - 1) // tt.n AS k
            FROM gr JOIN tt USING (g) CROSS JOIN mm),
          pg AS (SELECT c, count(*) AS pc FROM base GROUP BY c),
          pp AS (
            SELECT c, CAST(sum(pc) OVER (ORDER BY c
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS P
            FROM pg),
          u AS (
            SELECT g, c, n_rows, k, CAST(NULL AS BIGINT) AS pv, 1 AS ord
            FROM tgt
            UNION ALL
            SELECT NULL, NULL, NULL, P, c, 0 FROM pp),
          nrm AS (
            SELECT *, last_value(pv IGNORE NULLS) OVER (
              ORDER BY k DESC, ord ASC ROWS UNBOUNDED PRECEDING) AS nc
            FROM u)
         SELECT g AS event_type, CAST(c AS DOUBLE) / 100 AS value,
           n_rows, CAST(nc AS DOUBLE) / 100 AS normalized
         FROM nrm WHERE g IS NOT NULL ORDER BY event_type, value""",
    // the TTL-dedup'd stream must equal the batch distinct — same
    // oracle as q67, proving the bounded-state form loses nothing
    "q349_stream_dedup_ttl" ->
      """SELECT event_type, count(*) AS n,
            CAST(sum(event_id) AS BIGINT) AS sum_ids
         FROM events GROUP BY event_type ORDER BY event_type""",
    // vᵀP power iteration unrolled 12 rounds: 1e-6-grid P, 1e-12-grid
    // v, HUGEINT product sums, L1 renormalize per round — the grmPca
    // integer-grid pattern on a row-stochastic matrix
    "q351_markov_stationary" -> {
      val rounds = 1 to 12
      val stages = rounds.map { r =>
        s"""w$r AS MATERIALIZED (
              SELECT tr.t AS s, CAST(sum(tr.p6 * v.v12) AS HUGEINT) AS w18
              FROM tr JOIN vr${r - 1} v ON v.s = tr.f GROUP BY tr.t),
            n$r AS MATERIALIZED (
              SELECT CAST(sum(w18) AS DOUBLE) AS tot FROM w$r),
            vr$r AS MATERIALIZED (
              SELECT w.s,
                CAST(CASE WHEN n.tot <= 0 THEN 0
                  ELSE floor(CAST(w.w18 AS DOUBLE) / n.tot * 1e12 + 0.5)
                  END AS BIGINT) AS v12
              FROM w$r w, n$r n)"""
      }.mkString(",\n          ")
      s"""WITH seq AS (
            SELECT user_id, event_type AS f,
              lead(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS t
            FROM events),
          pairs AS (SELECT f, t FROM seq WHERE t IS NOT NULL),
          states AS (SELECT DISTINCT f AS s FROM pairs),
          kept AS (SELECT p.f, p.t FROM pairs p JOIN states st
            ON st.s = p.t),
          cnt AS (SELECT f, t, count(*) AS n FROM kept GROUP BY 1, 2),
          tr AS (
            SELECT c.f, c.t,
              CAST(floor(CAST(c.n AS DOUBLE) / tt.tot * 1e6 + 0.5)
                AS BIGINT) AS p6
            FROM cnt c JOIN (SELECT f, CAST(sum(n) AS BIGINT) AS tot
              FROM cnt GROUP BY f) tt ON tt.f = c.f),
          vr0 AS (SELECT s, CAST(1000000000000 AS BIGINT) AS v12
            FROM states),
          $stages
         SELECT st.s AS state,
           CAST(coalesce(v.v12, 0) AS DOUBLE) / 1e12 AS stationary
         FROM states st LEFT JOIN vr12 v ON v.s = st.s
         ORDER BY state"""
    },
    // per-group integer moments (Σc in BIGINT, Σc² in HUGEINT), the
    // between-groups term pre-quantized to 1e-6 so its k-term sum is
    // order-free, F/η² on the 1e-4 floor grid
    "q344_anova_f" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          per AS (
            SELECT g, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
              CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
            FROM base GROUP BY g),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
              CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(s) AS BIGINT) AS gs,
              CAST(sum(q) AS HUGEINT) AS gq,
              CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n / 1e4 * 1e6
                + 0.5) AS BIGINT)) AS BIGINT) AS sb6
            FROM per),
          calc AS (
            SELECT k_groups, n,
              CAST(sb6 AS DOUBLE) / 1e6
                - CAST(gs AS DOUBLE) * gs / n / 1e4 AS ssb,
              CAST(gq AS DOUBLE) / 1e4
                - CAST(gs AS DOUBLE) * gs / n / 1e4 AS sst
            FROM roll)
         SELECT k_groups, n,
           floor(ssb * 1e4 + 0.5) / 1e4 AS ss_between,
           floor((sst - ssb) * 1e4 + 0.5) / 1e4 AS ss_within,
           CASE WHEN k_groups > 1 AND n > k_groups AND sst - ssb > 0 THEN
             floor((ssb / (k_groups - 1)) / ((sst - ssb) / (n - k_groups))
               * 1e4 + 0.5) / 1e4 END AS f_stat,
           CASE WHEN sst > 0 THEN floor(ssb / sst * 1e4 + 0.5) / 1e4 END
             AS eta_sq
         FROM calc""",
    // k-row self-join on the per-group integer moments; Welch t and
    // Satterthwaite df are identical double algebra, 1e-4 grid
    "q345_welch_t" ->
      """WITH per AS (
            SELECT g, count(*) AS n, CAST(sum(c) AS BIGINT) AS s,
              CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS q
            FROM (SELECT event_type AS g,
                    CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                  FROM events WHERE value IS NOT NULL)
            GROUP BY g HAVING count(*) >= 2),
          pairs AS (
            SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
              a.s AS sa, b.s AS sb2, a.q AS qa, b.q AS qb
            FROM per a JOIN per b ON a.g < b.g),
          calc AS (
            SELECT *,
              (CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * sa / n_a)
                / (n_a - 1) / 1e4 AS va,
              (CAST(qb AS DOUBLE) - CAST(sb2 AS DOUBLE) * sb2 / n_b)
                / (n_b - 1) / 1e4 AS vb
            FROM pairs),
          calc2 AS (
            SELECT *, va / n_a + vb / n_b AS sem,
              CAST(sa AS DOUBLE) / n_a / 100 AS ma,
              CAST(sb2 AS DOUBLE) / n_b / 100 AS mb
            FROM calc)
         SELECT group_a, group_b, n_a, n_b,
           CASE WHEN ma >= 0 THEN floor(ma * 1e4 + 0.5)
                ELSE -floor(-ma * 1e4 + 0.5) END / 1e4 AS mean_a,
           CASE WHEN mb >= 0 THEN floor(mb * 1e4 + 0.5)
                ELSE -floor(-mb * 1e4 + 0.5) END / 1e4 AS mean_b,
           CASE WHEN sem > 0 THEN
             CASE WHEN (ma - mb) / sqrt(sem) >= 0
               THEN floor((ma - mb) / sqrt(sem) * 1e4 + 0.5)
               ELSE -floor(-((ma - mb) / sqrt(sem)) * 1e4 + 0.5) END / 1e4
           END AS t_stat,
           CASE WHEN sem > 0 THEN
             floor(sem * sem / (va * va / n_a / n_a / (n_a - 1)
               + vb * vb / n_b / n_b / (n_b - 1)) * 1e4 + 0.5) / 1e4
           END AS df
         FROM calc2 ORDER BY group_a, group_b""",
    // trig factors are the operator's own 1e-12-grid literals
    // (Forecast.trigTable); per-day products quantize to 1e-6 integers
    // before the per-period sums
    "q346_periodogram" -> {
      val trigRows = graft.operators.Forecast
        .trigTable(Seq(2, 3, 5, 7, 10, 15), 31)
        .map { case (p, t, c, s) => s"($p, $t, $c, $s)" }
        .mkString(",\n            ")
      s"""WITH trig(period, t, c, s) AS (VALUES
            $trigRows),
          ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (
            SELECT CAST(d - (SELECT min(d) FROM ev) AS INT) AS t,
              count(*) AS y
            FROM ev GROUP BY d),
          joined AS (
            SELECT tr.period, c2.t, c2.y, tr.c, tr.s
            FROM cnts c2 JOIN trig tr ON tr.t = c2.t),
          sums AS (
            SELECT period, count(*) AS n_days,
              CAST(sum(CASE WHEN y * c >= 0
                THEN floor(y * c * 1e6 + 0.5)
                ELSE -floor(-(y * c) * 1e6 + 0.5) END) AS BIGINT) AS c6,
              CAST(sum(CASE WHEN y * s >= 0
                THEN floor(y * s * 1e6 + 0.5)
                ELSE -floor(-(y * s) * 1e6 + 0.5) END) AS BIGINT) AS s6
            FROM joined GROUP BY period),
          pw AS (
            SELECT period, n_days,
              (CAST(c6 AS DOUBLE) / 1e6) * (CAST(c6 AS DOUBLE) / 1e6)
              + (CAST(s6 AS DOUBLE) / 1e6) * (CAST(s6 AS DOUBLE) / 1e6)
                AS praw
            FROM sums),
          pp AS (
            SELECT period, n_days, floor(praw * 1e4 + 0.5) / 1e4 AS power,
              CAST(floor(praw * 1e6 + 0.5) AS BIGINT) AS p6
            FROM pw),
          tot AS (SELECT CAST(sum(p6) AS BIGINT) AS tv FROM pp)
         SELECT period, n_days, power,
           CASE WHEN tv > 0 THEN
             floor(CAST(p6 AS DOUBLE) / tv * 1e6 + 0.5) / 1e6 END
             AS power_share
         FROM pp, tot ORDER BY period"""
    },
    // SPRT replay: integer running (t, k) over the unique (ts, id)
    // order; the four ln constants are the OPERATOR's own 1e-12-grid
    // literals (Eval.sprtConstants) — no ln in either engine's path
    "q343_sprt" -> {
      val (c1, c0, a, b) =
        graft.operators.Eval.sprtConstants(0.15, 0.35, 0.05, 0.05)
      s"""WITH base AS (
            SELECT ('0x' || substr(md5('sprt:' || user_id), 1, 15))::BIGINT
                % 8 AS cohort,
              epoch_ns(ts) AS t0, event_id,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x
            FROM events),
          scored AS (
            SELECT cohort,
              row_number() OVER (PARTITION BY cohort
                ORDER BY t0, event_id) AS t,
              CAST(sum(x) OVER (PARTITION BY cohort ORDER BY t0, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS k
            FROM base),
          llrs AS (
            SELECT cohort, t, k,
              k * ($c1) + (t - k) * ($c0) AS llr
            FROM scored),
          crossed AS (
            SELECT cohort, min(t) AS t FROM llrs
            WHERE llr >= ($a) OR llr <= ($b) GROUP BY cohort),
          dec AS (
            SELECT l.cohort,
              CASE WHEN l.llr >= ($a) THEN 'accept_h1'
                   ELSE 'accept_h0' END AS decision,
              l.t, l.k, l.llr
            FROM crossed c JOIN llrs l
              ON l.cohort = c.cohort AND l.t = c.t),
          fin AS (
            SELECT l.cohort, 'continue' AS decision, l.t, l.k, l.llr
            FROM (SELECT cohort, max(t) AS t FROM llrs GROUP BY cohort) mx
            JOIN llrs l ON l.cohort = mx.cohort AND l.t = mx.t
            WHERE l.cohort NOT IN (SELECT cohort FROM crossed))
         SELECT cohort, decision, t AS n_at_decision, k AS k_at_decision,
           llr
         FROM (SELECT * FROM dec UNION ALL SELECT * FROM fin)
         ORDER BY cohort"""
    },
    // Holt recursion replayed as a recursive CTE over the zero-filled
    // day grid; dyadic α=β=1/2 over integer counts ⇒ exact doubles,
    // no output rounding needed
    "q334_holt_forecast" ->
      """WITH RECURSIVE ev AS (
            SELECT event_type, epoch_ns(ts) // 86400000000000 AS d
            FROM events),
          bounds AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          cnts AS (
            SELECT event_type, d, count(*) AS y FROM ev GROUP BY 1, 2),
          grid AS (
            SELECT k.event_type, b.d0 + u.i AS d
            FROM (SELECT DISTINCT event_type FROM ev) k, bounds b,
                 LATERAL (SELECT unnest(generate_series(0, b.d1 - b.d0))
                          AS i) u),
          series AS (
            SELECT g.event_type,
              row_number() OVER (PARTITION BY g.event_type ORDER BY g.d)
                AS t,
              CAST(coalesce(c.y, 0) AS DOUBLE) AS y
            FROM grid g LEFT JOIN cnts c
              ON c.event_type = g.event_type AND c.d = g.d),
          sm AS (
            SELECT event_type, t, y AS l, CAST(0 AS DOUBLE) AS b
            FROM series WHERE t = 1
            UNION ALL
            SELECT s.event_type, s.t,
              0.5 * s.y + 0.5 * (sm.l + sm.b),
              0.5 * ((0.5 * s.y + 0.5 * (sm.l + sm.b)) - sm.l)
                + 0.5 * sm.b
            FROM sm JOIN series s
              ON s.event_type = sm.event_type AND s.t = sm.t + 1),
          last AS (SELECT event_type, max(t) AS T FROM sm GROUP BY 1)
         SELECT sm.event_type, CAST(l2.T AS BIGINT) AS n_days,
           sm.l AS level, sm.b AS trend,
           sm.l + 1 * sm.b AS f1, sm.l + 3 * sm.b AS f3,
           sm.l + 7 * sm.b AS f7
         FROM sm JOIN last l2
           ON l2.event_type = sm.event_type AND sm.t = l2.T
         ORDER BY sm.event_type""",
    // interval-weighted cents·ms integer sums, floor-grid ratio
    "q333_twap" ->
      """WITH b AS (
            SELECT user_id, event_id, epoch_ns(ts) AS t,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          d AS (
            SELECT user_id, c,
              (lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                - t) // 1000000 AS dt
            FROM b)
         SELECT user_id, count(*) AS n_events,
           CASE WHEN CAST(sum(dt) AS BIGINT) > 0 THEN
             floor(CAST(CAST(sum(c * dt) AS BIGINT) AS DOUBLE)
               / CAST(sum(dt) AS BIGINT) / 100 * 1e4 + 0.5) / 1e4
           END AS twap
         FROM d GROUP BY user_id ORDER BY user_id""",
    // RANGE frame on the ns event-time key, CAST against HUGEINT
    "q328_rolling_range_window" ->
      """SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN 518400000000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS rolling_7d_cents
         FROM events
         ORDER BY user_id, ts_us, event_id""",
    // KW over the distinct-cents grid: 2·avg-rank integers, ordered
    // list_sum matches Spark's sorted sequential fold
    "q324_kruskal_wallis" ->
      """WITH b AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
            FROM events WHERE value IS NOT NULL),
          grid AS (SELECT x, count(*) AS t FROM b GROUP BY x),
          rk AS (SELECT x, t,
              2 * CAST(coalesce(sum(t) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) + t + 1 AS rank2
            FROM grid),
          cells AS (SELECT g, x, count(*) AS cnt FROM b GROUP BY g, x),
          pg AS (SELECT g, CAST(sum(cnt * rank2) AS BIGINT) AS rg2,
              CAST(sum(cnt) AS BIGINT) AS ng
            FROM cells JOIN rk USING (x) GROUP BY g),
          folded AS (SELECT CAST(count(*) AS BIGINT) AS k_groups,
              list_sum(list((rg2 / 2.0) * (rg2 / 2.0) / ng ORDER BY g))
                AS s
            FROM pg),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS N FROM b),
          ties AS (SELECT CAST(sum(t*t*t - t) AS BIGINT) AS ts FROM grid)
         SELECT k_groups, N AS n,
           floor((12.0 / (N * (N + 1.0)) * s - 3.0 * (N + 1.0)) * 1e4
             + 0.5) / 1e4 AS h,
           floor((1.0 - CAST(ts AS DOUBLE) / (N*N*N - N)) * 1e6 + 0.5)
             / 1e6 AS tie_correction,
           CASE WHEN 1.0 - CAST(ts AS DOUBLE) / (N*N*N - N) > 0 THEN
             floor((12.0 / (N * (N + 1.0)) * s - 3.0 * (N + 1.0))
               / (1.0 - CAST(ts AS DOUBLE) / (N*N*N - N)) * 1e4 + 0.5)
               / 1e4
           END AS h_adj
         FROM folded, nn, ties""",
    // IRLS Huber mean: integer cents, 1e-6-grid weights, three
    // unrolled fixed-point iterations, floor-grid output
    "q322_huber_mean" ->
      """WITH b AS (
            SELECT event_type,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
            FROM events WHERE value IS NOT NULL),
          a0 AS MATERIALIZED (
            SELECT event_type, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(x) AS BIGINT) * 1.0 / count(*) AS mu
            FROM b GROUP BY event_type),
          it1 AS MATERIALIZED (
            SELECT event_type,
              CAST(sum(w * x) AS BIGINT) * 1.0
                / CAST(sum(w) AS BIGINT) AS mu
            FROM (
              SELECT b.event_type, b.x,
                CASE WHEN abs(b.x - p.mu) <= 2000.0 THEN 1000000
                     ELSE CAST(floor(2000.0 * 1e6 / abs(b.x - p.mu) + 0.5)
                       AS BIGINT) END AS w
              FROM b JOIN a0 p USING (event_type))
            GROUP BY event_type),
          it2 AS MATERIALIZED (
            SELECT event_type,
              CAST(sum(w * x) AS BIGINT) * 1.0
                / CAST(sum(w) AS BIGINT) AS mu
            FROM (
              SELECT b.event_type, b.x,
                CASE WHEN abs(b.x - p.mu) <= 2000.0 THEN 1000000
                     ELSE CAST(floor(2000.0 * 1e6 / abs(b.x - p.mu) + 0.5)
                       AS BIGINT) END AS w
              FROM b JOIN it1 p USING (event_type))
            GROUP BY event_type),
          it3 AS MATERIALIZED (
            SELECT event_type,
              CAST(sum(w * x) AS BIGINT) * 1.0
                / CAST(sum(w) AS BIGINT) AS mu
            FROM (
              SELECT b.event_type, b.x,
                CASE WHEN abs(b.x - p.mu) <= 2000.0 THEN 1000000
                     ELSE CAST(floor(2000.0 * 1e6 / abs(b.x - p.mu) + 0.5)
                       AS BIGINT) END AS w
              FROM b JOIN it2 p USING (event_type))
            GROUP BY event_type)
         SELECT a0.event_type, a0.n,
           floor(a0.sx * 100.0 / a0.n + 0.5) / 1e4 AS mean,
           floor(it3.mu * 100.0 + 0.5) / 1e4 AS huber_mean
         FROM a0 JOIN it3 USING (event_type)
         ORDER BY event_type""",
    // stream-static join ≡ the batch join once all data is processed
    "q318_stream_static_enrich" ->
      """WITH dim AS (
            SELECT user_id,
              CASE WHEN s >= 500 THEN 'high'
                   WHEN s >= 100 THEN 'mid'
                   ELSE 'low' END AS tier
            FROM (SELECT user_id,
                    sum(CASE WHEN event_type = 'purchase' THEN value
                        ELSE CAST(0 AS DOUBLE) END) AS s
                  FROM events GROUP BY user_id))
         SELECT d.tier, e.event_type, count(*) AS n,
           round(sum(e.value), 2) AS sum_value
         FROM events e JOIN dim d USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q311_stream_outer_join" ->
      """SELECT p.event_id AS purchase_id, v.event_id AS view_id,
            p.user_id AS user_id,
            epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id
          AND epoch_us(v.ts) >= epoch_us(p.ts) - 86400000000
          AND epoch_us(v.ts) < epoch_us(p.ts)
         ORDER BY purchase_id, view_id""",
    // hypergeometric ratio recurrence on the 1e-6 ln grid (no
    // factorials of n); weights 1e-12-quantized pre-sum; "no
    // likelier" compares exact grid integers
    "q425_fisher_exact" ->
      """WITH per AS (
            SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS r1,
              CAST(sum(CASE WHEN event_id % 89 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
              CAST(sum(CASE WHEN user_id % 97 = 0
                AND event_id % 89 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS aobs
            FROM events GROUP BY event_type),
          pb AS (
            SELECT g, n, r1, c1, aobs,
              greatest(0, r1 + c1 - n) AS lo, least(r1, c1) AS hi
            FROM per),
          enumd AS (
            SELECT g, n, r1, c1, aobs, hi,
              unnest(generate_series(lo, hi)) AS k
            FROM pb WHERE hi - lo <= 100000),
          stepd AS (
            SELECT g, n, aobs, hi, k,
              CASE WHEN k < hi THEN CAST(floor(ln(
                (CAST(r1 - k AS DOUBLE) * (c1 - k)) /
                (CAST(k + 1 AS DOUBLE) * (n - r1 - c1 + k + 1)))
                * 1e6 + 0.5) AS BIGINT) ELSE 0 END AS q6
            FROM enumd),
          withl AS (
            SELECT g, aobs, k, coalesce(sum(q6) OVER (PARTITION BY g
              ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS l
            FROM stepd),
          withw AS (
            SELECT g, aobs, k, l,
              max(l) OVER (PARTITION BY g) AS lmax,
              max(CASE WHEN k = aobs THEN l END)
                OVER (PARTITION BY g) AS lobs
            FROM withl),
          w12 AS (
            SELECT g, aobs, k, l, lobs,
              CAST(floor(exp(CAST(l - lmax AS DOUBLE) / 1e6) * 1e12
                + 0.5) AS BIGINT) AS w
            FROM withw),
          sums AS (
            SELECT g, sum(w) AS s,
              sum(CASE WHEN l <= lobs THEN w ELSE 0 END) AS two,
              sum(CASE WHEN k <= aobs THEN w ELSE 0 END) AS lft
            FROM w12 GROUP BY g)
         SELECT pb.g AS stratum, pb.n AS n, pb.r1 AS n_a,
           pb.c1 AS n_b, pb.aobs AS n_ab,
           (pb.hi - pb.lo <= 100000) AS exact_ok,
           CASE WHEN s > 0 THEN floor(CAST(two AS DOUBLE)
             / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 + 0.0 END AS p_two,
           CASE WHEN s > 0 THEN floor(CAST(lft AS DOUBLE)
             / CAST(s AS DOUBLE) * 1e6 + 0.5) / 1e6 + 0.0 END AS p_left
         FROM pb LEFT JOIN sums ON pb.g = sums.g
         ORDER BY stratum""",
    // T and the radicand exact HUGEINT; one division chain at the end
    "q426_cochran_armitage" ->
      """WITH per AS (
            SELECT user_id % 5 AS w, CAST(count(*) AS BIGINT) AS nj,
              CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS rj
            FROM events GROUP BY 1),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k_doses,
              CAST(sum(nj) AS BIGINT) AS n,
              CAST(sum(rj) AS BIGINT) AS n_success,
              sum(CAST(w AS HUGEINT) * nj) AS wn,
              sum(CAST(w AS HUGEINT) * w * nj) AS wwn,
              sum(CAST(w AS HUGEINT) * rj) AS wr
            FROM per),
          alg AS (
            SELECT k_doses, n, n_success,
              CAST(n AS HUGEINT) * wr
                - CAST(n_success AS HUGEINT) * wn AS t,
              CAST(n_success AS HUGEINT)
                * (CAST(n AS HUGEINT) - n_success)
                * (CAST(n AS HUGEINT) * wwn
                  - CAST(wn AS HUGEINT) * wn) AS rad
            FROM roll),
          alg2 AS (
            SELECT k_doses, n, n_success, t, rad,
              CAST(t AS DOUBLE) / sqrt(
                (CASE WHEN rad > 0 THEN CAST(rad AS DOUBLE) END)
                / CAST(n AS DOUBLE)) AS z
            FROM alg)
         SELECT k_doses, n, n_success, CAST(t AS BIGINT) AS t_num,
           CASE WHEN rad > 0 THEN
             CASE WHEN z >= 0 THEN floor(z * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-z * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS z,
           CASE WHEN rad > 0 THEN
             floor(z * z * 1e4 + 0.5) / 1e4 + 0.0
           END AS chi2
         FROM alg2""",
    // exact doubled group medians from the value grid; the q344 ANOVA
    // identities on half-cent spread integers
    "q427_brown_forsythe" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          grid AS (
            SELECT g, c, CAST(count(*) AS BIGINT) AS t
            FROM base GROUP BY g, c),
          cum AS (
            SELECT g, c, sum(t) OVER (PARTITION BY g ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
            FROM grid),
          ng AS (SELECT g, CAST(count(*) AS BIGINT) AS n
            FROM base GROUP BY g),
          med AS (
            SELECT cum.g,
              min(CASE WHEN 2 * cm >= n + (n % 2) THEN c END)
                + min(CASE WHEN cm >= n // 2 + 1 THEN c END) AS med2
            FROM cum JOIN ng ON cum.g = ng.g GROUP BY cum.g),
          z AS (
            SELECT base.g, abs(2 * c - med2) AS z
            FROM base JOIN med ON base.g = med.g),
          per AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(z) AS BIGINT) AS s,
              sum(CAST(z AS HUGEINT) * z) AS q
            FROM z GROUP BY g),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
              CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(s) AS BIGINT) AS st,
              sum(q) AS qt,
              CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n * 1e2
                + 0.5) AS BIGINT)) AS BIGINT) AS sb2
            FROM per),
          alg AS (
            SELECT k_groups, n,
              CAST(sb2 AS DOUBLE) / 1e2
                - CAST(st AS DOUBLE) * st / n AS ssb,
              CAST(qt AS DOUBLE)
                - CAST(st AS DOUBLE) * st / n AS sst
            FROM roll)
         SELECT k_groups, n, k_groups - 1 AS df1, n - k_groups AS df2,
           CASE WHEN k_groups > 1 AND n > k_groups
               AND sst - ssb > 0 THEN
             floor((ssb / CAST(k_groups - 1 AS DOUBLE))
               / ((sst - ssb) / CAST(n - k_groups AS DOUBLE))
               * 1e4 + 0.5) / 1e4 + 0.0
           END AS f_stat
         FROM alg""",
    // pooled-MSE pairwise q statistics; k-row moment self-join
    "q428_tukey_hsd" ->
      """WITH per AS (
            SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS s,
              sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT)
                AS HUGEINT) * CAST(floor(value * 100 + 0.5) AS BIGINT))
                AS q
            FROM events WHERE value IS NOT NULL GROUP BY event_type),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(n) AS BIGINT) AS nt, sum(q) AS qt,
              CAST(sum(CAST(floor(CAST(s AS DOUBLE) * s / n / 1e4
                * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sb6
            FROM per),
          mse AS (
            SELECT k, nt,
              (CAST(qt AS DOUBLE) / 1e4 - CAST(sb6 AS DOUBLE) / 1e6)
                / CAST(nt - k AS DOUBLE) AS m
            FROM roll),
          pairs AS (
            SELECT a.g AS group_a, b.g AS group_b,
              a.n AS n_a, b.n AS n_b,
              CAST(a.s AS DOUBLE) / a.n / 100
                - CAST(b.s AS DOUBLE) / b.n / 100 AS diff,
              k, nt, m
            FROM per a JOIN per b ON a.g < b.g CROSS JOIN mse)
         SELECT group_a, group_b, n_a, n_b,
           CASE WHEN diff >= 0 THEN floor(diff * 1e4 + 0.5) / 1e4 + 0.0
             ELSE -floor(-diff * 1e4 + 0.5) / 1e4 + 0.0 END AS mean_diff,
           CASE WHEN m > 0 AND nt > k THEN
             CASE WHEN diff / sqrt((CASE WHEN m > 0 THEN m END) / 2
                 * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE)))
                 >= 0 THEN
               floor(diff / sqrt((CASE WHEN m > 0 THEN m END) / 2
                 * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE)))
                 * 1e4 + 0.5) / 1e4 + 0.0
             ELSE -floor(-(diff / sqrt((CASE WHEN m > 0 THEN m END) / 2
                 * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))))
                 * 1e4 + 0.5) / 1e4 + 0.0 END
           END AS q_stat
         FROM pairs
         ORDER BY group_a, group_b""",
    // q324's doubled tie-averaged ranks; pooled rank variance with
    // the Σ(t³−t) tie correction; k-row pair algebra
    "q429_dunn" ->
      """WITH b AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
            FROM events WHERE value IS NOT NULL),
          grid AS (
            SELECT x, CAST(count(*) AS BIGINT) AS t
            FROM b GROUP BY x),
          rk AS (
            SELECT x, 2 * coalesce(sum(t) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + t + 1 AS rank2
            FROM grid),
          cells AS (
            SELECT g, x, CAST(count(*) AS BIGINT) AS cnt
            FROM b GROUP BY g, x),
          pg AS (
            SELECT g, sum(CAST(cnt AS HUGEINT) * rank2) AS rg2,
              CAST(sum(cnt) AS BIGINT) AS ng
            FROM cells JOIN rk ON cells.x = rk.x GROUP BY g),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b),
          ties AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS ts
            FROM grid),
          pairs AS (
            SELECT a.g AS group_a, b2.g AS group_b,
              a.ng AS n_a, b2.ng AS n_b,
              CAST(a.rg2 AS DOUBLE) / 2 / a.ng AS mra,
              CAST(b2.rg2 AS DOUBLE) / 2 / b2.ng AS mrb,
              n, ts
            FROM pg a JOIN pg b2 ON a.g < b2.g
              CROSS JOIN tot CROSS JOIN ties),
          alg AS (
            SELECT group_a, group_b, n_a, n_b, mra, mrb, n,
              (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1) / 12
                - CAST(ts AS DOUBLE) / (12 * (CAST(n AS DOUBLE) - 1)))
                * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE))
                AS sig2
            FROM pairs)
         SELECT group_a, group_b, n_a, n_b,
           floor(mra * 1e4 + 0.5) / 1e4 + 0.0 AS mean_rank_a,
           floor(mrb * 1e4 + 0.5) / 1e4 + 0.0 AS mean_rank_b,
           CASE WHEN n > 1 AND sig2 > 0 THEN
             CASE WHEN (mra - mrb) / sqrt(sig2) >= 0 THEN
               floor((mra - mrb) / sqrt(sig2) * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-((mra - mrb) / sqrt(sig2)) * 1e6 + 0.5)
               / 1e6 + 0.0 END
           END AS z
         FROM alg
         ORDER BY group_a, group_b""",
    // per-stratum ratio terms 1e-9-quantized pre-sum; ½ continuity
    // correction clamped at 0
    "q430_mantel_haenszel" ->
      """WITH per AS (
            SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN user_id % 2 = 0 AND event_id % 2 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS a,
              CAST(sum(CASE WHEN user_id % 2 = 0
                AND NOT event_id % 2 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS b,
              CAST(sum(CASE WHEN NOT user_id % 2 = 0
                AND event_id % 2 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS c,
              CAST(sum(CASE WHEN NOT user_id % 2 = 0
                AND NOT event_id % 2 = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS d
            FROM events GROUP BY event_type HAVING count(*) >= 2),
          terms AS (
            SELECT a,
              CAST(floor(CAST(a AS DOUBLE) * d / CAST(n AS DOUBLE)
                * 1e9 + 0.5) AS BIGINT) AS ad9,
              CAST(floor(CAST(b AS DOUBLE) * c / CAST(n AS DOUBLE)
                * 1e9 + 0.5) AS BIGINT) AS bc9,
              CAST(floor(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                / CAST(n AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS e9,
              CAST(floor(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) - 1)) * 1e9 + 0.5) AS BIGINT)
                AS v9
            FROM per),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k_strata,
              CAST(sum(a) AS BIGINT) AS sum_a,
              CAST(sum(ad9) AS BIGINT) AS sad9,
              CAST(sum(bc9) AS BIGINT) AS sbc9,
              CAST(sum(e9) AS BIGINT) AS se9,
              CAST(sum(v9) AS BIGINT) AS sv9
            FROM terms),
          tot AS (SELECT CAST(sum(n) AS BIGINT) AS n FROM per),
          alg AS (
            SELECT k_strata, n, sum_a, sad9, sbc9, sv9,
              greatest(abs(CAST(sum_a AS DOUBLE)
                - CAST(se9 AS DOUBLE) / 1e9) - 0.5, 0) AS dev
            FROM roll CROSS JOIN tot)
         SELECT k_strata, n, sum_a,
           CASE WHEN sbc9 > 0 THEN floor(CAST(sad9 AS DOUBLE) / sbc9
             * 1e6 + 0.5) / 1e6 + 0.0 END AS or_mh,
           CASE WHEN sv9 > 0 THEN floor(dev * dev
             / (CAST(sv9 AS DOUBLE) / 1e9) * 1e4 + 0.5) / 1e4 + 0.0
           END AS chi2_cmh
         FROM alg""",
    // CDF gaps as exact rationals on the cents grid, per-point terms
    // 1e-9-quantized pre-sum
    "q431_cramer_von_mises" ->
      """WITH grid AS (
            SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
              CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS c1,
              CAST(sum(CASE WHEN NOT user_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS c2
            FROM events WHERE value IS NOT NULL GROUP BY 1),
          tot AS (
            SELECT CAST(sum(c1) AS BIGINT) AS n,
              CAST(sum(c2) AS BIGINT) AS m
            FROM grid),
          cum AS (
            SELECT c1, c2,
              sum(c1) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS f1,
              sum(c2) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS f2
            FROM grid),
          folded AS (
            SELECT max(n) AS n, max(m) AS m,
              CAST(count(*) AS BIGINT) AS n_grid,
              CAST(sum(CAST(floor(CAST(c1 + c2 AS DOUBLE)
                * ((CAST(f1 AS DOUBLE) * m - CAST(f2 AS DOUBLE) * n)
                  / ((CASE WHEN n > 0 AND m > 0
                    THEN CAST(n AS DOUBLE) END) * m))
                * ((CAST(f1 AS DOUBLE) * m - CAST(f2 AS DOUBLE) * n)
                  / ((CASE WHEN n > 0 AND m > 0
                    THEN CAST(n AS DOUBLE) END) * m))
                * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS t9
            FROM cum CROSS JOIN tot)
         SELECT n, m, n_grid,
           CASE WHEN n > 0 AND m > 0 THEN
             floor(CAST(t9 AS DOUBLE) / 1e9
               * (CAST(n AS DOUBLE) * m)
               / (CAST(n + m AS DOUBLE) * CAST(n + m AS DOUBLE))
               * 1e6 + 0.5) / 1e6 + 0.0
           END AS t_stat
         FROM folded""",
    // Friedman-layout doubled ranks; L scored by lexicographic type
    // rank; no-tie normal approximation (documented convention)
    "q432_page_trend" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d,
              event_type AS ty
            FROM events),
          types AS (SELECT DISTINCT ty FROM ev),
          cnts AS (SELECT d, ty, CAST(count(*) AS BIGINT) AS c
            FROM ev GROUP BY d, ty),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT unnest(generate_series(d0, d1)) AS d
            FROM bd),
          cells AS (
            SELECT g.d, t.ty, coalesce(c.c, 0) AS c
            FROM grid g CROSS JOIN types t
            LEFT JOIN cnts c ON g.d = c.d AND t.ty = c.ty),
          vals AS (SELECT d, c, CAST(count(*) AS BIGINT) AS t
            FROM cells GROUP BY d, c),
          ranked AS (
            SELECT d, c, t, coalesce(sum(t) OVER (PARTITION BY d
              ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS below
            FROM vals),
          pt AS (
            SELECT ty, CAST(sum(2 * below + t + 1) AS BIGINT) AS r2,
              CAST(count(*) AS BIGINT) AS nb
            FROM cells JOIN ranked
              ON cells.d = ranked.d AND cells.c = ranked.c
            GROUP BY ty),
          scored AS (
            SELECT r2, nb, row_number() OVER (ORDER BY ty) AS j
            FROM pt),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(max(nb) AS BIGINT) AS n_days,
              sum(CAST(j AS HUGEINT) * r2) AS l2
            FROM scored),
          alg AS (
            SELECT n_days, k, l2,
              2 * l2 - CAST(n_days AS HUGEINT) * k * (k + 1) * (k + 1)
                AS num4,
              CAST(n_days AS DOUBLE) * CAST(k AS DOUBLE) * k * (k + 1)
                * (CAST(k AS DOUBLE) * k - 1) / 144 AS varl
            FROM roll)
         SELECT n_days, k AS k_treatments,
           CAST(l2 AS DOUBLE) / 2 AS l_stat,
           CASE WHEN k > 1 AND n_days > 0 AND varl > 0 THEN
             CASE WHEN CAST(num4 AS DOUBLE) / 4 / sqrt(varl) >= 0 THEN
               floor(CAST(num4 AS DOUBLE) / 4 / sqrt(varl) * 1e6 + 0.5)
                 / 1e6 + 0.0
             ELSE -floor(-(CAST(num4 AS DOUBLE) / 4 / sqrt(varl))
               * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS z
         FROM alg""",
    // same ranks; W and χ² = n(k−1)W from exact HUGEINT sums with the
    // within-day tie correction
    "q433_kendall_w" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d,
              event_type AS ty
            FROM events),
          types AS (SELECT DISTINCT ty FROM ev),
          cnts AS (SELECT d, ty, CAST(count(*) AS BIGINT) AS c
            FROM ev GROUP BY d, ty),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM ev),
          grid AS (SELECT unnest(generate_series(d0, d1)) AS d
            FROM bd),
          cells AS (
            SELECT g.d, t.ty, coalesce(c.c, 0) AS c
            FROM grid g CROSS JOIN types t
            LEFT JOIN cnts c ON g.d = c.d AND t.ty = c.ty),
          vals AS (SELECT d, c, CAST(count(*) AS BIGINT) AS t
            FROM cells GROUP BY d, c),
          ranked AS (
            SELECT d, c, t, coalesce(sum(t) OVER (PARTITION BY d
              ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS below
            FROM vals),
          pt AS (
            SELECT ty, CAST(sum(2 * below + t + 1) AS BIGINT) AS r2,
              CAST(count(*) AS BIGINT) AS nb
            FROM cells JOIN ranked
              ON cells.d = ranked.d AND cells.c = ranked.c
            GROUP BY ty),
          ties AS (SELECT sum(CAST(t AS HUGEINT) * t * t - t) AS ts
            FROM vals),
          roll AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(max(nb) AS BIGINT) AS n_days,
              sum(CAST(r2 AS HUGEINT) * r2) AS sr2
            FROM pt),
          alg AS (
            SELECT n_days, k,
              3 * (sr2 - CAST(n_days AS HUGEINT) * n_days * k
                * (k + 1) * (k + 1)) AS num,
              CAST(n_days AS HUGEINT) * n_days * k * (k * k - 1)
                - CAST(n_days AS HUGEINT) * ts AS den
            FROM roll CROSS JOIN ties),
          alg2 AS (
            SELECT n_days, k, den,
              CAST(num AS DOUBLE)
                / (CASE WHEN den > 0 THEN CAST(den AS DOUBLE) END)
                AS w
            FROM alg)
         SELECT n_days, k AS k_treatments,
           CASE WHEN den > 0 THEN
             CASE WHEN w >= 0 THEN floor(w * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-w * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS w,
           CASE WHEN den > 0 THEN
             CASE WHEN CAST(n_days AS DOUBLE) * CAST(k - 1 AS DOUBLE)
                 * w >= 0 THEN
               floor(CAST(n_days AS DOUBLE) * CAST(k - 1 AS DOUBLE)
                 * w * 1e4 + 0.5) / 1e4 + 0.0
             ELSE -floor(-(CAST(n_days AS DOUBLE)
               * CAST(k - 1 AS DOUBLE) * w) * 1e4 + 0.5) / 1e4 + 0.0
             END
           END AS chi2
         FROM alg2""",
    // q419's trend residuals on the coarser 1e-2 grid (u = e² is a
    // 4th power — the grid keeps its centered moments in HUGEINT);
    // LM = n·R² of the auxiliary regression
    "q434_breusch_pagan" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM cnts),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          mom AS (
            SELECT CAST(count(*) AS BIGINT) AS k,
              CAST(sum(t) AS BIGINT) AS st,
              CAST(sum(t * t) AS BIGINT) AS stt,
              CAST(sum(t * y) AS BIGINT) AS sty,
              CAST(sum(y) AS BIGINT) AS sy
            FROM series),
          coef AS (
            SELECT k, st, sy,
              CAST(k AS DOUBLE) * stt - CAST(st AS DOUBLE) * st
                AS den,
              (CAST(k AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy)
                / (CAST(k AS DOUBLE) * stt - CAST(st AS DOUBLE) * st)
                AS c1
            FROM mom),
          coef2 AS (
            SELECT k, den, c1,
              (CAST(sy AS DOUBLE) - c1 * CAST(st AS DOUBLE))
                / CAST(k AS DOUBLE) AS c0
            FROM coef),
          resid AS (
            SELECT t, k, den,
              CASE WHEN CAST(y AS DOUBLE)
                  - (c0 + c1 * CAST(t AS DOUBLE)) >= 0 THEN
                CAST(floor((CAST(y AS DOUBLE)
                  - (c0 + c1 * CAST(t AS DOUBLE))) * 1e2 + 0.5)
                  AS BIGINT)
              ELSE -CAST(floor(-(CAST(y AS DOUBLE)
                - (c0 + c1 * CAST(t AS DOUBLE))) * 1e2 + 0.5)
                AS BIGINT) END AS e2
            FROM series CROSS JOIN coef2),
          aux AS (
            SELECT max(k) AS n_days, max(den) AS dn,
              sum(CAST(t AS HUGEINT)) AS sx,
              sum(CAST(t AS HUGEINT) * t) AS sxx,
              sum(CAST(t AS HUGEINT) * (e2 * e2)) AS sxu,
              sum(CAST(e2 * e2 AS HUGEINT)) AS su,
              sum(CAST(e2 * e2 AS HUGEINT) * (e2 * e2)) AS suu
            FROM resid),
          alg AS (
            SELECT n_days, dn,
              CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS sxxc,
              CAST(n_days AS DOUBLE) * CAST(suu AS DOUBLE)
                - CAST(su AS DOUBLE) * CAST(su AS DOUBLE) AS suuc,
              CAST(n_days AS DOUBLE) * CAST(sxu AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE) AS sxuc
            FROM aux),
          alg2 AS (
            SELECT n_days, dn, sxxc, suuc,
              sxuc * sxuc / ((CASE WHEN sxxc > 0 AND suuc > 0
                THEN sxxc END) * suuc) AS r2
            FROM alg)
         SELECT n_days,
           CASE WHEN dn > 0 AND sxxc > 0 AND suuc > 0
               AND n_days > 2 THEN
             floor(r2 * 1e6 + 0.5) / 1e6 + 0.0
           END AS r2_aux,
           CASE WHEN dn > 0 AND sxxc > 0 AND suuc > 0
               AND n_days > 2 THEN
             floor(CAST(n_days AS DOUBLE) * r2 * 1e4 + 0.5) / 1e4 + 0.0
           END AS lm
         FROM alg2""",
    // t(β̂) collapses to B·sqrt((m−2)/(AC−B²)) — A, B, C exact
    // HUGEINT centered moments of the (y_{t−1}, Δy) pairs
    "q435_dickey_fuller" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (SELECT d, count(*) AS y FROM ev GROUP BY d),
          bd AS (SELECT min(d) AS d0, max(d) AS d1 FROM cnts),
          grid AS (SELECT d0, unnest(generate_series(d0, d1)) AS d
            FROM bd),
          series AS (
            SELECT g.d - g.d0 AS t, coalesce(c.y, 0) AS y
            FROM grid g LEFT JOIN cnts c ON g.d = c.d),
          pairs AS (
            SELECT py AS x, y - py AS z FROM (
              SELECT y, lag(y, 1) OVER (ORDER BY t) AS py
              FROM series)
            WHERE py IS NOT NULL),
          mom AS (
            SELECT CAST(count(*) AS BIGINT) AS np,
              sum(CAST(x AS HUGEINT)) AS sx,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(x AS HUGEINT) * z) AS sxz,
              sum(CAST(z AS HUGEINT)) AS sz,
              sum(CAST(z AS HUGEINT) * z) AS szz
            FROM pairs),
          alg AS (
            SELECT np,
              CAST(np AS HUGEINT) * sxx - sx * sx AS a,
              CAST(np AS HUGEINT) * sxz - sx * sz AS b,
              CAST(np AS HUGEINT) * szz - sz * sz AS c
            FROM mom),
          alg2 AS (
            SELECT np, a, b, a * c - b * b AS disc FROM alg),
          alg3 AS (
            SELECT np, a, disc,
              CAST(b AS DOUBLE)
                / (CASE WHEN a > 0 THEN CAST(a AS DOUBLE) END) AS beta,
              CAST(b AS DOUBLE) * sqrt(CAST(np - 2 AS DOUBLE)
                / (CASE WHEN disc > 0 THEN CAST(disc AS DOUBLE) END))
                AS t
            FROM alg2)
         SELECT np + 1 AS n_days, np AS n_pairs,
           CASE WHEN a > 0 THEN
             CASE WHEN beta >= 0 THEN
               floor(beta * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-beta * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS beta,
           CASE WHEN a > 0 AND disc > 0 AND np > 2 THEN
             CASE WHEN t >= 0 THEN floor(t * 1e4 + 0.5) / 1e4 + 0.0
             ELSE -floor(-t * 1e4 + 0.5) / 1e4 + 0.0 END
           END AS t_stat
         FROM alg3""",
    // exact integer micro-nat Viterbi DP replayed as a recursive CTE
    // over per-user gap-bucket ordinals; model constants inlined
    "q440_viterbi" ->
      """WITH RECURSIVE e AS (
            SELECT user_id, epoch_ns(ts) AS tns, event_id,
              row_number() OVER (PARTITION BY user_id
                ORDER BY epoch_ns(ts), event_id) AS seq
            FROM events),
          o AS (
            SELECT user_id, seq,
              CASE WHEN lg IS NULL THEN 1
                WHEN tns - lg < 3600000000000 THEN 0
                WHEN tns - lg < 86400000000000 THEN 1
                ELSE 2 END AS ob
            FROM (SELECT user_id, seq, tns,
                lag(tns) OVER (PARTITION BY user_id ORDER BY seq) AS lg
              FROM e) t
            WHERE seq <= 64),
          b AS (SELECT * FROM (VALUES
              (0, -510826, -1609438), (1, -1203973, -1203973),
              (2, -2302585, -693147)) AS v(ob, b0, b1)),
          r(user_id, seq, dp0, dp1) AS (
            SELECT o.user_id, o.seq,
              CAST(-510826 + b.b0 AS BIGINT),
              CAST(-916291 + b.b1 AS BIGINT)
            FROM o JOIN b ON o.ob = b.ob WHERE o.seq = 1
            UNION ALL
            SELECT o.user_id, o.seq,
              greatest(r.dp0 - 356675, r.dp1 - 916291) + b.b0,
              greatest(r.dp0 - 1203973, r.dp1 - 510826) + b.b1
            FROM r JOIN o ON o.user_id = r.user_id
              AND o.seq = r.seq + 1
            JOIN b ON o.ob = b.ob),
          fin AS (
            SELECT user_id, seq, dp0, dp1,
              row_number() OVER (PARTITION BY user_id
                ORDER BY seq DESC) AS rn
            FROM r)
         SELECT user_id, CAST(seq AS BIGINT) AS n_steps,
           CAST(CASE WHEN dp0 >= dp1 THEN 0 ELSE 1 END AS BIGINT)
             AS best_state,
           CAST(greatest(dp0, dp1) AS BIGINT) AS best_logprob_micro
         FROM fin WHERE rn = 1 ORDER BY user_id""",
    // 2U from grid counting (gt pairs twice + ties once), tie-corrected
    // normal variance from the combined tie spectrum — all HUGEINT
    "q441_mann_whitney" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')),
          cnts AS (SELECT g, c, CAST(count(*) AS BIGINT) AS t
            FROM base GROUP BY g, c),
          cells AS (
            SELECT gr.g, v.c, coalesce(ct.t, 0) AS t
            FROM (SELECT DISTINCT g FROM cnts) gr
            CROSS JOIN (SELECT DISTINCT c FROM cnts) v
            LEFT JOIN cnts ct ON gr.g = ct.g AND v.c = ct.c),
          wc AS (
            SELECT g, c, t, coalesce(sum(t) OVER (PARTITION BY g
              ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS lt
            FROM cells),
          u2 AS (
            SELECT coalesce(sum(CAST(a.t AS HUGEINT)
              * (2 * b.lt + b.t)), 0) AS u2
            FROM wc a JOIN wc b ON a.c = b.c
            WHERE a.g = 'click' AND b.g = 'view'),
          ties AS (
            SELECT coalesce(sum(CAST(tt AS HUGEINT) * tt * tt - tt), 0)
              AS tsum
            FROM (SELECT c, sum(t) AS tt FROM wc GROUP BY c)),
          sizes AS (
            SELECT CAST(sum(CASE WHEN g = 'click' THEN t END)
                AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN g = 'view' THEN t END) AS BIGINT)
                AS n_b
            FROM wc),
          alg AS (
            SELECT n_a, n_b, u2, tsum, n_a + n_b AS nt
            FROM sizes CROSS JOIN u2 CROSS JOIN ties),
          alg2 AS (
            SELECT n_a, n_b, u2,
              CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                * CAST(CAST(nt AS HUGEINT) * (nt - 1) * (nt + 1)
                  - tsum AS DOUBLE)
                / (12.0 * CAST(nt AS DOUBLE) * CAST(nt - 1 AS DOUBLE))
                AS varu,
              u2 - CAST(n_a AS HUGEINT) * n_b AS num2
            FROM alg)
         SELECT n_a, n_b, CAST(u2 AS DOUBLE) / 2 AS u_a,
           CASE WHEN n_a > 0 AND n_b > 0 AND varu > 0 THEN
             CASE WHEN CAST(num2 AS DOUBLE) / 2 / sqrt(varu) >= 0 THEN
               floor(CAST(num2 AS DOUBLE) / 2 / sqrt(varu) * 1e6 + 0.5)
                 / 1e6 + 0.0
             ELSE -floor(-(CAST(num2 AS DOUBLE) / 2 / sqrt(varu))
               * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS z
         FROM alg2""",
    // Pettitt U_t from doubled-midrank prefix sums on the gap-filled
    // day grid — exact integers end to end; p reported as its exponent
    "q443_pettitt" ->
      """WITH ev AS (
            SELECT epoch_ns(ts) // 86400000000000 AS d FROM events),
          cnts AS (
            SELECT d, CAST(count(*) AS BIGINT) AS y
            FROM ev GROUP BY d),
          b AS (SELECT min(d) AS d0, max(d) AS d1 FROM cnts),
          grid AS (
            SELECT unnest(generate_series(d0, d1)) AS d, d0 FROM b),
          series AS (
            SELECT grid.d - grid.d0 + 1 AS t, coalesce(cnts.y, 0) AS y
            FROM grid LEFT JOIN cnts ON grid.d = cnts.d),
          vg AS (SELECT y, CAST(count(*) AS BIGINT) AS c
            FROM series GROUP BY y),
          rk AS (
            SELECT y, 2 * coalesce(sum(c) OVER (ORDER BY y
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + c + 1 AS r2
            FROM vg),
          nn AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM series),
          uu AS (
            SELECT s.t,
              sum(rk.r2) OVER (ORDER BY s.t ROWS BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) - s.t * (tt + 1) AS u,
              tt
            FROM series s JOIN rk ON s.y = rk.y CROSS JOIN nn),
          uu2 AS (SELECT * FROM uu WHERE t < tt),
          kk AS (SELECT max(abs(u)) AS k FROM uu2)
         SELECT max(tt) AS n_days, CAST(max(k) AS DOUBLE) AS k_stat,
           CAST(min(t) AS BIGINT) AS cp_t,
           floor(6.0 * CAST(max(k) * max(k) AS DOUBLE)
             / CAST(max(tt) * max(tt) * (max(tt) + 1) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 + 0.0 AS p_exponent
         FROM uu2 CROSS JOIN kk WHERE abs(u) = k""",
    // Ansari-Bradley from-both-ends scores via the closed-form doubled
    // prefix S2(x); tie runs average POSITION scores; 1e-9 pre-sum
    "q444_ansari_bradley" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
              AND event_type IN ('click', 'view')),
          cnts AS (
            SELECT c, CAST(count(*) AS BIGINT) AS t,
              CAST(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS ta
            FROM base GROUP BY c),
          nn AS (
            SELECT CAST(sum(t) AS BIGINT) AS n,
              CAST(sum(ta) AS BIGINT) AS na
            FROM cnts),
          runs AS (
            SELECT c, t, ta, coalesce(sum(t) OVER (ORDER BY c
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS below, n, na
            FROM cnts CROSS JOIN nn),
          sx AS (
            SELECT t, ta, n, na,
              CASE WHEN below + t <= (n + 1) // 2
                THEN (below + t) * (below + t + 1)
                ELSE ((n + 1) // 2) * ((n + 1) // 2 + 1)
                  + (below + t - (n + 1) // 2)
                    * (2 * n + 1 - (below + t) - (n + 1) // 2)
              END
              - CASE WHEN below <= (n + 1) // 2
                THEN below * (below + 1)
                ELSE ((n + 1) // 2) * ((n + 1) // 2 + 1)
                  + (below - (n + 1) // 2)
                    * (2 * n + 1 - below - (n + 1) // 2)
              END AS a2run
            FROM runs),
          terms AS (
            SELECT n, na,
              CAST(floor(CAST(ta AS DOUBLE) * a2run / (2.0 * t)
                * 1e9 + 0.5) AS HUGEINT) AS w9,
              CAST(floor(CAST(a2run AS DOUBLE) * a2run / (4.0 * t)
                * 1e9 + 0.5) AS HUGEINT) AS sq9,
              a2run
            FROM sx),
          agg AS (
            SELECT n, na, CAST(sum(w9) AS HUGEINT) AS ww9,
              CAST(sum(sq9) AS HUGEINT) AS ssq9,
              CAST(sum(a2run) AS BIGINT) AS sa2
            FROM terms GROUP BY n, na),
          calc AS (
            SELECT n, na, na AS n_a, n - na AS n_b,
              CAST(ww9 AS DOUBLE) / 1e9 AS wstat,
              CAST(na AS DOUBLE) * (CAST(sa2 AS DOUBLE) / 2) / n AS ew,
              CAST(na AS DOUBLE) * CAST(n - na AS DOUBLE)
                * (CAST(n AS DOUBLE) * (CAST(ssq9 AS DOUBLE) / 1e9)
                  - (CAST(sa2 AS DOUBLE) / 2)
                    * (CAST(sa2 AS DOUBLE) / 2))
                / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                  * (CAST(n AS DOUBLE) - 1)) AS varw
            FROM agg)
         SELECT n_a, n_b,
           CASE WHEN wstat >= 0
             THEN floor(wstat * 1e6 + 0.5) / 1e6 + 0.0
             ELSE -floor(-wstat * 1e6 + 0.5) / 1e6 + 0.0 END AS w_stat,
           CASE WHEN na > 0 AND n - na > 0 AND varw > 0 AND n > 1 THEN
             CASE WHEN (wstat - ew) / sqrt(varw) >= 0
               THEN floor((wstat - ew) / sqrt(varw) * 1e6 + 0.5) / 1e6
                 + 0.0
               ELSE -floor(-((wstat - ew) / sqrt(varw)) * 1e6 + 0.5)
                 / 1e6 + 0.0 END
           END AS z
         FROM calc""",
    // exact doubled grand median off the global value grid; k×2 χ²
    // cell terms 1e-9-quantized pre-sum
    "q438_mood_median" ->
      """WITH base AS (
            SELECT event_type AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          grid AS (
            SELECT c, CAST(count(*) AS BIGINT) AS t
            FROM base GROUP BY c),
          cum AS (
            SELECT c, sum(t) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS cm
            FROM grid),
          nall AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
          med AS (
            SELECT min(CASE WHEN 2 * cm >= nt + (nt % 2) THEN c END)
              + min(CASE WHEN cm >= nt // 2 + 1 THEN c END) AS med2
            FROM cum CROSS JOIN nall),
          per AS (
            SELECT g, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CASE WHEN 2 * c > med2 THEN 1 ELSE 0 END)
                AS BIGINT) AS a
            FROM base CROSS JOIN med GROUP BY g),
          tots AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
              CAST(sum(n) AS BIGINT) AS n,
              CAST(sum(a) AS BIGINT) AS n_above
            FROM per),
          cellsx AS (
            SELECT CAST(p.a AS DOUBLE) AS oa,
              CAST(p.n - p.a AS DOUBLE) AS ob,
              CAST(p.n AS DOUBLE) * CAST(t.n_above AS DOUBLE)
                / CAST(t.n AS DOUBLE) AS ea,
              CAST(p.n AS DOUBLE) * (CAST(t.n AS DOUBLE)
                - CAST(t.n_above AS DOUBLE)) / CAST(t.n AS DOUBLE)
                AS eb,
              t.k_groups, t.n, t.n_above
            FROM per p CROSS JOIN tots t)
         SELECT max(k_groups) AS k_groups, max(n) AS n,
           max(n_above) AS n_above,
           CASE WHEN max(n_above) > 0 AND max(n_above) < max(n) THEN
             floor(CAST(CAST(sum(
               CAST(floor((oa - ea) * (oa - ea)
                 / (CASE WHEN ea > 0 THEN ea END) * 1e9 + 0.5)
                 AS BIGINT)
               + CAST(floor((ob - eb) * (ob - eb)
                 / (CASE WHEN eb > 0 THEN eb END) * 1e9 + 0.5)
                 AS BIGINT)) AS BIGINT) AS DOUBLE) / 1e9 * 1e4 + 0.5)
               / 1e4 + 0.0
           END AS chi2
         FROM cellsx""",
    // 2U_ij from zero-filled per-group cumulative windows over the
    // global value grid; no-tie normal moments, ×4-scaled integer
    // numerator
    "q439_jonckheere" ->
      """WITH base AS (
            SELECT user_id % 3 AS g,
              CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
            FROM events WHERE value IS NOT NULL),
          cnts AS (
            SELECT g, c, CAST(count(*) AS BIGINT) AS t
            FROM base GROUP BY g, c),
          groups AS (SELECT DISTINCT g FROM cnts),
          vals AS (SELECT DISTINCT c FROM cnts),
          cells AS (
            SELECT gr.g, v.c, coalesce(ct.t, 0) AS t
            FROM groups gr CROSS JOIN vals v
            LEFT JOIN cnts ct ON gr.g = ct.g AND v.c = ct.c),
          wc AS (
            SELECT g, c, t, coalesce(sum(t) OVER (PARTITION BY g
              ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING
              AND 1 PRECEDING), 0) AS lt
            FROM cells),
          j2 AS (
            SELECT coalesce(sum(CAST(hi.t AS HUGEINT)
              * (2 * lo.lt + lo.t)), 0) AS j2
            FROM wc lo JOIN wc hi ON lo.c = hi.c AND lo.g < hi.g),
          pg AS (SELECT g, CAST(sum(t) AS BIGINT) AS ng
            FROM wc GROUP BY g),
          moms AS (
            SELECT CAST(count(*) AS BIGINT) AS k_groups,
              CAST(sum(ng) AS BIGINT) AS n,
              sum(CAST(ng AS HUGEINT) * ng) AS sn2,
              sum(CAST(ng AS HUGEINT) * ng * (2 * ng + 3)) AS sn3
            FROM pg),
          alg AS (
            SELECT k_groups, n, j2,
              2 * j2 - (CAST(n AS HUGEINT) * n - sn2) AS num4,
              CAST(CAST(n AS HUGEINT) * n * (2 * n + 3) - sn3
                AS DOUBLE) / 72 AS varj
            FROM moms CROSS JOIN j2)
         SELECT k_groups, n, CAST(j2 AS DOUBLE) / 2 AS j_stat,
           CASE WHEN k_groups > 1 AND varj > 0 THEN
             CASE WHEN CAST(num4 AS DOUBLE) / 4 / sqrt(varj) >= 0 THEN
               floor(CAST(num4 AS DOUBLE) / 4 / sqrt(varj) * 1e6 + 0.5)
                 / 1e6 + 0.0
             ELSE -floor(-(CAST(num4 AS DOUBLE) / 4 / sqrt(varj))
               * 1e6 + 0.5) / 1e6 + 0.0 END
           END AS z
         FROM alg""")
}
