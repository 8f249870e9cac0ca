package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) join.
  *
  * The reference engine delegates interval lookups to an external
  * in-memory ranges sidecar (VCFdbR `pipeline/03-index-db.R:72-82`);
  * here it is a first-class distributed operator.
  *
  * A naive `a.start <= b.end && a.end >= b.start` theta-join executes as
  * a broadcast-nested-loop — O(|A|·|B|) and a non-starter at scale. The
  * standard genomic-binning decomposition turns it into an equi-join:
  * each interval is exploded to the fixed-width bins it touches, the
  * join runs on (partitionKey, bin) — a plain shuffled/broadcast hash
  * join Catalyst can optimize — and a residual overlap predicate plus a
  * dedup guard (count each overlapping pair once, in the lowest common
  * bin) restore exact semantics.
  *
  * Scale notes: bin width trades explode fan-out (long intervals touch
  * many bins) against join selectivity (wide bins ⇒ more false
  * candidates); both sides stay fully distributed and the shuffle is on
  * (key, bin) which is well spread unless one genomic bin is pathological.
  */
object RangeJoin {

  /** Join rows of `left` and `right` whose [startCol, endCol] intervals
    * overlap (closed intervals, same-key only).
    *
    * @param keyCols  equality keys joined alongside the bin (e.g. chromosome)
    * @param binWidth bin width in interval coordinate units
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long = 100000L): DataFrame = {

    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.withColumn(
        "__bin",
        explode(sequence(
          floor(col(s) / binWidth).cast("long"),
          floor(col(e) / binWidth).cast("long"))))

    val l = binned(left, leftStart, leftEnd)
    val r = binned(right, rightStart, rightEnd)

    // Overlapping pair (a,b) co-occurs in every shared bin; keep it only
    // in the first bin either interval starts in, so it appears exactly once.
    val firstSharedBin = greatest(
      floor(l(leftStart) / binWidth).cast("long"),
      floor(r(rightStart) / binWidth).cast("long"))

    l.join(r, keyCols :+ "__bin")
      .where(
        l(leftStart) <= r(rightEnd) && l(leftEnd) >= r(rightStart) &&
          col("__bin") === firstSharedBin)
      .drop("__bin")
  }

  /** Adaptive entry point: picks the broadcast custom-operator path
    * ([[overlapExec]]) when the regions side is small enough to
    * broadcast, the shuffled binned decomposition ([[overlap]])
    * otherwise — mirroring Catalyst's own broadcast-vs-shuffle join
    * choice for the operator it doesn't know about.
    *
    * The decision reads the optimized plan's STATISTICS (row count when
    * available, size estimate otherwise) — no job runs, and an
    * expensive derived `right` plan is not executed twice. Only when
    * the size estimate is the unknown sentinel does it fall back to an
    * actual count.
    */
  def overlapAuto(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long = 100000L,
      broadcastRows: Long = 1000000L,
      broadcastBytes: Long = 64L << 20): DataFrame = {
    val stats = right.queryExecution.optimizedPlan.stats
    val broadcastable = stats.rowCount match {
      case Some(n) => n <= broadcastRows
      case None =>
        val sz = stats.sizeInBytes
        // Catalyst's unknown-size sentinel is defaultSizeInBytes
        // (Long.MaxValue unless overridden); treat anything in that
        // region as "no usable estimate"
        if (sz >= 0 && sz < Long.MaxValue / 4) sz <= broadcastBytes
        else right.count() <= broadcastRows
    }
    if (broadcastable)
      overlapExec(left, right, keyCols, leftStart, leftEnd, rightStart, rightEnd)
    else
      overlap(left, right, keyCols, leftStart, leftEnd, rightStart, rightEnd, binWidth)
  }

  /** Same join semantics through the custom physical operator
    * ([[graft.plans.BroadcastIntervalJoinExec]]): the `right` side is
    * broadcast as a per-key sorted interval table and each left row
    * probes it with early exit — no explode, no shuffle, no
    * BroadcastNestedLoop. Prefer when `right` fits in a broadcast;
    * [[overlap]] is the all-sizes path.
    *
    * Two-layer size protection: when Catalyst's plan statistics
    * already PROVE the build side exceeds the configured broadcast
    * bound (`spark.graft.intervalJoin.maxBuildRows` /
    * `...maxBuildBytes`), this falls back to the binned [[overlap]]
    * decomposition up front — same results, shuffle-based plan. When
    * stats are unknown, the physical operator itself still enforces
    * the bound at runtime (streaming the build side
    * partition-at-a-time and aborting with a pointer here), so a
    * too-large build side can never OOM the driver regardless of how
    * the plan was constructed.
    */
  def overlapExec(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import graft.plans.{IntervalJoinPlan, IntervalJoinStrategy, PruneIntervalJoinColumns}
    val spark = left.sparkSession
    val maxRows = spark.conf.get(
      graft.plans.BroadcastIntervalJoinExec.MaxBuildRowsKey, "4000000").toLong
    val maxBytes = spark.conf.get(
      graft.plans.BroadcastIntervalJoinExec.MaxBuildBytesKey,
      (256L << 20).toString).toLong
    val stats = right.queryExecution.optimizedPlan.stats
    val provedTooBig = stats.rowCount.exists(_ > maxRows) || {
      val sz = stats.sizeInBytes
      sz >= 0 && sz < Long.MaxValue / 4 && sz > maxBytes
    }
    if (provedTooBig)
      return overlap(left, right, keyCols, leftStart, leftEnd,
        rightStart, rightEnd)
    GraftBridge.addStrategy(spark, IntervalJoinStrategy)
    GraftBridge.addOptimization(spark, PruneIntervalJoinColumns)
    val lp = GraftBridge.logicalPlan(left)
    val rp = GraftBridge.logicalPlan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name.equalsIgnoreCase(n)).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not found in ${p.output.map(_.name).mkString(",")}"))
    GraftBridge.ofRows(spark, IntervalJoinPlan(
      lp, rp,
      keyCols.map(attr(lp, _)), keyCols.map(attr(rp, _)),
      attr(lp, leftStart), attr(lp, leftEnd),
      attr(rp, rightStart), attr(rp, rightEnd)))
  }
}
