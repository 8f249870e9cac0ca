package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log operators (batch forms; streaming counterparts live in
  * `graft.streaming`). Event time is an int64 nanosecond epoch column
  * (`ts_ns`) — integer arithmetic end-to-end, so results are exact and
  * engine-independent.
  */
object Events {

  /** Tumbling-window aggregation: bucket = floor(ts_ns / windowNs).
    * Equivalent to Structured Streaming's `window()` grouping in batch.
    */
  def tumblingAgg(df: DataFrame, tsNs: String, windowNs: Long, keys: Seq[String],
      aggs: Seq[Column]): DataFrame =
    df.withColumn("window_start_ns", (col(tsNs) - pmod(col(tsNs), lit(windowNs))))
      .groupBy((col("window_start_ns") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Hopping (sliding) window aggregation: windows of `windowNs`
    * advancing every `hopNs` (hopNs ≤ windowNs ⇒ each event lands in
    * `windowNs / hopNs` windows). The event explodes to its member
    * window starts row-locally (`sequence` over hop-aligned starts —
    * the same expansion Structured Streaming's `window(col, len,
    * slide)` plans), then aggregates exactly like tumbling. Integer ns
    * arithmetic throughout — engine-exact.
    */
  def hoppingAgg(df: DataFrame, tsNs: String, windowNs: Long, hopNs: Long,
      keys: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(hopNs > 0 && windowNs > 0 && windowNs % hopNs == 0,
      "windowNs must be a positive multiple of hopNs")
    val ts = col(tsNs)
    // earliest window containing ts starts at the hop-aligned point
    // > ts - windowNs; latest starts at the hop-aligned point <= ts
    val first = ts - pmod(ts, lit(hopNs)) - lit(windowNs - hopNs)
    val last = ts - pmod(ts, lit(hopNs))
    df.withColumn("window_start_ns",
        explode(sequence(first, last, lit(hopNs))))
      .groupBy((col("window_start_ns") +: keys.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapNs`. Returns the input
    * plus `session_id` (per-user ordinal, starting at 1).
    *
    * Scale: one shuffle on userCol (the window partition); sessions are
    * derived with lag + a running sum, both within-partition.
    */
  def sessionize(df: DataFrame, userCol: String, tsNs: String, gapNs: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsNs))
    val isNew = when(
      col(tsNs) - lag(col(tsNs), 1).over(w) > gapNs || lag(col(tsNs), 1).over(w).isNull,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("__new", isNew)
      .withColumn("session_id",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  /** As-of join: for each left row, the single most recent right row
    * with right.ts <= left.ts (per key), within `toleranceNs` (≤ 0
    * disables the bound).
    *
    * Implementation is the union-tag trick — a sort-merge friendly
    * reformulation that avoids a range theta-join: tag both sides, sort
    * by (key, ts, tag) within key partitions, carry the last right row
    * forward with `last(..., ignoreNulls)` over an unbounded-preceding
    * window, then keep left rows. One shuffle on the key, no
    * broadcast-nested-loop, skew governed by key cardinality.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      rightValCols: Seq[String], toleranceNs: Long = 0L): DataFrame = {

    // the right row travels as ONE struct, so ts and value columns can
    // never desync: last(..., ignoreNulls) skips left-side rows (whole
    // struct null) but carries a right row even when some of its value
    // fields are null
    val rStructType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.LongType) +:
        rightValCols.map(c => org.apache.spark.sql.types.StructField(
          c, right.schema(c).dataType)))

    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rTagged = right
      .select(
        (keyCols.map(col) :+ col(rightTs).as("__ts")) :+
          struct((col(rightTs).cast("long").as("ts") +:
            rightValCols.map(col)): _*).as("__r"): _*)
      .withColumn("__side", lit(0))

    val unioned = lTagged.select(
      (keyCols.map(col) :+ col("__ts") :+ col("__side") :+ col("__r")) ++
        left.columns.filterNot(keyCols.contains).map(col): _*
    ).unionByName(rTagged, allowMissingColumns = true)

    // rows sort right-before-left at equal ts, so "<=" semantics hold
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)

    val carried = unioned
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))

    val bounded =
      if (toleranceNs > 0)
        carried.withColumn("__ok",
          col("__asof").isNotNull &&
            (col("__ts") - col("__asof.ts") <= toleranceNs))
      else carried.withColumn("__ok", col("__asof").isNotNull)

    bounded.where(col("__side") === 1)
      .select(
        (left.columns.map(col) :+
          when(col("__ok"), col("__asof.ts")).otherwise(lit(null)).as("asof_ts")) ++
          rightValCols.map(c =>
            when(col("__ok"), col(s"__asof.$c")).otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
