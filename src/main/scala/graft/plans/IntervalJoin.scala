package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DoubleType

/** Whole-operator Catalyst extension (SURVEY.md §4.3 preference order
  * c): an interval-overlap join as a first-class logical node, planner
  * strategy, and physical operator — the alternative execution path to
  * the compositional binning decomposition in
  * [[graft.operators.RangeJoin]].
  *
  * Physical algorithm (broadcast interval join): the build side is
  * collected, grouped by key, sorted by interval start, and broadcast;
  * each streamed row walks its key group in start order with
  * early-exit once `build.start > stream.end`. No shuffle of the
  * streamed side at all — versus the naive theta-join, which Spark
  * executes as an O(|L|·|R|) BroadcastNestedLoop with a full pass per
  * row, and versus binning, which pays an explode and a shuffle. Use
  * when the regions side fits in a broadcast (the genomic
  * sidecar-lookup case, `03-index-db.R:72-82`); at larger build sizes
  * fall back to [[graft.operators.RangeJoin.overlap]].
  */
case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: column pruning through [[IntervalJoinPlan]].
  *
  * Catalyst's `ColumnPruning` stops at nodes it doesn't know, so a
  * `select(few)` above the custom join would otherwise read every
  * column of both scans. This rule pushes a Project onto each child
  * keeping only the attributes the parent projection and the join
  * condition reference. Fires only when it actually shrinks a child,
  * so it reaches a fixed point.
  */
object PruneIntervalJoinColumns
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, j: IntervalJoinPlan) =>
      val needed = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet((j.leftKeys ++ j.rightKeys ++
          Seq(j.leftStart, j.leftEnd, j.rightStart, j.rightEnd))
          .flatMap(_.references))
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(needed.contains)
        if (keep.size < child.output.size) Project(keep, child) else child
      }
      val (l, r) = (prune(j.left), prune(j.right))
      if (l.eq(j.left) && r.eq(j.right)) p
      else p.copy(child = j.copy(left = l, right = r))
  }
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: IntervalJoinPlan =>
      BroadcastIntervalJoinExec(
        planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys,
        j.leftStart, j.leftEnd, j.rightStart, j.rightEnd) :: Nil
    case _ => Nil
  }
}

/** Per-key broadcast payload: intervals sorted by start, plus the
  * running prefix-max of ends — the classic augmentation that lets a
  * probe binary-search to the first POSSIBLE candidate instead of
  * scanning each key group from index 0 (a dense regions table would
  * otherwise make every probe pay the full prefix).
  */
private[plans] final case class IntervalTable(
    starts: Array[Double], ends: Array[Double],
    maxEnds: Array[Double], rows: Array[InternalRow])

object BroadcastIntervalJoinExec {
  /** Build-side row bound before [[BroadcastIntervalJoinExec]] refuses
    * and points at the shuffle-based `RangeJoin.overlap` fallback. */
  val MaxBuildRowsKey = "spark.graft.intervalJoin.maxBuildRows"
  /** Build-side byte bound (UnsafeRow payload) — same contract. */
  val MaxBuildBytesKey = "spark.graft.intervalJoin.maxBuildBytes"
}

case class BroadcastIntervalJoinExec(
    streamed: SparkPlan, build: SparkPlan,
    streamKeys: Seq[Expression], buildKeys: Seq[Expression],
    sStart: Expression, sEnd: Expression,
    bStart: Expression, bEnd: Expression)
  extends BinaryExecNode {

  import org.apache.spark.sql.execution.metric.SQLMetrics

  override def left: SparkPlan = streamed
  override def right: SparkPlan = build
  override def output: Seq[Attribute] = streamed.output ++ build.output

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "probeSteps" -> SQLMetrics.createMetric(sparkContext,
      "build-side candidates examined"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastIntervalJoinExec =
    copy(streamed = newLeft, build = newRight)

  private def dbl(e: Expression): Expression = Cast(e, DoubleType)

  override protected def doExecute(): RDD[InternalRow] = {
    // ---- build phase (driver): group by key, sort by start ----
    // Hard size guard INSIDE the operator (not just caller discipline
    // in RangeJoin.overlapAuto): the build side streams to the driver
    // partition-at-a-time (executeToIterator, never an all-at-once
    // executeCollect) and the collection aborts with a pointer to the
    // shuffle-based fallback the moment the row/byte bound is crossed
    // — the same self-protection Spark's own broadcast exchange
    // enforces. Bounds are configurable for tests and tuning.
    val maxRows = conf.getConfString(
      BroadcastIntervalJoinExec.MaxBuildRowsKey, "4000000").toLong
    val maxBytes = conf.getConfString(
      BroadcastIntervalJoinExec.MaxBuildBytesKey, (256L << 20).toString).toLong
    val bKeyProj = UnsafeProjection.create(buildKeys, build.output)
    val bIvProj = UnsafeProjection.create(Seq(dbl(bStart), dbl(bEnd)), build.output)
    val grouped = scala.collection.mutable.HashMap
      .empty[UnsafeRow, scala.collection.mutable.ArrayBuffer[(Double, Double, InternalRow)]]
    var nRows = 0L
    var nBytes = 0L
    val buildIter = build.executeToIterator()
    while (buildIter.hasNext) {
      val row = buildIter.next()
      nRows += 1
      row match {
        case u: UnsafeRow => nBytes += u.getSizeInBytes
        case _ => ()
      }
      if (nRows > maxRows || nBytes > maxBytes)
        throw new IllegalStateException(
          s"BroadcastIntervalJoinExec build side exceeds the broadcast " +
            s"bound ($nRows rows / $nBytes bytes; limits " +
            s"${BroadcastIntervalJoinExec.MaxBuildRowsKey}=$maxRows, " +
            s"${BroadcastIntervalJoinExec.MaxBuildBytesKey}=$maxBytes). " +
            "Use graft.operators.RangeJoin.overlap (binned shuffle " +
            "decomposition) or RangeJoin.overlapAuto for this size.")
      val k = bKeyProj(row)
      if (!k.anyNull) {
        val iv = bIvProj(row)
        if (!iv.isNullAt(0) && !iv.isNullAt(1)) {
          grouped.getOrElseUpdate(k.copy(),
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((iv.getDouble(0), iv.getDouble(1), row.copy()))
        }
      }
    }
    val table: Map[UnsafeRow, IntervalTable] =
      grouped.map { case (k, v) =>
        val sorted = v.sortBy(_._1).toArray
        val starts = sorted.map(_._1)
        val ends = sorted.map(_._2)
        val maxEnds = new Array[Double](ends.length)
        var run = Double.NegativeInfinity
        var i = 0
        while (i < ends.length) {
          if (ends(i) > run) run = ends(i)
          maxEnds(i) = run
          i += 1
        }
        k -> IntervalTable(starts, ends, maxEnds, sorted.map(_._3))
      }.toMap
    val bcast = sparkContext.broadcast(table)

    val sKeysLocal = streamKeys
    val sIvLocal = Seq(dbl(sStart), dbl(sEnd))
    val streamedOutput = streamed.output
    val allOutput = output
    val outRows = longMetric("numOutputRows")
    val steps = longMetric("probeSteps")

    streamed.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(sKeysLocal, streamedOutput)
      val ivProj = UnsafeProjection.create(sIvLocal, streamedOutput)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOutput, allOutput)
      val lookup = bcast.value
      iter.flatMap { row =>
        val k = keyProj(row)
        val iv = ivProj(row)
        if (k.anyNull || iv.isNullAt(0) || iv.isNullAt(1)) Iterator.empty
        else lookup.get(k) match {
          case None => Iterator.empty
          case Some(t) =>
            val s = iv.getDouble(0); val e = iv.getDouble(1)
            // first index whose prefix-max end reaches s: everything
            // before it ends strictly left of the probe — binary search
            // on the non-decreasing maxEnds
            var lo = 0
            var hi = t.starts.length
            while (lo < hi) {
              val m = (lo + hi) >>> 1
              if (t.maxEnds(m) >= s) hi = m else lo = m + 1
            }
            val from = lo
            new Iterator[InternalRow] {
              private var i = from
              private var nextRow: InternalRow = _
              private def advance(): Unit = {
                nextRow = null
                while (nextRow == null && i < t.starts.length && t.starts(i) <= e) {
                  steps += 1
                  if (t.ends(i) >= s) nextRow = t.rows(i)
                  i += 1
                }
              }
              advance()
              override def hasNext: Boolean = nextRow != null
              override def next(): InternalRow = {
                val b = nextRow
                advance()
                outRows += 1
                outProj(joined(row, b))
              }
            }
        }
      }
    }
  }
}
