package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Pareto-frontier (skyline) selection — "keep every document no other
  * document beats on BOTH axes" (e.g. length vs. vocabulary richness,
  * quality vs. recency). A row p is dominated when some q has
  * q.x ≥ p.x ∧ q.y ≥ p.y with at least one strict; exact duplicates
  * don't dominate each other, so both survive.
  */
object Skyline {

  /** One sweep within `bucket`: group rows by x (gy = max y per x),
    * run a descending-x running max over the per-x groups (m1 = best y
    * among STRICTLY greater x), join back, and drop rows with
    * m1 ≥ y (beaten from the right) or gy > y (beaten at equal x).
    * The window walks distinct-x groups, not rows, so ties cost one
    * group row each.
    */
  private def pass(df: DataFrame, x: String, y: String, bucket: Column): DataFrame = {
    val grp = df.withColumn("__b", bucket)
      .groupBy(col("__b"), col(x)).agg(max(col(y)).as("__gy"))
    val wd = Window.partitionBy(col("__b")).orderBy(col(x).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = grp.withColumn("__m1", max(col("__gy")).over(wd))
    df.withColumn("__b", bucket)
      .join(ranked, Seq("__b", x))
      .where(!(coalesce(col("__m1") >= col(y), lit(false)) ||
        col("__gy") > col(y)))
      .drop("__b", "__gy", "__m1")
  }

  /** Distributed 2-D skyline: a deterministic salt
    * (md5(id) mod `nBuckets`) splits the corpus, each bucket computes
    * its LOCAL skyline (the sweep above — one shuffle on (bucket, x)),
    * and the surviving candidates — every global-skyline row is
    * undominated in its own bucket, so none are lost — take a second,
    * single-bucket pass. The global pass is bounded by the union of
    * local frontiers: worst case (all points Pareto-optimal) that IS
    * the answer, so no algorithm does better; typical corpora shrink
    * candidates by orders of magnitude before the single-partition
    * window runs.
    */
  def skyline2d(df: DataFrame, xCol: String, yCol: String, idCol: String,
      nBuckets: Int = 64): DataFrame = {
    val local = pass(df, xCol, yCol,
      pmod(md5Long(col(idCol)), lit(nBuckets.toLong)))
    pass(local, xCol, yCol, lit(0L))
  }
}
