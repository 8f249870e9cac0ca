package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions._

/** Dataset-mixture sampling: rebalance a corpus across its sources
  * (domains) with *data-dependent*, deterministic keep-rates — the
  * "domain mixing" stage of a training-data pipeline (cf. The Pile /
  * DoReMi-style mixture weighting), where each source's sampling rate
  * is computed from its measured size rather than fixed up front.
  *
  * Determinism: membership is `md5(id) mod 1e6 < threshold`, so the
  * same row keeps/drops on any engine, any partitioning, any run —
  * the property `rand()`-based sampling lacks (and the DuckDB oracle
  * replays exactly). Thresholds are integer bucket counts computed
  * with double floor, identical IEEE arithmetic in any engine.
  */
object Mixture {

  private val Buckets = 1000000L

  /** Per-group keep-rate thresholds targeting `weight(group) ·
    * targetRows` rows per group (capped at the group's actual count).
    * Input: the corpus and a target share per group value; groups
    * absent from `weights` get weight 0 (dropped).
    */
  def thresholds(df: DataFrame, groupCol: String,
      weights: Map[String, Double], targetRows: Long): DataFrame = {
    require(weights.values.forall(_ >= 0), "weights must be non-negative")
    val total = weights.values.sum
    require(total > 0, "weights must not all be zero")
    val session = df.sparkSession
    import session.implicits._
    val w = weights.toSeq.toDF(groupCol, "_w")
    df.groupBy(groupCol).agg(count(lit(1)).as("_n"))
      .join(broadcast(w), Seq(groupCol), "left")
      .select(col(groupCol),
        col("_n"),
        floor(least(
          coalesce(col("_w"), lit(0d)) / total * targetRows / col("_n"), lit(1d))
          * Buckets).cast("long").as("_thr"))
  }

  /** Downsample every group to (at most) the target implied by
    * `weights` over `targetRows` total rows. The threshold table is a
    * tiny per-group aggregate that broadcasts; the data-side pass is a
    * single filter — no shuffle of the payload at any scale.
    */
  def sampleToMixture(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], targetRows: Long): DataFrame =
    df.join(broadcast(thresholds(df, groupCol, weights, targetRows)), Seq(groupCol))
      .where(pmod(md5Long(col(idCol)), lit(Buckets)) < col("_thr"))
      .drop("_n", "_thr")

  /** Balance the corpus: downsample every group to the size of the
    * smallest group (uniform mixture), deterministically. Rows with a
    * NULL group are dropped (the equi-join on the group key is
    * null-rejecting) — route unattributed rows to a sentinel group
    * first if they must survive. Equivalent
    * to `sampleToMixture` with equal weights and `targetRows =
    * nGroups · min(count)`, but computed directly from the group
    * counts so no caller-side count is needed.
    */
  def balance(df: DataFrame, idCol: String, groupCol: String): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("_n"))
    val minc = counts.agg(min("_n").as("_min"))
    val thr = counts.crossJoin(broadcast(minc))
      .select(col(groupCol),
        floor(col("_min").cast("double") / col("_n") * Buckets)
          .cast("long").as("_thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .where(pmod(md5Long(col(idCol)), lit(Buckets)) < col("_thr"))
      .drop("_thr")
  }
}
