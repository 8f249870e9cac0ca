package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological
  * (one hot key swamping a single reducer — the classic 100 TB
  * failure mode that small-scale tests never surface).
  *
  * [[saltedJoin]] implements explicit key salting: the skewed (left)
  * side scatters each key across `salt` sub-keys by hashing a
  * tie-break column; the build (right) side replicates each row to all
  * `salt` sub-keys. The join then distributes a hot key over `salt`
  * reducers. AQE's skew-join handles sort-merge cases adaptively;
  * explicit salting remains the tool when AQE can't see the skew
  * (e.g. pre-shuffle aggregations or non-SMJ plans), and is exposed
  * here as a first-class operator.
  */
object Skew {

  /** Inner equi-join of `left` (skewed, large) with `right` (small
    * enough to replicate ×salt) on `keyCols`. Result equals the plain
    * inner join, row for row.
    *
    * @param scatterCol left-side column whose hash spreads a hot key's
    *                   rows across sub-keys (any reasonably-distributed
    *                   column; a monotonic id works)
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      scatterCol: String, salt: Int = 16): DataFrame = {
    require(salt > 0)
    val l = left.withColumn("__salt", pmod(hash(col(scatterCol)), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)).cast("array<int>")))
    l.join(r, keyCols :+ "__salt").drop("__salt")
  }

  /** ONE-aggregate skew probe: returns the salt factor to use (0 = no
    * salting warranted). A key is "hot" when the max per-key row count
    * is both ≥ `minHotRows` (absolute floor — tiny groups never need
    * salting) and > `hotFactor`× the mean (relative skew). The probe
    * is a single slim aggregate over the join key — cheap enough to
    * run before any recurring production join; the same decision rule
    * the LSH band join uses for its hot-bucket auto-salting.
    */
  def probeSalt(left: DataFrame, keyCols: Seq[String],
      hotFactor: Double = 10.0, minHotRows: Long = 32L,
      salt: Int = 16): Int = {
    val st = left.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(max(col("n")), avg(col("n"))).head()
    val hot = !st.isNullAt(0) && st.getLong(0) >= minHotRows &&
      st.getLong(0) > hotFactor * st.getDouble(1)
    if (hot) salt else 0
  }

  /** [[saltedJoin]] with the salt decision made by [[probeSalt]]:
    * salts only when the probe finds a genuinely hot key, otherwise
    * plans the plain equi-join (no ×salt replication of `right` paid
    * for uniform keys). Result equals the plain inner join either way.
    */
  def saltedJoinAuto(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      scatterCol: String, hotFactor: Double = 10.0,
      minHotRows: Long = 32L, salt: Int = 16): DataFrame = {
    val s = probeSalt(left, keyCols, hotFactor, minHotRows, salt)
    if (s > 0) saltedJoin(left, right, keyCols, scatterCol, s)
    else left.join(right, keyCols)
  }

  /** Per-key row counts with an approximate heavy-hitter flag — the
    * diagnostic used to decide whether salting is warranted.
    */
  def keySkewProfile(df: DataFrame, keyCols: Seq[String], hotFactor: Double = 10.0): DataFrame = {
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val stats = counts.agg(avg("n").as("avg_n")).head()
    val avgN = if (stats.isNullAt(0)) 0.0 else stats.getDouble(0) // empty input
    counts.withColumn("is_hot", col("n") > lit(avgN * hotFactor))
  }
}
