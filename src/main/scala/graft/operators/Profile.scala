package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Data profiling: the survey pass a pipeline runs before touching a
  * new 100 TB corpus — per-column row/null/distinct counts plus typed
  * extrema, ALL columns in ONE aggregation job (a per-column loop of
  * `df.select(...).agg(...)` would scan the input once per column).
  * Numeric extrema land in `min_num`/`max_num`, string extrema in
  * `min_str`/`max_str`; other types profile counts only.
  */
object Profile {

  /** One output row per requested column:
    * `column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    * max_str`. `n_distinct` is exact (`count(DISTINCT)`); pass
    * `approxDistinct = true` to use HLL (`approx_count_distinct`) when
    * exact cardinality would dominate the job at scale.
    */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val schema = df.schema
    val aggs = cols.flatMap { c =>
      val f = schema(c)
      val distinct =
        if (approxDistinct) approx_count_distinct(col(c))
        else count_distinct(col(c))
      Seq(
        count(lit(1)).as(s"__rows_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nulls_$c"),
        distinct.as(s"__dist_$c")) ++ (f.dataType match {
        case _: NumericType => Seq(
          min(col(c)).cast("double").as(s"__minn_$c"),
          max(col(c)).cast("double").as(s"__maxn_$c"))
        case StringType => Seq(
          min(col(c)).as(s"__mins_$c"),
          max(col(c)).as(s"__maxs_$c"))
        case _ => Seq.empty
      })
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row into one row per column
    val rows = cols.map { c =>
      val f = schema(c)
      val (minN, maxN) = f.dataType match {
        case _: NumericType => (col(s"__minn_$c"), col(s"__maxn_$c"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minS, maxS) = f.dataType match {
        case StringType => (col(s"__mins_$c"), col(s"__maxs_$c"))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      struct(
        lit(c).as("column"),
        col(s"__rows_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__dist_$c").as("n_distinct"),
        minN.as("min_num"), maxN.as("max_num"),
        minS.as("min_str"), maxS.as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
