package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering, the
  * technique lakehouse table formats use (Delta OPTIMIZE ZORDER BY,
  * Iceberg sort orders) to make parquet min/max statistics prune on
  * MORE THAN ONE column. Sorting by the bit-interleaved Z-value keeps
  * rows close in BOTH dimensions close in the file order, so a
  * selective filter on either column (or both) touches a small band of
  * row groups instead of the whole table — the property a plain sort
  * only gives its leading column.
  *
  * The Z-value is a pure column expression (shift/mask/or — codegen'd,
  * and exactly replicable in any engine with integer bit ops).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * int columns: result bit `2i+1` is bit `i` of `x`, bit `2i` is
    * bit `i` of `y`. `bits` ≤ 31 keeps everything in a positive long.
    */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xs = x.cast("long"); val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL over expressions `x`/`y`
    * (DuckDB/engine-portable), for oracle parity checks.
    */
  def zValueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((($x) >> $i) & 1) << ${2 * i + 1}) | (((($y) >> $i) & 1) << ${2 * i})"
    }.mkString("(", " | ", ")")

  /** Rewrite `df` into a Z-ordered layout over two dimension columns:
    * range-partition on the Z-value (balanced output files even when
    * the dimensions are skewed — range boundaries come from a sampled
    * sketch), then sort within each partition, so every output file
    * covers a compact Z-range ⇒ compact ranges in BOTH dimensions ⇒
    * parquet/scan-level min-max pruning works for either predicate.
    */
  def zorder(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val z = zValue(col(xCol), col(yCol), bits).as("_z")
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
