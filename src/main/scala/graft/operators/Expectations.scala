package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation suite a
  * pipeline runs against a freshly-landed table before letting it into
  * training (the Great-Expectations/dbt-test idea, expressed as Spark
  * aggregates). Each check compiles to ONE combinable aggregation (or
  * one anti-join count for referential checks); a suite is the union of
  * its one-row reports: `(check_name, table_name, violations, status)`.
  *
  * Scale shape: every check is a single `count(CASE WHEN violated)`
  * aggregate — map-side partials, one row out, no data movement beyond
  * the scan. [[refIntegrity]] is a null-producing left join from child
  * to parent keys counted on miss — at scale that is the standard
  * shuffled equi-join on the key (AQE broadcasts the parent side when
  * it is dimension-sized). Checks over the same table could share one
  * scan via a combined agg; they are kept one-aggregate-per-check so a
  * suite can mix tables and a failed check names itself.
  */
object Expectations {

  private def report(name: String, table: String, violations: Column,
      df: DataFrame): DataFrame =
    df.agg(violations.cast("long").as("violations"))
      .select(
        lit(name).as("check_name"),
        lit(table).as("table_name"),
        col("violations"),
        when(col("violations") === 0, lit("pass")).otherwise(lit("fail"))
          .as("status"))

  /** Rows where `c` is NULL. */
  def expectNotNull(df: DataFrame, table: String, c: String): DataFrame =
    report(s"not_null($c)", table,
      count(when(col(c).isNull, lit(1))), df)

  /** Rows beyond the first occurrence of their `cols` key (0 ⇔ the key
    * is unique). Distinct is the one shuffle — on the key only.
    */
  def expectUnique(df: DataFrame, table: String, cols: Seq[String]): DataFrame = {
    val dups = df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
    dups.select(
      lit(s"unique(${cols.mkString(",")})").as("check_name"),
      lit(table).as("table_name"),
      col("violations"),
      when(col("violations") === 0, lit("pass")).otherwise(lit("fail"))
        .as("status"))
  }

  /** Non-null rows outside [lo, hi]. */
  def expectBetween(df: DataFrame, table: String, c: String,
      lo: Double, hi: Double): DataFrame =
    report(s"between($c,$lo,$hi)", table,
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), lit(1))), df)

  /** Non-null rows whose `c` is not in `allowed`. */
  def expectInSet(df: DataFrame, table: String, c: String,
      allowed: Seq[String]): DataFrame =
    report(s"in_set($c)", table,
      count(when(col(c).isNotNull && !col(c).isin(allowed: _*), lit(1))), df)

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (orphans; NULL child keys are orphans too — gate them separately
    * with [[expectNotNull]] if NULLs are legal).
    */
  def refIntegrity(child: DataFrame, childTable: String, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey).as("__k"))
      .join(parent.select(col(parentKey).as("__k")).distinct(),
        Seq("__k"), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphans.select(
      lit(s"ref($childKey→$parentKey)").as("check_name"),
      lit(childTable).as("table_name"),
      col("violations"),
      when(col("violations") === 0, lit("pass")).otherwise(lit("fail"))
        .as("status"))
  }

  /** Total row count within [lo, hi] — violations is the distance to
    * the nearer bound (0 when inside).
    */
  def expectRowCount(df: DataFrame, table: String, lo: Long, hi: Long): DataFrame =
    df.agg(count(lit(1)).as("__n"))
      .select(
        lit(s"row_count($lo,$hi)").as("check_name"),
        lit(table).as("table_name"),
        when(col("__n") < lo, lit(lo) - col("__n"))
          .when(col("__n") > hi, col("__n") - hi)
          .otherwise(lit(0L)).cast("long").as("violations"),
        when(col("__n").between(lo, hi), lit("pass")).otherwise(lit("fail"))
          .as("status"))

  /** A suite is the union of its checks' one-row reports. */
  def suite(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    checks.reduce(_.unionByName(_))
  }
}
