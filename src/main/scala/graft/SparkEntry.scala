package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{EventsQ, Pipeline, Relational, VcfQ}

/** Driver contract — see SURVEY.md §7.
  *
  * `queries` is the correctness-gated operator surface: one entry per
  * implemented operator family from SURVEY.md §2 plus the
  * training-data-pipeline operators; `oracleSql` holds the equivalent
  * DuckDB SQL (omitted only for genuinely non-SQL-expressible ops,
  * which get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on sf=0.001: the reference's canonical read pattern
    * (filter → distinct → join → aggregate, SURVEY §3.2) over the
    * testdata star schema. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, d)
    val ord = Tables.orders(spark, d)
    val cust = Tables.customer(spark, d)
    val nation = broadcast(Tables.nation(spark, d))
    li.filter(col("l_discount") < 0.05)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        countDistinct("o_orderkey").as("n_orders"))
      .orderBy(col("revenue").desc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ EventsQ.queries ++ Pipeline.queries ++ VcfQ.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ EventsQ.oracle ++ Pipeline.oracle ++ VcfQ.oracle
}
