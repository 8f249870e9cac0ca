package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet testdata
  * (see TESTDATA.md). Every query receives the scale-factor directory
  * at call time, so the same query map runs at sf0.001/0.01/0.1 and,
  * unchanged, against a cluster-scale warehouse path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** All graft event-time operators do integer nanosecond arithmetic
    * on `events.ts` — exact and engine-independent. The testdata has
    * shipped `ts` both as nanosecond-precision parquet (Spark cannot
    * represent ns as TimestampType → `nanosAsLong` reads int64 ns
    * directly) and as µs TIMESTAMP/TIMESTAMP_NTZ; [[tsAsNanos]]
    * normalizes either shape to the same int64 epoch-ns values DuckDB's
    * `epoch_ns(ts)` sees (session timezone is UTC, so the NTZ
    * wall-clock → epoch mapping is identity).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsAsNanos(load(spark, dir, "events"))
  }

  /** Normalize an events frame's `ts` to int64 epoch-nanoseconds
    * regardless of the on-disk type (int64-ns, TIMESTAMP, or
    * TIMESTAMP_NTZ). Pure column expression — works on batch and
    * streaming frames alike and stays inside whole-stage codegen.
    */
  def tsAsNanos(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn(
        "ts",
        org.apache.spark.sql.functions.expr(
          "unix_micros(cast(ts as timestamp)) * 1000L"))
    }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
