package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: a SparkSession configured the way this engine
  * expects — AQE (with skew-join handling) on, sane local shuffle
  * partitioning, UTC, graft SQL functions registered. On a cluster the
  * same settings come from spark-defaults plus
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftSession {

  def builder(master: String = sys.env.getOrElse("SPARK_MASTER", "local[*]"),
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new graft.plans.GraftExtensions)

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    graft.plans.GraftExtensions.ensureRegistered(spark)
    spark
  }
}
