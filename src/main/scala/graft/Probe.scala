package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vcf.VcfApi

/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def forceRun(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sfDir = "/root/testdata/sf0.1"

    // century customer tier cost check (bench pre-flight)
    val tEnsure = time {
      ScaleUp.ensure(spark, sfDir, "/tmp/graft_sf10_linkage", 100,
        only = Seq("customer"))
    }
    println(f"[probe] customer century ensure: $tEnsure%.1f s")
    val custDir = "/tmp/graft_sf10_linkage"
    Seq("q300_record_linkage", "q306_linkage_one_to_one").foreach { n =>
      val tB = time(forceRun(SparkEntry.queries(n)(spark, sfDir)))
      val t1 = time(forceRun(SparkEntry.queries(n)(spark, custDir)))
      println(f"[probe] $n%-28s base $tB%.2f s  100x $t1%.2f s  exp ${math.log(t1 / tB) / math.log(100d)}%.3f")
    }

    // LD tier cost check
    def ldTier(nVariants: Long): Double = {
      val info = spark.range(1L, nVariants + 1).select(
        col("id").as("variant_id"), lit("1").as("chr"),
        (col("id") * 75L + pmod(xxhash64(col("id")), lit(50L))).as("start"))
      val geno = spark.range(1L, nVariants + 1)
        .select(col("id").as("variant_id"))
        .crossJoin(spark.range(0L, 24L).select(col("id").as("__s")))
        .select(col("variant_id"),
          concat(lit("s"), col("__s")).as("sample"),
          pmod(xxhash64(col("variant_id"), col("__s")), lit(3L))
            .cast("double").as("gt"))
      time {
        val n = VcfApi.ldPrune(geno, info, maxDist = 1000L, r2Max = 0.5).count()
        require(n == nVariants, s"ldPrune emitted $n of $nVariants")
      }
    }
    println(f"[probe] ldTier 20k:  ${ldTier(20000L)}%.2f s")
    println(f"[probe] ldTier 2M:   ${ldTier(2000000L)}%.2f s")

    spark.sparkContext.setLogLevel("OFF")
    try spark.stop() catch { case _: Throwable => () }
  }
}
