package graft

import org.apache.spark.sql.SparkSession
import graft.vcf.{SyntheticVcf, VcfBuild}

/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    // bench-shaped end-to-end, repeated; caches dropped between runs
    for (i <- 1 to 4) {
      val out = java.nio.file.Files.createTempDirectory(s"graft_probe_vcf$i").toString
      time(s"end-to-end run $i") {
        val t = VcfBuild.build(SyntheticVcf.generate(spark, 50000L, 100, 200))
        t.write(out); "ok"
      }
      VcfBuild.clearCaches()
    }
    spark.stop()
  }
}
