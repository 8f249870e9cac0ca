package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

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

    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    for (i <- 1 to 3) {
      time(s"editDistancePairs run $i") {
        Dedup.editDistancePairs(docs, "text", "doc_id").count()
      }
      Dedup.clearCaches()
    }
    val out = Dedup.editDistancePairs(docs, "text", "doc_id")
    out.collect()
    println(out.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
