package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val sfDir = "/root/testdata/sf0.1"

    // stream gate dissection: default temp checkpoint (/tmp, disk) vs
    // a RAM-backed checkpoint root
    def run(): Unit = {
      graft.streaming.EventsStream
        .runTumblingOnce(spark, sfDir, 3600L * 1000 * 1000 * 1000)
        .write.format("noop").mode("overwrite").save()
    }
    run() // warm
    println(f"[probe] tumbling default ckpt: ${time(run())}%.3f s")
    println(f"[probe] tumbling default ckpt (2): ${time(run())}%.3f s")
    spark.conf.set("spark.sql.streaming.checkpointLocation",
      "/dev/shm/graft_probe_ckpt")
    run() // warm with new root
    println(f"[probe] tumbling shm ckpt: ${time(run())}%.3f s")
    println(f"[probe] tumbling shm ckpt (2): ${time(run())}%.3f s")
    spark.conf.unset("spark.sql.streaming.checkpointLocation")
    spark.stop()
  }
}
