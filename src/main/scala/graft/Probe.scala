package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.vcf.VcfApi

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

    val out = "/tmp/graft_refscale_db"
    val nGenes = 23506

    val impact = spark.read.parquet(s"$out/variant_impact")
    val idx = VcfApi.buildGeneIndex(impact)
    println(s"[probe] gene index built: ${idx.ids.size} genes")

    val genes = (0 until 100).map(k => s"GENE${(k * 233) % nGenes}")

    def bench(tag: String, info: DataFrame, action: DataFrame => Unit): Unit = {
      action(VcfApi.filterByGeneIndexed(idx, info, "GENE1", afMax = 0.05)) // warm
      val ts = genes.map { g =>
        val t0 = System.nanoTime()
        action(VcfApi.filterByGeneIndexed(idx, info, g, afMax = 0.05))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $tag%-40s median ${ts(50)}%.4f p95 ${ts(95)}%.4f max ${ts.last}%.4f")
    }

    // variant A: current refscale shape — coalesce(32).cache, count()
    val infoA = spark.read.parquet(s"$out/variant_info").coalesce(32).cache()
    println(s"[probe] infoA rows ${infoA.count()}")
    bench("A coalesce32/count", infoA, _.count())
    bench("B coalesce32/collect", infoA, _.collect())
    infoA.unpersist()

    // variant C: small cache batches (tighter batch stats -> more In-pruning)
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "2000")
    val infoC = spark.read.parquet(s"$out/variant_info").coalesce(32).cache()
    infoC.count()
    bench("C batch2k/collect", infoC, _.collect())
    bench("C2 batch2k/count", infoC, _.count())
    infoC.unpersist()

    // variant D: 8 partitions, small batches
    val infoD = spark.read.parquet(s"$out/variant_info").coalesce(8).cache()
    infoD.count()
    bench("D batch2k p8/collect", infoD, _.collect())
    infoD.unpersist()

    spark.stop()
  }
}
