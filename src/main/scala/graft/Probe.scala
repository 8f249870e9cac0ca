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
    def forceRun(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val sfDir = "/root/testdata/sf0.1"
    import graft.functions._

    val docs = Tables.documents(spark, sfDir)
    // stage dissection of q267: where do 4.4 s go for 5k docs?
    val toks = docs.select(tokens(col("text")).as("tk"))
    forceRun(toks)
    println(f"[probe] tokens only: ${time(forceRun(toks))}%.3f s")
    val sh = docs.select(wordShingles(tokens(col("text")), 3).as("sh"))
    forceRun(sh)
    println(f"[probe] shingles arr: ${time(forceRun(sh))}%.3f s")
    val ex = docs.select(explode(wordShingles(tokens(col("text")), 3)).as("t"))
    forceRun(ex)
    println(f"[probe] explode: ${time(forceRun(ex))}%.3f s")
    val freq = ex.groupBy("t").agg(count(lit(1)).as("__f"))
    forceRun(freq)
    println(f"[probe] groupBy freq: ${time(forceRun(freq))}%.3f s")
    val fin = graft.operators.TextAnalysis.unseenVocabEstimate(docs, "text", 3)
    forceRun(fin)
    println(f"[probe] q267 full: ${time(forceRun(fin))}%.3f s")
    // fix shape A: materialize tokens into a column first (attribute
    // capture in the lambda = O(1) slot read per element)
    val sh2 = docs.select(tokens(col("text")).as("__tk"))
      .select(explode(wordShingles(col("__tk"), 3)).as("t"))
    forceRun(sh2)
    println(f"[probe] explode w/ materialized toks: ${time(forceRun(sh2))}%.3f s")
    val freq2 = sh2.groupBy("t").agg(count(lit(1)).as("__f"))
    forceRun(freq2)
    println(f"[probe] groupBy freq w/ materialized toks: ${time(forceRun(freq2))}%.3f s")
    val n = docs.count()
    println(s"[probe] docs=$n")
    spark.stop()
  }
}
