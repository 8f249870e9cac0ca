package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}
import graft.Tables

/** Scratch perf probe (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    val docs = Tables.documents(spark, d)
      .withColumn("len_bucket", (col("n_chars") / lit(50)).cast("long"))

    time("ngramJaccardPairs")(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        Seq("lang", "len_bucket"), 2, 0.5).count())
    time("ngramJaccardPairs warm")(
      Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        Seq("lang", "len_bucket"), 2, 0.5).count())
    time("minHashLsh")(
      Dedup.minHashLsh(docs, "text", "doc_id", 16, 4, 2, 0.5).count())
    time("simHash")(
      Dedup.simHashFingerprints(docs, "text", "doc_id", 16).count())
    val emb = Tables.embeddings(spark, d)
    time("bruteForceKnn")(
      Similarity.bruteForceKnn(emb, emb.filter(col("vec_id") < 5),
        "embedding", "vec_id", 5).count())
    time("lshKnn")(
      Similarity.lshKnn(emb, emb.filter(col("vec_id") < 5),
        "embedding", "vec_id", 5, 6, 1).count())
    spark.stop()
  }
}
