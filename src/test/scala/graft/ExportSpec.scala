package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.vcf._

/** BGZF VCF export: parallel compression, tabix indexing, round trips. */
class ExportSpec extends SparkSpec {

  private def parsedRows(v: VcfDataset): Seq[String] = {
    val cols = v.df.columns.sorted.toSeq
    v.df.selectExpr(cols.map(c => s"`$c`"): _*)
      .orderBy("chr", "pos", "ref", "alt")
      .collect().map(_.toString).toSeq
  }

  test("exportVcf → re-read round trip preserves the parse exactly") {
    val orig = VcfReader.fromLines(spark, ToyVcf.lines)
    val out = Files.createTempDirectory("graft_export").resolve("toy.vcf.gz").toString
    VcfExport.exportVcf(orig, out, blockData = 256)
    assert(new java.io.File(out).exists && new java.io.File(out + ".tbi").exists)
    val back = VcfReader.read(spark, out, splitSize = Some(512L))
    assert(back.header == orig.header, "header must round-trip")
    assert(parsedRows(back) == parsedRows(orig))
  }

  test("exported file is range-queryable via its own tabix index") {
    val orig = VcfReader.fromLines(spark, ToyVcf.lines)
    val out = Files.createTempDirectory("graft_export_rq").resolve("toy.vcf.gz").toString
    VcfExport.exportVcf(orig, out, blockData = 200)
    val ranged = VcfReader.readRange(spark, out, "2", 200L, 300L)
    assert(ranged.df.select("pos").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSeq == Seq(250L))
  }

  test("multi-partition synthetic export assembles in order") {
    val n = 3000
    val vcf = SyntheticVcf.generate(spark, n.toLong, 3, 20)
    val out = Files.createTempDirectory("graft_export_big").resolve("big.vcf.gz").toString
    VcfExport.exportVcf(vcf, out, index = true, blockData = 4096)
    val back = VcfReader.read(spark, out, splitSize = Some(64L << 10))
    assert(back.df.count() == n)
    // positions must be sorted within each chromosome (tabix accepted it,
    // but assert directly too)
    val chr7 = back.df.where(col("chr") === "7").select("pos")
      .collect().map(_.getLong(0)).toSeq
    assert(chr7 == chr7.sorted && chr7.nonEmpty)
  }

  test("exportSharded: directory of shards re-reads without assembly") {
    val n = 2000
    val vcf = SyntheticVcf.generate(spark, n.toLong, 2, 10)
    val dir = Files.createTempDirectory("graft_export_shards").resolve("out").toString
    VcfExport.exportSharded(vcf, dir, blockData = 4096, numShards = Some(4))
    val shards = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".vcf.gz"))
    assert(shards.length > 1, s"expected multiple shards, got ${shards.length}")
    val back = VcfReader.read(spark, dir)
    assert(back.df.count() == n)
    assert(back.header.samples == Seq("S0", "S1"))
  }
}
