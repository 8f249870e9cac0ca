package graft

import graft.vcf._

/** Typed-model and pipeline-driver specs. */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tables = VcfBuild.build(VcfReader.fromLines(spark, ToyVcf.lines))

  test("typed Dataset views of the fixed core") {
    import VcfModel._
    val core = VcfModel.coreOf(tables).collect().sortBy(_.variant_id)
    assert(core.length == 6)
    assert(core.head == VariantCore(1, "1", 100, 100, "A", "G", Some(50.0), Some("PASS")))
    val g = VcfModel.genotypesOf(tables)
      .filter(_.variant_id == 3).collect().sortBy(_.sample)
    assert(g.map(_.gt).toSeq == Seq(None, Some(1.0)))
    val imp = VcfModel.impactsOf(tables).get
    assert(imp.filter(_.is_lof).map(_.variant_id).collect().distinct.sorted.toSeq ==
      Seq(2L, 5L))
  }

  test("filterByGeneIndexed ≡ filterByGene (and empty for unknown genes)") {
    val impact = tables.impact.get
    val idx = VcfApi.buildGeneIndex(impact)
    assert(idx.genes.toSet == Set("GENE1", "GENE2", "GENE3"))
    for (g <- Seq("GENE1", "GENE2", "GENE3")) {
      val a = VcfApi.filterByGene(impact, tables.info, g, afMax = 0.8)
        .select("variant_id", "symbol", "af")
        .collect().map(_.toString).sorted.toSeq
      val b = VcfApi.filterByGeneIndexed(idx, tables.info, g, afMax = 0.8)
        .select("variant_id", "symbol", "af")
        .collect().map(_.toString).sorted.toSeq
      assert(a == b && a.nonEmpty, s"$g: $a != $b")
    }
    assert(VcfApi.filterByGeneIndexed(idx, tables.info, "NOPE").count() == 0)
  }

  test("filterByGeneIndexed giant gene: semi-join fallback, no IN-list in plan") {
    // a gene with >1k variant ids must NOT plan as an IN-list predicate
    // (100k-node expression trees are a planning-time killer at genome
    // scale) — it takes the broadcast left-semi path and stays ≡ to the
    // join-based filterByGene
    val n = 2500
    val impact = (1 to n)
      .map(i => (i.toLong, if (i <= 1500) "BIG" else s"G${i % 7}"))
      .toDF("variant_id", "symbol")
    val info = (1 to n).map(i => (i.toLong, (i % 100) / 100.0))
      .toDF("variant_id", "af")
    val idx = VcfApi.buildGeneIndex(impact)
    assert(idx.ids("BIG").length == 1500)
    val indexed = VcfApi.filterByGeneIndexed(idx, info, "BIG", afMax = 0.5)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join fallback:\n$plan")
    assert(!plan.contains("INSET") && !plan.contains(" IN ("),
      s"giant gene must not plan an IN-list:\n$plan")
    val a = VcfApi.filterByGene(impact, info, "BIG", afMax = 0.5)
      .select("variant_id").as[Long].collect().sorted.toSeq
    val b = indexed.select("variant_id").as[Long].collect().sorted.toSeq
    assert(a == b && b.nonEmpty)
    // small gene keeps the IN-list point-lookup path (no join stages)
    val small = VcfApi.filterByGeneIndexed(idx, info, "G3", afMax = 0.5)
    assert(!small.queryExecution.executedPlan.toString.contains("LeftSemi"))
  }

  test("buildGeneIndex spills to a DataFrame-backed index above the driver cap") {
    val n = 2500
    val impact = (1 to n)
      .map(i => (i.toLong, if (i <= 1500) "BIG" else s"G${i % 7}"))
      .toDF("variant_id", "symbol")
    val info = (1 to n).map(i => (i.toLong, (i % 100) / 100.0))
      .toDF("variant_id", "af")
    // cap below the pair count → the driver map must stay empty and
    // lookups serve from the cached (symbol, variant_id) DataFrame
    val idx = VcfApi.buildGeneIndex(impact, maxDriverIds = 100L)
    assert(idx.ids.isEmpty && idx.spill.isDefined)
    // gene enumeration comes from the spill DataFrame
    assert(idx.genes.toSet == (0 until 7).map(i => s"G$i").toSet + "BIG")
    val a = VcfApi.filterByGene(impact, info, "BIG", afMax = 0.5)
      .select("variant_id").as[Long].collect().sorted.toSeq
    val b = VcfApi.filterByGeneIndexed(idx, info, "BIG", afMax = 0.5)
      .select("variant_id").as[Long].collect().sorted.toSeq
    assert(a == b && b.nonEmpty)
    assert(VcfApi.filterByGeneIndexed(idx, info, "NOPE").count() == 0)
    // same inputs under the cap still produce the driver-map form
    val driver = VcfApi.buildGeneIndex(impact)
    assert(driver.spill.isEmpty && driver.ids("BIG").length == 1500)
    idx.spill.foreach(_.unpersist(false))
  }

  test("VcfPipeline.run: end-to-end from a file, rerun-safe") {
    val dir = java.nio.file.Files.createTempDirectory("vcfpipe").toString
    val vcfFile = s"$dir/toy.vcf"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(vcfFile),
      ToyVcf.lines.mkString("\n").getBytes("UTF-8"))
    val out = s"$dir/db"
    VcfPipeline.run(spark, vcfFile, out)
    VcfPipeline.run(spark, vcfFile, out) // idempotent rerun
    assert(spark.read.parquet(s"$out/variant_info").count() == 6)
    assert(spark.read.parquet(s"$out/variant_geno").count() == 12)
  }

  test("VcfPipeline.run resumes from the last committed stage after a kill") {
    import java.nio.file.{Files, Paths, Path}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("vcfresume").toString
    val vcfFile = s"$dir/toy.vcf"
    Files.write(Paths.get(vcfFile),
      ToyVcf.lines.mkString("\n").getBytes("UTF-8"))
    val out = s"$dir/db"
    VcfPipeline.run(spark, vcfFile, out)
    assert(VcfPipeline.isComplete(spark, s"$out/_staging/ids"))

    // (relative name → (size, mtime)) + content digest: "skipped" must
    // mean byte-identical files never touched, not rewritten-same
    def files(sub: String): Map[String, (Long, Long)] = {
      val root = Paths.get(s"$out/$sub")
      Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => root.relativize(p).toString ->
          (Files.size(p), Files.getLastModifiedTime(p).toMillis)).toMap
    }
    def digest(sub: String): String = {
      val root = Paths.get(s"$out/$sub")
      val md = java.security.MessageDigest.getInstance("MD5")
      Files.walk(root).iterator().asScala.filter(Files.isRegularFile(_))
        .toSeq.sortBy(_.toString)
        .foreach(p => md.update(Files.readAllBytes(p)))
      md.digest().map(b => f"$b%02x").mkString
    }
    val stagingSig = files("_staging/ids")
    val infoSig = files("variant_info")
    val infoMd5 = digest("variant_info")

    // kill mid-geno-write: a torn output has no _SUCCESS marker (the
    // committer writes it last); drop the marker and a data file
    val genoDir = Paths.get(s"$out/variant_geno")
    Files.delete(genoDir.resolve("_SUCCESS"))
    Files.walk(genoDir).iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-"))
      .foreach(Files.delete)
    VcfPipeline.run(spark, vcfFile, out)
    // completed stages byte-identical and untouched; torn one recommitted
    assert(files("_staging/ids") == stagingSig,
      "resume re-ran the staging scan despite its commit marker")
    assert(files("variant_info") == infoSig && digest("variant_info") == infoMd5,
      "resume rewrote a committed table")
    assert(Files.exists(genoDir.resolve("_SUCCESS")))
    assert(spark.read.parquet(s"$out/variant_geno").count() == 12)

    // kill during staging: no staging marker → the scan re-runs (and
    // committed downstream tables still skip)
    Files.delete(Paths.get(s"$out/_staging/ids/_SUCCESS"))
    VcfPipeline.run(spark, vcfFile, out)
    assert(VcfPipeline.isComplete(spark, s"$out/_staging/ids"))
    assert(files("_staging/ids") != stagingSig, "staging was not rebuilt")
    assert(files("variant_info") == infoSig,
      "staging rebuild must not rewrite committed tables")
    assert(spark.read.parquet(s"$out/variant_info").count() == 6)
  }

  test("VcfPipeline.run writes a multiallelic TSV report then aborts") {
    val dir = java.nio.file.Files.createTempDirectory("vcfpipe2").toString
    val bad = ToyVcf.lines.map(l =>
      if (l.startsWith("1\t100")) l.replace("\tG\t", "\tG,C\t") else l)
    val vcfFile = s"$dir/bad.vcf"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(vcfFile), bad.mkString("\n").getBytes("UTF-8"))
    val out = s"$dir/db"
    intercept[IllegalArgumentException](VcfPipeline.run(spark, vcfFile, out))
    val report = spark.read.option("sep", "\t").option("header", "true")
      .csv(s"$out/multiallelic_sites")
    assert(report.count() == 1)
    assert(report.select("alt").as[String].head == "G,C")
  }

  test("GraftSession.getOrCreate registers graft functions") {
    val s = GraftSession.getOrCreate()
    assert(s.sql("SELECT graft_cosine(array(1.0d), array(1.0d))")
      .collect()(0).getDouble(0) == 1.0)
  }

  test("VcfApi.hweReport: equilibrium population scores χ² = 0") {
    import spark.implicits._
    // 25/50/25 at p = 0.5 is EXACTLY Hardy-Weinberg ⇒ χ² = 0; a
    // het-depleted 40/20/40 departs
    val eq = (Seq.fill(25)(0d) ++ Seq.fill(50)(1d) ++ Seq.fill(25)(2d))
      .map((1L, "s", _)) ++
      (Seq.fill(40)(0d) ++ Seq.fill(20)(1d) ++ Seq.fill(40)(2d))
        .map((2L, "s", _))
    val geno = eq.toDF("variant_id", "sample", "gt")
    val got = graft.vcf.VcfApi.hweReport(geno).orderBy("variant_id").collect()
    assert(got(0).getAs[Double]("p_ref") == 0.5)
    assert(got(0).getAs[Double]("hwe_chi2") == 0.0)
    // 40/20/40: e = (25, 50, 25) ⇒ χ² = 9 + 18 + 9 = 36
    assert(got(1).getAs[Double]("hwe_chi2") == 36.0)
  }
}
