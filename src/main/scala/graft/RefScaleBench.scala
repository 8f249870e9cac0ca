package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vcf.{SyntheticVcf, VcfApi, VcfBuild, VcfPipeline}

/** One-shot benchmark at the REFERENCE'S OWN SCALE: the exome DB
  * behind every BASELINE.md number is ~1,417,043 variants × 1,000
  * samples × 23,506 genes (`benchmarks/00-benchmark-functions.R:58`,
  * `02-benchmark-variant-pull-genes.R:3-15`) — ~1.4B genotype rows.
  * The nightly `Bench` fixture is 50k×100 for runtime reasons; this
  * main exists so the "within 2× of the reference" claim is measured
  * at the reference's data shape, not extrapolated from it.
  *
  * Usage:  SPARK_DRIVER_MEM=96g sbt "runMain graft.RefScaleBench"
  *         [nVariants nSamples nGenes] override the exome shape.
  * Emits one JSON line (metrics in seconds) and writes a sidecar to
  * /tmp/graft_refscale.json.
  */
object RefScaleBench {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Kinship at biobank sample WIDTH (`RefScaleBench kinship [samples
    * variants blocks]`): the KING/GRM pair volume is O(variants·S²) —
    * at 10k+ samples it dwarfs the 2,504-wide genome runs, and the
    * grid decomposition (samplePairGrid, the KING `--parallel` shape)
    * is what keeps any single task's pair volume at ⌈S/B⌉² instead of
    * S². This mode measures that claim at ≥10k synthetic samples and
    * emits `king_blocked_sec` / `grm_blocked_sec` plus the exact pair
    * count, so the blocked path's latency is a recorded number rather
    * than an untested branch.
    */
  private def kinshipBench(spark: SparkSession, args: Array[String]): Unit = {
    val nSamples = args.lift(1).map(_.toInt).getOrElse(10000)
    val nVariants = args.lift(2).map(_.toLong).getOrElse(32L)
    val blocks = args.lift(3).map(_.toInt).getOrElse(16)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("n_samples") = nSamples.toDouble
    results("n_variants") = nVariants.toDouble
    results("sample_blocks") = blocks.toDouble
    System.err.println(s"[refscale] kinship $nVariants x $nSamples, B=$blocks")
    // shape-keyed path: skipComplete would otherwise silently reuse a
    // PRIOR run's differently-shaped DB (the r11 50k run first measured
    // r9's 10k×32 parquet because both wrote one fixed path)
    val out = s"/tmp/graft_refscale_kinship_db_${nSamples}x$nVariants"
    val tables = VcfBuild.build(
      SyntheticVcf.generate(spark, nVariants, nSamples, nGenes = 10))
    tables.write(out, skipComplete = true)
    VcfBuild.clearCaches()
    val geno = spark.read.parquet(s"$out/variant_geno")
    geno.count() // warm page cache / file listing out of the timed runs
    val (kingPairs, kingSec) = time(
      VcfApi.kingReport(geno, maxVariants = 0L, sampleBlocks = blocks).count())
    results("king_blocked_sec") = kingSec
    results("king_pairs") = kingPairs.toDouble
    val (_, grmSec) = time(
      VcfApi.grmReport(geno, maxVariants = 0L, sampleBlocks = blocks).count())
    results("grm_blocked_sec") = grmSec
    val line = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{\"metric\":\"refscale_kinship\",", ",", "}")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_refscale_kinship.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.sparkContext.setLogLevel("OFF")
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }

  def main(args: Array[String]): Unit = {
    val kinshipMode = args.headOption.contains("kinship")
    val nVariants =
      if (kinshipMode) 0L else args.lift(0).map(_.toLong).getOrElse(1417043L)
    val nSamples = if (kinshipMode) 0 else args.lift(1).map(_.toInt).getOrElse(1000)
    val nGenes = if (kinshipMode) 0 else args.lift(2).map(_.toInt).getOrElse(23506)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // the sorted wide scan is ~40 KB/row at 1,000 samples; 256 sort
      // partitions keep each under ~250 MB so the global sort and the
      // staging write never build multi-GB partitions
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/tmp/graft_refscale_spill")
      // the staging cache must not build wide columnar batches on heap
      // at this row width — first attempt at 1.4M×1000 GC-starved a
      // 96 GB heap until the executor's heartbeats expired (local-mode
      // self-exit after 60 misses). DISK_ONLY + GC-tolerant heartbeats.
      .config("spark.graft.stagingStorage", "DISK_ONLY")
      // DISK_ONLY persists serialize through JavaSerializer, and
      // spark.rdd.compress defaults to FALSE — the first full-shape run
      // wrote the ~56 GB wide sorted cache uncompressed and ENOSPC'd a
      // 100 GB disk mid-build. lz4 on persisted blocks is a ~10× cut
      // here (repetitive genotype strings) for a few % CPU.
      .config("spark.rdd.compress", "true")
      .config("spark.executor.heartbeatInterval", "30s")
      .config("spark.network.timeout", "600s")
      // 2k-row cache batches (default 10k): the per-gene IN-list
      // filter prunes cached batches by min/max stats, and the gene's
      // ~60 ids land in ~60 batches regardless of batch size — smaller
      // batches shrink the scanned fraction ~5× (measured: median
      // 0.039 → 0.034 s/gene; p95 0.054 → 0.043)
      .config("spark.sql.inMemoryColumnarStorage.batchSize", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (kinshipMode) { kinshipBench(spark, args); return }

    val out = "/tmp/graft_refscale_db"
    // a killed-by-ENOSPC run is silent until the stack trace — narrate
    // section progress + free disk so a dead log is diagnosable
    def mark(s: String): Unit = {
      val free = new java.io.File("/tmp").getUsableSpace >> 30
      System.err.println(s"[refscale] $s (free ${free} GiB)")
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    results("n_variants") = nVariants.toDouble
    results("n_samples") = nSamples.toDouble
    results("n_genes") = nGenes.toDouble

    // ---- build, the staged/resumable shape a corpus-scale ETL runs
    //      (VcfPipeline.run over a generated scan): the one wide stage
    //      commits to a staging parquet, derived tables re-read it ----
    val gen = SyntheticVcf.generate(spark, nVariants, nSamples, nGenes)
    val stagingDir = s"$out/_staging/ids"
    mark(s"staging build ${nVariants}x$nSamples")
    val (_, stagingSec) = time {
      if (!VcfPipeline.isComplete(spark, stagingDir)) {
        VcfBuild.withVariantIds(gen.df)
          .write.mode("overwrite").parquet(stagingDir)
        VcfBuild.clearCaches()
      }
    }
    mark(f"staging done in $stagingSec%.1f s; deriving tables")
    val (_, deriveSec) = time {
      VcfBuild.fromStaged(spark.read.parquet(stagingDir), gen.header)
        .write(out, skipComplete = true)
    }
    mark(f"derive done in $deriveSec%.1f s")
    results("build_staging_sec") = stagingSec
    results("build_derive_sec") = deriveSec
    results("build_sec") = stagingSec + deriveSec

    // info/impact cached (the reference's per-gene medians are measured
    // against a warm SQLite page cache over 23k sequential queries);
    // geno (~1.4B rows) stays on parquet — only the OS page cache warms
    val info = spark.read.parquet(s"$out/variant_info").coalesce(32).cache()
    val impact = spark.read.parquet(s"$out/variant_impact").coalesce(32).cache()
    info.count(); impact.count()
    val geno = spark.read.parquet(s"$out/variant_geno")
    results("geno_rows") = geno.count().toDouble

    mark(f"geno rows ${results("geno_rows")}%.0f; building gene index")
    // ---- gene index (the ETL-time analog of the reference's B-tree) ----
    val (geneIndex, idxSec) = time(VcfApi.buildGeneIndex(impact))
    results("gene_index_build_sec") = idxSec

    // ---- per-gene filter latency over 100 genes (baseline: median
    //      0.053 s, mean 0.061, p95 0.108 across all 23,506 genes on a
    //      warm DB; harness 00-benchmark-functions.R:68-102). The
    //      baseline times to collect() — the result rows landing in the
    //      client — so the headline metric does the same (single-stage
    //      job; the pruned IN-list scan returns ~50 rows). A count()
    //      variant is recorded too: its extra agg stage costs ~2× on a
    //      point query and is the honest number for count-shaped use ----
    val genes = (0 until 100).map(k => s"GENE${(k * 233) % nGenes}")
    VcfApi.filterByGeneIndexed(geneIndex, info, "GENE0", afMax = 0.05).collect()
    val perGene = genes.map(g =>
      time(VcfApi.filterByGeneIndexed(geneIndex, info, g, afMax = 0.05).collect())._2)
    val sortedT = perGene.sorted
    results("filter_per_gene_median_sec") = sortedT(perGene.size / 2)
    results("filter_per_gene_mean_sec") = perGene.sum / perGene.size
    results("filter_per_gene_p95_sec") = sortedT((perGene.size * 95) / 100)
    results("filter_per_gene_max_sec") = sortedT.last
    val perGeneCnt = genes.take(50).map(g =>
      time(VcfApi.filterByGeneIndexed(geneIndex, info, g, afMax = 0.05).count())._2)
    results("filter_per_gene_count_median_sec") =
      perGeneCnt.sorted.apply(perGeneCnt.size / 2)

    // ---- spilled-index form: buildGeneIndex guards driver heap by
    //      spilling the (gene, id) pairs to a cached DataFrame above
    //      10 M pairs; nothing at exome shape trips the guard
    //      naturally, so FORCE it (maxDriverIds=1) and record the
    //      spilled lookup's per-gene latency — the branch a 100k-gene
    //      annotation set would actually run ----
    val (spillIdx, spillIdxSec) = time {
      val idx = VcfApi.buildGeneIndex(impact, maxDriverIds = 1L)
      // materialize the spill cache inside the build timing — lazy
      // persist would otherwise bill the first lookup for it
      idx.spill.foreach(_.count())
      idx
    }
    results("gene_index_build_spilled_sec") = spillIdxSec
    VcfApi.filterByGeneIndexed(spillIdx, info, "GENE0", afMax = 0.05).collect()
    val perGeneSpill = genes.take(50).map(g =>
      time(VcfApi.filterByGeneIndexed(spillIdx, info, g, afMax = 0.05)
        .collect())._2)
    results("filter_per_gene_spilled_median_sec") =
      perGeneSpill.sorted.apply(perGeneSpill.size / 2)
    spillIdx.spill.foreach(_.unpersist(false))

    mark("per-gene filters done; ad-hoc + batched forms")
    // index-free ad-hoc form for reference
    val adHoc = (0 until 20).map(k => s"GENE${(k * 233) % nGenes}").map(g =>
      time(VcfApi.filterByGene(impact, info, g, afMax = 0.05).count())._2)
    results("filter_per_gene_noindex_median_sec") = adHoc.sorted.apply(adHoc.size / 2)

    // batched: every gene in ONE query (the scale path; reference runs
    // 23,506 sequential point queries ⇒ ~21 min at its median)
    val (_, batchedSec) = time {
      impact.select(col("variant_id"), col("symbol")).distinct()
        .join(info.filter(col("af") < 0.05), Seq("variant_id"))
        .groupBy("symbol").agg(count(lit(1)).as("n_vars")).count()
    }
    results("filter_all_genes_sec") = batchedSec
    results("filter_per_gene_batched_sec") = batchedSec / nGenes

    mark("gene filters done; genotype pulls")
    // ---- random-id genotype pull, marginal cost per 1k ids
    //      (baseline exome table mode: 12.4 s/1k at 1 core → 4.3 at 16;
    //      file mode: 1.8 → 0.46) ----
    val ids1k = (1L to 1000L).map(i => i * 104729L % nVariants + 1)
    VcfApi.pullByIds(geno, ids1k.take(50)).count() // warm
    val (_, pullSec) = time(VcfApi.pullByIds(geno, ids1k).count())
    results("pull_per_1k_sec") = pullSec
    // the baseline's random-pull metric is a fitted SLOPE (s per 1k
    // ids, least squares over a 50–5,000-id grid,
    // 03-benchmark-variant-pull-random.R:4-22) — replicate the grid so
    // the comparison is slope-vs-slope, not one fixed-overhead point
    // best-of-2 per grid point: a single ordered sweep confounds the
    // per-n cost with OS page-cache warmup of the geno parquet and
    // ambient load — two passes, min per point, isolates the real
    // (flat) profile
    val grid = Seq(50, 500, 1000, 2500, 5000)
    val gridT = grid.map { n =>
      val ids = (1L to n.toLong).map(i => i * 104729L % nVariants + 1)
      val t = (1 to 2).map(_ =>
        time(VcfApi.pullByIds(geno, ids).count())._2).min
      results(s"pull_${n}_sec") = t
      (n / 1000.0, t)
    }
    val mx = gridT.map(_._1).sum / grid.size
    val my = gridT.map(_._2).sum / grid.size
    val slope = gridT.map { case (x, y) => (x - mx) * (y - my) }.sum /
      gridT.map { case (x, _) => (x - mx) * (x - mx) }.sum
    results("pull_slope_sec_per_1k") = slope

    // ---- per-gene genotype pull (baseline: median 4.76 s across 58
    //      genes ≤2,000 vars, 1,000 samples) ----
    val pullGenes = (0 until 20).map(k => s"GENE${(k * 389) % nGenes}")
    val perGenePull = pullGenes.map(g =>
      time(VcfApi.pullByGene(impact, info, geno, g, afMax = 0.05).count())._2)
    results("pull_per_gene_median_sec") =
      perGenePull.sorted.apply(perGenePull.size / 2)

    val line = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{\"metric\":\"refscale\",", ",", "}")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/graft_refscale.json"),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.sparkContext.setLogLevel("OFF")
    try spark.stop() catch { case _: Throwable => () }
    println(line)
  }
}
