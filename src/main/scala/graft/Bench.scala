package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.vcf.{SyntheticVcf, VcfApi, VcfBuild}

/** Benchmark main. Emits ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Every line carries a `load_index` (max/min of a fixed reference op
  * timed between sections): a self-diagnosis that distinguishes "the
  * code got slower" from "the machine was starved during the run".
  *
  * Two parts:
  *   1. every gated query from [[SparkEntry.queries]] on the SF dir,
  *      warmed up first at sf0.001 (plan compilation + JIT), forced
  *      with a noop sink (count() could let Catalyst prune work);
  *   2. a VCF-domain benchmark mirroring BASELINE.md's published
  *      metrics: build a synthetic VCF star schema, then
  *        vcf_filter_per_gene_sec  — median filterByGene latency
  *                                   (baseline: 0.053 s/gene exome)
  *        vcf_pull_per_1k_sec      — genotype pull marginal cost
  *                                   (baseline: 12.4→4.3 s/1k variants)
  *        vcf_build_sec            — end-to-end ETL for the fixture.
  */
object Bench {

  private def forceRun(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  /** Best-of-2 with an outlier re-run: when the two timings disagree by
    * more than `ratio`× one of them was noise (GC pause, CPU
    * starvation), so a third run breaks the tie. The r6 driver bench
    * recorded 59.8s for a sub-second groupBy under best-of-2 — a
    * contended machine needs more than two samples before its minimum
    * is believable.
    */
  private def bestOf(ratio: Double = 3.0)(body: => Unit): Double = {
    val t1 = time(body)
    val t2 = time(body)
    val lo = math.min(t1, t2)
    if (math.max(t1, t2) / math.max(lo, 1e-9) > ratio) math.min(lo, time(body))
    else lo
  }

  /** Fork `graft.streaming.StateBench <probes…>` as a child JVM with
    * this JVM's own flags/classpath, parse its `metric=… value=…`
    * lines, and hard-kill it past the deadline. A child segfault (the
    * RocksDB JNI logger crash) surfaces as a nonzero exit with the
    * already-printed probes intact — the parent never dies with it.
    */
  private def forkStateBench(probes: Seq[String], cpus: String,
      timeoutSec: Long = 300L): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
    val cmd = (Seq(javaBin) ++ jvmArgs ++
      Seq(
        // a teardown crash's hs_err belongs in tmp, not the repo cwd —
        // still written (diagnosable), never in the working tree even
        // when the capture was partial and the delete-below is skipped
        "-XX:ErrorFile=" + System.getProperty("java.io.tmpdir") +
          "/graft_statebench_hs_err_%p.log",
        "-cp", System.getProperty("java.class.path"),
        "graft.streaming.StateBench") ++ probes).asJava
    val pb = new ProcessBuilder(cmd)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    pb.redirectError(ProcessBuilder.Redirect.DISCARD)
    // hs_err files land in the child's cwd (= ours); snapshot what
    // exists so a crash log the CHILD writes can be removed below once
    // its metrics are safely captured — crash artifacts from a probe
    // whose data survived should not accumulate in the working tree
    def hsErrs(): Set[java.io.File] =
      Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("hs_err_pid") &&
          f.getName.endsWith(".log")).toSet
    val hsBefore = hsErrs()
    val proc = pb.start()
    val out = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    // stdout drained on a daemon thread so the deadline below can kill
    // a HUNG child (readLine alone would block past any deadline)
    val drain = new Thread(() => {
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      try {
        var l = reader.readLine()
        while (l != null) {
          val s = l.trim
          if (s.startsWith("metric=")) {
            val parts = s.split("\\s+value=")
            if (parts.length == 2)
              try out.put(parts(0).stripPrefix("metric="), parts(1).toDouble)
              catch { case _: NumberFormatException => () }
          }
          l = reader.readLine()
        }
      } catch { case _: Throwable => () }
      finally { try reader.close() catch { case _: Throwable => () } }
    }, "statebench-drain")
    drain.setDaemon(true)
    drain.start()
    if (!proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
      System.err.println(
        s"[bench] StateBench child hung past ${timeoutSec}s; killing it")
      proc.destroyForcibly()
      proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    } else if (proc.exitValue() != 0)
      System.err.println(
        s"[bench] StateBench child exited ${proc.exitValue()} after " +
          s"${out.size}/${probes.size} probes")
    drain.join(5000)
    // successful capture (every requested probe printed a metric) ⇒ any
    // crash log the child left behind is a teardown artifact, not lost
    // data — delete it so the tree stays free of hs_err files
    if (out.size == probes.size)
      (hsErrs() -- hsBefore).foreach { f =>
        if (f.delete())
          System.err.println(s"[bench] removed child crash log ${f.getName}")
      }
    out.asScala.toMap
  }

  /** Fixed reference op for the load index: a CPU-bound codegen'd
    * aggregation whose cost is machine-state-only (no IO, no shuffle,
    * nothing cached between calls). Timed at run start and after each
    * bench section; the ratio max/min across the run is the run's
    * `load_index` — ~1 on a quiet machine, large when the JVM was
    * GC/CPU-starved while some sections ran. This makes a poisoned run
    * self-labeling: r6's driver bench published 100× inflated timings
    * with nothing in the JSON to show the machine (not the code) was
    * sick.
    */
  private def loadProbe(spark: SparkSession): Double = {
    // min-of-2 per sample point: single runs of even this fixed op
    // jitter ±2× from scheduler wakeups alone; sustained contention
    // inflates both runs, which is the signal load_index is after.
    // TOTAL by design: a probe on a dead SparkContext (an OOM killed
    // an executor thread mid-run — observed r13) returns the −1
    // sentinel instead of throwing, so the final JSON — carrying every
    // section measured before the fault — always prints.
    def once = time(spark.range(50000000L).selectExpr("sum(id * 7)").collect())
    try math.min(once, once)
    catch { case _: Throwable => -1.0 }
  }

  def main(args: Array[String]): Unit = {
    // --isolate: measure every metric from a pinned-clean JVM state
    // (cache clear + full GC between metrics). Slower wall-clock, but
    // each number then reflects the operator alone instead of the
    // preceding section's heap/page-cache residue — the A/B mode that
    // attributes a cross-round regression to load vs. code.
    val flagArgs = args.filter(_.startsWith("--")).toSet
    val posArgs = args.filterNot(_.startsWith("--"))
    val isolate = flagArgs.contains("--isolate")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def clearAllCaches(): Unit = {
      graft.operators.Dedup.clearCaches()
      graft.operators.Percentiles.clearCaches()
      graft.operators.Curation.clearCaches()
    }
    def isoBarrier(): Unit = if (isolate) {
      spark.catalog.clearCache()
      clearAllCaches()
      System.gc(); Thread.sleep(200); System.gc()
    }

    // optional args = subset of query names (fast single-query timing)
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val names = if (posArgs.nonEmpty) allNames.filter(posArgs.toSet) else allNames

    // machine-state probes: sample at run start and after every
    // section (see loadProbe). The probe op must be at C2 steady state
    // before the baseline sample or JIT warm-up drift masquerades as a
    // 3× "load" swing (observed: 0.19s start → 0.06s end with a single
    // warm-up run), so burn it in until two consecutive runs agree
    val probes = scala.collection.mutable.LinkedHashMap[String, Double]()
    locally {
      var prev = loadProbe(spark)
      var stable = 0
      var i = 0
      while (stable < 2 && i < 15) {
        val t = loadProbe(spark)
        if (math.max(t, prev) / math.max(math.min(t, prev), 1e-9) < 1.2) stable += 1
        else stable = 0
        prev = t; i += 1
      }
    }
    probes("start") = loadProbe(spark)

    // Warmup at the smallest SF: pays codegen/JIT once so measured
    // numbers reflect steady-state execution, like the reference's
    // per-gene loops after the first gene.
    names.foreach { n =>
      try forceRun(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
      graft.operators.Dedup.clearCaches(); graft.operators.Percentiles.clearCaches(); graft.operators.Curation.clearCaches()
    }

    // repeated runs measure steady state (shuffle files, code cache,
    // page cache warm) — the regime a long-lived cluster session
    // actually operates in; bestOf adds a third run when the first two
    // disagree wildly (contended machine)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    names.foreach { n =>
      isoBarrier()
      results(n) =
        try bestOf()(forceRun(SparkEntry.queries(n)(spark, sfDir)))
        catch { case _: Throwable => -1.0 }
      // dedup signature caches are per-call; don't let 58 queries × N
      // runs accumulate cached tables in one JVM
      clearAllCaches()
    }
    probes("after_queries") = loadProbe(spark)

    // Section barrier: the 140-query sweep leaves cached relations,
    // shuffle files, and a fragmented old-gen behind; measured
    // standalone the VCF build runs 5-6 s, inside a dirty JVM it has
    // recorded 30 s. Clear every cache this process can reach and ask
    // for a full GC so the BASELINE comparables measure the operators,
    // not the preceding benchmark's garbage.
    spark.catalog.clearCache()
    clearAllCaches()
    System.gc(); Thread.sleep(500); System.gc()

    // ---- VCF-domain benchmark (BASELINE.md comparables) ----
    // args subset skips the VCF section unless "vcf" is passed too.
    // The section is a FUNCTION with keep-the-minimum merge semantics
    // because it may run twice: ambient contention poisoned the
    // BASELINE comparables in the r11 AND r12 driver records
    // (vcf_build 13.98 s recorded vs 3.4 s quiet) — when the section's
    // bracketing load probes come back hot, it re-runs once and the
    // better reading wins (see the contention check after the probes).
    def mergeMin(name: String, v: Double): Unit =
      results(name) = results.get(name).filter(_ >= 0)
        .fold(v)(math.min(_, v))
    def runVcfSection(): Unit = try {
      val nVariants = 50000L
      val nSamples = 100
      val nGenes = 200
      val out = java.nio.file.Files.createTempDirectory("graft_vcf_bench").toString

      // best-of like the query metrics: a single cold measurement of
      // the build moved ±60% with ambient JVM/GC state across runs;
      // the staging cache is dropped between runs so each measures the
      // full parse+sort+write, and everything after reads the written
      // parquet of the last run
      isoBarrier()
      val buildSec = bestOf() {
        val tables = VcfBuild.build(SyntheticVcf.generate(spark, nVariants, nSamples, nGenes))
        tables.write(out)
        graft.vcf.VcfBuild.clearCaches()
      }
      mergeMin("vcf_build_sec", buildSec)
      isoBarrier()

      // cache = the analog of the reference's warm SQLite page cache
      // (its per-gene medians are measured across 23k sequential
      // queries against a hot DB)
      // coalesce before caching: a 50k-row dimension table in 32 cache
      // partitions pays ~32 task launches per point lookup; 8 is plenty
      // and matches what AQE would pick for this size
      val info = spark.read.parquet(s"$out/variant_info").coalesce(8).cache()
      val impact = spark.read.parquet(s"$out/variant_impact").coalesce(8).cache()
      val geno = spark.read.parquet(s"$out/variant_geno")

      // warm the caches + plans
      VcfApi.filterByGene(impact, info, "GENE0", afMax = 0.05).count()

      val genes = (1 until 21).map(i => s"GENE$i")
      // index-free path (ad-hoc query, no ETL index available)
      val perGeneNoIdx = genes.map(g =>
        time(VcfApi.filterByGene(impact, info, g, afMax = 0.05).count()))
      mergeMin("vcf_filter_per_gene_noindex_sec",
        perGeneNoIdx.sorted.apply(perGeneNoIdx.size / 2))

      // headline point-lookup metric uses the prebuilt gene index —
      // the like-for-like comparison: the reference's 0.053 s/gene is
      // measured against the warm B-tree its ETL stage built
      // (03-index-db.R); the index build cost is reported separately
      var geneIndex: VcfApi.GeneIndex = null
      mergeMin("vcf_gene_index_build_sec",
        time { geneIndex = VcfApi.buildGeneIndex(impact) })
      VcfApi.filterByGeneIndexed(geneIndex, info, "GENE0", afMax = 0.05).count()
      val perGene = genes.map(g =>
        time(VcfApi.filterByGeneIndexed(geneIndex, info, g, afMax = 0.05).count()))
      mergeMin("vcf_filter_per_gene_sec", perGene.sorted.apply(perGene.size / 2))

      // batched form: all genes in ONE declarative query — the scale
      // path a Spark engine takes instead of 23,506 sequential point
      // queries (reference median 0.053 s/gene ⇒ ~21 min for all genes)
      val batched = time {
        impact.select(col("variant_id"), col("symbol")).distinct()
          .join(info.filter(col("af") < 0.05), Seq("variant_id"))
          .groupBy("symbol").agg(count(lit(1)).as("n_vars"))
          .count()
      }
      mergeMin("vcf_filter_all_genes_sec", batched)
      mergeMin("vcf_filter_per_gene_batched_sec", batched / nGenes)

      // deliberate caches (info/impact) are consumed above; from here
      // each metric reads fresh parquet, so isolation may clear freely
      isoBarrier()
      val ids = (1L to 1000L).map(i => i * 37 % nVariants + 1)
      val pullSec = time(VcfApi.pullByIds(geno, ids).count())
      mergeMin("vcf_pull_per_1k_sec", pullSec)

      // ---- genome-WIDTH pull: the reference's headline pull pain is
      // the 2,504-sample genotype row (BASELINE.md genome mode,
      // 02-pull-benchmark-genome.csv: 11.0 s/1k table mode). Fewer
      // variants, full cohort width — so a regression in the wide
      // geno path surfaces in the driver's record, not only in
      // RefScaleBench runs.
      isoBarrier()
      val wideOut = java.nio.file.Files
        .createTempDirectory("graft_vcf_wide_bench").toString
      val nVarWide = 5000L
      val wideBuild = time {
        val t = VcfBuild.build(
          SyntheticVcf.generate(spark, nVarWide, 2504, nGenes))
        t.write(wideOut)
        graft.vcf.VcfBuild.clearCaches()
      }
      mergeMin("vcf_build_wide_sec", wideBuild)
      val genoWide = spark.read.parquet(s"$wideOut/variant_geno")
      val wideIds = (1L to 1000L).map(i => i * 37 % nVarWide + 1)
      isoBarrier()
      VcfApi.pullByIds(genoWide, wideIds.take(10)).count() // warm plan
      mergeMin("vcf_pull_wide_per_1k_sec",
        time(VcfApi.pullByIds(genoWide, wideIds).count()))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] vcf bench failed: $e")
    }
    val wantVcf = posArgs.isEmpty || posArgs.contains("vcf")
    if (wantVcf) runVcfSection()
    probes("after_vcf") = loadProbe(spark)
    // Contention defense (poisoned the r11 AND r12 driver records): if
    // the probes bracketing the VCF section came back ≥2× the quietest
    // probe seen so far, the section's timings are suspect — re-run it
    // once from a clean state and let mergeMin keep the better reading.
    if (wantVcf) {
      val quietest = math.max(probes.values.min, 1e-9)
      val bracket = math.max(probes("after_queries"), probes("after_vcf"))
      if (bracket > 2.0 * quietest) {
        System.err.println(
          f"[bench] vcf section bracketed by hot load probes " +
            f"($bracket%.3fs vs $quietest%.3fs quiet); re-running once")
        spark.catalog.clearCache(); clearAllCaches()
        System.gc(); Thread.sleep(500); System.gc()
        runVcfSection()
        probes("after_vcf_rerun") = loadProbe(spark)
      }
    }

    // ---- splittable BGZF scan: parse a multi-block bgzipped VCF ----
    // Guards the partition count (a regression to 1 partition means the
    // source stopped splitting — the whole point of the BGZF codec) and
    // gives the DSv2 scan a throughput signal.
    try {
      val nv = 20000L
      val gz = java.nio.file.Files.createTempDirectory("graft_bgzf_bench")
        .resolve("bench.vcf.gz").toString
      val lines = graft.vcf.SyntheticVcf.header(8) ++
        (0L until nv).map(i => graft.vcf.SyntheticVcf.line(i, 8, 50))
      graft.vcf.Bgzf.writeLocalFile(gz, lines)
      // warm (codegen + FS metadata), then measure the full parse
      val warm = graft.vcf.VcfReader.read(spark, gz, splitSize = Some(256L << 10))
      require(warm.df.rdd.getNumPartitions > 1,
        s"BGZF scan not split: ${warm.df.rdd.getNumPartitions} partition(s)")
      warm.df.count()
      results("vcf_bgzf_scan_sec") = time {
        val n = graft.vcf.VcfReader.read(spark, gz, splitSize = Some(256L << 10))
          .df.count()
        require(n == nv, s"BGZF scan returned $n rows, expected $nv")
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bgzf bench failed: $e")
    }

    // ---- physical skip-parse: positions-only vs full-width scan ----
    // S2 at the byte level (ScanVcfParam(info=NA, samples=NA)): a
    // positions-only projection keeps only the prefix-limited split,
    // never tokenizing the 200-sample genotype tail; the full-width
    // scan pays the whole line. The ratio is the measured value of
    // the skip — expected well above 2× at this width.
    try {
      val nv = 20000L
      val wide = 200
      val gz = java.nio.file.Files.createTempDirectory("graft_skip_bench")
        .resolve("wide.vcf.gz").toString
      val lines = graft.vcf.SyntheticVcf.header(wide) ++
        (0L until nv).map(i => graft.vcf.SyntheticVcf.line(i, wide, 50))
      graft.vcf.Bgzf.writeLocalFile(gz, lines)
      def scan() = graft.vcf.VcfReader.read(spark, gz,
        splitSize = Some(512L << 10)).df
      // warm both plans
      scan().select("chr", "pos").agg(max("pos")).collect()
      scan().agg(sum(size(col("genotypes"))), max("pos")).collect()
      results("vcf_scan_positions_sec") = time {
        scan().select("chr", "pos").agg(max("pos")).collect()
      }
      results("vcf_scan_full_sec") = time {
        scan().agg(sum(size(col("genotypes"))), max("pos")).collect()
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] skip-parse bench failed: $e")
    }
    probes("after_bgzf") = loadProbe(spark)

    // ---- streaming throughput (rows/s through the tumbling agg) ----
    // A starved run that produces no qualifying batches returns None:
    // retry once with a 3× deadline, then OMIT the metric — the r6
    // driver run published a literal 0.0 rows/s for a timed-out
    // measurement, which read as a catastrophic result instead of a
    // failed probe.
    try {
      // short warmup run pays source/sink setup + codegen
      graft.streaming.EventsStream.rateThroughput(spark, 100000L, minBatches = 2)
      graft.streaming.EventsStream.rateThroughput(spark, 5000000L, minBatches = 8)
        .orElse {
          System.err.println("[bench] stream probe timed out; retrying with 90s deadline")
          graft.streaming.EventsStream.rateThroughput(spark, 5000000L,
            minBatches = 4, maxWaitMillis = 90000L)
        } match {
          case Some(r) => results("stream_tumbling_rows_per_sec") = r
          case None => System.err.println(
            "[bench] stream throughput unmeasurable on this machine; metric omitted")
        }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] stream bench failed: $e")
    }

    // ---- stateful throughput: default (HDFS-backed heap) state store
    //      vs RocksDB (off-heap SST state — the 100 TB state path) ----
    // Run in a FORKED child JVM (graft.streaming.StateBench): the
    // RocksDB JNI logger can SIGSEGV on a native flush thread during
    // DB close (r10's hs_err_pid842 killed the whole bench and lost
    // every state metric). The child prints one line per completed
    // probe, so even a crash AFTER a measurement loses nothing; probes
    // that do go missing are retried once in a fresh child.
    try {
      val stateProbes = Seq("hdfs", "rocksdb", "rocksdb_changelog")
      var got = forkStateBench(stateProbes, cpus)
      val missing = stateProbes.filterNot(p =>
        got.contains(graft.streaming.StateBench.metricName(p)))
      if (missing.nonEmpty) {
        System.err.println(
          s"[bench] state probes ${missing.mkString(",")} missing " +
            "(child crash?); retrying once in a fresh child")
        got = got ++ forkStateBench(missing, cpus)
      }
      got.foreach { case (k, v) => results(k) = v }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] state-store bench failed: $e")
    }
    probes("after_stream") = loadProbe(spark)

    // Late VCF re-measure (unconditional): r13 run analysis showed the
    // probe-gated re-run can miss self-inflicted JVM pressure — every
    // probe BEFORE the vcf section read ~uniformly slow (0.12 s) so no
    // bracket looked hot, yet the run's true floor (0.057 s, right
    // here after the stream fork gave the parent a breather) says the
    // section ran ~2× starved (vcf_build 8.3 s vs 3.4 s quiet). One
    // more run in this window costs ~25 s of a 55-min bench and
    // mergeMin keeps whichever reading is honest.
    if (wantVcf) {
      spark.catalog.clearCache(); clearAllCaches()
      System.gc(); Thread.sleep(500); System.gc()
      runVcfSection()
      probes("after_vcf_late") = loadProbe(spark)
    }

    // ---- scale sweep: headline queries re-timed one SF down, scaling
    // exponent per query (t ≈ c·N^e ⇒ e = ln(t_big/t_mid)/ln(ratio)).
    // Turns the "would this plan survive a 10× scale-up" argument into a
    // measured curve; anything clearly super-linear gets flagged. The
    // ratio is the driving table's row growth sf0.01 → sf0.1 (TPC-H /
    // events tables 10×, documents 10×, embeddings 4×).
    val sweep = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, Double)]()
    val midDir =
      if (posArgs.isEmpty && sfDir.endsWith("sf0.1"))
        Some(sfDir.stripSuffix("sf0.1") + "sf0.01")
      else None
    val sweepQs: Seq[(String, Double)] = Seq(
        "q01_pricing_summary" -> 10d, "q05_join_revenue_by_nation" -> 10d,
        "q13_window_latest_order" -> 10d, "q14_window_running_sum" -> 10d,
        "q27_tumbling_hourly" -> 10d, "q29_asof_purchase_view" -> 10d,
        "q51_percentiles" -> 10d, "q31_dedup_prefix_groups" -> 10d,
        "q32_dedup_minhash_lsh" -> 10d, "q54_token_topk" -> 10d,
        "q65_tfidf" -> 10d, "q72_decontaminate" -> 10d,
        "q69_near_dedup" -> 10d, "q96_dup_spans" -> 10d,
        "q106_fuzzy_dedup" -> 10d, "q114_dedup_keep_best" -> 10d,
        "q115_dsir_sample" -> 10d, "q119_contrastive_pairs" -> 10d,
        "q159_set_similarity_join" -> 10d, "q163_bloom_decontaminate" -> 10d,
        "q285_skewed_join" -> 10d,
        "q166_syndication" -> 10d, "q169_saturation" -> 10d,
        "q35_knn_cosine" -> 4d, "q36_ann_lsh" -> 4d,
        "q105_semdedup" -> 4d, "q109_semantic_decontaminate" -> 4d)
    midDir.filter(d => new java.io.File(d).isDirectory).foreach { mid =>
      sweepQs.foreach { case (n, ratio) =>
        val tBig = results.getOrElse(n, -1.0)
        if (tBig > 0) {
          try {
            val tMid = bestOf()(forceRun(SparkEntry.queries(n)(spark, mid)))
            val e = math.log(tBig / tMid) / math.log(ratio)
            // a ~0 mid timing yields a non-finite exponent, which would
            // render as the bare token Infinity and break the JSON line
            if (tMid > 0 && java.lang.Double.isFinite(e)) sweep(n) = (tMid, tBig, ratio, e)
          } catch { case _: Throwable => () }
          graft.operators.Dedup.clearCaches(); graft.operators.Percentiles.clearCaches(); graft.operators.Curation.clearCaches()
        }
      }
    }

    // ---- decade-HIGHER sweep: sf0.1 → a synthetic 10× tier
    // (ScaleUp.ensure), so the exponents are measured across THREE
    // decades (sf0.01 → sf0.1 → 10×sf0.1), not extrapolated from one
    // ratio. Every replica is key-shifted and content-decorrelated, so
    // join/group/similarity structure scales the way a genuinely
    // bigger corpus would. Same flag rule, reported separately. ----
    val sweepHuge = scala.collection.mutable.LinkedHashMap[String, (Double, Double, Double, Double)]()
    // Wide initial shuffle partitions for every synthetic-tier section
    // (10× AND 100×): at 10–100× the gate SF a fixed 32-reducer layout
    // makes each sort-merge partition 10–100× larger (spill / straggler
    // granularity — q159's r11 century row, q106's r12 huge row). A
    // cluster scales reducers with data; the tier exponents should
    // measure the ALGORITHM. Scoped here so base-SF sections keep the
    // cheap 32-partition layout (blanket-wide taxes small-grid queries
    // ~2× in task-scheduling overhead — measured on q369/q376).
    val wideKey = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    def withWideShuffles[T](body: => T): T = {
      spark.conf.set(wideKey, (cpus.toInt * 8).toString)
      try body finally spark.conf.unset(wideKey)
    }
    if (posArgs.isEmpty && sfDir.endsWith("sf0.1")) {
      try withWideShuffles {
        val hugeDir = ScaleUp.ensure(spark, sfDir, "/tmp/graft_sf1_synth", 10)
        sweepQs.foreach { case (n, _) =>
          val tBig = results.getOrElse(n, -1.0)
          if (tBig > 0) {
            try {
              // replica tiering scales every driving table 10×, so the
              // huge-tier ratio is 10 for every query (unlike the
              // driver corpus, where embeddings grow 4× per SF decade)
              val tHuge = bestOf()(forceRun(SparkEntry.queries(n)(spark, hugeDir)))
              val e = math.log(tHuge / tBig) / math.log(10d)
              if (tHuge > 0 && java.lang.Double.isFinite(e))
                sweepHuge(n) = (tBig, tHuge, 10d, e)
            } catch { case _: Throwable => () }
            graft.operators.Dedup.clearCaches(); graft.operators.Percentiles.clearCaches(); graft.operators.Curation.clearCaches()
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] huge-tier sweep failed: $e")
      }
    }
    // ---- century tier: 100× documents/embeddings for the five queries
    // whose 10× exponents sit closest to the flag bar (q106 0.93, q169
    // 0.78, q105 0.68) plus the two headline similarity joins — THREE
    // decades above the gate SF decides whether their candidate volume
    // is genuinely bounded. Seconds alone can't tell "bounded" from
    // "absorbed": each entry also records the CANDIDATE count per tier
    // (observed in-plan for the LSH/set-similarity joins; analytic
    // volume companions for the ops whose kernel sits inside the join
    // condition) and its growth exponent. Single timed run per query —
    // at 30 s/query a best-of re-run buys little precision for double
    // the wall cost; the candidate counts carry the structural verdict.
    val sweep100 = scala.collection.mutable.LinkedHashMap[
      String, (Double, Double, Double, Long, Long, Double)]()
    // Century tiers share the synthetic-tier wide-shuffle scope
    // (withWideShuffles, defined at the 10× sweep above).
    if (posArgs.isEmpty && sfDir.endsWith("sf0.1")) {
      try withWideShuffles {
        // the newest iterative/probe gates (percolation, LOF, greedy
        // coverage, k-means) claim probe-panel / grid-bounded cost —
        // the century row is the proof, same as the dedup family
        val centuryQs = Seq("q32_dedup_minhash_lsh", "q105_semdedup",
          "q106_fuzzy_dedup", "q159_set_similarity_join", "q169_saturation",
          "q396_percolation", "q399_lof", "q400_coverage_select",
          "q403_kmeans")
        val centuryDir = ScaleUp.ensure(spark, sfDir, "/tmp/graft_sf10_synth",
          100, only = Seq("documents", "embeddings"))
        import graft.operators.{Dedup, Telemetry}
        import graft.operators.TextAnalysis
        def clearAll(): Unit = {
          Dedup.clearCaches(); graft.operators.Percentiles.clearCaches()
          graft.operators.Curation.clearCaches()
        }
        def candCounts(dir: String): Map[String, Long] = {
          val m = scala.collection.mutable.LinkedHashMap[String, Long]()
          Telemetry.enable(spark); Telemetry.reset()
          try {
            forceRun(SparkEntry.queries("q32_dedup_minhash_lsh")(spark, dir))
            Telemetry.await("lsh_candidates")
              .foreach(m("q32_dedup_minhash_lsh") = _)
            clearAll()
            forceRun(SparkEntry.queries("q159_set_similarity_join")(spark, dir))
            Telemetry.await("ssj_candidates")
              .foreach(m("q159_set_similarity_join") = _)
            clearAll()
            Telemetry.reset()
            // percolation's cost driver is its LSH pair stage — same
            // counter as q32, under q396's own band/shingle params
            forceRun(SparkEntry.queries("q396_percolation")(spark, dir))
            Telemetry.await("lsh_candidates")
              .foreach(m("q396_percolation") = _)
          } finally { Telemetry.disable(); Telemetry.reset(); clearAll() }
          m("q106_fuzzy_dedup") = Dedup.editDistanceCandidateVolume(
            Tables.documents(spark, dir), "text", "doc_id", blockTokens = 2)
          m("q105_semdedup") = Dedup.semDedupCandidateVolume(
            Tables.embeddings(spark, dir), "embedding", "vec_id",
            nLists = 0, iters = 2, dims = 64)
          m("q169_saturation") = TextAnalysis.saturationVolume(
            Tables.documents(spark, dir), "text", n = 3)
          clearAll()
          m.toMap
        }
        val candsBase = candCounts(sfDir)
        val cands100 = candCounts(centuryDir)
        centuryQs.foreach { n =>
          val tBig = results.getOrElse(n, -1.0)
          if (tBig > 0) {
            try {
              val t100 = time(forceRun(SparkEntry.queries(n)(spark, centuryDir)))
              val e = math.log(t100 / tBig) / math.log(100d)
              val cB = candsBase.getOrElse(n, -1L)
              val c1 = cands100.getOrElse(n, -1L)
              val ce =
                if (cB > 0 && c1 > 0) math.log(c1.toDouble / cB) / math.log(100d)
                else Double.NaN
              if (t100 > 0 && java.lang.Double.isFinite(e))
                sweep100(n) = (tBig, t100, e, cB, c1, ce)
            } catch { case _: Throwable => () }
            clearAll()
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] century-tier sweep failed: $e")
      }
    }

    // ---- linkage / graph / LD century rows: the blocked-join family
    // whose candidate volume rides the blocking-key quality rather
    // than an LSH design parameter. Each row re-times BOTH tiers with
    // telemetry on (consistent measurement overhead), recording the
    // operator's own candidate counter: linkage pairs (observe on the
    // scored pair set), CC per-round edge volume (driver-summed), LD
    // window pairs (observe on the bucket join). q305's gate is a toy
    // fixture, so its tiers are synthesized at CONSTANT variant
    // density (bigger corpus = longer genome, the realistic axis);
    // density sensitivity itself is occupancy² by design — plink's
    // own window semantics — and is documented in PERF.md, not here.
    if (posArgs.isEmpty && sfDir.endsWith("sf0.1")) {
      import graft.operators.Telemetry
      def timedWithCand(body: => Unit, label: String): (Double, Long) = {
        Telemetry.enable(spark); Telemetry.reset()
        try {
          val t = time(body)
          (t, Telemetry.await(label).getOrElse(-1L))
        } finally {
          Telemetry.disable(); Telemetry.reset()
          graft.operators.Dedup.clearCaches()
        }
      }
      try withWideShuffles {
        val custDir = ScaleUp.ensure(spark, sfDir, "/tmp/graft_sf10_linkage",
          100, only = Seq("customer"))
        val docDir = ScaleUp.ensure(spark, sfDir, "/tmp/graft_sf10_synth",
          100, only = Seq("documents", "embeddings"))
        Seq(
          ("q300_record_linkage", custDir, "linkage_candidates"),
          ("q306_linkage_one_to_one", custDir, "linkage_candidates"),
          ("q302_incremental_components", docDir, "cc_edges")
        ).foreach { case (n, dir, label) =>
          if (results.getOrElse(n, -1.0) > 0) {
            try {
              val (tB, cB) = timedWithCand(
                forceRun(SparkEntry.queries(n)(spark, sfDir)), label)
              val (t1, c1) = timedWithCand(
                forceRun(SparkEntry.queries(n)(spark, dir)), label)
              val e = math.log(t1 / tB) / math.log(100d)
              val ce =
                if (cB > 0 && c1 > 0) math.log(c1.toDouble / cB) / math.log(100d)
                else Double.NaN
              if (tB > 0 && t1 > 0 && java.lang.Double.isFinite(e))
                sweep100(n) = (tB, t1, e, cB, c1, ce)
            } catch { case e: Throwable =>
              System.err.println(s"[bench] century row $n failed: $e") }
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] linkage century tier failed: $e")
      }
      // LD pair kernel at constant density: ~75 bp spacing, 1 kb
      // window (≈13 candidates per variant either tier), 24 samples.
      try withWideShuffles {
        def ldTier(nVariants: Long): (Double, Long) = {
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
          timedWithCand(
            { val n = VcfApi.ldPrune(geno, info, maxDist = 1000L,
                r2Max = 0.5).count()
              require(n == nVariants, s"ldPrune emitted $n of $nVariants") },
            "ld_candidates")
        }
        val (tB, cB) = ldTier(20000L)
        val (t1, c1) = ldTier(2000000L)
        val e = math.log(t1 / tB) / math.log(100d)
        val ce =
          if (cB > 0 && c1 > 0) math.log(c1.toDouble / cB) / math.log(100d)
          else Double.NaN
        if (tB > 0 && t1 > 0 && java.lang.Double.isFinite(e))
          sweep100("q305_vcf_ldprune") = (tB, t1, e, cB, c1, ce)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] LD century tier failed: $e")
      }
    }

    // flag only when the signal is real: sub-50 ms mid times are harness
    // noise, and a "super-linear" query still under half a second at the
    // big SF isn't a scaling hazard worth a red flag
    val flagged = sweep.collect {
      case (n, (tMid, tBig, _, e)) if e > 1.15 && tMid >= 0.05 && tBig >= 0.5 => n
    }.toSeq ++ sweepHuge.collect {
      case (n, (tBig, tHuge, _, e)) if e > 1.15 && tBig >= 0.05 && tHuge >= 0.5 =>
        s"$n@10x"
    }.toSeq ++ sweep100.collect {
      // two ways to earn the century flag: super-linear seconds, or
      // super-linear CANDIDATES (structure blowing up even if the
      // machine absorbed it this run)
      case (n, (tBig, t100, e, _, _, _)) if e > 1.15 && tBig >= 0.05 && t100 >= 0.5 =>
        s"$n@100x"
      case (n, (_, _, _, cB, c100, ce)) if ce > 1.15 && cB >= 1000 && c100 >= 100000 =>
        s"$n@100x_cands"
    }.toSeq

    probes("end") = loadProbe(spark)
    // load_index = worst/best probe across the run. Quiet runs land
    // under ~2.5 (residual JIT drift); >3 means some section ran while
    // the JVM was starved and the timings recorded there are machine
    // noise, not plan cost. The absolute probe seconds (load_probes in
    // the full line) carry the cross-run diagnosis even when the WHOLE
    // run was contended: the op is fixed, so ~0.1s on this hardware
    // quiet vs. multi-second starved.
    // −1 probe sentinels mean the context was already dead there —
    // exclude them from the index and surface the fault explicitly
    val liveProbes = probes.values.filter(_ > 0)
    val aborted = probes.values.exists(_ <= 0)
    if (aborted) System.err.println(
      "[bench] ABORTED mid-run (dead SparkContext at a load probe); " +
        "JSON carries the sections completed before the fault")
    val loadIndex =
      if (liveProbes.isEmpty) -1.0
      else liveProbes.max / math.max(liveProbes.min, 1e-9)
    // Per-SECTION contention labels: a section whose bracketing load
    // probes exceed 2.5× the run minimum ran on a starved machine, and
    // its timings are machine noise — the record says so itself instead
    // of relying on a human diffing rounds. (The VCF section already
    // re-ran once above when hot; it lands here only if STILL hot.)
    // Bar = 2.5×, the quiet-run load_index envelope noted below: the
    // start probe keeps ~2.3× residual JIT drift even after burn-in,
    // and a quiet run must not self-label its query section suspect.
    val runMinProbe =
      math.max(if (liveProbes.isEmpty) 1e-9 else liveProbes.min, 1e-9)
    def hotP(k: String): Boolean = probes.get(k).exists(_ > 2.5 * runMinProbe)
    // The VCF section may run up to three times (initial, probe-gated
    // re-run, unconditional late re-measure) with mergeMin keeping the
    // best reading — so its comparables are suspect only if EVERY
    // executed run was bracketed by a hot probe.
    val vcfRunBrackets: Seq[Seq[String]] =
      Seq(Seq("after_queries", "after_vcf")) ++
        (if (probes.contains("after_vcf_rerun"))
          Seq(Seq("after_vcf", "after_vcf_rerun")) else Nil) ++
        (if (probes.contains("after_vcf_late"))
          Seq(Seq("after_stream", "after_vcf_late")) else Nil)
    val postVcfProbe =
      if (probes.contains("after_vcf_rerun")) "after_vcf_rerun"
      else "after_vcf"
    val scalingStart =
      if (probes.contains("after_vcf_late")) "after_vcf_late"
      else "after_stream"
    val suspectSections = (Seq(
      "queries" -> Seq("start", "after_queries"),
      "bgzf" -> Seq(postVcfProbe, "after_bgzf"),
      "stream" -> Seq("after_bgzf", "after_stream"),
      "scaling" -> Seq(scalingStart, "end")
    ).collect { case (name, ks) if ks.exists(hotP) => name }) ++
      (if (vcfRunBrackets.forall(_.exists(hotP))) Seq("vcf") else Nil)
    val suspectJson =
      suspectSections.map("\"" + _ + "\"").mkString("[", ",", "]")
    if (suspectSections.nonEmpty)
      System.err.println("[bench] SUSPECT sections (hot bracketing " +
        s"probes): ${suspectSections.mkString(", ")}")

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val probesJson = probes.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }
      .mkString("{", ",", "}")
    val scalingJson = sweep.map { case (n, (tMid, tBig, ratio, e)) =>
      f""""$n":{"t_mid":$tMid%.4f,"t_big":$tBig%.4f,"ratio":$ratio%.1f,"exp":$e%.3f}"""
    }.mkString("{", ",", "}")
    val scalingHugeJson = sweepHuge.map { case (n, (tBig, tHuge, ratio, e)) =>
      f""""$n":{"t_big":$tBig%.4f,"t_10x":$tHuge%.4f,"ratio":$ratio%.1f,"exp":$e%.3f}"""
    }.mkString("{", ",", "}")
    val scaling100Json = sweep100.map { case (n, (tBig, t100, e, cB, c100, ce)) =>
      val candPart =
        if (cB >= 0 && c100 >= 0 && java.lang.Double.isFinite(ce))
          f""","cands_big":$cB,"cands_100x":$c100,"cand_exp":$ce%.3f"""
        else ""
      f""""$n":{"t_big":$tBig%.4f,"t_100x":$t100%.4f,"ratio":100.0,"exp":$e%.3f$candPart}"""
    }.mkString("{", ",", "}")
    val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total is seconds: rate metrics (rows/sec) don't belong in the sum.
    // Match by substring, not suffix - the state-store variants carry a
    // backend tag after the unit (stream_state_rows_per_sec_rocksdb).
    val total = results.collect {
      case (k, v) if v >= 0 && !k.contains("_rows_per_sec") => v
    }.sum
    // record-completeness check: a metric key that VANISHES round-over-
    // round (the r10 RocksDB segfault ate three state metrics and only
    // a manual r9/r10 diff caught it) must flag itself in the record.
    // Empty on a clean full run; subset runs expect only what they ask.
    val expectedMetrics: Seq[String] =
      if (posArgs.nonEmpty) names
      else SparkEntry.queries.keys.toSeq.sorted ++ Seq(
        "vcf_build_sec", "vcf_filter_per_gene_noindex_sec",
        "vcf_gene_index_build_sec", "vcf_filter_per_gene_sec",
        "vcf_filter_all_genes_sec", "vcf_filter_per_gene_batched_sec",
        "vcf_pull_per_1k_sec", "vcf_build_wide_sec",
        "vcf_pull_wide_per_1k_sec", "vcf_bgzf_scan_sec",
        "vcf_scan_positions_sec", "vcf_scan_full_sec",
        "stream_tumbling_rows_per_sec",
        "stream_state_rows_per_sec_hdfs",
        "stream_state_rows_per_sec_rocksdb",
        "stream_state_rows_per_sec_rocksdb_changelog")
    val missingMetrics =
      expectedMetrics.filterNot(k => results.get(k).exists(_ >= 0))
    val missingJson =
      missingMetrics.map("\"" + _ + "\"").mkString("[", ",", "]")
    if (missingMetrics.nonEmpty)
      System.err.println(
        s"[bench] MISSING metrics this run: ${missingMetrics.mkString(", ")}")
    // throughput floors: an order of magnitude under every recorded
    // healthy run (r9: tumbling 4.7M, hdfs-state ~1M, rocksdb 568k
    // rows/s). A breach means the streaming tier is broken or the
    // machine was starved — either way the record must say so itself
    // instead of relying on a human diffing rounds.
    val floors = Map(
      "stream_tumbling_rows_per_sec" -> 500000d,
      "stream_state_rows_per_sec_hdfs" -> 100000d,
      "stream_state_rows_per_sec_rocksdb" -> 50000d,
      "stream_state_rows_per_sec_rocksdb_changelog" -> 50000d)
    val throughputFlags = floors.toSeq.sorted.collect {
      case (k, floor) if results.get(k).exists(v => v >= 0 && v < floor) =>
        f"$k@${results(k)}%.0f<$floor%.0f"
    }
    val throughputJson =
      throughputFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    if (throughputFlags.nonEmpty)
      System.err.println(
        s"[bench] throughput FLOOR breach: ${throughputFlags.mkString(", ")}")
    val isolateJson = if (isolate) "true" else "false"
    val abortedJson = if (aborted) "true" else "false"
    val fullLine =
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","isolate":$isolateJson,"queries":$qs,"scaling":$scalingJson,"scaling_10x":$scalingHugeJson,"scaling_100x":$scaling100Json,"scaling_flagged":$flaggedJson,"missing_metrics":$missingJson,"throughput_flags":$throughputJson,"suspect_sections":$suspectJson,"load_probes":$probesJson,"load_index":$loadIndex%.2f,"aborted":$abortedJson,"sf":"$sfDir"}"""
    // Compact totals-only line: the five BASELINE.md comparables plus the
    // sweep verdict. This is the line the driver's bounded tail capture
    // must survive — keep it short no matter how many queries exist.
    val comparables = Seq("vcf_build_sec", "vcf_filter_per_gene_sec",
      "vcf_filter_per_gene_noindex_sec", "vcf_filter_per_gene_batched_sec",
      "vcf_pull_per_1k_sec", "vcf_pull_wide_per_1k_sec",
      "vcf_scan_positions_sec", "vcf_scan_full_sec",
      "stream_tumbling_rows_per_sec", "stream_state_rows_per_sec_rocksdb")
    val compactQs = comparables.flatMap(k => results.get(k).map(v =>
      "\"" + k + "\":" + f"$v%.4f")).mkString("{", ",", "}")
    // Full record under target/, keyed by start time — a subset run no
    // longer overwrites the last full run's record (the /tmp collision
    // flagged in r12). The compact line carries the exact path.
    val fullPath = {
      val dir = java.nio.file.Paths.get("target", "bench")
      try java.nio.file.Files.createDirectories(dir) catch { case _: Throwable => () }
      dir.resolve(s"graft_bench_full-${System.currentTimeMillis() / 1000}" +
        (if (posArgs.nonEmpty) "-subset" else "") + ".json").toString
    }
    val compactLine =
      f"""{"metric":"total","value":$total%.4f,"unit":"sec","isolate":$isolateJson,"queries":$compactQs,"n_queries":${results.size},"scaling_flagged":$flaggedJson,"missing_metrics":$missingJson,"throughput_flags":$throughputJson,"suspect_sections":$suspectJson,"load_index":$loadIndex%.2f,"aborted":$abortedJson,"sf":"$sfDir","full":"$fullPath"}"""

    // Sidecars: survive even if stdout capture is truncated.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
        (fullLine + "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_bench.json"),
        (compactLine + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }

    // Stop Spark BEFORE printing the metric lines: local-mode shutdown can
    // spew scheduler stack traces that would push the JSON out of a
    // bounded log tail (this blinded the r3 perf gate). Logs off first so
    // shutdown noise never reaches the captured output at all. Print the
    // FULL line first and the compact line LAST: a head-truncating tail
    // capture (the r4 failure mode) still delivers the compact line whole.
    spark.sparkContext.setLogLevel("OFF")
    try spark.stop() catch { case _: Throwable => () }
    println(fullLine)
    println(compactLine)
  }
}
