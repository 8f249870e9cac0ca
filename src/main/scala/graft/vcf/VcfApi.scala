package graft.vcf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** The reference's read-query surface (VCFdbR
  * `benchmarks/00-benchmark-functions.R:10-147`) as composable
  * DataFrame functions. All are lazy plans; Catalyst composes them with
  * caller filters exactly like dbplyr composed one SQL statement.
  */
object VcfApi {

  /** Gene filter (`filter_test`, `00-benchmark-functions.R:68-102`):
    * impact rows for `symbol` → distinct (variant_id, symbol) → inner
    * join info with `af < afMax`.
    *
    * Physical shape at scale: the symbol filter hits parquet
    * dictionary/stats (the analog of `idx_impact_symbol`), the filtered
    * side is tiny ⇒ broadcast hash join, no shuffle of `info`.
    */
  def filterByGene(
      impact: DataFrame, info: DataFrame,
      symbol: String, afMax: Double = 0.01): DataFrame = {
    // left-semi dedups hit variants without a distinct shuffle, and the
    // symbol column re-enters as a constant (it was just filtered to
    // one value) — two fewer stages per query than distinct+inner-join,
    // which matters for point-lookup latency
    val hits = impact.filter(col("symbol") === symbol).select("variant_id")
    info.filter(col("af") < afMax)
      .join(broadcast(hits), Seq("variant_id"), "left_semi")
      .withColumn("symbol", lit(symbol))
  }

  /** Materialized gene → variant-id index: the Spark counterpart of
    * the reference's `idx_impact_symbol` B-tree, which its 0.05 s/gene
    * point-lookup latency depends on (`03-index-db.R` builds the SQL
    * indexes at ETL time; the benchmark queries a warm DB). Built once
    * from the impact table — ~#genes entries of id arrays, metadata
    * scale at exome size — and reused across point queries.
    *
    * Heap guard: the driver map holds every (gene, id) pair as a
    * primitive long; at ~100× genome scale that is O(100M) longs of
    * driver heap. [[buildGeneIndex]] therefore counts first and above
    * `maxDriverIds` returns the SPILLED form — `ids` empty, `spill` a
    * cached distinct (symbol, variant_id) DataFrame — and
    * [[filterByGeneIndexed]] serves point lookups from it with a
    * per-gene broadcast semi-join (cluster memory, executor-side
    * filter; the per-gene subset is always gene-sized even when the
    * whole index is not driver-sized).
    */
  final case class GeneIndex(
      ids: Map[String, Array[Long]],
      spill: Option[DataFrame] = None) {
    def genes: Iterable[String] = spill match {
      case None => ids.keys
      case Some(df) =>
        df.select("symbol").distinct().collect().map(_.getString(0)).toSeq
    }
  }

  /** Above this many ids the point lookup switches from an IN-list
    * predicate to a broadcast left-semi join: a 100k-element `isin`
    * is a planning-time killer (one expression-tree node per id),
    * while a broadcast of 100k longs is ~1 MB — trivially fine. Same
    * threshold as [[pullByIds]].
    */
  private val InListMaxIds = 1000

  /** Build the index; above `maxDriverIds` total (gene, id) pairs the
    * index spills to a cached DataFrame instead of driver heap (see
    * [[GeneIndex]]). The pre-count is one distributed agg pass — cheap
    * insurance against collecting an over-sized map onto the driver.
    */
  def buildGeneIndex(
      impact: DataFrame, maxDriverIds: Long = 10000000L): GeneIndex = {
    val pairs = impact.select(col("symbol"), col("variant_id")).distinct()
    val total = pairs.count()
    if (total <= maxDriverIds)
      GeneIndex(impact.groupBy("symbol")
        .agg(collect_set(col("variant_id")).as("ids"))
        .collect()
        // primitive Array[Long] storage: at genome scale (28k genes, up
        // to 122k variants/gene) boxed Seq[Long] costs ~20× the heap
        .map(r => r.getString(0) -> r.getSeq[Long](1).toArray)
        .toMap)
    else
      // range-partition + sort the spilled pairs by symbol: the
      // per-gene `where(symbol = s)` then prunes cached batches by
      // their min/max stats instead of scanning the full pair table —
      // the same batch-stats pruning the in-heap path gets from the
      // pushed IN-list (measured at exome shape: 0.164 → ~0.07 s/gene)
      GeneIndex(Map.empty, Some(
        pairs.repartitionByRange(64, col("symbol"))
          .sortWithinPartitions("symbol")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
  }

  /** [[filterByGene]] through a prebuilt [[GeneIndex]]: the impact-side
    * scan+join disappears entirely — one pushed-predicate pass over
    * `info` for typical genes (id list ≤ [[InListMaxIds]], pushed as an
    * IN filter), a broadcast semi-join for giant genes. Results are
    * identical to [[filterByGene]].
    */
  def filterByGeneIndexed(
      index: GeneIndex, info: DataFrame,
      symbol: String, afMax: Double = 0.01): DataFrame = {
    val base = info.filter(col("af") < afMax)
    val matched = index.spill match {
      case Some(pairs) =>
        // spilled index: the per-gene id set stays executor-side — a
        // broadcast semi-join against the cached pairs filtered to the
        // gene (gene-sized, broadcastable even when the index is not)
        base.join(
          broadcast(pairs.where(col("symbol") === symbol).select("variant_id")),
          Seq("variant_id"), "left_semi")
      case None =>
        val hit = index.ids.getOrElse(symbol, Array.empty[Long])
        if (hit.length <= InListMaxIds)
          base.filter(col("variant_id").isin(hit.toSeq: _*))
        else {
          val spark = info.sparkSession
          import spark.implicits._
          base.join(broadcast(hit.toSeq.toDF("variant_id")),
            Seq("variant_id"), "left_semi")
        }
    }
    matched.withColumn("symbol", lit(symbol))
  }

  /** Genotype pull by id set (`pull_vars_by_id`, `00:10-55`): a
    * broadcast semi-join filter on the long geno table. The sorted
    * `variant_id` parquet layout makes this a stats-pruned scan — the
    * replacement for both the file-per-variant mode and the B-tree
    * index mode.
    */
  def pullByIds(geno: DataFrame, ids: Seq[Long]): DataFrame =
    if (ids.size <= 1000) geno.filter(col("variant_id").isin(ids: _*))
    else {
      val spark = geno.sparkSession
      import spark.implicits._
      geno.join(broadcast(ids.toDF("variant_id")), Seq("variant_id"), "left_semi")
    }

  /** Composed filter + pull (`pull_geno_test`, `00:105-147`). */
  def pullByGene(
      impact: DataFrame, info: DataFrame, geno: DataFrame,
      symbol: String, afMax: Double = 0.01): DataFrame = {
    val ids = filterByGene(impact, info, symbol, afMax).select("variant_id").distinct()
    geno.join(broadcast(ids), Seq("variant_id"))
  }

  /** Interval-overlap variant lookup — the GRanges sidecar's role
    * (`03-index-db.R:72-82`), as a distributed range join over the
    * (chr, start, end) columns.
    */
  def pullByRange(info: DataFrame, chr: String, start: Long, end: Long): DataFrame =
    info.filter(
      col("chr") === chr && col("start") <= end && col("end") >= start)

  /** Per-sample genotype QC — the PLINK-style `--missing`/`--het`
    * survey over the long geno table: call/missing counts, het rate
    * among calls, mean dosage, mean depth. One map-side-combinable
    * aggregation keyed on sample (samples ≪ genotypes, so the shuffle
    * payload is a handful of partial-agg rows per partition at any
    * corpus size). Output: `sample, n_calls, n_missing, het_rate,
    * mean_gt, mean_dp` (rates/means rounded to 4).
    */
  def sampleQc(geno: DataFrame): DataFrame =
    geno.groupBy("sample")
      .agg(
        count(col("gt")).as("n_calls"),
        count(when(col("gt").isNull, lit(1))).as("n_missing"),
        round(count(when(col("gt") === 1d, lit(1))).cast("double") /
          count(col("gt")), 4).as("het_rate"),
        round(avg(col("gt")), 4).as("mean_gt"),
        round(avg(col("dp")), 4).as("mean_dp"))

  /** Per-variant genotype QC: call rate, alt-allele frequency from
    * dosages (`Σgt / 2·calls`, the diploid convention), het count.
    * Same single-aggregation shape keyed on variant_id. Output:
    * `variant_id, n_called, call_rate, alt_af, n_het`.
    */
  def variantQc(geno: DataFrame): DataFrame =
    geno.groupBy("variant_id")
      .agg(
        count(col("gt")).as("n_called"),
        round(count(col("gt")).cast("double") / count(lit(1)), 4).as("call_rate"),
        round(sum(col("gt")) / (count(col("gt")) * 2d), 4).as("alt_af"),
        count(when(col("gt") === 1d, lit(1))).as("n_het"))

  /** Per-variant Hardy-Weinberg equilibrium χ² — the classic variant-
    * QC screen a genotype store runs after [[variantQc]]: from the
    * called-genotype counts (n0 hom-ref, n1 het, n2 hom-alt) derive
    * the ref-allele frequency p = (2·n0 + n1)/(2n) and the χ²
    * distance of the observed genotype counts from the p²/2pq/q²
    * expectation; zero-expectation cells (monomorphic variants) are
    * skipped per the standard convention, so a fixed site scores 0.
    * Output: `variant_id, n, n0, n1, n2, p_ref, hwe_chi2` (p and χ²
    * rounded to 4).
    *
    * Scale shape: ONE map-side-combinable aggregation keyed on
    * variant_id over the long geno table — the same shape as
    * [[variantQc]]; the χ² arithmetic is row-local on the aggregated
    * counts. No joins, no windows.
    */
  def hweReport(geno: DataFrame): DataFrame = {
    val agg = geno.groupBy("variant_id").agg(
      count(col("gt")).as("n"),
      count(when(col("gt") === 0d, lit(1))).as("n0"),
      count(when(col("gt") === 1d, lit(1))).as("n1"),
      count(when(col("gt") === 2d, lit(1))).as("n2"))
    val nD = col("n").cast("double")
    val p = (lit(2d) * col("n0") + col("n1")) / (lit(2d) * nD)
    val q = lit(1d) - col("_p")
    val e0 = col("_p") * col("_p") * nD
    val e1 = lit(2d) * col("_p") * q * nD
    val e2 = q * q * nD
    def cell(o: Column, e: Column): Column =
      when(e > 0, (o - e) * (o - e) / e).otherwise(lit(0d))
    agg.where(col("n") > 0)
      .withColumn("_p", p)
      .withColumn("_chi2",
        cell(col("n0"), e0) + cell(col("n1"), e1) + cell(col("n2"), e2))
      .select(col("variant_id"), col("n"), col("n0"), col("n1"), col("n2"),
        round(col("_p"), 4).as("p_ref"),
        round(col("_chi2"), 4).as("hwe_chi2"))
  }

  /** Per-sample transition/transversion ratio — the standard
    * sample-level QC statistic after [[sampleQc]]: among the SNP sites
    * where a sample carries at least one alt allele (gt > 0), count
    * transition sites (A↔G, C↔T) vs transversion sites (everything
    * else) and report their ratio (exome-wide expectation ≈ 3.0; a
    * depressed ratio flags artifact calls). Output:
    * `sample, n_ts, n_tv, tstv` (ratio rounded to 4, NULL when no
    * transversions).
    *
    * Scale shape: classify each SNP site once from `info.ref/alt`
    * (row-local CASE), equi-join the alt-carrying geno rows to the
    * classification on variant_id (both sides keyed on the join
    * column; AQE broadcasts the site side when small), then ONE
    * map-side-combinable aggregation keyed on sample.
    */
  def tsTvReport(geno: DataFrame, info: DataFrame): DataFrame = {
    val ts = Seq(("A", "G"), ("G", "A"), ("C", "T"), ("T", "C"))
    val isTs = ts.map { case (r, a) => col("ref") === r && col("alt") === a }
      .reduce(_ || _)
    val sites = info.where(col("vt") === "SNP")
      .select(col("variant_id"), isTs.as("is_ts"))
    geno.where(col("gt") > 0)
      .join(sites, Seq("variant_id"))
      .groupBy("sample")
      .agg(
        count(when(col("is_ts"), lit(1))).as("n_ts"),
        count(when(!col("is_ts"), lit(1))).as("n_tv"))
      .withColumn("tstv",
        when(col("n_tv") > 0,
          round(col("n_ts") / col("n_tv").cast("double"), 4)))
  }

  /** Folded allele-frequency spectrum — the histogram of minor-allele
    * frequencies over all variants, the population-genetics summary a
    * cohort store reports per build (an excess of rare bins flags call
    * artifacts; the folded form maf = min(af, 1−af) is ascertainment-
    * neutral). Output: `bin, maf_lo, n` where bin = floor(maf·10)
    * (maf exactly 0.5 lands in bin 5).
    *
    * Scale shape: one row-local projection + one 11-group aggregation
    * over `info` — no joins, no windows.
    */
  /** Per-sample missingness (call-rate) report — the first QC gate of
    * any genotype pipeline (plink `--missing`): for each sample the
    * total sites, called sites (gt non-null) and call rate. Output:
    * `sample, n_sites, n_called, call_rate` (4dp — an exact integer
    * ratio).
    *
    * Scale shape: one combinable per-sample aggregate over geno; no
    * joins.
    */
  def missingnessReport(geno: DataFrame): DataFrame =
    geno.groupBy(col("sample"))
      .agg(count(lit(1)).as("n_sites"), count(col("gt")).as("n_called"))
      .withColumn("call_rate",
        round(col("n_called").cast("double") / col("n_sites"), 4))

  /** Rare-variant burden per (sample, gene) — the collapsing-test
    * input table of gene-based association studies (SKAT/burden
    * pipelines): for every sample, the count of distinct rare
    * (`af < afMax`) sites in each gene where the sample carries at
    * least one alt allele, plus the total alt-allele count. Output:
    * `sample, symbol, n_sites, n_alleles`.
    *
    * Scale shape: the af filter prunes `info` first (slim semi-join
    * side), impact deduplicates to (variant, symbol) — a variant with
    * many consequence rows counts once — and the alt-carrying geno
    * rows equi-join on variant_id (AQE broadcasts the site side when
    * small). One combinable aggregate; no windows.
    */
  def burdenReport(geno: DataFrame, impact: DataFrame, info: DataFrame,
      afMax: Double): DataFrame = {
    val rare = info.where(col("af") < afMax).select("variant_id")
    val sites = impact.select("variant_id", "symbol").distinct()
      .join(rare, Seq("variant_id"), "left_semi")
    geno.where(col("gt") > 0)
      .join(sites, Seq("variant_id"))
      .groupBy(col("sample"), col("symbol"))
      .agg(countDistinct(col("variant_id")).as("n_sites"),
        sum(col("gt")).cast("long").as("n_alleles"))
  }

  /** Runs of homozygosity per (sample, chromosome) — the inbreeding /
    * autozygosity QC scan (long ROH flags consanguinity; per-sample ROH
    * burden is a standard cohort report). Gaps-and-islands over a
    * sample's calls in chromosome order: a heterozygous (gt = 1) or
    * missing (gt NULL) call breaks the run; maximal runs of ≥ `minSites`
    * consecutive homozygous sites (gt 0 or 2) are reported. Output:
    * `sample, chr, start_pos, end_pos, n_sites`.
    *
    * Scale shape: one variant-keyed equi-join of geno onto site
    * coordinates (AQE broadcasts the slim side when small), one
    * (sample, chr) window pass — per-partition state bounded by one
    * chromosome's sites for one sample — and one run-keyed combinable
    * aggregate. No self-joins; the run id is a running break count, so
    * a single ordered pass suffices.
    */
  def rohReport(geno: DataFrame, info: DataFrame,
      minSites: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sites = info.select(col("variant_id"), col("chr"), col("start"))
    val g = geno.join(sites, Seq("variant_id"))
      .select(col("sample"), col("chr"), col("start"),
        (col("gt").isNotNull && col("gt") =!= 1d).as("__hom"))
    val w = Window.partitionBy("sample", "chr").orderBy("start")
    g.withColumn("__brk", when(col("__hom"), 0L).otherwise(1L))
      .withColumn("__run", sum(col("__brk")).over(w))
      .where(col("__hom"))
      .groupBy(col("sample"), col("chr"), col("__run"))
      .agg(min("start").as("start_pos"), max("start").as("end_pos"),
        count(lit(1)).as("n_sites"))
      .where(col("n_sites") >= minSites)
      .select("sample", "chr", "start_pos", "end_pos", "n_sites")
  }

  def alleleFrequencySpectrum(info: DataFrame): DataFrame =
    info
      .select(least(col("af"), lit(1d) - col("af")).as("maf"))
      .select(floor(col("maf") * 10).cast("bigint").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("maf_lo", round(col("bin") / 10d, 1))
      .select("bin", "maf_lo", "n")

  /** Pairwise linkage disequilibrium r² for variant pairs within
    * `maxDist` bp on the same chromosome — the windowed LD scan behind
    * pruning and tag-SNP selection. For each qualifying pair, r is the
    * Pearson correlation of the two dosage vectors over the samples
    * where BOTH genotypes are called; pairs where either side is
    * monomorphic among shared samples get NULL r². Output:
    * `id_a, id_b, dist, n, r2` (r² rounded to 4).
    *
    * Scale shape: genotypes are first packed into ONE dosage vector
    * per variant (a single variant-keyed aggregation), so the pair
    * join moves one row per variant, not one per genotype. Alignment
    * between the two sides is POSITIONAL over a shared sample-ordinal
    * dictionary (built once, one slim shuffle): the pair-local
    * correlation is a `zip_with` over two equal-length dense arrays —
    * O(S) integer/double ops per pair. The first version aligned by
    * sample-keyed MAP lookups instead; profiling the 2M-variant tier
    * showed every core pinned in `GetMapValueUtil`'s linear scan
    * (O(S²) UTF8 comparisons per pair) — dense ordinals remove the
    * string compares and the quadratic scan both. Inputs that are
    * SPARSE (a (variant, sample) row entirely absent, not just NULL
    * gt) are detected by a one-aggregate completeness probe and take
    * a densify step through an int-keyed map, so they still correlate
    * sample-to-sample, never position-to-wrong-position. Pair
    * candidates come from position-bucket blocking (bucket width =
    * maxDist; each left row probes its own and the next bucket —
    * every qualifying pair lands in exactly one probe because
    * a.start ≤ b.start ≤ a.start + maxDist spans at most two
    * buckets), so candidates are bounded by local variant density,
    * never all-pairs-per-chromosome. Pair ordering is keyed on
    * (position, id) — NOT on id order agreeing with position order —
    * so shared-position variants (split multiallelics) and
    * non-monotone id assignments still emit every qualifying pair
    * exactly once. The correlation sums are row-local integer folds
    * over the bounded per-pair sample intersection.
    */
  def ldReport(geno: DataFrame, info: DataFrame, maxDist: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // sample → dense ordinal; S distinct samples through one
    // single-partition window (S ≪ corpus; ~100k rows at biobank width)
    val idx = geno.select(col("sample")).distinct()
      .withColumn("__si",
        (row_number().over(Window.orderBy("sample")) - 1).cast("int"))
    val nS = idx.count()
    val g = geno.join(broadcast(idx), Seq("sample"))
    // completeness probe: every variant carrying exactly S gt rows
    // (missing CALLS as NULL gt) sorts densely by ordinal — the shape
    // every VCF-derived geno table has
    val mm = g.groupBy("variant_id").agg(count(lit(1)).as("__n"))
      .agg(min("__n"), max("__n")).head()
    val complete = !mm.isNullAt(0) && mm.getLong(0) == nS && mm.getLong(1) == nS
    val vecs =
      if (complete)
        g.groupBy("variant_id")
          .agg(transform(
            array_sort(collect_list(struct(col("__si"), col("gt").as("g")))),
            e => e("g")).as("dose"))
      else
        // sparse fallback: densify through an int-keyed map (integer
        // compares, once per VARIANT — never inside the pair kernel)
        g.groupBy("variant_id")
          .agg(map_from_entries(collect_list(
            struct(col("__si"), col("gt")))).as("__m"))
          .select(col("variant_id"),
            transform(sequence(lit(0), lit(math.max(nS - 1, 0).toInt)),
              i => try_element_at(col("__m"), i)).as("dose"))
    val sites = info.select(col("variant_id"), col("chr"), col("start"))
      .join(vecs, Seq("variant_id"))
      .withColumn("bucket", floor(col("start") / maxDist))
    val a = sites.select(col("variant_id").as("id_a"), col("chr"),
      col("start").as("pos_a"), col("dose").as("da"), col("bucket"))
    val probe = a.select(col("id_a"), col("chr"), col("pos_a"), col("da"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    val b = sites.select(col("variant_id").as("id_b"), col("chr"),
      col("start").as("pos_b"), col("dose").as("db"), col("bucket"))
    // telemetry is 1:1 with the qualifying window pairs — the volume
    // the scaling sweep tracks against variant density (identity when
    // telemetry is disabled, which is every gate/spec run).
    // Explicit-count repartition on the bucket key: the join INPUTS
    // are variant-count-sized but the output is window-pairs × the
    // posexplode/agg kernel IN THE SAME STAGE — AQE coalesces by input
    // bytes and would serialize the whole kernel (the linkage/kinship
    // output-explosion lesson)
    val parts = math.max(
      geno.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val pairs = graft.operators.Telemetry.mark(
      probe.repartition(parts, col("chr"), col("bucket"))
        .join(b.repartition(parts, col("chr"), col("bucket")),
          Seq("chr", "bucket"))
        .where((col("pos_b") > col("pos_a")
            || (col("pos_b") === col("pos_a") && col("id_b") > col("id_a")))
          && col("pos_b") - col("pos_a") <= maxDist),
      "ld_candidates")
    // positional alignment over the shared ordinal dictionary: each
    // pair's left vector posexplodes (codegen'd generator) and the
    // right side is an O(1) element_at by INDEX, then ONE combinable
    // hash aggregation folds the six integer sums (gt ∈ {0,1,2}) —
    // r and r² derive row-locally from them. Higher-order array
    // functions (zip_with/filter/aggregate) would express this without
    // the explode, but they evaluate INTERPRETED (per-pair struct
    // allocation, no whole-stage codegen — profiled as the kernel
    // ceiling at the 2M-variant tier); the generator + hash-agg plan
    // keeps everything inside codegen, with map-side partial
    // aggregation collapsing each pair's S rows before the exchange.
    // Conditional sums (not a WHERE) keep zero-overlap pairs emitting
    // their n = 0 row, exactly like the array form did.
    val both = col("__a").isNotNull && col("__b").isNotNull
    def csum(c: Column): Column =
      sum(when(both, c.cast("long")).otherwise(0L))
    val sums = pairs
      .select(col("id_a"), col("id_b"),
        (col("pos_b") - col("pos_a")).as("dist"), col("db"),
        posexplode(col("da")))
      .select(col("id_a"), col("id_b"), col("dist"),
        col("col").as("__a"),
        element_at(col("db"), col("pos") + 1).as("__b"))
      .groupBy("id_a", "id_b", "dist")
      .agg(
        sum(when(both, 1L).otherwise(0L)).as("n"),
        csum(col("__a")).as("sa"),
        csum(col("__b")).as("sb"),
        csum(col("__a") * col("__a")).as("saa"),
        csum(col("__b") * col("__b")).as("sbb"),
        csum(col("__a") * col("__b")).as("sab"))
    val num = col("n") * col("sab") - col("sa") * col("sb")
    val denA = col("n") * col("saa") - col("sa") * col("sa")
    val denB = col("n") * col("sbb") - col("sb") * col("sb")
    sums.select(col("id_a"), col("id_b"), col("dist"), col("n"),
      when(denA > 0 && denB > 0,
        round(num * num / (denA * denB).cast("double"), 4)).as("r2"))
  }

  /** Pairwise sample relatedness by identity-by-state — the
    * PLINK-`--genome`-shaped audit that catches duplicates and
    * unexpected relatives in a cohort: for each sample pair, over the
    * variants where both are called, count sites sharing 0/1/2 alleles
    * (|dosage gap| 2/1/0) and report the mean shared-allele fraction.
    * Output: `sample_a, sample_b, n, ibs0, ibs1, ibs2, ibs_frac`
    * (fraction rounded to 4).
    *
    * Scale shape: a geno self-join co-keyed on variant_id (no
    * re-keying — both sides arrive partitioned by the join column)
    * followed by ONE combinable aggregation on the sample pair. The
    * pair blow-up is inherently O(variants · samples²); the standard
    * production bound is `maxVariants`: an md5-lowest deterministic
    * variant sample (the PLINK practice of estimating IBS on a pruned
    * subset), keeping cost O(maxVariants · S²) independent of corpus
    * size. 0 = no sampling. `sampleBlocks` > 1 additionally
    * grid-partitions the pair space ([[samplePairGrid]], the KING
    * `--parallel` decomposition) so no single task ever materializes
    * more than ⌈S/B⌉² pairs of a variant — the knob that keeps biobank
    * sample width (100k+) from turning the self-join into one
    * S²-sized straggler partition.
    */
  /** Grid-blocked sample-pair self-join shared by [[ibsReport]],
    * [[kingReport]] and [[grmReport]] — the KING `--parallel`
    * decomposition. `a`/`b` carry (variant_id, sample_a/sample_b,
    * payload…). With `sampleBlocks` ≤ 1 this is the plain variant-keyed
    * self-join: total pair volume O(variants·S²), but every pair of a
    * variant lands in ONE task — a straggler (and a single shuffle
    * partition of S² rows) at biobank sample width. With B > 1 each
    * sample hashes to a block and each row is replicated across the
    * opposing block axis, so the join key becomes
    * (variant_id, block_a, block_b): every pair still appears exactly
    * once, but a task's pair volume is bounded by ⌈S/B⌉² per variant —
    * B² grid cells that schedule independently. Input inflation is B×
    * per side, asymptotically free while B ≪ S (the pair OUTPUT, which
    * is unchanged, dominates). Keeps `_ba`/`_bb` for the scale spec;
    * public callers drop them.
    */
  private[graft] def samplePairGrid(a: DataFrame, b: DataFrame,
      includeDiagonal: Boolean, sampleBlocks: Int): DataFrame = {
    val pairPred =
      if (includeDiagonal) col("sample_a") <= col("sample_b")
      else col("sample_a") < col("sample_b")
    if (sampleBlocks <= 1)
      a.join(b, Seq("variant_id")).where(pairPred)
        .withColumn("_ba", lit(0)).withColumn("_bb", lit(0))
    else {
      val nB = sampleBlocks
      def blockOf(c: Column) = pmod(xxhash64(c), lit(nB.toLong)).cast("int")
      val aExp = a.withColumn("_ba", blockOf(col("sample_a")))
        .withColumn("_bb", explode(sequence(lit(0), lit(nB - 1))))
      val bExp = b.withColumn("_bb", blockOf(col("sample_b")))
        .withColumn("_ba", explode(sequence(lit(0), lit(nB - 1))))
      // EXPLICIT-count repartition on the exact join key: AQE sizes
      // post-shuffle partitions by INPUT bytes, and this join's inputs
      // are B× the (slim) geno while its OUTPUT is the C(S,2) pair
      // explosion — observed at 50k samples, AQE coalesced the 64×64
      // grid onto TWO straggler tasks, undoing the decomposition this
      // operator exists for. A user-specified numPartitions is exempt
      // from AQE coalescing, and the join reuses the partitioning (no
      // extra exchange), so the grid's parallelism is load-bearing
      // again no matter how small the input bytes look.
      val parts = math.max(
        a.sparkSession.sessionState.conf.numShufflePartitions,
        math.min(nB * nB, 4096))
      aExp.repartition(parts, col("variant_id"), col("_ba"), col("_bb"))
        .join(bExp.repartition(parts, col("variant_id"), col("_ba"), col("_bb")),
          Seq("variant_id", "_ba", "_bb"))
        .where(pairPred)
    }
  }

  def ibsReport(geno: DataFrame, maxVariants: Long = 0L,
      sampleBlocks: Int = 1): DataFrame = {
    val called = geno.where(col("gt").isNotNull)
      .select(col("variant_id"), col("sample"), col("gt").cast("int").as("g"))
    val base =
      if (maxVariants <= 0) called
      else {
        val keep = called.select("variant_id").distinct()
          .orderBy(md5(concat(lit("ibs:"), col("variant_id"))), col("variant_id"))
          .limit(maxVariants.toInt)
        called.join(keep, Seq("variant_id"), "left_semi")
      }
    val a = base.select(col("variant_id"), col("sample").as("sample_a"),
      col("g").as("ga"))
    val b = base.select(col("variant_id"), col("sample").as("sample_b"),
      col("g").as("gb"))
    samplePairGrid(a, b, includeDiagonal = false, sampleBlocks)
      .withColumn("_gap", abs(col("ga") - col("gb")))
      .groupBy("sample_a", "sample_b")
      .agg(
        count(lit(1)).as("n"),
        count(when(col("_gap") === 2, lit(1))).as("ibs0"),
        count(when(col("_gap") === 1, lit(1))).as("ibs1"),
        count(when(col("_gap") === 0, lit(1))).as("ibs2"),
        round(avg(lit(2d) - col("_gap")) / 2d, 4).as("ibs_frac"))
  }

  /** Pairwise KING-robust kinship (Manichaikul et al. 2010, the
    * estimator behind `king --kinship` / `plink2 --make-king`):
    * `φ̂ = (N_Aa,Aa − 2·N_AA,aa) / (N_Aa,i + N_Aa,j)` over the sites
    * where both samples are called — N_Aa,Aa = both heterozygous,
    * N_AA,aa = opposite homozygotes, N_Aa,i = sample i's het count on
    * the shared sites. Unlike [[ibsReport]]'s raw sharing fractions,
    * φ̂ is allele-frequency-free and robust to population structure:
    * duplicates/MZ twins → 0.5, parent-offspring → 0.25, unrelated →
    * ≈ 0 (negative under structure). Output: `sample_a, sample_b,
    * n_shared, n_het_het, n_opp_homo, n_het_a, n_het_b, phi` (phi
    * rounded to 4; NULL when neither sample has a het site — the
    * estimator is undefined on het-free pairs).
    *
    * Scale shape: identical to [[ibsReport]] — a geno self-join
    * co-keyed on variant_id, ONE combinable sample-pair aggregation,
    * integer counts until the final division, and the same
    * `maxVariants` md5-deterministic pruned-subset bound on the
    * O(variants · samples²) pair volume (0 = no sampling) and the same
    * `sampleBlocks` grid decomposition for biobank sample width.
    */
  def kingReport(geno: DataFrame, maxVariants: Long = 0L,
      sampleBlocks: Int = 1): DataFrame = {
    val called = geno.where(col("gt").isNotNull)
      .select(col("variant_id"), col("sample"), col("gt").cast("int").as("g"))
    val base =
      if (maxVariants <= 0) called
      else {
        val keep = called.select("variant_id").distinct()
          .orderBy(md5(concat(lit("king:"), col("variant_id"))), col("variant_id"))
          .limit(maxVariants.toInt)
        called.join(keep, Seq("variant_id"), "left_semi")
      }
    val a = base.select(col("variant_id"), col("sample").as("sample_a"),
      col("g").as("ga"))
    val b = base.select(col("variant_id"), col("sample").as("sample_b"),
      col("g").as("gb"))
    samplePairGrid(a, b, includeDiagonal = false, sampleBlocks)
      .groupBy("sample_a", "sample_b")
      .agg(
        count(lit(1)).as("n_shared"),
        count(when(col("ga") === 1 && col("gb") === 1, lit(1)))
          .as("n_het_het"),
        count(when(abs(col("ga") - col("gb")) === 2, lit(1)))
          .as("n_opp_homo"),
        count(when(col("ga") === 1, lit(1))).as("n_het_a"),
        count(when(col("gb") === 1, lit(1))).as("n_het_b"))
      .withColumn("phi",
        when(col("n_het_a") + col("n_het_b") > 0,
          round((col("n_het_het") - lit(2) * col("n_opp_homo")).cast("double")
            / (col("n_het_a") + col("n_het_b")), 4)))
  }

  /** Unrelated-sample selection — the plink2 `--king-cutoff` step a
    * GWAS runs after [[kingReport]]: build the relatedness-conflict
    * graph (pairs with `phi > phiCutoff`) and keep a MAXIMAL
    * INDEPENDENT SET of it ([[graft.operators.Graph
    * .maximalIndependentSet]], Luby — the parallel analog of plink's
    * sequential greedy removal; both return a maximal unrelated set,
    * membership differs only in tie choices). Samples outside every
    * conflict pair are trivially kept. Vertices are 60-bit md5 hashes
    * of the sample names (collision ~2⁻⁶⁰). Emits `(sample, kept)`.
    *
    * Scale shape: [[kingReport]]'s blocked pair grid dominates; the
    * MIS runs on the CONFLICT pairs only (biobank cohorts: ≪ the pair
    * grid) in O(log n) equi-join rounds.
    */
  def unrelatedSet(geno: DataFrame, phiCutoff: Double,
      maxVariants: Long = 0L, sampleBlocks: Int = 1,
      maxRounds: Int = 12): DataFrame = {
    import graft.functions.md5Long
    val related = kingReport(geno, maxVariants, sampleBlocks)
      .where(col("phi") > phiCutoff)
      .select(col("sample_a"), col("sample_b"))
    val edges = related.select(
      md5Long(col("sample_a")).as("a"), md5Long(col("sample_b")).as("b"))
    val kept = graft.operators.Graph
      .maximalIndependentSet(edges, "a", "b", maxRounds)
      .withColumn("__mis", lit(true))
    val inConflict = related.select(col("sample_a").as("sample"))
      .union(related.select(col("sample_b").as("sample"))).distinct()
      .withColumn("__conf", lit(true))
    geno.select(col("sample")).distinct()
      .join(inConflict, Seq("sample"), "left")
      .withColumn("id", md5Long(col("sample")))
      .join(kept, Seq("id"), "left")
      .select(col("sample"),
        (col("__conf").isNull || col("__mis").isNotNull).as("kept"))
  }

  /** Genetic relationship matrix, GCTA/VanRaden per-marker-standardized
    * form (`gcta --make-grm` / `plink --make-rel`): for samples i, j,
    * `G_ij = (1/M_ij) Σ_m (g_im − 2p_m)(g_jm − 2p_m) / (2p_m(1−p_m))`
    * over the markers where both are called, with `p̂_m` = cohort
    * allele frequency (mean dosage / 2 over called samples) and
    * monomorphic sites (p̂ ∈ {0, 1}) excluded — the matrix GWAS mixed
    * models and PCA-based ancestry analyses consume. Includes the
    * diagonal (`sample_a = sample_b`, the 1+F self-relationship).
    * Output: `sample_a, sample_b, m_variants, grm` (rounded to 4).
    *
    * Scale shape: the allele-frequency pass is one combinable
    * per-variant aggregate joined back on the variant key (both sides
    * already partitioned by it — no re-key); then the same co-keyed
    * self-join + ONE combinable pair aggregation as [[ibsReport]],
    * with the identical `maxVariants` md5-pruned bound on the
    * O(variants · samples²) pair volume (0 = no sampling) and the same
    * `sampleBlocks` grid decomposition for biobank sample width.
    */
  def grmReport(geno: DataFrame, maxVariants: Long = 0L,
      sampleBlocks: Int = 1): DataFrame = {
    val called = geno.where(col("gt").isNotNull)
      .select(col("variant_id"), col("sample"),
        col("gt").cast("double").as("g"))
    val base =
      if (maxVariants <= 0) called
      else {
        val keep = called.select("variant_id").distinct()
          .orderBy(md5(concat(lit("grm:"), col("variant_id"))), col("variant_id"))
          .limit(maxVariants.toInt)
        called.join(keep, Seq("variant_id"), "left_semi")
      }
    val af = base.groupBy("variant_id")
      .agg((avg("g") / 2d).as("p"))
      .where(col("p") > 0d && col("p") < 1d)
    val std = base.join(af, Seq("variant_id"))
      .select(col("variant_id"), col("sample"),
        (col("g") - lit(2d) * col("p")).as("z"),
        (lit(2d) * col("p") * (lit(1d) - col("p"))).as("d"))
    val a = std.select(col("variant_id"), col("sample").as("sample_a"),
      col("z").as("za"), col("d"))
    val b = std.select(col("variant_id"), col("sample").as("sample_b"),
      col("z").as("zb"))
    samplePairGrid(a, b, includeDiagonal = true, sampleBlocks)
      .groupBy("sample_a", "sample_b")
      .agg(count(lit(1)).as("m_variants"),
        round(sum(col("za") * col("zb") / col("d")) / count(lit(1)), 4)
          .as("grm"))
  }

  /** LD decay curve: mean pairwise r² by distance bin — the standard
    * population-genetics summary of how fast linkage decays along the
    * genome (plink `--r2` post-processed by distance). Bins are
    * `binBp`-wide over [[ldReport]]'s window pairs.
    *
    * Determinism: r² values arrive 4dp-rounded, so the per-bin mean is
    * computed from an exact integer sum of 1e4-grid units (order-free
    * across partitions) and lands on the 1e-6 floor grid. NULL-r² pairs
    * (zero-variance sites) stay in `n_pairs` but not `n_scored`.
    * Output: `dist_from, dist_to, n_pairs, n_scored, mean_r2`.
    *
    * Scale shape: inherits ldReport's bucket-blocked pair kernel; the
    * decay rollup adds ONE combinable aggregation over bin ids —
    * bounded by maxDist/binBp groups, no new pair work.
    */
  def ldDecay(geno: DataFrame, info: DataFrame, maxDist: Long,
      binBp: Long): DataFrame = {
    require(binBp > 0, "binBp must be positive")
    ldReport(geno, info, maxDist)
      .select(expr(s"dist div ${binBp}L").as("__bin"), col("r2"))
      .groupBy("__bin")
      .agg(count(lit(1)).as("n_pairs"),
        count(col("r2")).as("n_scored"),
        sum(when(col("r2").isNotNull,
            floor(col("r2") * 1e4 + 0.5).cast("long")).otherwise(0L))
          .as("__s4"))
      .select((col("__bin") * binBp).as("dist_from"),
        (col("__bin") * binBp + binBp - 1).as("dist_to"),
        col("n_pairs"), col("n_scored"),
        when(col("n_scored") > 0,
          floor(col("__s4").cast("double") / col("n_scored") / 1e4
            * 1e6 + 0.5) / 1e6).as("mean_r2"))
      .orderBy("dist_from")
  }

  /** Leading principal component of the genetic relationship matrix —
    * the population-structure axis (EIGENSTRAT/smartpca's PC1, the
    * covariate every GWAS adjusts for). Power iteration where the
    * matrix-vector product is a JOIN: `w_a = Σ_b G_ab · v_b` is one
    * sample-keyed join + one aggregation per round, so the GRM is never
    * collected — at biobank width (100k samples ⇒ 10^10 pair entries)
    * a driver-side eigensolve is impossible but each matvec is an
    * ordinary distributed join. (The embeddings-domain [[
    * graft.operators.Similarity.pcaProject]] collects a d×d covariance
    * instead — fine for bounded d, not for n×n sample matrices.)
    *
    * Cross-engine determinism (float sums over a shuffle have no
    * defined order): every accumulation is INTEGER. GRM weights arrive
    * 4dp-rounded → 1e4-grid longs; v lives on a 1e-12 grid; per-round
    * products g4·v12 (≤ ~1e16 for |grm| ≤ 920) sum in decimal(38,0)
    * (DuckDB HUGEINT), the quantized w re-grids to 1e-12 via sign-aware
    * integer-valued floors, and the norm is √(Σ m12², decimal-exact).
    * The only doubles are IEEE-correctly-rounded casts, divisions and
    * sqrt of identical values — bit-identical in any engine. Start
    * vector: deterministic md5-parity ±1 (the all-ones vector is near
    * the GRM's null space — rows of a centered matrix sum ≈ 0).
    *
    * Sign convention: flipped so the lexicographically-first sample
    * loads ≥ 0. Output: `sample, pc1` (1e-12 grid) and the Rayleigh
    * eigenvalue estimate `lambda1` (= final pre-normalization ‖w‖,
    * 1e-6 floor grid, repeated per row).
    */
  def grmPca(geno: DataFrame, iters: Int = 8,
      maxVariants: Long = 0L, sampleBlocks: Int = 1): DataFrame = {
    import graft.functions.md5Long
    import graft.operators.Dedup
    require(iters >= 1, "iters must be >= 1")
    val g4c = when(col("grm") >= 0, floor(col("grm") * 1e4 + 0.5))
      .otherwise(-floor(-col("grm") * 1e4 + 0.5)).cast("long")
    val up = grmReport(geno, maxVariants, sampleBlocks)
      .select(col("sample_a").as("a"), col("sample_b").as("b"), g4c.as("g4"))
    // EAGER localCheckpoint, not persist: a persisted frame keeps its
    // full logical plan, so all `iters` round joins below re-analyze
    // and re-optimize the whole GRM derivation (join + pair grid +
    // aggregate) once per round — measured as the dominant cost of
    // the gate call. The checkpoint truncates the lineage to a
    // LogicalRDD leaf: per-round planning is O(1) in the GRM plan.
    // The GRM itself is cohort²-bounded, the same residency class the
    // persist had; blocks are released explicitly after the loop.
    // pre-partitioned on the round-join key: localCheckpoint preserves
    // the physical partitioning in its LogicalRDD, so all `iters`
    // round joins below reuse it — the cohort²-sized GRM side crosses
    // an exchange ONCE, only the sample-sized vector moves per round
    val full = up.unionByName(up.filter(col("a") =!= col("b"))
      .select(col("b").as("a"), col("a").as("b"), col("g4")))
      .repartition(col("b"))
      .localCheckpoint()
    var v = full.select(col("a").as("s")).distinct()
      .select(col("s"),
        (when(md5Long(concat(lit("grmpca:"), col("s"))) % 2 === 0, 1L)
          .otherwise(-1L) * lit(1000000000000L)).as("v12"))
    // per round: ONE job (the norm aggregate materializes the round's
    // lazy localCheckpoint, truncating plan growth — the Graph CC
    // pattern); the 1-row norm collects to the driver and re-enters as
    // a literal. Superseded rounds' checkpoint blocks are dropped.
    var prev: DataFrame = null
    var lastNorm = 0d
    for (_ <- 1 to iters) {
      val wp = full.join(v.withColumnRenamed("s", "b"), Seq("b"))
        .groupBy("a")
        .agg(sum((col("g4") * col("v12")).cast("decimal(38,0)")).as("__w16"))
        .select(col("a"), col("__w16").cast("double").as("__wd"))
        .select(col("a"),
          when(col("__wd") >= 0, floor(col("__wd") / 1e4 + 0.5))
            .otherwise(-floor(-col("__wd") / 1e4 + 0.5)).cast("long")
            .as("m12"))
        .localCheckpoint(false)
      // m12 can exceed √Long.Max — cast BEFORE squaring
      val nRow = wp
        .agg(sum(col("m12").cast("decimal(38,0)") * col("m12"))
          .cast("double").as("__nInt")).head()
      val nInt = if (nRow.isNullAt(0)) 0d else nRow.getDouble(0)
      lastNorm = math.sqrt(nInt) / 1e12
      val vd = col("m12").cast("double") / 1e12 / lit(lastNorm)
      v = wp.select(col("a").as("s"),
        when(lit(lastNorm) <= 0d, 0L)
          .when(vd >= 0, floor(vd * 1e12 + 0.5))
          .otherwise(-floor(-vd * 1e12 + 0.5)).cast("long").as("v12"))
      if (prev != null) graft.operators.Graph.unpersistCheckpoint(prev)
      prev = wp
    }
    val flipSign =
      if (v.orderBy("s").limit(1).head().getLong(1) < 0) -1L else 1L
    // the returned frame depends only on the LAST round's checkpoint
    // (v) — the GRM blocks are dead weight from here
    graft.operators.Graph.unpersistCheckpoint(full)
    val lambda1 = math.floor(lastNorm * 1e6 + 0.5) / 1e6
    v.select(col("s").as("sample"),
        ((col("v12") * lit(flipSign)).cast("double") / 1e12).as("pc1"),
        lit(lambda1).as("lambda1"))
      .orderBy("sample")
  }

  /** Per-sample heterozygosity / inbreeding coefficient (plink
    * `--het`): over the polymorphic sites where the sample is called,
    * `F = (O_hom − E_hom)/(M − E_hom)` with observed homozygote count
    * `O_hom = #{g ∈ {0, 2}}` and the HWE expectation
    * `E_hom = Σ_m (1 − 2p̂_m(1−p̂_m))` from cohort allele frequencies
    * (no small-sample correction; monomorphic sites excluded). The
    * per-sample QC that flags sample contamination (F ≪ 0, excess
    * hets) and consanguinity (F ≫ 0). Output:
    * `sample, m_sites, o_hom, e_hom, f` (e_hom/f rounded to 4).
    *
    * Scale shape: one per-variant frequency aggregate, one co-keyed
    * join back, ONE combinable per-sample aggregation — linear in
    * geno rows, no pair blow-up.
    */
  def hetReport(geno: DataFrame): DataFrame = {
    val called = geno.where(col("gt").isNotNull)
      .select(col("variant_id"), col("sample"),
        col("gt").cast("double").as("g"))
    val af = called.groupBy("variant_id")
      .agg((avg("g") / 2d).as("p"))
      .where(col("p") > 0d && col("p") < 1d)
    called.join(af, Seq("variant_id"))
      .groupBy("sample")
      .agg(count(lit(1)).as("m_sites"),
        count(when(col("g") === 0d || col("g") === 2d, lit(1))).as("o_hom"),
        sum(lit(1d) - lit(2d) * col("p") * (lit(1d) - col("p"))).as("__e"))
      .select(col("sample"), col("m_sites"), col("o_hom"),
        round(col("__e"), 4).as("e_hom"),
        round((col("o_hom") - col("__e"))
          / (col("m_sites") - col("__e")), 4).as("f"))
  }

  /** Mendelian-inheritance error check (plink `--mendel`): for each
    * trio and biallelic site where father, mother and child are all
    * called, the child's dosage must be reachable as one transmitted
    * allele per parent — a parent with dosage 0/1/2 can transmit
    * {0}/{0,1}/{1} — so the feasible range is
    * `[⌊f/2⌋·? ...]`: `c_min = [f=2] + [m=2]`, `c_max = 2 − [f=0] −
    * [m=0]`, and `c ∉ [c_min, c_max]` is a Mendel error (covers the
    * classic codes: 0×0→het/hom-alt child, 2×2→non-hom child,
    * 0×2→non-het child, hom×het→opposite-hom child). Emits one row
    * per trio: `(father, mother, child, n_tested, n_errors, error_rate)`
    * (rate rounded to 4; trios with no jointly-called site are
    * omitted). The de-novo/genotyping-error QC every family cohort
    * runs before association analysis.
    *
    * Scale shape: the trio list is a dimension table (broadcast), and
    * it attaches to the FATHER side BEFORE any variant-keyed join —
    * each (site, father) row expands only to that father's trios, and
    * the mother/child dosages arrive through plain equi-joins on
    * (variant_id, member). Each side is also semi-filtered to the
    * samples actually playing that role, so non-family cohort samples
    * never enter the join at all. The per-variant intermediate is
    * therefore one row per (site, trio) — never the called-samples ×
    * called-samples grid a variant-keyed parent self-join would build
    * (≈6.3M pairs/variant at 2,504 samples). Cost O(sites · trios),
    * then ONE combinable per-trio aggregation.
    */
  def mendelReport(geno: DataFrame, trios: DataFrame): DataFrame = {
    val fmc = trioDosages(geno, trios)
    val cMin = (col("g_father") === 2).cast("int") +
      (col("g_mother") === 2).cast("int")
    val cMax = lit(2) - (col("g_father") === 0).cast("int") -
      (col("g_mother") === 0).cast("int")
    fmc.withColumn("__err",
        (col("g_child") < cMin || col("g_child") > cMax).cast("long"))
      .groupBy("father", "mother", "child")
      .agg(count(lit(1)).as("n_tested"), sum("__err").as("n_errors"))
      .withColumn("error_rate",
        round(col("n_errors").cast("double") / col("n_tested"), 4))
  }

  /** The jointly-called (site, trio) dosage grid shared by
    * [[mendelReport]] and [[tdtReport]]: one row per (variant, trio)
    * where father, mother and child are all called, with integer
    * dosages `g_father`/`g_mother`/`g_child`.
    *
    * Scale shape (the reason both reports go through here): the trio
    * list is a broadcast dimension attached to the FATHER side before
    * any variant-keyed join, and each parent/child side is
    * semi-filtered to the samples actually playing that role — the
    * intermediate is O(sites · trios), never the called-samples²
    * grid a variant-keyed self-join would build.
    */
  private def trioDosages(geno: DataFrame, trios: DataFrame): DataFrame = {
    val called = geno.where(col("gt").isNotNull)
      .select(col("variant_id"), col("sample"), col("gt").cast("int").as("g"))
    def side(role: String) = called
      .join(broadcast(trios.select(col(role).as("sample")).distinct()),
        Seq("sample"), "left_semi")
      .select(col("variant_id"), col("sample").as(role),
        col("g").as(s"g_$role"))
    side("father")
      .join(broadcast(trios), Seq("father"))
      .join(side("mother"), Seq("variant_id", "mother"))
      .join(side("child"), Seq("variant_id", "child"))
  }

  /** Transmission disequilibrium test (plink `--tdt`, Spielman 1993):
    * per biallelic site, over jointly-called Mendel-CONSISTENT trios
    * with at least one heterozygous parent, count alt alleles
    * transmitted (`t`) vs untransmitted (`u`) by het parents and test
    * `chisq = (t−u)²/(t+u)` (McNemar). Under dosage coding both
    * counts are fully determined — no phase needed: hom parents'
    * transmissions are forced (`0` or `1` alt), so the het parents'
    * joint alt transmission is `x = g_child − [f=2] − [m=2]`, giving
    * `t += x`, `u += (#het parents) − x`. Mendel-inconsistent trios
    * (x outside [0, #het]) are excluded, matching plink's
    * error-filtered default; uninformative sites (t+u = 0) are
    * omitted. Emits `(variant_id, n_informative, t, u, chisq)` with
    * chisq rounded to 4.
    *
    * Scale shape: the [[trioDosages]] grid is O(sites · trios), the
    * per-trio transmission math is row-local, and the site rollup is
    * ONE combinable aggregation keyed by variant — the family-cohort
    * association scan stays a single shuffle at biobank scale.
    */
  def tdtReport(geno: DataFrame, trios: DataFrame): DataFrame = {
    val fmc = trioDosages(geno, trios)
    val nHet = (col("g_father") === 1).cast("int") +
      (col("g_mother") === 1).cast("int")
    val x = col("g_child") - (col("g_father") === 2).cast("int") -
      (col("g_mother") === 2).cast("int")
    fmc.select(col("variant_id"), nHet.as("__h"), x.as("__x"))
      .where(col("__h") > 0 && col("__x") >= 0 && col("__x") <= col("__h"))
      .groupBy("variant_id")
      .agg(count(lit(1)).as("n_informative"),
        sum("__x").as("t"),
        sum(col("__h") - col("__x")).as("u"))
      .where(col("t") + col("u") > 0)
      .withColumn("chisq",
        round((col("t") - col("u")).cast("double") *
          (col("t") - col("u")) / (col("t") + col("u")), 4))
  }

  /** Polygenic score, the plink `--score ... sum` form: per sample,
    * `PRS = Σ_m w_m·g_m`, substituting the cohort mean dosage `2p̂_m`
    * when the sample's call is missing (mean imputation, plink's
    * behavior when `no-mean-imputation` is NOT given). Note plink's
    * `--score` DEFAULT divides by the allele-observation count and
    * reports a per-variant average — this is the `sum` modifier's
    * semantics, the form PRS meta-analyses typically exchange. Emits
    * `(sample, n_used, n_imputed, score)` (score rounded to 4).
    * Weight rows for variants absent from geno contribute nothing.
    *
    * Scale shape: the weights join is co-keyed on the variant id
    * (weights tables are ≤ a few million rows — broadcastable; the
    * hint is left to AQE since published scores range from 10² to
    * 10⁷ variants), missing calls come from the SAME join (a full
    * per-(variant, sample) grid is never materialized — geno is
    * dense per contract, NULL gt = missing call), and the score is
    * ONE combinable per-sample aggregation.
    */
  def prsReport(geno: DataFrame, weights: DataFrame): DataFrame = {
    val af = geno.where(col("gt").isNotNull)
      .groupBy("variant_id")
      .agg((avg(col("gt").cast("double")) / 2d).as("__p"))
    geno.join(weights, Seq("variant_id"))
      .join(af, Seq("variant_id"), "left")
      .select(col("sample"),
        col("gt").isNotNull.as("__called"),
        when(col("gt").isNotNull, col("weight") * col("gt"))
          .otherwise(col("weight") * (lit(2d) * coalesce(col("__p"), lit(0d))))
          .as("__term"))
      .groupBy("sample")
      .agg(count(when(col("__called"), lit(1))).as("n_used"),
        count(when(!col("__called"), lit(1))).as("n_imputed"),
        round(sum("__term"), 4).as("score"))
  }

  /** Most-severe consequence per variant — the VEP
    * `--most_severe` / bcftools `+split-vep -s worst` collapse every
    * annotation pipeline runs before variant prioritization: rank each
    * impact row by the position of its `consequence` in the caller's
    * severity order (most severe first; unknown terms rank after all
    * known ones), and keep one row per variant with deterministic
    * tie-breaks (consequence, then symbol — two transcripts of the
    * same worst term pick the alphabetically-first gene).
    *
    * Scale shape: the severity order is a broadcast literal dimension;
    * the per-variant pick is a `row_number` window whose `rank = 1`
    * filter runs map-side as a partial WindowGroupLimit — one shuffle
    * of the (already slim) impact table at any scale.
    */
  def severestConsequence(impact: DataFrame,
      severity: Seq[String]): DataFrame = {
    require(severity.nonEmpty, "need a severity order")
    val spark = impact.sparkSession
    import spark.implicits._
    val sev = severity.zipWithIndex.toDF("consequence", "__rank")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("variant_id")
      .orderBy(col("__rank").asc, col("consequence").asc,
        col("symbol").asc)
    impact.join(broadcast(sev), Seq("consequence"), "left")
      .withColumn("__rank",
        coalesce(col("__rank"), lit(severity.size)))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .select("variant_id", "consequence", "impact", "symbol")
  }

  /** Per-variant fixation index between two sample populations —
    * Hudson's Fst estimator (Hudson/Slatkin/Maddison 1992 as
    * formulated in Bhatia et al., Genome Res 2013, the estimator
    * plink2 `--fst` defaults to for two populations):
    * with sample allele frequencies `p̂₁, p̂₂` over `n₁, n₂` called
    * ALLELES (2 × called samples),
    * `num = (p̂₁−p̂₂)² − p̂₁(1−p̂₁)/(n₁−1) − p̂₂(1−p̂₂)/(n₂−1)` (the
    * within-population sampling-noise correction) and
    * `den = p̂₁(1−p̂₂) + p̂₂(1−p̂₁)`; `fst = num/den`. Sites with fewer
    * than two called alleles in either population or a monomorphic
    * `den = 0` are omitted (plink's convention); negative estimates
    * are kept (they average out across sites — truncating biases
    * genome-wide means). Emits
    * `(variant_id, n1, n2, p1, p2, fst)`, p's and fst rounded to 4.
    *
    * Scale shape: one combinable (variant, pop) aggregation over the
    * population-tagged calls (the pops map is a broadcast dimension),
    * then a slim two-sided equi-join on variant_id and row-local
    * algebra. The population-structure scan stays a single data
    * shuffle at biobank scale.
    */
  def fstReport(geno: DataFrame, pops: DataFrame,
      popA: String, popB: String): DataFrame = {
    val per = geno.where(col("gt").isNotNull)
      .join(broadcast(pops), Seq("sample"))
      .where(col("pop").isin(popA, popB))
      .groupBy("variant_id", "pop")
      .agg(sum(col("gt").cast("long")).as("__s"),
        (count(lit(1)) * 2L).as("__n"))
    def side(p: String, sfx: String) = per.where(col("pop") === p)
      .select(col("variant_id"),
        col("__n").as(s"n$sfx"),
        (col("__s").cast("double") / col("__n")).as(s"p$sfx"))
    val j = side(popA, "1").join(side(popB, "2"), Seq("variant_id"))
      .where(col("n1") > 1 && col("n2") > 1)
    val num = (col("p1") - col("p2")) * (col("p1") - col("p2")) -
      col("p1") * (lit(1d) - col("p1")) / (col("n1") - 1) -
      col("p2") * (lit(1d) - col("p2")) / (col("n2") - 1)
    val den = col("p1") * (lit(1d) - col("p2")) +
      col("p2") * (lit(1d) - col("p1"))
    j.where(den > 0d)
      .select(col("variant_id"), col("n1"), col("n2"),
        round(col("p1"), 4).as("p1"), round(col("p2"), 4).as("p2"),
        round(num / den, 4).as("fst"))
  }

  /** Two-callset genotype concordance (picard `GenotypeConcordance` /
    * bcftools `gtcheck` shape): per sample, over the (variant, sample)
    * cells called in either callset, count both-called /
    * matching / mismatching / one-sided cells and report overall and
    * non-reference concordance (agreement restricted to cells where
    * either side is non-ref — the metric that isn't inflated by the
    * hom-ref majority). A NULL `gt` is a missing call, identical to
    * the row being absent. `nonref_concordance` is NULL when no
    * non-ref both-called cell exists. Rates rounded to 4.
    *
    * Scale shape: one full-outer equi-join co-keyed on
    * (variant_id, sample) — both sides shuffle-partition on the same
    * composite key, no re-keying — then ONE combinable per-sample
    * aggregation. The sequencing-pipeline regression gate (new caller
    * version vs truth set) at cohort scale.
    */
  def concordanceReport(genoA: DataFrame, genoB: DataFrame): DataFrame = {
    def called(df: DataFrame, g: String) = df.where(col("gt").isNotNull)
      .select(col("variant_id"), col("sample"), col("gt").cast("int").as(g))
    val bothCalled = col("g_a").isNotNull && col("g_b").isNotNull
    val nonref = bothCalled && (col("g_a") =!= 0 || col("g_b") =!= 0)
    called(genoA, "g_a")
      .join(called(genoB, "g_b"), Seq("variant_id", "sample"), "full_outer")
      .groupBy("sample")
      .agg(
        count(when(bothCalled, lit(1))).as("n_both"),
        count(when(col("g_a") === col("g_b"), lit(1))).as("n_match"),
        count(when(bothCalled && col("g_a") =!= col("g_b"), lit(1)))
          .as("n_mismatch"),
        count(when(col("g_b").isNull, lit(1))).as("n_a_only"),
        count(when(col("g_a").isNull, lit(1))).as("n_b_only"),
        count(when(nonref, lit(1))).as("__nr_both"),
        count(when(col("g_a") === col("g_b") && col("g_a") =!= 0, lit(1)))
          .as("__nr_match"))
      .select(col("sample"), col("n_both"), col("n_match"),
        col("n_mismatch"), col("n_a_only"), col("n_b_only"),
        when(col("n_both") > 0,
          round(col("n_match").cast("double") / col("n_both"), 4))
          .as("concordance"),
        when(col("__nr_both") > 0,
          round(col("__nr_match").cast("double") / col("__nr_both"), 4))
          .as("nonref_concordance"))
  }

  /** LD pruning (plink `--indep-pairwise` semantics, deterministic
    * position-greedy tie rule): scan variants in (chr, pos) order and
    * KEEP a variant iff no already-kept variant within `maxDist` bp
    * upstream has r² > `r2Max` with it — the standard pre-PCA /
    * pre-kinship thinning pass. Conflict edges come from
    * [[ldReport]] (same windowed-bucket pair kernel, integer-sum r²).
    * Emits one row per variant: `(variant_id, chr, pos, kept)`.
    *
    * The greedy recurrence `kept(v) = ∀ upstream conflict u:
    * ¬kept(u)` is well-founded (edges point strictly down-position)
    * and is solved by topological rounds: each round decides every
    * variant whose upstream conflicts are all decided. Rounds needed =
    * longest conflict CHAIN within a window — in real panels a handful
    * (conflict chains break at every window boundary and every kept
    * variant) — and the fixpoint is REQUIRED within `maxRounds`
    * (q195's k-core rule): undecided variants after the cap throw
    * rather than silently mis-prune.
    *
    * Scale shape: the edge set is the ldReport pair volume (window
    * occupancy², position-bucketed — never all-pairs); each round is
    * two broadcast-scale anti/semi-joins on the shrinking undecided
    * set, and per-round state (decided ids + flag) is slim and
    * persisted. No driver-side collect anywhere.
    */
  def ldPrune(geno: DataFrame, info: DataFrame, maxDist: Long,
      r2Max: Double, maxRounds: Int = 16): DataFrame = {
    val spark = geno.sparkSession
    val sites = info.select(col("variant_id"), col("chr"),
      col("start").as("pos"))
    val edges = ldReport(geno, info, maxDist)
      .where(col("r2") > r2Max)
      .select(col("id_a").as("up"), col("id_b").as("down"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var undecided = sites.select(col("variant_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var decided = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(
        "variant_id BIGINT, kept BOOLEAN"))
    var rounds = 0
    var undecidedCount = undecided.count()
    // `decided` becomes a lazy union of the per-round NEWLY-decided
    // checkpoints (O(rounds) slim LogicalRDD leaves — linear growth,
    // not the exponential self-reference the r13 fix removed)
    while (undecidedCount > 0 && rounds < maxRounds) {
      // decidable: every upstream conflict already decided
      val blocked = edges
        .join(undecided.select(col("variant_id").as("up")), Seq("up"),
          "left_semi")
        .select(col("down").as("variant_id")).distinct()
      val decidable = undecided.join(blocked, Seq("variant_id"), "left_anti")
      // kept unless some upstream conflict was kept
      val keptUp = edges
        .join(decided.where(col("kept")).select(
          col("variant_id").as("up")), Seq("up"), "left_semi")
        .select(col("down").as("variant_id")).distinct()
      // ONE heavy action per round: the round's join chain materializes
      // into the eager checkpoint of the slim newly-decided rows. The
      // previous shape ran the chain TWICE per round — once under the
      // undecided-count job and once under the decided checkpoint —
      // and the progress count now derives from the (trivial) count of
      // the already-checkpointed blocks instead of a second chain run.
      val newly = decidable
        .join(keptUp.withColumn("__k", lit(false)), Seq("variant_id"), "left")
        .select(col("variant_id"), coalesce(col("__k"), lit(true)).as("kept"))
        .localCheckpoint(true)
      val newlyCount = newly.count()
      require(newlyCount > 0,
        s"ldPrune made no progress at round $rounds — conflict graph " +
          "has an upstream cycle (corrupt positions?)")
      decided = decided.union(newly)
      val nextUndecided = undecided
        .join(newly.select("variant_id"), Seq("variant_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      undecided.unpersist(); undecided = nextUndecided
      undecidedCount -= newlyCount
      rounds += 1
    }
    require(undecidedCount == 0,
      s"ldPrune fixpoint not reached within $maxRounds rounds " +
        s"($undecidedCount variants undecided) — raise maxRounds")
    edges.unpersist(); undecided.unpersist()
    sites.join(decided, Seq("variant_id"), "left")
      .select(col("variant_id"), col("chr"), col("pos"),
        coalesce(col("kept"), lit(true)).as("kept"))
  }

  /** Tajima's D over the fully-called biallelic sites of a genotype
    * table — the classic neutrality test (Tajima, Genetics 1989; the
    * statistic vcftools `--TajimaD` emits per window, computed here
    * over the whole input so callers window by pre-filtering):
    * with `n` sampled ALLELES (2 × samples — the 1989 constants assume
    * constant `n`, so sites with ANY missing call are excluded, the
    * same restriction vcftools documents),
    * `π = Σ_sites 2·a·(n−a) / (n·(n−1))` (mean pairwise diversity;
    * the numerator is summed as an INTEGER so partition order can't
    * perturb the float), `θ_W = S / a₁` (Watterson's estimator over
    * the `S` segregating sites), and
    * `D = (π − θ_W) / √(e₁·S + e₂·S·(S−1))` with the published
    * `a₁ a₂ b₁ b₂ c₁ c₂ e₁ e₂` constants computed from `n` (harmonic
    * sums folded ascending — deterministic double order). `D` is NULL
    * when `S = 0` (the statistic is undefined on invariant data).
    * Emits one row `(n_samples, n_sites, s_segregating, pi, theta_w,
    * tajima_d)` (6dp).
    *
    * Scale shape: one combinable per-variant aggregation (the only
    * data-sized shuffle), a metadata-row broadcast of the sample
    * count, then a single-row reduction — the per-site integer
    * numerator keeps the reduction exact at any partitioning.
    */
  def tajimaD(geno: DataFrame): DataFrame = {
    val nSamples = geno.select(
      countDistinct("sample").cast("long").as("__ns"))
    val perSite = geno
      .groupBy("variant_id")
      .agg(sum(col("gt").cast("long")).as("__a"),
        count(col("gt")).as("__called"))
    val full = perSite.crossJoin(broadcast(nSamples))
      .where(col("__called") === col("__ns"))
      .select(col("__ns"),
        (lit(2L) * col("__ns")).as("__n"),
        col("__a"),
        (col("__a") > 0L && col("__a") < lit(2L) * col("__ns"))
          .cast("long").as("__seg"),
        (lit(2L) * col("__a") * (lit(2L) * col("__ns") - col("__a")))
          .as("__h"))
    val agg = full.groupBy("__ns", "__n")
      .agg(count(lit(1)).as("n_sites"),
        sum("__seg").as("s_segregating"),
        sum("__h").as("__hsum"))
    // harmonic constants from n, folded ascending over 1..n−1
    val a1 = aggregate(sequence(lit(1L), col("__n") - 1L), lit(0d),
      (acc, i) => acc + lit(1d) / i.cast("double"))
    val a2 = aggregate(sequence(lit(1L), col("__n") - 1L), lit(0d),
      (acc, i) => acc + lit(1d) / (i * i).cast("double"))
    val n = col("__n").cast("double")
    val b1 = (n + 1d) / (lit(3d) * (n - 1d))
    val b2 = lit(2d) * (n * n + n + 3d) / (lit(9d) * n * (n - 1d))
    val c1 = b1 - lit(1d) / a1
    val c2 = b2 - (n + 2d) / (a1 * n) + a2 / (a1 * a1)
    val e1 = c1 / a1
    val e2 = c2 / (a1 * a1 + a2)
    val s = col("s_segregating").cast("double")
    val pi = col("__hsum").cast("double") / (n * (n - 1d))
    agg.select(col("__ns").as("n_samples"), col("n_sites"),
        col("s_segregating"),
        round(pi, 6).as("pi"),
        when(col("s_segregating") > 0L, round(s / a1, 6)).as("theta_w"),
        when(col("s_segregating") > 0L,
          round((pi - s / a1) / sqrt(e1 * s + e2 * s * (s - 1d)), 6))
          .as("tajima_d"))
  }

  /** Windowed nucleotide diversity — π summed per genomic window (the
    * sliding-π track every pop-gen browser shows; vcftools
    * `--window-pi`). Same estimator as [[tajimaD]]'s π restricted to
    * fully-called sites (constant allele count n = 2·S ⇒ every site's
    * heterozygosity 2j(n−j)/(n(n−1)) shares one denominator, so the
    * window sum is an exact integer numerator over a constant), binned
    * by `start div windowBp`. Output:
    * `chr, win_start, win_end, n_sites, pi` (1e-6 floor grid).
    *
    * Scale shape: one per-variant aggregate, a broadcast 1-row sample
    * count, one position-keyed join to info, ONE combinable window
    * rollup — linear in geno rows.
    */
  def piWindows(geno: DataFrame, info: DataFrame,
      windowBp: Long): DataFrame = {
    require(windowBp > 0, "windowBp must be positive")
    val nSamples = geno.select(
      countDistinct("sample").cast("long").as("__ns"))
    val perSite = geno.groupBy("variant_id")
      .agg(sum(col("gt").cast("long")).as("__a"),
        count(col("gt")).as("__called"))
    val sites = perSite.crossJoin(broadcast(nSamples))
      .where(col("__called") === col("__ns"))
      .select(col("variant_id"), col("__ns"),
        (lit(2L) * col("__a") * (lit(2L) * col("__ns") - col("__a")))
          .as("__h"))
    sites.join(info.select("variant_id", "chr", "start"), Seq("variant_id"))
      .groupBy(col("chr"), expr(s"start div ${windowBp}L").as("__w"),
        col("__ns"))
      .agg(count(lit(1)).as("n_sites"), sum("__h").as("__hs"))
      .select(col("chr"), (col("__w") * windowBp).as("win_start"),
        (col("__w") * windowBp + windowBp - 1).as("win_end"),
        col("n_sites"),
        (floor(col("__hs").cast("double")
          / (lit(2d) * col("__ns") * (lit(2d) * col("__ns") - lit(1d)))
          * 1e6 + 0.5) / 1e6).as("pi"))
      .orderBy("chr", "win_start")
  }

  /** Per-sample private rare variation — the f-statistics QC that
    * flags contamination (deflated singleton counts: foreign DNA adds
    * shared alleles) and batch artifacts (inflated: caller errors
    * concentrate as novel singletons): a SINGLETON is a site whose
    * cohort alt-allele count is exactly 1 and this sample carries it;
    * a PRIVATE DOUBLETON is AC = 2 carried homozygous by one sample.
    * Output: `sample, n_singleton, n_private_doubleton`.
    *
    * One per-site aggregate + one carrier-keyed join + one combinable
    * per-sample rollup — linear in geno rows.
    */
  def privateVariants(geno: DataFrame): DataFrame = {
    val site = geno.filter(col("gt").isNotNull)
      .groupBy("variant_id")
      .agg(sum(col("gt").cast("long")).as("__ac"),
        count(when(col("gt") > 0, 1)).as("__ncar"))
    val per = geno.filter(col("gt") > 0)
      .join(site, Seq("variant_id"))
      .groupBy("sample")
      .agg(count(when(col("__ac") === 1, 1)).as("n_singleton"),
        count(when(col("__ac") === 2 && col("__ncar") === 1, 1))
          .as("n_private_doubleton"))
    // zero-count samples stay in the report — a sample carrying NO
    // private variation is itself the contamination signal
    geno.select("sample").distinct()
      .join(per, Seq("sample"), "left")
      .na.fill(0L, Seq("n_singleton", "n_private_doubleton"))
      .orderBy("sample")
  }

  /** Cochran–Mantel–Haenszel stratified case/control association —
    * plink's `--mh` (the 2×2×K allele-count test that controls for
    * population structure by stratifying, Mantel & Haenszel 1959):
    * per variant, each stratum contributes a case/control × alt/ref
    * allele table `(a, b; c, d)` with margins `r1 r0 m1 m0` and total
    * `n`; `χ²_CMH = (Σ_k (a_k − r1·m1/n))² / Σ_k r1·r0·m1·m0 /
    * (n²(n−1))` and the pooled odds ratio
    * `OR_MH = Σ(a·d/n) / Σ(b·c/n)`. Strata with `n < 2` are skipped
    * (their variance term is undefined); `or_mh` is NULL when the
    * denominator is 0 (no discordant control-alt mass), `chisq` NULL
    * when the variance sum is 0. Per-stratum terms are quantized to
    * the 10⁻⁹ grid before the cross-strata sums, so the reduction is
    * int64-exact under any partition order. Emits
    * `(variant_id, k_strata, chisq, or_mh)` (4dp).
    *
    * Scale shape: one combinable (variant, stratum) aggregation over
    * the phenotype-tagged calls (phenos — `(sample, is_case,
    * stratum)` — is a broadcast dimension), then one combinable
    * per-variant reduction of integer-quantized terms. Two shuffles
    * of slim keyed rows at any cohort size.
    */
  def cmhReport(geno: DataFrame, phenos: DataFrame): DataFrame = {
    def q9(c: Column): Column = floor(c * 1e9 + 0.5).cast("long")
    val per = geno.where(col("gt").isNotNull)
      .join(broadcast(phenos), Seq("sample"))
      .groupBy("variant_id", "stratum")
      .agg(
        sum(when(col("is_case"), col("gt"))).cast("long").as("__a"),
        (count(when(col("is_case"), lit(1))) * 2L).as("__r1"),
        sum(when(!col("is_case"), col("gt"))).cast("long").as("__c"),
        (count(when(!col("is_case"), lit(1))) * 2L).as("__r0"))
      .select(col("variant_id"),
        coalesce(col("__a"), lit(0L)).as("a"),
        col("__r1").as("r1"),
        coalesce(col("__c"), lit(0L)).as("c"),
        col("__r0").as("r0"))
      .withColumn("b", col("r1") - col("a"))
      .withColumn("d", col("r0") - col("c"))
      .withColumn("n", col("r1") + col("r0"))
      .withColumn("m1", col("a") + col("c"))
      .withColumn("m0", col("b") + col("d"))
      .where(col("n") >= 2L)
    val nD = col("n").cast("double")
    val terms = per.select(col("variant_id"),
      q9(col("a").cast("double") -
        col("r1").cast("double") * col("m1") / nD).as("__num"),
      q9(col("r1").cast("double") * col("r0") * col("m1") * col("m0") /
        (nD * nD * (nD - 1d))).as("__var"),
      q9(col("a").cast("double") * col("d") / nD).as("__orn"),
      q9(col("b").cast("double") * col("c") / nD).as("__ord"))
    terms.groupBy("variant_id")
      .agg(count(lit(1)).as("k_strata"),
        sum("__num").as("__sn"), sum("__var").as("__sv"),
        sum("__orn").as("__so"), sum("__ord").as("__sd"))
      .select(col("variant_id"), col("k_strata"),
        when(col("__sv") > 0L,
          round((col("__sn") / 1e9) * (col("__sn") / 1e9) /
            (col("__sv") / 1e9), 4)).as("chisq"),
        when(col("__sd") > 0L,
          round(col("__so").cast("double") / col("__sd"), 4)).as("or_mh"))
  }

  /** Compound-heterozygous candidate report — the recessive-disease
    * screen every clinical annotation pipeline runs after the
    * per-variant filters (GATK/VEP workflows; phase-UNAWARE form, the
    * screen's standard first pass — true compound het additionally
    * needs the two hets in trans, which takes parental phasing):
    * per (gene, sample), collect the HETEROZYGOUS calls (`gt = 1`);
    * a sample carrying ≥ 2 het variants in the same gene is a
    * candidate. Variant→gene mapping comes from the impact table's
    * distinct `(variant_id, symbol)` pairs (a variant annotated with
    * several consequences in one gene counts once). Emits
    * `(symbol, sample, n_het, het_variants)` with the variant ids
    * ascending comma-joined — candidates only.
    *
    * Scale shape: the het filter prunes before any join; the gene map
    * is a slim broadcastable dimension; ONE combinable per-(gene,
    * sample) aggregation whose collect_list is bounded by the per-gene
    * variant count (thousands at worst — genes are finite).
    */
  def compHetCandidates(geno: DataFrame, impact: DataFrame): DataFrame = {
    val genes = impact.select("variant_id", "symbol").distinct()
    geno.where(col("gt") === 1d)
      .join(genes, Seq("variant_id"))
      .groupBy("symbol", "sample")
      .agg(count(lit(1)).as("n_het"),
        array_join(
          transform(sort_array(collect_list(col("variant_id"))),
            v => v.cast("string")), ",").as("het_variants"))
      .where(col("n_het") >= 2L)
  }

  /** Bulk interval-overlap join against an arbitrary regions table
    * (columns: chr, start, end). Dispatches adaptively
    * ([[graft.operators.RangeJoin.overlapAuto]]): a regions side small
    * enough to broadcast takes the custom no-shuffle interval-probe
    * operator; anything bigger takes the binned equi-join — callers get
    * the right physical plan without choosing.
    */
  def overlapJoin(info: DataFrame, regions: DataFrame,
      binWidth: Long = 100000L, broadcastRows: Long = 1000000L): DataFrame =
    RangeJoin.overlapAuto(
      info, regions.withColumnRenamed("start", "rstart").withColumnRenamed("end", "rend"),
      Seq("chr"), "start", "end", "rstart", "rend", binWidth, broadcastRows)

  /** Mean-dosage imputation of missing genotype calls (the standard
    * GRM/PCA preprocessing: a missing call contributes the variant's
    * expected dosage 2p̂ instead of dropping the whole sample-pair
    * cell). Reports per variant the call accounting, the called-only
    * allele frequency and the post-imputation mean dosage:
    * `variant_id, n_called, n_missing, af, mean_dosage` (1e-6 grids;
    * fully-missing variants get NULL af/mean).
    *
    * Scale shape: one map-side-combined per-variant aggregate.
    */
  def imputeDosageReport(geno: DataFrame): DataFrame = {
    val per = geno.groupBy("variant_id").agg(
      count(col("gt")).as("n_called"),
      sum(when(col("gt").isNull, 1L).otherwise(0L)).as("n_missing"),
      sum(col("gt").cast("long")).as("__sg"))
    val af = col("__sg").cast("double") /
      (lit(2L) * col("n_called")).cast("double")
    val mean = (col("__sg").cast("double") +
      col("n_missing").cast("double") * (lit(2d) * af)) /
      (col("n_called") + col("n_missing")).cast("double")
    def g6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    per.select(col("variant_id"), col("n_called"), col("n_missing"),
      when(col("n_called") > 0, g6(af)).as("af"),
      when(col("n_called") > 0, g6(mean)).as("mean_dosage"))
      .orderBy("variant_id")
  }

  /** Exact Hardy–Weinberg test per variant (Wigginton 2005 — plink
    * `--hardy` exact/midp): enumerate every heterozygote count h
    * compatible with the variant's minor-allele count and sum the
    * probabilities no likelier than the observed one. The chi-square
    * q189 gate breaks down exactly where this test matters (rare
    * alleles); this is the exact form.
    *
    * Determinism: log-probabilities are INTEGER combinations of a
    * shared 1e-6-grid log-factorial table (per-term-quantized Σ ln j
    * prefix sums over the 0..2n grid) plus h·round(ln2·1e6) — the
    * "no likelier" ordering compares exact integers, and the
    * probability sums are exp of identical grid doubles quantized to
    * 1e-9 pre-fold. Output per polymorphic variant:
    * `variant_id, n_called, het_obs, minor_alleles, p_exact, p_mid`
    * (1e-6 grids).
    *
    * Scale shape: one per-variant genotype-class aggregate; the
    * candidate grid is O(min(na, 2n−na)) rows per variant (the plink
    * cost); the log-factorial table — bounded by 2·samples entries —
    * is computed once on the driver (a trivial prefix-sum loop) and
    * embedded as ONE array literal, so every lookup is a codegen'd
    * `element_at` and the plan contains zero joins: aggregate →
    * explode → pure projection → aggregate, two shuffles total.
    * (Earlier revisions broadcast-joined the grid seven times; at 1 M
    * samples the literal is ~16 MB — well inside task-binary budget —
    * while seven BroadcastHashJoins rebuilt seven hash maps per task.)
    */
  def hweExact(geno: DataFrame): DataFrame = {
    val Ln2Micro = 693147L // round(ln 2 · 1e6), shared with the oracle
    val per = geno.where(col("gt").isNotNull).groupBy("variant_id")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("gt") === 1d, 1L).otherwise(0L)).as("__h"),
        sum(col("gt").cast("long")).as("__ac"))
      .select(col("variant_id"), col("__n"), col("__h"),
        least(col("__ac"), lit(2L) * col("__n") - col("__ac"))
          .as("__na"))
      .where(col("__na") > 0)
    val mxRow = per.agg(max(lit(2L) * col("__n"))).head()
    val mx = if (mxRow.isNullAt(0)) 0L else mxRow.getLong(0)
    // Per-term-quantized Σ round(ln j · 1e6) prefix sums, 0..2n — the
    // identical grid both engines derive, so the "no likelier"
    // ordering compares exact integers.
    val lfArr = new Array[Long](mx.toInt + 1)
    var acc = 0L; var k = 2
    while (k <= mx) {
      acc += math.floor(math.log(k.toDouble) * 1e6 + 0.5).toLong
      lfArr(k) = acc; k += 1
    }
    val lfLit = lit(lfArr)
    def lf(c: Column): Column = element_at(lfLit, (c + 1L).cast("int"))
    val cand = per.select(col("variant_id"), col("__n"), col("__h"),
        col("__na"),
        explode(sequence(pmod(col("__na"), lit(2L)),
          least(col("__na"), lit(2L) * col("__n") - col("__na")),
          lit(2L))).as("__hc"))
      .withColumn("__gaa", expr("(__na - __hc) div 2"))
      .withColumn("__gbb",
        col("__n") - col("__hc") - expr("(__na - __hc) div 2"))
    // Shared combinatorial prefix ln C(2n; n,na) appears in both the
    // candidate and the observed log-prob; the observed one (hc = __h)
    // is computed inline per row, eliminating the former obs self-join.
    val pre = lf(col("__n")) + lf(col("__na")) +
      lf(lit(2L) * col("__n") - col("__na")) -
      lf(lit(2L) * col("__n"))
    val gaaObs = expr("(__na - __h) div 2")
    val gbbObs = col("__n") - col("__h") - expr("(__na - __h) div 2")
    val joined = cand.select(col("variant_id"), col("__n"), col("__h"),
      col("__na"), col("__hc"),
      (pre - lf(col("__hc")) - lf(col("__gaa")) - lf(col("__gbb")) +
        col("__hc") * Ln2Micro).as("__l6"),
      (pre - lf(col("__h")) - lf(gaaObs) - lf(gbbObs) +
        col("__h") * Ln2Micro).as("__lobs"))
    val folded = joined
      .groupBy("variant_id", "__n", "__h", "__na")
      .agg(
        sum(when(col("__l6") <= col("__lobs"),
          floor(exp(col("__l6").cast("double") / 1e6) * 1e9 + 0.5)
            .cast("long")).otherwise(0L)).as("__p9"),
        max(when(col("__hc") === col("__h"),
          floor(exp(col("__l6").cast("double") / 1e6) * 1e9 + 0.5)
            .cast("long"))).as("__po9"))
    def g6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    folded.select(col("variant_id"), col("__n").as("n_called"),
      col("__h").as("het_obs"), col("__na").as("minor_alleles"),
      g6(least(col("__p9").cast("double") / 1e9, lit(1d))).as("p_exact"),
      g6(greatest(least((col("__p9") - col("__po9") / 2L).cast("double")
        / 1e9, lit(1d)), lit(0d))).as("p_mid"))
      .orderBy("variant_id")
  }

  /** Per-sample depth QC from the typed FORMAT `dp` column (the
    * coverage screen behind every call-rate threshold: a sample whose
    * depth distribution sits low explains its missingness before any
    * genotype-level filter fires). Output per sample:
    * `sample, n_dp, mean_dp, min_dp, max_dp, n_low, low_frac`
    * (1e-6 grids; `n_low` counts calls under `minDepth`).
    *
    * Scale shape: one map-side-combined per-sample aggregate.
    */
  def depthQc(geno: DataFrame, minDepth: Long = 10L): DataFrame = {
    val per = geno.where(col("dp").isNotNull).groupBy("sample").agg(
      count(lit(1)).as("n_dp"), sum("dp").as("__s"),
      min("dp").as("min_dp"), max("dp").as("max_dp"),
      sum(when(col("dp") < minDepth, 1L).otherwise(0L)).as("n_low"))
    def g6(c: Column): Column = floor(c * 1e6 + 0.5) / 1e6
    per.select(col("sample"), col("n_dp"),
      g6(col("__s").cast("double") / col("n_dp")).as("mean_dp"),
      col("min_dp"), col("max_dp"), col("n_low"),
      g6(col("n_low").cast("double") / col("n_dp")).as("low_frac"))
      .orderBy("sample")
  }

  /** Per-sample Ts/Tv — transition/transversion ratio over the SNVs a
    * sample actually CARRIES (gt > 0; plink `--sample-counts`): the
    * per-sample callset-quality screen (an outlier ratio flags a
    * contaminated or mis-genotyped sample where the cohort-wide q217
    * number looks fine). Folding/exclusion rules shared with
    * [[mutationSpectrum]]. Output per sample:
    * `sample, n_ts, n_tv, tstv` (1e-4 grid, NULL when no
    * transversions).
    *
    * Scale shape: the variant-grain class table broadcasts into one
    * carrier-filtered geno aggregate.
    */
  def sampleTsTv(geno: DataFrame, info: DataFrame): DataFrame = {
    val bases = Seq("A", "C", "G", "T")
    val isSnv = length(col("ref")) === 1 && length(col("alt")) === 1 &&
      col("ref").isin(bases: _*) && col("alt").isin(bases: _*) &&
      col("ref") =!= col("alt")
    val classes = info.where(isSnv).select(col("variant_id"),
      concat(
        when(col("ref").isin("C", "T"), col("ref"))
          .otherwise(translate(col("ref"), "ACGT", "TGCA")),
        lit(">"),
        when(col("ref").isin("C", "T"), col("alt"))
          .otherwise(translate(col("alt"), "ACGT", "TGCA")))
        .isin("C>T", "T>C").as("__isTs"))
    val carried = geno.where(col("gt").isNotNull && col("gt") > 0)
      .join(broadcast(classes), Seq("variant_id"))
    val per = carried.groupBy("sample").agg(
      sum(when(col("__isTs"), 1L).otherwise(0L)).as("n_ts"),
      sum(when(!col("__isTs"), 1L).otherwise(0L)).as("n_tv"))
    per.select(col("sample"), col("n_ts"), col("n_tv"),
      when(col("n_tv") > 0,
        floor(col("n_ts").cast("double") / col("n_tv") * 1e4 + 0.5)
          / 1e4).as("tstv"))
      .orderBy("sample")
  }

  /** SNV mutation spectrum — per-class substitution counts with
    * pyrimidine folding (the six canonical classes C>A/C>G/C>T/
    * T>A/T>C/T>G; a purine ref strand-complements onto its pyrimidine
    * twin, the mutational-signature convention). Indels and
    * multi-base alleles are excluded; `is_transition` marks C>T/T>C.
    * Output per observed class:
    * `class, n, fraction, is_transition` (fraction on the 1e-6 grid).
    *
    * Scale shape: one filtered map-side-combined aggregate to ≤ 6
    * rows + a 1-row total broadcast.
    */
  def mutationSpectrum(info: DataFrame): DataFrame = {
    val bases = Seq("A", "C", "G", "T")
    val isSnv = length(col("ref")) === 1 && length(col("alt")) === 1 &&
      col("ref").isin(bases: _*) && col("alt").isin(bases: _*) &&
      col("ref") =!= col("alt")
    val folded = info.where(isSnv).select(
      when(col("ref").isin("C", "T"), col("ref"))
        .otherwise(translate(col("ref"), "ACGT", "TGCA")).as("__r"),
      when(col("ref").isin("C", "T"), col("alt"))
        .otherwise(translate(col("alt"), "ACGT", "TGCA")).as("__a"))
    val per = folded
      .groupBy(concat(col("__r"), lit(">"), col("__a")).as("class"))
      .agg(count(lit(1)).as("n"))
    val tot = per.agg(sum("n").as("__t"))
    per.crossJoin(broadcast(tot))
      .select(col("class"), col("n"),
        (floor(col("n").cast("double") / col("__t") * 1e6 + 0.5) / 1e6)
          .as("fraction"),
        col("class").isin("C>T", "T>C").as("is_transition"))
      .orderBy("class")
  }

  /** Per-sample method-of-moments inbreeding coefficient (plink
    * `--het`): F = (O(hom) − E(hom)) / (L − E(hom)) where O counts a
    * sample's observed homozygous calls, L its called sites, and
    * E(hom) = Σ_v (1 − 2p_v(1−p_v)·N_v/(N_v−1)) the HWE-expected
    * homozygosity with plink's allele-count small-sample correction
    * (N_v = called alleles at v, p_v the alt frequency over called
    * genotypes). The sample-level screen behind cohort QC: F ≫ 0
    * flags inbreeding or a contaminated/merged duplicate, F ≪ 0
    * flags sample contamination (excess heterozygosity) —
    * reference context: `pipeline/02-build-db.R` builds the genotype
    * table this consumes.
    *
    * Determinism: per-variant expectation terms are 1e-9-quantized
    * pre-sum, so the per-sample fold is an exact int64 sum in any
    * partition order; only the final F ratio divides (null-guarded —
    * an all-monomorphic sample has L = E and no defined F). Output
    * per sample: `sample, n_called, o_hom, e_hom, f` (1e-6 grids).
    *
    * Scale shape: one per-variant aggregate, one co-keyed
    * variant-stats join back to the genotype table (equi-join on the
    * key both sides already carry), one map-side-combinable
    * per-sample aggregate — no window, no driver state.
    */
  def inbreedingF(geno: DataFrame): DataFrame = {
    val called = geno.where(col("gt").isNotNull)
    val stats = called.groupBy("variant_id").agg(
      count(lit(1)).as("__n"), sum(col("gt").cast("long")).as("__ac"))
    val twoN = (lit(2L) * col("__n")).cast("double")
    val af = col("__ac").cast("double") / twoN
    val e9 = floor((lit(1d) - lit(2d) * af * (lit(1d) - af) *
      (twoN / (twoN - 1d))) * 1e9 + 0.5).cast("long")
    val terms = stats.select(col("variant_id"), e9.as("__e9"))
    val per = called.join(terms, Seq("variant_id"))
      .groupBy("sample").agg(count(lit(1)).as("n_called"),
        sum(when(col("gt") =!= 1d, 1L).otherwise(0L)).as("o_hom"),
        sum("__e9").as("__E9"))
    def g6(x: Column): Column =
      when(x >= 0, floor(x * 1e6 + 0.5)).otherwise(-floor(-x * 1e6 + 0.5)) /
        1e6 + lit(0d)
    val e = col("__E9").cast("double") / 1e9
    val den = col("n_called").cast("double") - e
    per.select(col("sample"), col("n_called"), col("o_hom"),
      g6(e).as("e_hom"),
      when(den > 0d, g6((col("o_hom").cast("double") - e) / den)).as("f"))
      .orderBy("sample")
  }
}
