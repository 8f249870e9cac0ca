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
      GeneIndex(Map.empty, Some(
        pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
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
}
