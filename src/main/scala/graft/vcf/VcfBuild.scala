package graft.vcf

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{emptyToNull, gt2snp}

/** Builders deriving the reference's relational model from a parsed VCF:
  * `variant_info`, `variant_impact`, `variant_geno`, `gene_map`,
  * `samples` (VCFdbR `pipeline/02-build-db.R`, `03-index-db.R`).
  *
  * Everything is one declarative plan per table; the only wide
  * operation in the whole build is the global sort backing the
  * deterministic `variant_id` assignment.
  */
object VcfBuild {

  /** VEP consequence terms the reference flags as exonic
    * (`02-build-db.R:192-211`).
    */
  val exonicImpacts: Seq[String] = Seq(
    "stop_gained", "exon_variant", "stop_lost", "frameshift_variant",
    "initiator_codon_variant", "inframe_deletion", "inframe_insertion",
    "missense_variant", "protein_altering_variant",
    "incomplete_terminal_codon_variant", "stop_retained_variant",
    "5_prime_UTR_premature_start_codon_variant", "synonymous_variant",
    "coding_sequence_variant", "5_prime_UTR_variant", "3_prime_UTR_variant",
    "transcript_ablation", "transcript_amplification", "feature_elongation",
    "feature_truncation")

  /** CSQ sub-columns the impact table drops (`02-build-db.R:284`):
    * population-frequency columns (`*_af`) and a fixed deny-list
    * (clinvar fields re-enter separately from INFO).
    */
  private val impactDropList = Set(
    "clin_sig", "pheno", "somatic", "pubmed",
    "consequence_annotations_from_ensembl_vep__format__allele")

  /** INFO-side clinvar fields: excluded from `variant_info` and
    * re-attached (unnested) onto `variant_impact`
    * (`02-build-db.R:286-305`, `:318`).
    */
  private val clinvarInfoCols = Seq("clinvar_sig", "clinvar_disease_name")

  private val trackedCaches =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Drop the staging caches [[withVariantIds]] registered (mirrors
    * `Dedup.clearCaches`). Returns how many were released.
    *
    * INVARIANT: only call after every output derived from the build
    * (info/impact/geno writes, collects) has been materialized. The
    * id assignment's offsets branch and probe branch must observe the
    * IDENTICAL partition layout for `monotonically_increasing_id`;
    * the tracked persist guarantees that. Unpersisting while derived
    * plans are still lazy silently reverts them to two independent
    * sort evaluations — safe today only because the range
    * partitioning happens to be deterministic, and not a contract.
    */
  def clearCaches(): Int = trackedCaches.synchronized {
    val n = trackedCaches.size
    trackedCaches.foreach(_.unpersist(false))
    trackedCaches.clear()
    n
  }

  /** Deterministic contiguous `variant_id` (1-based): global sort on
    * (chr, pos, ref, alt) — a stable total order — then a distributed
    * ordinal (X4, `02-build-db.R:258-259`) via the two-phase
    * partition-offset pattern: per-partition counts (a partitions-sized
    * metadata table) → exclusive-prefix offsets (window over that tiny
    * table) → broadcast-joined back, id = offset + row_number within
    * the partition. Equivalent to `rdd.zipWithIndex` but fully
    * declarative and columnar: no eager offsets job (zipWithIndex fires
    * one at call time, costing a thrown-away parse+sort of the whole
    * input), no Row materialization (the RDD detour decodes every
    * nested genotype struct into JVM objects once per consumer — GC
    * amplification under a loaded heap), and never a single-partition
    * window (the row_number partitions on the sort's own range
    * partitions, which the range partitioner keeps balanced).
    *
    * The SORTED scan persists (tracked, see [[clearCaches]]): info,
    * impact and geno all fan out from it, so the one unavoidable wide
    * stage — parse + global sort — runs exactly once.
    */
  def withVariantIds(parsed: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keys = Seq("chr", "pos", "ref", "alt")
    // `spark.graft.stagingStorage` escapes to DISK_ONLY for giant
    // builds: the wide sorted rows (one genotype struct per sample)
    // columnar-cache at ~40 KB/row at 1,000 samples, and MEMORY_AND_DISK
    // builds every in-flight partition's batches ON HEAP before it can
    // decide to spill — at 1.4M×1000 that GC-starved a 96 GB driver
    // until its own heartbeats expired. DISK_ONLY streams batches out
    // and bounds heap by in-flight partitions only; the layout
    // invariant below cares about partitioning, not residence.
    val level = org.apache.spark.storage.StorageLevel.fromString(
      parsed.sparkSession.conf.get("spark.graft.stagingStorage",
        "MEMORY_AND_DISK"))
    val sorted = parsed.orderBy(keys.map(col): _*).persist(level)
    trackedCaches.synchronized { trackedCaches += sorted }
    // monotonically_increasing_id encodes (partition << 33 | position)
    // over the pinned cache partitioning — order-consistent with the
    // sort but non-contiguous; the offsets table re-bases each
    // partition's positions to a contiguous 1-based ordinal. A window
    // partitioned on a DERIVED partition id would not satisfy the
    // range-partitioned cache's distribution and Catalyst would insert
    // a second full shuffle — this shape never touches the wide rows
    // with anything but a broadcast hash join.
    val withMid = sorted.withColumn("_mid", monotonically_increasing_id())
    val pid = shiftright(col("_mid"), 33)
    val pos = col("_mid").bitwiseAND(lit((1L << 33) - 1))
    val wOff = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withMid.groupBy(pid.as("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum("_n").over(wOff), lit(0L)))
      .select("_pid", "_off")
    withMid.join(broadcast(offsets), pid === col("_pid"))
      .withColumn("variant_id", col("_off") + pos + lit(1L))
      .select(col("variant_id") +: parsed.columns.map(col): _*)
  }

  /** `variant_info`: one row per variant — genomic interval, fixed VCF
    * fields, one column per single-valued INFO field. Multi-valued
    * (Number=A/R/G) arrays are scalarized to their single element — the
    * engine, like the reference, requires normalized (no-multiallelic)
    * input, which it validates up front ([[requireNormalized]]); truly
    * list-valued INFO (Number=. or n>1) stays a native array column
    * (capability upgrade; the reference stringifies).
    *
    * `end = pos + length(ref) - 1` (GRanges closed-interval convention,
    * `02-build-db.R:316-335`).
    */
  def variantInfo(ids: DataFrame, header: VcfHeaderInfo): DataFrame = {
    val perAlt = Set("A", "R", "G")
    // fixed/derived columns win name collisions (e.g. the standard SV
    // INFO field END vs the computed interval end): keep-first duplicate
    // semantics, as in the reference's column dedupe (02-build-db.R:348)
    // clinvar INFO fields move onto variant_impact ONLY when a CSQ field
    // exists (the impact table is built, and the re-join carries them);
    // without CSQ the reference keeps them in variant_info — dropping
    // them unconditionally would lose the columns from the whole model
    // (02-build-db.R:286-305 runs inside the csq_exists branch).
    val dropClinvar = header.csqColumns.isDefined
    val infoCols: Seq[Column] = header.usableInfoDefs
      .filterNot(d => d.id == "CSQ" ||
        (dropClinvar && clinvarInfoCols.contains(d.id.toLowerCase)))
      .map { d =>
        val name = d.id.toLowerCase
        if (perAlt.contains(d.number)) element_at(col(name), 1).as(name)
        else col(name)
      }
    ids.select(
      (Seq(col("variant_id"), col("chr"),
        col("pos").as("start"),
        (col("pos") + length(col("ref")) - 1).as("end"),
        col("ref"), col("alt"), col("qual"), col("filter")) ++ infoCols): _*)
  }

  /** `variant_impact`: one row per variant × transcript × consequence
    * term — the CSQ explode/split pipeline (X3+X5+X6,
    * `02-build-db.R:269-306`) with the reference's derived flags:
    *   is_lof      = impact == "HIGH" && biotype == "protein_coding"
    *   is_splicing = consequence contains "splice"
    *   is_exonic   = biotype ∈ exonicImpacts   (the reference tests the
    *                 *biotype* column against consequence terms —
    *                 `02-build-db.R:282` — reproduced verbatim for parity)
    *   is_intronic = intron != ""
    * then drops `*_af` and the fixed deny-list columns.
    */
  def variantImpact(ids: DataFrame, header: VcfHeaderInfo): DataFrame = {
    val csqCols = header.csqColumns.getOrElse(
      throw new IllegalArgumentException("VCF has no CSQ INFO field"))
    val ann = ids
      .where(col("csq").isNotNull)
      .select(col("variant_id"), explode(col("csq")).as("_csq"))
      .withColumn("_parts", split(col("_csq"), "\\|", csqCols.size))
    val splitCols = csqCols.zipWithIndex.map { case (name, i) =>
      coalesce(col("_parts").getItem(i), lit("")).as(name)
    }
    val wide0 = ann.select((col("variant_id") +: splitCols): _*)
    val wide =
      if (csqCols.contains("consequence"))
        wide0.withColumn("consequence", explode(split(col("consequence"), "&")))
      else wide0
    def ifCols(needed: Seq[String], c: => Column): Column =
      if (needed.forall(csqCols.contains)) c else lit(false)
    val flagged = wide
      .withColumn("is_lof",
        ifCols(Seq("impact", "biotype"),
          col("impact") === "HIGH" && col("biotype") === "protein_coding"))
      .withColumn("is_splicing",
        ifCols(Seq("consequence"), col("consequence").contains("splice")))
      .withColumn("is_exonic",
        ifCols(Seq("biotype"), col("biotype").isin(exonicImpacts: _*)))
      .withColumn("is_intronic", ifCols(Seq("intron"), col("intron") =!= ""))
    val keep = flagged.columns.filterNot(c =>
      c.endsWith("_af") || impactDropList.contains(c))
    val base = flagged.select(keep.map(col): _*)

    // Clinvar re-join (02-build-db.R:286-305): the VEP CSQ clin_sig
    // column was dropped above; the INFO-side clinvar annotations come
    // back as one left join per present field, each list UNNESTED first
    // — so a variant with multiple sigs multiplies its impact rows
    // (sig × disease cross product per variant), and variants without
    // clinvar data keep NULLs, exactly as the reference's
    // unnest-then-left_join does.
    clinvarInfoCols.foldLeft(base) { (acc, name) =>
      ids.schema.fields.find(_.name == name) match {
        case None => acc
        case Some(f) =>
          val value = f.dataType match {
            case _: ArrayType => explode(col(name)).as(name)
            case _ => col(name).as(name)
          }
          // explode (not explode_outer): tidyr unnest drops NULL/empty
          // lists, and the left join restores those variants with NULL
          val side = ids.select(col("variant_id"), value)
          acc.join(side, Seq("variant_id"), "left")
      }
    }
  }

  /** `variant_geno`: long layout, one row per variant × sample —
    * `variant_id`, `sample`, `gt` (dosage recode), `gt_raw`, plus one
    * typed column per FORMAT field (X7-X9 collapsed into a single
    * posexplode — the melt/pivot dance of `02-build-db.R:368-424`
    * disappears because each line is parsed once).
    *
    * FORMAT keys are resolved per row (`array_position` on the row's
    * FORMAT column), so files with heterogeneous FORMAT are handled —
    * but resolved BEFORE the genotype explode: positions are a pure
    * function of the per-VARIANT `format` string, so computing them on
    * the pre-explode side evaluates `split` + one `array_position` per
    * key once per variant instead of once per (variant × sample) row
    * (at cohort width that is a ×n_samples saving on the build's
    * widest stage for free — values are identical by definition).
    */
  def variantGeno(ids: DataFrame, header: VcfHeaderInfo): DataFrame = {
    // key order: GT first (gt/gt_raw), then the declared extras
    val keys = "GT" +: header.formatDefs.map(_.id).filterNot(_ == "GT")
    val posCols = keys.zipWithIndex.map { case (k, i) =>
      array_position(split(col("format"), ":"), k).as(s"_p$i")
    }
    val base = ids.select(
      (Seq(col("variant_id"), col("genotypes")) ++ posCols): _*)
      .select(
        (Seq(col("variant_id"), explode(col("genotypes")).as("g")) ++
          keys.indices.map(i => col(s"_p$i"))): _*)
      .select(
        (Seq(col("variant_id"),
          col("g.sample").as("sample"),
          split(col("g.raw"), ":").as("_vals")) ++
          keys.indices.map(i => col(s"_p$i"))): _*)

    def fmtField(key: String): Column = {
      val pos = col(s"_p${keys.indexOf(key)}")
      // trailing FORMAT fields may be dropped per sample (VCF 4.2);
      // the bounds guard keeps ANSI element_at from throwing on them
      when(pos > 0 && pos <= size(col("_vals")),
          element_at(col("_vals"), pos.cast(IntegerType)))
        .otherwise(lit(null).cast(StringType))
    }

    def typed(d: VcfFieldDef): Column = {
      val raw = fmtField(d.id)
      val nn = when(raw === ".", lit(null)).otherwise(raw)
      val c = d.vcfType match {
        case "Integer" => nn.cast(LongType)
        case "Float" => nn.cast(DoubleType)
        case _ => nn
      }
      c.as(d.id.toLowerCase)
    }

    val gtRaw = fmtField("GT").as("gt_raw")
    val extra = header.formatDefs.filterNot(_.id == "GT").map(typed)
    base.select(
      (Seq(col("variant_id"), col("sample"),
        gt2snp(fmtField("GT")).as("gt"), gtRaw) ++ extra): _*)
  }

  /** `gene_map` derived dimension (`03-index-db.R:86-101`): distinct
    * gene-identity columns from the impact table, empty strings → NULL.
    */
  def geneMap(impact: DataFrame): DataFrame = {
    val wanted = Seq("symbol", "symbol_source", "gene", "source", "feature",
      "canonical", "ensp", "ccds", "motif_name", "feature_type")
    val present = wanted.filter(impact.columns.contains)
    impact.select(present.map(c => emptyToNull(col(c)).as(c)): _*).distinct()
  }

  /** `samples` index table (`02-build-db.R:130-136`). */
  def samplesTable(spark: SparkSession, header: VcfHeaderInfo): DataFrame = {
    import spark.implicits._
    header.samples.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("name", "value")
  }

  /** Header metadata tables (`02-build-db.R:113-127`): one DataFrame per
    * section — `name`/`number`/`type`/`description` for the field
    * sections, `name`/`length` for `contig` (the reference writes ONE
    * table per header section, contigs included; length is the header
    * attribute when declared, NULL otherwise).
    */
  def metaTables(spark: SparkSession, header: VcfHeaderInfo): Map[String, DataFrame] = {
    import spark.implicits._
    def of(defs: Seq[VcfFieldDef]) =
      defs.map(d => (d.id, d.number, d.vcfType, d.description))
        .toDF("name", "number", "type", "description")
    val contig = header.contigDefs.map { case (id, len) => (id, len.orNull) }
      .toDF("name", "length")
    Map("info" -> of(header.infoDefs), "format" -> of(header.formatDefs),
      "filter" -> of(header.filterDefs), "contig" -> contig)
  }

  /** Multiallelic guard (`01-generate-variant-ranges-index.R:43-53`):
    * the engine requires normalized input; offending sites are returned
    * for reporting, and [[requireNormalized]] throws if any exist.
    */
  def multiallelicSites(parsed: DataFrame): DataFrame =
    parsed.where(col("alt").contains(",")).select("chr", "pos", "ref", "alt")

  def requireNormalized(parsed: DataFrame): Unit = {
    val bad = multiallelicSites(parsed).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"multiallelic site found (e.g. ${bad(0)}); normalize the VCF first")
  }

  /** Build the full relational model.
    *
    * The sorted scan is persisted inside [[withVariantIds]] before the
    * fan-out: info, impact and geno all derive from it, and without the
    * cache each would re-parse and re-sort the entire input (3× the
    * dominant cost). At cluster scale this is the standard
    * materialize-the-staging-table step; storage is MEMORY_AND_DISK so
    * oversized inputs spill rather than OOM. Release with
    * [[clearCaches]] when the build's outputs are written.
    */
  def build(vcf: VcfDataset): VcfTables =
    fromStaged(withVariantIds(vcf.df), vcf.header)

  /** Derive the relational model from an id-assigned scan — either the
    * in-memory staging cache ([[build]]) or a staging parquet read back
    * by a resumed pipeline run ([[VcfPipeline.run]]). In the
    * resumed-from-parquet case the ids are literal data, so none of the
    * partition-layout determinism the in-memory id assignment relies on
    * ([[clearCaches]]) is needed — every derived table is a plain
    * narrow read of the staging table.
    */
  def fromStaged(ids: DataFrame, header: VcfHeaderInfo): VcfTables = {
    val spark = ids.sparkSession
    val impact =
      if (header.csqColumns.isDefined) Some(variantImpact(ids, header))
      else None
    VcfTables(
      info = variantInfo(ids, header),
      impact = impact,
      geno = variantGeno(ids, header),
      geneMap = impact.map(geneMap),
      samples = samplesTable(spark, header),
      meta = metaTables(spark, header))
  }
}

/** The reference's relational model, Spark-side. */
final case class VcfTables(
    info: DataFrame,
    impact: Option[DataFrame],
    geno: DataFrame,
    geneMap: Option[DataFrame],
    samples: DataFrame,
    meta: Map[String, DataFrame]) {

  /** Persist as bucketed managed tables (`spark.sql.warehouse.dir`):
    * `variant_info`, `variant_impact` and `variant_geno` are bucketed
    * and sorted by `variant_id` into the same bucket count, so
    * info⨝impact⨝geno joins on `variant_id` are co-located — zero
    * Exchange in the join plan (verified in `VcfSpec`). This is the
    * cluster-scale layout; [[write]] is the plain-directory variant.
    */
  def writeBucketed(prefix: String, buckets: Int = 32): Unit = {
    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite")
        .bucketBy(buckets, "variant_id")
        .sortBy("variant_id")
        .format("parquet")
        .saveAsTable(s"${prefix}_$name")
    save(info, "variant_info")
    impact.foreach(save(_, "variant_impact"))
    save(geno, "variant_geno")
  }

  /** Write every table under `outDir`. With `skipComplete` each table
    * whose directory already carries a `_SUCCESS` marker is left
    * untouched — the resume contract of [[VcfPipeline.run]]: a build
    * killed mid-write redoes only the tables that never committed
    * (Spark writes `_SUCCESS` last, so a torn write never looks
    * complete). Returns the names of the tables actually written.
    */
  def write(outDir: String, partitionByChr: Boolean = false,
      skipComplete: Boolean = false): Seq[String] = {
    val written = Seq.newBuilder[String]
    def stage(name: String)(body: => Unit): Unit = {
      if (!(skipComplete && VcfPipeline.isComplete(info.sparkSession, s"$outDir/$name"))) {
        body
        written += name
      }
    }
    stage("variant_info") {
      if (partitionByChr)
        // genomic layout: hive-partition dirs on chr (directory pruning
        // for range queries) + start-sorted files (min/max stats prune
        // row groups within a chromosome) — the parquet replacement for
        // the reference's tabix index (SURVEY §1.4, §4.2)
        info.repartition(col("chr")).sortWithinPartitions("start")
          .write.mode("overwrite").partitionBy("chr")
          .parquet(s"$outDir/variant_info")
      else
        info.sortWithinPartitions("variant_id")
          .write.mode("overwrite").parquet(s"$outDir/variant_info")
    }
    impact.foreach(i => stage("variant_impact") {
      i.sortWithinPartitions("variant_id")
        .write.mode("overwrite").parquet(s"$outDir/variant_impact")
    })
    // geno needs NO shuffle here: it derives from the range-sorted ids
    // scan by a generator (explode preserves row order), so its
    // partitions are already contiguous variant_id ranges with
    // (variant_id, sample) runs — exactly the clustering the dropped
    // repartitionByRange + sort re-created, minus the range-sampling
    // pass and a full shuffle of the widest table. Parquet min/max
    // stats stay tight; cap oversized outputs with
    // spark.sql.files.maxRecordsPerFile if nSamples inflates a
    // partition past target file size.
    stage("variant_geno") {
      geno.write.mode("overwrite").parquet(s"$outDir/variant_geno")
    }
    geneMap.foreach(g => stage("gene_map") {
      g.coalesce(1).write.mode("overwrite").parquet(s"$outDir/gene_map")
    })
    stage("samples") {
      samples.coalesce(1).write.mode("overwrite").parquet(s"$outDir/samples")
    }
    meta.foreach { case (name, df) =>
      stage(s"meta_$name") {
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/meta_$name")
      }
    }
    written.result()
  }
}
