package graft.vcf

import org.apache.spark.sql.SparkSession

/** CLI pipeline driver — the analog of the reference's `VCFdb.R`
  * orchestration (arg parsing → stage sequencing → restartable build),
  * reduced to its Spark-native essence:
  *
  *   - stage 1 (scan planning / chunk ranges) disappears: Catalyst
  *     plans the distributed scan, `spark.read.text` splits by block;
  *   - stage 2 (chunked ETL loop + progress file) becomes one
  *     declarative build whose fault tolerance is Spark task retry,
  *     with job-level idempotence from deterministic overwrite writes;
  *   - stage 3 (DDL indexing) becomes the parquet physical layout
  *     (sorted/range-partitioned files ⇒ min-max-stat pruning).
  *
  * Usage:
  *   runMain graft.vcf.VcfPipeline --vcf <path> --out <dir> [--mode table]
  *
  * The reference's table/file GT mode split (`VCFdb.R:30-40`) is
  * intentionally collapsed: the columnar layout serves both access
  * patterns (SURVEY.md §1.4).
  */
object VcfPipeline {

  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap
    val vcfPath = opts.getOrElse("vcf",
      sys.error("--vcf <path> is required"))
    val outDir = opts.getOrElse("out",
      sys.error("--out <dir> is required"))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-vcf-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS",
          Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    run(spark, vcfPath, outDir)
    spark.stop()
  }

  /** Parse → validate → build → write. Rerun-safe: every table write
    * is a deterministic overwrite.
    *
    * Validation parity with the reference's stage-1 guard
    * (`01-generate-variant-ranges-index.R:43-53`): multiallelic sites
    * are written to `<out>/multiallelic_sites` as TSV for inspection,
    * then the build aborts.
    */
  def run(spark: SparkSession, vcfPath: String, outDir: String): VcfTables = {
    val vcf = VcfReader.read(spark, vcfPath)
    val bad = VcfBuild.multiallelicSites(vcf.df)
    if (!bad.isEmpty) {
      bad.coalesce(1).write.mode("overwrite")
        .option("sep", "\t").option("header", "true")
        .csv(s"$outDir/multiallelic_sites")
      throw new IllegalArgumentException(
        s"multiallelic sites found; report written to $outDir/multiallelic_sites — " +
          "normalize the VCF (e.g. bcftools norm -m-) and rerun")
    }
    val tables = VcfBuild.build(vcf)
    tables.write(outDir)
    tables
  }
}
