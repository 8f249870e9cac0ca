package graft.vcf

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed views of the fixed relational core (SURVEY.md §1.4: typed
  * access via case-class Encoders for the fixed columns; `DataFrame`
  * remains the surface for the dynamic INFO/CSQ tail, whose schema is
  * input-dependent).
  */
final case class VariantCore(
    variant_id: Long, chr: String, start: Long, end: Long,
    ref: String, alt: String, qual: Option[Double], filter: Option[String])

final case class GenotypeRow(
    variant_id: Long, sample: String,
    gt: Option[Double], gt_raw: Option[String])

final case class ImpactCore(
    variant_id: Long, consequence: String, impact: String, symbol: String,
    gene: String, biotype: String,
    is_lof: Boolean, is_splicing: Boolean, is_exonic: Boolean, is_intronic: Boolean)

object VcfModel {
  implicit val variantCoreEnc: Encoder[VariantCore] = Encoders.product[VariantCore]
  implicit val genotypeEnc: Encoder[GenotypeRow] = Encoders.product[GenotypeRow]
  implicit val impactEnc: Encoder[ImpactCore] = Encoders.product[ImpactCore]

  /** Project the typed fixed core out of the dynamic tables. */
  def coreOf(tables: VcfTables): Dataset[VariantCore] =
    tables.info.select(
      "variant_id", "chr", "start", "end", "ref", "alt", "qual", "filter")
      .as[VariantCore]

  def genotypesOf(tables: VcfTables): Dataset[GenotypeRow] =
    tables.geno.select("variant_id", "sample", "gt", "gt_raw").as[GenotypeRow]

  def impactsOf(tables: VcfTables): Option[Dataset[ImpactCore]] =
    tables.impact.map(_.select(
      "variant_id", "consequence", "impact", "symbol", "gene", "biotype",
      "is_lof", "is_splicing", "is_exonic", "is_intronic").as[ImpactCore])
}
