package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** VCF-domain queries: the reference engine's own data model (info /
  * impact / geno), exercised on an embedded deterministic toy VCF and
  * pinned by golden-row VALUES oracles. Populated with the
  * `graft.vcf` subsystem.
  */
object VcfQ {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  val oracle: Map[String, String] = Map.empty
}
