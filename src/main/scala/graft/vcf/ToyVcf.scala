package graft.vcf

/** Deterministic toy VCF fixture (authored for this engine — not taken
  * from the reference's toy-data): 6 normalized variants on 2
  * chromosomes, 2 samples, VEP-style CSQ annotations covering every
  * impact-pipeline branch (multi-consequence `&` terms, intron values,
  * HIGH/LOW impacts, pseudogene biotype) and every gt2snp dosage class
  * (hom-ref / het / hom-alt / missing). Golden rows for the derived
  * tables are hand-computed in [[graft.queries.VcfQ]]'s VALUES oracles.
  */
object ToyVcf {

  private def t(fields: String*): String = fields.mkString("\t")

  val lines: Seq[String] = Seq(
    "##fileformat=VCFv4.2",
    "##INFO=<ID=AC,Number=A,Type=Integer,Description=\"Allele count in genotypes\">",
    "##INFO=<ID=AF,Number=A,Type=Float,Description=\"Allele frequency\">",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Total depth\">",
    "##INFO=<ID=VT,Number=1,Type=String,Description=\"Variant type\">",
    "##INFO=<ID=CSQ,Number=.,Type=String,Description=\"Consequence annotations from Ensembl VEP. Format: Allele|Consequence|IMPACT|SYMBOL|Gene|BIOTYPE|INTRON\">",
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">",
    "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"Read depth\">",
    "##FILTER=<ID=q10,Description=\"Quality below 10\">",
    "##contig=<ID=1,length=1000>",
    "##contig=<ID=2>",
    t("#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT", "S1", "S2"),
    t("1", "100", "rs1", "A", "G", "50", "PASS",
      "AC=1;AF=0.25;DP=20;VT=SNP;CSQ=G|missense_variant|MODERATE|GENE1|ENSG1|protein_coding|,G|intron_variant|MODIFIER|GENE1|ENSG1|protein_coding|1/4",
      "GT:DP", "0|0:10", "0|1:12"),
    t("1", "200", "rs2", "C", "T", "99", "PASS",
      "AC=2;AF=0.5;DP=30;VT=SNP;CSQ=T|stop_gained&splice_region_variant|HIGH|GENE1|ENSG1|protein_coding|",
      "GT:DP", "1|1:15", "0|0:9"),
    t("1", "300", ".", "G", "A", "10", "q10",
      "AC=1;AF=0.25;DP=5;VT=SNP",
      "GT:DP", "./.:0", "0|1:7"),
    t("2", "150", "rs3", "T", "C", "80", "PASS",
      "AC=3;AF=0.75;DP=40;VT=SNP;CSQ=C|synonymous_variant|LOW|GENE2|ENSG2|protein_coding|",
      "GT:DP", "1|1:20", "1|0:18"),
    t("2", "250", "rs4", "G", "GA", "60", "PASS",
      "AC=1;AF=0.25;DP=25;VT=INDEL;CSQ=GA|frameshift_variant|HIGH|GENE2|ENSG2|protein_coding|,GA|upstream_gene_variant|MODIFIER|GENE3|ENSG3|processed_pseudogene|",
      "GT:DP", "0|1:11", "0|0:13"),
    t("2", "400", "rs5", "A", "C", "70", "PASS",
      "AC=4;AF=1;DP=35;VT=SNP;CSQ=C|missense_variant|MODERATE|GENE3|ENSG3|protein_coding|",
      "GT:DP", "1|1:22", "1|1:19"))

  /** The same fixture with clinvar INFO annotations (the shape VCFdbR's
    * clinvar re-join consumes, `02-build-db.R:286-305`): rs1 carries two
    * significance values (exercising the unnest row multiplication), rs2
    * one, and the rest none (left-join NULLs).
    */
  val clinvarLines: Seq[String] = lines.flatMap {
    case l if l.startsWith("#CHROM") => Seq(
      "##INFO=<ID=clinvar_sig,Number=.,Type=String,Description=\"ClinVar significance\">",
      "##INFO=<ID=clinvar_disease_name,Number=.,Type=String,Description=\"ClinVar disease name\">",
      l)
    case l if l.contains("\trs1\t") => Seq(l.replace(";VT=SNP;",
      ";VT=SNP;clinvar_sig=pathogenic,likely_pathogenic;clinvar_disease_name=DiseaseA;"))
    case l if l.contains("\trs2\t") => Seq(l.replace(";VT=SNP;",
      ";VT=SNP;clinvar_sig=benign;clinvar_disease_name=DiseaseB;"))
    case l => Seq(l)
  }
}
