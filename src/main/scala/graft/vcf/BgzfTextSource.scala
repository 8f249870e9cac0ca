package graft.vcf

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 `bgzf-text` format: reads bgzip-compressed text as one
  * `value: string` row per line, SPLITTABLE — each input partition is a
  * byte range of the compressed file, synced to BGZF block boundaries by
  * [[BgzfSplitLineIterator]]. This is the Spark-native replacement for
  * the reference's tabix-chunked VCF scan (`02-build-db.R:256`): instead
  * of a driver loop over genomic chunks, Catalyst plans one scan whose
  * partitions decompress independently, so a 100 GB `.vcf.gz` parses on
  * every executor at once rather than in a single gzip task.
  *
  *   spark.read.format("bgzf-text")
  *     .option("splitSize", 64 << 20)   // default: files.maxPartitionBytes
  *     .load("/data/cohort.vcf.gz")
  */
class BgzfTextSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "bgzf-text"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BgzfTextSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (schema != BgzfTextSource.Schema)
      throw new IllegalArgumentException(
        s"bgzf-text has a fixed schema ${BgzfTextSource.Schema.simpleString}; " +
          s"user-supplied schema ${schema.simpleString} is not supported")
    val opts = new CaseInsensitiveStringMap(properties)
    // `.load(p)` arrives as option "path"; `.load(p1, p2, ...)` arrives
    // as option "paths" holding a JSON string array.
    val paths = Option(opts.get("paths")).map(BgzfTextSource.parsePathsJson)
      .getOrElse(Option(opts.get("path")).map(Seq(_)).getOrElse(
        throw new IllegalArgumentException("bgzf-text requires a path")))
    new BgzfTextTable(paths, Option(opts.get("splitSize")).map(_.toLong))
  }
}

object BgzfTextSource {
  val Schema: StructType =
    StructType(Seq(StructField("value", StringType, nullable = false)))

  /** Spark encodes multi-path `.load(p1, p2)` as a JSON string array in
    * the "paths" option; decode with the same Jackson Spark uses.
    */
  def parsePathsJson(json: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.readValue(json, classOf[Array[String]]).toSeq
  }

  /** Non-hidden data files under a path/glob. */
  def listFiles(path: String, conf: Configuration): Seq[FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    Option(fs.globStatus(p)).getOrElse(Array.empty[FileStatus]).toSeq
      .flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
      }
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && st.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
      }
      .sortBy(_.getPath.toString)
  }
}

private[vcf] class BgzfTextTable(paths: Seq[String], splitSize: Option[Long])
  extends Table with SupportsRead {

  override def name(): String = s"bgzf-text(`${paths.mkString(",")}`)"
  override def schema(): StructType = BgzfTextSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BgzfTextScan(paths, splitSize)
    }
}

private[vcf] class BgzfTextScan(paths: Seq[String], splitSizeOpt: Option[Long])
  extends Scan with Batch {

  override def readSchema(): StructType = BgzfTextSource.Schema
  override def toBatch: Batch = this
  override def description(): String = s"bgzf-text ${paths.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    // One partition per `splitSize` compressed bytes — the same knob
    // parquet scans use, so executor-memory tuning carries over. A split
    // smaller than one block is harmless: a split containing no block
    // start syncs past its end and emits nothing.
    val splitSize = splitSizeOpt.getOrElse(spark.sessionState.conf.filesMaxPartitionBytes)
    require(splitSize > 0, s"splitSize must be positive, got $splitSize")
    paths.flatMap(p => BgzfTextSource.listFiles(p, conf)).flatMap { st =>
      val len = st.getLen
      (0L until len by splitSize).map { s =>
        BgzfSplit(st.getPath.toString, s, math.min(s + splitSize, len), len)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    // Hadoop Configuration is not serializable; ship the merged entries.
    val entries = conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    new BgzfReaderFactory(entries)
  }
}

private[vcf] case class BgzfSplit(path: String, start: Long, end: Long, fileLen: Long)
  extends InputPartition

private[vcf] class BgzfReaderFactory(confEntries: Array[(String, String)])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sp = partition.asInstanceOf[BgzfSplit]
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(sp.path)
    val it = new BgzfSplitLineIterator(
      p.getFileSystem(conf).open(p), sp.start, sp.end, sp.fileLen)
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { row = InternalRow(UTF8String.fromString(it.next())); true }
        else false
      override def get(): InternalRow = row
      override def close(): Unit = it.close()
    }
  }
}
