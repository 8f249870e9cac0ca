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
    new BgzfTextTable(paths, Option(opts.get("splitSize")).map(_.toLong),
      Option(opts.get("region")), Option(opts.get("index")))
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

  /** `"chr"` or `"chr:beg-end"` (1-based inclusive; commas tolerated in
    * numbers, as in the tabix CLI) → (chr, beg, end).
    */
  def parseRegion(s: String): (String, Long, Long) = {
    val colon = s.lastIndexOf(':')
    if (colon < 0) (s, 1L, Long.MaxValue >> 17) // whole chromosome
    else {
      val range = s.substring(colon + 1).replace(",", "")
      val dash = range.indexOf('-')
      if (dash < 0)
        throw new IllegalArgumentException(
          s"bad region '$s': expected chr or chr:beg-end")
      (s.substring(0, colon), range.substring(0, dash).toLong,
        range.substring(dash + 1).toLong)
    }
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

private[vcf] class BgzfTextTable(paths: Seq[String], splitSize: Option[Long],
    region: Option[String], index: Option[String])
  extends Table with SupportsRead {

  override def name(): String = s"bgzf-text(`${paths.mkString(",")}`)"
  override def schema(): StructType = BgzfTextSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new BgzfTextScan(paths, splitSize, region, index)
    }
}

private[vcf] class BgzfTextScan(paths: Seq[String], splitSizeOpt: Option[Long],
    region: Option[String], index: Option[String])
  extends Scan with Batch {

  override def readSchema(): StructType = BgzfTextSource.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"bgzf-text ${paths.mkString(",")}" + region.fold("")(r => s" region=$r")

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val conf = spark.sessionState.newHadoopConf()
    // One partition per `splitSize` compressed bytes — the same knob
    // parquet scans use, so executor-memory tuning carries over. A split
    // smaller than one block is harmless: a split containing no block
    // start syncs past its end and emits nothing.
    val splitSize = splitSizeOpt.getOrElse(spark.sessionState.conf.filesMaxPartitionBytes)
    require(splitSize > 0, s"splitSize must be positive, got $splitSize")
    val files = paths.flatMap(p => BgzfTextSource.listFiles(p, conf))
    region match {
      case None =>
        files.flatMap { st =>
          val len = st.getLen
          (0L until len by splitSize).map { s =>
            BgzfSplit(st.getPath.toString, s, math.min(s + splitSize, len), len)
          }
        }.toArray
      case Some(r) =>
        // Tabix-pruned scan: only the blocks whose virtual-offset chunks
        // overlap the region(s) are planned at all — the DSv2 analog of
        // the reference's readVcf(param = chunk_ranges[i]), including
        // its MULTI-chunk form (';'-separated regions). Chunks from all
        // regions merge before planning so a block shared by two nearby
        // regions is read exactly once. Big chunks (a whole-chromosome
        // region) still split by `splitSize` for executor parallelism.
        val regions = r.split(';').toSeq.filter(_.nonEmpty)
          .map(BgzfTextSource.parseRegion)
        if (index.isDefined && files.length > 1)
          throw new IllegalArgumentException(
            "explicit 'index' option requires a single input file; " +
              "multi-file region reads use per-file <file>.tbi indexes")
        files.flatMap { st =>
          val fs = st.getPath.getFileSystem(conf)
          val tbi = index.map(new Path(_)).getOrElse(st.getPath.suffix(".tbi"))
          if (!fs.exists(tbi))
            throw new IllegalArgumentException(
              s"region read requires a tabix index at $tbi " +
                "(build one with graft.vcf.Tabix.build)")
          val len = st.getLen
          val idx = Tabix.read(fs, tbi)
          val all = regions.flatMap { case (chr, beg, end) => idx.query(chr, beg, end) }
            .sortBy(_.beg)
          val merged = scala.collection.mutable.ArrayBuffer.empty[Tabix.Chunk]
          all.foreach { c =>
            if (merged.nonEmpty && c.beg <= merged.last.end)
              merged(merged.length - 1) =
                Tabix.Chunk(merged.last.beg, math.max(c.end, merged.last.end))
            else merged += c
          }
          merged.flatMap { c =>
            val cBeg = c.beg >>> 16
            val cOwnEnd = (c.end >>> 16) + 1 // block holding vEnd is owned
            val bounds = (cBeg until cOwnEnd by splitSize) :+ cOwnEnd
            bounds.zip(bounds.tail).zipWithIndex.map { case ((s, e), i) =>
              BgzfSplit(st.getPath.toString, s, e, len,
                uStart = if (i == 0) (c.beg & 0xffff).toInt else -1,
                vEnd = c.end)
            }
          }
        }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    // Hadoop Configuration is not serializable; ship the merged entries.
    val entries = conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    new BgzfReaderFactory(entries)
  }
}

private[vcf] case class BgzfSplit(path: String, start: Long, end: Long, fileLen: Long,
    uStart: Int = -1, vEnd: Long = Long.MaxValue)
  extends InputPartition

private[vcf] class BgzfReaderFactory(confEntries: Array[(String, String)])
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val sp = partition.asInstanceOf[BgzfSplit]
    val conf = new Configuration(false)
    confEntries.foreach { case (k, v) => conf.set(k, v) }
    val p = new Path(sp.path)
    val it = new BgzfSplitLineIterator(
      p.getFileSystem(conf).open(p), sp.start, sp.end, sp.fileLen,
      sp.uStart, sp.vEnd)
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
