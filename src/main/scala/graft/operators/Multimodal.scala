package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns travelling next to typed metadata.
  *
  * IMAGE decode is REAL: [[decodeImage]]/[[decodeImages]] use the JDK's
  * built-in `javax.imageio` codecs (PNG/JPEG/BMP/GIF — no external
  * dependency) to produce dimensions and a normalized luminance
  * histogram. Audio/video decode remains STUBBED (no codec libraries in
  * this environment): [[decodeStub]] derives deterministic fake
  * features from the bytes. Swapping in a real audio/video decoder
  * changes only the body of the `mapPartitions` closure — the schema
  * contract and partition-wise batching are the production shape,
  * exactly as [[decodeImages]] demonstrates for images.
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Wrap an arbitrary id+bytes DataFrame into the canonical media
    * schema (metadata nulls where unknown).
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, modality: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast(BinaryType).as("payload"),
      lit(null).cast(StringType).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(LongType).as("duration_ms"))

  /** Cheap byte-level metadata — no decode needed, pure columns. */
  def byteStats(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")).cast(LongType))
      .withColumn("payload_md5", md5(col("payload")))

  /** STUB decode → fixed-size feature vector. Deterministic fake:
    * feature[i] = byte[(i * stride) mod n] / 255.0. A real
    * implementation would decode pixels/samples here; everything
    * around the closure (schema contract, partition-wise batching)
    * is the production shape.
    */
  def decodeStub(dim: Int = 8)(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) Array.fill(dim)(0d)
    else {
      val stride = math.max(1, payload.length / dim)
      Array.tabulate(dim) { i =>
        (payload((i * stride) % payload.length) & 0xff) / 255.0
      }
    }
  }

  /** REAL image decode (JDK ImageIO): dimensions + `dim`-bin normalized
    * luminance histogram (ITU-R 601 luma). Returns None for null,
    * undecodable, or non-image payloads — the caller maps that to NULL
    * columns, so corrupt files degrade instead of failing the job.
    */
  def decodeImage(dim: Int)(payload: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      val hist = new Array[Double](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum * dim / 256) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toDouble * h
      var i = 0
      while (i < dim) { hist(i) /= n; i += 1 }
      Some((w, h, hist))
    } catch { case _: Exception => None }
  }

  /** Partition-wise real image decode: appends `img_width`,
    * `img_height`, `img_features` (all NULL when the payload is not a
    * decodable image). The per-partition seam disables ImageIO's
    * temp-file cache once per task — the spot a heavier codec would be
    * initialized.
    */
  def decodeImages(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("img_width", IntegerType, nullable = true),
      StructField("img_height", IntegerType, nullable = true),
      StructField("img_features", ArrayType(DoubleType), nullable = true)))
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // once per task
      rows.map { r =>
        decodeImage(dim)(r.getAs[Array[Byte]](payloadIdx)) match {
          case Some((w, h, f)) => Row.fromSeq(r.toSeq ++ Seq(w, h, f.toSeq))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature extraction over the payload column via mapPartitions —
    * the per-partition loop is where a real decoder (libjpeg, ffmpeg,
    * …) would be initialized once per task and reused per row.
    */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = false))
    val payloadIdx = df.schema.fieldIndex("payload")
    val rdd = df.rdd.mapPartitions { rows =>
      // real impl: init decoder once per partition here
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        Row.fromSeq(r.toSeq :+ decodeStub(dim)(bytes).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic frame sampling plan for video-like payloads: every
    * `everyMs` milliseconds in [0, duration); pure column math (the
    * actual frame grab is the decoder's job).
    */
  def frameSamplePlan(df: DataFrame, everyMs: Long): DataFrame =
    df.where(col("duration_ms").isNotNull && col("duration_ms") > 0)
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
}
