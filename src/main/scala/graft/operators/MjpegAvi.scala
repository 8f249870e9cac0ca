package graft.operators

/** Minimal MJPEG-in-AVI video codec — pure JDK. Written from the public
  * RIFF/AVI container layout (the `RIFF('AVI ' LIST('hdrl' …)
  * LIST('movi' '00dc'…))` structure documented in Microsoft's AVI RIFF
  * reference) plus the JPEG codec the JDK ships in `javax.imageio`:
  * every `##dc`/`##db` chunk inside the `movi` list is one complete
  * JPEG image. This is the one video format decodable with zero
  * external codec libraries, which makes the video-decode seam REAL in
  * this environment (compressed formats like H.264/VP9 would swap in
  * behind the same [[decode]] signature).
  *
  * The reference has no video surface at all — this belongs to the
  * engine's multimodal training-data tier (see SURVEY.md §2's
  * LLM-pipeline additions, alongside image/audio decode).
  */
object MjpegAvi {

  /** Decoded per-video metadata + per-frame mean luminance series. */
  final case class VideoMeta(
      width: Int, height: Int, nFrames: Int, durationMs: Long,
      fps: Double, meanLuma: Array[Double])

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Decode an MJPEG AVI payload: RIFF chunk walk to collect the video
    * frame chunks + `avih` frame timing, then a JDK JPEG decode per
    * frame for dimensions and ITU-R 601 mean luminance (normalized to
    * [0, 1]). Returns None for null payloads, non-AVI bytes, or AVIs
    * with no decodable frame — corrupt files degrade to NULL columns
    * instead of failing the job, like [[Multimodal.decodeImages]].
    */
  def decode(payload: Array[Byte]): Option[VideoMeta] = {
    if (payload == null || payload.length < 12 ||
      fourcc(payload, 0) != "RIFF" || fourcc(payload, 8) != "AVI ") return None
    try {
      var usPerFrame = 0L
      val frames = scala.collection.mutable.ArrayBuffer[(Int, Int)]() // (off, len)
      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(payload, off)
          val sizeL = u32(payload, off + 4)
          val dataOff = off + 8
          // bounds check in Long: a crafted size near Int.MaxValue would
          // overflow an Int sum negative and slip past the guard
          if (sizeL < 0 || dataOff.toLong + sizeL > end) return // truncated: stop
          val size = sizeL.toInt
          if (id == "LIST" && size >= 4) {
            // only the lists that can contain headers/frames; 'rec '
            // groups interleaved frames in some muxers
            val lt = fourcc(payload, dataOff)
            if (lt == "hdrl" || lt == "strl" || lt == "movi" || lt == "rec ")
              walk(dataOff + 4, dataOff + size)
          } else if (id == "avih" && size >= 4) {
            usPerFrame = u32(payload, dataOff) // dwMicroSecPerFrame
          } else if ((id.endsWith("dc") || id.endsWith("db")) && size > 0) {
            frames += ((dataOff, size))
          }
          off = dataOff + size + (size & 1) // chunks are word-aligned
        }
      }
      walk(12, math.min(payload.length.toLong, 8L + u32(payload, 4)).toInt)
      if (frames.isEmpty) return None
      var w = 0
      var h = 0
      val luma = frames.iterator.flatMap { case (off, len) =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, off, len))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          if (w == 0) { w = img.getWidth; h = img.getHeight }
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                (rgb & 0xff) * 114) / 1000
              x += 1
            }
            y += 1
          }
          Some(sum.toDouble / (img.getWidth.toLong * img.getHeight * 255))
        }
      }.toArray
      if (luma.isEmpty) None
      else Some(VideoMeta(w, h, luma.length,
        luma.length * usPerFrame / 1000,
        if (usPerFrame > 0) 1e6 / usPerFrame else 0d, luma))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------ writer

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte]
    cc(id) ++ le32(data.length.toLong) ++ data ++ pad
  }
  private def list(listType: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ payload)

  /** Mux pre-encoded JPEG frames into a minimal standards-shaped MJPEG
    * AVI (one video stream, no idx1 — every mainstream demuxer, and
    * [[decode]], walks `movi` directly). Deterministic byte output for
    * fixed inputs — the fixture generator for specs and oracles.
    */
  def encode(frames: Seq[Array[Byte]], width: Int, height: Int,
      fps: Int): Array[Byte] = {
    require(frames.nonEmpty && fps > 0, "need >=1 frame and fps > 0")
    val maxFrame = frames.map(_.length).max
    val avih = le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(0) ++ le32(1) ++ le32(maxFrame.toLong) ++
      le32(width.toLong) ++ le32(height.toLong) ++ Array.fill(16)(0.toByte)
    val strh = cc("vids") ++ cc("MJPG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps.toLong) ++ le32(0) ++
      le32(frames.length.toLong) ++ le32(maxFrame.toLong) ++ le32(0xffffffffL) ++
      le32(0) ++ le16(0) ++ le16(0) ++ le16(width) ++ le16(height)
    val strf = le32(40) ++ le32(width.toLong) ++ le32(height.toLong) ++
      le16(1) ++ le16(24) ++ cc("MJPG") ++ le32(width.toLong * height * 3) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
    val body = cc("AVI ") ++ hdrl ++ movi
    cc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Render one solid/functional JPEG frame (fixture helper): pixel
    * (x, y) = `px(x, y)` packed RGB. JPEG is lossy — round-tripped
    * luminance lands within ~±0.01 of the ideal, which specs and
    * oracles absorb by rounding.
    */
  def jpegFrame(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, px(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}
