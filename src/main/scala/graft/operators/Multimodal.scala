package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, partition-parallel decode / feature-extraction.
 *
 * IMAGE payloads (PNG/BMP/GIF/JPEG, detected by magic bytes) decode for
 * REAL through `javax.imageio` (in the JDK — no external codec needed):
 * true width/height land in `meta`, and the brightness feature is the
 * actual mean luminance (Rec.601 on a <=64x64 sampling grid; the decode
 * itself is O(pixels), bounded by [[MaxDecodePixels]] via a header-only
 * dimension check so a decompression bomb cannot OOM an executor). WAV
 * AUDIO decodes for real through
 * `javax.sound.sampled`: true duration into `meta.duration_ms`, real RMS
 * loudness (bounded sample count) as the scalar feature. Compressed
 * audio/video bytes keep the deterministic stub kernel (`decodeStub`) —
 * those codecs aren't in this environment — but the surrounding plumbing
 * is identical either way: binary payloads never shuffle (feature
 * extraction happens before any wide transform), and per-partition
 * iteration amortizes per-batch codec setup the way mapInPandas/
 * mapPartitions batches do.
 */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val featureType: StructType = StructType(Seq(
    StructField("n_bytes", LongType),
    StructField("digest_prefix", StringType),
    StructField("fake_brightness", DoubleType),
    // which kernel produced the feature: "imageio" / "wav" = real decode,
    // "stub" = deterministic fake (codec not in this environment). A
    // consumer filters on this to keep only truly-decoded features — the
    // contract that makes the stub tradeoff safe downstream.
    StructField("decoder", StringType)))

  /** Wrap a text/binary source into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
              mime: String): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      payload.cast(BinaryType).as("content"),
      struct(
        lit(mime).as("mime"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        lit(null).cast(LongType).as("duration_ms")).as("meta"))

  private def md5Prefix(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .take(4).map("%02x".format(_)).mkString

  /**
   * STUB decode: deterministic pseudo-features from the raw bytes. The
   * fallback for payloads whose codec isn't in this environment (audio,
   * video, exotic image formats); the signature, batching shape, and
   * output schema are the same as the real path.
   */
  private def decodeStub(bytes: Array[Byte]): (Long, String, Double) = {
    if (bytes == null) (0L, "", 0.0)
    else {
      val brightness = (bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble /
        math.max(bytes.length, 1)) / 255.0
      (bytes.length.toLong, md5Prefix(bytes), brightness)
    }
  }

  /** Magic-byte sniff: only bytes that LOOK like a decodable image reach
    * ImageIO — arbitrary text/binary must not pay a codec-probe attempt. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 'B' && b(1) == 'M') ||                                       // BMP
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte) ||                       // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))                          // GIF

  /** Mean Rec.601 luminance in [0,1], sampled on a <=64x64 grid — bounded
    * cost regardless of image size. */
  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    val sx = math.max(1, w / 64); val sy = math.max(1, h / 64)
    var sum = 0.0; var n = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)) / 255.0
        n += 1; x += sx
      }
      y += sy
    }
    sum / n
  }

  /** Decode ceiling: a compressed payload of a few KB can DECLARE huge
    * dimensions (decompression bomb) and OOM the executor on decode — an
    * OutOfMemoryError is not NonFatal, so the catch below wouldn't save the
    * task. Dimensions are read from the HEADER first (no pixel allocation)
    * and anything past this many pixels is treated as undecodable. */
  val MaxDecodePixels: Long = 64L * 1024 * 1024 // 64 MP ≈ 256 MB ARGB

  /** Real image decode via the JDK's ImageIO: (width, height, mean
    * luminance). None on undecodable or bomb-sized bytes (falls back to
    * the stub; a hostile payload must never kill a task). */
  private[operators] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Double)] =
    if (!looksLikeImage(bytes)) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            // header-only dims — the bomb check happens BEFORE any pixel
            // allocation
            val w = rd.getWidth(0); val h = rd.getHeight(0)
            if (w.toLong * h > MaxDecodePixels) None
            else {
              val img = rd.read(0)
              Some((img.getWidth, img.getHeight, meanLuma(img)))
            }
          } finally rd.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** RIFF/WAVE magic sniff — only wav-shaped bytes reach the audio stack. */
  private def looksLikeWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Real WAV decode via the JDK's javax.sound.sampled: (duration_ms, RMS
    * loudness in [0,1]). RMS reads at most ~64k samples — bounded per-row
    * cost regardless of clip length. None on undecodable bytes. */
  private[operators] def decodeWav(bytes: Array[Byte]): Option[(Long, Double)] =
    if (!looksLikeWav(bytes)) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames <= 0 || fmt.getFrameRate <= 0 || fmt.getSampleSizeInBits != 16) None
        else {
          val durationMs = (frames.toDouble / fmt.getFrameRate * 1000.0).toLong
          val maxBytes = 65536 * fmt.getFrameSize
          val buf = new Array[Byte](math.min(frames * fmt.getFrameSize, maxBytes.toLong).toInt)
          var off = 0; var r = 0
          while (off < buf.length && { r = in.read(buf, off, buf.length - off); r > 0 }) off += r
          var sum = 0.0; var n = 0; var i = 0
          while (i + 1 < off) { // 16-bit PCM, either endianness
            val s = if (fmt.isBigEndian) (buf(i) << 8) | (buf(i + 1) & 0xff)
                    else (buf(i + 1) << 8) | (buf(i) & 0xff)
            val v = s / 32768.0; sum += v * v; n += 1; i += 2
          }
          if (n == 0) None else Some((durationMs, math.sqrt(sum / n)))
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Feature extraction over the binary column, one decoder instance per
   * partition (mapPartitions = the JVM analogue of mapInPandas batches).
   * Image payloads take the real ImageIO path — true dimensions written
   * into `meta.width`/`meta.height`, real mean luminance as the brightness
   * feature. WAV payloads take the real javax.sound path — true duration
   * into `meta.duration_ms`, RMS loudness as the feature. Everything else
   * keeps the stub. All paths run where the scan runs: the binary column
   * is consumed here and never shuffles.
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "content") :+
      StructField("features", featureType))
    val contentIdx = media.schema.fieldIndex("content")
    val keepIdx = media.schema.fields.indices.filterNot(_ == contentIdx)
    val metaOutIdx = outSchema.fields.indexWhere(_.name == "meta")
    // meta sub-field positions resolved BY NAME on the driver — a caller's
    // meta struct may be narrower or reordered vs the canonical layout;
    // fields it doesn't carry are simply not patched
    val metaFieldIdx: Map[String, Int] =
      if (metaOutIdx < 0) Map.empty
      else outSchema.fields(metaOutIdx).dataType match {
        case st: StructType => st.fieldNames.zipWithIndex.toMap
        case _ => Map.empty
      }
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition setup happens HERE (codec init in a real pipeline)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val kept = keepIdx.map(r.get)
        def withMeta(scalar: Double, decoder: String)(patch: Map[String, Any]): Row = {
          val out = kept :+ Row(bytes.length.toLong, md5Prefix(bytes), scalar, decoder)
          val m = if (metaOutIdx < 0) null else out(metaOutIdx).asInstanceOf[Row]
          if (m == null) Row.fromSeq(out)
          else {
            val patched = patch.foldLeft(m.toSeq) { case (cur, (name, value)) =>
              metaFieldIdx.get(name).fold(cur)(cur.updated(_, value))
            }
            Row.fromSeq(out.updated(metaOutIdx, Row.fromSeq(patched)))
          }
        }
        decodeImage(bytes) match {
          case Some((w, h, luma)) => // true dims into meta
            withMeta(luma, "imageio")(Map("width" -> w, "height" -> h))
          case None => decodeWav(bytes) match {
            case Some((durMs, rms)) => // true duration into meta
              withMeta(rms, "wav")(Map("duration_ms" -> durMs))
            case None =>
              val (n, sha, bright) = decodeStub(bytes)
              Row.fromSeq(kept :+ Row(n, sha, bright, "stub"))
          }
        }
      }
    }(enc)
  }

  /** Frame-sampling plumbing: emit `n` evenly spaced (frame_no, offset)
    * stubs per video row — the explode pattern a real sampler uses. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    // n = 0 would make sequence(0, -1) a DESCENDING [0, -1] (two bogus
    // frames) and the /n offset a division by zero — refuse, don't emit
    require(n > 0, s"frame sample count must be positive, got $n")
    media
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset_ms",
        floor((col("frame_no") * coalesce(col("meta.duration_ms"), lit(1000L))) / n)
          .cast("long"))
      .drop("content")
  }

  val frameFeatureType: StructType = StructType(Seq(
    StructField("frame_index", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("luminance", DoubleType)))

  /** Real multi-frame decode for animated GIFs via ImageIO's sequence
    * reader: `n` evenly spaced frames as (source frame index, dims, mean
    * luminance). None for non-GIF or undecodable bytes. */
  private[operators] def decodeGifFrames(bytes: Array[Byte], n: Int)
      : Option[Seq[(Int, Int, Int, Double)]] =
    if (bytes == null || bytes.length < 3 ||
        bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F') None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            val total = rd.getNumImages(true)
            if (total <= 0) None
            else {
              // the bomb ceiling is PER FRAME: GIF image descriptors carry
              // 16-bit dims per frame, so a 1x1 frame 0 followed by a
              // 65535x65535 frame 1 would pass a frame-0-only check and
              // the rd.read below would allocate ~17 GB — the executor
              // OOM this guard exists to prevent. Header dims are read
              // without decoding, so the check stays cheap.
              val frames = (0 until n).map(i =>
                math.min(total - 1, (i.toLong * total / n).toInt)).distinct
              if (frames.exists(fi =>
                  rd.getWidth(fi).toLong * rd.getHeight(fi) > MaxDecodePixels))
                None
              else Some((0 until n).map { i =>
                val fi = math.min(total - 1, (i.toLong * total / n).toInt)
                val img = rd.read(fi)
                (fi, img.getWidth, img.getHeight, meanLuma(img))
              })
            }
          } finally rd.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /**
   * Frame features, REAL where the codec exists: animated-GIF payloads
   * decode `n` evenly spaced actual frames (true per-frame dims + mean
   * luminance via ImageIO's sequence reader); other payloads emit `n`
   * stub rows with NULL frame features — same schema, same plumbing, so a
   * deployment swapping in a video codec changes one decode function.
   * Runs in the scan stage; the binary payload never shuffles.
   */
  def sampleFrameFeatures(media: DataFrame, n: Int): DataFrame = {
    require(n > 0, s"frame sample count must be positive, got $n")
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "content") ++
      Seq(StructField("frame_no", IntegerType),
        StructField("frame", frameFeatureType)))
    val contentIdx = media.schema.fieldIndex("content")
    val keepIdx = media.schema.fields.indices.filterNot(_ == contentIdx)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val kept = keepIdx.map(r.get)
        decodeGifFrames(bytes, n) match {
          case Some(frames) => frames.zipWithIndex.map { case ((fi, w, h, luma), i) =>
            Row.fromSeq(kept ++ Seq(i, Row(fi, w, h, luma)))
          }
          case None => (0 until n).map(i => Row.fromSeq(kept ++ Seq(i, null)))
        }
      }
    }(enc)
  }
}
