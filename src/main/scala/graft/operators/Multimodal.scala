package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, partition-parallel decode / feature-extraction.
 *
 * The decode kernels themselves are STUBBED (no codec libraries in this
 * environment — `decodeStub` derives deterministic fake features from the
 * bytes); everything around them — schema, batch iteration, partitioning,
 * null discipline — is the real Spark plumbing a 100 TB media pipeline
 * needs: binary payloads never shuffle (feature extraction happens before
 * any wide transform), and per-partition iteration amortizes per-batch
 * codec setup the way mapInPandas/mapPartitions batches do.
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
    StructField("sha_prefix", StringType),
    StructField("fake_brightness", DoubleType)))

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

  /**
   * STUB decode: deterministic pseudo-features from the raw bytes. A real
   * deployment swaps the body for an image/audio codec call; the signature,
   * batching shape, and output schema stay exactly as-is.
   */
  private def decodeStub(bytes: Array[Byte]): (Long, String, Double) = {
    if (bytes == null) (0L, "", 0.0)
    else {
      val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val hex = md.take(4).map("%02x".format(_)).mkString
      val brightness = (bytes.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble /
        math.max(bytes.length, 1)) / 255.0
      (bytes.length.toLong, hex, brightness)
    }
  }

  /**
   * Feature extraction over the binary column, one decoder instance per
   * partition (mapPartitions = the JVM analogue of mapInPandas batches).
   */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields.filterNot(_.name == "content") :+
      StructField("features", featureType))
    val contentIdx = media.schema.fieldIndex("content")
    val keepIdx = media.schema.fields.indices.filterNot(_ == contentIdx)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition setup happens HERE (codec init in a real pipeline)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        val (n, sha, bright) = decodeStub(bytes)
        Row.fromSeq(keepIdx.map(r.get) :+ Row(n, sha, bright))
      }
    }(enc)
  }

  /** Frame-sampling plumbing: emit `n` evenly spaced (frame_no, offset)
    * stubs per video row — the explode pattern a real sampler uses. */
  def sampleFrames(media: DataFrame, n: Int): DataFrame =
    media
      .withColumn("frame_no", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("frame_offset_ms",
        floor((col("frame_no") * coalesce(col("meta.duration_ms"), lit(1000L))) / n)
          .cast("long"))
      .drop("content")
}
