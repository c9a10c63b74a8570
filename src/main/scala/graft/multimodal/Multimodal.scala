package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run per partition in
  * batches.
  *
  * IMAGE decode is REAL since round 12 ([[decodeFeatures]] /
  * [[graft.functions.ImageKernels]] — `javax.imageio`, the JDK's built-in
  * PNG/JPEG/GIF/BMP codecs; also behind the `image_phash`/`image_dhash`
  * perceptual-dedup expressions). AUDIO/VIDEO codecs are not on the JDK,
  * so [[stubDecodeFeatures]] remains the declared deterministic stand-in
  * for those payloads: the mapPartitions batch shape, output schema and
  * null discipline are real and tested, so swapping in a JNI/ONNX decoder
  * changes one function body, not the plan.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val MediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
    StructField("byte_len", LongType, nullable = false)))

  /** Magic-byte MIME sniffing — real (not stubbed): dispatch on payload
    * prefixes, pure column expression, stays in codegen. */
  def sniffMime(data: Column): Column = {
    def prefix(hex: String): Column =
      hex_to_prefix(data, hex)
    when(data.isNull, lit(null).cast(StringType))
      .when(prefix("89504e47"), lit("image/png"))
      .when(prefix("ffd8ff"), lit("image/jpeg"))
      .when(prefix("47494638"), lit("image/gif"))
      // RIFF disambiguation: bytes 9-12 name the form (WEBP vs WAVE/AVI)
      .when(prefix("52494646") &&
        lower(hex(substring(data, 9, 4))) === "57454250", lit("image/webp"))
      .when(prefix("52494646"), lit("audio/wav")) // RIFF (wav/avi family)
      .when(prefix("494433"), lit("audio/mpeg")) // ID3
      .when(prefix("1a45dfa3"), lit("video/webm"))
      .otherwise(lit("application/octet-stream"))
  }

  private def hex_to_prefix(data: Column, hexPrefix: String): Column =
    lower(hex(substring(data, 1, hexPrefix.length / 2))) === hexPrefix

  /** Attach the metadata struct: sniffed mime, byte length, and REAL
    * image dimensions parsed from the container header
    * ([[graft.functions.ImageDims]] — PNG/GIF/JPEG/BMP headers are
    * published byte layouts, no codec needed; null for non-image or
    * malformed payloads). `duration_ms` stays null until a real media
    * demuxer fills it. */
  def withMediaMeta(df: DataFrame, dataCol: String): DataFrame = {
    val dims = org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.ImageDims(
        org.apache.spark.sql.GraftColumnShim.expression(col(dataCol))))
    df.withColumn("media_meta", struct(
      sniffMime(col(dataCol)).as("mime"),
      dims.getField("width").as("width"),
      dims.getField("height").as("height"),
      lit(null).cast(LongType).as("duration_ms"),
      coalesce(length(col(dataCol)).cast(LongType), lit(0L)).as("byte_len")))
  }

  /** REAL image decode → fixed-size feature vector: per-row
    * `javax.imageio` pixel decode, features = the L1-normalized
    * `featureDim`-bin luma histogram
    * ([[graft.functions.ImageKernels.lumaHistogram]]); null features for
    * null or undecodable payloads (crawl data is hostile — the kernel
    * never throws). Same mapPartitions batch shape, output schema and
    * null discipline the stub established; only the pixels became real. */
  def decodeFeatures(
      df: DataFrame, dataCol: String, featureDim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(StructField("features",
      ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val dataIdx = df.schema.fieldIndex(dataCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload = if (row.isNullAt(dataIdx)) null else row.getAs[Array[Byte]](dataIdx)
        val feats =
          if (payload == null) null
          else graft.functions.ImageKernels.lumaHistogram(payload, featureDim)
        Row.fromSeq(row.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  /** STUB decode → fixed-size feature vector for payload types the JDK
    * has no codec for (audio frames, video packets): deterministic
    * byte-histogram-ish moments of the payload. Image columns should use
    * [[decodeFeatures]] (real pixels); this remains the honest stand-in
    * for a JNI/ONNX audio/video decoder — batch shape, schema and null
    * handling identical, so the swap changes one function body.
    */
  def stubDecodeFeatures(
      df: DataFrame, dataCol: String, featureDim: Int = 16): DataFrame = {
    val outSchema = df.schema.add(StructField("features",
      ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = RowEncoder.encoderFor(outSchema)
    val dataIdx = df.schema.fieldIndex(dataCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload = if (row.isNullAt(dataIdx)) null else row.getAs[Array[Byte]](dataIdx)
        val feats: Array[Float] =
          if (payload == null) null
          else {
            // deterministic stand-in (no JDK codec for audio/video):
            val f = new Array[Float](featureDim)
            var i = 0
            while (i < payload.length) {
              f(i % featureDim) += (payload(i) & 0xff) / 255.0f
              i += 1
            }
            val n = math.max(1, payload.length / featureDim)
            f.map(_ / n)
          }
        Row.fromSeq(row.toSeq :+ (if (feats == null) null else feats.toSeq))
      }
    }(enc).toDF(outSchema.fieldNames: _*)
  }

  /** Frame sampling for video-ish payloads: emit `n` (frame_idx, offset)
    * slices per payload — pure column math (sequence + transform +
    * posexplode), no decoder needed to test the plumbing. Real decoding
    * would map each offset to a frame grab. */
  def sampleFrames(df: DataFrame, dataCol: String, n: Int): DataFrame = {
    val len = length(col(dataCol)).cast(LongType)
    df.withColumn("__offsets",
        transform(sequence(lit(0), lit(n - 1)),
          i => floor(i.cast(LongType) * len / n).cast(LongType)))
      .select(col("*"), posexplode(col("__offsets")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "byte_offset")
      .drop("__offsets")
  }
}
