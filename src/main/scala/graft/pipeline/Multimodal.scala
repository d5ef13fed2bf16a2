package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as partition-local transforms.
  *
  * The codec work is behind [[MediaDecoder]]. The default [[HeaderDecoder]]
  * is REAL: it parses PNG/JPEG/GIF container headers (dimensions, depth,
  * channels) in pure JVM code. Pixel-level decode needs image libraries this
  * container lacks, so [[StubDecoder]] remains as the documented deterministic
  * fake for that layer; swapping in a JNI/FFmpeg/ImageIO decoder changes no
  * plan shape. The Spark-side contract — schema, batch shape, partition-local
  * execution, no shuffle — is real and tested either way.
  */
object Multimodal {

  /** Canonical media struct schema: binary payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("data", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_frames", IntegerType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("ok", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(FloatType))))

  /** Decoder contract: bytes -> (ok, width, height, features). Implementations
    * must be Serializable (shipped to executors) and stateless or
    * thread-confined; one instance is created per partition.
    */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte], mime: String): (Boolean, Int, Int, Array[Float])
  }

  /** Deterministic fake decoder: derives dimensions and a `featureDim`-length
    * feature vector from a rolling hash of the payload. Real decode
    * (ImageIO/FFmpeg) drops in behind the same trait.
    */
  final class StubDecoder(featureDim: Int = 16) extends MediaDecoder {
    override def decode(bytes: Array[Byte], mime: String): (Boolean, Int, Int, Array[Float]) = {
      if (bytes == null || bytes.isEmpty) return (false, 0, 0, Array.empty)
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.abs(h % 1024).toInt
      val ht = 64 + math.abs((h >> 10) % 1024).toInt
      val feats = Array.tabulate(featureDim) { d =>
        val hd = h * (d * 2654435761L + 1)
        ((hd % 1000).toFloat / 1000.0f)
      }
      (true, w, ht, feats)
    }
  }

  /** Pure-JVM header decoder — the DEFAULT. Parses real container headers
    * with no image libraries: PNG IHDR (width, height, bit depth, color
    * type), JPEG SOF0/1/2 (dimensions, precision, components), GIF87a/89a
    * logical-screen dimensions. Features = [width, height, depth, channels]
    * so downstream feature plumbing (similarity, quality filters on
    * resolution) runs on REAL metadata. Pixel decode / resampling remains a
    * plug-in ([[StubDecoder]] documents the fake; an ImageIO/FFmpeg decoder
    * drops in behind the same trait). Format detection is by magic bytes —
    * the mime string is advisory only.
    */
  final class HeaderDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte], mime: String): (Boolean, Int, Int, Array[Float]) = {
      if (bytes == null || bytes.length < 10) return (false, 0, 0, Array.empty)
      def u8(i: Int): Int = bytes(i) & 0xFF
      def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
      def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      // PNG: signature, then the IHDR chunk is REQUIRED to be first
      if (bytes.length >= 33 &&
          u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
          u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
        val w = be32(16); val h = be32(20)
        val bitDepth = u8(24); val colorType = u8(25)
        val channels = colorType match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4; case _ => 0
        }
        if (w <= 0 || h <= 0) return (false, 0, 0, Array.empty)
        return (true, w, h, Array(w.toFloat, h.toFloat, bitDepth.toFloat, channels.toFloat))
      }
      // JPEG: FF D8, then marker segments until a start-of-frame
      if (u8(0) == 0xFF && u8(1) == 0xD8) {
        var i = 2
        while (i + 3 < bytes.length) {
          if (u8(i) != 0xFF) return (false, 0, 0, Array.empty)
          val marker = u8(i + 1)
          if (marker == 0xFF) { i += 1 } // fill byte
          else if ((marker >= 0xD0 && marker <= 0xD9) || marker == 0x01) { i += 2 } // standalone
          else {
            val len = be16(i + 2)
            if (len < 2 || i + 2 + len > bytes.length) return (false, 0, 0, Array.empty)
            // SOF0 (baseline) / SOF1 (extended) / SOF2 (progressive)
            if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
              val precision = u8(i + 4)
              val h = be16(i + 5); val w = be16(i + 7)
              val components = u8(i + 9)
              if (w <= 0 || h <= 0) return (false, 0, 0, Array.empty)
              return (true, w, h,
                Array(w.toFloat, h.toFloat, precision.toFloat, components.toFloat))
            }
            i += 2 + len
          }
        }
        return (false, 0, 0, Array.empty)
      }
      // GIF87a / GIF89a: 6-byte signature then LE16 width, height
      if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
          bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a') {
        val w = le16(6); val h = le16(8)
        if (w <= 0 || h <= 0) return (false, 0, 0, Array.empty)
        return (true, w, h, Array(w.toFloat, h.toFloat, 8f, 3f))
      }
      (false, 0, 0, Array.empty)
    }
  }

  /** Wrap raw binary + mime columns into the canonical media struct. */
  def asMedia(data: Column, mime: Column): Column =
    struct(data.as("data"), mime.as("mime"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"), lit(null).cast("int").as("n_frames"))

  /** Decode/feature-extract stage: partition-local mapPartitions (the Scala
    * analogue of the reference's mapInPandas batch UDFs) — decoder instantiated
    * once per partition, rows streamed, no shuffle, schema appended as a
    * `featureSchema` struct column.
    */
  def extractFeatures(df: DataFrame, mediaCol: String,
                      decoder: MediaDecoder = new HeaderDecoder,
                      outCol: String = "media_features"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(outCol, featureSchema))
    val mediaIdx = inSchema.fieldIndex(mediaCol)
    val nFields = mediaSchema.length
    val rdd = df.queryExecution.toRdd.mapPartitions { iter =>
      // decoder is reused across the partition; rows copied out of the unsafe buffer
      iter.map { internal =>
        val row = internal.copy()
        val (ok, w, h, feats) =
          if (row.isNullAt(mediaIdx)) (false, 0, 0, Array.empty[Float])
          else {
            val media = row.getStruct(mediaIdx, nFields)
            if (media.isNullAt(0)) (false, 0, 0, Array.empty[Float])
            else decoder.decode(media.getBinary(0),
              if (media.isNullAt(1)) "" else media.getUTF8String(1).toString)
          }
        val featStruct = org.apache.spark.sql.catalyst.InternalRow(
          ok, w, h, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(feats))
        new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          row, org.apache.spark.sql.catalyst.InternalRow(featStruct))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    graftInternalCreate(spark, rdd, outSchema)
  }

  // bridge helpers implemented via GraftColumnBridge-style internal access
  private def graftInternalCreate(spark: org.apache.spark.sql.SparkSession,
                                  rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                                  schema: StructType): DataFrame =
    org.apache.spark.sql.GraftDatasetBridge.ofRows(spark, rdd, schema)

  /** Frame-sample stage for video-like media: keep every `stride`-th frame
    * index up to `maxFrames` (metadata-level planning; actual frame extraction
    * happens in the decoder). Emits one row per sampled frame index.
    */
  def sampleFrameIndexes(df: DataFrame, nFramesCol: String, stride: Int,
                         maxFrames: Int, outCol: String = "frame_index"): DataFrame =
    df.withColumn(outCol,
      explode(slice(sequence(lit(0), greatest(coalesce(col(nFramesCol), lit(1)) - 1, lit(0)), lit(stride)),
        1, maxFrames)))
}
