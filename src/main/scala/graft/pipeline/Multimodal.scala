package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages as partition-local transforms.
  *
  * The actual codec work is behind [[MediaDecoder]]; this container has no
  * image/audio libraries, so [[StubDecoder]] provides a deterministic fake
  * (hash-derived dimensions + features). The Spark-side contract — schema,
  * batch shape, partition-local execution, no shuffle — is real and tested;
  * swapping in a JNI/FFmpeg/ImageIO decoder changes no plan shape.
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
  def extractFeatures(df: DataFrame, mediaCol: String, decoder: MediaDecoder,
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
