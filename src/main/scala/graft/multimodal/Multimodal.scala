package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, plus decode / feature-extract operators.
 *
 * The actual codec step is STUBBED (no image/audio libraries in this
 * environment — see `StubDecoder`): it produces a deterministic fake
 * decode from the byte content. Everything around it — schema, Arrow-free
 * per-partition batch iteration, partitioning, feature schema — is real
 * Spark plumbing: swap `StubDecoder.decode` for a JNI/ImageIO call and the
 * pipeline is production-shaped. Per-partition iteration means the decoder
 * initializes once per task, not once per row — the property that matters
 * when the real decoder has heavyweight init (model weights, codec
 * contexts) on a 1000-executor cluster.
 */
object Multimodal {

  /** Typed metadata carried next to every blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Wrap a text table as a fake media table: utf-8 bytes as the blob.
   * Stands in for `spark.read.format("binaryFile")` in this harness. */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"), // mediaSchema says LongType
      encode(col(textCol), "utf-8").as("blob"),
      lit("application/octet-stream").as("mime"),
      length(encode(col(textCol), "utf-8")).cast("long").as("n_bytes"))

  /**
   * ??? in spirit — deterministic fake decoder. A real build replaces
   * `decode` with the actual codec (e.g. ImageIO / ffmpeg JNI); signature
   * and batch shape stay identical.
   */
  object StubDecoder {
    final case class Decoded(width: Int, height: Int, channels: Int,
                             meanByte: Double)
    /** Fake "decode": dimensions and brightness derived deterministically
     * from the byte content. */
    def decode(blob: Array[Byte]): Decoded = {
      val n = blob.length
      val mean = if (n == 0) 0.0 else blob.iterator.map(b => (b & 0xFF).toDouble).sum / n
      Decoded(width = 16 + n % 64, height = 16 + (n / 64) % 64,
        channels = 3, meanByte = math.rint(mean * 10000) / 10000)
    }
  }

  /** Output schema of the decode stage. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /**
   * Decode stage: per-partition batch iteration (decoder init happens once
   * per partition — the Scala analogue of a `mapInPandas` batch UDF).
   */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    // a null blob (mediaSchema allows it — absent/unreadable media) has
    // nothing to decode; drop it rather than NPE the whole stage
    val rdd = media.select("media_id", "blob")
      .filter(col("blob").isNotNull)
      .rdd.mapPartitions { it =>
        // real decoder would initialize its codec context HERE, once
        it.map { r =>
          val d = StubDecoder.decode(r.getAs[Array[Byte]]("blob"))
          Row(r.getLong(0), d.width, d.height, d.channels, d.meanByte)
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** "Resize" planner: target dims as pure column arithmetic over decoded
   * metadata (the byte-level resample lives behind the stub boundary). */
  def planResize(decoded: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    // emit the UNROUNDED scale: out_w/out_h derive from it, and a
    // consumer recomputing floor(width * scale) from the emitted columns
    // must land on the same value (a rounded display scale made rows
    // self-inconsistent, e.g. floor(79 * 0.3291) = 25 vs out_w = 26)
    decoded
      .withColumn("scale", scale)
      .withColumn("out_w", floor(col("width") * scale).cast("int"))
      .withColumn("out_h", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample planner for video-like media: every k-th frame index up
   * to nFrames, exploded — the downstream decode fans out per frame. */
  def planFrameSample(media: DataFrame, nFrames: Int, everyK: Int): DataFrame =
    media.select(col("media_id"),
      explode(sequence(lit(0), lit(nFrames - 1), lit(everyK))).as("frame_idx"))
}
