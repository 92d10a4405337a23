package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
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
   * ??? in spirit — deterministic fake decoder for blobs that are NOT a
   * recognized image (text blobs in this harness). A real build replaces
   * `decode`'s fallback with the actual pixel codec (e.g. ImageIO /
   * ffmpeg JNI); signature and batch shape stay identical. Recognized
   * PNG/JPEG/GIF blobs take the REAL header path ([[HeaderDecoder]])
   * even here, so image dimensions are never faked.
   */
  object StubDecoder {
    final case class Decoded(width: Int, height: Int, channels: Int,
                             meanByte: Double)
    /** Decode: real header dims for recognized image formats; for
     * anything else, dimensions and brightness derived deterministically
     * from the byte content (the fake stands in for the pixel codec). */
    def decode(blob: Array[Byte]): Decoded = {
      val n = blob.length
      val mean = if (n == 0) 0.0 else blob.iterator.map(b => (b & 0xFF).toDouble).sum / n
      val m = math.rint(mean * 10000) / 10000
      HeaderDecoder.parse(blob) match {
        case Some(h) => Decoded(h.width, h.height, h.channels, m)
        case None => Decoded(width = 16 + n % 64, height = 16 + (n / 64) % 64,
          channels = 3, meanByte = m)
      }
    }
  }

  /**
   * REAL header-level image decode — no external libraries, just the
   * published byte layouts:
   *  - PNG (ISO 15948 §5.2/§11.2.2): 8-byte signature, then the IHDR
   *    chunk — width/height as 4-byte big-endian at offsets 16/20, bit
   *    depth and colour type at 24/25 (channels: 0→1, 2→3, 3→1, 4→2,
   *    6→4).
   *  - JPEG (ITU T.81 §B.2.2): SOI then marker segments, each
   *    FF xx + 2-byte big-endian length; the frame header SOF0/1/2
   *    (C0/C1/C2) carries precision, height, width, component count.
   *    Segment SKIPPING is the real work — APP0/COM/quant tables of
   *    arbitrary length sit before the SOF.
   *  - GIF (87a/89a): 6-byte signature then logical-screen width/height
   *    as 2-byte LITTLE-endian at offsets 6/8.
   * Returns None for anything unrecognized or truncated (never throws —
   * a corrupt blob in a 100 TB crawl must not fail the stage).
   */
  object HeaderDecoder {
    final case class Header(format: String, width: Int, height: Int,
                            channels: Int)

    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    private def le16(b: Array[Byte], i: Int): Int =
      ((b(i + 1) & 0xFF) << 8) | (b(i) & 0xFF)

    private val pngSig =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    def parse(b: Array[Byte]): Option[Header] = {
      if (b == null) None
      else if (b.length >= 26 && b.take(8).sameElements(pngSig) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R') {
        val channels = b(25) match {
          case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
          case _ => -1
        }
        if (channels < 0) None
        else Some(Header("png", be32(b, 16).toInt, be32(b, 20).toInt, channels))
      } else if (b.length >= 4 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
        // walk marker segments to the first SOF0/1/2
        var i = 2
        var out: Option[Header] = None
        var done = false
        while (!done && i + 3 < b.length) {
          if ((b(i) & 0xFF) != 0xFF) { done = true } // desynced — bail
          else {
            val marker = b(i + 1) & 0xFF
            // ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad
            // before a marker — consume one byte and re-read, rather than
            // treating 0xFF as a length-prefixed segment (which desyncs)
            if (marker == 0xFF) i += 1
            else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) i += 2
            else if (marker == 0xC0 || marker == 0xC1 || marker == 0xC2) {
              if (i + 9 < b.length)
                out = Some(Header("jpeg", be16(b, i + 7), be16(b, i + 5),
                  b(i + 9) & 0xFF))
              done = true
            } else { i += 2 + be16(b, i + 2) } // skip APPn/COM/DQT/…
          }
        }
        out
      } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
        Some(Header("gif", le16(b, 6), le16(b, 8), 3))
      } else None
    }
  }

  /** Output schema of [[decodeHeaders]]. */
  val headerSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  /**
   * Header-parse stage: the same per-partition batch iteration as
   * [[decodeFeatures]], emitting the REAL parsed (format, width, height,
   * channels) — nulls for unrecognized blobs. This is metadata
   * extraction a crawl pipeline runs on every image before deciding
   * what to decode fully; it reads ≤ a few hundred bytes per blob.
   */
  def decodeHeaders(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    // null blobs are KEPT (all-null metadata row) — the scaladoc contract
    // is "nulls for unrecognized blobs", and a pipeline joining back on
    // media_id must not silently lose null-blob media
    val rdd = media.select("media_id", "blob")
      .rdd.mapPartitions { it =>
        it.map { r =>
          HeaderDecoder.parse(r.getAs[Array[Byte]]("blob")) match {
            case Some(h) =>
              Row(r.getLong(0), h.format, h.width, h.height, h.channels)
            case None => Row(r.getLong(0), null, null, null, null)
          }
        }
      }
    spark.createDataFrame(rdd, headerSchema)
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

  /**
   * Planted image fixtures built with PURE column arithmetic (hex/
   * unhex/concat over binary — codegen'd, no UDF, no extra
   * mapPartitions): REAL minimal PNG / JPEG / GIF byte streams whose
   * header dimensions come from table columns (format cycles by
   * id % 3), so a SQL oracle can predict exactly what
   * [[decodeHeaders]] must parse back. The JPEG deliberately carries a
   * full APP0 segment before its SOF0 so the parser's marker-skipping
   * walk is exercised, not just a fixed offset.
   */
  def imageFixtures(rows: DataFrame, idCol: Column, w: Column,
                    h: Column): DataFrame = {
    def hexPad(c: Column, n: Int) = lpad(hex(c), n, "0")
    def be32(c: Column) = unhex(hexPad(c, 8))
    def be16(c: Column) = unhex(hexPad(c, 4))
    def le16(c: Column) = {
      val hx = hexPad(c, 4)
      unhex(concat(substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    // sig + IHDR(len,name) + w + h + depth8/colour6(RGBA)/comp/filter/
    // interlace + CRC placeholder
    val png = concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
      be32(w), be32(h), unhex(lit("080600000000AABBCCDD")))
    // SOI + APP0(len 16, JFIF payload) + SOF0(len 17, precision 8,
    // h, w, 3 components) + EOI
    val jpeg = concat(
      unhex(lit("FFD8FFE000104A46494600000000000000000000FFC0001108")),
      be16(h), be16(w), unhex(lit("03011100021100031100FFD9")))
    // GIF89a + little-endian screen w/h + packed/bg/aspect
    val gif = concat(unhex(lit("474946383961")), le16(w), le16(h),
      unhex(lit("000000")))
    val blob = when(idCol % 3 === 0, png)
      .when(idCol % 3 === 1, jpeg)
      .otherwise(gif)
    rows.select(idCol.cast("long").as("media_id"), blob.as("blob"),
      when(idCol % 3 === 0, "image/png")
        .when(idCol % 3 === 1, "image/jpeg")
        .otherwise("image/gif").as("mime"),
      length(blob).cast("long").as("n_bytes"))
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
