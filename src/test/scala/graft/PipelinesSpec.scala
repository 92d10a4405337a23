package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.Billing
import graft.ml.Forecast
import graft.multimodal.Multimodal
import graft.streaming.StreamingDemand

class PipelinesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("billing classification: hand-built fixture (A15 semantics)") {
    // cutoff for 1-URGENT is 1994-01-01
    val orders = Seq(
      (1L, "1-URGENT", "1994-05-01"), // billed after cutoff, in  => modelo
      (2L, "1-URGENT", "1993-05-01"), // ingreso before cutoff    => fuera
      (3L, "1-URGENT", "1994-07-01"), // never billed             => pendiente
      (4L, "1-URGENT", "1993-02-01")  // billed before cutoff     => excluido
    ).toDF("o_orderkey", "o_orderpriority", "d")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_timestamp(col("d")).as("o_orderdate"))
    val lineitem = Seq(
      (1L, "1994-06-01"), (2L, "1994-02-01"), (4L, "1993-03-01"))
      .toDF("l_orderkey", "d")
      .select(col("l_orderkey"), to_timestamp(col("d")).as("l_shipdate"))
    val got = Billing.classified(spark, orders, lineitem)
      .select("o_orderkey", "clase").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "modelo", 2L -> "fuera", 3L -> "pendiente",
      4L -> "excluido"))
  }

  test("billing summary: classes partition the orders") {
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val s = Billing.executiveSummary(spark, orders, li).collect()
    s.foreach { r =>
      val total = r.getAs[Long]("ingresos")
      val parts = r.getAs[Long]("modelo") + r.getAs[Long]("fuera") +
        r.getAs[Long]("pendiente")
      assert(parts <= total)
      val pct = r.getAs[Double]("pct_modelo")
      assert(pct >= 0.0 && pct <= 100.0)
    }
  }

  test("forecast: trains, selects a model, grid is 24x7 and clamped") {
    val events = graft.io.Sources.table(spark, sf001, "events")
    val grid = Forecast.forecastGrid(spark, events).collect()
    assert(grid.length == 168)
    assert(grid.forall(_.getAs[Double]("pred") >= 0.0))
    val r2 = grid.head.getAs[Double]("r2")
    assert(!r2.isNaN)
    assert(Set("linear_regression", "gbt").contains(grid.head.getAs[String]("model")))
  }

  test("multimodal: stub decode plumbing end-to-end") {
    val docs = Seq((1L, "hello world"), (2L, "a much longer text body here"))
      .toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs)
    assert(media.columns.toSeq ==
      Seq("media_id", "blob", "mime", "n_bytes"))
    val dec = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(dec(1L).getAs[Int]("width") == 16 + 11 % 64)
    assert(dec(1L).getAs[Double]("mean_byte") > 0)
    // determinism
    val dec2 = Multimodal.decodeFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("mean_byte")).toMap
    assert(dec.map { case (k, v) => k -> v.getAs[Double]("mean_byte") } == dec2)
    val resized = Multimodal.planResize(Multimodal.decodeFeatures(media), 16)
      .collect()
    resized.foreach { r =>
      assert(r.getAs[Int]("out_w") <= 16 && r.getAs[Int]("out_h") <= 16)
    }
    assert(Multimodal.planFrameSample(media, nFrames = 10, everyK = 3)
      .count() == 2 * 4) // frames 0,3,6,9 per media
  }

  test("multimodal: HeaderDecoder truth table — real headers, corrupt bytes, truncation") {
    import Multimodal.HeaderDecoder
    // real headers round-trip through the SQL fixture builder
    val fx = Multimodal.imageFixtures(
      Seq((0L, 300, 7), (1L, 640, 480), (2L, 65535, 1)).toDF("id", "w", "h"),
      col("id"), col("w"), col("h"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob")).toMap
    assert(HeaderDecoder.parse(fx(0L)).contains(
      HeaderDecoder.Header("png", 300, 7, 4)))
    assert(HeaderDecoder.parse(fx(1L)).contains(
      HeaderDecoder.Header("jpeg", 640, 480, 3)))
    assert(HeaderDecoder.parse(fx(2L)).contains(
      HeaderDecoder.Header("gif", 65535, 1, 3)))
    // a 100 TB crawl's garbage must return None, never throw
    assert(HeaderDecoder.parse(null).isEmpty)
    assert(HeaderDecoder.parse(Array.emptyByteArray).isEmpty)
    assert(HeaderDecoder.parse("plain text".getBytes("UTF-8")).isEmpty)
    assert(HeaderDecoder.parse(fx(0L).take(20)).isEmpty) // truncated PNG
    val noSof = Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte) // SOI+EOI only
    assert(HeaderDecoder.parse(noSof).isEmpty)
    val desynced = Array(0xFF, 0xD8, 0x00, 0x00, 0x00).map(_.toByte)
    assert(HeaderDecoder.parse(desynced).isEmpty)
    // truncated mid-segment: APP0 length points past the buffer
    assert(HeaderDecoder.parse(fx(1L).take(10)).isEmpty)
    // unrecognized blobs still take the deterministic stub path
    val d = Multimodal.StubDecoder.decode("hello world".getBytes("UTF-8"))
    assert(d.width == 16 + 11 % 64 && d.channels == 3)
    // recognized blobs take the REAL header path inside decodeFeatures
    val real = Multimodal.StubDecoder.decode(fx(1L))
    assert(real.width == 640 && real.height == 480 && real.channels == 3)
  }

  test("multimodal: WavHeader truth table — RIFF walk, alignment, garbage") {
    import Multimodal.WavHeader
    // fixture round-trip: 44100 Hz stereo 16-bit, 88200 data bytes
    // (byteRate 176400 → exactly 500 ms)
    val fx = Multimodal.wavFixtures(
      Seq((0L, 44100, 2, 16, 88200), (1L, 8000, 1, 8, 12345))
        .toDF("id", "sr", "ch", "bits", "db"),
      col("id"), col("sr"), col("ch"), col("bits"), col("db"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob")).toMap
    assert(WavHeader.parse(fx(0L)).contains(WavHeader.Wav(2, 44100, 16, 500)))
    // 12345 bytes at 8000 B/s → 1543.125 ms, floored
    assert(WavHeader.parse(fx(1L)).contains(WavHeader.Wav(1, 8000, 8, 1543)))
    // the LIST junk chunk has ODD size 7: a parser without the RIFF
    // word-alignment pad byte desyncs and never finds fmt — this pins it
    assert(new String(fx(0L), 12, 4, "US-ASCII") == "LIST")
    // garbage returns None, never throws
    assert(WavHeader.parse(null).isEmpty)
    assert(WavHeader.parse(Array.emptyByteArray).isEmpty)
    assert(WavHeader.parse("RIFFxxxxAVI LIST".getBytes("US-ASCII")).isEmpty)
    assert(WavHeader.parse("plain text that is long enough".getBytes("UTF-8")).isEmpty)
    assert(WavHeader.parse(fx(0L).take(20)).isEmpty) // truncated before fmt
    assert(WavHeader.parse(fx(0L).dropRight(12)).isEmpty) // fmt but no data chunk
    // decodeWavHeaders keeps unrecognized rows as all-null metadata
    val media = Multimodal.wavFixtures(
      Seq((7L, 16000, 1, 16, 1000)).toDF("id", "sr", "ch", "bits", "db"),
      col("id"), col("sr"), col("ch"), col("bits"), col("db"))
      .unionAll(Seq((8L, "nope")).toDF("id", "t")
        .select(col("id"), encode(col("t"), "utf-8").as("blob"),
          lit("text/plain").as("mime"), lit(4L).as("n_bytes")))
    val out = Multimodal.decodeWavHeaders(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(7L).getAs[Int]("channels") == 1 &&
      out(7L).getAs[Int]("sample_rate") == 16000)
    assert(out(8L).isNullAt(1) && out(8L).isNullAt(4))
  }

  test("multimodal: pcm8Stats hand-checked waveform, refusals") {
    import Multimodal.{pcm8Stats, wavFixturesPcm}
    // hand waveform: 200,200,50,50,255 (peak 127, one clip, two
    // crossings around 128, sumAbs = 72+72+78+78+127 = 427 → mean 85400)
    val payload = Array(200, 200, 50, 50, 255).map(_.toByte)
    val fx = wavFixturesPcm(
      Seq((0L, 8000, 1, 8)).toDF("id", "sr", "ch", "bits"),
      col("id"), col("sr"), col("ch"), col("bits"),
      lit(payload))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob")).toMap
    assert(pcm8Stats(fx(0L)).contains((5L, 127, 200000L, 2L, 85400L)))
    // WavHeader still parses the same blob (both walks share the layout)
    assert(Multimodal.WavHeader.parse(fx(0L))
      .contains(Multimodal.WavHeader.Wav(1, 8000, 8, 0L))) // 5B/8000Bps → 0ms
    // refusals: 16-bit declared, truncated payload, garbage
    val fx16 = wavFixturesPcm(
      Seq((1L, 8000, 1, 16)).toDF("id", "sr", "ch", "bits"),
      col("id"), col("sr"), col("ch"), col("bits"), lit(payload))
      .collect().head.getAs[Array[Byte]]("blob")
    assert(pcm8Stats(fx16).isEmpty) // declared 16-bit: refuse, not misread
    assert(pcm8Stats(fx(0L).dropRight(2)).isEmpty) // data size > payload
    assert(pcm8Stats(null).isEmpty)
    assert(pcm8Stats("RIFFxxxxWAVEjunk".getBytes("US-ASCII")).isEmpty)
  }

  test("multimodal: Mp4Header box walk truth table") {
    import Multimodal.Mp4Header
    val fx = Multimodal.mp4Fixtures(
      Seq((0L, 1000, 2500), (1L, 90000, 45)).toDF("id", "ts", "dur"),
      col("id"), col("ts"), col("dur"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("blob")).toMap
    assert(Mp4Header.parse(fx(0L)).contains(Mp4Header.Mp4(1000, 2500, 2500)))
    assert(Mp4Header.parse(fx(1L)).contains(Mp4Header.Mp4(90000, 45, 0)))
    // structure sanity: ftyp first, free junk before moov, iods before mvhd
    assert(new String(fx(0L), 4, 4, "US-ASCII") == "ftyp")
    assert(new String(fx(0L), 20, 4, "US-ASCII") == "free")
    // refusals: no ftyp lead, malformed box size, truncation, garbage
    assert(Mp4Header.parse(null).isEmpty)
    assert(Mp4Header.parse(fx(0L).take(30)).isEmpty) // moov truncated away
    assert(Mp4Header.parse("plain text long enough to walk".getBytes).isEmpty)
    val badSize = fx(0L).clone()
    badSize(0) = 0; badSize(1) = 0; badSize(2) = 0; badSize(3) = 1 // size 1 < 8
    assert(Mp4Header.parse(badSize).isEmpty)
  }

  test("streaming hourly counts equal the batch aggregation") {
    val streamed = StreamingDemand.runToBatch(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.io.Sources.table(spark, sf001, "events")
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hora_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }
}
