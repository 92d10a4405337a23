package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming extension of the demand model (SURVEY.md §2.11:
 * the reference is batch-only; this is the stream path for the same
 * per-hour demand semantics — `readStream` → watermark → tumbling window
 * agg). Batch parquet drives the stream synchronously in tests/verify via
 * the memory sink + `processAllAvailable`.
 */
object StreamingDemand {

  /** events schema as Spark reads it with nanosAsLong (ts = raw nanos). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling 1-hour event-time counts with a 1-hour watermark.
    * `dir` is the sf directory; the glob filter selects the events table
    * (FileStreamSource requires a directory, not a file path). */
  def hourlyCountsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

  /**
   * Run the stream over a (finite) parquet path to completion and return
   * the materialized result: epoch-second window start per event type.
   * Output mode "complete" so late batches restate the full table.
   */
  def runToBatch(spark: SparkSession, dir: String): DataFrame = {
    val name = "stream_hourly_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = hourlyCountsStream(spark, dir)
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(unix_timestamp(col("window.start")).as("hora_epoch"),
        col("event_type"), col("n"))
      .orderBy("hora_epoch", "event_type")
  }
}
