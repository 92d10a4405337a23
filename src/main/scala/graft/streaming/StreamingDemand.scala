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

  /**
   * Run `body` with `spark.sql.shuffle.partitions` temporarily set to
   * `n` — the setting a stateful stream reads at query start. State-store
   * count (and the fixed per-micro-batch cost of opening/committing every
   * store) scales with it, so it must be sized to the KEYED-STATE volume,
   * not to the batch engine's scan parallelism: a handful of session/
   * window keys needs a handful of stores, while the batch default here
   * (32, and hundreds on a real cluster) pays ~4× micro-batch overhead
   * for nothing. Restores the previous value even on failure.
   */
  private[graft] def withStatePartitions[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }

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
   * Stream-static enrichment join: the event stream broadcast-joins a
   * static dimension (re-resolved per micro-batch — the standard
   * streaming enrichment pattern; the stream side never shuffles for the
   * join) and aggregates counts per dimension attribute. Driven to
   * completion like [[runToBatch]]; the oracle replays the equivalent
   * BATCH join+agg in SQL, so stream≡batch holds by hash, not assertion.
   */
  def runEnrichedToBatch(spark: SparkSession, dir: String,
                         dim: DataFrame, dimKey: String,
                         dimAttr: String): DataFrame = {
    val name = "stream_enrich_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    withStatePartitions(spark, 8) {
      // exact integer aggregates only: streaming rejects count(DISTINCT),
      // and a double sum would be micro-batch-order-dependent
      val q = stream
        .join(org.apache.spark.sql.functions.broadcast(dim),
          stream("user_id") === dim(dimKey))
        .groupBy(dimAttr)
        .agg(count(lit(1)).as("n_events"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy(dimAttr)
  }

  /**
   * Run the stream over a (finite) parquet path to completion and return
   * the materialized result: epoch-second window start per event type.
   * Output mode "complete" so late batches restate the full table.
   */
  def runToBatch(spark: SparkSession, dir: String): DataFrame = {
    val name = "stream_hourly_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withStatePartitions(spark, 8) {
      val q = hourlyCountsStream(spark, dir)
        .writeStream.outputMode("complete").format("memory").queryName(name)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .select(unix_timestamp(col("window.start")).as("hora_epoch"),
        col("event_type"), col("n"))
      .orderBy("hora_epoch", "event_type")
  }
}
