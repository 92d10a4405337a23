package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // event 1 delivered three times (at-least-once retries), event 2 twice
    (1L, "2024-01-01 10:00:00", "a"), (1L, "2024-01-01 10:00:05", "a"),
    (1L, "2024-01-01 10:01:00", "a"),
    (2L, "2024-01-01 10:02:00", "b"), (2L, "2024-01-01 10:02:30", "b"),
    (3L, "2024-01-01 10:03:00", "c"))
    .toDF("event_id", "t", "payload")
    .select(col("event_id"), to_timestamp(col("t")).as("ts"), col("payload"))

  private def runStream(df: org.apache.spark.sql.DataFrame): Array[org.apache.spark.sql.Row] = {
    val name = "dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).collect()
  }

  test("streaming dedup drops within-horizon duplicates, matches batch truth") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    fixture.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(fixture.schema).parquet(dir)
    val rows = runStream(StreamingDedup.dedupStream(stream, Seq("event_id"), "ts"))
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    // batch truth: same key set survives a batch dropDuplicates
    val batch = fixture.dropDuplicates("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == batch.toSeq)
  }

  test("document-stream fingerprint dedup collapses whitespace-equivalent texts") {
    val docs = Seq(
      (10L, "2024-01-01 09:00:00", "Hello   World"),
      (11L, "2024-01-01 09:00:10", "hello world"),   // same fingerprint as 10
      (12L, "2024-01-01 09:01:00", "different text"))
      .toDF("doc_id", "t", "text")
      .select(col("doc_id"), to_timestamp(col("t")).as("ts"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup2").toString
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val rows = runStream(StreamingDedup.dedupDocStream(stream, "ts"))
    // exactly one of {10, 11} plus 12 survives
    val ids = rows.map(_.getLong(0)).toSet
    assert(ids.size == 2 && ids.contains(12L) && (ids.contains(10L) || ids.contains(11L)))
    // the fingerprint helper column does not leak into the output schema
    assert(!rows.head.schema.fieldNames.contains("_fp"))
  }
}
