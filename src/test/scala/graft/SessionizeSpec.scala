package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.Sessionize

class SessionizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ev(user: Long, id: Long, t: String) = (id, t, user)

  private def fixture = Seq(
    // user 1: two sessions split by a 2h gap
    ev(1, 1, "2024-01-01 10:00:00"), ev(1, 2, "2024-01-01 10:10:00"),
    ev(1, 3, "2024-01-01 10:25:00"),
    ev(1, 4, "2024-01-01 13:00:00"), ev(1, 5, "2024-01-01 13:05:00"),
    // user 2: one session
    ev(2, 6, "2024-01-01 09:00:00"), ev(2, 7, "2024-01-01 09:29:00"))
    .toDF("event_id", "t", "user_id")
    .select(col("event_id"), col("user_id"), to_timestamp(col("t")).as("ts"))

  test("batch sessionization: gap splits, counts, bounds") {
    val got = Sessionize.sessionizeBatch(fixture, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got == Seq((1L, 1L, 3L), (1L, 2L, 2L), (2L, 1L, 2L)))
  }

  test("streaming sessionization matches the gap rule (closed sessions)") {
    // drive the stream from the batch fixture via a temp parquet dir
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString
    fixture.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(fixture.schema).parquet(dir)
    val out = Sessionize.sessionizeStream(stream, gapMinutes = 30)
    val name = "sess_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = out.writeStream.outputMode(OutputMode.Append).format("memory")
      .queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq.sorted
    // sessions closed before the final watermark: user1's first session
    // (watermark reaches 13:05-30min = 12:35 > 10:25); the open tails
    // stay in state — exactly the append-mode contract
    assert(rows.contains((1L, 3L)))
    // every emitted session respects the gap rule vs batch truth
    val batchTruth = Sessionize.sessionizeBatch(fixture, 30)
      .collect().map(r => (r.getLong(0), r.getLong(4))).toSeq
    rows.foreach(r => assert(batchTruth.contains(r)))
  }

  test("md5_prefix_long registered for SQL") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT md5_prefix_long('hello') AS v")
      .collect()(0).getLong(0)
    val viaCol = spark.range(1)
      .select(graft.ops.Exprs.md5Long(lit("hello")).as("v"))
      .collect()(0).getLong(0)
    assert(viaSql == viaCol)
  }
}
