package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Streaming count-min sketch: each micro-batch's cell counts fold into
 * the accumulated sketch by cell-wise ADDITION — the count-min merge is
 * a plain monoid, so the final sketch is independent of batch
 * boundaries and arrival order, and hash-identical to the one-shot
 * batch build ([[graft.sketch.Sketches.countMinBuild]]). State is the
 * ≤ depth×width cell table itself (localCheckpointed per batch), never
 * the key universe — the live heavy-hitter dashboard shape.
 */
object StreamingSketch {

  private val stagedSchema = StructType(Seq(StructField("user_id", LongType)))

  /** Stage the event keys into `nFiles` parquet files, stream them back
    * one file per micro-batch, and fold each batch's partial sketch into
    * the running cell table. Returns the final (d, pos, c) sketch. */
  def runCountMinToBatch(spark: SparkSession, dir: String,
                         depth: Int = 3, width: Int = 1024,
                         nFiles: Int = 4): DataFrame = {
    val stage = graft.io.Sources.scratchDir("graft_cms")
    graft.io.Sources.table(spark, dir, "events")
      .select(col("user_id"))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(stage)

    @volatile var target: DataFrame = null
    val q = spark.readStream
      .schema(stagedSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = graft.sketch.Sketches
          .countMinBuild(batch, col("user_id"), depth, width)
        target = (if (target == null) delta
                  else target.unionByName(delta)
                    .groupBy("d", "pos").agg(sum("c").as("c")))
          .localCheckpoint()
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    target
  }

  /** Streaming KMV distinct sketch: each micro-batch's bottom-`k`
    * distinct-hash set folds into the running sketch by
    * union → distinct → bottom-k. Min-k over a union equals min-k over
    * per-part min-k's (set algebra, no counting), so unlike count-min
    * this monoid is EXACT: the final k hashes are identical to the
    * one-shot batch build at any batch boundary or arrival order.
    * State between merges is ≤ 2k hashes. Returns the k-row hash
    * table (h). */
  def runKmvToBatch(spark: SparkSession, dir: String, k: Int = 64,
                    nFiles: Int = 4): DataFrame = {
    val stage = graft.io.Sources.scratchDir("graft_kmv")
    graft.io.Sources.table(spark, dir, "events")
      .select(col("user_id"))
      .repartition(nFiles)
      .write.mode("overwrite").parquet(stage)

    @volatile var target: DataFrame = null
    val q = spark.readStream
      .schema(stagedSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = batch
          .select(graft.ops.Exprs.md5Long(col("user_id")).as("h"))
          .distinct().orderBy(col("h").asc).limit(k)
        target = (if (target == null) delta
                  else target.unionByName(delta).distinct()
                    .orderBy(col("h").asc).limit(k))
          .localCheckpoint()
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    target
  }
}
