package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Session-scoped materialized tokenized view of the `documents` table:
 * one checkpointed `(doc_id, toks array<string>)` projection per
 * (session, sfDir), built on first use. Every token-consuming pipeline
 * (TF-IDF keywords, PMI collocations, …) reads THIS instead of
 * re-reading and re-tokenizing the parquet text — tokenization is the
 * dominant cost of those pipelines, and under a shared view the corpus
 * pays it once per session however many token queries run.
 *
 * Scale note: this is the "materialized view" trade — the cached
 * projection is corpus-sized (localCheckpoint = MEMORY_AND_DISK, so it
 * spills rather than OOMs). On a real cluster at 100 TB the same shape
 * is a tokenized parquet table written once and scanned by each
 * consumer; the session cache is the single-JVM equivalent.
 */
object TokenizedCorpus {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** RDD ids backing this session's live cached views. A harness that
   * sweeps leaked persistent RDDs between queries (graft.Bench) must
   * exclude these: a localCheckpoint cannot recompute after unpersist,
   * so sweeping them breaks every later consumer of the shared view. */
  def liveRddIds(spark: SparkSession): Set[Int] = {
    import scala.jdk.CollectionConverters._
    cache.asScala.collect { case ((s, _), df) if s eq spark =>
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      }
    }.flatten.toSet
  }

  /** The shared `(doc_id, toks)` view for one (session, sfDir). */
  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    // lazy eviction: a stopped session's entry can never be read again
    // but would otherwise pin the session AND its corpus-sized
    // checkpointed frame for the life of the JVM (test suites,
    // notebook restarts)
    cache.keySet.removeIf(
      (k: (SparkSession, String)) => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, sfDir),
      (key: (SparkSession, String)) =>
        graft.io.Sources.table(key._1, key._2, "documents")
          .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
          .localCheckpoint())
  }
}
