package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/**
 * Streaming ingestion dedup — the stream-path twin of
 * [[graft.dedup.Dedup.exactDedup]]: as documents/events arrive, drop
 * rows whose dedup key was already seen within the watermark horizon.
 *
 * Uses `dropDuplicatesWithinWatermark`, so state for a key is freed once
 * the watermark passes it — bounded state at unbounded input, which is
 * the property that makes the op viable on a 100 TB/day firehose (plain
 * streaming `dropDuplicates` keeps ALL keys forever). The trade-off is
 * the same as every watermarked op: a duplicate arriving later than the
 * horizon is re-admitted. Size the horizon to the source's real replay
 * window (e.g. at-least-once delivery retries arrive within minutes).
 */
object StreamingDedup {

  /** Drop rows duplicating `keys` within the `horizon` (event time from
    * `tsCol`, which must survive upstream projections to keep the
    * watermark attached). */
  def dedupStream(stream: DataFrame, keys: Seq[String], tsCol: String,
                  horizon: String = "1 hour"): DataFrame =
    stream.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Content-fingerprint variant for document streams: key = md5 of
    * whitespace-normalized lowercased text (exactDedup's key). */
  def dedupDocStream(stream: DataFrame, tsCol: String,
                     horizon: String = "1 hour",
                     textCol: String = "text"): DataFrame =
    dedupStream(
      stream.withColumn("_fp", TextAnalysis.fingerprint(col(textCol))),
      Seq("_fp"), tsCol, horizon).drop("_fp")
}
