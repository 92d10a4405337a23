package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One registered engine query: a Spark plan builder plus (when
 * SQL-expressible) the equivalent DuckDB oracle SQL the driver
 * hash-compares against. Column names/aliases MUST match between the two
 * (the compare sorts columns by name before hashing).
 */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  /** localCheckpoint the RESULT (so it outlives the query's scratch
    * files), then unpersist the listed INTERMEDIATE checkpoints — a
    * lifecycle query that checkpoints mid-fixture frames and leaves
    * them to the ContextCleaner leaks blocks across a several-hundred-
    * query marathon (the slow-creep class the round-10/11 work
    * flagged). Call this as the query's last expression. */
  def sealResult(out: DataFrame, intermediates: DataFrame*): DataFrame = {
    val r = out.localCheckpoint()
    intermediates.foreach { df =>
      try { df.unpersist(); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
    r
  }
}
