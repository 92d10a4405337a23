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
}
