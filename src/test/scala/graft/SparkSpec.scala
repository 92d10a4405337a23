package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for all suites (one JVM-wide session via
  * getOrCreate; suites must not stop() it). */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf001 = "/root/testdata/sf0.001"
}
