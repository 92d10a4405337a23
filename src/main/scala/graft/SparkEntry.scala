package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every registered query, in declaration order. */
  def registry: Seq[Q] =
    CoreQueries.all ++ TextQueries.all ++ PipelineQueries.all ++
      ExtraQueries.all ++ CurationQueries.all ++ ScaleQueries.all ++
      LakeQueries.all ++ AnalyticsQueries.all ++ OlapQueries.all ++
      SketchQueries.all ++ StatsQueries.all ++ CorpusQueries.all ++
      MiningQueries.all ++ LinkQueries.all ++ TpchQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Slice-0 demand query (SURVEY.md §7.2): avg hourly event demand per
    * weekday — scan → derive → two-level agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q09DemandByHour.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
