package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * EP2 — call-demand / staffing model (SURVEY.md §3,
 * app_calculo_necesidad_recepción_call_center.py:142-287, 435-463):
 * classify → filter → two-level aggregation → resource conversion →
 * capacity comparison against a staffed-hours spine.
 *
 * Constants from the reference (BASELINE.md): 14.08 calls/resource/hour
 * capacity, 3.0 calls per resource demand conversion.
 */
object Demand {

  val CallsPerResourceHour = 14.08
  val CallsPerResource = 3.0

  /**
   * Average demand per (weekday, hour) with resource needs:
   * count per (date,dow,hour) → avg per (dow,hour) → resources =
   * demand / 3.0 (app_calculo_necesidad_recepción_call_center.py:261).
   */
  def demandResources(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("fecha"),
        dayofweek(col("ts")).cast("long").as("dia"),
        hour(col("ts")).cast("long").as("hora"))
      .agg(count(lit(1)).as("n"))
      .groupBy("dia", "hora")
      .agg(avg("n").as("_avg"))
      .withColumn("avg_demand", round(col("_avg"), 4))
      .withColumn("recursos", round(col("_avg") / CallsPerResource, 4))
      .drop("_avg")
      .orderBy("dia", "hora")

  /**
   * Capacity comparison on an hour spine (SURVEY.md J4,
   * app_calculo_necesidad_recepción_call_center.py:435-463): demand per
   * hour (all weekdays averaged) left-joined onto hours 0-23, staffed
   * capacity = staff×14.08, deficit clamped at 0.
   */
  def capacityComparison(spark: SparkSession, events: DataFrame,
                         staffPerHour: Double): DataFrame = {
    val perHour = events
      .groupBy(to_date(col("ts")).as("fecha"), hour(col("ts")).cast("long").as("hora"))
      .agg(count(lit(1)).as("n"))
      .groupBy("hora")
      .agg(avg("n").as("_avg"))
    val spine = spark.range(24).select(col("id").as("hora"))
    Relational.spineJoin(spine, perHour, Seq("hora"), Seq())
      .withColumn("avg_demand", round(coalesce(col("_avg"), lit(0.0)), 4))
      .withColumn("capacity", lit(staffPerHour * CallsPerResourceHour))
      .withColumn("deficit",
        round(Exprs.clampNonNeg(coalesce(col("_avg"), lit(0.0)) - col("capacity")), 4))
      .drop("_avg")
      .orderBy("hora")
  }

  /**
   * EP1-style staffing queue model slice (SURVEY.md A6/A13,
   * app_calculador_recursos_modelo_atencion.py:275-297): per 5-min slot,
   * weighted arrivals → attention minutes (×2.5) → resources (÷1.72),
   * averaged across weekdays.
   */
  def queueModel(events: DataFrame): DataFrame =
    events
      .withColumn("slot", ((unix_timestamp(col("ts")) % 86400) / 300).cast("long") * 5)
      .groupBy(to_date(col("ts")).as("fecha"), col("slot"))
      .agg(count(lit(1)).as("n"))
      .groupBy("slot")
      .agg(avg("n").as("_avg"))
      .withColumn("atencion_min", round(col("_avg") * 2.5, 4))
      .withColumn("recursos", round(col("_avg") * 2.5 / 1.72, 4))
      .drop("_avg")
      .orderBy("slot")
}
