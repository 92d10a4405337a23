package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * EP3 — admissions-vs-billing indicator (SURVEY.md §3,
 * indicador-modelo-vs-facturacion.py:503-546): per group ("sede" → here
 * the order's priority class) and per day, classify each order as
 *  - "modelo":  ingreso ≥ cutoff AND factura ≥ cutoff       (line 520)
 *  - "fuera":   ingreso < cutoff AND factura ≥ cutoff        (line 536)
 *  - "pendiente": not yet billed (no lineitem shipped)
 * where ingreso = order date and factura = FIRST ship date of the
 * order's lineitems; plus daily→periodic rollups and percent summary.
 *
 * Scale notes: the ingreso↔factura pairing is a groupBy(orderkey) min —
 * one shuffle on the natural join key; the per-group cutoff config is a
 * broadcast dimension (J8-style theta join against config constants).
 */
object Billing {

  /** Per-group analysis-start cutoffs (the reference's SEDES config,
   * indicador-modelo-vs-facturacion.py:35-71). */
  val defaultCutoffs: Seq[(String, String)] = Seq(
    "1-URGENT" -> "1994-01-01",
    "2-HIGH" -> "1995-01-01",
    "3-MEDIUM" -> "1996-01-01",
    "4-NOT SPECIFIED" -> "1994-06-01",
    "5-LOW" -> "1997-01-01")

  def cutoffDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    defaultCutoffs.toDF("grupo", "cutoff_str")
      .select(col("grupo"), to_date(col("cutoff_str")).as("cutoff"))
  }

  /** Orders with ingreso (order date) + factura (first lineitem ship
   * date, null = pendiente) + classification vs the group cutoff. */
  def classified(spark: SparkSession, orders: DataFrame,
                 lineitem: DataFrame): DataFrame = {
    val firstShip = lineitem
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("factura"))
    orders
      .select(col("o_orderkey"), col("o_orderpriority").as("grupo"),
        to_date(col("o_orderdate")).as("ingreso"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"), "left")
      .drop("l_orderkey")
      .join(broadcast(cutoffDim(spark)), Seq("grupo"))
      .withColumn("clase",
        when(col("factura").isNull, "pendiente")
          .when(col("ingreso") >= col("cutoff") && col("factura") >= col("cutoff"), "modelo")
          .when(col("ingreso") < col("cutoff") && col("factura") >= col("cutoff"), "fuera")
          .otherwise("excluido"))
  }

  /** A15 — daily ingreso/billing counters per group and class. */
  def dailyCounts(spark: SparkSession, orders: DataFrame,
                  lineitem: DataFrame): DataFrame =
    classified(spark, orders, lineitem)
      .groupBy(col("grupo"), col("ingreso").as("fecha"), col("clase"))
      .agg(count(lit(1)).as("n"))
      .orderBy("grupo", "fecha", "clase")

  /** Weekly/monthly rollup of the daily counts
   * (agrupar_por_periodo, indicador-modelo-vs-facturacion.py:605-635). */
  def periodRollup(daily: DataFrame, period: String): DataFrame =
    daily
      .groupBy(col("grupo"),
        date_trunc(period, col("fecha")).cast("date").as("periodo"), col("clase"))
      .agg(sum("n").as("n"))
      .orderBy("grupo", "periodo", "clase")

  /** Executive summary per group: totals + modelo/fuera percentages vs
   * the 90%/5% objectives (calcular_resumen_ejecutivo,
   * indicador-modelo-vs-facturacion.py:554-597). */
  def executiveSummary(spark: SparkSession, orders: DataFrame,
                       lineitem: DataFrame): DataFrame = {
    classified(spark, orders, lineitem)
      .groupBy("grupo")
      .agg(
        count(lit(1)).as("ingresos"),
        count(when(col("clase") === "modelo", 1)).as("modelo"),
        count(when(col("clase") === "fuera", 1)).as("fuera"),
        count(when(col("clase") === "pendiente", 1)).as("pendiente"))
      .withColumn("pct_modelo",
        round(col("modelo") / col("ingresos").cast("double") * 100, 4))
      .withColumn("cumple_objetivo", col("pct_modelo") > 90.0)
      .orderBy("grupo")
  }
}
