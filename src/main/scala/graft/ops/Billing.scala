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

  /** A15 — daily ingreso/billing counters per group and class.
   * UNORDERED: ordering belongs at the sink — a builder-level sort is a
   * wasted exchange the moment a consumer (periodRollup) re-aggregates. */
  def dailyCounts(spark: SparkSession, orders: DataFrame,
                  lineitem: DataFrame): DataFrame =
    classified(spark, orders, lineitem)
      .groupBy(col("grupo"), col("ingreso").as("fecha"), col("clase"))
      .agg(count(lit(1)).as("n"))

  /** Weekly/monthly rollup of the daily counts
   * (agrupar_por_periodo, indicador-modelo-vs-facturacion.py:605-635).
   * Unordered, like [[dailyCounts]]. */
  def periodRollup(daily: DataFrame, period: String): DataFrame =
    daily
      .groupBy(col("grupo"),
        date_trunc(period, col("fecha")).cast("date").as("periodo"), col("clase"))
      .agg(sum("n").as("n"))

  /** Novedades counters per group (procesar_hoja_novedades,
   * indicador-modelo-vs-facturacion.py:384-407): here a "novedad" is a
   * RETURNED lineitem (l_returnflag = 'R') of the group's orders dated
   * inside the analysis window, and the "bloqueante" subset is its
   * F-linestatus rows — the returns log standing in for the reference's
   * NOVEDADES sheet. One shuffle on the order key; the cutoff config is
   * the same broadcast dimension the classifier uses. */
  def novedadesCounts(spark: SparkSession, orders: DataFrame,
                      lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("fecha"),
        col("l_linestatus"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority").as("grupo")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cutoffDim(spark)), Seq("grupo"))
      .filter(col("fecha") >= col("cutoff"))
      .groupBy("grupo")
      .agg(count(lit(1)).as("novedades"),
        count(when(col("l_linestatus") === "F", 1)).as("bloqueantes"))

  /** Full per-group indicator table behind the executive narrative
   * (calcular_resumen_ejecutivo, indicador-modelo-vs-facturacion.py:
   * 554-597): ingresos, facturado total (modelo + fuera), novedades and
   * bloqueantes counts, plus the three 1-decimal percentage indicators
   * the narrative grades against the >90% facturación / <5% novedades
   * objectives. Zero-ingreso groups are excluded (the reference's
   * "sedes excluidas" rule, :1162-1166). */
  def fullExecutiveSummary(spark: SparkSession, orders: DataFrame,
                           lineitem: DataFrame): DataFrame =
    classified(spark, orders, lineitem)
      .groupBy("grupo")
      .agg(count(lit(1)).as("ingresos"),
        count(when(col("clase").isin("modelo", "fuera"), 1)).as("facturado"))
      .join(novedadesCounts(spark, orders, lineitem), Seq("grupo"), "left")
      .select(col("grupo"), col("ingresos"), col("facturado"),
        coalesce(col("novedades"), lit(0L)).as("novedades"),
        coalesce(col("bloqueantes"), lit(0L)).as("bloqueantes"))
      // structurally dead with ingresos = count(*) (every existing group
      // has >= 1), kept because the reference applies the same guard and
      // the oracle mirrors it — it becomes load-bearing if ingresos ever
      // changes to a sum that can be zero
      .filter(col("ingresos") > 0)
      .withColumn("pct_facturado",
        round(col("facturado") / col("ingresos").cast("double") * 100, 1))
      .withColumn("pct_novedades",
        round(col("novedades") / col("ingresos").cast("double") * 100, 1))
      .withColumn("pct_bloqueantes",
        round(col("bloqueantes") / col("ingresos").cast("double") * 100, 1))

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
