package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * EP — appointment-confirmation generator (SURVEY.md §0,
 * app_confirmaciones.py:13): clean phones, dedup to the first service per
 * patient/day, join the location dimension, and build the pipe-joined
 * WhatsApp "VARIABLE" message string
 * (app_confirmaciones.py:198-201, 259-297).
 *
 * Composition: normalizePhone (§2.12) → firstPerKey W1 → broadcast dim
 * join J1 → Spanish date rendering → concat_ws. Everything codegen'd; the
 * only shuffle is the W1 window on the patient key.
 */
object Confirm {

  /** Pipe-joined confirmation message (the reference's VARIABLE column,
   * app_confirmaciones.py:198-201). */
  def variableMessage(nombre: Column, fecha: Column, grupo: Column,
                      telefono: Column): Column =
    concat_ws("|", nombre, Exprs.formatoFechaEspanol(fecha), grupo, telefono)

  /**
   * Confirmation table over the harness schema: customer = patient,
   * order priority = sede/unit, order date = appointment day. Keeps the
   * FIRST order (by orderkey) per patient/day, synthesizes a mobile
   * number deterministically, normalizes it, renders the message.
   */
  def confirmations(orders: DataFrame, customer: DataFrame): DataFrame = {
    val first = Windows.firstPerKey(
      orders.withColumn("fecha", to_date(col("o_orderdate"))),
      Seq("o_custkey", "fecha"), Seq(col("o_orderkey").asc))
    val phone = concat(lit("30012"),
      lpad((col("c_custkey") % 100000).cast("string"), 5, "0"))
    first
      .join(customer, col("o_custkey") === col("c_custkey"))
      .withColumn("telefono", Exprs.normalizePhone(phone))
      .withColumn("variable",
        variableMessage(col("c_name"), col("fecha"), col("o_orderpriority"),
          col("telefono")))
      .select(col("c_custkey"), col("fecha"), col("o_orderkey"),
        col("telefono"), col("variable"))
  }
}
