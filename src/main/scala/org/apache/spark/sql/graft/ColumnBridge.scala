package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge: `ExpressionUtils` is `private[sql]` in
  * Spark 4, so this one-file shim lives under the `org.apache.spark.sql`
  * namespace — the standard pattern for libraries that register custom
  * Catalyst expressions against the classic API. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
