package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.Md5PrefixLong

/**
 * Session extension (`--conf spark.sql.extensions=graft.GraftExtensions`)
 * exposing the engine's native expressions to SQL users. Kept minimal on
 * purpose: SURVEY.md §4 concluded no optimizer rules or planner
 * strategies are required — built-in Catalyst handles every rewrite this
 * workload needs — so the only injection point used is function
 * registration.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.md5PrefixLong)
  }
}

object GraftExtensions {
  private val md5PrefixLong = (
    FunctionIdentifier("md5_prefix_long"),
    new ExpressionInfo(classOf[Md5PrefixLong].getName, "md5_prefix_long"),
    (exprs: Seq[Expression]) => Md5PrefixLong(exprs.head))

  /** Imperative registration for an already-built session (tests,
    * notebooks). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix_long", exprs => Md5PrefixLong(exprs.head), "built-in")
}
