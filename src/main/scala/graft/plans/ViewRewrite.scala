package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/**
 * A registered materialized view the optimizer may answer from:
 * `viewPath` holds the parquet result of
 * `SELECT keyCol, count(*) AS countCol, sum(x) AS sumCols(x), …
 *    FROM basePath GROUP BY keyCol`.
 * The registration IS the freshness claim — whoever maintains the view
 * (e.g. the [[graft.lake.Versions]] incremental-view pipeline, q325)
 * registers the current version's physical directory and re-registers
 * after each refresh.
 */
final case class MatView(
    basePath: String,
    viewPath: String,
    keyCol: String,
    countCol: Option[String],
    sumCols: Map[String, String])

/**
 * MATERIALIZED-VIEW REWRITE — an optimizer [[Rule]] that answers a
 * matching aggregate over the BASE table from the maintained view
 * instead (the automatic MV-routing capability lakehouse engines
 * expose; public Spark extension point
 * `spark.experimental.extraOptimizations` / `injectOptimizerRule`).
 *
 * Matches exactly the shape the view precomputed — a single-key
 * [[Aggregate]] whose child scans the base parquet (optionally through
 * a pass-through attribute [[Project]]) and whose aggregate
 * expressions are the grouping key, `count(1)`, and `sum(col)` for
 * registered columns only; distinct aggregates, filters, expressions
 * over the key, or unregistered aggregate functions all disqualify the
 * plan and it is left untouched. The replacement projects the view's
 * columns UNDER THE ORIGINAL OUTPUT ExprIds, so any operators above
 * the aggregate keep resolving.
 *
 * At 100 TB this is the difference between re-scanning the fact table
 * and reading a |groups|-row parquet: the rewrite fires after the main
 * optimizer batches, costs one plan-tree pass, and composes with the
 * q325 incremental maintenance loop (refresh the view O(|delta|),
 * re-register, and every matching dashboard query is answered in
 * O(|groups|)).
 */
final case class ViewRewrite(spark: SparkSession, view: MatView)
    extends Rule[LogicalPlan] {

  private def scansBase(plan: LogicalPlan): Boolean = plan match {
    case lr: LogicalRelation => lr.relation match {
      case f: HadoopFsRelation =>
        f.location.rootPaths.exists(_.toString.contains(view.basePath))
      case _ => false
    }
    case Project(projList, child) =>
      projList.forall(_.isInstanceOf[AttributeReference]) && scansBase(child)
    case _ => false
  }

  /** The view column answering one aggregate-output expression, or
    * None if this expression disqualifies the rewrite. */
  private def viewColumnFor(e: NamedExpression,
                            key: AttributeReference): Option[String] = e match {
    case a: AttributeReference if a.exprId == key.exprId => Some(view.keyCol)
    case Alias(a: AttributeReference, _) if a.exprId == key.exprId =>
      Some(view.keyCol)
    case Alias(ae: AggregateExpression, _)
        if !ae.isDistinct && ae.filter.isEmpty =>
      ae.aggregateFunction match {
        case c: Count if c.children.forall(_.foldable) => view.countCol
        case s: Sum => s.child match {
          case a: AttributeReference => view.sumCols.get(a.name)
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case agg @ Aggregate(Seq(key: AttributeReference), aggExprs, child, _)
        if key.name == view.keyCol && scansBase(child) &&
          aggExprs.forall(e => viewColumnFor(e, key).isDefined) =>
      val viewPlan = spark.read.parquet(view.viewPath)
        .queryExecution.analyzed
      def viewAttr(name: String): Attribute =
        viewPlan.output.find(_.name == name).getOrElse(
          throw new IllegalStateException(
            s"registered view ${view.viewPath} has no column $name"))
      val projList = aggExprs.map { e =>
        val src = viewAttr(viewColumnFor(e, key).get)
        Alias(src, e.name)(exprId = e.exprId)
      }
      Project(projList, viewPlan)
  }
}

object ViewRewrite {
  /** Root paths of every file relation in the OPTIMIZED plan — the
    * structural "which table does this query actually scan" probe
    * (the logical plan's toString elides paths). */
  def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case f: HadoopFsRelation => f.location.rootPaths.map(_.toString)
        case _ => Seq.empty[String]
      }
    }.flatten

  /** Run `body` with the rule registered on the session's experimental
    * optimizer batch, restoring the previous registration after —
    * queries built and EXECUTED inside see matching aggregates answered
    * from the view. */
  def withRule[T](spark: SparkSession, view: MatView)(body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ ViewRewrite(spark, view)
    try body
    finally spark.experimental.extraOptimizations = prev
  }
}
