package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality profiling: one row of audit stats per column — null
 * count, blank count (string columns), exact distinct count — the
 * engine-side analog of the reference's load-time dataframe inspection
 * (SURVEY.md §1.3 schema tolerance; the pandas `df.info()`/`nunique()`
 * habit its apps open with).
 *
 * Shape at scale: ONE pass over the data computing every per-column
 * aggregate in a single `agg` (no per-column scans), then a bounded
 * unpivot of the 1×(3·ncols) result row — columns × 3 values live on the
 * driver, never the data. `count(DISTINCT col)` plans a per-column
 * partial-distinct expand; for very wide tables swap in
 * `approx_count_distinct` via `exact = false`.
 */
object Profile {

  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val total = count(lit(1)).as("_total")
    val isStr = df.schema.fields.map(f =>
      f.name -> (f.dataType == org.apache.spark.sql.types.StringType)).toMap
    // index-based aliases + escaped label literals: raw column names with
    // spaces/dots/quotes would otherwise break the generated stack() SQL
    val aggs = df.columns.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(when(col(c).isNull, 1)).as(s"__null_$i"),
        (if (isStr(c)) count(when(trim(col(c)) === "", 1)) else lit(0L))
          .as(s"__blank_$i"),
        (if (exact) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"__dist_$i"))
    }
    def lbl(c: String): String =
      "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val one = df.agg(total, aggs.toIndexedSeq: _*)
    one.selectExpr(
      s"stack(${df.columns.length}, ${df.columns.zipWithIndex.map { case (c, i) =>
        s"${lbl(c)}, __null_$i, __blank_$i, __dist_$i" }.mkString(", ")}) " +
        "AS (column, n_null, n_blank, n_distinct)",
      "_total AS n_rows")
      .select("column", "n_null", "n_blank", "n_distinct", "n_rows")
  }
}
