package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Ordered-stage funnel and cohort-retention analytics over an event
 * stream — the product-analytics pair of the demand operators. Both are
 * single-shuffle plans: every window/aggregate keys on the user, so the
 * event table shuffles once however many stages or weeks are asked for.
 */
object Funnel {

  /**
   * Ordered funnel entry times: stage k's entry is the user's earliest
   * `stages(k)` event at-or-after their stage k-1 entry (stage 0 is the
   * unconditional earliest). Adds columns f0..f(n-1); a null fK means
   * the user never reached stage K. The chained `min(when(...))`
   * windows all share the user partitioning — one exchange, n window
   * passes over sorted runs.
   */
  def stageTimes(events: DataFrame, userCol: String, timeCol: String,
                 typeCol: String, stages: Seq[String]): DataFrame = {
    val w = Window.partitionBy(userCol)
    stages.zipWithIndex.foldLeft(events) { case (df, (st, i)) =>
      val gate =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(timeCol) >= col(s"f${i - 1}")
      df.withColumn(s"f$i", min(when(gate, col(timeCol))).over(w))
    }
  }

  /**
   * Weekly cohort retention: users are cohorted by the week of their
   * first event; `n_users` counts the cohort's users active in week
   * `cohort + week_offset`. JOIN-FREE: the cohort week is a window-min
   * over the distinct (user, week) activity table (one user-keyed
   * exchange, pinned in PlanQualitySpec) — the cohort matrix itself is
   * bounded by weeks², not events.
   */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxWeeks: Int): DataFrame = {
    // ONE scan of events: the distinct (user, week) table is computed
    // once (map-side partial distinct collapses the event volume), and
    // the cohort week is a window-min over it — no second events scan,
    // no join, exactly one user-keyed exchange in the whole plan
    // (pinned in PlanQualitySpec)
    val wk = events.select(col(userCol),
      date_trunc("week", col(tsCol)).as("wk")).distinct()
    val w = Window.partitionBy(userCol)
    wk.withColumn("cohort", min("wk").over(w))
      // whole-day difference, not epoch seconds: DST-shifted week
      // boundaries are 604800±3600 s apart, which truncates to the wrong
      // offset in non-UTC sessions — calendar-day arithmetic is tz-proof
      .withColumn("week_offset",
        (datediff(to_date(col("wk")), to_date(col("cohort"))) / 7)
          .cast("long"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
