package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Window-function-shaped operators the reference hand-rolls with sorts,
 * drop_duplicates and iterrows loops (SURVEY.md §2.5).
 *
 * All windows here are keyed (`partitionBy`) — they shuffle once on the
 * partition key and scale linearly with executors; none uses a global
 * (unpartitioned) window over fact-sized data.
 */
object Windows {

  /**
   * W1 — first-row-per-group, keep-first-by-order dedup
   * (app_confirmaciones.py:259-297: first service of a patient/sede/day,
   * ordered by time). `row_number() === 1` over an explicit ordering —
   * NOT `dropDuplicates`, whose kept row is arbitrary (§7.4 risk 7).
   */
  def firstPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /**
   * W3 — lag/gap-to-previous-row with carry-forward
   * (app_indicadores_modelo_atencion.py:1110-1182): per `partKey` ordered
   * by `orderCol`, wait = current arrival − last non-null previous
   * finalization. The reference updates its carry-forward variable even on
   * rows excluded from emission (SURVEY.md §7.4 risk 2), so the window runs
   * over ALL rows and `emitFilter` applies only to the output.
   *
   * carry-forward = last(finalization, ignoreNulls=true) over
   * rowsBetween(unboundedPreceding, -1).
   */
  def lagGapMinutes(df: DataFrame, partKey: Seq[Column], orderCol: Column,
                    arrival: Column, finalization: Column,
                    emitFilter: Column = lit(true),
                    sameDayOnly: Boolean = true,
                    outCol: String = "espera_min"): DataFrame = {
    val w = Window.partitionBy(partKey: _*).orderBy(orderCol.asc)
    val prevW = w.rowsBetween(Window.unboundedPreceding, -1)
    val prevFin = last(finalization, ignoreNulls = true).over(prevW)
    // the cross-day guard must compare against the date of the CARRIED
    // finalization (the row the wait is measured from), not the previous
    // arrival: with null-finalization rows in between, the two differ —
    // a prev-arrival test both emits stale cross-day waits (carry from
    // yesterday, prev arrival today) and suppresses genuine same-day
    // gaps (prev arrival yesterday 23:50, its finalization today)
    val sameDay =
      if (sameDayOnly) to_date(arrival) === to_date(prevFin)
      else lit(true)
    df.withColumn(outCol,
      when(prevFin.isNotNull && sameDay && emitFilter,
        floor((unix_timestamp(arrival) - unix_timestamp(prevFin)) / 60))
        .otherwise(lit(null)))
  }

  /**
   * D1 — balanced seeded partition per group (app.py:49-89): per `group`,
   * order ids by a deterministic seeded hash (the Spark-reproducible
   * analogue of Python's `random.shuffle(seed=42)`, SURVEY.md §7.4 risk 1)
   * and deal them into `n` near-equal chunks with `ntile`.
   *
   * The hash is md5-based so a SQL oracle can replay it exactly. The
   * invariants the reference checks (`comparar_particiones`, app.py:183-209)
   * hold by construction: chunks disjoint, union = input, sizes differ ≤1
   * within a group, deterministic for a fixed seed.
   */
  def seededNtile(df: DataFrame, group: Seq[String], idCol: String, n: Int,
                  seed: Long = 42L, outCol: String = "partition_id"): DataFrame = {
    val seededKey = md5(concat_ws("|", col(idCol).cast("string"), lit(seed.toString)))
    val w = Window.partitionBy(group.map(col): _*).orderBy(seededKey.asc, col(idCol).asc)
    df.withColumn(outCol, ntile(n).over(w))
  }

  /**
   * D2 — custom partition config (app.py:91-145): some groups are pinned
   * to a subset of partitions; their ids are dealt evenly across only
   * those. `allowed` maps group value → allowed partition ids (1-based);
   * groups absent from the map use all `n`.
   *
   * Each configured group is re-dealt with `ntile(|allowed(g)|)` over the
   * same seeded ordering — matching the reference's even split
   * (app.py:129-143: num//parts with the remainder spread), i.e. chunk
   * sizes within a group differ by ≤1 for ANY |allowed(g)|, not only
   * when it divides `n`. All ntile widths share one window spec, so
   * Catalyst evaluates them in a single Window pass (one shuffle).
   */
  def seededNtileConfigured(df: DataFrame, groupCol: String, idCol: String, n: Int,
                            allowed: Map[String, Seq[Int]], seed: Long = 42L,
                            outCol: String = "partition_id"): DataFrame = {
    val seededKey = md5(concat_ws("|", col(idCol).cast("string"), lit(seed.toString)))
    val w = Window.partitionBy(col(groupCol)).orderBy(seededKey.asc, col(idCol).asc)
    val widths = allowed.values.map(_.size).toSet + n
    val tile: Map[Int, Column] = widths.map(k => k -> ntile(k).over(w)).toMap
    val mapped = allowed.foldLeft(tile(n)) { case (acc, (g, parts)) =>
      val arr = array(parts.map(lit): _*)
      when(col(groupCol) === g, element_at(arr, tile(parts.size))).otherwise(acc)
    }
    df.withColumn(outCol, mapped)
  }

  /**
   * D3/D4 — per-partition stats (app.py:147-181, 344-396): distinct-id and
   * row counts per (partition, group), the basis of the reference's summary
   * sheet and equivalence check.
   */
  def partitionStats(df: DataFrame, partCol: String, groupCol: String,
                     idCol: String): DataFrame =
    df.groupBy(col(partCol), col(groupCol))
      .agg(countDistinct(col(idCol)).as("n_ids"), count(lit(1)).as("n_rows"))
      .orderBy(col(partCol).asc, col(groupCol).asc)

  /**
   * EP1 materialization (app.py:404-477): the reference writes one Excel
   * sheet per work-queue partition plus a summary sheet. Here: ONE
   * partitioned parquet write (`partitionBy(partition_id)`) — each
   * partition directory is a "sheet", written in a single distributed
   * pass instead of N sequential filtered writes — plus the summary
   * frame. Returns the summary.
   */
  def writePartitioned(assigned: DataFrame, outDir: String,
                       groupCol: String, idCol: String,
                       partCol: String = "partition_id"): DataFrame = {
    assigned.write.mode("overwrite").partitionBy(partCol)
      .parquet(s"$outDir/partitions")
    // summarize the parquet just written, not the input plan — the
    // assignment is typically a full-input window whose re-execution
    // would double the job's cost; the materialized table reads back
    // columnar and partition-pruned
    val summary = partitionStats(
      assigned.sparkSession.read.parquet(s"$outDir/partitions"),
      partCol, groupCol, idCol)
    summary.coalesce(1).write.mode("overwrite").parquet(s"$outDir/summary")
    summary
  }
}
