package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Range-sorted file layout — the data-skipping write path. A table
 * written range-partitioned + sorted on its scan key gives every file a
 * tight, DISJOINT min/max band, so a predicate on that key prunes whole
 * files from the footer stats alone (the poor man's Z-order for one
 * dimension; at 100 TB this is the difference between scanning 8 files
 * and 8,000). The layout is produced with plain `repartitionByRange` +
 * `sortWithinPartitions` — no custom committer — and verified by
 * re-deriving the per-file intervals from the data itself.
 */
object Layout {

  /**
   * Write `df` into `numFiles` range-partitioned, internally sorted
   * parquet files on `sortCol` (ties inside a file break on `tieCol`;
   * the partitioner splits on `sortCol` ALONE so equal keys can never
   * straddle a file boundary — that is what makes the intervals
   * disjoint), and return the re-read frame.
   */
  def rangeSortedWrite(df: DataFrame, sortCol: String, tieCol: String,
                       numFiles: Int, path: String): DataFrame = {
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol, tieCol)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /**
   * Per-file (lo, hi, n) of `sortCol` from a re-read — the same view the
   * scan scheduler gets from parquet footer stats. Bounded by file
   * count, not row count.
   */
  def fileIntervals(reread: DataFrame, sortCol: String): DataFrame =
    reread.groupBy(input_file_name().as("file"))
      .agg(min(col(sortCol)).as("lo"), max(col(sortCol)).as("hi"),
        count(lit(1)).as("n"))

  // ------------------------------------------------------------- Z-order

  /**
   * Morton code: interleave the low `bits` bits of two non-negative
   * integer bucket columns (`a` on odd positions, `b` on even) — plain
   * shift/mask arithmetic, fully codegen'd, replayable in any engine.
   */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      (shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i + 1) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i)).cast("long")
    }.reduce(_ + _)

  /**
   * MULTI-dimensional data-skipping layout: write `df` range-partitioned
   * + sorted on the Z-value of two bucketized dimensions. Where
   * [[rangeSortedWrite]] gives tight footer stats on ONE column (and
   * useless ones on every other), the Z-curve keeps rows close in BOTH
   * dimensions, so a range predicate on EITHER column prunes most files
   * from min/max stats alone — the layout trade behind Delta/Iceberg
   * `OPTIMIZE ZORDER BY`. `bucketA`/`bucketB` must be integer columns in
   * [0, 2^bits); the caller picks the normalization (quantile or min/max
   * span). The `_z` helper column is dropped on re-read.
   */
  def zOrderedWrite(df: DataFrame, bucketA: Column, bucketB: Column,
                    bits: Int, numFiles: Int, path: String): DataFrame = {
    df.withColumn("_z", zValue(bucketA, bucketB, bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path).drop("_z")
  }
}
