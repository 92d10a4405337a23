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
   * Hilbert curve index (xy → d) over a 2^bits × 2^bits grid — the
   * locality-better alternative to [[zValue]] for multi-dimensional
   * clustering: consecutive Hilbert indices are always GRID-ADJACENT
   * (unit Manhattan step; the Z-curve jumps across the grid at every
   * power-of-two boundary), so a file of consecutive d-values covers a
   * more compact 2-D region and range predicates prune more files.
   * This is the classic bit-interleave-with-rotation loop (Hilbert
   * 1891; the standard xy2d formulation, subgrid `s−1` reflection
   * variant — bijection + unit adjacency pinned in LakeOpsSpec),
   * unrolled into `bits` rounds of pure column arithmetic: per round
   * one quadrant selector and one conditional reflect/swap. No UDF —
   * the whole transform codegens; named intermediate columns per round
   * keep the expression tree linear in `bits` (CollapseProject will
   * not inline multiply-referenced non-trivial expressions).
   * `x`/`y` must be integer columns in [0, 2^bits).
   */
  def hilbertIndex(df: DataFrame, x: Column, y: Column, bits: Int,
                   out: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"hilbertIndex bits in [1,31]; got $bits")
    var cur = df.withColumn("_hx", x.cast("long"))
      .withColumn("_hy", y.cast("long"))
      .withColumn("_hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("_rx", when(col("_hx").bitwiseAND(s) > 0, 1L).otherwise(0L))
        .withColumn("_ry", when(col("_hy").bitwiseAND(s) > 0, 1L).otherwise(0L))
        .withColumn("_hd", col("_hd") +
          lit(s * s) * (lit(3L) * col("_rx")).bitwiseXOR(col("_ry")))
        .withColumn("_nx",
          when(col("_ry") === 0,
            when(col("_rx") === 1, lit(s - 1) - col("_hy")).otherwise(col("_hy")))
            .otherwise(col("_hx")))
        .withColumn("_ny",
          when(col("_ry") === 0,
            when(col("_rx") === 1, lit(s - 1) - col("_hx")).otherwise(col("_hx")))
            .otherwise(col("_hy")))
        .withColumn("_hx", col("_nx")).withColumn("_hy", col("_ny"))
    }
    cur.withColumn(out, col("_hd"))
      .drop("_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny")
  }

  /** DuckDB replay of [[hilbertIndex]] as unrolled per-round CTEs: the
    * caller binds `h0(idCols..., x, y, d)`; emits `h1..h$bits`, each
    * one quadrant-select + reflect/swap round over the previous. The
    * final `h$bits` carries (idCols..., d). */
  def hilbertOracleCtes(bits: Int, idCols: String): String =
    ((bits - 1) to 0 by -1).zipWithIndex.map { case (i, step) =>
      val s = 1L << i
      s"""h${step + 1} AS (SELECT $idCols,
           CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END ELSE x END AS x,
           CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END ELSE y END AS y,
           d + ${s * s} * xor(3 * rx, ry) AS d
         FROM (SELECT $idCols, x, y, d,
                 CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
                 CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
               FROM h$step))"""
    }.mkString(",\n       ")

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
