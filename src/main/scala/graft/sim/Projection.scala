package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import graft.functions.DoubleDotProduct

/**
 * Sparse-sign random projection (Achlioptas 2003 — the database-friendly
 * Johnson–Lindenstrauss transform): project `dim`-dimensional embeddings
 * to `outDims` with a ±1 sign matrix derived from the REPLAYABLE md5
 * hash, so the projection is a pure deterministic function of (i, j) —
 * no RNG state, no broadcast weights, and the DuckDB oracle re-derives
 * the identical matrix from the same hash formula.
 *
 * Scale shape: each output coordinate is ONE codegen'd ordered dot
 * product ([[graft.functions.DoubleDotProduct]]) against a literal sign
 * vector — entirely map-side, `outDims` kernel calls per row, no
 * shuffle. This is the cheap front half of an ANN pipeline: 64→16 dims
 * cuts candidate-scoring arithmetic 4× while JL preserves pairwise
 * geometry in expectation.
 */
object Projection {

  /** ±1.0 sign for matrix cell (i, j): parity of the 60-bit md5 prefix
    * of "i_j" — in SQL: `('0x'||substr(md5(i||'_'||j),1,15))::BIGINT % 2`. */
  def sign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(15)
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** The j-th sign vector as a foldable literal array column. */
  private def signVec(dim: Int, j: Int): Column =
    array((0 until dim).map(i => lit(sign(i, j))): _*)

  /** Add projected coordinates `p1..p<outDims>` (rounded to 4 — the
    * sum is an ordered ascending-index fold in both engines; rounding
    * absorbs any last-ulp summation difference). */
  def project(df: DataFrame, vecCol: Column, dim: Int, outDims: Int): DataFrame =
    (1 to outDims).foldLeft(df) { (acc, j) =>
      acc.withColumn(s"p$j", round(ColumnBridge.column(DoubleDotProduct(
        ColumnBridge.expression(vecCol),
        ColumnBridge.expression(signVec(dim, j - 1)))), 4))
    }

  /** The DuckDB spelling of coordinate j (1-based output index) over a
    * list column `vec` of length `dim` — mirrors [[project]] exactly. */
  def coordSql(vec: String, dim: Int, j: Int): String =
    s"""round(list_sum(list_transform(range(0, $dim),
        i -> $vec[i + 1] * CASE WHEN ('0x'||substr(md5(i||'_'||${j - 1}),1,15))::BIGINT % 2 = 0
                                THEN 1.0 ELSE -1.0 END)), 4)"""
}
