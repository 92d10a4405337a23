package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Scalar int8 embedding quantization — the standard 4× compression for
 * billion-vector ANN corpora (what faiss calls SQ8): per-vector
 * symmetric scale `max(|x|)/127`, elements rounded to [-127, 127]
 * integers. Distance math then runs on integer dot products (exact up to
 * 2^53 — associativity-proof, so quantized similarities are bit-identical
 * across engines and partitionings, unlike float accumulation) with the
 * two scales multiplied back at the end.
 *
 * Everything is per-row map-side Column arithmetic; quantization adds no
 * shuffle to whatever plan consumes it.
 */
object Quantize {

  /** Per-vector symmetric int8 scale: max(|x|)/127 (0-vector → scale 0). */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double")))) / 127.0

  /** Quantize to an array<long> of [-127,127] ints (HALF_UP rounding —
   * `round` ties away from zero in both Spark and DuckDB). */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0, 0L)
        .otherwise(round(x.cast("double") / scale, 0).cast("long")))

  /** Attach `<out>_q` (int array) and `<out>_scale` to each row. */
  def withInt8(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(s"${out}_scale", int8Scale(col(vecCol)))
      .withColumn(s"${out}_q", int8Quantize(col(vecCol), col(s"${out}_scale")))

  /** Cosine similarity between two quantized vectors: the integer dot
   * products are exact; only the final normalization touches doubles. */
  def cosineQ(qa: Column, qb: Column): Column = {
    def idot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (a, b) => a * b), lit(0L), (acc, v) => acc + v)
    val d = idot(qa, qb).cast("double")
    val nn = sqrt(idot(qa, qa).cast("double")) * sqrt(idot(qb, qb).cast("double"))
    when(nn === 0, 0.0).otherwise(d / nn)
  }
}
