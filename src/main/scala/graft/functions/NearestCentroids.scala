package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

object CentroidMath {
  /** Indices of the `n` nearest centroids to `v` by squared L2, distance
   * asc with centroid-index asc tiebreak. One pass over the centroid
   * table per row — no shuffle, no per-element boxing. */
  def nearest(v: ArrayData, cents: Array[Array[Double]], n: Int,
              isFloat: Boolean): ArrayData = {
    val k = cents.length
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var acc = 0.0
      var i = 0
      val d = math.min(cent.length, v.numElements())
      while (i < d) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        val diff = x - cent(i)
        acc += diff * diff
        i += 1
      }
      dist(c) = acc
      c += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var o = 0
    while (o < m) {
      var best = -1
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < k) {
        if (!used(j) && dist(j) < bestD) { bestD = dist(j); best = j }
        j += 1
      }
      if (best < 0) {
        // every remaining distance is NaN or +Infinity (NaN embedding
        // element / squared-distance overflow): fall back to the lowest
        // unused index instead of crashing the codegen'd stage
        var f = 0
        while (f < k && best < 0) { if (!used(f)) best = f; f += 1 }
      }
      used(best) = true
      out(o) = best
      o += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Nearest-`n` centroid indices for a float/double array column against a
 * fixed centroid table (the IVF coarse quantizer). The centroid table
 * rides along as a referenced object inside whole-stage codegen, so cell
 * assignment (`n=1`) and query probing (`n=nProbe`) are pure map-side
 * passes — the pattern that keeps IVF assignment shuffle-free at 100 TB.
 */
case class NearestCentroids(child: Expression, centroids: Array[Array[Double]],
                            n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"nearest_centroids expects a float/double array, got $t")
    }

  override protected def nullSafeEval(v: Any): Any =
    CentroidMath.nearest(v.asInstanceOf[ArrayData], centroids, n, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CentroidMath.nearest($c, $ref, $n, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
