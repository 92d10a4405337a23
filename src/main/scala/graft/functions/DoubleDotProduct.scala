package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Primitive-loop dot-product kernels over Catalyst ArrayData. Each
  * accumulates strictly left-to-right in double — bit-identical to
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and to DuckDB's
  * `list_dot_product` on double lists, which is what the oracle replays.
  *
  * PRECONDITION: equal-length arrays with no null elements (embedding
  * vectors). The bit-identical claim holds only then. Divergences outside
  * it: null elements read as 0.0 here but make the higher-order spelling
  * null; unequal lengths iterate to min(len) here where `zip_with`
  * null-pads the shorter side and the aggregate yields null. */
object ArrayMath {
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
    acc
  }
  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)
}

/**
 * Native dot product of two float/double array columns. Spark's
 * higher-order functions (`aggregate`/`zip_with`) are interpreted per
 * element with boxing — on the quadratic ANN stages that interpretation
 * dominated the profile; this expression is one static-helper call per
 * row inside whole-stage codegen.
 */
case class DoubleDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot_product"

  private def helperName: String = {
    def elem(e: Expression) = e.dataType.asInstanceOf[ArrayType].elementType
    (elem(left), elem(right)) match {
      case (DoubleType, DoubleType) => "dotDD"
      case (FloatType, FloatType) => "dotFF"
      case (FloatType, DoubleType) => "dotFD"
      case (DoubleType, FloatType) => "dotDF"
      case (l, r) => throw new IllegalArgumentException(
        s"double_dot_product expects float/double arrays, got $l / $r")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    helperName match {
      case "dotDD" => ArrayMath.dotDD(x, y)
      case "dotFF" => ArrayMath.dotFF(x, y)
      case "dotFD" => ArrayMath.dotFD(x, y)
      case "dotDF" => ArrayMath.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayMath.$helperName($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}
