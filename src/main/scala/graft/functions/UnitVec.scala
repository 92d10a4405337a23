package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

object UnitVecMath {
  /** Unit-normalized double copy of a float/double vector: one pass for
    * the norm (strict left-to-right accumulation — bit-identical to
    * sqrt(DoubleDotProduct(v, v))), one for the division. Zero vectors
    * map to zero vectors. PRECONDITION: no null elements. */
  def unit(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x
      acc += x * x
      i += 1
    }
    val nrm = math.sqrt(acc)
    if (nrm != 0.0) {
      i = 0
      while (i < n) { out(i) = out(i) / nrm; i += 1 }
    } else {
      i = 0
      while (i < n) { out(i) = 0.0; i += 1 }
    }
    new GenericArrayData(out)
  }
}

/**
 * Native unit-normalization of an embedding column. The Column spelling
 * (`withColumn("_nrm", sqrt(dot(v,v)))` + `transform(v, x => x/_nrm)`)
 * is interpreted per element AND exposed to CollapseProject, which
 * re-inlines `_nrm` into the lambda — recomputing the norm once PER
 * ELEMENT. At 100 TB normalization is a map-side pass over every vector,
 * so it has to be one codegen'd call per row.
 */
case class UnitVec(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unit_vec"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"unit_vec expects a float/double array, got $t")
    }

  override protected def nullSafeEval(input: Any): Any =
    UnitVecMath.unit(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnitVecMath.unit($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): UnitVec =
    copy(child = newChild)
}
