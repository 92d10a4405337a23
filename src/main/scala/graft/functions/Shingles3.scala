package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object ShingleUtil {
  /** 3-token shingles joined by ' ' in one pass — bit-identical to
    * `transform(sequence(1, greatest(n-2,1)), i -> concat_ws(' ',
    * w[i], w[i+1], w[i+2]))` including concat_ws's null/short-array
    * skipping, without per-element interpreted evaluation. */
  def shingles3(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val nSh = math.max(n - 2, 1)
    val out = new Array[AnyRef](nSh)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var o = 0
      var first = true
      while (o < 3) {
        val idx = i + o
        if (idx < n && !tokens.isNullAt(idx)) {
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(idx).toString)
          first = false
        }
        o += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native 3-token shingle array over a token array column. */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles3"

  override protected def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles3(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}
