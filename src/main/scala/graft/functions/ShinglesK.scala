package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object ShingleKUtil {
  /** k-token shingles joined by ' ' in one pass — bit-identical to
    * `transform(sequence(1, greatest(n-(k-1),1)), i -> concat_ws(' ',
    * w[i..i+k-1]))` including concat_ws's null/short-array skipping,
    * without per-element interpreted evaluation (the transform spelling
    * re-resolves k element_at lookups per shingle and dominated the
    * span-dedup profile at k=8). */
  def shinglesK(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    val nSh = math.max(n - (k - 1), 1)
    val out = new Array[AnyRef](nSh)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var o = 0
      var first = true
      while (o < k) {
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

/** Native k-token shingle array over a token array column. */
case class ShinglesK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"shingles$k"

  override protected def nullSafeEval(input: Any): Any =
    ShingleKUtil.shinglesK(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKUtil.shinglesK($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesK =
    copy(child = newChild)
}
