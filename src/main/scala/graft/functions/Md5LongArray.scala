package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

object Md5ArrayUtil {
  /** 60-bit md5-prefix hash of every element ([[Md5Util.prefixLong]]) in
    * one pass. PRECONDITION: no null elements (tokenizer output). */
  def hashAll(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = Md5Util.prefixLong(toks.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/**
 * Native per-element 60-bit hash of a string-array column — the
 * tokenize→hash step of the SimHash/MinHash signature passes. The
 * `transform(toks, t => md5Long(t))` spelling evaluates the hash
 * expression interpreted per element; this is one codegen'd call per
 * row over raw bytes.
 */
case class Md5LongArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_long_array"

  override protected def nullSafeEval(input: Any): Any =
    Md5ArrayUtil.hashAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5ArrayUtil.hashAll($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5LongArray =
    copy(child = newChild)
}
