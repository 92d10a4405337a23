package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

object ShingleUtil {
  /** 3-token shingles — the fixed-k=3 entry point, delegating to
    * [[ShingleKUtil.shinglesK]] so the shingle loop (whose bit-exact
    * concat_ws-skipping semantics the oracles replay) exists ONCE. */
  def shingles3(tokens: ArrayData): ArrayData =
    ShingleKUtil.shinglesK(tokens, 3)
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
