package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

object LongWordMath {
  /** Σ floor(max(len(w)-1, 0) / 6) over a token array — the extra
    * BPE-ish merge units long words contribute (one unit per 6 chars
    * beyond the first). `numChars` counts Unicode code points, matching
    * Spark's `length()` on the same token. PRECONDITION: no null
    * elements (tokenizer output). */
  def extraUnits(toks: ArrayData): Long = {
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val len = toks.getUTF8String(i).numChars()
      if (len > 1) acc += (len - 1) / 6
      i += 1
    }
    acc
  }
}

/**
 * Native long-word extra-unit counter for the BPE-ish token estimate —
 * the one `aggregate()` (interpreted per element) left in the
 * text-analysis surface. Token counting runs over every document of a
 * 100 TB corpus, so it has to stay inside whole-stage codegen.
 */
case class LongWordExtraUnits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_word_extra_units"

  override protected def nullSafeEval(input: Any): Any =
    LongWordMath.extraUnits(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LongWordMath.extraUnits($c)")

  override protected def withNewChildInternal(newChild: Expression): LongWordExtraUnits =
    copy(child = newChild)
}
