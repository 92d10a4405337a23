package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object PhraseCountUtil {
  /** Occurrences of the exact consecutive token phrase in one pass —
    * bit-identical to `size(filter(sequence(1, n-k+1), i -> w[i]=p1 AND
    * … AND w[i+k-1]=pk))` without the per-position interpreted lambda
    * (ArrayFilter/element_at are CodegenFallback; the lambda spelling
    * dominated the q209 profile at ~25M interpreted evals per sf0.1
    * pass). Overlapping matches count (positional semantics). */
  def count(tokens: ArrayData, phrase: Array[UTF8String]): Long = {
    val n = tokens.numElements()
    val k = phrase.length
    var c = 0L
    var i = 0
    while (i <= n - k) {
      var o = 0
      var ok = true
      while (ok && o < k) {
        if (tokens.isNullAt(i + o) ||
          !tokens.getUTF8String(i + o).equals(phrase(o))) ok = false
        o += 1
      }
      if (ok) c += 1
      i += 1
    }
    c
  }
}

/** Native positional phrase-occurrence count over a token array. */
case class PhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression {
  require(phrase.nonEmpty, "phrase must have at least one token")
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_count"

  @transient private lazy val phraseUtf8: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any =
    PhraseCountUtil.count(input.asInstanceOf[ArrayData], phraseUtf8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phrase", phraseUtf8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PhraseCountUtil.count($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseCount =
    copy(child = newChild)
}
