package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

object WordSetMath {
  /** Number of tokens present in `set` (multiplicity counted) — one hash
    * probe per token. Bit-identical to `size(filter(toks, _.isin(set)))`,
    * which Spark interprets per element. */
  def count(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && set.contains(t)) c += 1
      i += 1
    }
    c
  }
}

/**
 * Native membership counter for a token-array column against a fixed
 * word set (stopword density scoring). The `size(filter(...))` spelling
 * is a per-element interpreted pass — this is pure codegen'd scan work,
 * which is what a 100 TB quality-scoring pass has to be.
 */
case class WordSetCount(child: Expression, words: Array[String])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "word_set_count"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    WordSetMath.count(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("words", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordSetMath.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordSetCount =
    copy(child = newChild)
}
