package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object LangIdMath {
  /** Argmax-language over marker-hit counts in ONE pass over the token
    * array: for each token, membership in each language's marker set is
    * one hash probe. Tie-break: strict `>` scanning languages in
    * declaration order, so the earlier entry wins; all-zero → "und".
    * Bit-identical to the folded `size(filter(...))` Column spelling
    * (which Spark interprets per element, once PER LANGUAGE). */
  def langId(toks: ArrayData, langs: Array[UTF8String],
             sets: Array[java.util.HashSet[UTF8String]]): UTF8String = {
    val k = langs.length
    val counts = new Array[Long](k)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null) {
        var j = 0
        while (j < k) {
          if (sets(j).contains(t)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < k) { if (counts(j) > counts(best)) best = j; j += 1 }
    if (counts(best) == 0) UTF8String.fromString("und") else langs(best)
  }
}

/**
 * Native one-pass language ID over a token-array column: marker-set
 * membership counting + argmax fused into a single codegen'd expression.
 * The composed Column spelling needs one interpreted `filter()` pass per
 * language AND re-evaluates each score everywhere the argmax fold
 * references it (CollapseProject re-inlines multi-referenced
 * projections) — at 100 TB the lang-id pass is pure map-side scan cost,
 * so it has to run at codegen speed.
 */
case class LangId(child: Expression, langs: Array[String],
                  markers: Array[Array[String]]) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val langsU: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markers.map { ms =>
      val s = new java.util.HashSet[UTF8String](ms.length * 2)
      ms.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }

  override protected def nullSafeEval(input: Any): Any =
    LangIdMath.langId(input.asInstanceOf[ArrayData], langsU, sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val langsRef = ctx.addReferenceObj("langs", langsU,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val setsRef = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LangIdMath.langId($c, $langsRef, $setsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
