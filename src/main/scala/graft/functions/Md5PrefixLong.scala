package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level helper shared by interpreted eval and generated code. */
object Md5Util {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /**
   * First 60 bits (15 hex nibbles) of md5(s) as a non-negative long —
   * bit-identical to `conv(substring(md5(s), 1, 15), 16, 10)` and to the
   * DuckDB oracle's `('0x'||substr(md5(s),1,15))::BIGINT`, without
   * materializing the 32-char hex string.
   */
  def prefixLong(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xFL)
  }
}

/**
 * Native codegen'd expression for the engine's canonical 60-bit string
 * hash (used ~3M times per signature pass in MinHash/SimHash — the
 * built-in spelling allocates two intermediate strings per call and
 * re-parses hex; this stays on bytes). SURVEY.md §4 note: custom
 * `Expression`s only where codegen/allocation wins warrant them.
 */
case class Md5PrefixLong(child: Expression) extends UnaryExpression {

  // callers guarantee a string child (Exprs.md5Long casts); no
  // ExpectsInputTypes — AbstractDataType is private[sql] in Spark 4
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override protected def nullSafeEval(input: Any): Any =
    Md5Util.prefixLong(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Util.prefixLong($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLong =
    copy(child = newChild)
}
