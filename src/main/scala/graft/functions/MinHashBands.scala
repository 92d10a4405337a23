package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object MinHashUtil {
  // same constants as graft.dedup.Dedup (shared verbatim with the SQL oracle)
  final val P: Long = 1000000007L
  final val K = 3
  final val A: Array[Long] = Array(
    686579304L, 26855093L, 295310486L, 239670712L, 790779947L, 726600540L,
    957970517L, 93349857L, 453035111L, 31994524L, 234760739L, 542621109L,
    28492781L, 213500299L, 697808099L, 585126462L)
  final val B: Array[Long] = Array(
    119540831L, 796233790L, 262950628L, 149827706L, 110053353L, 795285932L,
    585582861L, 634036506L, 34126396L, 100604502L, 249817734L, 646412689L,
    602632297L, 768820204L, 753041955L, 450455977L)

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  /**
   * Fused shingle→minhash→band pass: one traversal of the token array
   * producing the 4 band-key md5 hex strings. Bit-identical to the
   * composed spelling (3-token shingles joined by ' ', 60-bit md5-prefix
   * hash mod P, 16 (a·h+b) mod P mins, band key = md5 of the '_'-joined
   * decimal mins) that the DuckDB oracle replays — but with no explode,
   * no shuffle, and no Catalyst projection-collapse re-evaluation.
   */
  def bands(tokens: ArrayData): ArrayData = {
    val md = digests.get()
    val n = tokens.numElements()
    val nSh = math.max(n - (K - 1), 1)
    val mins = Array.fill(16)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < nSh) {
      sb.setLength(0)
      var o = 0
      var first = true
      while (o < K) {
        val idx = i + o
        if (idx < n && !tokens.isNullAt(idx)) { // concat_ws skips nulls
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(idx).toString)
          first = false
        }
        o += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var bi = 0
      while (bi < 7) { v = (v << 8) | (d(bi) & 0xFFL); bi += 1 }
      v = (v << 4) | ((d(7) >> 4) & 0xFL)
      val hp = v % P
      var j = 0
      while (j < 16) {
        val h = (A(j) * hp + B(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    val out = new Array[AnyRef](4)
    var b = 0
    while (b < 4) {
      sb.setLength(0)
      sb.append(mins(4 * b)).append('_').append(mins(4 * b + 1))
        .append('_').append(mins(4 * b + 2)).append('_').append(mins(4 * b + 3))
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var k = 0
      while (k < 16) {
        hex(2 * k) = hexDigits((d(k) >> 4) & 0xF)
        hex(2 * k + 1) = hexDigits(d(k) & 0xF)
        k += 1
      }
      out(b) = UTF8String.fromString(new String(hex))
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Native fused MinHash-LSH band keys over a token array column. */
case class MinHashBands(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashUtil.bands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
