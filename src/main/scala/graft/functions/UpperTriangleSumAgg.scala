package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * One-pass upper-triangle pair-product sums over a fixed-width LONG
 * vector column: for every i < j, Σ_rows v[i]·v[j] — the cross-moment
 * table a feature-covariance matrix needs. As a native
 * `TypedImperativeAggregate` the buffer is ONE dim·(dim−1)/2 long array
 * per partition (mergeable by vector add), so the d² expansion never
 * leaves the map side: the composed spelling (nested `transform` →
 * explode → groupBy) is CodegenFallback AND shuffles |rows|·d²/2
 * exploded rows, where this ships 2016 longs per partition (d = 64).
 *
 * Magnitude bound: each accumulator grows like rows·max(v)²; with
 * milli-quantized unit-vector components (|v| ≤ ~8·10³) int64 wraps
 * past ~10¹¹ rows — rescale the quantization before that point (the
 * same caveat as the other integer-moment operators).
 */
case class UpperTriangleSumAgg(
    vec: Expression,
    dim: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(dim > 1, s"dim must be > 1, got $dim")
  private val nPairs = dim * (dim - 1) / 2

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def prettyName: String = "upper_triangle_sums"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType), StructField("j", IntegerType),
    StructField("sxy", LongType))))

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nPairs)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = math.min(dim, arr.numElements())
      val row = new Array[Long](d)
      var i = 0
      while (i < d) { row(i) = arr.getLong(i); i += 1 }
      var k = 0
      i = 0
      while (i < d) {
        val vi = row(i)
        var j = i + 1
        while (j < d) { buf(k) += vi * row(j); j += 1; k += 1 }
        // rows shorter than dim (defensive): skip the missing tail's slots
        k += dim - d
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < nPairs) { buf(k) += other(k); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val rows = new Array[Any](nPairs)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i + 1
      while (j < dim) { rows(k) = InternalRow(i, j, buf(k)); j += 1; k += 1 }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var k = 0
    while (k < nPairs) { out.writeLong(buf(k)); k += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Array[Long](nPairs)
    var k = 0
    while (k < nPairs) { buf(k) = in.readLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UpperTriangleSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UpperTriangleSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UpperTriangleSumAgg =
    copy(vec = newChildren.head)
}
