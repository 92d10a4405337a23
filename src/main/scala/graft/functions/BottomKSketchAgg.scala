package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * Mergeable bottom-k quantile sketch as a native Catalyst aggregate
 * (`TypedImperativeAggregate`, the same machinery as Spark's own
 * `approx_percentile` and the repo's [[MisraGriesAgg]]): keep the `k`
 * (hash, value) pairs with the lexicographically smallest (hash, value)
 * — a deterministic uniform row sample when `hash` is a uniform row
 * hash (md5-prefix of a unique id), because bottom-k of a union is the
 * bottom-k of the per-part bottom-ks (the KMV argument; Bar-Yossef et
 * al. 2002).
 *
 * The sketch is the PERCENTILE companion to an HLL register table: a
 * per-day sketch is `k` pairs regardless of day size, sketches persist
 * as a plain typed column, and any set of days merges by
 * union-then-trim without re-scanning raw events. Quantile estimates
 * read the sample's picked ranks; by DKW, the estimate's TRUE rank is
 * within ±ε·n of q·n with probability ≥ 1 − 2e^(−2kε²) (k = 2048,
 * ε = 0.05 → failure odds ~7·10⁻⁵) — and the draw is DETERMINISTIC
 * given the hash, so a passing verdict is stable, not flaky.
 *
 * Buffer: a k-capped max-heap on (hash, value); O(log k) per row,
 * O(k) memory per partition buffer, merge = bulk push + trim. Output:
 * the sample sorted ascending by (hash, value) as
 * `array<struct<h bigint, v double>>`.
 */
case class BottomKSketchAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_sketch"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType), StructField("v", DoubleType))))

  // natural tuple ordering → head is the LARGEST kept pair, the one a
  // smaller incoming pair evicts
  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)]

  private def push(buf: mutable.PriorityQueue[(Long, Double)],
                   p: (Long, Double)): Unit = {
    if (buf.size < k) { buf.enqueue(p); () }
    else if (Ordering[(Long, Double)].lt(p, buf.head)) {
      buf.dequeue(); buf.enqueue(p); ()
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Double)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      push(buf, (h.asInstanceOf[Long], v.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Double)],
                     other: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    other.foreach(push(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any = {
    val rows = buf.toArray.sorted.map { case (h, v) => InternalRow(h, v) }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readDouble())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSketchAgg =
    copy(hash = newChildren(0), value = newChildren(1))
}
