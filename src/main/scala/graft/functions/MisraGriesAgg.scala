package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra–Gries heavy-hitters sketch as a native Catalyst aggregate
 * (`TypedImperativeAggregate`, the same machinery as Spark's own
 * `approx_percentile`): at most `capacity` counters per buffer, O(1)
 * amortized per row, mergeable across partitions (Agarwal et al.,
 * "Mergeable Summaries", PODS 2012).
 *
 * Guarantees after ANY sequence of partial-aggregate merges, for true
 * count c(x) over N total rows and m = capacity:
 *   - est(x) ≤ c(x)                          (never overestimates)
 *   - c(x) − est(x) ≤ N/(m+1)                (bounded undercount)
 *   - every x with c(x) > N/(m+1) survives   (no heavy hitter lost)
 *
 * This is the bounded-memory path for "top-k tokens over 100 TB": the
 * exact `groupBy(token)` aggregate shuffles the full vocabulary, which
 * for web-scale n-gram vocabularies is itself TB-sized — the sketch
 * ships `capacity` counters per partition instead, and only candidates
 * that survive need an exact confirmation pass.
 *
 * The survivor SET for non-heavy keys can differ between merge orders
 * (the bounds above cannot): gate results on the guaranteed properties,
 * never on raw survivor hashes (q129 does exactly this).
 */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("est", LongType))))

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1L
        case None if buf.size < capacity => buf(key) = 1L
        case None =>
          // classic MG step: a full buffer and an untracked key decrement
          // EVERY counter by one (the new key is not inserted) — each such
          // step burns m+1 occurrences, hence the N/(m+1) bound
          val dead = List.newBuilder[String]
          buf.mapValuesInPlace { (k, c) =>
            if (c == 1L) dead += k
            c - 1L
          }
          dead.result().foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => buf(k) = buf.getOrElse(k, 0L) + c }
    if (buf.size > capacity) {
      // subtract the (m+1)-th largest count from everything and drop the
      // non-positive survivors — the merge rule that keeps the summary
      // mergeable with additive error
      val d = buf.values.toArray.sorted(Ordering.Long.reverse).apply(capacity)
      val dead = List.newBuilder[String]
      buf.mapValuesInPlace { (k, c) =>
        if (c <= d) dead += k
        c - d
      }
      dead.result().foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val rows = buf.toArray.sortBy { case (k, c) => (-c, k) }.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
