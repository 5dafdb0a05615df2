package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.types._

/** KMV (k minimum values) distinct-count sketch as a
  * TypedImperativeAggregate — the mergeable-buffer aggregate extension
  * point (the ES terms-agg replacement when exact distinct state won't
  * fit, alternative to HLL with simpler mergeability proofs).
  *
  * Estimator (Bar-Yossef et al. 2002, public): keep the k smallest 64-bit
  * hashes of the values; if the k-th smallest (scaled to [0,1]) is t, the
  * distinct count ≈ (k-1)/t. Buffers merge by multiset-union + re-truncate
  * — associative and commutative, so partial aggregation and shuffle
  * merging are exact.
  */
object KmvSketch {

  /** Mutable buffer: a bounded max-heap of the k smallest hashes. */
  final class Buffer(val k: Int) {
    // max-heap via java PriorityQueue reversed; size <= k
    val heap = new java.util.PriorityQueue[java.lang.Long](
      math.max(1, k), java.util.Collections.reverseOrder[java.lang.Long]())
    def insert(h: Long): Unit = {
      // work on unsigned ordering by flipping the sign bit
      val u = h ^ Long.MinValue
      if (heap.size < k) { if (!heap.contains(u)) heap.add(u): Unit }
      else if (u < heap.peek()) {
        if (!heap.contains(u)) { heap.poll(); heap.add(u): Unit }
      }
    }
    def mergeFrom(other: Buffer): Unit = {
      val it = other.heap.iterator()
      while (it.hasNext) {
        val u = it.next()
        if (heap.size < k) { if (!heap.contains(u)) heap.add(u): Unit }
        else if (u < heap.peek() && !heap.contains(u)) {
          heap.poll(); heap.add(u): Unit
        }
      }
    }
    def estimate: Long = {
      val n = heap.size
      if (n < k) n.toLong // fewer distinct values than k: exact
      else {
        // kth smallest unsigned hash scaled to (0,1]
        val t = (heap.peek().doubleValue() - Long.MinValue.toDouble) /
          math.pow(2.0, 64)
        math.round((k - 1) / t)
      }
    }
  }

  case class Agg(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer] {

    // Single child.eval per row via a reusable scratch row (the
    // HllSketch.Agg pattern — see the comment there): the previous shape
    // re-evaluated the child inside the hasher after the null check.
    private lazy val hasher = XxHash64(Seq(org.apache.spark.sql.catalyst
      .expressions.BoundReference(0, child.dataType, nullable = false)),
      42L)
    private lazy val scratch =
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

    override def createAggregationBuffer(): Buffer = new Buffer(k)

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) {
        scratch.update(0, v)
        b.insert(hasher.eval(scratch).asInstanceOf[Long])
      }
      b
    }

    override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeFrom(o); b }

    override def eval(b: Buffer): Any = b.estimate

    override def serialize(b: Buffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * b.heap.size)
      bb.putInt(b.heap.size)
      b.heap.forEach(v => { bb.putLong(v); () })
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new Buffer(k)
      var i = 0
      while (i < n) { b.heap.add(bb.getLong); i += 1 }
      b
    }

    override def dataType: DataType = LongType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Agg = copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): Agg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): Agg =
      copy(inputAggBufferOffset = o)
  }

  /** Column API: approximate distinct count via a k-minimum-values sketch. */
  def kmvDistinct(c: Column, k: Int = 256): Column =
    GraftBridge.column(
      Agg(GraftBridge.expression(c), k).toAggregateExpression())
}
