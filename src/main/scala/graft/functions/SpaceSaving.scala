package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi,
  * "Efficient Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT 2005 — public) as a TypedImperativeAggregate.
  *
  * Keeps at most `capacity` counters; a new item evicts the minimum
  * counter and inherits its count as error bound. Guarantees: every item
  * with true frequency > N/capacity is retained, and each reported count
  * overestimates by at most its recorded error. When distinct values ≤
  * capacity, counts are EXACT (errors all zero) — the driver-checkable
  * invariant.
  *
  * 100 TB posture: this is how you get "top 1000 tokens over 10^12 rows"
  * with O(capacity) state per partial aggregate instead of a
  * full-vocabulary shuffle — the map-side partials are the win; merging is
  * counter-summing + re-truncation (the standard mergeable-summary
  * result, Agarwal et al. "Mergeable Summaries", PODS 2012).
  */
object SpaceSaving {

  final class Buffer(val capacity: Int) {
    // value -> (count, error)
    val counters = new java.util.HashMap[String, (Long, Long)]()

    def insert(v: String, by: Long = 1L, err: Long = 0L): Unit = {
      val cur = counters.get(v)
      if (cur != null) {
        counters.put(v, (cur._1 + by, cur._2 + err)): Unit
      } else if (counters.size < capacity) {
        counters.put(v, (by, err)): Unit
      } else {
        // evict the minimum counter; newcomer inherits its count as error
        var minK: String = null
        var minC = Long.MaxValue
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue._1 < minC ||
              (e.getValue._1 == minC && (minK == null || e.getKey < minK))) {
            minC = e.getValue._1; minK = e.getKey
          }
        }
        counters.remove(minK)
        counters.put(v, (minC + by, minC + err)): Unit
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      other.counters.forEach((v, ce) => insert(v, ce._1, ce._2))
    }
  }

  /** Output: top-k (value, count, error) structs, count desc then value —
    * deterministic under the exactness condition.
    */
  case class Agg(child: Expression, k: Int, capacity: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer] {

    override def createAggregationBuffer(): Buffer = new Buffer(capacity)

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) b.insert(v.toString)
      b
    }

    override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeFrom(o); b }

    override def eval(b: Buffer): Any = {
      val top = {
        import scala.jdk.CollectionConverters._
        b.counters.asScala.toSeq
          .sortBy { case (v, (c, _)) => (-c, v) }
          .take(k)
      }
      new GenericArrayData(top.map { case (v, (c, e)) =>
        InternalRow(UTF8String.fromString(v), c, e)
      }.toArray[Any])
    }

    override def serialize(b: Buffer): Array[Byte] = {
      var size = 4
      b.counters.forEach((v, _) =>
        size += 4 + v.getBytes(StandardCharsets.UTF_8).length + 16)
      val bb = ByteBuffer.allocate(size)
      bb.putInt(b.counters.size)
      b.counters.forEach { (v, ce) =>
        val bytes = v.getBytes(StandardCharsets.UTF_8)
        bb.putInt(bytes.length); bb.put(bytes)
        bb.putLong(ce._1); bb.putLong(ce._2)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val b = new Buffer(capacity)
      var i = 0
      while (i < n) {
        val len = bb.getInt
        val vb = new Array[Byte](len)
        bb.get(vb)
        b.counters.put(new String(vb, StandardCharsets.UTF_8),
          (bb.getLong, bb.getLong))
        i += 1
      }
      b
    }

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))))
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Agg = copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): Agg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): Agg =
      copy(inputAggBufferOffset = o)
  }

  /** Column API: approximate top-k heavy hitters with bounded state. */
  def topK(c: Column, k: Int, capacity: Int): Column =
    GraftBridge.column(
      Agg(GraftBridge.expression(c), k, capacity).toAggregateExpression())
}
