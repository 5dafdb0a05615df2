package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
  * Summary: The Count-Min Sketch and its Applications", J. Algorithms
  * 2005) as a TypedImperativeAggregate: `depth` hash rows × `width`
  * counters; update adds 1 to one cell per row; estimate(x) is the MIN
  * over rows of its cells.
  *
  * Guarantees: estimate ≥ true count ALWAYS (cells only over-count —
  * the deterministic invariant the gate checks), and estimate ≤ true +
  * (e/width)·N with probability 1 − e^(−depth) per item (probabilistic —
  * pinned as an empirical tail bound in ScalaTest, not per-item in the
  * gate).
  *
  * 100 TB posture: the same mergeable-summary story as the other
  * sketches (Agarwal et al., PODS 2012) — fixed depth·width longs of
  * state per partial aggregate regardless of cardinality, map-side
  * partials do almost all the work, merge is cell-wise addition
  * (associative/commutative → retry-deterministic). "How often does
  * every token appear in 10^12 rows" costs one 64 KiB buffer per task
  * instead of a full-vocabulary shuffle.
  */
object CountMin {

  /** Row-i cell index for a value: FNV-1a of the UTF-8 bytes mixed per
    * row through splitmix64 — depth pairwise-decorrelated streams from
    * one content hash. Shared by the aggregate and [[CmsEstimate]].
    */
  def cellIndex(contentHash: Long, row: Int, width: Int): Int = {
    val h = SplitMix.mix2(contentHash, row.toLong + 1L)
    (((h % width) + width) % width).toInt
  }

  def contentHash(bytes: Array[Byte]): Long = {
    var h = Fnv.Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= Fnv.Prime
      i += 1
    }
    h
  }

  final class Buffer(val depth: Int, val width: Int) {
    val cells = new Array[Long](depth * width)
    var n = 0L

    def insert(v: String, by: Long = 1L): Unit = {
      val ch = contentHash(v.getBytes(StandardCharsets.UTF_8))
      var i = 0
      while (i < depth) {
        cells(i * width + cellIndex(ch, i, width)) += by
        i += 1
      }
      n += by
    }

    def mergeFrom(o: Buffer): Unit = {
      var i = 0
      while (i < cells.length) { cells(i) += o.cells(i); i += 1 }
      n += o.n
    }
  }

  /** Output: struct(n_total, cells) — the whole sketch as one row, ready
    * to broadcast next to a probe column via [[cmsEstimate]].
    */
  case class Agg(child: Expression, depth: Int, width: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer] {

    override def createAggregationBuffer(): Buffer = new Buffer(depth, width)

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) b.insert(v.toString)
      b
    }

    override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeFrom(o); b }

    override def eval(b: Buffer): Any =
      InternalRow(b.n, new GenericArrayData(b.cells.map(Long.box)))

    override def serialize(b: Buffer): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * b.cells.length)
      bb.putLong(b.n)
      var i = 0
      while (i < b.cells.length) { bb.putLong(b.cells(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val b = new Buffer(depth, width)
      b.n = bb.getLong
      var i = 0
      while (i < b.cells.length) { b.cells(i) = bb.getLong; i += 1 }
      b
    }

    override def dataType: DataType = StructType(Seq(
      StructField("n_total", LongType, nullable = false),
      StructField("cells", ArrayType(LongType, containsNull = false),
        nullable = false)))
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Agg = copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): Agg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): Agg =
      copy(inputAggBufferOffset = o)
  }

  /** `cms_estimate(cells, item)`: min over depth rows of the item's
    * cell. Pure function of (sketch, item) — codegen-friendly scalar.
    */
  case class CmsEstimate(left: Expression, right: Expression,
      depth: Int, width: Int) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(cellsAny: Any, itemAny: Any): Any = {
      val cells = cellsAny.asInstanceOf[ArrayData]
      val item = itemAny.asInstanceOf[UTF8String]
      CountMin.estimate(cells, item, depth, width)
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      defineCodeGen(ctx, ev, (c, i) =>
        s"graft.functions.CountMin.estimate($c, $i, $depth, $width)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
  }

  def estimate(cells: ArrayData, item: UTF8String, depth: Int,
      width: Int): Long = {
    val ch = contentHash(item.getBytes)
    var min = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = cells.getLong(i * width + cellIndex(ch, i, width))
      if (c < min) min = c
      i += 1
    }
    min
  }

  def sketch(c: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      Agg(GraftBridge.expression(c), depth, width).toAggregateExpression())

  def cmsEstimate(cells: Column, item: Column, depth: Int,
      width: Int): Column =
    GraftBridge.column(CmsEstimate(GraftBridge.expression(cells),
      GraftBridge.expression(item), depth, width))
}
