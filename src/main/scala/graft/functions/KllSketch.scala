package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KLL-style streaming quantile sketch as a TypedImperativeAggregate —
  * the mergeable-buffer path for rank/percentile queries whose exact sort
  * would not fit (Karnin, Lang, Liberty, "Optimal Quantile Approximation
  * in Streams", FOCS 2016 — public algorithm).
  *
  * Structure: a hierarchy of compactors; items at level i carry weight
  * 2^i. A full level sorts its buffer and promotes every other item to
  * the level above (halving count, doubling weight). Merging concatenates
  * level-wise then re-compacts — associative up to compaction order, so
  * map-side partial aggregation and shuffle merges work like any other
  * aggregate buffer.
  *
  * DELIBERATE deviation: the compaction coin (keep odd vs even positions)
  * is a deterministic alternator, not a random bit, so a retried MAP task
  * re-produces its partial buffer bit-for-bit (a random coin gives a
  * different sketch per attempt). Honest scope: the FINAL estimate still
  * depends on the order partial buffers merge, and reduce-side fetch
  * order is not deterministic in cluster mode — no KLL variant is
  * merge-order-insensitive, randomized ones included; the alternator
  * removes the per-task randomness and leaves the rank-error bound to
  * cover merge-order variation (the kq1v invariant's ±8% slack is ~4×
  * the observed error, so reordering cannot flip it). On local[n] and
  * single-stage aggregations the result is fully reproducible (pinned by
  * the determinism test).
  *
  * Error scale: rank error ≈ O(1/k) of n. k=200 gives ~1% observed on
  * uniform/skewed data at the tested scales.
  */
object KllSketch {

  final class Buffer(val k: Int) {
    // levels(i): unsorted buffer of doubles with weight 2^i
    var levels: Array[Array[Double]] = Array(Array.empty[Double])
    var sizes: Array[Int] = Array(0)
    var coins: Array[Boolean] = Array(false)
    // constant capacity per level (MRL-style): memory k·log(n/k), rank
    // error O(log(n/k)/k). KLL's geometrically-decaying caps for the LOW
    // levels would shave the log factor; constant caps are simpler and
    // well within the invariant's bound at k=200.
    private def cap(level: Int): Int = math.max(8, k)

    private def ensureLevel(l: Int): Unit =
      while (levels.length <= l) {
        levels = levels :+ Array.empty[Double]
        sizes = sizes :+ 0
        coins = coins :+ false
      }

    def insert(v: Double): Unit = { push(0, v); compactCascade() }

    private def push(level: Int, v: Double): Unit = {
      ensureLevel(level)
      if (sizes(level) == levels(level).length) {
        val grown = new Array[Double](math.max(16, levels(level).length * 2))
        System.arraycopy(levels(level), 0, grown, 0, sizes(level))
        levels(level) = grown
      }
      levels(level)(sizes(level)) = v
      sizes(level) += 1
    }

    private def compactCascade(): Unit = {
      var l = 0
      while (l < levels.length) {
        if (sizes(l) > cap(l)) compact(l)
        l += 1
      }
    }

    /** Sort level l, promote every other item to l+1 (deterministic
      * alternating start), clear level l.
      */
    private def compact(l: Int): Unit = {
      val n = sizes(l)
      java.util.Arrays.sort(levels(l), 0, n)
      val start = if (coins(l)) 1 else 0
      coins(l) = !coins(l)
      var i = start
      while (i < n) { push(l + 1, levels(l)(i)); i += 2 }
      sizes(l) = 0
    }

    def mergeFrom(other: Buffer): Unit = {
      var l = 0
      while (l < other.levels.length) {
        var i = 0
        while (i < other.sizes(l)) { push(l, other.levels(l)(i)); i += 1 }
        l += 1
      }
      compactCascade()
    }

    def totalWeight: Long = {
      var w = 0L
      var l = 0
      while (l < levels.length) { w += sizes(l).toLong << l; l += 1 }
      w
    }

    /** Quantile estimate: weighted rank walk over all retained items. */
    def quantile(q: Double): Double = {
      val total = totalWeight
      if (total == 0) return Double.NaN
      var m = 0
      var l = 0
      while (l < levels.length) { m += sizes(l); l += 1 }
      val items = new Array[Double](m)
      val weights = new Array[Long](m)
      var idx = 0
      l = 0
      while (l < levels.length) {
        var i = 0
        while (i < sizes(l)) {
          items(idx) = levels(l)(i); weights(idx) = 1L << l; idx += 1; i += 1
        }
        l += 1
      }
      // sort (item, weight) pairs by item
      val order = (0 until m).sortBy(items(_))
      val target = q * total
      var cum = 0.0
      var j = 0
      while (j < m) {
        cum += weights(order(j))
        if (cum >= target) return items(order(j))
        j += 1
      }
      items(order(m - 1))
    }
  }

  case class Agg(child: Expression, k: Int, q: Double,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Buffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(q >= 0.0 && q <= 1.0,
      s"quantile must be in [0, 1], got $q (out-of-range values would " +
      "silently clamp to min/max)")
    require(k >= 8, s"sketch size k must be >= 8, got $k")

    // analysis-time type check: a non-numeric column fails with a clear
    // AnalysisException instead of a mid-job NumberFormatException on
    // executors (strings are implicit-cast candidates per ANSI rules, same
    // as avg/sum)
    override def inputTypes = GraftBridge.numericInputTypes

    override def createAggregationBuffer(): Buffer = new Buffer(k)

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) b.insert(v match {
        case d: Double => d
        case f: Float => f.toDouble
        case dec: Decimal => dec.toDouble
        case n: java.lang.Number => n.doubleValue()
        case other => throw new IllegalStateException(
          s"kll_quantile: non-numeric input ${other.getClass.getName} " +
          "escaped the analysis-time type check")
      })
      b
    }

    override def merge(b: Buffer, o: Buffer): Buffer = { b.mergeFrom(o); b }

    override def eval(b: Buffer): Any = b.quantile(q)

    override def serialize(b: Buffer): Array[Byte] = {
      var bytes = 4
      var l = 0
      while (l < b.levels.length) { bytes += 4 + 1 + 8 * b.sizes(l); l += 1 }
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(b.levels.length)
      l = 0
      while (l < b.levels.length) {
        bb.putInt(b.sizes(l))
        bb.put(if (b.coins(l)) 1.toByte else 0.toByte)
        var i = 0
        while (i < b.sizes(l)) { bb.putDouble(b.levels(l)(i)); i += 1 }
        l += 1
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val bb = ByteBuffer.wrap(bytes)
      val nLevels = bb.getInt
      val b = new Buffer(k)
      b.levels = new Array[Array[Double]](nLevels)
      b.sizes = new Array[Int](nLevels)
      b.coins = new Array[Boolean](nLevels)
      var l = 0
      while (l < nLevels) {
        val n = bb.getInt
        b.coins(l) = bb.get() == 1.toByte
        b.levels(l) = new Array[Double](math.max(n, 8))
        var i = 0
        while (i < n) { b.levels(l)(i) = bb.getDouble; i += 1 }
        b.sizes(l) = n
        l += 1
      }
      b
    }

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): Agg = copy(child = c.head)
    override def withNewMutableAggBufferOffset(o: Int): Agg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): Agg =
      copy(inputAggBufferOffset = o)
  }

  /** Column API: approximate quantile via a mergeable KLL-style sketch. */
  def kllQuantile(c: Column, q: Double, k: Int = 200): Column =
    GraftBridge.column(
      Agg(GraftBridge.expression(c), k, q).toAggregateExpression())
}
