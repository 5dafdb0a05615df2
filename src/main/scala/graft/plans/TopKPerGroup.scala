package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Whole-operator Catalyst extension: top-k rows per group with bounded
  * heaps, the (c)-tier custom operator of the build plan (logical node +
  * planner strategy + physical exec).
  *
  * Spark expresses "top k per group" as
  * `row_number().over(Window.partitionBy(g).orderBy(o)) <= k`, which plans
  * as Exchange → FULL SORT of every row within each group → WindowExec →
  * Filter. The sort is O(n log n) in GROUP size and — the real problem at
  * 100 TB — every input row crosses the shuffle.
  *
  * [[TopKPerGroupExec]] instead keeps one k-bounded binary heap per group:
  *
  *   - partial pass (map side): each input partition emits at most k rows
  *     per group it sees — the shuffle then carries ≤ k·partitions rows per
  *     group instead of the whole table, the same contraction partial
  *     aggregation gives hash aggregates;
  *   - final pass (reduce side, after the group-keyed exchange inserted by
  *     `requiredChildDistribution`): re-heap the ≤ k·partitions survivors,
  *     emit the true top k, sorted best-first within each group.
  *
  * O(n log k) comparisons total, no sort, no WindowExec.
  *
  * Memory safety for adversarial group cardinality (high-cardinality
  * partition keys, e.g. top-k per user_id) — the heap map is NOT allowed
  * to grow without bound; past `spark.graft.topk.spill.threshold.rows`
  * retained heap rows per task:
  *
  *   - the partial pass FLUSHES: emits its current heaps downstream and
  *     clears the map. Always correct (the final pass re-reduces), merely
  *     weakens the map-side contraction for the flushed groups — the same
  *     trade partial hash aggregation makes when its map fills;
  *   - the final pass SPILLS: writes the map as a run file sorted by
  *     group-key bytes, clears, continues; on emit it streams a k-way
  *     merge of the spilled runs plus the in-memory remainder, one group
  *     at a time (O(runs × k) rows in memory). UnsafeRow binary equality
  *     is value equality for grouping keys (the hash map already relies
  *     on it), so byte order is a valid — if arbitrary — total order to
  *     merge on.
  *
  * Output ordering: rows WITHIN a group are emitted best-first (the window
  * order), matching what the row_number formulation's WindowExec produced;
  * the order OF groups is unspecified, like any hash-based operator.
  *
  * Semantics exactly match the row_number formulation when `order` ends
  * with a unique tiebreak column (ties at rank k are otherwise broken
  * arbitrarily, as row_number's are).
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan,
    distinctRows: Boolean = false) extends UnaryNode {
  require(k > 0, s"topK requires k > 0, got $k")
  require(groupExprs.nonEmpty,
    "topK requires grouping keys — global top-k is orderBy(...).limit(k), " +
    "which Spark already plans as TakeOrderedAndProject")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Physical bounded-heap top-k per group; see [[TopKPerGroupPlan]].
  * `partial = true` runs map-side on whatever partitioning the child has;
  * `partial = false` demands clustering on the group keys, so
  * EnsureRequirements inserts the one hash exchange between the two.
  */
case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan,
    distinctRows: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numGroups" -> SQLMetrics.createMetric(sparkContext, "number of groups"),
    "spillCount" -> SQLMetrics.createMetric(sparkContext,
      if (partial) "number of map flushes" else "number of spilled runs"))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    // local copies: the closure must not capture the plan node itself
    val childOutput = child.output
    val g = groupExprs
    val ord = order
    val kk = k
    val isPartial = partial
    val dedup = distinctRows
    val thresholdRows = conf.getConfString(
      TopKPerGroup.SpillThresholdKey, TopKPerGroup.SpillThresholdDefault).toLong
    val thresholdBytes = conf.getConfString(
      TopKPerGroup.SpillThresholdBytesKey,
      TopKPerGroup.SpillThresholdBytesDefault).toLong
    val outRows = longMetric("numOutputRows")
    val outGroups = longMetric("numGroups")
    val spills = longMetric("spillCount")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      // identity projection: heap rows must be UnsafeRows so a spilled run
      // can serialize them as raw bytes (shuffle rows already are; this
      // makes it a guarantee, not an assumption)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      // generated (executor-side) comparator implementing the SortOrder;
      // heap head = WORST retained row, so the comparator is reversed
      val lt = GenerateOrdering.generate(ord, childOutput)
      val acc = new TopKPerGroup.HeapMap(kk, lt, dedup)
      def overThreshold: Boolean =
        acc.retainedRows >= thresholdRows || acc.retainedBytes >= thresholdBytes

      if (isPartial) {
        // flush-on-threshold: bounded memory, correctness unaffected (the
        // final pass re-reduces whatever multiplicity we emit)
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!cur.hasNext && iter.hasNext) {
              while (iter.hasNext && !overThreshold)
                acc.insert(keyProj, toUnsafe, iter.next())
              if (overThreshold && iter.hasNext) spills += 1
              // numGroups is only meaningful on the final pass: a group
              // straddling several flushes would be counted once per flush
              cur = acc.drainAll() // arbitrary order: only final output order is user-visible
            }
            cur.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            outRows += 1
            cur.next()
          }
        }
      } else {
        // final pass: spill-to-sorted-runs + streaming k-way merge
        val runs = scala.collection.mutable.ArrayBuffer.empty[File]
        val tc = TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          runs.foreach(f => if (f.exists()) f.delete())
        }
        while (iter.hasNext) {
          acc.insert(keyProj, toUnsafe, iter.next())
          if (overThreshold && iter.hasNext) {
            val f = GraftBridge.createTempSpillFile("graft-topk-run")
            acc.spillSortedRun(f)
            runs += f
            spills += 1
          }
        }
        val out: Iterator[InternalRow] =
          if (runs.isEmpty) acc.drainAllSorted(outGroups)
          else {
            spills += 1 // the in-memory remainder becomes the last run
            val tail = GraftBridge.createTempSpillFile("graft-topk-run")
            acc.spillSortedRun(tail)
            runs += tail
            TopKPerGroup.mergeRuns(runs.toSeq, childOutput.length,
              kk, lt, outGroups, dedup)
          }
        out.map { r => outRows += 1; r }
      }
    }, preservesPartitioning = true)
  }
}

/** Plans [[TopKPerGroupPlan]] as partial → (exchange) → final.
  *
  * Float/double group keys are normalized here (-0.0 → 0.0, one NaN bit
  * pattern): Catalyst's NormalizeFloatingNumbers rule does this for
  * Window/Aggregate keys but does not know our node — without it, 0.0 and
  * -0.0 keys would hash to different shuffle partitions AND different
  * heap-map entries, splitting one logical group in two. Normalizing at
  * planning time covers both (the exchange hashes the normalized
  * expressions from requiredChildDistribution, and the heaps project them).
  */
class TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child, dedup) =>
      val gn = g.map(GraftBridge.normalizeFloatingNumbers)
      val partial = TopKPerGroupExec(gn, o, k, partial = true,
        planLater(child), dedup)
      TopKPerGroupExec(gn, o, k, partial = false, partial, dedup) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Retained-heap bounds per task before the partial pass flushes / the
    * final pass spills a sorted run — whichever of the row- or byte-count
    * trips first. The BYTE bound is the real memory guard (2M retained
    * copies of a 5 KB text row is 10 GB; a row count alone cannot see
    * that); the row bound keeps the hash map itself from ballooning on
    * tiny rows. Honest scope: the accounting is our own (UnsafeRow
    * sizes), not registered with Spark's TaskMemoryManager, so other
    * consumers cannot force this operator to spill — size the byte
    * threshold so threads-per-executor × threshold fits in the executor
    * heap alongside them (default 256 MB).
    */
  val SpillThresholdKey = "spark.graft.topk.spill.threshold.rows"
  val SpillThresholdDefault: String = (2L * 1024 * 1024).toString
  val SpillThresholdBytesKey = "spark.graft.topk.spill.threshold.bytes"
  val SpillThresholdBytesDefault: String = (256L * 1024 * 1024).toString

  /** One k-bounded heap per group key, with the bookkeeping both exec
    * passes share. Not thread-safe (per-task use only).
    *
    * `dedup` (r16, the knnJoin multiplicity fold): a row that compares
    * EQUAL under the full sort order to a row already retained for its
    * group is skipped. With a unique tiebreak column the order
    * determines the row, so this makes top-k-over-a-MULTISET equal
    * top-k-over-the-SET without a distinct ever materializing — and the
    * k-bounded heap keeps the check O(k). Exactness of the multiset
    * fold: duplicates never coexist in a heap (the insert check), and a
    * duplicate of an EVICTED row cannot re-enter — eviction only
    * happens for a STRICTLY better row, so after eviction every
    * retained row is strictly better than the evictee and its twin is
    * rejected by the ordinary bound check.
    */
  final class HeapMap(k: Int, lt: java.util.Comparator[InternalRow],
      dedup: Boolean = false) {
    private val heaps =
      new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
    var retainedRows: Long = 0L
    var retainedBytes: Long = 0L
    def numGroups: Int = heaps.size()

    private def containsEqual(heap: java.util.PriorityQueue[UnsafeRow],
        row: InternalRow): Boolean = {
      val it = heap.iterator()
      while (it.hasNext) {
        if (lt.compare(row, it.next()) == 0) return true
      }
      false
    }

    def insert(keyProj: UnsafeProjection, toUnsafe: UnsafeProjection,
        row: InternalRow): Unit = {
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[UnsafeRow](
          math.max(1, math.min(k, 16)), lt.reversed())
        val kc = key.copy()
        retainedBytes += kc.getSizeInBytes
        heaps.put(kc, heap)
      }
      if (heap.size < k) {
        if (!(dedup && containsEqual(heap, row))) {
          val rc = toUnsafe(row).copy()
          retainedBytes += rc.getSizeInBytes
          heap.offer(rc)
          retainedRows += 1
        }
      } else if (lt.compare(row, heap.peek()) < 0) {
        if (!(dedup && containsEqual(heap, row))) {
          retainedBytes -= heap.poll().getSizeInBytes
          val rc = toUnsafe(row).copy()
          retainedBytes += rc.getSizeInBytes
          heap.offer(rc)
        }
      }
    }

    /** Heap contents best-first (poll order is worst-first). */
    private def sortedRows(h: java.util.PriorityQueue[UnsafeRow]): Array[UnsafeRow] = {
      val out = new Array[UnsafeRow](h.size)
      var i = out.length - 1
      while (i >= 0) { out(i) = h.poll(); i -= 1 }
      out
    }

    /** Emit everything in arbitrary group / arbitrary row order, clearing
      * the map (partial-pass flush — ordering there is invisible).
      */
    def drainAll(): Iterator[InternalRow] = {
      import scala.jdk.CollectionConverters._
      val vs = heaps.values().asScala.toArray
      heaps.clear()
      retainedRows = 0
      retainedBytes = 0
      vs.iterator.flatMap(_.iterator().asScala)
    }

    /** Emit per-group best-first (final output contract), clearing the map. */
    def drainAllSorted(outGroups: org.apache.spark.sql.execution.metric.SQLMetric)
        : Iterator[InternalRow] = {
      import scala.jdk.CollectionConverters._
      outGroups += heaps.size()
      val vs = heaps.values().asScala.toArray
      heaps.clear()
      retainedRows = 0
      retainedBytes = 0
      vs.iterator.flatMap(h => sortedRows(h).iterator)
    }

    /** Write the map as a run file sorted by key bytes, then clear it.
      * Entry layout: [keyLen][keyBytes][nRows]([rowLen][rowBytes])*.
      */
    def spillSortedRun(file: File): Unit = {
      val keys = heaps.keySet().toArray(new Array[UnsafeRow](0))
      java.util.Arrays.sort(keys, KeyBytesOrder)
      val out = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(file), 1 << 16))
      try {
        out.writeInt(keys.length)
        var i = 0
        while (i < keys.length) {
          val kb = keys(i).getBytes
          out.writeInt(kb.length); out.write(kb)
          val rows = sortedRows(heaps.get(keys(i)))
          out.writeInt(rows.length)
          var j = 0
          while (j < rows.length) {
            val b = rows(j).getBytes
            out.writeInt(b.length); out.write(b)
            j += 1
          }
          i += 1
        }
      } finally out.close()
      heaps.clear()
      retainedRows = 0
      retainedBytes = 0
    }
  }

  /** Unsigned-lexicographic byte order on UnsafeRow keys: arbitrary but
    * total and consistent across runs, and byte-equal ⇔ value-equal for
    * grouping keys — all a spill merge needs.
    */
  private object KeyBytesOrder extends java.util.Comparator[UnsafeRow] {
    override def compare(a: UnsafeRow, b: UnsafeRow): Int =
      compareBytes(a.getBytes, b.getBytes)
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Sequential reader over one spilled run (entries in key-byte order). */
  private final class RunReader(file: File, numRowFields: Int) {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(file), 1 << 16))
    private var remaining = in.readInt()
    var keyBytes: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    def close(): Unit = in.close()
    def advance(): Boolean =
      if (remaining <= 0) { in.close(); false }
      else {
        remaining -= 1
        keyBytes = new Array[Byte](in.readInt()); in.readFully(keyBytes)
        rows = new Array[UnsafeRow](in.readInt())
        var i = 0
        while (i < rows.length) {
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          val r = new UnsafeRow(numRowFields)
          r.pointTo(b, b.length)
          rows(i) = r
          i += 1
        }
        true
      }
  }

  /** Streaming k-way merge of spilled runs: one group in memory at a time
    * (≤ runs × k rows), emitting each group's true top-k best-first.
    */
  private[plans] def mergeRuns(files: Seq[File], numRowFields: Int,
      k: Int, lt: java.util.Comparator[InternalRow],
      outGroups: org.apache.spark.sql.execution.metric.SQLMetric,
      dedup: Boolean = false)
      : Iterator[InternalRow] = {
    val pq = new java.util.PriorityQueue[RunReader](math.max(1, files.size),
      (x: RunReader, y: RunReader) => compareBytes(x.keyBytes, y.keyBytes))
    val readers = files.map(new RunReader(_, numRowFields))
    // a downstream limit may abandon the merge mid-stream: close every
    // reader at task end, not just the exhausted ones
    val tc = TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
      readers.foreach(r => try r.close() catch { case _: Exception => })
    }
    readers.foreach { r => if (r.advance()) pq.offer(r) }
    new Iterator[InternalRow] {
      private var cur: Iterator[InternalRow] = Iterator.empty
      override def hasNext: Boolean = {
        while (!cur.hasNext && !pq.isEmpty) {
          // pop every reader positioned on the minimal key, re-reduce
          // their (already top-k, already sorted) row lists into one heap
          val first = pq.poll()
          val key = first.keyBytes
          val heap = new java.util.PriorityQueue[UnsafeRow](
            math.max(1, math.min(k, 16)), lt.reversed())
          def containsEqual(r: UnsafeRow): Boolean = {
            val it = heap.iterator()
            while (it.hasNext) {
              if (lt.compare(r, it.next()) == 0) return true
            }
            false
          }
          def fold(rows: Array[UnsafeRow]): Unit = {
            var i = 0
            while (i < rows.length) {
              val r = rows(i)
              if (heap.size < k) {
                if (!(dedup && containsEqual(r))) heap.offer(r): Unit
              } else if (lt.compare(r, heap.peek()) < 0) {
                if (!(dedup && containsEqual(r))) { heap.poll(); heap.offer(r): Unit }
              }
              i += 1
            }
          }
          fold(first.rows)
          if (first.advance()) pq.offer(first)
          while (!pq.isEmpty && compareBytes(pq.peek().keyBytes, key) == 0) {
            val r = pq.poll()
            fold(r.rows)
            if (r.advance()) pq.offer(r)
          }
          outGroups += 1
          val sorted = new Array[UnsafeRow](heap.size)
          var i = sorted.length - 1
          while (i >= 0) { sorted(i) = heap.poll(); i -= 1 }
          cur = sorted.iterator
        }
        cur.hasNext
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        cur.next()
      }
    }
  }

  /** Top `k` rows of `df` per `groupCols` group, ordered by `orderCol`
    * (descending by default) with `tiebreakCols` ascending — equivalent to
    * the row_number window formulation, minus the per-group sort and the
    * full-table shuffle. Registers the planner strategy on the session on
    * first use (idempotent), so it works on ANY session, not just ones
    * built with GraftExtensions.
    */
  /** `distinctRows = true` folds rows that compare EQUAL under the full
    * (orderCol, tiebreakCols) order into one retained row per group —
    * top-k of a multiset equals top-k of its set, with no distinct
    * exchange. Only valid when the order FUNCTIONALLY DETERMINES the
    * row within a group (a unique tiebreak whose equal rows are
    * identical rows, e.g. candidate pairs duplicated across LSH
    * tables); otherwise which duplicate survives is arbitrary.
    */
  def topK(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int,
      desc: Boolean = true, tiebreakCols: Seq[String] = Nil,
      distinctRows: Boolean = false): DataFrame = {
    // synchronized check-then-append: concurrent first uses (e.g. serving
    // threads) must not lose or duplicate the registration
    TopKPerGroup.synchronized {
      val exp = df.sparkSession.experimental
      if (!exp.extraStrategies.exists(_.isInstanceOf[TopKPerGroupStrategy]))
        exp.extraStrategies = exp.extraStrategies :+ new TopKPerGroupStrategy
    }
    val analyzed = df.queryExecution.analyzed
    // session-conf resolver: case-insensitive unless spark.sql.caseSensitive,
    // matching every built-in DataFrame API
    val resolve = GraftBridge.resolver(df.sparkSession)
    def attr(name: String): Attribute =
      analyzed.output.filter(a => resolve(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"column '$name' is ambiguous: matches ${many.map(_.name).mkString(",")}")
      }
    val order =
      SortOrder(attr(orderCol), if (desc) Descending else Ascending) +:
        tiebreakCols.map(c => SortOrder(attr(c), Ascending))
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed, distinctRows))
  }
}
