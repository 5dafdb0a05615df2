package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

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
  *     emit the true top k.
  *
  * O(n log k) comparisons total, no sort, no WindowExec. Memory is
  * O(groups-per-partition × k rows) — bounded-cardinality groups are
  * assumed (the serving top-k use case; cf. ES terms aggs with fixed
  * `size`). A spilling fallback for adversarial group counts would swap
  * the hash map for Spark's ExternalAppendOnlyMap; not needed here.
  *
  * Semantics exactly match the row_number formulation when `order` ends
  * with a unique tiebreak column (ties at rank k are otherwise broken
  * arbitrarily, as row_number's are).
  */
case class TopKPerGroupPlan(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
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
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  protected override def doExecute(): RDD[InternalRow] = {
    // local copies: the closure must not capture the plan node itself
    val childOutput = child.output
    val g = groupExprs
    val ord = order
    val kk = k
    val outRows = longMetric("numOutputRows")
    val outGroups = longMetric("numGroups")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      // generated (executor-side) comparator implementing the SortOrder;
      // heap head = WORST retained row, so the comparator is reversed
      val lt = GenerateOrdering.generate(ord, childOutput)
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](
            math.max(1, math.min(kk, 16)), lt.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.offer(row.copy())
        else if (lt.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      outGroups += heaps.size()
      heaps.values.iterator().asScala.flatMap { h =>
        outRows += h.size()
        h.iterator().asScala
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
    case TopKPerGroupPlan(g, o, k, child) =>
      val gn = g.map(GraftBridge.normalizeFloatingNumbers)
      val partial = TopKPerGroupExec(gn, o, k, partial = true, planLater(child))
      TopKPerGroupExec(gn, o, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Top `k` rows of `df` per `groupCols` group, ordered by `orderCol`
    * (descending by default) with `tiebreakCols` ascending — equivalent to
    * the row_number window formulation, minus the per-group sort and the
    * full-table shuffle. Registers the planner strategy on the session on
    * first use (idempotent), so it works on ANY session, not just ones
    * built with GraftExtensions.
    */
  def topK(df: DataFrame, groupCols: Seq[String], orderCol: String, k: Int,
      desc: Boolean = true, tiebreakCols: Seq[String] = Nil): DataFrame = {
    // synchronized check-then-append: concurrent first uses (e.g. serving
    // threads) must not lose or duplicate the registration
    TopKPerGroup.synchronized {
      val exp = df.sparkSession.experimental
      if (!exp.extraStrategies.exists(_.isInstanceOf[TopKPerGroupStrategy]))
        exp.extraStrategies = exp.extraStrategies :+ new TopKPerGroupStrategy
    }
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${analyzed.output.map(_.name).mkString(",")}"))
    val order =
      SortOrder(attr(orderCol), if (desc) Descending else Ascending) +:
        tiebreakCols.map(c => SortOrder(attr(c), Ascending))
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupCols.map(attr), order, k, analyzed))
  }
}
