package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the standard "top k per group" window idiom
  *
  *   Project [cols w/o rn]
  *     Filter (rn <= k)
  *       Window [row_number() OVER (PARTITION BY g ORDER BY o) AS rn]
  *
  * into [[TopKPerGroupPlan]], so queries written with the row_number
  * pattern — the only way to express grouped top-k in plain SQL /
  * DataFrame code — get the bounded-heap physical operator (map-side
  * partial pass, ≤ k rows per group per partition across the shuffle, no
  * per-group sort) without being rewritten by hand.
  *
  * Conservative preconditions, all required:
  *   - the Window computes EXACTLY the row_number expression (any other
  *     window function in the same node still needs WindowExec);
  *   - the filter bounds rn by an integer literal (`rn <= k`, `rn < k`,
  *     `k >= rn`, `k > rn`, `rn = 1`);
  *   - the Project directly above drops rn (nothing downstream can see
  *     the rank — the heap operator does not produce one);
  *   - the window ORDER BY is non-empty (row_number requires it).
  *
  * Rewrite-equivalence: rows where row_number ≤ k are exactly the top-k
  * rows per group under the window order; ties at rank k are broken
  * arbitrarily by BOTH formulations (row_number's tie order is
  * nondeterministic unless the sort is total), so determinism demands a
  * unique tiebreak column in ORDER BY either way.
  *
  * Register with `SparkSessionExtensions.injectOptimizerRule` (done by
  * [[GraftExtensions]], paired with the planner strategy) or per-session
  * via `spark.experimental.extraOptimizations`.
  */
object RowNumberTopKRule extends Rule[LogicalPlan] {

  /** Above this, shuffling k rows per group per map partition stops being
    * a meaningful contraction and WindowExec's single sorted pass wins
    * (Spark's own InferWindowGroupLimit gates its analogous rewrite
    * behind a threshold for the same reason). Memory is NOT the concern —
    * the exec flushes/spills past its retained-rows threshold either way.
    */
  val MaxRewriteK = 1000

  /** Session-level escape hatch: `SET spark.graft.topk.rewrite.enabled =
    * false` restores the WindowExec plan for row_number queries without
    * detaching the extension.
    */
  val RewriteEnabledKey = "spark.graft.topk.rewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(RewriteEnabledKey, "true").toBoolean) plan
    else applyRewrite(plan)
  }

  private def applyRewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(),
            WindowSpecDefinition(part, order, _)), _)), _, _, child, _)))
        // empty PARTITION BY = global top-n: already optimal as
        // TakeOrderedAndProject, and ClusteredDistribution(Nil) would throw
        if order.nonEmpty && part.nonEmpty =>
      val rn = alias.toAttribute
      boundK(cond, rn) match {
        case Some(k) if k > 0 && k <= MaxRewriteK &&
            !projectList.exists(_.references.contains(rn)) &&
            projectList.forall(_.references.subsetOf(child.outputSet)) =>
          Project(projectList, TopKPerGroupPlan(part, order, k, child))
        case _ => p
      }
  }

  /** The inclusive rank bound, if `cond` is a literal-int bound on `rn`. */
  private def boundK(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, _))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, _))
      if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, _), a: Attribute)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(Literal(k: Int, _), a: Attribute)
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(k: Int, _))
      if k == 1 && a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(k: Int, _), a: Attribute)
      if k == 1 && a.semanticEquals(rn) => Some(1)
    case _ => None
  }
}
