package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for Spark 4's connect-compatible Column
  * (which no longer exposes a public Expression constructor). Lives in the
  * spark.sql package to reach the `private[sql]` classic converters — the
  * standard idiom for Catalyst-extending libraries.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (for operators that insert their
    * own plan nodes, e.g. graft.plans.TopKPerGroup).
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Float/double key normalization (-0.0 → 0.0, canonical NaN) for custom
    * grouping operators — same treatment Catalyst applies to Window /
    * Aggregate keys (the rule's `normalize` is private[sql]).
    */
  def normalizeFloatingNumbers(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
