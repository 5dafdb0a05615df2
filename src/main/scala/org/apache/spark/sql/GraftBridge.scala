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

  /** The `NumericType` abstract-type marker for `ExpectsInputTypes`
    * (`private[spark]` in Spark — how built-in numeric aggregates like
    * Average declare `inputTypes = Seq(NumericType)`).
    */
  val numericInputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.NumericType)

  /** (long, long) input spec for binary integer expressions. */
  val longLongInputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)

  /** Session-conf column resolver (case-insensitive unless
    * `spark.sql.caseSensitive`), so custom operators resolve names the way
    * every built-in DataFrame API does.
    */
  def resolver(spark: SparkSession): (String, String) => Boolean =
    spark.asInstanceOf[classic.SparkSession].sessionState.conf.resolver

  /** Executor-local spill file via the DiskBlockManager (`private[spark]`),
    * so operator spills land on `spark.local.dir` with the shuffle/sort
    * spills rather than `java.io.tmpdir`; falls back for driver-side use
    * outside a SparkEnv.
    */
  def createTempSpillFile(prefix: String): java.io.File = {
    val env = org.apache.spark.SparkEnv.get
    if (env != null) env.blockManager.diskBlockManager.createTempLocalBlock()._2
    else java.io.File.createTempFile(prefix, ".bin")
  }
}
