package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time join): for each left row, the payload of the
  * LATEST right row whose time is <= the left row's time, per key — the
  * time-series join Spark's API lacks (DuckDB `ASOF JOIN`, kdb `aj`,
  * pandas `merge_asof`).
  *
  * Expressing it as `l.ts >= r.ts` + groupBy-max makes Spark plan a
  * BroadcastNestedLoopJoin (range conditions have no hash/merge path) and
  * explodes matches before reducing them — quadratic per key. This
  * implementation is the composed-operator form (SURVEY preference (a)):
  *
  *   1. tag both sides and UNION them (right payload as one struct,
  *      null on left rows);
  *   2. one window pass per key ordered by (time, right-before-left):
  *      `last(payload, ignoreNulls)` up to the current row IS the as-of
  *      match;
  *   3. keep left rows, unpack the matched struct.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the join key (the same exchange a
  * plain equi-join would pay), sort within partitions, no match explosion
  * — at 100 TB this is the difference between a running job and a
  * nested-loop that never finishes. Skewed keys shard like any other
  * window (salt upstream if one key dominates).
  *
  * Right rows must be unique per (keys, rightTime) — pre-aggregate ties
  * (e.g. `max_by`) or matches are nondeterministic; left duplicates are
  * fine.
  */
object AsOfJoin {

  /** Left as-of join. `right`'s column names must not collide with
    * `left`'s except the key columns; rename upstream. Right payload
    * columns come back nullable (no prior right row → nulls), with
    * `rightTime` available as a payload column if listed.
    *
    * @param toleranceSeconds if set, matches older than this many seconds
    *   before the left time are nulled out (both time columns must be
    *   timestamps) — `merge_asof(tolerance=...)` semantics.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    unpack(core(left, right, on, leftTime, rightTime, rightPayload,
      toleranceSeconds), left, rightPayload)

  /** Inner form: left rows without an as-of match are dropped. */
  def innerAsOf(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame =
    unpack(core(left, right, on, leftTime, rightTime, rightPayload,
      toleranceSeconds).filter(col("_asof").isNotNull), left, rightPayload)

  private def unpack(matched: DataFrame, left: DataFrame,
      rightPayload: Seq[String]): DataFrame =
    matched.select(
      left.columns.map(c => col(s"_lrow.$c").as(c)).toIndexedSeq ++
        rightPayload.map(p => col(s"_asof.$p").as(p)): _*)

  private def core(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      toleranceSeconds: Option[Long]): DataFrame = {
    require(on.nonEmpty, "as-of join needs at least one equality key")
    val payloadStruct = struct(
      (col(rightTime).as("_t") +: rightPayload.map(col)): _*)
    val rpType = right.select(payloadStruct).schema.head.dataType
    val lRowStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lrType = left.select(lRowStruct).schema.head.dataType

    val lpart = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("_time"), lit(0).as("_is_r"),
        lit(null).cast(rpType).as("_rp"), lRowStruct.as("_lrow")): _*)
    val rpart = right.select(
      on.map(col) ++ Seq(
        col(rightTime).as("_time"), lit(1).as("_is_r"),
        payloadStruct.as("_rp"), lit(null).cast(lrType).as("_lrow")): _*)

    // at equal time the right row sorts FIRST so `<=` matches see it
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_time").asc, col("_is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lpart.unionByName(rpart)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_is_r") === 0)

    toleranceSeconds.fold(matched) { tol =>
      matched.withColumn("_asof",
        when(unix_timestamp(col("_time")) -
          unix_timestamp(col("_asof._t")) <= tol, col("_asof")))
    }
  }
}
