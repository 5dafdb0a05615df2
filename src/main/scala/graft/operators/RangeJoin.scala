package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without an equality key: match points to the
  * intervals containing them. Spark plans a bare range predicate as a
  * BroadcastNestedLoopJoin — O(|points|·|intervals|) and an OOM'd
  * broadcast at scale. The granule trick makes it an equi-join:
  *
  *   1. bucket time into fixed granules of `granuleSeconds`;
  *   2. a point belongs to exactly ONE granule; an interval is exploded
  *      to every granule it overlaps (⌈len/granule⌉ + 1 rows);
  *   3. equi-join on the granule id, then apply the exact containment
  *      filter.
  *
  * Each (interval, point) pair meets on exactly one granule (the point's),
  * so no dedup pass is needed. Granule width trades interval-side blowup
  * (len/granule rows per interval) against join selectivity (granule
  * population); pick it near the typical interval length. Shuffles are on
  * an 8-byte granule key — the standard distributed interval-join shape
  * (cf. Flink/Trino interval joins, DuckDB IEJoin being the single-node
  * alternative).
  *
  * Column names of `points` and `intervals` must be disjoint.
  */
object RangeJoin {

  /** Inner points-in-intervals join: rows = interval columns ++ point
    * columns for every point with `startCol <= pointTime < endCol`
    * (inclusive start, exclusive end).
    */
  def pointsInIntervals(points: DataFrame, pointTime: String,
      intervals: DataFrame, startCol: String, endCol: String,
      granuleSeconds: Long = 3600L): DataFrame = {
    val g = lit(granuleSeconds)
    val pts = points.withColumn("_g",
      floor(unix_timestamp(col(pointTime)) / g))
    val ivs = intervals.withColumn("_g",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / g),
        floor(unix_timestamp(col(endCol)) / g))))
    ivs.join(pts, Seq("_g"))
      .filter(col(pointTime) >= col(startCol) &&
        col(pointTime) < col(endCol))
      .drop("_g")
  }
}
