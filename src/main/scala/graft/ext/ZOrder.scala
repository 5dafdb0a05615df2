package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data skipping.
  *
  * A table laid out by ONE sort key skips files only for predicates on
  * that key; a 100 TB events table queried by both user and value range
  * scans everything for the second dimension. Interleaving the bits of
  * both dimensions into one key and range-partitioning + sorting by it
  * bounds every file to a small rectangle in (x, y) space, so parquet
  * min/max footer stats prune files for predicates on EITHER dimension
  * (the principle behind Delta/Iceberg Z-ordering; Morton 1966).
  *
  * The key is pure integer bit arithmetic — codegen'd comparisons,
  * shifts and masks, no UDF — and the layout pass is one
  * repartitionByRange (a range exchange over the compact key only) plus
  * an in-partition sort: exactly the cost of a single-column layout.
  */
object ZOrder {

  /** Interleave the low 8 bits of x (odd positions) and y (even
    * positions) into a 16-bit Morton key. Inputs must already be
    * bucketed to [0, 256). Native codegen'd expression (3 parallel-
    * prefix rounds per operand — see [[graft.functions.Morton]]); also
    * registered as SQL `zorder_key(x, y)` by GraftExtensions.
    */
  def zkey(x: Column, y: Column): Column =
    graft.functions.Expressions.zorderKey8(x.cast("long"), y.cast("long"))

  /** Events table with 8-bit (user, value) buckets and their z-key.
    * The value dimension is sqrt-bucketed: `value` is right-skewed
    * (median 35, max 490), so fixed-width bins would pile most rows into
    * a few low buckets and every file's envelope would touch them —
    * killing the skip. Balancing bucket occupancy before interleaving is
    * the same move production Z-ordering makes with quantile binning;
    * sqrt is a deterministic, oracle-reproducible stand-in for this
    * distribution.
    */
  def eventsZKeyed(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val xb = col("user_id").bitwiseAND(lit(255L))
    val yb = least(floor(sqrt(col("value")) * 8.0).cast("long"), lit(255L))
    s.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), xb.as("user_bucket"), yb.as("value_bucket"))
      .withColumn("zkey", zkey(col("user_bucket"), col("value_bucket")))
  }

  /** Write `df` clustered by the z-order of (xBucket, yBucket) into
    * `nFiles` range partitions. Each output file then covers a compact
    * rectangle of the 2-d space, which its parquet footer min/max
    * advertise to the scan planner.
    */
  def writeZOrdered(df: DataFrame, xBucket: Column, yBucket: Column,
      outPath: String, nFiles: Int): Unit =
    df.withColumn("_zkey", zkey(xBucket, yBucket))
      .repartitionByRange(nFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      // layout helper only — the key must not leak into (and double the
      // storage of) the public table schema
      .drop("_zkey")
      .write.mode("overwrite").parquet(outPath)

  /** Per-file (min, max) envelope of two columns — read back from the
    * written layout; the fraction of files whose envelope intersects a
    * query rectangle is exactly the fraction a stats-based scan planner
    * would read.
    */
  def fileEnvelopes(s: SparkSession, path: String, xCol: String,
      yCol: String): DataFrame =
    s.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(xCol).as("x_min"), max(xCol).as("x_max"),
        min(yCol).as("y_min"), max(yCol).as("y_max"))
}
