package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. At 100 TB a handful of hot keys (one symbol,
  * one user, one boilerplate document) can pin a single reducer; salting
  * splits each key across `salts` reducers with a two-phase aggregation:
  *
  *   phase 1: groupBy(key, salt)  — partial aggregates, salt from a hash of
  *            a high-cardinality column (deterministic, no rand())
  *   phase 2: groupBy(key)        — merge partials
  *
  * AQE's skew-join handling covers joins; this covers aggregations whose
  * per-key state is large (the case AQE cannot split).
  */
object SkewSafe {

  /** Sum `valueCol` per `key` with two-phase salted aggregation. The salt
    * derives from `saltSource` (any column that varies within a key) so the
    * result is deterministic run-to-run — `rand()`-based salting breaks
    * retry idempotency.
    */
  def saltedSum(df: DataFrame, key: Column, valueCol: Column,
      saltSource: Column, salts: Int = 16): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(saltSource), lit(salts)).as("salt"))
      .agg(sum(valueCol).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("total"))
}
