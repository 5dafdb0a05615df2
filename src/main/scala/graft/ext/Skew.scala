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

  /** Hot-key-capped equi-join (VERDICT r5 item 3) — the LSH-bucket-join
    * skew guard. A bucketed candidate join (`l ⋈ r` on band/bucket keys)
    * is all-pairs WITHIN each key: one pathological bucket (the all-zeros
    * SimHash of boilerplate, an LSH bucket of templated docs) pins a
    * single task with quadratic work. This join:
    *
    *   1. sizes every key on the r side (one agg over compact keys);
    *   2. keys with > `cap` rows get g = ceil(n/cap) sub-keys — r rows
    *      are salted by `rSaltExpr % g` (deterministic, retry-safe),
    *      l rows are replicated across all g sub-keys;
    *   3. cold keys (the overwhelming majority) join unchanged with
    *      salt 0 — zero overhead on the common path.
    *
    * COMPLETE: every (l, r) key match appears exactly once — an l row
    * meets each r row at exactly the r row's salt. Per-task hash-side
    * size is ≤ cap, so the quadratic block spreads across g tasks
    * instead of pinning one. The hot-key list is broadcast (hot keys are
    * few by definition; at 100 TB it's the tiny tail of the size
    * histogram). Same discipline as d3's df-ordered prefix join.
    *
    * `l` and `r` must share ONLY the key columns (pre-rename payload
    * columns, as candidate joins already do).
    */
  def cappedEquiJoin(l: DataFrame, r: DataFrame, keyCols: Seq[String],
      rSaltExpr: Column, cap: Int = 1024): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val keyCs = keyCols.map(col)
    val hot = r.groupBy(keyCs: _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(keyCs :+ ceil(col("__n") / cap).cast("int").as("__g"): _*)
    val rs = r.join(broadcast(hot), keyCols, "left")
      .withColumn("__salt",
        when(col("__g").isNull, lit(0))
          .otherwise(pmod(rSaltExpr, col("__g")).cast("int")))
      .drop("__g")
    val ls = l.join(broadcast(hot), keyCols, "left")
      .withColumn("__salt",
        explode(when(col("__g").isNull, array(lit(0)))
          .otherwise(sequence(lit(0), col("__g") - 1))))
      .drop("__g")
    ls.join(rs, keyCols :+ "__salt").drop("__salt")
  }
}
