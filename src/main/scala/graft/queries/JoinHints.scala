package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-gated broadcast hints for join sides DERIVED from corpus-scaling
  * tables (r13, generalizing j1's gate to every such site).
  *
  * A `broadcast()` hint is an assertion that the build side fits executor
  * memory. For nation/region (fixed 25/5 rows) and driver-sized aggregate
  * artifacts that is true by construction and those sites hint
  * unconditionally. But TPC-H's part/supplier/customer/orders scale WITH
  * the corpus, so every dim derived from them — filtered or not — is an
  * eventually-false assertion: free at gate scale, an executor/driver OOM
  * at some SF. The gate measures instead of believing: one memoized
  * count() of the derived frame per (corpus, site) — the same
  * frozen-corpus-statistic convention as the dedup/graph routers — times
  * the schema's per-row in-memory width. Below the cap the hint stands
  * (fact side never shuffles); above it the planner picks the exchange
  * join, which cannot change any equi-join's rows, and the decision is
  * logged on `graft.autoroute`.
  *
  * The count is a column-pruned scan of the dim derivation (not the
  * fact), runs once per JVM per site, and at 100 TB is exactly the
  * statistics pass a warehouse's CBO would have cached already.
  */
object JoinHints {

  /** ~256 MB in-memory build side — Spark's own practical broadcast
    * comfort zone; well under per-executor memory at any sane config.
    */
  val DimBroadcastBytesMax: Long = 256L * 1024 * 1024

  private val rowCounts = new ConcurrentHashMap[String, java.lang.Long]()

  private[graft] def estBytes(df: DataFrame, key: String): Long = {
    val rows = rowCounts.computeIfAbsent(key, _ => df.count()).longValue()
    // defaultSize is Catalyst's own per-type width estimate; +16 for the
    // UnsafeRow header/offset overhead of a broadcast relation row
    val width = df.schema.map(_.dataType.defaultSize).sum + 16
    rows * width
  }

  /** The gated hint. `key` must identify (corpus dir, call site) so the
    * memoized statistic never crosses corpora.
    */
  def gated(df: DataFrame, key: String,
      bytesMax: Long = DimBroadcastBytesMax): DataFrame = {
    val bytes = estBytes(df, key)
    if (bytes <= bytesMax) broadcast(df)
    else {
      graft.ext.Dedup.logRoute(key, "planner join (dim over broadcast cap)",
        f"dimBytes=${bytes.toDouble}%.3g max=$bytesMax")
      df
    }
  }
}
