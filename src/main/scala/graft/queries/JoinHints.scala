package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, coalesce, col, count, length, lit, sum}
import org.apache.spark.sql.types.{BinaryType, StringType}

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
  * statistics pass over the derived frame per (corpus, site) — the same
  * frozen-corpus-statistic convention as the dedup/graph routers. Below
  * the cap the hint stands (fact side never shuffles); above it the
  * planner picks the exchange join, which cannot change any equi-join's
  * rows. BOTH decisions are logged on `graft.autoroute` with the driving
  * statistic (ADVICE r13 — the kept-broadcast branch used to be silent).
  *
  * The statistics pass is a column-pruned aggregate over the dim
  * derivation (not the fact), runs once per JVM per site, and at 100 TB
  * is exactly the pass a warehouse's CBO would have cached already. It
  * is EAGER at DataFrame-construction time — the hint decision changes
  * the plan, so it cannot be deferred to execution; plan-only consumers
  * (ShowQ, Explain) therefore run one small Spark job per gated site,
  * and the first timed run of a gated query absorbs the one-time pass
  * (Bench's min-of-two reports the warm pass).
  *
  * The memo is keyed by the caller-supplied `key` (corpus dir + site)
  * and never expires; a path whose corpus is REGENERATED within one JVM
  * (ScaleGen, test fixture rebuilds) must call [[clearStats]] or the
  * gate routes on the stale statistic (ADVICE r13).
  */
object JoinHints {

  /** ~256 MB in-memory build side — Spark's own practical broadcast
    * comfort zone; well under per-executor memory at any sane config.
    */
  val DimBroadcastBytesMax: Long = 256L * 1024 * 1024

  private val statsCache = new ConcurrentHashMap[String, java.lang.Long]()

  /** Drop every memoized size statistic — for paths that regenerate a
    * corpus at an existing location within one JVM.
    */
  def clearStats(): Unit = statsCache.clear()

  /** Estimated in-memory build-side bytes, memoized per `key`. Fixed-
    * width columns are charged Catalyst's `defaultSize`; string/binary
    * columns are MEASURED — `sum(length(c))` rides the same aggregate as
    * the row count — because `defaultSize` charges a flat 20 B for ANY
    * string, under-estimating a text-heavy dim 10–100× and keeping
    * exactly the OOM broadcast this gate exists to prevent (ADVICE r13).
    * Each measured var-width cell is charged 16 B overhead (UnsafeRow
    * offset/len word + padding) plus its bytes; +16 B per row for the
    * row header of a broadcast relation row.
    */
  private[graft] def estBytes(df: DataFrame, key: String): Long =
    statsCache.computeIfAbsent(key, _ => {
      val fields = df.schema.fields.toIndexedSeq
      val varCols = fields.filter(f =>
        f.dataType == StringType || f.dataType == BinaryType)
      val fixedWidth = fields.filterNot(f =>
        f.dataType == StringType || f.dataType == BinaryType)
        .map(_.dataType.defaultSize).sum + 16 + 16 * varCols.length
      val aggs = count(lit(1)).cast("long") +:
        varCols.map(f => coalesce(sum(length(col(f.name)).cast("long")),
          lit(0L)))
      val row = df.agg(aggs.head, aggs.drop(1): _*).head()
      val rows = row.getLong(0)
      val varBytes = varCols.indices.map(i => row.getLong(i + 1)).sum
      java.lang.Long.valueOf(rows * fixedWidth + varBytes)
    }).longValue()

  /** The gated hint. `key` must identify (corpus dir, call site) so the
    * memoized statistic never crosses corpora.
    */
  def gated(df: DataFrame, key: String,
      bytesMax: Long = DimBroadcastBytesMax): DataFrame = {
    val bytes = estBytes(df, key)
    if (bytes <= bytesMax) {
      graft.ext.Dedup.logRoute(key, "broadcast hint kept",
        f"dimBytes=${bytes.toDouble}%.3g max=$bytesMax")
      broadcast(df)
    } else {
      graft.ext.Dedup.logRoute(key, "planner join (dim over broadcast cap)",
        f"dimBytes=${bytes.toDouble}%.3g max=$bytesMax")
      df
    }
  }
}
