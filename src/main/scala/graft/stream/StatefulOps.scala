package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state beyond windowed aggregation:
  * `flatMapGroupsWithState` per-key state machines (SURVEY §2.7 T-series;
  * the primitive the built-in window/watermark operators can't express).
  *
  * [[emaUpdates]] maintains an exponential moving average per symbol across
  * micro-batches — the streaming analog of the batch SMA features
  * (batch_processor.py:111-115), recursive like the forecast loop
  * (app.py:233-239) but distributed and fault-tolerant: state lives in the
  * state store, scales with #symbols, and survives restarts via the
  * checkpoint.
  */
object StatefulOps {

  final case class CandleEvent(symbol: String, timestampMs: Long, close: Double)
  final case class EmaState(lastTs: Long, ema: Double)
  final case class EmaUpdate(symbol: String, timestampMs: Long, close: Double,
      ema: Double)

  final case class TopKState(entries: List[(Double, Long)])
  final case class TopKSnapshot(symbol: String, rank: Int, close: Double,
      timestampMs: Long)

  /** Streaming top-k per key — the stateful analog of the batch
    * [[graft.plans.TopKPerGroup]] operator: each key's state is a bounded
    * list of its k largest closes (with event-time tiebreak), re-emitted
    * as a ranked snapshot whenever it changes. State is O(k) per symbol
    * regardless of stream length; stale/duplicate deliveries that don't
    * beat the current k-th are dropped without a state write.
    *
    * The leaderboard shape ES serves with top_hits; here it survives
    * restarts via the checkpointed state store.
    */
  def topKUpdates(parsed: DataFrame, k: Int = 5): Dataset[TopKSnapshot] = {
    require(k > 0)
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.selectExpr("symbol", "timestamp_ms AS timestampMs",
        "close_price AS close")
      .as[CandleEvent]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (symbol: String, events: Iterator[CandleEvent],
         state: GroupState[TopKState]) => {
          val prev = state.getOption.getOrElse(TopKState(Nil)).entries
          // merge batch into the bounded list: sort desc by (close, -ts)
          // and keep k — equivalent to folding one-by-one, batch-order
          // independent (deterministic under replay)
          val merged = (prev ++ events.map(e => (e.close, e.timestampMs)))
            .distinct
            .sortBy { case (c, ts) => (-c, ts) }
            .take(k)
          if (merged == prev) Iterator.empty
          else {
            state.update(TopKState(merged))
            merged.iterator.zipWithIndex.map { case ((c, ts), i) =>
              TopKSnapshot(symbol, i + 1, c, ts)
            }
          }
        })
  }

  final case class FunnelEvent(userId: Long, eventType: String, es: Long)
  final case class FunnelState(viewEs: Long, converted: Boolean,
      pending: List[Long], maxEs: Long)
  final case class FunnelConversion(userId: Long, viewEs: Long,
      purchaseEs: Long)

  /** Streaming funnel detection — the stateful analog of the batch
    * `f1_funnel_conversion` query: per user, emit the first purchase that
    * follows the first view within `windowSec`. A conversion is emitted
    * exactly once per user; once emitted the decision is final (streaming
    * results are append-only where the batch query could revise).
    *
    * Cross-batch ordering, both directions:
    *  - a view arriving in a LATER batch lowers the stored view time
    *    while the user is unconverted (the batch query's global-min view);
    *  - a purchase arriving in an EARLIER batch than its qualifying view
    *    is buffered in `pending` and matched when that view lands — the
    *    r6 divergence (purchase permanently dropped) is closed.
    *
    * The buffer is watermark-bounded, not unbounded: a pending purchase
    * is pruned once it can no longer qualify against ANY future view —
    * either the stored earliest view already places it outside the window
    * (views only ever get earlier, so `p > viewEs + windowSec` is final),
    * or it has fallen `latenessSec` behind the key's max event time (the
    * per-key watermark horizon for out-of-order views). State is
    * therefore O(pending-inside-horizon) per user, independent of stream
    * length.
    */
  def funnelConversions(events: Dataset[FunnelEvent],
      windowSec: Long = 3600L,
      latenessSec: Long = 3600L): Dataset[FunnelConversion] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[FunnelEvent],
         state: GroupState[FunnelState]) => {
          var st = state.getOption.getOrElse(
            FunnelState(Long.MinValue, false, Nil, Long.MinValue))
          // Re-inject buffered purchases as synthetic events and process
          // the UNION in event-time order — an eager state-buffer match on
          // the view branch would let a buffered purchase@1000 beat an
          // in-batch purchase@100 after view@50 (the r8 ADVICE bug: the
          // emitted purchase must be the FIRST qualifying one). maxEs is
          // unaffected: a buffered p was folded into maxEs when it first
          // arrived, so the re-run max() is a no-op.
          val buffered = st.pending.map(p => FunnelEvent(userId, "purchase", p))
          st = st.copy(pending = Nil)
          val sorted = (batch.toSeq ++ buffered).sortBy(e => (e.es, e.eventType))
          val out = sorted.flatMap { e =>
            st = st.copy(maxEs = math.max(st.maxEs, e.es))
            e.eventType match {
              case "view" if !st.converted &&
                  (st.viewEs == Long.MinValue || e.es < st.viewEs) =>
                st = st.copy(viewEs = e.es)
                None
              case "purchase" if !st.converted && st.viewEs != Long.MinValue &&
                  e.es > st.viewEs && e.es <= st.viewEs + windowSec =>
                st = st.copy(converted = true, pending = Nil)
                Some(FunnelConversion(userId, st.viewEs, e.es))
              case "purchase" if !st.converted =>
                st = st.copy(pending = e.es :: st.pending)
                None
              case _ => None
            }
          }
          if (!st.converted)
            st = st.copy(pending = st.pending.filter { p =>
              val stillInAnyWindow =
                st.viewEs == Long.MinValue || p <= st.viewEs + windowSec
              stillInAnyWindow && p >= st.maxEs - latenessSec
            })
          state.update(st)
          out.iterator
        })
  }

  final case class LastSeenState(value: Double, lastTs: Long)
  final case class LastSeenOut(symbol: String, value: Double, lastTs: Long,
      expired: Boolean)
  /** Carries the WATERMARKED event-time column through to the stateful
    * operator — EventTimeTimeout requires it to survive the projection
    * (a plain CandleEvent selection silently severs the watermark and
    * the query is rejected at analysis).
    */
  final case class WmCandleEvent(symbol: String, timestampMs: Long,
      close: Double, eventTimestamp: java.sql.Timestamp)

  /** Per-key last-value cache with EVENT-TIME TTL eviction — the state-
    * lifecycle mechanism the NoTimeout machines above don't exercise:
    * a key that goes silent past `ttlMs` beyond the watermark has its
    * state REMOVED via `GroupStateTimeout.EventTimeTimeout`, emitting a
    * tombstone row (`expired = true`). Without this, per-key state grows
    * one entry per key EVER seen — unbounded under key churn, the
    * classic slow state-store death at 100 TB ingest. Input must be
    * watermarked (EventTimeTimeout derives eviction from the watermark).
    */
  def lastSeenWithTtl(watermarked: DataFrame, ttlMs: Long = 3600000L)
      : Dataset[LastSeenOut] = {
    val spark = watermarked.sparkSession
    import spark.implicits._
    watermarked.selectExpr("symbol", "timestamp_ms AS timestampMs",
        "close_price AS close", "event_timestamp AS eventTimestamp")
      .as[WmCandleEvent]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (symbol: String, events: Iterator[WmCandleEvent],
         state: GroupState[LastSeenState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(LastSeenOut(symbol, st.value, st.lastTs,
              expired = true))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.timestampMs, e.close))
            var st = state.getOption.getOrElse(
              LastSeenState(Double.NaN, Long.MinValue))
            sorted.foreach { e =>
              if (e.timestampMs > st.lastTs)
                st = LastSeenState(e.close, e.timestampMs)
            }
            state.update(st)
            // evict when the WATERMARK passes lastTs + ttl: silence is
            // measured in event time, so replays don't reset the clock
            state.setTimeoutTimestamp(st.lastTs + ttlMs)
            Iterator.single(LastSeenOut(symbol, st.value, st.lastTs,
              expired = false))
          }
        })
  }

  /** Per-symbol EMA over the candle stream. Events inside a batch are
    * folded in event-time order (the state machine is order-sensitive, so
    * we sort the group's batch — bounded by trigger size, not stream
    * length). alpha is the standard smoothing factor.
    */
  def emaUpdates(parsed: DataFrame, alpha: Double = 0.3): Dataset[EmaUpdate] = {
    val spark = parsed.sparkSession
    import spark.implicits._
    parsed.selectExpr("symbol", "timestamp_ms AS timestampMs",
        "close_price AS close")
      .as[CandleEvent]
      .groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (symbol: String, events: Iterator[CandleEvent],
         state: GroupState[EmaState]) => {
          val sorted = events.toSeq.sortBy(e => (e.timestampMs, e.close))
          var st = state.getOption.getOrElse(EmaState(Long.MinValue, Double.NaN))
          val out = sorted.flatMap { e =>
            if (e.timestampMs <= st.lastTs) {
              None // stale/duplicate candle: state never goes backwards
            } else {
              val ema =
                if (st.ema.isNaN) e.close
                else alpha * e.close + (1 - alpha) * st.ema
              st = EmaState(e.timestampMs, ema)
              Some(EmaUpdate(symbol, e.timestampMs, e.close, ema))
            }
          }
          if (out.nonEmpty) state.update(st)
          out.iterator
        })
  }
}
