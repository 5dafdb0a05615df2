package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Expressions.fnv1a64

/** Ingest-time EXACT dedup — the streaming shape of `d1_dedup_exact`:
  * drop any arriving document whose content was already seen, where
  * "already seen" is bounded by an event-time watermark horizon.
  *
  * Built on `dropDuplicatesWithinWatermark` keyed on the 64-bit content
  * fingerprint, NOT the raw text: state is 8 bytes + timestamp per
  * distinct document instead of the full text (the same
  * compact-shuffle-key discipline as the batch dedup family), and the
  * watermark bounds state size by ingest horizon rather than corpus
  * size — the property that makes this runnable forever at 100 TB/day.
  * Within-batch duplicates collapse too (keeper is the first row
  * encountered, deterministic per batch replay because state commits
  * per epoch).
  *
  * The tradeoff vs batch d1 is explicit: a duplicate arriving AFTER its
  * original has aged past the watermark is re-admitted. That is the
  * correct contract for ingest gating (the batch pipeline's periodic
  * full dedup catches stragglers); an unbounded-state exact gate would
  * OOM the state store on an unbounded stream.
  */
object StreamDedup {

  /** `stream` must carry (doc_id, text, event_ts: timestamp). Emits the
    * admitted (first-seen) rows only.
    */
  def exactWithinWatermark(stream: DataFrame,
      horizon: String = "1 hour"): DataFrame =
    stream
      .withColumn("content_fp", fnv1a64(col("text")))
      .withWatermark("event_ts", horizon)
      .dropDuplicatesWithinWatermark("content_fp")
}
