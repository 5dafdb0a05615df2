package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.functions.Expressions.simhash64

/** Ingest-time near-duplicate gate: match every arriving document
  * against a STATIC reference corpus (the already-ingested corpus, a
  * blocklist, yesterday's snapshot) by SimHash band keys — the streaming
  * shape of `d8_simhash_pairs`. This is the stage a training-data
  * pipeline runs before accepting a crawled page: "is this (nearly)
  * something we already have?"
  *
  * Plan shape: stream-static equi-join on (band, key) — STATELESS (no
  * watermark, no state store growth); the static side is the corpus's
  * banded sketch table, (doc_id, simhash, band, key) — 4 rows × 20
  * bytes per corpus doc, loaded once per micro-batch from parquet (at
  * scale: a broadcast or a bucketed table co-keyed on (band, key)).
  * Pigeonhole completeness carries over from the batch miner: any
  * corpus doc within Hamming ≤ 3 of an arriving doc shares at least one
  * band exactly.
  *
  * A pair agreeing on several bands emits once per band; collapse with
  * `dropDuplicates("in_id", "corpus_id")` inside the per-batch sink
  * (kept out of the operator so it stays stateless in append mode).
  */
object StreamNearDup {

  /** The corpus's banded sketch side, buildable ONCE and reused across
    * micro-batches (persist it for a per-epoch caller like foreachBatch —
    * re-deriving it every epoch re-scans and re-hashes the whole corpus).
    */
  def corpusBands(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashBands(Dedup.simhashes(s, dir))
      .select(col("doc_id").as("corpus_id"), col("simhash").as("corpus_sim"),
        col("band"), col("key"))

  /** `stream` must carry (doc_id, text). Returns
    * (in_id, corpus_id, hamming) matches with hamming ≤ `maxDist`.
    */
  def againstCorpus(stream: DataFrame, s: SparkSession, dir: String,
      maxDist: Int = 3): DataFrame =
    matchesAgainst(stream, corpusBands(s, dir), maxDist)

  /** Same gate against a prebuilt (possibly cached) [[corpusBands]]. */
  def matchesAgainst(stream: DataFrame, corpus: DataFrame,
      maxDist: Int = 3): DataFrame = {
    val incoming = Dedup.simhashBands(
        stream.select(col("doc_id").as("in_id"),
          simhash64(col("text")).as("simhash")))
      .select(col("in_id"), col("simhash").as("in_sim"),
        col("band"), col("key"))
    incoming.join(corpus, Seq("band", "key"))
      .withColumn("hamming",
        bit_count(col("in_sim").bitwiseXOR(col("corpus_sim"))))
      .filter(col("hamming") <= maxDist)
      .select(col("in_id"), col("corpus_id"), col("hamming"))
  }
}
