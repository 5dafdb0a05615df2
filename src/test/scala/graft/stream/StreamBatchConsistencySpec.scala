package graft.stream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Dedup

/** Pins stream/batch consistency of the near-dup ingest surface: the
  * streaming gate's match set over an arriving batch must equal the
  * new×corpus portion of the batch incremental miner's output for the
  * same split — one SimHash banding semantics, two execution shapes. A
  * drift here would mean a doc admitted by the stream gate that a
  * later batch re-mine would flag (or vice versa).
  */
class StreamBatchConsistencySpec extends SparkSpec {

  test("streaming gate matches == incremental miner's new×corpus pairs") {
    val d = sf("sf0.001")
    val all = spark.read.parquet(s"$d/documents.parquet")
    val corpusSketches = Dedup.simhashes(spark, d)
      .filter(col("doc_id") % 5 =!= 0)
    val newDocs = all.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "text")

    // stream shape: the gate sees newDocs as an arriving micro-batch
    val gate = StreamNearDup.matchesAgainst(
        newDocs,
        Dedup.simhashBands(corpusSketches)
          .select(col("doc_id").as("corpus_id"),
            col("simhash").as("corpus_sim"), col("band"), col("key")))
      .select(col("in_id"), col("corpus_id")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch shape: incremental pairs, restricted to new×corpus
    val incr = Dedup.incrementalSimhashPairsOf(corpusSketches, newDocs)
      .filter((col("doc_a") % 5 === 0) =!= (col("doc_b") % 5 === 0))
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        // orient as (new, corpus) to compare with the gate's output
        Seq(if (a % 5 == 0) (a, b) else (b, a))
      }.toSet

    assert(gate.nonEmpty, "degenerate fixture: no cross matches")
    assert(gate == incr,
      s"stream=${gate.size} batch=${incr.size} " +
        s"onlyStream=${(gate -- incr).take(5)} onlyBatch=${(incr -- gate).take(5)}")
  }
}
