package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stateless streaming DSIR gate — target-likeness filtering for an
  * ingest stream (the importance-resampling admission rule from the
  * batch `ds1`/`ds2` operators, deployed the way DSIR is deployed in
  * practice: the hashed model is FROZEN at the corpus epoch and every
  * incoming doc is scored against it; re-fitting happens offline at the
  * next epoch, never in the stream).
  *
  * Like [[StreamQuality]] this sits in front of the stateful dedup
  * gates: the score is one per-row `aggregate` fold through a literal
  * bucket→log-ratio map ([[graft.ext.TextAnalysis.dsirScoreCol]] — the
  * SAME expression the batch scorer uses, so stream and batch scores
  * are spec-pinned identical), no watermark, no state, no shuffle.
  */
object StreamDsir {

  /** Collect a hashed DSIR model frame into the frozen literal the
    * streaming gate embeds. Bounded by construction: the model is
    * ≤`buckets` rows (the point of feature hashing) — this is the
    * centroid/codebook artifact pattern, not a data-sized collect.
    */
  def freezeModel(s: SparkSession, dir: String,
      targetFilter: org.apache.spark.sql.Column,
      buckets: Int = 1024): Map[Long, Long] =
    graft.ext.TextAnalysis.dsirModelHashed(s, dir, targetFilter, buckets)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Filter a (… text …) stream to docs whose DSIR score clears
    * `floorMicro`. `model` is the frozen bucket→lr_micro map; `buckets`
    * must match the model's fit (power of two, see dsirModelHashed).
    */
  def dsirGate(stream: DataFrame, model: Map[Long, Long], buckets: Int,
      floorMicro: Long, textCol: String = "text"): DataFrame = {
    require(model.size == buckets,
      s"dsirGate: model has ${model.size} buckets, expected $buckets — " +
        "fit and gate must agree on the hash width")
    stream.filter(
      graft.ext.TextAnalysis.dsirScoreCol(model, buckets,
        textCol) >= floorMicro)
  }
}
