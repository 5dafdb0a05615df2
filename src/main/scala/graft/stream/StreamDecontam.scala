package graft.stream

import org.apache.spark.sql.DataFrame

import graft.ext.Decontam

/** Stateless streaming benchmark-decontamination gate: drop ingest
  * documents sharing any character shingle with the frozen eval
  * benchmark ([[graft.ext.Decontam]] — the GPT-3/Gopher n-gram rule
  * applied at ADMISSION time, so benchmark text never enters the
  * training corpus instead of being scrubbed after the fact).
  *
  * Like [[StreamQuality]]/[[StreamDsir]] this sits in front of the
  * stateful dedup gates: the probe is one codegen'd per-row binary
  * search through the sorted benchmark-gram literal — no watermark, no
  * state, no shuffle, no join — and the expression is IDENTICAL to the
  * batch `ct3_decontam_survivors` filter, so stream ≡ batch by
  * construction. The artifact is frozen at the benchmark epoch
  * (benchmarks change when evals change, never per micro-batch).
  */
object StreamDecontam {

  /** Filter a (… text …) stream to docs sharing NO shingle with the
    * frozen benchmark gram set (`grams` sorted —
    * [[Decontam.frozenEval]]'s second component).
    */
  def decontamGate(stream: DataFrame, grams: Array[Long],
      textCol: String = "text"): DataFrame =
    stream.filter(!Decontam.contaminatedCol(grams, textCol))
}
