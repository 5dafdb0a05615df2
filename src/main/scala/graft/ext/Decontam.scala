package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Expressions

/** Frozen-benchmark decontamination — the ADMISSION side of the ct1
  * contamination scan (reference `Big_Data_Pr` has no eval hygiene at
  * all; this is the GPT-3 appx. C / Gopher appx. A rule production
  * training pipelines run at ingest: a training document is dropped
  * when it shares any character shingle with a held-out benchmark).
  *
  * The difference from ct1, and the reason this is its own operator:
  * ct1 diagnoses (per-doc overlap counts via a broadcast gram join,
  * corpus-vs-corpus); this ADMITS, against a benchmark artifact that
  * is BOUNDED BY CONSTRUCTION. Real benchmarks are fixed files — their
  * gram set does not grow with the training corpus — so the frozen
  * artifact here is the [[EvalDocs]] lexicographically-smallest
  * `(md5(text), doc_id)` documents (deterministic, engine- and
  * SQL-replayable), and admission is one codegen'd per-row probe:
  * `sortedContainsAny(shingleHashes(text), evalGramLiteral)` — each
  * doc gram binary-searched into the sorted frozen set,
  * O(grams·log |eval|) per row, no join, no shuffle, no state.
  *
  * 100 TB shape: the artifact is O(benchmark) ≈ tens of KB–MB
  * regardless of corpus size; every executor probes it as a plan
  * literal. The batch operator (`ct3_decontam_survivors`) and the
  * streaming gate ([[graft.stream.StreamDecontam]]) share the ONE
  * scoring column ([[contaminatedCol]]) — the qualityGate/dsirGate
  * delivery discipline.
  */
object Decontam {

  /** Benchmark size: fixed doc count, NOT a corpus fraction — the
    * artifact must stay bounded as the corpus scales.
    */
  val EvalDocs = 50
  val GramK = 24
  /** Hard cap on the frozen gram artifact (a plan literal): 4M longs
    * = 32 MB, far past any real benchmark's shingle count.
    */
  val MaxEvalGrams: Int = 4 * 1000 * 1000

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** The frozen benchmark artifact: (sorted eval doc ids, sorted
    * distinct gram hashes). One bounded job — TakeOrderedAndProject
    * for the [[EvalDocs]] smallest `(md5(text), doc_id)` keys (no
    * global sort materializes), then [[EvalDocs]] rows collected.
    */
  def frozenEval(s: SparkSession, dir: String): (Array[Long], Array[Long]) = {
    val ev = docs(s, dir)
      .select(col("doc_id"), col("text"), md5(col("text")).as("mh"))
      .orderBy(col("mh"), col("doc_id"))
      .limit(EvalDocs)
      .select(col("doc_id"),
        Expressions.shingleHashes(col("text"), GramK).as("g"))
      .collect()
    val ids = ev.map(_.getLong(0)).sorted
    val grams = ev.flatMap(_.getSeq[Long](1)).distinct.sorted
    require(grams.length <= MaxEvalGrams,
      s"frozenEval: ${grams.length} benchmark grams exceed the " +
        s"$MaxEvalGrams plan-literal cap — shrink the benchmark or " +
        "ship the gram set as a broadcast join instead")
    (ids, grams)
  }

  /** True iff the doc shares any [[GramK]]-char shingle with the
    * frozen benchmark gram set. The ONE expression batch and stream
    * share; `grams` MUST be sorted ([[frozenEval]] output).
    */
  def contaminatedCol(grams: Array[Long], textCol: String): Column =
    Expressions.sortedContainsAny(
      Expressions.shingleHashes(col(textCol), GramK),
      typedLit(grams.toSeq))

  /** ct3: the training docs admitted past the frozen benchmark —
    * everything except the benchmark docs themselves and any doc
    * sharing a shingle with them. Map-only over the corpus (the eval
    * ids ride an `isin` literal, the grams the probe literal).
    */
  def ct3DecontamSurvivors(s: SparkSession, dir: String): DataFrame = {
    val (ids, grams) = frozenEval(s, dir)
    docs(s, dir)
      .filter(!col("doc_id").isin(ids.map(Long.box).toSeq: _*))
      .filter(!contaminatedCol(grams, "text"))
      .select(col("doc_id"))
  }
}
