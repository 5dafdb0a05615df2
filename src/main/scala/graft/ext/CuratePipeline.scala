package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Expressions.simhash64

/** The COMPOSED training-data curation job — the library's operators
  * chained into the full pipeline a 100 TB pretraining-data run executes
  * (the C4/Gopher/Dolma stage order):
  *
  *   1. quality gates   — Gopher integer rules + char-entropy floor
  *   2. PII redaction   — typed placeholders, text REWRITTEN downstream
  *   3. exact dedup     — min-doc_id keeper per redacted text
  *   4. near-dup prune  — SimHash bands → Hamming≤3 pairs → connected
  *                        components → keep-longest per cluster
  *   5. semantic dedup  — SemDeDup (Abbas et al. 2023): within each
  *                        k-means cell of the embedding space, drop any
  *                        survivor cosine-similar (≥ tau) to a lower-id
  *                        survivor in the same cell
  *   6. decontamination — 24-char shingle overlap vs the held-out eval
  *                        slice (broadcast semi-join), overlapping docs
  *                        dropped
  *   7. packing         — greedy per-shard token-budget batches
  *
  * Every stage is the SAME code path its gate query runs (gopherRules /
  * charEntropy / simhashBands / connectedComponents / packByTokenBudget),
  * so the pipeline's behavior is pinned transitively by their oracles;
  * CuratePipelineSpec re-checks the composition's end-state invariants
  * (no exact dup, no Hamming≤3 pair, every multi-doc batch under
  * budget, monotone shrink, determinism).
  *
  * Scale shape: gates and redaction are map-only; exact dedup is one
  * keyed shuffle on the text hash; near-dup is the banded
  * candidate join + CC (both skew-capped / contraction-bounded);
  * decontamination broadcasts the tiny eval gram set; packing is one
  * shard shuffle + in-partition fold. No stage collects to the driver.
  */
object CuratePipeline {

  final case class StageCounts(stage: String, docs: Long, tokens: Long)

  /** Run the full pipeline; returns (packed batches, per-stage counts).
    * Multi-consumer intermediates (exact-dedup survivors, the shingle
    * frame, the final survivor set) are persisted for the duration of
    * the run and UNPERSISTED before returning — the returned frame is a
    * self-contained localCheckpoint (one small pinned block, the d4
    * pattern), so a long-lived session calling curate() per corpus does
    * not accumulate cache entries.
    */
  def curate(s: SparkSession, dir: String,
      budget: Long = BatchPacking.T6Budget,
      entropyFloorNano: Long = 1500000000L, maxDist: Int = 3,
      bucketCap: Int = 1024,
      semTau: Double = 0.35): (DataFrame, Seq[StageCounts]) = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // -- 1. quality gates (map-only; both flag sets are gate operators)
    val gopherKept = TextAnalysis.gopherRules(s, dir)
      .filter(col("kept") === 1).select("doc_id")
    val entropyKept = TextAnalysis.charEntropy(s, dir)
      .filter(col("ent_nano") >= entropyFloorNano).select("doc_id")
    val gated = docs
      .join(gopherKept, "doc_id")
      .join(entropyKept, "doc_id")

    // -- 2. PII redaction (TextAnalysis.redact — the ONE pinned chain)
    val redacted = gated.select(
      col("doc_id"), TextAnalysis.redact(col("text")).as("clean"))

    // -- 3. exact dedup: min-doc_id keeper per redacted text.
    //       persisted: consumed by the sketch pass AND both nearKept
    //       branches — without the pin the gate+redact+groupBy chain
    //       replays per consumer.
    val exactKept = redacted
      .groupBy("clean").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("clean"))
      .persist()

    // -- 4. near-dup prune: the d8 miner (Dedup.simhashPairsOf — shared
    //       code path) → CC → keep-longest per cluster
    val sketches = exactKept
      .select(col("doc_id"), length(col("clean")).as("n_chars"),
        simhash64(col("clean")).as("simhash"))
    val pairs = Dedup.simhashPairsOf(sketches, maxDist, bucketCap)
    val clusters = Dedup.connectedComponents(
      pairs.select("doc_a", "doc_b"))
    val clusterKeep = graft.plans.TopKPerGroup.topK(
        clusters.join(sketches.select("doc_id", "n_chars"), "doc_id"),
        Seq("cluster_id"), "n_chars", 1, desc = true,
        tiebreakCols = Seq("doc_id"))
      .select("doc_id")
    val nearKept = exactKept
      .join(clusters, Seq("doc_id"), "left_anti")     // never clustered
      .select("doc_id", "clean")
      .unionByName(exactKept.join(clusterKeep, "doc_id")
        .select("doc_id", "clean"))

    // -- 5. semantic dedup (SemDeDup, Abbas et al. 2023 — the e5
    //       operator composed into the run): survivors are assigned to
    //       the corpus k-means cells (the offline Clustering artifact —
    //       centroids are an index, built once per corpus like the IVF
    //       codebooks) and any survivor cosine-similar ≥ semTau to a
    //       lower-id survivor IN THE SAME CELL is dropped. Pairs are
    //       computed among SURVIVORS only — a doc the gates or earlier
    //       dedup removed can no longer cause a semantic drop. The
    //       within-cell self-join runs through SkewSafe.cappedEquiJoin
    //       (hot cells spread across tasks, same guard as e5). Docs
    //       without an embedding row pass through (left-join
    //       semantics: no evidence, no drop).
    val semKept = {
      val a = s.read.parquet(s"${Clustering.clusterDir(s, dir)}/assign")
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val sv = nearKept.select(col("doc_id"))
        .join(a.select(col("vec_id").as("doc_id"), col("cell")), "doc_id")
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")),
          "doc_id")
      val l = sv.select(col("cell"), col("doc_id").as("l_id"),
        col("embedding").as("l_emb"))
      val r = sv.select(col("cell"), col("doc_id").as("r_id"),
        col("embedding").as("r_emb"))
      val drops = SkewSafe.cappedEquiJoin(l, r, Seq("cell"),
          hash(col("r_id")))
        .filter(col("l_id") < col("r_id") &&
          graft.functions.Expressions.cosineF(col("l_emb"), col("r_emb"))
            >= semTau)
        .select(col("r_id").as("doc_id")).distinct()
      nearKept.join(drops, Seq("doc_id"), "left_anti").persist()
    }

    // -- 6. decontamination (ct1 rule: any 24-char shingle shared with
    //       the deterministic eval slice disqualifies the doc).
    //       sh is persisted: three consumers (eval grams, contamination
    //       join, eval-slice anti-join).
    val sh = semKept.select(col("doc_id"),
      substring(md5(col("clean")), 1, 2).as("h2"),
      graft.functions.Expressions.shingleHashes(col("clean"), 24).as("g"))
      .persist()
    val evalGrams = sh.filter(col("h2") < "10")
      .select(explode(col("g")).as("ng")).distinct()
    val contaminated = sh.filter(col("h2") >= "10")
      .select(col("doc_id"), explode(col("g")).as("ng"))
      .join(broadcast(evalGrams), "ng")
      .select("doc_id").distinct()
    val finalDocs = semKept
      .join(sh.filter(col("h2") < "10").select("doc_id"),
        Seq("doc_id"), "left_anti")                   // eval slice itself out
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("clean"),
        size(split(col("clean"), " ")).cast("long").as("n_tokens"))
      .persist() // two consumers: metrics + packing

    // -- 6. packing
    val packed = BatchPacking.packByTokenBudget(
      finalDocs, "doc_id", "n_tokens", budget)

    def toks(df: DataFrame, textCol: String): Long =
      df.agg(coalesce(sum(size(split(col(textCol), " ")).cast("long")),
        lit(0L))).head().getLong(0)
    val metrics = Seq(
      StageCounts("raw", docs.count(), toks(docs, "text")),
      StageCounts("gated", gated.count(), toks(gated, "text")),
      StageCounts("exact_dedup", exactKept.count(), toks(exactKept, "clean")),
      StageCounts("near_dedup", nearKept.count(), toks(nearKept, "clean")),
      StageCounts("semantic_dedup", semKept.count(), toks(semKept, "clean")),
      StageCounts("decontaminated", finalDocs.count(),
        finalDocs.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)),
      StageCounts("packed_batches",
        packed.select("batch_id").distinct().count(),
        packed.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)))
    // self-contained result, then release every interior cache: the
    // caller holds one small checkpointed frame, not the whole chain
    val out = packed.localCheckpoint(true)
    finalDocs.unpersist(false)
    sh.unpersist(false)
    semKept.unpersist(false)
    exactKept.unpersist(false)
    (out, metrics)
  }
}
