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
        .withColumn("nrm",
          graft.functions.Expressions.normF(col("embedding")))
      val l = sv.select(col("cell"), col("doc_id").as("l_id"),
        col("embedding").as("l_emb"), col("nrm").as("l_nrm"))
      val r = sv.select(col("cell"), col("doc_id").as("r_id"),
        col("embedding").as("r_emb"), col("nrm").as("r_nrm"))
      val drops = SkewSafe.cappedEquiJoin(l, r, Seq("cell"),
          hash(col("r_id")))
        .filter(col("l_id") < col("r_id") &&
          graft.functions.Expressions.cosinePreF(col("l_emb"),
            col("l_nrm"), col("r_emb"), col("r_nrm")) >= semTau)
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

  // ------------------------------------------------------------------
  // Incremental curation (r11): admit a NEW SHARD against the frozen
  // corpus artifacts without recomputing the corpus — the id1
  // incremental-near-dup invariant lifted to the whole pipeline.
  //
  // The composition is exact under the EPOCH POLICY [[curateFrozen]]
  // runs (and real ingest pipelines use):
  //   - keep-EARLIEST per near-dup cluster (min doc_id = first-ingested
  //     wins; shipped training data is never retro-dropped),
  //   - centroids fit ONCE on the corpus epoch (a versioned offline
  //     index — new vectors assign to it, never refit per ingest),
  //   - the eval/decontamination slice FROZEN at the corpus epoch (the
  //     held-out benchmark does not grow with ingest).
  // Under that policy: curateFrozen(corpus) ∪ curateDelta(delta) ≡
  // curateFrozen(corpus ∪ delta) row-for-row, provided no delta doc
  // BRIDGES two distinct corpus near-dup clusters (a bridge merges
  // clusters retroactively — no incremental system replays that
  // without a rebuild; IncrementalCurateSpec pins the equality on the
  // 80/20 fixture split and the delta admits strictly less work).
  // ------------------------------------------------------------------

  /** The frozen corpus artifacts an ingest epoch composes against —
    * every frame is a localCheckpoint (self-contained, session-owned).
    */
  final case class CorpusState(
      split: Long,
      exactKeys: DataFrame,    // (k) md5 of every corpus gated+redacted text
      sketches: DataFrame,     // (doc_id, simhash) of stage-3 keepers
      nearCells: DataFrame,    // (cell, doc_id, embedding) stage-4 survivors
      evalDocs: DataFrame,     // (doc_id) the frozen eval slice
      evalGrams: DataFrame,    // (ng) distinct 24-gram hashes of the slice
      centroidsRoot: String,
      prevFinal: DataFrame,    // (doc_id, clean, n_tokens) corpus admits
      evalGramsTable: String)  // bucketed-on-ng catalog twin of evalGrams

  private final case class FrozenRun(
      nDocs: Long, gated: DataFrame, exactKept: DataFrame,
      nearKept: DataFrame, semKept: DataFrame, finalDocs: DataFrame,
      centroidsRoot: String)

  /** Stages 1–2 (gates + redaction) over `dir` docs passing `idFilter`
    * — per-doc and epoch-independent, shared by every mode.
    */
  private def gatedClean(s: SparkSession, dir: String,
      entropyFloorNano: Long,
      idFilter: org.apache.spark.sql.Column): (DataFrame, DataFrame) = {
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(idFilter)
    val gopherKept = TextAnalysis.gopherRules(s, dir)
      .filter(col("kept") === 1).select("doc_id")
    val entropyKept = TextAnalysis.charEntropy(s, dir)
      .filter(col("ent_nano") >= entropyFloorNano).select("doc_id")
    val gated = docs.join(gopherKept, "doc_id").join(entropyKept, "doc_id")
    (docs, gated.select(col("doc_id"),
      TextAnalysis.redact(col("text")).as("clean")))
  }

  private def runFrozen(s: SparkSession, dir: String, splitId: Long,
      upTo: Option[Long], entropyFloorNano: Long, maxDist: Int,
      bucketCap: Int, semTau: Double): FrozenRun = {
    val idFilter = upTo.fold(lit(true))(x => col("doc_id") < x)
    val (docs, redacted) = gatedClean(s, dir, entropyFloorNano, idFilter)
    val exactKept = redacted
      .groupBy("clean").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("clean"))
      .persist()
    val sketches = exactKept
      .select(col("doc_id"), simhash64(col("clean")).as("simhash"))
    val pairs = Dedup.simhashPairsOf(sketches, maxDist, bucketCap)
    val clusters = Dedup.connectedComponents(pairs.select("doc_a", "doc_b"))
    // keep-EARLIEST per cluster (the epoch policy; curate() keeps
    // longest — a quality choice this mode trades for composability)
    val clusterKeep = clusters.groupBy("cluster_id")
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    val nearKept = exactKept
      .join(clusters, Seq("doc_id"), "left_anti")
      .unionByName(exactKept.join(clusterKeep, "doc_id"))
      .persist()
    // semantic dedup against the CORPUS-epoch centroids, assignment via
    // the one shared nearest-centroid function (every epoch identical)
    val root = Clustering.clusterDir(s, dir, trainBelow = Some(splitId))
    val sv = nearKept.select(col("doc_id"))
      .join(s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    val cells = Clustering.assignToCentroids(s,
        sv.select(col("doc_id").as("vec_id"), col("embedding")), root)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val svc = sv.join(cells, "doc_id")
      .withColumn("nrm", graft.functions.Expressions.normF(col("embedding")))
    val drops = SkewSafe.cappedEquiJoin(
        svc.select(col("cell"), col("doc_id").as("l_id"),
          col("embedding").as("l_emb"), col("nrm").as("l_nrm")),
        svc.select(col("cell"), col("doc_id").as("r_id"),
          col("embedding").as("r_emb"), col("nrm").as("r_nrm")),
        Seq("cell"), hash(col("r_id")))
      .filter(col("l_id") < col("r_id") &&
        graft.functions.Expressions.cosinePreF(col("l_emb"), col("l_nrm"),
          col("r_emb"), col("r_nrm")) >= semTau)
      .select(col("r_id").as("doc_id")).distinct()
    val semKept = nearKept.join(drops, Seq("doc_id"), "left_anti").persist()
    // decontamination vs the eval slice FROZEN at the corpus epoch.
    // Eval membership is a pure CONTENT rule over the RAW corpus docs
    // (md5 of the redacted text, id < split) — deliberately NOT over
    // survivors: a survivor-dependent eval set lets any upstream
    // divergence (e.g. a cross-epoch cluster merge) cascade into the
    // contamination stage, and a real decontamination list is a
    // versioned artifact fixed with the benchmark, not a function of
    // this run's dedup outcomes.
    val (evalDocs, evalGrams) = frozenEval(s, dir, splitId, entropyFloorNano)
    val contaminated = semKept
      .join(evalDocs, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), explode(
        graft.functions.Expressions.shingleHashes(col("clean"), 24))
        .as("ng"))
      .join(broadcast(evalGrams), "ng")
      .select("doc_id").distinct()
    val finalDocs = semKept
      .join(evalDocs, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("clean"),
        size(split(col("clean"), " ")).cast("long").as("n_tokens"))
    FrozenRun(docs.count(), redacted, exactKept, nearKept, semKept,
      finalDocs, root)
  }

  /** The frozen eval slice: id < split ∧ quality-gated ∧ md5(redacted
    * text) prefix rule — every predicate is PER-DOC deterministic (gates
    * and redaction are content functions), so the slice is identical in
    * every epoch run without depending on any run's dedup outcomes.
    * Returns (evalDocs(doc_id), evalGrams(ng)).
    */
  private def frozenEval(s: SparkSession, dir: String, splitId: Long,
      entropyFloorNano: Long): (DataFrame, DataFrame) = {
    val (_, redacted) = gatedClean(s, dir, entropyFloorNano,
      col("doc_id") < splitId)
    val ev = redacted.filter(substring(md5(col("clean")), 1, 2) < "10")
    (ev.select("doc_id"),
      ev.select(explode(
        graft.functions.Expressions.shingleHashes(col("clean"), 24))
        .as("ng")).distinct())
  }

  private def release(r: FrozenRun): Unit = {
    r.exactKept.unpersist(false)
    r.nearKept.unpersist(false)
    r.semKept.unpersist(false)
  }

  /** Epoch-policy full recompute: the reference semantics
    * [[curateDelta]] composes against (see the section comment).
    * Returns the ADMITTED docs (doc_id, clean, n_tokens) + stage counts.
    */
  def curateFrozen(s: SparkSession, dir: String, splitId: Long,
      upTo: Option[Long] = None, entropyFloorNano: Long = 1500000000L,
      maxDist: Int = 3, bucketCap: Int = 1024,
      semTau: Double = 0.35): (DataFrame, Seq[StageCounts]) = {
    val r = runFrozen(s, dir, splitId, upTo, entropyFloorNano, maxDist,
      bucketCap, semTau)
    val out = r.finalDocs.localCheckpoint(true)
    val metrics = Seq(
      StageCounts("raw", r.nDocs, -1L),
      StageCounts("exact_dedup", r.exactKept.count(), -1L),
      StageCounts("near_dedup", r.nearKept.count(), -1L),
      StageCounts("semantic_dedup", r.semKept.count(), -1L),
      StageCounts("decontaminated", out.count(),
        out.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)))
    release(r)
    (out, metrics)
  }

  /** Build the frozen artifacts from a corpus-epoch run — the one-off
    * per-corpus job; every per-ingest [[curateDelta]] reuses it.
    */
  def corpusState(s: SparkSession, dir: String, splitId: Long,
      entropyFloorNano: Long = 1500000000L, maxDist: Int = 3,
      bucketCap: Int = 1024, semTau: Double = 0.35): CorpusState = {
    val r = runFrozen(s, dir, splitId, Some(splitId), entropyFloorNano,
      maxDist, bucketCap, semTau)
    def pin(df: DataFrame) = df.localCheckpoint(true)
    val exactKeys = pin(r.exactKept.select(md5(col("clean")).as("k")))
    val sketches = pin(r.exactKept
      .select(col("doc_id"), simhash64(col("clean")).as("simhash")))
    val cells = Clustering.assignToCentroids(s,
        r.nearKept.select(col("doc_id").as("vec_id"))
          .join(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id")
          .select(col("vec_id"), col("embedding")), r.centroidsRoot)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val nearCells = pin(r.nearKept.select(col("doc_id"))
      .join(s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
      .join(cells, "doc_id")
      .select(col("cell"), col("doc_id"), col("embedding")))
    val (ed, eg) = frozenEval(s, dir, splitId, entropyFloorNano)
    val evalDocs = pin(ed)
    val evalGrams = pin(eg)
    val prevFinal = pin(r.finalDocs)
    release(r)
    // The decontamination artifact at 100 TB scale: the eval-gram set
    // written ONCE as a bucketed + per-file-sorted catalog table on the
    // gram hash (the Bucketing layout-job discipline), so every ingest
    // epoch's decontam semi-join reads the artifact side exchange-free
    // — only the O(shard) gram stream shuffles, never the corpus-scale
    // artifact (the r11 sf10 probe's dominant delta cost).
    val gramsTable = Bucketing.writeBucketedTable(s,
      Bucketing.tableName("graft_evalgrams", s"${dir}_$splitId"),
      evalGrams, "ng")
    CorpusState(splitId, exactKeys, sketches, nearCells, evalDocs,
      evalGrams, r.centroidsRoot, prevFinal, gramsTable)
  }

  /** The delta decontamination stage against the FROZEN eval gram set
    * (shard docs are never eval — the benchmark does not grow with
    * ingest). Default (r12): a LEFT-SEMI sort-merge join against the
    * BUCKETED eval-gram catalog table — the artifact side needs neither
    * exchange nor sort (one sorted file per bucket, written once at the
    * corpus epoch), so each ingest epoch shuffles only its own O(shard)
    * gram stream; at sf10 the probe's 1/16-of-corpus eval slice is 24M
    * grams, the r11 measured dominant delta cost when it re-exchanged
    * per epoch. `decontamBroadcast` swaps in the broadcast-hinted frame
    * (small-benchmark deployments; the A/B toggle — measured 10-20%
    * faster locally when the gram set genuinely fits, SCALING.md).
    */
  private[ext] def deltaContaminated(s: SparkSession, state: CorpusState,
      cleanDocs: DataFrame, decontamBroadcast: Boolean): DataFrame = {
    val grams = cleanDocs
      .select(col("doc_id"), explode(
        graft.functions.Expressions.shingleHashes(col("clean"), 24))
        .as("ng"))
    val joined =
      if (decontamBroadcast)
        grams.join(broadcast(state.evalGrams), Seq("ng"), "left_semi")
      else
        grams.hint("merge")
          .join(s.table(state.evalGramsTable), Seq("ng"), "left_semi")
    joined.select("doc_id").distinct()
  }

  /** Admit one ingest shard (docs with doc_id ≥ state.split) against
    * the frozen corpus artifacts — O(shard) work plus keyed joins
    * against the (compact) artifact tables; the corpus text is never
    * re-read. Returns the admitted docs + stage counts.
    */
  def curateDelta(s: SparkSession, dir: String, state: CorpusState,
      entropyFloorNano: Long = 1500000000L, maxDist: Int = 3,
      bucketCap: Int = 1024, semTau: Double = 0.35,
      decontamBroadcast: Boolean = false): (DataFrame, Seq[StageCounts]) = {
    val splitId = state.split
    val (docs, redacted) =
      gatedClean(s, dir, entropyFloorNano, col("doc_id") >= splitId)
    // exact: min-id within the shard, then drop texts the corpus has
    val exactKept = redacted
      .groupBy("clean").agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("clean"))
      .join(state.exactKeys.withColumnRenamed("k", "__k"),
        md5(col("clean")) === col("__k"), "left_anti")
      .persist()
    // near-dup: the id1 incremental miner (shared code path) gives
    // shard×corpus + shard×shard pairs in one pass; corpus ids < split
    // separates them. A shard doc in any component touching the corpus
    // is rejected (its cluster keeper is a corpus doc — earliest wins);
    // pure-shard components keep their min id.
    val allPairs = Dedup.incrementalSimhashPairsOf(state.sketches,
        exactKept.select(col("doc_id"), col("clean").as("text")),
        maxDist, bucketCap)
      .persist()
    val crossIds = allPairs.filter(col("doc_a") < splitId)
      .select(col("doc_b").as("doc_id")).distinct()
    val within = allPairs.filter(col("doc_a") >= splitId)
    val comps = Dedup.connectedComponents(within.select("doc_a", "doc_b"))
    val flagged = comps.join(crossIds, "doc_id")
      .select("cluster_id").distinct()
    val compKeep = comps.join(flagged, Seq("cluster_id"), "left_anti")
      .groupBy("cluster_id").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val nearKept = exactKept
      .join(comps.select("doc_id"), Seq("doc_id"), "left_anti")
      .join(crossIds, Seq("doc_id"), "left_anti")
      .unionByName(exactKept.join(compKeep, "doc_id"))
      .persist()
    allPairs.unpersist(false)
    // semantic: assign to the CORPUS centroids; partners are the frozen
    // corpus stage-4 cells plus lower-id shard survivors
    val sv = nearKept.select(col("doc_id"))
      .join(s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    val cells = Clustering.assignToCentroids(s,
        sv.select(col("doc_id").as("vec_id"), col("embedding")),
        state.centroidsRoot)
      .select(col("vec_id").as("doc_id"), col("cell"))
    val svc = sv.join(cells, "doc_id")
      .select(col("cell"), col("doc_id"), col("embedding"))
    val partners = state.nearCells.unionByName(svc)
      .withColumn("nrm", graft.functions.Expressions.normF(col("embedding")))
    val svcN = svc
      .withColumn("nrm", graft.functions.Expressions.normF(col("embedding")))
    val drops = SkewSafe.cappedEquiJoin(
        partners.select(col("cell"), col("doc_id").as("l_id"),
          col("embedding").as("l_emb"), col("nrm").as("l_nrm")),
        svcN.select(col("cell"), col("doc_id").as("r_id"),
          col("embedding").as("r_emb"), col("nrm").as("r_nrm")),
        Seq("cell"), hash(col("r_id")))
      .filter(col("l_id") < col("r_id") &&
        graft.functions.Expressions.cosinePreF(col("l_emb"), col("l_nrm"),
          col("r_emb"), col("r_nrm")) >= semTau)
      .select(col("r_id").as("doc_id")).distinct()
    val semKept = nearKept.join(drops, Seq("doc_id"), "left_anti").persist()
    val contaminated = deltaContaminated(s, state, semKept,
      decontamBroadcast)
    val finalDocs = semKept
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("clean"),
        size(split(col("clean"), " ")).cast("long").as("n_tokens"))
    val out = finalDocs.localCheckpoint(true)
    val metrics = Seq(
      StageCounts("raw", docs.count(), -1L),
      StageCounts("exact_dedup", exactKept.count(), -1L),
      StageCounts("near_dedup", nearKept.count(), -1L),
      StageCounts("semantic_dedup", semKept.count(), -1L),
      StageCounts("decontaminated", out.count(),
        out.agg(coalesce(sum("n_tokens"), lit(0L))).head().getLong(0)))
    semKept.unpersist(false)
    nearKept.unpersist(false)
    exactKept.unpersist(false)
    (out, metrics)
  }

}
