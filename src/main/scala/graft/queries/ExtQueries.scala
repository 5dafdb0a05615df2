package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Graph, Multimodal, Similarity, TextAnalysis}
import graft.functions.Expressions.simhash64

/** SURVEY.md §7.4 extension operators as driver-checkable queries.
  * Oracle-aligned wrappers cast Spark INT results (size/length) to long —
  * DuckDB's len()/count are BIGINT and the driver compares schemas.
  * Most x_-prefixed queries started out with no SQL oracle (native hashes
  * / LSH internals); the HUGEINT integer-hash emulation has since given
  * d6/d7/d8, x1, x2 and x3 exact DuckDB rows — the remaining no-oracle
  * queries (seeded-random LSH planes, media codecs, sketch estimates) get
  * a rows>0 check plus a DuckDB-checkable invariant twin.
  */
object ExtQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  // ---- dedup -------------------------------------------------------------

  def d1DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(s, dir)

  def d2FingerprintMd5(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), md5(col("text")).as("md5_hex"))

  /** Prefix-filter set-similarity join (complete — no all-pairs step);
    * equals [[Dedup.ngramJaccardPairs]] on every corpus by the prefix
    * lemma, which the oracle verifies. Runs the miner FRESH — d3 IS the
    * mining operator, and routing it through the parquet artifact would
    * (a) lint/bench a scan instead of the prefix-join plan after the
    * first call and (b) blind PlanWasteSpec's whole-surface guard to
    * the engine's most complex miner. The cluster stages (d4/d9) and
    * the verifiers share one artifact build of the same parameters
    * instead (see [[graft.ext.Dedup.prefixPairsArtifact]]).
    */
  def d3NgramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(s, dir, k = 3, jaccardMin = 0.4)

  /** d3's capped-exchange twin: since r13 this runs EXACTLY the settings
    * the auto router engages above the wall — cap=64 with the 16
    * rarest-df≥2 prefix tokens per doc — so the gate verifies the very
    * path that executes at 100× (the r13 sf10 sweep killed the old
    * (64, tokens=0) setting: without the token cut the SNM generation is
    * Σ|prefix|·cap ≈ 2e10 rows there). The oracle is no longer "equals
    * exact" (the rarest-P cut is lossy by design, ~86% pair recall at
    * gate scale): it is a FULL DuckDB replay of the capped pipeline —
    * df-ranked prefix selection, rarest-16 cut, SNM trailing window,
    * per-doc candidate capping, exact verify — through the validated
    * FNV shingle-hash emulation (every window orders by the raw FNV
    * hash, which is why the r13 ordering change made this replayable).
    */
  def d3cNgramJaccardCapped(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(s, dir, k = 3, jaccardMin = 0.4, candCap = 64,
      candTokens = 16)

  /** Exact substring-duplication spans (Lee et al. 2022 ExactSubstr). */
  def d11DupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.dupSpans(s, dir, k = 25)

  /** The ExactSubstr CUT: corpus rewritten with duplicated spans
    * spliced out (the step the training pipeline actually ships).
    */
  def d12SpanCut(s: SparkSession, dir: String): DataFrame =
    Dedup.cutDupSpans(s, dir, k = 25)

  /** Within-doc self-repetition spans (keep-first semantics). k = 12:
    * within-document repetition lives at shorter lexical scales than
    * cross-doc duplication (d11's k = 25 finds 0 self-repeats on this
    * corpus; 12 chars ≈ a repeated two-word phrase).
    */
  def d13SelfRepeatSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.selfRepeatSpans(s, dir, k = 12)

  /** Integer-micros PageRank over the co-order part graph (3 unrolled
    * power iterations — bit-identical across engines by construction).
    * Routes through the auto front door (r12): at gate scale the clique
    * stats sit below [[Graph.AutoCliqueEdgesMax]] so this IS the clique
    * formulation the g1 oracle replays; at 100× the same call survives
    * by routing to the bipartite walk (no oracle at that scale — the
    * sweep measures completion, g3 pins the bipartite numbers).
    */
  def g1PageRank(s: SparkSession, dir: String): DataFrame =
    Graph.pageRankAuto(s, dir, iters = 3)

  /** Label-propagation communities, 3 synchronous integer-exact rounds
    * over the co-order graph — via the auto front door (see
    * [[g1PageRank]]'s routing note).
    */
  def g2LabelProp(s: SparkSession, dir: String): DataFrame =
    Graph.labelPropAuto(s, dir, iters = 3)

  /** PageRank iterated DIRECTLY on the bipartite order↔part incidence
    * (two keyed hops per round over O(lineitem) edges) — the linear
    * formulation that replaces g1's per-order clique build at 100×.
    */
  def g3PageRankBipartite(s: SparkSession, dir: String): DataFrame =
    Graph.pageRankBipartite(s, dir, iters = 3)

  /** Label propagation on the bipartite incidence — g2's community pass
    * without the clique edge build.
    */
  def g4LabelPropBipartite(s: SparkSession, dir: String): DataFrame =
    Graph.labelPropBipartite(s, dir, iters = 3)

  // ---- similarity search -------------------------------------------------

  def e1CosineTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(s, dir, queryId = 0L, k = 20)

  /** Blocked exact pair join — equi-joins only, no full-table broadcast;
    * block count auto-sized to the corpus (r13 — purely a parallelism
    * tiling, the exact result is independent of it).
    */
  def e2CosineNearDupPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBlocked(s, dir, minCosine = 0.45)

  // ---- text analysis -----------------------------------------------------

  def t1TokenCounts(s: SparkSession, dir: String): DataFrame = {
    val tc = TextAnalysis.tokenCounts(s, dir)
    tc.select(col("doc_id"),
      col("ws_tokens").cast("long").as("ws_tokens"),
      col("bpe_tokens").cast("long").as("bpe_tokens"))
  }

  def t2QualityScores(s: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.qualityScores(s, dir)
    q.select(col("doc_id"),
      col("n_chars").cast("long").as("n_chars"),
      col("n_tokens").cast("long").as("n_tokens"),
      col("mean_word_len"), col("digit_ratio"), col("punct_ratio"))
  }

  def t3LangGuess(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langGuess(s, dir)

  /** Unigram LM quality score (CCNet-style perplexity-filter stand-in). */
  def t10UnigramLmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLmScore(s, dir)

  /** PII detect + redact (emails / phones / IPv4 → typed tags). */
  def t12PiiRedact(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.piiRedact(s, dir)

  /** Gopher rule gate (published heuristic set, integer-exact flags). */
  def t13GopherRules(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.gopherRules(s, dir)

  /** BPE merge-candidate mining (top adjacent token pairs). */
  def v2BpeMergePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeMergePairs(s, dir, k = 50)

  /** The ITERATIVE BPE trainer (count → argmax → merge → recount, 8
    * rounds) — the genuinely-learned merge table v2's one-shot count
    * approximates (r12; VERDICT r11 "what's missing" #3).
    */
  def v4BpeTrain(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrainMerges(s, dir, rounds = 8)

  /** The corpus encoded with the trainer's learned merges — bpeEncode
    * re-pointed at [[v4BpeTrain]]'s output (the loop's final state).
    */
  def v5BpeTrainEncode(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeTrainEncode(s, dir, rounds = 8)

  private def tokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)

  /** One CMS build per data dir, memoized: x16 and x16v previously each
    * exploded the token stream twice (counts + sketch agg) and rebuilt
    * the same 4×2048 sketch independently — 4 token-explode passes and 2
    * sketch builds for one sweep (the r8 ADVICE finding). The collected
    * cells (64 KB) are embedded as a literal, so each query is now a
    * single explode+groupBy pass with an in-expression estimate — no
    * crossJoin, no second aggregation.
    */
  private val cmsCellsCache =
    graft.ext.CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]())

  private def cmsCells(s: SparkSession, dir: String): Array[Long] = {
    val cells = cmsCellsCache.computeIfAbsent(dir, _ =>
      tokens(s, dir)
        .agg(graft.functions.CountMin.sketch(col("token"), 4, 2048).as("sk"))
        .select(col("sk.cells")).head().getSeq[Long](0).toArray)
    lastCmsCells = cells
    cells
  }

  /** The CMS cells x16 most recently USED — the artifact the SparkEntry
    * x16 oracle embeds (artifact-derived-oracle pattern; Verify runs
    * all queries before dumping oracle_sql.json, so this is x16's own
    * sketch there). Last-used, not `.values.headOption`: once a second
    * dir is built in the JVM a map pick would be arbitrary and the
    * oracle could replay the wrong corpus's sketch.
    */
  @volatile private var lastCmsCells: Array[Long] = _

  def cmsCellsBuilt: Option[Array[Long]] = Option(lastCmsCells)

  /** Count-Min token counts vs exact — top 100 by true count. Rows-only
    * (the estimate has no SQL form); x16v pins the one-sided guarantee.
    */
  def x16CmsTokens(s: SparkSession, dir: String): DataFrame = {
    val cells = typedLit(cmsCells(s, dir))
    tokens(s, dir).groupBy("token").agg(count(lit(1)).as("cnt"))
      .select(col("token"), col("cnt"),
        graft.functions.CountMin.cmsEstimate(cells, col("token"),
          4, 2048).as("est"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(100)
  }

  /** CMS one-sided guarantee, gate-checked over EVERY distinct token:
    * cells only over-count, so estimate ≥ true always — `ge_true` must
    * be 1 on every row to hash-match the oracle's literal 1s. (The
    * probabilistic upper tail is pinned empirically in ScalaTest; it is
    * per-item probabilistic, so it has no deterministic per-row form.)
    */
  def x16vCmsLowerBound(s: SparkSession, dir: String): DataFrame = {
    val cells = typedLit(cmsCells(s, dir))
    tokens(s, dir).groupBy("token").agg(count(lit(1)).as("cnt"))
      .select(col("token"),
        when(graft.functions.CountMin.cmsEstimate(cells,
          col("token"), 4, 2048) >= col("cnt"), lit(1)).otherwise(lit(0))
          .cast("int").as("ge_true"))
  }

  /** Composed curation chain: quality gate → language gate → dedup →
    * token accounting (fully SQL-expressible, so oracle-checked).
    */
  def c1CurationPipeline(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.curationPipeline(s, dir)

  /** Consistent-hash sampling + train/eval split — the reproducibility
    * primitive of a training-data pipeline: membership depends only on
    * the content hash, so re-runs, other engines (the DuckDB oracle), and
    * incremental ingests all agree row-by-row; no rand(), no seed state,
    * trivially parallel at any scale. Keeps ~75% (md5 prefix < 'c0'),
    * splits 50/50 inside by the first hex char.
    */
  def c2ConsistentSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .filter(substring(col("h"), 1, 2) < "c0")
      .select(col("doc_id"), col("lang"),
        when(substring(col("h"), 1, 1) < "8", lit("train"))
          .otherwise(lit("eval")).as("split"))

  /** Stratified consistent sampling: per-language rates via hex thresholds
    * on the same md5 content hash as [[c2ConsistentSample]] — downsample
    * the dominant language (en 25%), halve the mid tier (de/fr 50%), keep
    * rare strata whole. The standard rebalancing step before training-data
    * mixing; deterministic (re-runs and retries pick the same rows), no
    * sampleBy/rand() whose seed-dependent output an oracle can't replay.
    * One scan, the filter fuses into it — no shuffle at all.
    */
  def c3StratifiedSample(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
      .withColumn("thr",
        when(col("lang") === "en", lit("40"))
          .when(col("lang").isin("de", "fr"), lit("80"))
          .otherwise(lit("zz")))
      .filter(substring(col("h"), 1, 2) < col("thr"))
      .select(col("doc_id"), col("lang"))

  /** Semantic bucket consolidation over embeddings: an 8-bit sign
    * signature of the leading dimensions (axis-hyperplane LSH, the 1-bit
    * quantization of ITQ/sign-LSH) partitions the corpus into semantic
    * cells; each cell keeps one canonical representative (min vec_id).
    * The coarse consolidation step of embedding-based dedup: members of a
    * cell are near in sign-space, and downstream exact cosine (e2) only
    * needs to run within cells. Compact 8-byte shuffle key, one exchange.
    */
  def d5EmbeddingBucketDedup(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val bucket = (1 to 8).map(i =>
      when(element_at(col("embedding"), i) >= 0f, lit(1L << (8 - i)))
        .otherwise(lit(0L))).reduce(_ + _)
    e.groupBy(bucket.as("bucket"))
      .agg(min("vec_id").as("keeper_id"), count(lit(1)).as("n_members"))
  }

  /** Benchmark decontamination scan: flag training documents sharing any
    * 24-char shingle with the held-out set (the n-gram-overlap
    * decontamination rule of GPT-3 appx. C / Gopher appx.; character
    * shingles rather than word 13-grams since the fixture docs are short —
    * 24 chars ≈ 4-5 words, long enough that common phrases don't fire).
    * The held-out set here is a deterministic ~6% md5 slice so the oracle
    * can replay it; in production it is the actual eval benchmarks. 100 TB
    * shape: the eval gram set is tiny (benchmarks ≪ train corpus) →
    * broadcast semi-join, the train side never shuffles.
    */
  def ct1Contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = docs(s, dir).select(col("doc_id"),
      substring(md5(col("text")), 1, 2).as("h2"),
      graft.functions.Expressions.shingleHashes(col("text"), 24).as("g"))
    val evalGrams = sh.filter(col("h2") < "10")
      .select(explode(col("g")).as("ng")).distinct()
    sh.filter(col("h2") >= "10")
      .select(col("doc_id"), explode(col("g")).as("ng"))
      .join(broadcast(evalGrams), "ng")
      .groupBy("doc_id")
      .agg(count_distinct(col("ng")).as("n_hits"))
  }

  /** Semantic contamination — ct1's embedding-space sibling (the check
    * n-gram overlap cannot do: a paraphrased eval item shares no
    * 24-gram but sits next to its source in embedding space). Same
    * frozen eval slice as ct1 (md5-prefix content rule, doc_id ≡
    * vec_id); a train doc is flagged when any eval embedding's cosine
    * reaches `tau` (corpus-calibrated here; against real benchmarks
    * this is the SemDeDup-style near-duplicate bar).
    *
    * Determinism: cosines are floor-rounded to 1e-6 PER PAIR (the
    * e1-established cross-engine-exact expression), and both the hit
    * count and the max aggregate the rounded values — no raw-double
    * threshold or max crosses engines.
    *
    * Plan shape at 100 TB: eval benchmarks are tiny vs the train
    * corpus → broadcast the eval embeddings; the train side is one
    * map-only scan + per-doc aggregate, never shuffled (the ct1
    * broadcast-semi-join argument, embedding edition).
    */
  def ct2SemanticContamination(s: SparkSession, dir: String,
      tau: Double = 0.32): DataFrame = {
    val ids = docs(s, dir).select(col("doc_id"),
      substring(md5(col("text")), 1, 2).as("h2"))
    // norms hoisted out of the 188k×12k broadcast cross-join at sf10 —
    // cosineF would recompute both sides' sqrt(dot(x,x)) per PAIR
    // (bit-identical rewrite; see Expressions.cosinePreF)
    val withEmb = ids.join(
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding"),
          graft.functions.Expressions.normF(col("embedding")).as("nrm")),
      "doc_id")
    val evals = withEmb.filter(col("h2") < "10")
      .select(col("embedding").as("q_embedding"), col("nrm").as("q_nrm"))
    val pairR6 = floor(
      graft.functions.Expressions.cosinePreF(col("embedding"), col("nrm"),
        col("q_embedding"), col("q_nrm")) * lit(1000000.0) + lit(0.5)) /
      lit(1000000.0)
    withEmb.filter(col("h2") >= "10")
      .crossJoin(broadcast(evals))
      .select(col("doc_id"), pairR6.as("c_r6"))
      .groupBy("doc_id")
      .agg(sum(when(col("c_r6") >= tau, 1L).otherwise(0L)).as("n_hits"),
        max(col("c_r6")).as("max_cos_r6"))
      .filter(col("n_hits") >= 1)
  }

  /** Within-document repetition ratio (Gopher quality rule: fraction of
    * duplicate character n-grams). One scan, no shuffle — the shingle
    * distinct-count is a native single-pass expression.
    */
  def t7RepetitionRatio(s: SparkSession, dir: String): DataFrame = {
    val total = greatest(length(col("text")).cast("long") - 2, lit(1L))
    val distinctN =
      size(graft.functions.Expressions.shingleHashes(col("text"), 3))
        .cast("long")
    docs(s, dir).select(col("doc_id"),
      distinctN.as("distinct_ngrams"),
      total.as("total_ngrams"),
      (floor((lit(1.0) - distinctN.cast("double") / total) * 10000 + 0.5) /
        10000).as("rep_ratio"))
  }

  /** Per-stratum fixed-COUNT sampling ([[c3StratifiedSample]] is the
    * fixed-RATE form): exactly `n` docs per language, chosen by smallest
    * content hash — deterministic, replayable, and uniform-ish (md5 order
    * is independent of any data attribute). Composes the custom
    * bounded-heap top-k operator, so the per-group selection never sorts
    * a stratum and ships ≤ n rows per group per partition — at 100 TB the
    * alternative row_number window would sort every stratum in full.
    */
  def c4GroupSample(s: SparkSession, dir: String, n: Int = 20): DataFrame =
    graft.plans.TopKPerGroup.topK(
      docs(s, dir).select(col("doc_id"), col("lang"),
        md5(col("text")).as("h")),
      Seq("lang"), "h", n, desc = false, tiebreakCols = Seq("doc_id"))

  /** Winnowing document fingerprints (MOSS/SIGMOD'03): sliding-window
    * minima over positional k-gram hashes — ~2/(w+1) the size of the full
    * shingle set with a guaranteed detection floor (any shared substring
    * of length ≥ w+k−1 shares a fingerprint). The compact dup-mining
    * signal to ship at 100 TB when MinHash's probabilistic recall isn't
    * acceptable. Scan-fused native expression, no shuffle.
    */
  def d6WinnowFingerprints(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      size(graft.functions.Expressions.winnowFingerprints(col("text"), 5, 8))
        .cast("long").as("n_fingerprints"),
      size(graft.functions.Expressions.shingleHashes(col("text"), 5))
        .cast("long").as("n_shingles"))

  /** Invariant pinning d6 (ok-flag form): winnow fingerprints must be a
    * subset of the same-k shingle hash set (identical hash loop), and the
    * count must respect the winnowing bounds 1 ≤ n_fp ≤ #windows.
    */
  def wv1WinnowSubsetShingles(s: SparkSession, dir: String): DataFrame = {
    val fp = graft.functions.Expressions.winnowFingerprints(col("text"), 5, 8)
    val sh = graft.functions.Expressions.shingleHashes(col("text"), 5)
    val grams = greatest(length(col("text")) - 4, lit(1))
    val windows = greatest(grams - 8 + 1, lit(1))
    docs(s, dir).select(col("doc_id"),
      size(array_except(fp, sh)).cast("long").as("n_extra"),
      (size(fp) >= 1 && size(fp) <= windows).as("ok"))
  }

  /** Winnowing-fingerprint near-dup pairs (rows-only; the wv2 invariant
    * oracle-checks the subset relation to the exact prefix join).
    */
  def d7WinnowPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(s, dir, k = 3, w = 8, jaccardMin = 0.4)

  /** Invariant: every winnow-mined pair is also found by the exact
    * prefix-filter join at the same (k, jaccardMin) — anti-join must be
    * empty (winnowing recalls a provable subset; the exact join is
    * complete). Deliberately dual-pipeline: the winnow and prefix miners
    * share only the corpus scan, so agreement cross-checks two
    * independent candidate generators end-to-end (the check reads each
    * miner's recorded ARTIFACT — the generators stay independent; only
    * their re-execution is gone). (A per-pair membership
    * check against SQL-builtin shingle Jaccard — the x3v form — measures
    * SLOWER here: winnow pairs at 0.4 involve most of this near-dup-rich
    * corpus, so the "only involved docs" pruning prunes nothing and the
    * builtin substring shingling costs more than the second native-hash
    * mining pass it would replace.)
    */
  def wv2WinnowPairsSubsetExact(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairsArtifact(s, dir, k = 3, w = 8, jaccardMin = 0.4)
      .select("doc_a", "doc_b")
      .join(Dedup.prefixPairsArtifact(s, dir, k = 3, jaccardMin = 0.4)
        .select("doc_a", "doc_b"), Seq("doc_a", "doc_b"), "left_anti")

  /** Canonicalizing text normalization — the step before exact/fingerprint
    * dedup in a real pipeline (docs differing only in stopwords/spacing
    * should collide): strip stopwords, collapse whitespace, trim. The
    * oracle md5s the normalized text, so the transformation must match
    * DuckDB byte-for-byte — regex-dialect-safe patterns only. Scan-fused,
    * no shuffle.
    */
  def t8NormalizeStopwords(s: SparkSession, dir: String): DataFrame = {
    val stripped = regexp_replace(col("text"),
      "\\b(the|a)\\b", "")
    // explicit whitespace class, not \s: Java's \s includes vertical tab,
    // RE2's (DuckDB) does not — \x0B in a document would break md5 parity
    val collapsed = trim(regexp_replace(stripped, "[ \\t\\n\\r\\f]+", " "))
    docs(s, dir).select(col("doc_id"),
      md5(collapsed).as("md5_norm"),
      size(split(col("text"), " ")).cast("long").as("n_tokens_before"),
      size(split(collapsed, " ")).cast("long").as("n_tokens_after"))
  }

  /** Sliding token-window chunking — the context-window primitive of RAG
    * and pretraining pipelines: each doc becomes ceil(max(n-overlap,1) /
    * stride) chunks of ≤ `win` whitespace tokens, consecutive chunks
    * overlapping by `win - stride`. Pure generate-and-explode (sequence +
    * explode fuse into the scan, no shuffle, no UDF); chunk token spans
    * are emitted rather than substrings so the oracle is
    * tokenizer-independent. Stride chosen so the final chunk always
    * reaches the last token.
    */
  def t9ChunkSpans(s: SparkSession, dir: String): DataFrame = {
    val win = 100
    val stride = 80 // win - overlap(20)
    val n = size(split(col("text"), " "))
    docs(s, dir)
      .select(col("doc_id"), n.as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0),
          greatest(col("n_tokens") - (win - stride) - 1, lit(0)),
          lit(stride))).as("chunk_start"))
      .select(col("doc_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(col("chunk_start") + win, col("n_tokens")).cast("long")
          .as("chunk_end"))
  }

  /** Vocabulary top-k with term and document frequencies. */
  def v1VocabTopk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(s, dir, size = 1000)

  /** TF-IDF top-3 terms per document. */
  def t5TfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(s, dir, k = 3)

  /** BM25 top-50 docs for a fixed query-term bag (retrieval-based
    * decontamination / corpus audit primitive).
    */
  def bm1Bm25Topk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(s, dir, terms = Seq("hash", "join", "scan"))

  /** Hybrid retrieval — RRF fusion of the bm1 lexical list and the e1
    * semantic list, integer nano-unit scores (no float in the fusion).
    */
  def rrf1HybridTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.hybridRrfTopK(s, dir, terms = Seq("hash", "join", "scan"),
      queryId = 0L, n = 100, k = 20)

  /** DSIR importance weights: target = the English slice, raw = full
    * corpus; integer micro-unit log-ratio sums per doc.
    */
  def ds1DsirWeights(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirWeights(s, dir, col("lang") === "en")

  /** MMR diversified re-rank of e1's candidates — integer greedy,
    * λ = 0.7 as the 7/3 weight split.
    */
  def mmr1DiversifiedTopk(s: SparkSession, dir: String): DataFrame =
    Similarity.mmrTopK(s, dir, queryId = 0L, n = 50, k = 10)

  /** DSIR importance resampling: deterministic Gumbel-top-64 over the
    * ds1 weights — the selection step, reproducible by construction.
    */
  def ds3DsirResample(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirResample(s, dir, col("lang") === "en", k = 64)

  /** Hashed-feature DSIR (the fixed-size-model deployment variant):
    * fit the 1024-bucket log-ratio model, score every doc with the
    * per-row fold — no explode on the scoring side.
    */
  def ds2DsirHashed(s: SparkSession, dir: String): DataFrame = {
    val model = TextAnalysis.dsirModelHashed(s, dir,
      col("lang") === "en", 1024)
    TextAnalysis.withDsirHashed(
      docs(s, dir).select(col("doc_id"), col("text")),
      model, 1024, "text", "dsir_micro")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        col("dsir_micro"))
  }

  /** Shannon char entropy (nano-unit exact) — compression-proxy quality
    * signal; zero-shuffle map pass.
    */
  def t14CharEntropy(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.charEntropy(s, dir)

  /** BPE merge application: v2's 50 learned rules rewritten over every
    * doc's token stream in rank order (the tokenizer "apply" step).
    */
  def v3BpeEncode(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpeEncode(s, dir, k = 50)

  /** Signed random projection to 16 planes (JL reduction / SRP-LSH
    * magnitudes), exact BIGINT micro-unit dot products.
    */
  def e6RandomProjection(s: SparkSession, dir: String): DataFrame =
    Similarity.randomProjection(s, dir, m = 16, dim = 64)

  // ---- multimodal --------------------------------------------------------

  def mm1BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.binaryMeta(s, dir)

  /** Perceptual aHash table over decoded visual media (image dedup
    * sketch side; rows-only — real PNG decode is not SQL-expressible).
    */
  def x17ImagePhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.imagePhashes(s, dir)

  /** x17 invariant (oracle: empty relation): missing-media presence
    * contract + impossible-hash structural property — see
    * [[Multimodal.phashInvariantViolations]] for why a self-recompute
    * would be vacuous here.
    */
  def x17vPhashRecompute(s: SparkSession, dir: String): DataFrame =
    Multimodal.phashInvariantViolations(s, dir)

  /** Audio energy-envelope fingerprint table (rows-only — real WAV
    * decode is not SQL-expressible).
    */
  def x18AudioPhash(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioPhashes(s, dir)

  /** x18 invariant (oracle: empty relation): audio-sketch presence +
    * impossible-hash property.
    */
  def x18vAudioPhashProperty(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioPhashInvariantViolations(s, dir)

  /** Skew-safe two-phase salted sum — must equal the plain groupBy sum
    * (the oracle computes the plain one).
    */
  def sk1SaltedSum(s: SparkSession, dir: String): DataFrame = {
    val e = graft.sources.EventsTable.load(s, dir)
      .select(col("user_id"), col("event_id"),
        graft.functions.Expressions.moneyDec2(col("value"), 18).as("v"))
    graft.ext.SkewSafe.saltedSum(e, col("user_id"), col("v"),
      col("event_id"), salts = 16)
      .select(col("k").as("user_id"), col("total").cast("double").as("total"))
  }

  /** Native fingerprint sketches: FNV-1a + SimHash + order-insensitive
    * bag hash (custom codegen'd expressions). The bag hash is FNV-1a over
    * the CANONICAL FORM (sorted distinct words joined on U+001F — a
    * separator outside the corpus alphabet): order-insensitive by
    * construction, and, unlike xxhash64-of-array (Spark-internal
    * serialization), exactly replayable by the DuckDB oracle's HUGEINT
    * FNV emulation.
    */
  def x1FingerprintsNative(s: SparkSession, dir: String): DataFrame = {
    val bagCanon =
      array_join(sort_array(array_distinct(split(col("text"), " "))), "\u001f")
    docs(s, dir).select(
      col("doc_id"),
      graft.functions.Expressions.fnv1a64(col("text")).as("fnv64"),
      simhash64(col("text")).as("simhash"),
      graft.functions.Expressions.fnv1a64(bagCanon).as("bag_hash"))
  }

  /** x1 invariant: the native 64-bit content hashes must be injective on
    * this corpus — one distinct hash per distinct text, for both FNV-1a
    * and the order-insensitive bag hash. A collision (astronomically
    * unlikely at 64 bits, but exactly what a buggy hash loop produces)
    * would make d1-style fingerprint-keyed dedup MERGE unrelated docs,
    * so the oracle pins hash-count == text-count.
    */
  def x1vFingerprintInjective(s: SparkSession, dir: String): DataFrame = {
    val bagSet = sort_array(array_distinct(split(col("text"), " ")))
    docs(s, dir).agg(
      count_distinct(col("text")).as("n_texts"),
      count_distinct(graft.functions.Expressions.fnv1a64(col("text")))
        .as("n_fnv"),
      // bag hashes compare against distinct word SETS, not texts — two
      // texts with the same words in another order share a bag by design
      count_distinct(bagSet).as("n_bagsets"),
      count_distinct(graft.functions.Expressions
        .fnv1a64(array_join(bagSet, "\u001f"))).as("n_bag"))
  }

  /** SimHash sketch table (doc → 64-bit sketch); near-dup pair mining is
    * verified in ScalaTest with synthetic near-duplicates.
    */
  def x2SimhashSketches(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashes(s, dir)

  /** Boilerplate/template detection: word 5-grams shared by ≥ 3 distinct
    * documents, with document and occurrence counts — the repeated-
    * passage miner curation pipelines run before near-dup removal (a
    * shingle in thousands of docs is a navigation bar / license header,
    * not content). Whole pipeline is explode → one grouped aggregate:
    * the shuffle carries (shingle, doc_id) partials with map-side
    * distinct, and the ≥3 filter happens post-agg where the data is
    * already tiny. No all-pairs step at any scale.
    */
  def d10TemplateNgrams(s: SparkSession, dir: String): DataFrame = {
    val words = filter(split(col("text"), " "), w => length(w) > 0)
    docs(s, dir)
      .select(col("doc_id"), words.as("words"))
      .filter(size(col("words")) >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(words) - 5), " +
          "i -> array_join(slice(words, i + 1, 5), ' '))")).as("shingle"))
      .groupBy("shingle")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= 3)
  }

  /** Positional tokenization (posexplode / UNNEST WITH ORDINALITY): one
    * row per (doc, position, token) for a deterministic 1-in-20 doc
    * slice — the layout sequence-labeling and span-alignment passes
    * consume. Generator runs inside the scan projection; no shuffle.
    */
  def p17PosTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(pmod(col("doc_id"), lit(20L)) === 0)
      .select(col("doc_id"),
        posexplode(filter(split(col("text"), " "), w => length(w) > 0)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("token"))

  /** x2 invariant (r6 verdict item 3): recompute every SimHash sketch by
    * an INDEPENDENT relational path and pin equality with the fused
    * native expression. Independent means: tokenization by the `split`
    * builtin (regex engine) instead of the expression's char loop,
    * per-token hashes via the scalar FNV expression (itself pinned
    * injective by x1v), and the ±1 bit voting + sign packing done as 64
    * SQL aggregates + a bitwiseOR fold instead of the fused in-loop
    * accumulator. Any divergence in tokenize/vote/pack logic emits a
    * violation row; oracle: the empty relation. Tokenless docs (empty
    * text) get no vote row — the left join maps them to the expression's
    * all-zero-votes sketch (0L), so they are checked, not skipped.
    *
    * Scale note: one explode + one 64-column grouped aggregate — heavy
    * relative to the fused expression (that's the point of the fused
    * form), so this lives in the invariant set that scale sweeps skip.
    */
  def x2vSimhashRecompute(s: SparkSession, dir: String): DataFrame = {
    val fnv = graft.functions.Expressions.fnv1a64 _
    val toks = docs(s, dir).select(col("doc_id"),
      explode(filter(split(col("text"), " "), t => length(t) > 0)).as("tok"))
    val voteCols = (0 until 64).map { b =>
      sum(when(shiftrightunsigned(fnv(col("tok")), b)
        .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)).as(s"v$b")
    }
    val votes = toks.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val packed = votes.select(col("doc_id"),
      (0 until 64).map(b =>
        when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ bitwiseOR _).as("recomputed"))
    Dedup.simhashes(s, dir)
      .join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("recomputed"), lit(0L)).as("recomputed"),
        col("simhash"))
      .filter(col("recomputed") =!= col("simhash"))
  }

  /** SimHash banded near-dup pairs (Hamming ≤ 3, pigeonhole-complete via
    * four 16-bit bands) — the Hamming-metric sibling of d3/d7; pair
    * quality is ScalaTest-verified on planted near-dups, so rows-only.
    */
  def d8SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(s, dir, maxDist = 3)

  /** Incremental ingest dedup (id1): every fifth document arrives as the
    * "new batch", the rest is the standing corpus — mine new×corpus +
    * new×new through the corpus's banded sketch table without re-mining
    * corpus×corpus. The oracle recomputes the same pair set declaratively
    * (all Hamming ≤ 3 pairs touching a new doc); IncrementalDedupSpec
    * pins the stronger property that incremental ∪ previous ≡ full
    * recompute exactly.
    */
  def id1IncrementalNeardup(s: SparkSession, dir: String): DataFrame = {
    val all = Dedup.simhashes(s, dir)
    Dedup.incrementalSimhashPairsOf(
      all.filter(col("doc_id") % 5 =!= 0),
      docs(s, dir).filter(col("doc_id") % 5 === 0)
        .select("doc_id", "text"))
  }

  /** MinHash LSH candidate pairs with exact-Jaccard verify — oracle-exact
    * since r10 (the DuckDB side replays shingle FNV, splitmix signature
    * minima, and the exact sub-signature band join).
    */
  def x3MinhashLshPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(s, dir, k = 5, numHashes = 32, bands = 8,
      jaccardMin = 0.5)

  /** LSH-bucketed approximate nearest neighbors — auto-sized planes
    * (the r13 default: fixed planes make per-query candidates linear in
    * the corpus; the oracle derives from the resolved count).
    */
  def x4AnnTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(s, dir, queryId = 0L, k = 20)

  /** x4 invariant (recall direction): mean ANN recall@20 over the first
    * 10 query vectors vs exact brute-force top-20 must clear the pinned
    * floor, measured at the same auto-resolved geometry the operator
    * runs. Oracle: the empty relation.
    */
  def x4rAnnRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.annRecallViolations(s, dir, nQueries = 10, k = 20)

  /** xd1: top-k probe through an INCREMENTALLY MAINTAINED IVF index
    * (r15, VERDICT r14 item 2). The corpus splits deterministically into
    * a 98% base (vec_id mod 50 != 0) and a 2% delta; the index is BUILT
    * on the base only, the delta is then appended through
    * [[Similarity.ivfDeltaAppend]] (frozen-centroid assignment, hive
    * append, delta-inclusive recalibration), and the query probes a
    * DELTA vector (vec_id 0) against the union at the re-measured
    * depth. Same output shape as x8; the oracle replays the probe from
    * the grown artifact's own parquet at the recorded depth — so the
    * gate checks the appended artifact end-to-end, not a rebuilt one.
    */
  private val xd1Built =
    graft.ext.CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, (String, Int)]())

  /** (artifact dir, recorded nprobe) per corpus — the per-dir-map
    * discipline for the derived oracle.
    */
  def xd1Recorded: Seq[(String, Int)] = {
    import scala.jdk.CollectionConverters._
    xd1Built.values.asScala.toSeq.distinct
  }

  def xd1IvfDeltaTopK(s: SparkSession, dir: String): DataFrame = {
    val rec = xd1Built.computeIfAbsent(dir, _ => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val base = e.filter(pmod(col("vec_id"), lit(50L)) =!= 0)
      val delta = e.filter(pmod(col("vec_id"), lit(50L)) === 0)
      val nlist = Similarity.autoNlist(base.count())
      val idx = Similarity.buildIvfFrom(s, s"$dir|xd1base|$nlist",
        base, nlist)
      Similarity.ivfDeltaAppend(s, idx, delta): Unit
      (idx, Similarity.calibratedNprobe(s, idx))
    })
    val (idx, np) = rec
    val q = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_embedding"))
    Similarity.ivfProbe(s, idx, q, queryId = 0L, k = 20, np = np)
      .withColumn("cosine_r6",
        floor(col("cosine") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .drop("cosine")
  }

  /** IVF coarse-quantized ANN (k-means cells + nprobe probing).
    * Oracle-exact since r10 (artifact-derived: the DuckDB side re-ranks
    * the centroid parquet, probes the same 3 cells, and re-scores with
    * the same element-ordered cosine); the emitted cosine is rounded to
    * 1e-6 like e1's — rank order still uses the raw double.
    */
  def x8IvfTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(s, dir, queryId = 0L, k = 20)
      .withColumn("cosine_r6",
        floor(col("cosine") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .drop("cosine")

  // ---- oracle-checked invariants over the approximate operators ----------
  // Each pairs a rows-only x-query with a DuckDB-checkable invariant: the
  // approximate structure's guarantee, computed in Spark, compared against
  // what the oracle says it must be (VERDICT r1 item 6).

  /** x3 invariant: every LSH-emitted pair must genuinely have Jaccard ≥
    * the threshold — recomputed INDEPENDENTLY from raw text with Spark
    * built-ins (substring shingles + array_intersect/union), not the
    * native hash path the LSH pipeline itself uses. Subset-of-exact only
    * requires per-pair membership, which is O(|pairs|); materializing the
    * full exact pair set to anti-join against would cost a corpus-wide
    * set-similarity join just to check ~hundreds of pairs (the
    * completeness direction of the prefix join is covered by its own
    * ScalaTest equivalence and the d3 oracle).
    */
  def x3vLshSubsetExact(s: SparkSession, dir: String): DataFrame = {
    // the miner artifact replaces the old localCheckpoint: one durable
    // materialization serves the three plan references (join spine +
    // both endpoints of the involved-docs semi-join)
    val pairs = Dedup.minhashPairsArtifact(s, dir, k = 5, numHashes = 32,
      bands = 8, jaccardMin = 0.5).select("doc_a", "doc_b")
    val involved = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val shingled = docs(s, dir).select(col("doc_id"), col("text"))
      .join(involved, Seq("doc_id"))
      .select(col("doc_id"),
        when(length(col("text")) >= 5,
          expr("array_distinct(transform(sequence(1, length(text)-4)," +
            " i -> substr(text, i, 5)))"))
          .otherwise(expr("array()")).as("sset"))
    pairs
      .join(shingled.select(col("doc_id").as("doc_a"),
        col("sset").as("sa")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"),
        col("sset").as("sb")), Seq("doc_b"))
      .withColumn("jacc",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
      .filter(col("jacc").isNull || col("jacc") < 0.5)
      .select("doc_a", "doc_b")
  }

  /** x4 invariant: every ANN result's cosine must equal the brute-force
    * cosine for that vec_id (the bucketed path must score the same
    * embeddings the full scan would). A global-rank subset claim would be
    * FALSE for hyperplane LSH at this corpus's low neighbor similarity
    * (~0.4) — recall there is a parameter trade, not a guarantee — so the
    * invariant pins score fidelity, which IS guaranteed.
    */
  def x4vAnnScoresMatchBrute(s: SparkSession, dir: String): DataFrame = {
    val round6 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding").as("q_embedding"))
    val brute = e.filter(col("vec_id") =!= 0L)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round6(graft.functions.Expressions.cosineF(
          col("embedding"), col("q_embedding"))).as("cosine_r6"))
    Similarity.annTopK(s, dir, queryId = 0L, k = 20)
      .select(col("vec_id"), round6(col("cosine")).as("cosine_r6"))
      .join(brute, Seq("vec_id", "cosine_r6"), "left_anti")
  }

  /** x8 invariant: IVF probe results must come from the exact brute-force
    * top-50 of the same query.
    */
  def x8vIvfSubsetExact(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(s, dir, queryId = 0L, k = 20)
      .select("vec_id")
      .join(Similarity.cosineTopK(s, dir, queryId = 0L, k = 50)
        .select("vec_id"), Seq("vec_id"), "left_anti")

  /** x11 invariant: int8 symmetric per-vector quantization (scale =
    * max|x|/127 — the standard embedding-compression step; 4× smaller
    * scans for every ANN probe) must preserve self-cosine ≥ 0.999 after
    * dequantization. All arithmetic is Spark higher-order functions plus
    * the native cosine; the oracle pins the verdict column.
    */
  def x11vQuantCosineBound(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    val scale = greatest(
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
        " (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))") / lit(127.0),
      lit(1e-12))
    e.withColumn("_scale", scale)
      .withColumn("deq", expr(
        "transform(embedding," +
          " x -> CAST(round(CAST(x AS DOUBLE) / _scale) * _scale AS FLOAT))"))
      .select(col("vec_id"),
        when(graft.functions.Expressions.cosineF(col("embedding"),
          col("deq")) >= 0.999, lit(1)).otherwise(lit(0))
          .cast("int").as("within_bound"))
  }

  /** Frame-sampling stub over video payloads (1 row in → N frames out). */
  def x5FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(s, dir)

  /** Partition-batched media feature extraction — REAL decode (ImageIO /
    * AudioSystem / GFV1 demux).
    */
  def x6MediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s, dir).toDF()

  /** Real media resize pass (decode → bilinear scale into the box →
    * re-encode PNG); payload dropped from the declared output.
    */
  def x13MediaResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resize(s, dir).toDF()
      .select("media_id", "kind", "src_width", "src_height",
        "dst_width", "dst_height", "n_bytes_in", "n_bytes_out")

  /** x5 invariant: sampled frame dims/count must match the generator's
    * parameters after a real decode. Oracle: empty relation.
    */
  def x5vFrameRoundtrip(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSampleViolations(s, dir)

  /** x6 invariant: decode(generate(id)) reproduces the generator params
    * for every kind. Oracle: empty relation.
    */
  def x6vDecodeRoundtrip(s: SparkSession, dir: String): DataFrame =
    Multimodal.featuresRoundtripViolations(s, dir)

  /** x13 invariant: resize contract (box, no upscale, aspect, re-decode
    * dims). Oracle: empty relation.
    */
  def x13vResizeContract(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeContractViolations(s, dir)

  /** Temperature-weighted source mixing — the pretraining-mix primitive:
    * per-source quotas ∝ count^alpha (alpha = 0.5 here, the classic
    * "sample rare domains up" exponent), rows chosen within each source
    * by content-hash order so the selection is deterministic, engine-
    * independent, and stable under re-runs/incremental ingests (same
    * property as [[c2ConsistentSample]]).
    *
    * Scale: one count aggregate over the corpus (tiny result — one row
    * per source), quotas broadcast back, one window ranked by (hash,
    * doc_id) per source partition. No global sort; the per-source sort is
    * the same shape as any grouped top-k and could route through the
    * bounded-heap [[graft.plans.TopKPerGroup]] operator when quotas are
    * uniform. Quota arithmetic goes through integer micro-weights
    * (floor(sqrt(n)·1e6) — sqrt is IEEE-deterministic) so the total and
    * the quota division are EXACT integer ops on both engines; a raw
    * double sum of per-source weights would be summation-order-dependent
    * and could flip a floor boundary between engines.
    *
    * The mix size is PINNED at 200 because that is exactly what the
    * registered oracle SQL verifies — a tunable the oracle can't see is
    * a dishonest signature (r6 advice); generalizing means
    * parameterizing the oracle too, not widening this signature.
    */
  def c5TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val targetRows = 200
    val d = docs(s, dir).withColumn("h", md5(col("text")))
    val weights = d.groupBy("source")
      .agg(count(lit(1)).as("n"))
      .withColumn("wi",
        floor(sqrt(col("n").cast("double")) * 1e6 + 0.5).cast("long"))
    val totalW = weights.agg(sum(col("wi")).as("w_total"))
    val quotas = weights.crossJoin(broadcast(totalW))
      .select(col("source"),
        expr(s"CAST(($targetRows * wi) DIV w_total AS BIGINT)").as("quota"))
    val ranked = d.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("h"), col("doc_id"))))
    ranked.join(broadcast(quotas), Seq("source"))
      .filter(col("rn") <= col("quota"))
      .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"),
        col("quota"))
  }

  /** Corpus length histogram: fixed-width buckets over whitespace token
    * counts — the standard corpus-stats pass before choosing packing /
    * chunking parameters. Pure arithmetic bucketing (floor + cap), so the
    * oracle is exact; one scan, one tiny aggregate (≤ 20 groups).
    */
  def h1LengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    docs(s, dir)
      .select(least(floor(n / 5L), lit(19L)).cast("long").as("bucket"),
        n.as("n_tokens"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("n_tokens").as("min_tokens"),
        max("n_tokens").as("max_tokens"))
  }

  /** Relative quality gate: keep documents at or above their source's
    * 25th length percentile — quality bars in real curation pipelines
    * are RELATIVE to the domain (a short academic abstract is fine; a
    * short forum scrape is noise). percent_rank is (rank-1)/(n-1) on
    * both engines — exact integer inputs, identical double division —
    * and the (n_tokens, doc_id) ordering makes the rank deterministic.
    * Scale: one window over the source partitioning; no global sort.
    */
  def t11RelativeQualityGate(s: SparkSession, dir: String): DataFrame = {
    val n = size(split(col("text"), " ")).cast("long")
    docs(s, dir)
      .withColumn("n_tokens", n)
      .withColumn("pr", percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n_tokens"), col("doc_id"))))
      .filter(col("pr") >= 0.25)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  /** kNN join (top-3 neighbors per vector, LSH-bucketed candidates) —
    * rows-only: bucket membership depends on the seeded random planes,
    * so there is no SQL oracle; e3v pins every emitted score to an
    * independent recomputation and ExtSpec checks neighbor quality.
    */
  def e3KnnJoin(s: SparkSession, dir: String): DataFrame =
    Similarity.knnJoin(s, dir, k = 3)

  /** e3 invariant (recall direction): corpus-level recall@3 of the LSH
    * kNN join vs the exact blocked all-pairs top-3 must clear the pinned
    * floor. Oracle: the empty relation. The exact side is deliberately
    * quadratic ground truth → lives in the invariant query set.
    */
  def e3rKnnRecall(s: SparkSession, dir: String): DataFrame =
    Similarity.knnRecallViolations(s, dir, k = 3)

  /** e3 invariant (score direction): every (src, neighbor, cosine) the
    * kNN join emits must carry EXACTLY the cosine an independent
    * HOF-only recomputation from the raw embeddings table produces (same
    * left-to-right double accumulation → bit-equal; compared at 6
    * decimals). Violations → rows; oracle: the empty relation.
    */
  def e3vKnnScoresMatch(s: SparkSession, dir: String): DataFrame = {
    val round6 = (c: org.apache.spark.sql.Column) =>
      floor(c * 1000000 + lit(0.5)) / 1000000
    val e = s.read.parquet(s"$dir/embeddings.parquet")
    def hofDot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) *" +
        s" CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    Similarity.knnJoinArtifact(s, dir, k = 3)
      .join(e.select(col("vec_id").as("src_id"),
        col("embedding").as("a_emb")), "src_id")
      .join(e.select(col("vec_id").as("nb_id"),
        col("embedding").as("b_emb")), "nb_id")
      .withColumn("cos_h", hofDot("a_emb", "b_emb") /
        (sqrt(hofDot("a_emb", "a_emb")) * sqrt(hofDot("b_emb", "b_emb"))))
      .filter(round6(col("cosine")) =!= round6(col("cos_h")))
      .select(col("src_id"), col("nb_id"))
  }

  /** Cohort retention — per signup-week cohort, distinct active users at
    * each week offset. All week math is integer epoch-second division;
    * two aggregates + one join on the user_id partitioning.
    */
  def f2CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val wk = graft.sources.EventsTable.load(s, dir)
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 604800").as("week"))
    val cohort = wk.groupBy("user_id").agg(min("week").as("cohort_week"))
    wk.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }

  /** Z-order key computation over events (see [[graft.ext.ZOrder]]) —
    * the clustering key for 2-d data skipping. Pure bit arithmetic, so
    * the oracle recomputes it with shifts/masks; the layout + file-
    * pruning behavior is asserted in ZOrderSpec.
    */
  def z1ZorderKey(s: SparkSession, dir: String): DataFrame =
    graft.ext.ZOrder.eventsZKeyed(s, dir)

  /** d8 invariant (completeness direction): by pigeonhole, any pair at
    * Hamming distance ≤ 3 over a 64-bit SimHash must agree exactly on at
    * least one of the 4 16-bit bands — so the banded candidate generator
    * provably finds EVERY such pair. This recomputes the ground truth by
    * brute force (all-pairs popcount over the compact (doc_id, simhash)
    * sketch — 16 bytes/row, broadcast nested-loop, never materializing
    * text pairs) and anti-joins the banded miner's output: any surviving
    * row is a recall bug. Oracle: the empty relation.
    */
  def d8vSimhashBandComplete(s: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.simhashes(s, dir)
    val a = sh.toDF("doc_a", "sim_a")
    val b = sh.toDF("doc_b", "sim_b")
    val exact = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sim_a").bitwiseXOR(col("sim_b"))) <= 3)
      .select("doc_a", "doc_b")
    exact.join(
      Dedup.simhashPairsArtifact(s, dir, maxDist = 3)
        .select("doc_a", "doc_b"),
      Seq("doc_a", "doc_b"), "left_anti")
  }
}
