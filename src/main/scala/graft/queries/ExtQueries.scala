package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.Expressions.simhash64

/** SURVEY.md §7.4 extension operators as driver-checkable queries.
  * Oracle-aligned wrappers cast Spark INT results (size/length) to long —
  * DuckDB's len()/count are BIGINT and the driver compares schemas.
  * Queries prefixed x_ have no SQL oracle (native hashes / LSH internals);
  * the driver does a rows>0 check and ScalaTest owns their semantics.
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
    * lemma, which the oracle verifies.
    */
  def d3NgramJaccardPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(s, dir, k = 3, jaccardMin = 0.4)

  // ---- similarity search -------------------------------------------------

  def e1CosineTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(s, dir, queryId = 0L, k = 20)

  /** Blocked exact pair join — equi-joins only, no full-table broadcast. */
  def e2CosineNearDupPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairsBlocked(s, dir, minCosine = 0.45, blocks = 8)

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

  /** Composed curation chain: quality gate → language gate → dedup →
    * token accounting (fully SQL-expressible, so oracle-checked).
    */
  def c1CurationPipeline(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.curationPipeline(s, dir)

  /** Vocabulary top-k with term and document frequencies. */
  def v1VocabTopk(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.vocabulary(s, dir, size = 1000)

  /** TF-IDF top-3 terms per document. */
  def t5TfidfTopTerms(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopTerms(s, dir, k = 3)

  // ---- multimodal --------------------------------------------------------

  def mm1BinaryMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.binaryMeta(s, dir)

  /** Skew-safe two-phase salted sum — must equal the plain groupBy sum
    * (the oracle computes the plain one).
    */
  def sk1SaltedSum(s: SparkSession, dir: String): DataFrame = {
    val e = s.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("value").cast("decimal(18,2)").as("v"))
    graft.ext.SkewSafe.saltedSum(e, col("user_id"), col("v"),
      col("event_id"), salts = 16)
      .select(col("k").as("user_id"), col("total").cast("double").as("total"))
  }

  // ---- rows-only (native hashing / LSH — not SQL-expressible) ------------

  /** Native fingerprint sketches: FNV-1a + SimHash + order-insensitive
    * bag hash (custom codegen'd expressions).
    */
  def x1FingerprintsNative(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      graft.functions.Expressions.fnv1a64(col("text")).as("fnv64"),
      simhash64(col("text")).as("simhash"),
      xxhash64(sort_array(array_distinct(split(col("text"), " ")))).as("bag_hash"))

  /** SimHash sketch table (doc → 64-bit sketch); near-dup pair mining is
    * verified in ScalaTest with synthetic near-duplicates.
    */
  def x2SimhashSketches(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashes(s, dir)

  /** MinHash LSH candidate pairs with exact-Jaccard verify. */
  def x3MinhashLshPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(s, dir, k = 5, numHashes = 32, bands = 8,
      jaccardMin = 0.5)

  /** LSH-bucketed approximate nearest neighbors. */
  def x4AnnTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.annTopK(s, dir, queryId = 0L, k = 20, nPlanes = 8)

  /** IVF coarse-quantized ANN (k-means cells + nprobe probing). */
  def x8IvfTopK(s: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopK(s, dir, queryId = 0L, k = 20, nlist = 8, nprobe = 3)

  /** Frame-sampling stub over video payloads (1 row in → N frames out). */
  def x5FrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(s, dir)

  /** Partition-batched media feature extraction (decode stub). */
  def x6MediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s, dir).toDF()
}
