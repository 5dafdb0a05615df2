package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-budget batch packing: group documents into training batches whose
  * token totals stay under a budget — the shard-construction step of an
  * LLM data pipeline (sequence packing à la T5/GPT data loaders).
  *
  * Exact global bin packing is inherently sequential; the distributed form
  * packs WITHIN partitions (batches never span partitions — exactly how
  * per-worker training shards are built). Documents are routed to a
  * partition by a deterministic key hash and packed greedily in doc-id
  * order, so the batch assignment is reproducible run-to-run and
  * independent of cluster parallelism (the shard key, not
  * `spark.default.parallelism`, decides placement).
  *
  * A document larger than the budget gets a batch of its own (callers
  * truncate/split upstream if that is not acceptable).
  */
object BatchPacking {

  /** Pack (id, tokens) rows into batches of at most `budget` tokens within
    * each of `shards` deterministic shards. Output: (shard, batch_in_shard,
    * batch_id, doc_id, n_tokens).
    */
  def packByTokenBudget(docs: DataFrame, idCol: String, tokensCol: String,
      budget: Long, shards: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(budget > 0 && shards > 0)
    val keyed = docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards)).cast("int"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .as[(Long, Long, Int)]
    keyed.mapPartitions { it =>
      // a partition may hold several shards (hash collisions): reset the
      // packer at shard boundaries so output is partitioning-independent
      var curShard = -1
      var batch = -1L
      var used = 0L
      it.map { case (docId, nTokens, shard) =>
        if (shard != curShard) { curShard = shard; batch = -1L; used = 0L }
        if (batch < 0 || used + nTokens > budget) { batch += 1; used = 0L }
        used += nTokens
        (shard, batch, s"$shard-$batch", docId, nTokens)
      }
    }.toDF("shard", "batch_in_shard", "batch_id", "doc_id", "n_tokens")
  }

  /** Declared query: documents packed by whitespace token count under a
    * 2 000-token budget. Batch ids are deterministic (shard = doc_id mod
    * 32, greedy in doc-id order); oracle-exact since r10s5 — the DuckDB
    * side replays the greedy recurrence with a recursive CTE that
    * advances every shard one ranked doc per step. ScalaTest still owns
    * the invariants (budget respected, every doc once, greedy tightness).
    */
  /** One budget definition shared by the declared query and its invariant —
    * if they drifted, t6v would silently check the wrong bound.
    */
  val T6Budget = 2000L

  /** Shard count shared by the declared query and its DuckDB oracle
    * (the oracle's recursive CTE interpolates both constants).
    */
  val T6Shards = 32

  /** Sequence length for [[sequenceWindows]], shared with its oracle. */
  val T15SeqLen = 512L

  /** Fixed-length training-sequence construction — the GPT-style data
    * loader step AFTER packing: per shard, documents concatenate in
    * doc-id order into one token stream, and the stream splits into
    * `seqLen`-token sequences; a document crossing a boundary
    * contributes a span to EACH sequence it touches (t6's batches never
    * split docs — this operator does, which is how causal-LM loaders
    * actually build their 2048-token rows).
    *
    * Fully declarative — one window cumsum per shard gives each doc its
    * stream offset, and `explode(sequence(first_seq, last_seq))` fans
    * each doc to the sequences it overlaps; span arithmetic is pure
    * integer projection. No mapPartitions, no recursion — the oracle is
    * the identical window + generate_series SQL, exact by construction.
    *
    * Scale shape: ONE shuffle (the shard window sort, t6's layout);
    * output rows = docs + boundary crossings, never tokens. At 100 TB
    * the shard count scales with executors and each shard's cumsum is
    * an independent sorted partition.
    */
  def sequenceWindows(docs: DataFrame, idCol: String, tokensCol: String,
      seqLen: Long = T15SeqLen, shards: Int = T6Shards): DataFrame = {
    require(seqLen > 0 && shards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        -1)
    // Domain guard: Spark's sequence(a, b) with a > b DESCENDS — a
    // 0-token doc would emit phantom spans (generate_series yields none
    // on the oracle side) and a negative count would explode a huge
    // range. Zero-token docs contribute nothing to the stream by
    // definition → drop them (matches the oracle); negatives are input
    // corruption → fail loudly, in codegen.
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        when(col(tokensCol).cast("long") >= 0, col(tokensCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("sequenceWindows: negative token count for doc "),
            col(idCol).cast("string")))).as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard", pmod(col("doc_id"), lit(shards)).cast("int"))
      .withColumn("off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("seq_in_shard", explode(expr(
        s"sequence(off DIV $seqLen, (off + n_tokens - 1) DIV $seqLen)")))
      .select(col("shard"), col("seq_in_shard"), col("doc_id"),
        greatest(lit(0L), col("seq_in_shard") * seqLen - col("off"))
          .as("tok_start"),
        least(col("n_tokens"),
          (col("seq_in_shard") + 1) * seqLen - col("off")).as("tok_end"))
  }

  /** Declared query: whitespace-token sequences of 512 over the
    * documents corpus.
    */
  def t15SequenceWindows(s: SparkSession, dir: String): DataFrame =
    sequenceWindows(
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens")

  def t6TokenBatches(s: SparkSession, dir: String): DataFrame = {
    val d = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    packByTokenBudget(d, "doc_id", "n_tokens", budget = T6Budget,
      shards = T6Shards)
  }

  /** Oracle-checkable invariant over [[t6TokenBatches]] (ok-flag form):
    * every document lands in exactly one batch (n_docs equals the table
    * count, which DuckDB recomputes) and no multi-document batch exceeds
    * the budget (single oversized docs legitimately get their own batch).
    */
  def t6vPackingInvariants(s: SparkSession, dir: String): DataFrame = {
    val packed = t6TokenBatches(s, dir)
    val once = packed.agg(
      count(lit(1)).as("n_docs"),
      (count(lit(1)) === count_distinct(col("doc_id"))).as("docs_once"))
    val bad = packed.groupBy("batch_id")
      .agg(sum("n_tokens").as("toks"), count(lit(1)).as("n"))
      .filter(col("toks") > T6Budget && col("n") > 1)
      .agg(count(lit(1)).as("n_bad_batches"))
    once.crossJoin(bad)
  }
}
