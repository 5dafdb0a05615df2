package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.Clustering
import graft.functions.Expressions.cosineF

/** Ingest-time SEMANTIC near-duplicate gate: match every arriving
  * embedding against the STATIC corpus through the k-means clustering
  * artifact — the streaming shape of `e5_semantic_dedup`, and the
  * semantic sibling of [[StreamNearDup]] (which gates on textual
  * SimHash). A training-data pipeline runs this before accepting a new
  * sample: "is this semantically (nearly) something we already have?"
  *
  * Plan shape, per micro-batch:
  *   1. nearest-centroid assignment as a PURE PROJECTION — the k
  *      centroids are loaded driver-side once (k rows, the IVF-probe
  *      pattern) and folded into a `least()` over k (distance, cell)
  *      structs, whose lexicographic ordering IS argmin with
  *      deterministic tie-break on cell id. No aggregation, so the
  *      stream stays stateless in append mode;
  *   2. stream-static equi-join on the cell key against the corpus
  *      assignment table, exact cosine inside the cell only.
  * STATELESS — no watermark, no state store growth; the static side is
  * the offline clustering artifact (at scale: a bucketed table co-keyed
  * on cell, exactly the SemDeDup layout).
  */
object StreamSemDedup {

  /** `stream` must carry (vec_id, embedding: array<float>). Returns
    * (in_id, corpus_id, cell, cosine) matches with cosine ≥ `tau`.
    *
    * `nprobe` bounds the RECALL of the gate exactly like the IVF probe
    * count in [[graft.ext.Similarity]]: a near-duplicate whose corpus
    * copy was assigned to a DIFFERENT cell than the arriving vector is
    * invisible at nprobe=1 (the cells partition the space; neighbors
    * straddle boundaries). Probing the `nprobe` nearest centroids
    * multiplies the per-row join fan-out by nprobe and recovers
    * boundary-straddling matches; nprobe=k is exhaustive (every match
    * ≥ tau found, brute-force equivalent). Corpus vectors live in
    * exactly one cell, so probing multiple cells never duplicates an
    * (in_id, corpus_id) pair. The assignment stays a pure projection —
    * rank the k (d2, cell) structs, slice nprobe, explode — so the
    * stream remains stateless in append mode.
    */
  def againstCorpus(stream: DataFrame, s: SparkSession, dir: String,
      tau: Double = 0.35, nprobe: Int = 1): DataFrame =
    matchesAgainst(stream, artifact(s, dir), tau, nprobe)

  /** The static side, loadable ONCE and reused across micro-batches:
    * driver-side centroids plus the cell-keyed corpus frame (persist the
    * frame for a per-epoch caller like foreachBatch).
    */
  final case class Artifact(centroids: Array[(Int, Array[Double])],
      corpus: DataFrame)

  def artifact(s: SparkSession, dir: String): Artifact = {
    val root = Clustering.clusterDir(s, dir)
    val centroids = s.read.parquet(s"$root/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val corpus = s.read.parquet(s"$root/assign")
      .join(s.read.parquet(s"$dir/embeddings.parquet"), Seq("vec_id"))
      .select(col("cell"), col("vec_id").as("corpus_id"), col("embedding"))
    Artifact(centroids, corpus)
  }

  /** Same gate against a prebuilt (possibly cached) [[Artifact]].
    *
    * The centroid table rides in ONE `typedLit` array-of-structs
    * Literal that the `transform` lambda iterates at RUNTIME — k
    * unrolled per-centroid literal folds (the pre-r9 shape) made the
    * plan tree O(k·dim) nodes, and a foreachBatch caller re-planned
    * that tree every epoch (~14 s/epoch at k=32, dim=64; the whole
    * gate chain ran 43× slower than ungated on plan compilation
    * alone). Still a pure per-row projection: stateless, append-legal.
    */
  def matchesAgainst(stream: DataFrame, art: Artifact,
      tau: Double = 0.35, nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val ctrs: Column =
      typedLit(art.centroids.toSeq.map { case (cell, c) => (cell, c.toSeq) })
    // array_sort on (d2, cell) structs is ascending lexicographic —
    // argmin-first with deterministic tie-break, the least() fold
    // generalized to a ranking; slice keeps the nprobe nearest cells
    val ranked = array_sort(transform(ctrs, ct =>
      struct(
        aggregate(
          zip_with(col("in_emb").cast("array<double>"), ct.getField("_2"),
            (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v).as("d2"),
        ct.getField("_1").as("cell"))))
    val assigned = stream
      .select(col("vec_id").as("in_id"), col("embedding").as("in_emb"))
      .withColumn("cell",
        explode(slice(ranked, 1,
          math.min(nprobe, art.centroids.length)).getField("cell")))
    assigned.join(art.corpus, Seq("cell"))
      .withColumn("cosine", cosineF(col("in_emb"), col("embedding")))
      .filter(col("cosine") >= tau)
      .select(col("in_id"), col("corpus_id"), col("cell"), col("cosine"))
  }

  /** Squared distance from the row's `in_emb` to a literal centroid,
    * in doubles (matching the batch assigner's arithmetic domain).
    */
  private def expr_d2(centroid: Column): Column =
    aggregate(
      zip_with(col("in_emb").cast("array<double>"), centroid,
        (x, c) => (x - c) * (x - c)),
      lit(0.0),
      (acc, v) => acc + v)
}
