package graft.stream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{ProductQuant, Similarity}

/** Ingest-time IVF-PQ near-duplicate gate: match every arriving
  * embedding against the static corpus through the PQ CODE table — the
  * memory-bound artifact a production gate actually holds (8 bytes per
  * corpus vector vs the 256-byte floats [[StreamSemDedup]]'s exact
  * re-rank reads). This is the streaming shape of `x19_ivfpq_topk`,
  * sharing both of its offline artifacts (the IVF index and the PQ
  * codebooks/codes — ref: the reference's stream_processor.py gates
  * arrivals against precomputed state, never refitting in-stream).
  *
  * Plan shape, per micro-batch (stateless, append-legal — no watermark,
  * no state store):
  *   1. probe-cell assignment as a PURE PROJECTION: the nlist centroids
  *      ride in one typedLit array (the StreamSemDedup r9 lesson — an
  *      unrolled per-centroid fold re-plans O(nlist·dim) nodes per
  *      epoch), ranked per row by (d², cell), sliced to `nprobe`,
  *      exploded;
  *   2. stream-static equi-join on the cell key against the
  *      cell-partitioned CODE table — the static side carries
  *      (cell, corpus_id, codes[m]): the corpus floats never enter the
  *      join;
  *   3. the match score is the ADC-style ASYMMETRIC cosine
  *      cos(q, x̂) = q·x̂ / (|q|·|x̂|) against the quantized
  *      reconstruction x̂, computed entirely from codebook literals:
  *      q·x̂ folds the row's subvectors against the looked-up centroid
  *      (m runtime-lambda folds), |x̂|² is a precomputed per-(subspace,
  *      code) norm lookup. No corpus float I/O anywhere — the IVF-PQ
  *      promise carried into the stream.
  *
  * Quantization makes the score approximate (cos(q, x̂), not
  * cos(q, x)); StreamIvfPqSpec measures the self-match floor and pins
  * stream ≡ batch. A caller needing exact confirmation chains the
  * [[StreamSemDedup]] gate behind this one on the (much smaller)
  * match set — PQ prefilter, exact verify: the x15 shortlist pattern.
  */
object StreamIvfPq {

  /** The static side, loadable ONCE and reused across micro-batches.
    * `centroids`/`codebooks`/`norm2` are driver-sized by construction
    * (nlist ≈ √n rows; m·ksub codebook rows); `codes` is the corpus-
    * scale-but-8-bytes-per-vector frame (persist it for a foreachBatch
    * caller).
    */
  final case class Artifact(centroids: Seq[(Int, Seq[Double])],
      codebooks: IndexedSeq[IndexedSeq[Seq[Double]]],
      norm2: IndexedSeq[IndexedSeq[Double]],
      m: Int, dsub: Int, codes: DataFrame)

  def artifact(s: SparkSession, dir: String): Artifact = {
    val idx = Similarity.ivfIndexDir(s, dir)
    val root = ProductQuant.pqDir(s, dir)
    val centroids = s.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
      .sortBy(_._1).toIndexedSeq
    val books = s.read.parquet(s"$root/codebooks").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2)))
      .toMap
    val m = books.keys.map(_._1).max + 1
    val ksub = books.keys.map(_._2).max + 1
    val codebooks = (0 until m).map(j => (0 until ksub).map(c => books((j, c))))
    val norm2 = codebooks.map(_.map(c => c.map(x => x * x).sum))
    val dsub = codebooks.head.head.length
    // cell-keyed code table: reads ONLY (vec_id, cell) from the IVF
    // artifact (column-pruned — the float embedding stays in parquet)
    // plus the 8-byte code rows
    val codes = s.read.parquet(s"$root/codes")
      .join(s.read.option("basePath", s"$idx/cells").parquet(s"$idx/cells")
        .select(col("vec_id"), col("cell")), Seq("vec_id"))
      .select(col("cell"), col("vec_id").as("corpus_id"), col("codes"))
    Artifact(centroids, codebooks, norm2, m, dsub, codes)
  }

  /** Gate a (vec_id, embedding: array<float>) stream (or batch frame —
    * every op here is a stateless projection + equi-join, so the SAME
    * function serves both; stream ≡ batch holds by construction).
    * Returns (in_id, corpus_id, cell, cosine_adc) matches with
    * asymmetric cosine ≥ `tau`. `nprobe = 0` probes the gate-calibrated
    * fraction of the cell count ([[Similarity.autoNprobe]]).
    */
  def matchesAgainst(stream: DataFrame, art: Artifact,
      tau: Double = 0.5, nprobe: Int = 0): DataFrame = {
    val np = math.min(
      if (nprobe > 0) nprobe else Similarity.autoNprobe(art.centroids.length),
      art.centroids.length)
    val ctrs: Column = typedLit(art.centroids)
    val qd = col("in_emb").cast("array<double>")
    // (d², cell) ranking — ascending lexicographic array_sort IS argmin
    // with deterministic tie-break (the StreamSemDedup construction)
    val ranked = array_sort(transform(ctrs, ct =>
      struct(
        aggregate(
          zip_with(qd, ct.getField("_2"), (x, c) => (x - c) * (x - c)),
          lit(0.0), (acc, v) => acc + v).as("d2"),
        ct.getField("_1").as("cell"))))
    val assigned = stream
      .select(col("vec_id").as("in_id"), col("embedding").as("in_emb"))
      .withColumn("q_norm2",
        aggregate(qd, lit(0.0), (acc, x) => acc + x * x))
      .withColumn("cell", explode(slice(ranked, 1, np).getField("cell")))
    val cb: Column = typedLit(art.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val n2: Column = typedLit(art.norm2.map(_.toSeq).toSeq)
    val dot = (0 until art.m).map { j =>
      val sub = slice(qd, j * art.dsub + 1, art.dsub)
      val c = element_at(element_at(cb, j + 1),
        col("codes").getItem(j) + 1)
      aggregate(zip_with(sub, c, (x, cc) => x * cc),
        lit(0.0), (acc, v) => acc + v)
    }.reduce(_ + _)
    val xNorm2 = (0 until art.m).map(j =>
      element_at(element_at(n2, j + 1), col("codes").getItem(j) + 1))
      .reduce(_ + _)
    assigned.join(art.codes, Seq("cell"))
      .withColumn("cosine_adc",
        dot / (sqrt(col("q_norm2")) * sqrt(xNorm2)))
      .filter(col("cosine_adc") >= tau)
      .select(col("in_id"), col("corpus_id"), col("cell"),
        col("cosine_adc"))
  }
}
