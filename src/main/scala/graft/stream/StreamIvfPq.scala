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
    * caller). `nprobeCalib` is the probe depth the IVF artifact was
    * recall-calibrated to at build time ([[Similarity.calibratedNprobe]],
    * r14) — the `nprobe = 0` resolution for the gate.
    */
  final case class Artifact(centroids: Seq[(Int, Seq[Double])],
      codebooks: IndexedSeq[IndexedSeq[Seq[Double]]],
      norm2: IndexedSeq[IndexedSeq[Double]],
      m: Int, dsub: Int, codes: DataFrame, nprobeCalib: Int,
      tauPreCalib: Double)

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
    Artifact(centroids, codebooks, norm2, m, dsub, codes,
      math.min(Similarity.calibratedNprobe(s, idx), centroids.length),
      ProductQuant.chainTauPre(s, root))
  }

  /** Gate a (vec_id, embedding: array<float>) stream (or batch frame —
    * every op here is a stateless projection + equi-join, so the SAME
    * function serves both; stream ≡ batch holds by construction).
    * Returns (in_id, corpus_id, cell, cosine_adc) matches with
    * asymmetric cosine ≥ `tau`. `nprobe = 0` probes the depth the IVF
    * artifact was recall-calibrated to at build time
    * ([[Artifact.nprobeCalib]]).
    */
  def matchesAgainst(stream: DataFrame, art: Artifact,
      tau: Double = 0.5, nprobe: Int = 0): DataFrame =
    adcScored(stream, art, nprobe)
      .filter(col("cosine_adc") >= tau)
      .select(col("in_id"), col("corpus_id"), col("cell"),
        col("cosine_adc"))

  /** The shared ADC-scored candidate frame (probe-cell assignment →
    * cell join against the code table → quantized cosine), with the
    * incoming floats still attached — [[matchesAgainst]] drops them,
    * [[chainedMatches]] needs them for its exact confirm stage.
    */
  private def adcScored(stream: DataFrame, art: Artifact,
      nprobe: Int): DataFrame = {
    val np = math.min(
      if (nprobe > 0) nprobe else art.nprobeCalib,
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
  }

  /** CHAINED gate — the x15 shortlist-verify pattern streamed (the
    * composition this object's Scaladoc has promised since r13): the PQ
    * prefilter admits (in_id, corpus_id) candidates whose QUANTIZED
    * cosine clears `tauPre`, and only those fetch corpus floats for the
    * exact-cosine confirm at `tau`. Stateless throughout (projection +
    * two stream-static equi-joins), so the same function serves streams
    * and batch frames and stream ≡ batch holds by construction.
    *
    * `tauPre = Double.NaN` (the default) resolves to the threshold the
    * PQ ARTIFACT was calibrated to at build time
    * ([[Artifact.tauPreCalib]] = margin × its measured ADC self-match
    * floor — r15, replacing the fixed x20 constant that was justified
    * once on the gate corpus): a true near-duplicate's quantized cosine
    * sits near the reconstruction floor (≈ the x14v self-cosine), far
    * above the margined threshold, so the prefilter has no false
    * negatives at the exact threshold and the chained match set is
    * IDENTICAL to exact-verifying every probed-cell member
    * (spec-pinned; `tauPre = Double.NegativeInfinity` IS that baseline).
    * Plan shape at 100 TB: the float table is touched only by the
    * confirm join, whose left side is the prefilter's output —
    * O(matches), not O(probed members); everything upstream rides the
    * 8-byte code rows.
    */
  def chainedMatches(stream: DataFrame, art: Artifact,
      corpusEmb: DataFrame, tau: Double = 0.9,
      tauPre: Double = Double.NaN, nprobe: Int = 0): DataFrame = {
    import graft.functions.Expressions.cosineF
    val tp = if (tauPre.isNaN) art.tauPreCalib else tauPre
    adcScored(stream, art, nprobe)
      .filter(col("cosine_adc") >= tp)
      .join(corpusEmb.select(col("vec_id").as("corpus_id"),
        col("embedding").as("c_emb")), Seq("corpus_id"))
      .withColumn("cosine", cosineF(col("in_emb"), col("c_emb")))
      .filter(col("cosine") >= tau)
      .select(col("in_id"), col("corpus_id"), col("cell"),
        col("cosine_adc"), col("cosine"))
  }

  // ---- the gate as an oracle-checked query (x20) --------------------------

  /** x20 gate parameters, recorded per corpus dir when the query runs so
    * the derived oracle replays the exact geometry (the e3/x4 per-dir
    * discipline — a last-used global could embed another corpus's
    * resolution).
    */
  private case class X20(idx: String, root: String, np: Int, m: Int,
      dsub: Int)
  private val x20ByDir =
    graft.ext.CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, X20]())

  val X20Tau = 0.4

  /** The gate's batch twin as a DRIVER-GATED query: the first 10 corpus
    * vectors replayed through the quantized scorer against the full code
    * table at the artifact's calibrated probe depth — every moving part of the streaming
    * gate (probe ranking, cell join, ADC cosine from codebook literals)
    * verified hash-exact against a DuckDB replay over the same artifact
    * parquets. StreamIvfPqSpec pins stream ≡ batch for the same
    * function, so the oracle transitively checks the STREAM's scorer.
    */
  def x20Gate(s: SparkSession, dir: String): DataFrame = {
    val art = artifact(s, dir)
    x20ByDir.put(dir, X20(Similarity.ivfIndexDir(s, dir),
      ProductQuant.pqDir(s, dir),
      math.min(art.nprobeCalib, art.centroids.length), art.m, art.dsub))
    val probes = s.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") < 10).select("vec_id", "embedding")
    matchesAgainst(probes, art, tau = X20Tau)
      .withColumn("cosine_adc_r6",
        floor(col("cosine_adc") * lit(1000000.0) + lit(0.5)) / lit(1000000.0))
      .select("in_id", "corpus_id", "cell", "cosine_adc_r6")
  }

  /** x20 oracle (artifact-derived): the whole gate replays in DuckDB —
    * per-probe centroid ranking (row_number over the same element-
    * ordered d²), cell membership from the IVF artifact, ADC dot and
    * reconstruction norms re-derived from the codebook parquet with the
    * subspace-ordered sums the x19 oracle validated, filter on the raw
    * double, emit r6-rounded. Emitted only when exactly one corpus dir
    * recorded parameters this JVM (always true on the Verify path).
    */
  def x20OracleEntry: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    x20ByDir.values.asScala.toSeq.distinct match {
      case Seq(p) => Seq("x20_ivfpq_gate" ->
        s"""WITH q AS (
              SELECT vec_id AS in_id, embedding AS qe,
                     list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS qn2
              FROM embeddings WHERE vec_id < 10),
            probe AS (
              SELECT in_id, cell FROM (
                SELECT q.in_id, c.cell,
                       row_number() OVER (PARTITION BY q.in_id ORDER BY
                         list_sum(list_transform(list_zip(q.qe, c.centroid),
                           p -> (CAST(p[1] AS DOUBLE) - p[2])
                              * (CAST(p[1] AS DOUBLE) - p[2]))), c.cell)
                         AS rn
                FROM q CROSS JOIN
                     read_parquet('${p.idx}/centroids/*.parquet') c)
              WHERE rn <= ${p.np}),
            members AS (
              SELECT e.vec_id AS corpus_id, CAST(e.cell AS INT) AS cell
              FROM read_parquet('${p.idx}/cells/**/*.parquet',
                                hive_partitioning = true) e),
            books AS (
              SELECT subspace, code, centroid
              FROM read_parquet('${p.root}/codebooks/*.parquet')),
            dj AS (
              SELECT q.in_id, b.subspace, b.code,
                     list_sum(list_transform(range(1, ${p.dsub + 1}),
                       i -> CAST(q.qe[b.subspace * ${p.dsub} + i]
                              AS DOUBLE) * b.centroid[i])) AS dot_j
              FROM books b, q),
            nj AS (
              SELECT subspace, code,
                     list_sum(list_transform(centroid, c -> c * c)) AS n_j
              FROM books),
            codes AS (
              SELECT c.vec_id AS corpus_id, CAST(t.j AS INT) AS subspace,
                     c.codes[CAST(t.j + 1 AS INT)] AS code
              FROM read_parquet('${p.root}/codes/*.parquet') c
              CROSS JOIN range(${p.m}) t(j)),
            cand AS (
              SELECT p.in_id, m.corpus_id, m.cell, k.subspace, k.code
              FROM probe p JOIN members m USING (cell)
                           JOIN codes k USING (corpus_id)),
            adc AS (
              SELECT c.in_id, c.corpus_id, any_value(c.cell) AS cell,
                     list_sum(list(dj.dot_j ORDER BY c.subspace)) AS dot,
                     list_sum(list(nj.n_j ORDER BY c.subspace)) AS xn2
              FROM cand c
              JOIN dj ON dj.in_id = c.in_id AND dj.subspace = c.subspace
                     AND dj.code = c.code
              JOIN nj ON nj.subspace = c.subspace AND nj.code = c.code
              GROUP BY c.in_id, c.corpus_id)
            SELECT a.in_id, a.corpus_id, a.cell,
                   floor((a.dot / (sqrt(q.qn2) * sqrt(a.xn2))) * 1000000
                     + 0.5) / 1000000 AS cosine_adc_r6
            FROM adc a JOIN q USING (in_id)
            WHERE a.dot / (sqrt(q.qn2) * sqrt(a.xn2)) >= $X20Tau""")
      case _ => Seq.empty
    }
  }
}
