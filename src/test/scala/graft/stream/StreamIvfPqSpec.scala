package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming IVF-PQ gate: stream ≡ batch (same function, proven
  * through a real MemoryStream run), self-match recall through the
  * quantized scorer, and the no-corpus-float plan promise.
  */
class StreamIvfPqSpec extends SparkSpec {

  private def corpusEmb(dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  test("stream-static IVF-PQ gate: MemoryStream matches equal the batch " +
      "call on the same rows (append-legal, stateless)") {
    val dir = sf("sf0.001")
    val art = StreamIvfPq.artifact(spark, dir)
    val probe = corpusEmb(dir).filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    def key(df: DataFrame): Set[(Long, Long, Double)] =
      df.select(col("in_id"), col("corpus_id"),
        round(col("cosine_adc") * 1e6).cast("double").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val batchFrame = probe.toSeq.toDF("vec_id", "embedding")
    val expected = key(StreamIvfPq.matchesAgainst(batchFrame, art))
    val mem = MemoryStream[(Long, Array[Float])](131)(implicitly,
      spark.sqlContext)
    val got = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = StreamIvfPq.matchesAgainst(
        mem.toDF().toDF("vec_id", "embedding"), art)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivfpq-ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got ++= key(batch): Unit
      }.start()
    try {
      mem.addData(probe.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == expected,
      s"stream/batch diverged: only-stream=${got.toSet -- expected} " +
        s"only-batch=${expected -- got.toSet}")
    assert(expected.nonEmpty, "gate found nothing — vacuous equivalence")
  }

  test("self-match: every corpus vector streamed back in matches ITSELF " +
      "through the quantized scorer at the auto probe depth, with " +
      "cosine_adc above the reconstruction floor") {
    val dir = sf("sf0.001")
    val art = StreamIvfPq.artifact(spark, dir)
    val self = corpusEmb(dir).select("vec_id", "embedding")
    val matches = StreamIvfPq.matchesAgainst(self, art, tau = 0.4)
      .filter(col("in_id") === col("corpus_id"))
    // the row's own top-1 cell is its corpus assignment (same centroid
    // table, same d² argmin) — so the self match must be found even at
    // nprobe=1, and at the auto depth a fortiori
    assert(matches.count() == 500L,
      "a corpus vector failed to match itself through the PQ codes")
    val minCos = matches.agg(min("cosine_adc")).head().getDouble(0)
    // measured reconstruction floor on the fixture: min cos(q, q̂) =
    // 0.533 at M=8/KSub=16 over the near-random 64-dim embeddings (4
    // bits per 8-dim subspace is coarse by design — the gate is a
    // prefilter, StreamSemDedup is the exact confirm). 0.5 pins it —
    // a codebook regression (wrong slice, wrong code indexing) lands
    // near 0 or negative, far below
    assert(minCos >= 0.5, f"self cosine_adc floor $minCos%.3f < 0.5")
  }

  test("chained gate (r14): PQ prefilter → exact confirm matches the " +
      "exact-verify-only baseline EXACTLY (tauPre has no false " +
      "negatives at the exact threshold), and every emitted pair " +
      "really clears both thresholds") {
    val dir = sf("sf0.001")
    val art = StreamIvfPq.artifact(spark, dir)
    val emb = corpusEmb(dir)
    // blend in near-dup probes: verbatim corpus vectors (exact cosine 1
    // to their source) under fresh ids, plus the first 10 raw
    val probes = emb.filter(col("vec_id") < 20)
      .select((col("vec_id") + lit(100000L)).as("vec_id"),
        col("embedding"))
    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select("in_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val chained = StreamIvfPq.chainedMatches(probes, art, emb, tau = 0.9)
    val baseline = StreamIvfPq.chainedMatches(probes, art, emb, tau = 0.9,
      tauPre = Double.NegativeInfinity)
    val cp = pairs(chained)
    val bp = pairs(baseline)
    assert(cp == bp,
      s"prefilter dropped exact matches: missing=${bp -- cp}")
    assert(cp.nonEmpty, "vacuous: no exact matches found")
    // and each emitted row carries both scores above its threshold
    val bad = chained.filter(col("cosine") < 0.9 ||
      col("cosine_adc") < StreamIvfPq.X20Tau).count()
    assert(bad == 0L)
    // the verbatim probes must find their sources
    assert(cp.exists { case (in, c) => in == c + 100000L })
  }

  test("chained gate: MemoryStream run equals the batch call on the " +
      "same rows (stateless — stream ≡ batch for the composition too)") {
    val dir = sf("sf0.001")
    val art = StreamIvfPq.artifact(spark, dir)
    val emb = corpusEmb(dir)
    val probe = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    import spark.implicits._
    def key(df: DataFrame): Set[(Long, Long, Double)] =
      df.select(col("in_id"), col("corpus_id"),
        round(col("cosine") * 1e6).cast("double").as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val batchFrame = probe.toSeq.toDF("vec_id", "embedding")
    val expected = key(StreamIvfPq.chainedMatches(batchFrame, art, emb,
      tau = 0.5))
    val mem = MemoryStream[(Long, Array[Float])](132)(implicitly,
      spark.sqlContext)
    val got = scala.collection.mutable.Set[(Long, Long, Double)]()
    val q = StreamIvfPq.chainedMatches(
        mem.toDF().toDF("vec_id", "embedding"), art, emb, tau = 0.5)
      .writeStream.outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivfpq-ch-ckpt").toString)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        got ++= key(batch): Unit
      }.start()
    try {
      mem.addData(probe.toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == expected,
      s"stream/batch diverged: only-stream=${got.toSet -- expected} " +
        s"only-batch=${expected -- got.toSet}")
    assert(expected.nonEmpty, "vacuous equivalence")
  }

  test("the gate reads NO corpus floats: artifact scans carry codes and " +
      "cell keys only (the x19 plan promise, streamed)") {
    val dir = sf("sf0.001")
    val art = StreamIvfPq.artifact(spark, dir)
    val plan = StreamIvfPq.matchesAgainst(
        corpusEmb(dir).select("vec_id", "embedding").limit(5), art)
      .queryExecution.executedPlan.toString
    val artifactScans = plan.linesIterator.filter(l =>
      l.contains("FileScan") &&
        (l.contains("graft-ivf") || l.contains("graft-pq"))).toSeq
    assert(artifactScans.nonEmpty, "expected artifact FileScans")
    artifactScans.foreach { l =>
      assert(!l.contains("embedding"),
        s"gate scan reads the float column:\n$l")
    }
  }
}
