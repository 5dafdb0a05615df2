package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-state invariants of the COMPOSED curation pipeline — each stage
  * is individually oracle-pinned; this suite checks the composition.
  */
class CuratePipelineSpec extends SparkSpec {

  private lazy val (packed, metrics) =
    CuratePipeline.curate(spark, sf("sf0.001"))

  test("stage counts shrink monotonically and nothing vanishes to zero") {
    val byStage = metrics.map(m => m.stage -> m.docs).toMap
    val order = Seq("raw", "gated", "exact_dedup", "near_dedup",
      "semantic_dedup", "decontaminated")
    val counts = order.map(byStage)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"stage counts grew: ${order.zip(counts)}")
    assert(counts.last > 0, "pipeline filtered everything out")
    assert(counts.head == 500)
  }

  test("final corpus: no exact duplicates, no Hamming<=3 near-dup pair, " +
      "every multi-doc batch under budget, each doc packed once") {
    import graft.functions.Expressions.simhash64
    val docs = packed.select("doc_id").distinct()
    assert(packed.count() == docs.count(), "a doc packed twice")
    // reconstruct the survivors' cleaned text the way the pipeline does:
    // the packed frame carries doc_id; join back and re-check end-state
    val raw = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val clean = raw.join(docs, "doc_id").select(
      col("doc_id"), TextAnalysis.redact(col("text")).as("clean"))
    assert(clean.select("clean").distinct().count() == clean.count(),
      "exact duplicate text survived")
    val sh = clean.select(col("doc_id"), simhash64(col("clean")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val close = for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)
    assert(close.isEmpty, s"near-dup pairs survived: ${close.take(5).toList}")
    val over = packed.groupBy("batch_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .filter(col("t") > graft.ext.BatchPacking.T6Budget && col("n") > 1)
    assert(over.count() == 0, "multi-doc batch over budget")
  }

  test("no surviving within-cluster pair is cosine-similar >= tau " +
      "(the SemDeDup end-state invariant)") {
    import graft.functions.Expressions.cosineF
    val dir = sf("sf0.001")
    val tau = 0.35
    val a = spark.read
      .parquet(s"${Clustering.clusterDir(spark, dir)}/assign")
    val sv = packed.select("doc_id").distinct()
      .join(a.select(col("vec_id").as("doc_id"), col("cell")), "doc_id")
      .join(spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id").as("doc_id"), col("embedding")), "doc_id")
    val l = sv.select(col("cell"), col("doc_id").as("l_id"),
      col("embedding").as("l_emb"))
    val r = sv.select(col("cell"), col("doc_id").as("r_id"),
      col("embedding").as("r_emb"))
    val bad = l.join(r, Seq("cell"))
      .filter(col("l_id") < col("r_id") &&
        cosineF(col("l_emb"), col("r_emb")) >= tau)
      .count()
    assert(bad == 0, s"$bad within-cell pairs >= tau survived")
    // non-vacuity: the stage dropped at least one doc on this fixture
    val byStage = metrics.map(m => m.stage -> m.docs).toMap
    assert(byStage("semantic_dedup") < byStage("near_dedup"),
      "semantic_dedup dropped nothing — invariant is vacuous")
  }

  test("pipeline is deterministic across runs") {
    val again = CuratePipeline.curate(spark, sf("sf0.001"))
    assert(again._2 == metrics, "stage metrics differ")
    val a = packed.collect().map(_.toString).sorted
    val b = again._1.collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq, "packed output differs")
  }
}
