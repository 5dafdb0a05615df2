package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 OPTIMIZATION specs: every case pins that a performance
  * rewrite left the operator's output bit-identical to the pre-rewrite
  * construction (the optimization round's contract — speed may move,
  * rows may not).
  */
class R15OptSpec extends SparkSpec {

  test("x19r pooled-artifact path: the pooled invariant's hit set equals " +
      "the union of individual public ivfPqTopK searches (same geometry, " +
      "same rows), and the invariant stays empty on the fixture") {
    val dir = sf("sf0.001")
    val k = 10
    // the invariant itself (pooled artifact fetch) must hold
    assert(ProductQuant.x19rIvfPqRecall(spark, dir, k = k).count() == 0,
      "x19r recall floor violated on the fixture")
    // per-query union via the PUBLIC per-query API (one artifact fetch
    // per call — the pre-r15 shape)
    val per = (0L until 10L).map { q =>
      ProductQuant.ivfPqTopK(spark, dir, q, k)
        .select(lit(q).as("src_id"), col("vec_id").as("nb_id"))
    }.reduce(_ unionAll _)
    // exact side, the x19r construction
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val qs = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("src_id"), col("embedding").as("q_emb"))
    val exactCand = e.select(col("vec_id").as("nb_id"), col("embedding"))
      .join(broadcast(qs), col("nb_id") =!= col("src_id"))
      .select(col("src_id"), col("nb_id"),
        graft.functions.Expressions
          .cosineF(col("embedding"), col("q_emb")).as("cosine"))
    val exact = graft.plans.TopKPerGroup.topK(exactCand, Seq("src_id"),
      "cosine", k, desc = true, tiebreakCols = Seq("nb_id"))
    val hits = exact.select("src_id", "nb_id")
      .join(per, Seq("src_id", "nb_id"), "left_semi").count()
    val total = exact.count()
    assert(total > 0)
    // the pooled invariant said recall >= 0.4; the per-query public API
    // must agree (identical searches -> identical hit count)
    assert(hits.toDouble / total >= 0.4,
      s"per-query recall ${hits.toDouble / total} disagrees with the " +
        "pooled invariant's verdict")
  }

  test("e3r block tiling is exact at any B: forcing the recall row out " +
      "(floor > 1) reads the identical recall value for blocks 4/8/13 — " +
      "the (bi,bj)-keyed two-sided tiling only partitions the pair space") {
    val dir = sf("sf0.001")
    val recalls = Seq(4, 8, 13).map { b =>
      val r = Similarity.knnRecallViolations(spark, dir, k = 3,
        floor = 1.01, blocks = b).collect()
      assert(r.length == 1, s"blocks=$b emitted ${r.length} rows")
      r.head.getDouble(1)
    }
    assert(recalls.distinct.length == 1,
      s"recall varies with block count: $recalls")
  }

  test("mmr1 driver-side greedy selection is bit-identical to the " +
      "unrolled DataFrame loop (the pre-r15 shape, re-created inline)") {
    import org.apache.spark.sql.DataFrame
    for (dirName <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(dirName)
      val (n, k, wRel, wDiv, queryId) = (50, 10, 7, 3, 0L)
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") === queryId)
        .select(col("embedding").as("q_embedding"))
      val cands = e.filter(col("vec_id") =!= queryId)
        .crossJoin(broadcast(q))
        .withColumn("cosraw", graft.functions.Expressions
          .cosineF(col("embedding"), col("q_embedding")))
        .orderBy(desc("cosraw"), col("vec_id"))
        .limit(n)
        .select(col("vec_id").as("doc_id"), col("embedding"),
          floor(col("cosraw") * lit(1000000.0) + lit(0.5)).cast("long")
            .as("rel_micro"))
        .localCheckpoint(true)
      val pairs = cands
        .select(col("doc_id").as("a"), col("embedding").as("ea"))
        .join(cands.select(col("doc_id").as("b"), col("embedding").as("eb")),
          col("a") =!= col("b"))
        .select(col("a"), col("b"),
          floor(graft.functions.Expressions.cosineF(col("ea"), col("eb"))
            * lit(1000000.0) + lit(0.5)).cast("long").as("sim_micro"))
        .localCheckpoint(true)
      import spark.implicits._
      var sel = Seq.empty[(Long, Long, Long)]
        .toDF("rank", "doc_id", "mmr_micro")
      for (r <- 1 to k) {
        val maxSim = pairs
          .join(sel.select(col("doc_id").as("b")), "b")
          .groupBy(col("a").as("doc_id")).agg(max("sim_micro").as("ms"))
        val pick = cands.select("doc_id", "rel_micro")
          .join(sel.select("doc_id"), Seq("doc_id"), "left_anti")
          .join(maxSim, Seq("doc_id"), "left")
          .select(col("doc_id"),
            (lit(wRel.toLong) * col("rel_micro") -
              lit(wDiv.toLong) * coalesce(col("ms"), lit(0L)))
              .as("mmr_micro"))
          .orderBy(col("mmr_micro").desc, col("doc_id"))
          .limit(1)
          .select(lit(r.toLong).as("rank"), col("doc_id"), col("mmr_micro"))
        sel = sel.unionByName(pick).localCheckpoint(true)
      }
      val reference = sel.select("rank", "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val got = Similarity.mmrTopK(spark, dir, queryId, n, k, wRel, wDiv)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == reference, s"$dirName: driver-side MMR diverged")
    }
  }

  test("x15r pooled codebook fetch: per-query public x15PqAdcTopK rows " +
      "equal the POOLED prefetched-artifact path itself (ADVICE r15 — " +
      "the old spot-check compared two identical public calls, pinning " +
      "determinism but not pooled-vs-unpooled equality)") {
    val dir = sf("sf0.001")
    val root = ProductQuant.pqDir(spark, dir)
    val qvecs = ProductQuant.fetchQVecs(spark, dir, 3)
    val books = ProductQuant.fetchBooks(spark, root)
    val codesDf = spark.read.parquet(s"$root/codes")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    (0L until 3L).foreach { q =>
      val a = ProductQuant.x15PqAdcTopK(spark, dir, q, 10)
      val b = ProductQuant.x15PqAdcTopKFrom(spark, q, 10, 100,
        qvecs(q), books, codesDf, e)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
        s"q=$q: pooled path rows diverge from the public per-query API")
    }
    assert(ProductQuant.x15rPqRecall(spark, dir).count() == 0,
      "x15r recall floor violated on the fixture")
  }
}
