package graft.ext

import graft.SparkSpec

/** Round-10 session-4: BM25 ranked retrieval. */
class Round10Session4Spec extends SparkSpec {

  test("bm1: BM25 scores match a hand-computed Okapi/Lucene formula on " +
      "a tiny corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bm1").toString
    // dl: 4, 6, 2; "hash" in docs 1 (tf 2) and 2 (tf 1); "join" in doc 2
    // (tf 2); doc 3 matches nothing and must not appear.
    Seq(
      (1L, "hash table hash probe", "s"),
      (2L, "join hash join build side merge", "s"),
      (3L, "unrelated words", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.bm25TopK(spark, dir, Seq("hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val n = 3L; val avgdl = 12.0 / 3
    val k1 = 1.2; val b = 0.75
    def contribMicro(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      val c = idf * (tf * (k1 + 1.0)) /
        (tf + k1 * (1.0 - b + b * dl / avgdl))
      math.floor(c * 1000000 + 0.5).toLong
    }
    val exp1 = contribMicro(2, 2, 4) / 1e6
    val exp2 = (contribMicro(1, 2, 6) + contribMicro(2, 1, 6)) / 1e6
    assert(got.keySet == Set(1L, 2L), got.toString)
    assert(got(1L) == exp1, s"doc1 ${got(1L)} != $exp1")
    assert(got(2L) == exp2, s"doc2 ${got(2L)} != $exp2")
  }

  test("bm1: deterministic across runs, bounded by k, sorted desc") {
    val dir = sf("sf0.001")
    val a = graft.queries.ExtQueries.bm1Bm25Topk(spark, dir)
      .collect().toSeq
    val b = graft.queries.ExtQueries.bm1Bm25Topk(spark, dir)
      .collect().toSeq
    assert(a == b, "two runs disagree")
    assert(a.size == 50, s"expected 50 rows, got ${a.size}")
    val scores = a.map(_.getDouble(1))
    assert(scores == scores.sortBy(-_), "not sorted desc")
  }
}
