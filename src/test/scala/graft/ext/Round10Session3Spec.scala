package graft.ext

import graft.SparkSpec

/** Round-10 session-3 exchange-volume rewrites: every compact-key /
  * late-materialization path must be output-identical to the literal
  * shape it replaced (the 64-bit collision argument is probabilistic;
  * these pins make the fixture-level equality a regression gate).
  */
class Round10Session3Spec extends SparkSpec {

  private def identical(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit = {
    val nA = a.count()
    assert(b.count() == nA, s"$what: row counts differ")
    assert(a.unionByName(b).distinct().count() == nA,
      s"$what: row sets differ")
  }

  test("d3: compact xxhash64(lang,source,shingle) join keys mine pairs " +
      "identical to the literal 3-column keys") {
    val dir = sf("sf0.01")
    identical(
      Dedup.prefixJaccardPairs(spark, dir, k = 3, jaccardMin = 0.4,
        compactKeys = true),
      Dedup.prefixJaccardPairs(spark, dir, k = 3, jaccardMin = 0.4,
        compactKeys = false),
      "d3 compactKeys")
  }

  test("d7: compact xxhash64(lang,source,fp) join keys mine pairs " +
      "identical to the literal 3-column keys") {
    val dir = sf("sf0.01")
    identical(
      Dedup.winnowPairs(spark, dir, k = 3, w = 8, jaccardMin = 0.4,
        compactKeys = true),
      Dedup.winnowPairs(spark, dir, k = 3, w = 8, jaccardMin = 0.4,
        compactKeys = false),
      "d7 compactKeys")
  }

  test("e3: late-materialized kNN join (IDs through the candidate " +
      "exchange, embeddings re-attached to the deduped pair set) equals " +
      "the embedding-carrying shape") {
    val dir = sf("sf0.01")
    identical(
      graft.tools.E3Probe.knnJoinVariant(spark, dir, "late"),
      graft.tools.E3Probe.knnJoinVariant(spark, dir, "base"),
      "e3 late materialization")
  }
}
