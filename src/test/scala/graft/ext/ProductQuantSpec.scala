package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: code validity, compression-quality margins, and
  * ADC search recall — with the actual empirical values surfaced so the
  * x14v/x15r floors are known to hold with margin, not by luck.
  */
class ProductQuantSpec extends SparkSpec {

  private val d = sf("sf0.001")

  test("x14: every vector gets exactly one code per subspace, " +
      "each in [0, ksub)") {
    val c = ProductQuant.x14PqCodes(spark, d).cache()
    val n = spark.read.parquet(s"$d/embeddings.parquet").count()
    assert(c.count() == n * ProductQuant.M)
    // one row per (vec_id, subspace), subspaces 0..m-1 complete
    assert(c.groupBy("vec_id").agg(count(lit(1)).as("k"),
        countDistinct(col("subspace")).as("ds"))
      .filter(col("k") =!= ProductQuant.M || col("ds") =!= ProductQuant.M)
      .count() == 0L)
    val bad = c.filter(col("code") < 0 || col("code") >= ProductQuant.KSub)
    assert(bad.count() == 0L)
  }

  test("x14 determinism: re-encoding under any repartitioning equals " +
      "the stored code table") {
    val stored = ProductQuant.x14PqCodes(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (n <- Seq(1, 5, 32)) {
      val got = ProductQuant.encodeWithPartitions(spark, d, n).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == stored, s"partitions=$n: encode diverged " +
        s"(extra=${got.diff(stored).take(3)} missing=${stored.diff(got).take(3)})")
    }
  }

  test("x14v: zero violations; the mean-quality contract bites when " +
      "tightened and holds with margin at the shipped floors") {
    assert(ProductQuant.x14vPqReconstruction(spark, d).count() == 0L)
    // non-vacuity: a 0.7 mean floor must bite (measured mean ≈ 0.67)
    assert(ProductQuant
      .x14vPqReconstruction(spark, d, meanFloor = 0.7).count() > 0L,
      "a 0.7 mean floor should bite — if not, the check is vacuous")
    // margin: the shipped 0.6 floor holds even at a stricter 0.65
    assert(ProductQuant
      .x14vPqReconstruction(spark, d, meanFloor = 0.65).count() == 0L)
    // tail: nothing below 0.4 on this fixture at a zero allowance
    assert(ProductQuant
      .x14vPqReconstruction(spark, d, tailFrac = 0.0).count() == 0L)
  }

  test("x15: ADC+re-rank top-k is ordered, excludes the query, and " +
      "x15r recall holds at a floor stricter than the contract") {
    val t = ProductQuant.x15PqAdcTopK(spark, d, queryId = 0L, k = 10)
      .collect()
    assert(t.length == 10)
    assert(!t.exists(_.getLong(0) == 0L), "query id must be excluded")
    val cosines = t.map(_.getDouble(2))
    assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b },
      "descending cosine order")
    // contract floor 0.5; the fixture must clear 0.7
    assert(ProductQuant.x15rPqRecall(spark, d, floor = 0.7).count() == 0L,
      "pooled recall@10 below 0.7 — shortlist too small for the fixture")
  }
}
