package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HllSketchSpec extends SparkSpec {

  private def estimate(n: Int, parts: Int, p: Int = 12): Long = {
    import spark.implicits._
    (1 to n).map(_.toLong).toDF("v").repartition(parts)
      .agg(HllSketch.hllDistinct(col("v"), p).as("e"))
      .head().getLong(0)
  }

  test("estimate is partition-invariant (register-max merge is exact)") {
    for (n <- Seq(10, 500, 20000)) {
      val e1 = estimate(n, parts = 1)
      val e32 = estimate(n, parts = 32)
      assert(e1 == e32, s"n=$n: 1-part $e1 != 32-part $e32")
    }
  }

  test("relative error within 5% across both estimator branches") {
    // p=12: linear counting engages below E_raw <= 2.5m = 10240, the raw
    // harmonic estimator above — cover both sides of the switch
    for (n <- Seq(50, 1000, 5000, 20000, 60000)) {
      val e = estimate(n, parts = 8)
      assert(math.abs(e - n) <= math.max(2L, math.ceil(n * 0.05).toLong),
        s"n=$n est=$e outside 5%")
    }
  }

  test("duplicates never move the estimate (register max is idempotent)") {
    import spark.implicits._
    val base = (1 to 3000).map(_.toLong)
    val dup = base ++ base ++ base
    val e1 = base.toDF("v").agg(HllSketch.hllDistinct(col("v")).as("e"))
      .head().getLong(0)
    val e3 = dup.toDF("v").repartition(16)
      .agg(HllSketch.hllDistinct(col("v")).as("e")).head().getLong(0)
    assert(e1 == e3)
  }

  test("nulls are skipped; empty input estimates zero") {
    import spark.implicits._
    val withNulls = Seq[java.lang.Long](1L, 2L, null, 3L, null)
      .toDF("v").agg(HllSketch.hllDistinct(col("v")).as("e"))
      .head().getLong(0)
    assert(withNulls == 3L)
    val empty = Seq.empty[Long].toDF("v")
      .agg(HllSketch.hllDistinct(col("v")).as("e")).head().getLong(0)
    assert(empty == 0L)
  }

  test("grouped sketch matches per-group exact within 5% on a skewed mix") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 40000).map { _ =>
      val g = s"g${rnd.nextInt(3)}"
      (g, rnd.nextInt(if (g == "g0") 40 else 8000).toLong)
    }
    val got = rows.toDF("g", "v").repartition(16)
      .groupBy("g")
      .agg(HllSketch.hllDistinct(col("v")).as("approx"),
        countDistinct(col("v")).as("exact"))
      .collect()
    got.foreach { r =>
      val (a, e) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e) <= math.max(2L, math.ceil(e * 0.05).toLong),
        s"group ${r.getString(0)}: approx $a exact $e")
    }
  }
}
