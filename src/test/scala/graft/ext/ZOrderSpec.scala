package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zkey interleaves bits (known values) and is monotone-safe in range") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 255L), (3L, 5L))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zkey(col("x"), col("y")))
    val z = df.orderBy("x", "y").collect().map(_.getLong(2))
    // x=0,y=0 -> 0; x=0,y=1 -> 1; x=1,y=0 -> 2; x=3(011),y=5(101) ->
    // interleave x@odd y@even: bits y0=1,x0=1,y1=0,x1=1,y2=1,x2=0 ->
    // 0b011011 = 27; x=255,y=255 -> 0xFFFF.
    assert(z.toSeq == Seq(0L, 1L, 2L, 27L, 65535L))
    val all = ZOrder.eventsZKeyed(spark, sf("sf0.001"))
    val bounds = all.agg(min("zkey"), max("zkey")).head()
    assert(bounds.getLong(0) >= 0L && bounds.getLong(1) <= 65535L)
    // native bit-twiddle expression == the per-bit shift/mask spec
    val naive = (0 until 8).map { i =>
      shiftleft(shiftrightunsigned(col("user_bucket"), i)
        .bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftrightunsigned(col("value_bucket"), i)
          .bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    assert(all.filter(col("zkey") =!= naive).count() == 0L)
  }

  test("zkey fails loudly on out-of-range inputs (no silent masking)") {
    import spark.implicits._
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      s"${c.getClass.getName}: ${c.getMessage}"
    }
    // codegen path (whole-stage over a DataFrame)
    for ((x, y) <- Seq((256L, 0L), (0L, 256L), (-1L, 5L))) {
      val e = intercept[Throwable] {
        Seq((x, y)).toDF("x", "y")
          .select(ZOrder.zkey(col("x"), col("y"))).collect()
      }
      assert(rootMsg(e).contains("[0, 256)"), s"($x,$y): ${rootMsg(e)}")
    }
    // interpreted path (direct eval, no codegen)
    import org.apache.spark.sql.catalyst.expressions.Literal
    val ex = intercept[IllegalArgumentException] {
      graft.functions.ZOrderKey8(Literal(999L), Literal(1L))
        .eval(null)
    }
    assert(ex.getMessage.contains("[0, 256)"))
    // in-range still fine after the guard
    assert(Seq((255L, 255L)).toDF("x", "y")
      .select(ZOrder.zkey(col("x"), col("y"))).head().getLong(0) == 65535L)
  }

  test("z-ordered layout prunes files on BOTH dimensions; single-key layout does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val e = ZOrder.eventsZKeyed(spark, sf("sf0.01"))
    // 64 files ≈ 156 rows each: tile granularity matters — at 16 files a
    // 16-bucket y-slice straddles whole tile rows and prunes little.
    // At scale file count is plentiful, so this is the honest setting.
    val nFiles = 64
    ZOrder.writeZOrdered(e, col("user_bucket"), col("value_bucket"),
      s"$dir/z", nFiles)
    // Baseline: same data clustered by user_bucket only.
    e.repartitionByRange(nFiles, col("user_bucket"))
      .sortWithinPartitions("user_bucket")
      .write.mode("overwrite").parquet(s"$dir/single")

    def hitFraction(path: String, xLo: Long, xHi: Long, yLo: Long,
        yHi: Long): Double = {
      val env = ZOrder.fileEnvelopes(spark, path, "user_bucket",
        "value_bucket").collect()
      val hits = env.count(r =>
        r.getLong(1) <= xHi && r.getLong(2) >= xLo &&
          r.getLong(3) <= yHi && r.getLong(4) >= yLo)
      hits.toDouble / env.length
    }

    // A value-range-only predicate (all users) over a mid-distribution
    // slice (sqrt buckets 40-55 ~ values 25-47, ~20% of rows): the
    // single-key layout cannot prune at all; z-order must skip files.
    val zY = hitFraction(s"$dir/z", 0L, 255L, 40L, 55L)
    val sY = hitFraction(s"$dir/single", 0L, 255L, 40L, 55L)
    assert(sY == 1.0, s"user-clustered layout unexpectedly pruned: $sY")
    assert(zY <= 0.6, s"z-order layout read $zY of files for a y-slice")

    // A small 2-d rectangle: both dimensions prune multiplicatively.
    val zRect = hitFraction(s"$dir/z", 0L, 31L, 40L, 55L)
    assert(zRect <= 0.25, s"z-order rectangle hit fraction $zRect")
  }
}
