package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ExtQueries

class CountMinSpec extends SparkSpec {

  private def estimates(data: Seq[String], parts: Int,
      depth: Int = 4, width: Int = 2048): Map[String, Long] = {
    import spark.implicits._
    val df = data.toDF("v").repartition(parts)
    val sk = df.agg(CountMin.sketch(col("v"), depth, width).as("sk"))
    df.distinct().crossJoin(broadcast(sk))
      .select(col("v"),
        CountMin.cmsEstimate(col("sk.cells"), col("v"), depth, width)
          .as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("small vocabulary: estimates are exact and partition-invariant") {
    val data = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++ Seq("delta")
    val e1 = estimates(data, parts = 1)
    val e16 = estimates(data, parts = 16)
    // merge is cell-wise addition → identical sketch however partitioned
    assert(e1 == e16, s"merge not partition-invariant: $e1 vs $e16")
    assert(e1 == Map("alpha" -> 40L, "beta" -> 25L, "gamma" -> 10L,
      "delta" -> 1L))
  }

  test("one-sided guarantee holds and the eps tail is near the theory " +
      "bound on a large skewed vocabulary") {
    val rnd = new scala.util.Random(7)
    val data = (1 to 30000).map(_ => s"tok-${rnd.nextInt(5000)}")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = estimates(data, parts = 8, depth = 4, width = 1024)
    // estimate >= truth on EVERY item — deterministic, no slack
    est.foreach { case (v, e) =>
      assert(e >= truth(v), s"$v undercounted: $e < ${truth(v)}")
    }
    // P[over > (e/width)*N] <= exp(-depth) per item; allow 2x expectation
    val epsN = math.ceil(math.E / 1024 * data.size).toLong
    val tail = est.count { case (v, e) => e - truth(v) > epsN }
    val allowed = math.ceil(2 * math.exp(-4.0) * est.size).toInt
    assert(tail <= allowed, s"eps-tail violations $tail > $allowed")
  }

  test("x16v gate query: ge_true is 1 on every distinct fixture token") {
    val bad = ExtQueries.x16vCmsLowerBound(spark, sf("sf0.001"))
      .filter(col("ge_true") =!= 1).count()
    assert(bad == 0L)
  }

  test("CMS aggregates an unbounded stream with fixed state: cumulative " +
      "sketch across micro-batches equals the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val mem = MemoryStream[String](1)(implicitly, spark.sqlContext)
    val q = mem.toDF().toDF("v")
      .agg(CountMin.sketch(col("v"), 4, 256).as("sk"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_stream").start()
    mem.addData(Seq.fill(30)("hot") ++ Seq.fill(5)("warm"): _*)
    q.processAllAvailable()
    mem.addData(Seq.fill(20)("hot") ++ Seq("cold"): _*)
    q.processAllAvailable()
    val sk = spark.sql("SELECT sk.cells FROM cms_stream").collect()(0)
      .getSeq[Long](0)
    q.stop()
    val cells = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sk.toArray)
    def est(v: String) = CountMin.estimate(cells,
      org.apache.spark.unsafe.types.UTF8String.fromString(v), 4, 256)
    assert(est("hot") == 50L && est("warm") == 5L && est("cold") == 1L,
      s"${est("hot")} ${est("warm")} ${est("cold")}")
  }
}
