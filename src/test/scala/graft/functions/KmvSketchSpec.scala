package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {

  test("KMV sketch estimates distinct counts within ~10% across merges") {
    // 20k rows, 5k distinct, spread over 8 partitions → partial buffers
    // must merge through serialization across the shuffle
    val df = spark.range(20000).repartition(8)
      .select((col("id") % 5000).cast("string").as("v"))
    val est = df.agg(KmvSketch.kmvDistinct(col("v"), 256).as("d"))
      .collect()(0).getLong(0)
    assert(math.abs(est - 5000) < 500, s"estimate $est not within 10% of 5000")
  }

  test("KMV is exact below k and per-group") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 7)).toDF("g", "v")
    val got = df.groupBy("g").agg(KmvSketch.kmvDistinct(col("v"), 256).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  test("KMV estimate on the events table tracks exact distinct users") {
    val e = spark.read.parquet(sf("sf0.01") + "/events.parquet")
    val exact = e.select("user_id").distinct().count()
    val est = e.agg(KmvSketch.kmvDistinct(col("user_id"), 256))
      .collect()(0).getLong(0)
    assert(est == exact, s"cardinality $exact < k must be exact, got $est")
  }
}
