package graft.stream

import graft.SparkSpec

/** Pins the epoch-volume partition sizing rule (BASELINE.md r10): the
  * clamp bounds, the restore path, and that the conf actually lands in
  * the session (a streaming query started after the call inherits it as
  * its state partition count).
  */
class StreamTuningSpec extends SparkSpec {

  private def withDefault[A](n: Int)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("sizes to ~rowsPerPartition rows per partition within the clamp") {
    withDefault(32) {
      assert(StreamTuning.sizeShufflePartitionsForEpoch(spark, 2000) == 4)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    }
  }

  test("tiny epochs clamp to the floor of 2, never 0 or 1") {
    withDefault(32) {
      assert(StreamTuning.sizeShufflePartitionsForEpoch(spark, 0) == 2)
      assert(StreamTuning.sizeShufflePartitionsForEpoch(spark, 600) == 2)
    }
  }

  test("production-scale epochs are a no-op at the parallelism ceiling") {
    withDefault(32) {
      assert(
        StreamTuning.sizeShufflePartitionsForEpoch(spark, 10_000_000) == 32)
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "32")
    }
  }
}
