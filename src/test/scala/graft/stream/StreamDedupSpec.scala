package graft.stream

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamDedupSpec extends SparkSpec {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("streaming exact dedup: cross-batch and within-batch duplicates " +
    "dropped inside the watermark horizon, re-admitted beyond it") {
    implicit val s = spark
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)](1)(
      implicitly, spark.sqlContext)
    val admitted = StreamDedup.exactWithinWatermark(
      mem.toDF().toDF("doc_id", "text", "event_ts"), horizon = "10 minutes")
    val out = Files.createTempDirectory("sdedup-out").toString
    val q = admitted.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
        df.select("doc_id").write.mode("append").parquet(s"$out/rows")
      }.start()

    // batch 1: A twice (within-batch dup), B once
    mem.addData((1L, "doc alpha", ts(0)), (2L, "doc alpha", ts(1)),
      (3L, "doc beta", ts(1)))
    q.processAllAvailable()
    // batch 2: A again inside the horizon → dropped; C new → admitted
    mem.addData((4L, "doc alpha", ts(5)), (5L, "doc gamma", ts(6)))
    q.processAllAvailable()
    // batch 3: advance event time far past the horizon, then
    // batch 4: A returns AFTER its state expired → re-admitted
    mem.addData((6L, "doc delta", ts(40)))
    q.processAllAvailable()
    mem.addData((7L, "doc alpha", ts(41)))
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(s"$out/rows")
      .collect().map(_.getLong(0)).toSet
    assert(ids.contains(1L) && !ids.contains(2L),
      s"within-batch duplicate survived: $ids")
    assert(ids.contains(3L) && ids.contains(5L) && ids.contains(6L))
    assert(!ids.contains(4L), s"cross-batch duplicate survived: $ids")
    assert(ids.contains(7L),
      s"duplicate past the watermark horizon was not re-admitted: $ids")
  }
}
