package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ingest.FixtureGen

class SessionWindowSpec extends SparkSpec {

  private val t0 = 1717200000000L

  private def js(sym: String, minute: Int, close: Double): String =
    FixtureGen.streamJson(sym, "1m", FixtureGen.Candle(
      t0 + minute * 60000L, close, close, close, close, 1.0))

  test("session windows close after the gap and split on silence (T3)") {
    import spark.implicits._
    val mem = MemoryStream[String](31)(implicitly, spark.sqlContext)
    val agg = OhlcvStreamJob.sessionAgg(
      OhlcvStreamJob.withWatermarked(OhlcvStreamJob.parse(mem.toDF())),
      gap = "5 minutes")
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("sw").toString)
      .format("memory").queryName("sessions").start()
    try {
      // burst 1: minutes 0-2 (one session); silence; burst 2: minutes 20-21
      mem.addData(js("BTC/USDT", 0, 1), js("BTC/USDT", 1, 2), js("BTC/USDT", 2, 3),
        js("BTC/USDT", 20, 4), js("BTC/USDT", 21, 5))
      q.processAllAvailable()
      // advance watermark far enough to emit both sessions (append mode)
      mem.addData(js("BTC/USDT", 60, 9))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getLong(3), r.getDouble(4), r.getDouble(5)))
      assert(rows.toSet.contains((3L, 1.0, 3.0)), s"burst-1 session: ${rows.mkString(",")}")
      assert(rows.toSet.contains((2L, 4.0, 5.0)), s"burst-2 session: ${rows.mkString(",")}")
    } finally q.stop()
  }
}
