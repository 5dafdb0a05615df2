package graft.api

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.ingest.FixtureGen
import graft.schema.Schemas
import graft.store.ServingStore
import graft.stream.{OhlcvStreamJob, Retention}

/** Realtime endpoints (Q1/Q2) over tables produced by the actual streaming
  * fan-out, plus the 2 h chart retention sweep — the full speed-layer →
  * serving-layer path.
  */
class RealtimeApiSpec extends SparkSpec {

  private val t0 = 1717200000000L // 2024-06-01T00:00:00Z

  private def js(sym: String, dayOffset: Int, minute: Int, close: Double) =
    FixtureGen.streamJson(sym, "1m", FixtureGen.Candle(
      t0 + dayOffset * 86400000L + minute * 60000L,
      close - 1, close + 1, close - 2, close, 5.0))

  private lazy val store: ServingStore = {
    implicit val s = spark
    import spark.implicits._
    val st = new ServingStore(Files.createTempDirectory("rt-store").toString)
    val mem = MemoryStream[String](21)(implicitly, spark.sqlContext)
    val qs = OhlcvStreamJob.start(OhlcvStreamJob.parse(mem.toDF()), st,
      Files.createTempDirectory("rt-ckpt").toString)
    try {
      mem.addData(
        js("BTC/USDT", 0, 10, 100.0), js("BTC/USDT", 0, 11, 101.0),
        js("ETH/USDT", 0, 10, 50.0),
        js("BTC/USDT", 1, 0, 102.0), // next day
        js("BTC/USDT", 2, 0, 103.0), js("BTC/USDT", 2, 30, 104.0))
      qs.foreach(_.processAllAvailable())
    } finally qs.foreach(_.stop())
    st
  }

  test("Q1 realtime_stats: get-by-id latest + top-1 stats window") {
    val latest = new Api(store).latestCandle("BTC/USDT").collect()
    assert(latest.length == 1)
    assert(latest(0).getAs[Double]("current_price") == 104.0)
    assert(latest(0).getAs[Long]("timestamp_ms") ==
      t0 + 2 * 86400000L + 30 * 60000L)

    val stats = new Api(store).latestStats("BTC/USDT").collect()
    assert(stats.length == 1)
    // the newest stats window must contain the day-2 minute-30 candle
    assert(stats(0).getAs[Double]("max_price") == 104.0)
  }

  test("Q2 chart_data_1m: range-bounded ascending scan over partitions") {
    val api = new Api(store)
    val now = Instant.ofEpochMilli(t0 + 2 * 86400000L + 31 * 60000L)
    val rows = api.chartData1m("BTC/USDT", now, windowMinutes = 35).collect()
    assert(rows.map(_.getAs[Long]("timestamp_ms")).toSeq ==
      Seq(t0 + 2 * 86400000L, t0 + 2 * 86400000L + 30 * 60000L),
      "only the last 35 minutes, ascending")
  }

  test("2h retention sweep drops only expired event-date partitions") {
    implicit val s = spark
    // before sweep: 3 day-partitions
    assert(store.table(Schemas.Tables.ChartData).select("dt")
      .distinct().count() == 3)
    Retention.sweepChartData(store,
      Instant.ofEpochMilli(t0 + 2 * 86400000L + 3600000L), keepHours = 2)
    val dts = store.table(Schemas.Tables.ChartData).select("dt").distinct()
      .collect().map(r => String.valueOf(r.get(0))).sorted
    // horizon = 2024-06-03T01:00 - 2h = 06-02T23:00 → date 06-02: day
    // granularity keeps 06-02 and 06-03, drops only 06-01 (the reference's
    // daily-index ILM deletes whole days the same way)
    assert(dts.toSeq == Seq("2024-06-02", "2024-06-03"),
      s"only days strictly before the horizon date drop, got ${dts.mkString(",")}")
  }
}
