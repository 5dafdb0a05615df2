package graft.api

import java.nio.file.Files
import java.time.Instant

import graft.SparkSpec
import graft.batch.OhlcvBatchJob
import graft.ingest.FixtureGen
import graft.ml.Forecaster
import graft.store.ServingStore

/** Serving-API golden tests: the six endpoint queries (app.py shapes) over
  * a fixture store, with injected clock (SURVEY.md §5.5, §7.5.4).
  */
class ApiSpec extends SparkSpec {

  private val t0 = 1717200000000L // 2024-06-01T00:00:00Z
  private lazy val (api, store) = {
    implicit val s = spark
    val raw = Files.createTempDirectory("api-raw").toString
    for (sym <- Seq("BTC_USDT", "ETH_USDT")) {
      FixtureGen.writeCsv(raw, FixtureGen.historicalFileName(sym, "1h"),
        FixtureGen.candles(sym, t0, 3600000L, 24 * 60)) // 60 days
      FixtureGen.writeCsv(raw, FixtureGen.historicalFileName(sym, "4h"),
        FixtureGen.candles(sym, t0, 4 * 3600000L, 100))
    }
    val st = new ServingStore(Files.createTempDirectory("api-store").toString)
    OhlcvBatchJob.run(spark, Seq(raw), st)
    (new Api(st), st)
  }
  private val now = Instant.ofEpochMilli(1717200000000L + 60L * 24 * 3600000L)

  test("historicalPairs lists all (symbol, timeframe) combinations (A5)") {
    assert(api.historicalPairs().collect().map(_.getString(0)).toSeq ==
      Seq("BTC_USDT_1h", "BTC_USDT_4h", "ETH_USDT_1h", "ETH_USDT_4h"))
  }

  test("historicalData range filter bounds rows to the window (Q3)") {
    val all = api.historicalData("BTC_USDT", "1h", "all", now)
    assert(all.count() == 24 * 60)
    val oneMonth = api.historicalData("BTC_USDT", "1h", "1m", now)
    assert(oneMonth.count() == 24 * 30, "30d of hourly candles")
    // sorted ascending, series shape has the 4 chart columns
    val series = api.historicalSeries(oneMonth).collect()
    assert(series.head.schema.fieldNames.toSeq ==
      Seq("label", "close", "sma_7", "sma_30"))
    val labels = series.map(_.getString(0))
    assert(labels.toSeq == labels.sorted.toSeq)
  }

  test("lastCloses returns chronological tail of length n (W6)") {
    val closes = api.lastCloses("ETH_USDT", "1h", 24)
    assert(closes.length == 24)
    val all = api.historicalData("ETH_USDT", "1h", "all", now)
      .orderBy("timestamp").collect().map(_.getAs[Double]("close"))
    assert(closes.toSeq == all.takeRight(24).toSeq)
  }

  test("latestStoredTimestamp drives incremental crawling (A6)") {
    assert(api.latestStoredTimestamp("BTC_USDT", "1h")
      .contains((t0 + 1439 * 3600000L) / 1000))
    assert(api.latestStoredTimestamp("NOPE", "1h").isEmpty)
  }

  test("recursive forecast has exact mechanism semantics (M1-M4)") {
    val closes = api.lastCloses("BTC_USDT", "1h", 48)
    val scaler = Forecaster.MinMaxScaler.fit(closes.toSeq)
    val fc = Forecaster.recursiveForecast(Forecaster.PersistenceModel(5),
      scaler, closes, now.toEpochMilli, 3600000L)
    assert(fc.length == 24)
    // persistence model: every step predicts the last close
    assert(fc.forall(f => math.abs(f.predictedPrice - closes.last) < 1e-9))
    assert(fc.map(_.timestampMs) ==
      (1 to 24).map(i => now.toEpochMilli + i * 3600000L))
    // M4: refuses under-length windows
    intercept[IllegalArgumentException] {
      Forecaster.recursiveForecast(Forecaster.PersistenceModel(5), scaler,
        closes.take(3), now.toEpochMilli, 3600000L)
    }
    // M1 round-trip
    val sc = Forecaster.MinMaxScaler.fit(Seq(10.0, 20.0))
    assert(math.abs(sc.inverse(sc.transform(17.3)) - 17.3) < 1e-12)
  }

  test("Q4 predict endpoint: full chain off the store with injected model") {
    // serve with a training-time scaler bundled with the model (no refit)
    val trainScaler = Forecaster.MinMaxScaler.fit(
      api.lastCloses("BTC_USDT", "1h", 48).toSeq)
    val bundle = Forecaster.Bundle(Forecaster.PersistenceModel(5), trainScaler)
    val fc = api.predict("BTC_USDT", "1h", bundle, stepMs = 3600000L)
    assert(fc.length == 24)
    val lastTs = api.latestStoredTimestamp("BTC_USDT", "1h").get * 1000L
    assert(fc.head.timestampMs == lastTs + 3600000L,
      "forecast timestamps continue from the stored frontier")
    val lastClose = api.lastCloses("BTC_USDT", "1h", 1).head
    assert(math.abs(fc.head.predictedPrice - lastClose) < 1e-9)
    intercept[NoSuchElementException] {
      api.predict("NOPE", "1h",
        Forecaster.Bundle(Forecaster.PersistenceModel(5), trainScaler),
        3600000L)
    }
  }

  test("drift model forecast moves in the direction of recent trend (M2-M3)") {
    val rising = Array(1.0, 2.0, 3.0, 4.0, 5.0)
    val scaler = Forecaster.MinMaxScaler.fit(rising.toSeq)
    val fc = Forecaster.recursiveForecast(Forecaster.DriftModel(5), scaler,
      rising, 0L, 1000L, steps = 3)
    assert(fc.map(_.predictedPrice).toSeq == Seq(6.0, 7.0, 8.0))
  }
}
