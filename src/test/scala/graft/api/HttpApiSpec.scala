package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.time.Instant

import graft.SparkSpec
import graft.batch.OhlcvBatchJob
import graft.ingest.FixtureGen
import graft.store.ServingStore

/** The six HTTP routes served end-to-end over a fixture store: responses
  * must be byte-identical to the Responses goldens and status codes must
  * mirror the reference's error handling (app.py).
  */
class HttpApiSpec extends SparkSpec {

  private val t0 = 1717200000000L // 2024-06-01T00:00:00Z
  private val now = Instant.ofEpochMilli(t0 + 60L * 24 * 3600000L)

  private lazy val (api, port, httpApi) = {
    implicit val s = spark
    val raw = Files.createTempDirectory("http-raw").toString
    FixtureGen.writeCsv(raw, FixtureGen.historicalFileName("BTC_USDT", "1h"),
      FixtureGen.candles("BTC_USDT", t0, 3600000L, 24 * 60))
    val st = new ServingStore(Files.createTempDirectory("http-store").toString)
    OhlcvBatchJob.run(spark, Seq(raw), st)
    val a = new Api(st)
    // persist a real bundle so the predict route exercises the load path
    val modelsDir = Files.createTempDirectory("http-models").toString
    val closes = a.lastCloses("BTC_USDT", "1h", 300)
    graft.ml.GbtLagModel.save(
      graft.ml.GbtLagModel.trainBundle(spark, closes, windowSize = 5,
        maxIter = 3),
      s"$modelsDir/BTC_USDT_1h")
    val h = new HttpApi(a, Some(modelsDir), () => now)
    val p = h.start()
    (a, p, h)
  }

  private def get(path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val res = client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())
    (res.statusCode(), res.body())
  }

  test("historical_data route serves the Chart.js golden JSON") {
    val (code, body) = get("/api/historical_data/BTC_USDT_1h?range=1m")
    assert(code == 200)
    val expected = Responses.historicalData("BTC_USDT", "1h",
      api.historicalData("BTC_USDT", "1h", "1m", now)
        .orderBy("timestamp").collect().toSeq)
    assert(body == expected, "HTTP body must be byte-identical to the golden")
    assert(body.contains("\"borderColor\":\"rgb(75, 192, 192)\""))
  }

  test("dropdown routes serve the symbols the pages embed") {
    val (code, body) = get("/historical")
    assert(code == 200 && body == "[\"BTC_USDT_1h\"]")
  }

  test("predict route: persisted bundle end-to-end, reference error codes") {
    val (code, body) = get("/api/predict_xgboost/BTC_USDT_1h")
    assert(code == 200, body)
    assert(body.startsWith("""[{"timestamp":"""))
    // reference semantics: non-1h → 400 (app.py:202)
    assert(get("/api/predict_xgboost/BTC_USDT_4h")._1 == 400)
    // unconfigured symbol → 400 (app.py:206)
    assert(get("/api/predict_xgboost/DOGE_USDT_1h")._1 == 400)
    // configured symbol, missing artifact → 404 (app.py:211)
    assert(get("/api/predict_xgboost/ETH_USDT_1h")._1 == 404)
    // malformed → 400 (app.py:199)
    assert(get("/api/predict_xgboost/nounderscore")._1 == 400)
  }

  test("realtime route answers with empty objects when tables are absent") {
    // latest/stats tables don't exist in this fixture (batch-only store):
    // the reference returns {} for both (app.py:96-106)
    val (code, body) = get("/api/realtime_stats/BTC-USDT")
    assert(code == 200)
    assert(body == """{"latest":{},"stats":{}}""")
  }
}
