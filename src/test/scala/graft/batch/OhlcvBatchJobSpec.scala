package graft.batch

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.FixtureGen
import graft.schema.Schemas
import graft.store.ServingStore

class OhlcvBatchJobSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // --- P1: filename → (symbol, timeframe) regex, table-driven -------------
  // Pattern from batch_processor.py:63 incl. `_update_` suffix,
  // multi-underscore symbols, and reject cases (batch_processor.py:75-78).
  private val regex = Schemas.filenamePattern.r

  private def parse(fn: String): Option[(String, String)] =
    regex.findFirstMatchIn(fn).map(m => (m.group(1), m.group(2)))

  test("filename regex accepts crawler and updater shapes") {
    assert(parse("BTC_USDT_1h.csv").contains(("BTC_USDT", "1h")))
    assert(parse("ETH_USDT_1h.csv").contains(("ETH_USDT", "1h")))
    assert(parse("BTC_USDT_1h_update_20250521_150000.csv")
      .contains(("BTC_USDT", "1h")))
    assert(parse("SOL_USDT_15m.csv").contains(("SOL_USDT", "15m")))
    assert(parse("X_Y_Z_4h.csv").contains(("X_Y_Z", "4h")))
  }

  test("filename regex rejects malformed names") {
    assert(parse("btc_usdt_1h.csv").isEmpty)   // lowercase symbol
    assert(parse("BTC_USDT.csv").isEmpty)      // no timeframe
    assert(parse("BTC_USDT_1h.txt").isEmpty)   // wrong extension
    assert(parse("readme.csv").isEmpty)
  }

  // --- end-to-end batch pipeline: scan → metadata → SMA → upsert ----------

  test("batch pipeline computes SMA-7/30 matching hand-computed frames") {
    val dir = tmpDir("ohlcv-raw")
    val candles = FixtureGen.candles("BTC_USDT", 1717200000000L, 3600000L, 40)
    FixtureGen.writeCsv(dir, FixtureGen.historicalFileName("BTC_USDT", "1h"), candles)

    val features = OhlcvBatchJob.featureFrame(spark, Seq(dir))
      .orderBy("timestamp").collect()
    assert(features.length == 40)

    val closes = candles.map(_.close).toArray
    def sma(i: Int, w: Int): Double = {
      val lo = math.max(0, i - w + 1)
      closes.slice(lo, i + 1).sum / (i - lo + 1)
    }
    features.zipWithIndex.foreach { case (row, i) =>
      assert(math.abs(row.getAs[Double]("sma_7") - sma(i, 7)) < 1e-9,
        s"sma_7 mismatch at row $i (warm-up edge: avg over <7 rows)")
      assert(math.abs(row.getAs[Double]("sma_30") - sma(i, 30)) < 1e-9,
        s"sma_30 mismatch at row $i")
      assert(row.getAs[String]("symbol") == "BTC_USDT")
      assert(row.getAs[String]("timeframe") == "1h")
      val ts = row.getAs[Long]("timestamp")
      assert(row.getAs[String]("doc_id") == s"BTC_USDT_1h_hist_$ts")
      assert(ts == (1717200000000L + i * 3600000L) / 1000) // epoch seconds
    }
  }

  test("metadata extraction drops rows from unparseable filenames") {
    val dir = tmpDir("ohlcv-mixed")
    val good = FixtureGen.candles("ETH_USDT", 1717200000000L, 3600000L, 5)
    val bad = FixtureGen.candles("jnk", 1717200000000L, 3600000L, 5)
    FixtureGen.writeCsv(dir, "ETH_USDT_1h.csv", good)
    FixtureGen.writeCsv(dir, "badname.csv", bad)

    val raw = OhlcvBatchJob.scanRaw(spark, Seq(dir))
    assert(raw.count() == 10)
    assert(OhlcvBatchJob.extractMetadata(raw).count() == 5)
    assert(OhlcvBatchJob.rejectedRows(raw).count() == 5)
  }

  test("upsert is idempotent and updates by doc_id (hourly re-run)") {
    implicit val s = spark
    val rawDir = tmpDir("ohlcv-upsert-raw")
    val storeDir = tmpDir("ohlcv-store")
    val store = new ServingStore(storeDir)

    val base = FixtureGen.candles("BTC_USDT", 1717200000000L, 3600000L, 24)
    FixtureGen.writeCsv(rawDir, "BTC_USDT_1h.csv", base)
    assert(OhlcvBatchJob.run(spark, Seq(rawDir), store) == 24)
    assert(store.table(Schemas.Tables.Historical).count() == 24)

    // hourly update: last 3 candles re-crawled (overlap) + 2 new ones
    val upd = FixtureGen.candles("BTC_USDT", 1717200000000L + 21 * 3600000L,
      3600000L, 5, basePrice = 200.0)
    val updDir = tmpDir("ohlcv-upsert-upd")
    FixtureGen.writeCsv(updDir,
      FixtureGen.updateFileName("BTC_USDT", "1h", 1717290000000L), upd)
    OhlcvBatchJob.run(spark, Seq(updDir), store)

    val after = store.table(Schemas.Tables.Historical)
    assert(after.count() == 26, "3 overlapping keys upserted, 2 appended")
    // overlapping keys carry the updated (basePrice=200) values
    val updated = after.filter(col("timestamp") === (1717200000000L + 21 * 3600000L) / 1000)
      .collect()(0)
    assert(math.abs(updated.getAs[Double]("open") - 200.0) < 10.0)

    // re-running the same update is a no-op on count (idempotent by doc_id)
    OhlcvBatchJob.run(spark, Seq(updDir), store)
    assert(store.table(Schemas.Tables.Historical).count() == 26)
  }

  test("incremental run equals full recompute, touching only new rows") {
    implicit val s = spark
    val t0 = 1717200000000L
    val all = FixtureGen.candles("BTC_USDT", t0, 3600000L, 100)
    val eth = FixtureGen.candles("ETH_USDT", t0, 3600000L, 50)

    // full recompute over everything = ground truth
    val fullDir = tmpDir("inc-full-raw")
    FixtureGen.writeCsv(fullDir, "BTC_USDT_1h.csv", all)
    FixtureGen.writeCsv(fullDir, "ETH_USDT_1h.csv", eth)
    val fullStore = new ServingStore(tmpDir("inc-full-store"))
    OhlcvBatchJob.run(spark, Seq(fullDir), fullStore)

    // incremental: first 60 BTC / 50 ETH candles, then the full files land
    val firstDir = tmpDir("inc-first-raw")
    FixtureGen.writeCsv(firstDir, "BTC_USDT_1h.csv", all.take(60))
    FixtureGen.writeCsv(firstDir, "ETH_USDT_1h.csv", eth)
    val incStore = new ServingStore(tmpDir("inc-store"))
    OhlcvBatchJob.run(spark, Seq(firstDir), incStore)
    val n = OhlcvBatchJob.runIncremental(spark, Seq(fullDir), incStore)
    assert(n == 40, s"only the 40 new BTC candles should be processed, got $n")

    def snapshot(st: ServingStore) = st.table(Schemas.Tables.Historical)
      .collect().map(r => (r.getAs[String]("doc_id"),
        r.getAs[Double]("sma_7"), r.getAs[Double]("sma_30"),
        r.getAs[Double]("close"))).sortBy(_._1)
    val (f, i) = (snapshot(fullStore), snapshot(incStore))
    assert(f.length == 150 && i.length == 150)
    // EXACT equality incl. SMA values: the stored tail supplies the same
    // 29-row lookback the full window pass sees
    assert(f.sameElements(i), "incremental diverged from full recompute")

    // nothing new → no-op
    assert(OhlcvBatchJob.runIncremental(spark, Seq(fullDir), incStore) == 0L)
    // empty store → falls back to a full run
    val freshStore = new ServingStore(tmpDir("inc-fresh-store"))
    assert(OhlcvBatchJob.runIncremental(spark, Seq(fullDir), freshStore) == 150)
  }

  test("incremental detects a backfilled gap candle and recomputes fully") {
    implicit val s = spark
    val t0 = 1717200000000L
    val all = FixtureGen.candles("BTC_USDT", t0, 3600000L, 50)

    // ground truth: full recompute over the complete series
    val fullDir = tmpDir("bf-full-raw")
    FixtureGen.writeCsv(fullDir, "BTC_USDT_1h.csv", all)
    val fullStore = new ServingStore(tmpDir("bf-full-store"))
    OhlcvBatchJob.run(spark, Seq(fullDir), fullStore)

    // first delivery skips candle #30 (a gap BELOW the final frontier);
    // the re-delivered complete file is a backfill, not a forward append
    val gapDir = tmpDir("bf-gap-raw")
    FixtureGen.writeCsv(gapDir, "BTC_USDT_1h.csv",
      all.take(30) ++ all.drop(31))
    val incStore = new ServingStore(tmpDir("bf-inc-store"))
    OhlcvBatchJob.run(spark, Seq(gapDir), incStore)
    assert(incStore.table(Schemas.Tables.Historical).count() == 49)

    // a frontier-filtered pass would silently drop candle #30 and keep
    // the gap-blind SMAs; detection must fall back to the full run
    val n = OhlcvBatchJob.runIncremental(spark, Seq(fullDir), incStore)
    assert(n == 50, s"backfill should trigger a full recompute, got $n")
    def snapshot(st: ServingStore) = st.table(Schemas.Tables.Historical)
      .collect().map(r => (r.getAs[String]("doc_id"),
        r.getAs[Double]("sma_7"), r.getAs[Double]("sma_30"),
        r.getAs[Double]("close"))).sortBy(_._1)
    assert(snapshot(fullStore).sameElements(snapshot(incStore)),
      "backfilled store diverged from full recompute")
  }

  test("incremental detects a corrected candle (same doc_id, new values)") {
    implicit val s = spark
    val t0 = 1717200000000L
    val all = FixtureGen.candles("BTC_USDT", t0, 3600000L, 40)
    val origDir = tmpDir("corr-orig-raw")
    FixtureGen.writeCsv(origDir, "BTC_USDT_1h.csv", all)
    val store = new ServingStore(tmpDir("corr-store"))
    OhlcvBatchJob.run(spark, Seq(origDir), store)

    // upstream corrects candle #20's close price and re-ships the file:
    // same doc_id, different values — a doc_id-presence probe would miss it
    val corrected = all.updated(20, {
      val c = all(20); c.copy(close = c.close + 5.0)
    })
    val corrDir = tmpDir("corr-new-raw")
    FixtureGen.writeCsv(corrDir, "BTC_USDT_1h.csv", corrected)
    val n = OhlcvBatchJob.runIncremental(spark, Seq(corrDir), store)
    assert(n == 40, s"correction should trigger a full recompute, got $n")

    val truthStore = new ServingStore(tmpDir("corr-truth-store"))
    OhlcvBatchJob.run(spark, Seq(corrDir), truthStore)
    def snapshot(st: ServingStore) = st.table(Schemas.Tables.Historical)
      .collect().map(r => (r.getAs[String]("doc_id"),
        r.getAs[Double]("sma_7"), r.getAs[Double]("close"))).sortBy(_._1)
    assert(snapshot(truthStore).sameElements(snapshot(store)),
      "corrected store diverged from full recompute")
  }

  test("run on empty input writes nothing") {
    implicit val s = spark
    val store = new ServingStore(tmpDir("ohlcv-empty-store"))
    val empty = tmpDir("ohlcv-empty")
    Files.createFile(java.nio.file.Paths.get(empty, "NOPE_1h.csv"))
    assert(OhlcvBatchJob.run(spark, Seq(empty), store) == 0L)
    assert(!store.exists(Schemas.Tables.Historical))
  }
}
