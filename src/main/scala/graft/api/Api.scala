package graft.api

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.schema.Schemas
import graft.store.ServingStore

/** Serving layer: the reference's six Flask endpoints (app.py / SURVEY.md
  * §2.5) reproduced as pure DataFrame query functions over the
  * ServingStore. ES-DSL semantics → Spark SQL:
  *
  *   term query        → equality filter
  *   bool/must         → conjunctive filter
  *   range             → between filter
  *   sort + size       → orderBy + limit (TakeOrderedAndProject — top-k
  *                        without a global sort, safe at any scale)
  *   terms agg         → distinct/groupBy + limit
  *   get by _id        → key-equality filter
  *
  * Time-dependent queries take `now` explicitly (injected Clock —
  * SURVEY.md §7.5.4) so golden tests are deterministic.
  */
final class Api(val store: ServingStore) {

  /** `/api/realtime_stats/<sym>` part 1: get-by-id on the latest table
    * (app.py:97 / W8). Key = symbol with '/' (e.g. "BTC/USDT").
    */
  def latestCandle(symbol: String): DataFrame =
    store.table(Schemas.Tables.Latest).filter(col("doc_id") === symbol)

  /** `/api/realtime_stats/<sym>` part 2: most recent stats window —
    * term symbol + sort window_end desc + size 1 (app.py:102-104 / W5).
    */
  def latestStats(symbol: String): DataFrame =
    store.tableCurrent(Schemas.Tables.Stats, "doc_id") // log or merged sink
      .filter(col("symbol") === symbol)
      .orderBy(desc("window_end"))
      .limit(1)

  /** `/api/chart_data_1m/<sym>`: term symbol AND range @timestamp within
    * [now-35min, now], sort asc, size 200 (app.py:109-131 / Q2, W7). The
    * reference unions daily indexes `chartdata-*`; here that is simply the
    * day-partitioned table — partition pruning covers the date range.
    */
  def chartData1m(symbol: String, now: Instant, windowMinutes: Long = 35,
      size: Int = 200): DataFrame = {
    val from = java.sql.Timestamp.from(now.minusSeconds(windowMinutes * 60))
    val to = java.sql.Timestamp.from(now)
    store.tableCurrent(Schemas.Tables.ChartData, "doc_id") // log or merged sink
      .filter(col("symbol") === symbol &&
        col("@timestamp").between(lit(from), lit(to)))
      .orderBy(asc("@timestamp"))
      .limit(size)
  }

  /** `/api/historical_data/<sym_tf>?range=`: term symbol AND term timeframe
    * AND optional lower time bound, sort asc, size 10000
    * (app.py:153-189 / Q3). Range map per app.py:161-165.
    */
  def historicalData(symbol: String, timeframe: String, range: String,
      now: Instant, size: Int = 10000): DataFrame = {
    val days: Option[Int] = range match {
      case "1m" => Some(30)
      case "3m" => Some(90)
      case "6m" => Some(180)
      case "1y" => Some(365)
      case _ => None // "all"
    }
    val base = store.table(Schemas.Tables.Historical)
      .filter(col("symbol") === symbol && col("timeframe") === timeframe)
    val bounded = days.fold(base) { d =>
      base.filter(col("timestamp") >= lit(now.minusSeconds(d.toLong * 86400).getEpochSecond))
    }
    bounded.orderBy(asc("timestamp")).limit(size)
  }

  /** Historical endpoint result shaping (app.py:171-188): UTC label +
    * close/sma_7/sma_30 series for Chart.js.
    */
  def historicalSeries(df: DataFrame): DataFrame =
    df.select(
      date_format((col("timestamp")).cast("timestamp"), "yyyy-MM-dd HH:mm:ss").as("label"),
      col("close"), col("sma_7"), col("sma_30"))

  /** `/` dropdown: distinct symbols, sorted, cap 500 (app.py:57 / A4). */
  def realtimeSymbols(limit: Int = 500): DataFrame =
    store.table(Schemas.Tables.Latest)
      .select("symbol").distinct().orderBy("symbol").limit(limit)

  /** `/historical` dropdown: distinct (symbol, timeframe) pairs formatted
    * `{symbol}_{timeframe}`, cap 1000 (app.py:72 / A5).
    */
  def historicalPairs(limit: Int = 1000): DataFrame =
    store.table(Schemas.Tables.Historical)
      .groupBy("symbol", "timeframe").count()
      .select(concat(col("symbol"), lit("_"), col("timeframe")).as("pair"))
      .orderBy("pair").limit(limit)

  /** Model input for `/api/predict_xgboost/<sym_tf>`: last `n` closes,
    * newest-first then reversed to chronological on the driver
    * (app.py:219-228 / W6).
    */
  def lastCloses(symbol: String, timeframe: String, n: Int): Array[Double] =
    store.table(Schemas.Tables.Historical)
      .filter(col("symbol") === symbol && col("timeframe") === timeframe)
      .orderBy(desc("timestamp"))
      .limit(n)
      .select("close")
      .collect()
      .map((r: Row) => r.getDouble(0))
      .reverse

  /** `/api/predict_xgboost/<sym_tf>` (Q4, app.py:195-244): last-w closes →
    * MinMax scale with the TRAINING-time scaler → recursive multi-step
    * forecast → (timestamp, price) series. The model+scaler arrive as the
    * persisted pair ([[graft.ml.Forecaster.Bundle]], app.py:211-218) —
    * refitting a scaler on the serve tail would skew features vs training.
    * Window size per symbol mirrors app.py:203-206.
    */
  def predict(symbol: String, timeframe: String,
      bundle: graft.ml.Forecaster.Bundle, stepMs: Long,
      steps: Int = 24): Seq[graft.ml.Forecaster.Forecast] = {
    val closes = lastCloses(symbol, timeframe,
      math.max(bundle.model.windowSize, 48))
    if (closes.isEmpty)
      throw new NoSuchElementException(s"no history for $symbol/$timeframe")
    val lastTs = latestStoredTimestamp(symbol, timeframe)
      .getOrElse(throw new NoSuchElementException(s"$symbol/$timeframe"))
    graft.ml.Forecaster.recursiveForecast(bundle.model, bundle.scaler, closes,
      lastKnownMs = lastTs * 1000L, stepMs = stepMs, steps = steps)
  }

  /** Latest stored timestamp for a (symbol, timeframe) — drives incremental
    * crawling (hourly_updater.py:70-97 / A6).
    */
  def latestStoredTimestamp(symbol: String, timeframe: String): Option[Long] = {
    val r = store.table(Schemas.Tables.Historical)
      .filter(col("symbol") === symbol && col("timeframe") === timeframe)
      .agg(max("timestamp").as("max_ts"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }
}
