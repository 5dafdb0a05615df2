package graft.schema

import org.apache.spark.sql.types._

/** Data model of the engine (SURVEY.md §1).
  *
  * Everything the reference processes is a flat, row-oriented table of OHLCV
  * candles keyed by `(symbol, timeframe, timestamp)`. Schemas are fixed and
  * explicitly declared on every read path — never inferred — matching the
  * reference's declared schemas (batch_processor.py:21-29,
  * stream_processor.py:25-35).
  */
object Schemas {

  /** Raw candle CSV schema (batch input), per batch_processor.py:21-29.
    * `timestamp` is epoch MILLISECONDS (candle open time).
    */
  val rawOhlcvCsv: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = true),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = true),
    StructField("volume", DoubleType, nullable = true),
    StructField("datetime_str", StringType, nullable = true),
  ))

  /** Kafka/stream JSON message schema (speed-layer input), per
    * stream_processor.py:25-35: the seven CSV fields plus symbol + timeframe.
    */
  val streamMessage: StructType = StructType(Seq(
    StructField("timestamp", LongType, nullable = true),
    StructField("symbol", StringType, nullable = true),
    StructField("timeframe", StringType, nullable = true),
    StructField("open", DoubleType, nullable = true),
    StructField("high", DoubleType, nullable = true),
    StructField("low", DoubleType, nullable = true),
    StructField("close", DoubleType, nullable = true),
    StructField("volume", DoubleType, nullable = true),
    StructField("datetime_str", StringType, nullable = true),
  ))

  /** Filename → (symbol, timeframe) metadata pattern, per
    * batch_processor.py:63. Group 1 = symbol (underscore-separated
    * upper-alnum words), group 2 = timeframe (digits + letters); optional
    * `_update_<ts>` suffix from the hourly updater
    * (hourly_updater.py:215-216).
    */
  val filenamePattern: String =
    "^([A-Z0-9]+(?:_[A-Z0-9]+)*)_([0-9]+[a-zA-Z]+)(?:_update_.*)?\\.csv$"

  /** Typed row for the core candle pipeline. */
  final case class Candle(
      timestamp: Long,
      symbol: String,
      timeframe: String,
      open: Double,
      high: Double,
      low: Double,
      close: Double,
      volume: Double,
      datetime_str: String,
  )

  /** ServingStore table names (SURVEY.md §1.3): the engine's output
    * contract, mirroring the reference's four Elasticsearch indexes.
    */
  object Tables {
    val Historical = "crypto_historical_data"
    val Latest = "crypto_ohlcv_1m_latest"
    val Stats = "crypto_ohlcv_1m_stats"
    val ChartData = "crypto_ohlcv_1m_chartdata" // day-partitioned
  }
}
