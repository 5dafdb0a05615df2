package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (T-series beyond the reference, which only fans one
  * stream out): enrichment of one live stream with another, with state
  * kept FINITE by the combination of watermarks on both sides and a time
  * bound in the join condition — without both, Spark must buffer a stream
  * forever waiting for arbitrarily-late matches.
  *
  * At scale this is the shape for joining a market-data stream with an
  * alert/order stream: state per executor is (rows within the interval
  * bound + watermark delay), independent of stream lifetime.
  */
object StreamJoins {

  /** Each candle joined to alerts for the same symbol raised within the
    * preceding `windowMinutes`. Inner join: candles without an alert in
    * range are dropped (use the batch as-of join for left-enrichment
    * semantics at rest).
    */
  def candlesWithRecentAlerts(candles: DataFrame, alerts: DataFrame,
      watermark: String = "2 minutes", windowMinutes: Int = 10): DataFrame = {
    val c = candles.withWatermark("event_timestamp", watermark)
    val a = alerts.withWatermark("alert_time", watermark)
    c.join(a,
      col("symbol") === col("alert_symbol") &&
        col("alert_time") >= col("event_timestamp") -
          expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("alert_time") <= col("event_timestamp"))
  }
}
