package graft.api

import java.time.Instant

import org.apache.spark.sql.Row

import graft.ml.Forecaster

/** Endpoint response shaping — the exact JSON the reference serves, so
  * golden outputs diff byte-for-byte against a dashboard's expectations:
  *
  *   - realtime_stats  → {"latest": {...}, "stats": {...}} (app.py:107)
  *   - chart_data_1m   → [[ts_ms, close], ...] (app.py:131)
  *   - historical_data → Chart.js {labels, datasets} with the reference's
  *     verbatim dataset labels/colors/flags (app.py:184-189); labels are
  *     UTC '%Y-%m-%d %H:%M:%S'
  *   - predict         → [{"timestamp": ms, "predicted_price": p}, ...]
  *     (app.py:240)
  *
  * A minimal deterministic JSON writer (sorted-insertion order preserved,
  * doubles via shortest repr) keeps goldens stable without a JSON
  * dependency.
  */
object Responses {

  // ---- tiny deterministic JSON writer ------------------------------------

  sealed trait JVal { def render: String }
  final case class JStr(v: String) extends JVal {
    def render: String = "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }
  final case class JNum(v: Double) extends JVal {
    def render: String =
      if (v.isWhole && math.abs(v) < 1e15) v.toLong.toString else v.toString
  }
  final case class JLong(v: Long) extends JVal { def render: String = v.toString }
  final case class JBool(v: Boolean) extends JVal { def render: String = v.toString }
  case object JNull extends JVal { def render: String = "null" }
  final case class JArr(vs: Seq[JVal]) extends JVal {
    def render: String = vs.map(_.render).mkString("[", ",", "]")
  }
  final case class JObj(fields: Seq[(String, JVal)]) extends JVal {
    def render: String =
      fields.map { case (k, v) => JStr(k).render + ":" + v.render }
        .mkString("{", ",", "}")
  }

  private def iso(tsSeconds: Long): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(Instant.ofEpochSecond(tsSeconds))

  // ---- endpoint shapes ----------------------------------------------------

  /** {"latest": {...}, "stats": {...}} — empty objects when absent, exactly
    * like the reference's NotFound handling (app.py:96-106).
    */
  def realtimeStats(latest: Option[Row], stats: Option[Row]): String = {
    def rowToObj(r: Row, fields: Seq[String]): JObj = JObj(fields.map { f =>
      val v = r.get(r.fieldIndex(f)) match {
        case null => JNull
        case d: Double => JNum(d)
        case l: Long => JLong(l)
        case ts: java.sql.Timestamp =>
          JStr(iso(ts.getTime / 1000))
        case s => JStr(s.toString)
      }
      f -> v
    })
    JObj(Seq(
      "latest" -> latest.map(rowToObj(_, Seq("symbol", "latest_event_timestamp",
        "current_price", "current_volume", "open", "high", "low",
        "timestamp_ms"))).getOrElse(JObj(Nil)),
      "stats" -> stats.map(rowToObj(_, Seq("symbol", "window_start",
        "window_end", "avg_price", "min_price", "max_price",
        "event_count_in_window"))).getOrElse(JObj(Nil)),
    )).render
  }

  /** [[ts_ms, close], ...] (app.py:124-131). */
  def chartData1m(rows: Seq[Row]): String =
    JArr(rows.map(r => JArr(Seq(
      JLong(r.getAs[Long]("timestamp_ms")),
      JNum(r.getAs[Double]("close")))))).render

  /** Chart.js {labels, datasets} with the reference's verbatim dataset
    * attributes (app.py:184-188).
    */
  def historicalData(symbol: String, timeframe: String, rows: Seq[Row]): String = {
    val labels = rows.map(r => JStr(iso(r.getAs[Long]("timestamp"))))
    def series(col: String) = JArr(rows.map { r =>
      if (r.isNullAt(r.fieldIndex(col))) JNull else JNum(r.getAs[Double](col))
    })
    def dataset(label: String, col: String, color: String, hidden: Boolean) =
      JObj(Seq(
        "label" -> JStr(label),
        "data" -> series(col),
        "borderColor" -> JStr(color),
        "tension" -> JNum(0.1),
        "fill" -> JBool(false),
      ) ++ (if (hidden) Seq("hidden" -> JBool(true)) else Nil))
    JObj(Seq(
      "labels" -> JArr(labels),
      "datasets" -> JArr(Seq(
        dataset(s"$symbol Close ($timeframe)", "close", "rgb(75, 192, 192)",
          hidden = false),
        dataset(s"$symbol SMA 7 ($timeframe)", "sma_7", "rgb(255, 159, 64)",
          hidden = true),
        dataset(s"$symbol SMA 30 ($timeframe)", "sma_30", "rgb(153, 102, 255)",
          hidden = true),
      )),
    )).render
  }

  /** [{"timestamp": ms, "predicted_price": p}, ...] (app.py:238-240). */
  def predictions(fc: Seq[Forecaster.Forecast]): String =
    JArr(fc.map(f => JObj(Seq(
      "timestamp" -> JLong(f.timestampMs),
      "predicted_price" -> JNum(f.predictedPrice))))).render
}
