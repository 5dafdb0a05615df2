package graft.ingest

import scala.annotation.tailrec

/** Paginated-fetch contract of the reference crawlers (S9):
  * `historical_crawler.py:44-96` / `hourly_updater.py:108-158` — fetch up
  * to `pageLimit` candles per call, cursor = last timestamp + one step,
  * bounded retries with backoff, stop on empty page or when `untilMs`
  * reached.
  *
  * The HTTP transport is pluggable (`fetch`); production binds an exchange
  * client, tests bind a deterministic in-memory series. This is ingest
  * tooling, not a Spark operator — it runs on the edge, producing the CSV
  * files the batch layer scans.
  */
object Paginator {

  final case class FetchError(attempts: Int, cause: Throwable)
    extends RuntimeException(s"fetch failed after $attempts attempts", cause)

  /** Crawl candles in `[sinceMs, untilMs)` with cursor pagination.
    *
    * @param fetch  (sinceMs, limit) => candles sorted by timestamp — the
    *               ccxt `fetch_ohlcv` shape
    * @param stepMs candle duration (cursor advance = last ts + stepMs,
    *               historical_crawler.py:93)
    * @param pageLimit page size (1000 in the reference,
    *               historical_crawler.py:46)
    * @param maxRetries bounded per-page retries
    *               (historical_crawler.py:84-91)
    * @param onRetrySleep injected backoff (no real sleeping in tests)
    */
  def crawl(
      fetch: (Long, Int) => Seq[FixtureGen.Candle],
      sinceMs: Long,
      untilMs: Long,
      stepMs: Long,
      pageLimit: Int = 1000,
      maxRetries: Int = 3,
      onRetrySleep: Int => Unit = _ => ()): Seq[FixtureGen.Candle] = {

    def fetchWithRetry(cursor: Long): Seq[FixtureGen.Candle] = {
      var attempt = 1
      while (true) {
        try return fetch(cursor, pageLimit)
        catch {
          case e: Throwable =>
            if (attempt >= maxRetries) throw FetchError(maxRetries, e)
            onRetrySleep(attempt)
            attempt += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }

    @tailrec def loop(cursor: Long,
        acc: Vector[FixtureGen.Candle]): Vector[FixtureGen.Candle] = {
      if (cursor >= untilMs) acc
      else {
        val page = fetchWithRetry(cursor).filter(c =>
          c.timestamp >= cursor && c.timestamp < untilMs)
        if (page.isEmpty) acc
        else loop(page.last.timestamp + stepMs, acc ++ page)
      }
    }
    loop(sinceMs, Vector.empty)
  }

  /** Producer contract (S10, report §5.2.1): from the latest 1-2 one-minute
    * candles, pick the LAST and emit one JSON message — the shape the speed
    * layer parses (stream_processor.py:25-35).
    */
  def latestMessage(symbol: String, timeframe: String,
      latest: Seq[FixtureGen.Candle]): Option[String] =
    latest.sortBy(_.timestamp).lastOption
      .map(c => FixtureGen.streamJson(symbol, timeframe, c))
}
