package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** Cursor-pagination contract tests (S9/S10): page advance, bounded
  * retries, empty-page stop, until-bound clipping — against a
  * deterministic in-memory exchange.
  */
class PaginatorSpec extends AnyFunSuite {

  private val stepMs = 60000L
  private val t0 = 1717200000000L
  private val series = FixtureGen.candles("BTC/USDT", t0, stepMs, 5000)

  private def exchange(sinceMs: Long, limit: Int): Seq[FixtureGen.Candle] =
    series.filter(_.timestamp >= sinceMs).take(limit)

  test("crawl pages with cursor advance and until-bound") {
    var calls = 0
    val got = Paginator.crawl(
      (s, l) => { calls += 1; exchange(s, l) },
      sinceMs = t0, untilMs = t0 + 2500 * stepMs, stepMs = stepMs,
      pageLimit = 1000)
    assert(got.length == 2500)
    assert(got.map(_.timestamp) == series.take(2500).map(_.timestamp))
    assert(calls == 3, "2500 candles at 1000/page = 3 fetches")
  }

  test("crawl stops on empty page (end of history)") {
    val got = Paginator.crawl(exchange, sinceMs = t0,
      untilMs = t0 + 10000 * stepMs, stepMs = stepMs)
    assert(got.length == 5000, "fetched to end of available history")
  }

  test("transient failures are retried with backoff, bounded") {
    var failures = 2
    var sleeps = List.empty[Int]
    val got = Paginator.crawl(
      (s, l) => {
        if (failures > 0) { failures -= 1; throw new RuntimeException("rate limit") }
        exchange(s, l)
      },
      sinceMs = t0, untilMs = t0 + 10 * stepMs, stepMs = stepMs,
      maxRetries = 3, onRetrySleep = a => sleeps ::= a)
    assert(got.length == 10)
    assert(sleeps.sorted == List(1, 2), "two retries with attempt numbers")
  }

  test("persistent failure surfaces FetchError after maxRetries") {
    val e = intercept[Paginator.FetchError] {
      Paginator.crawl((_, _) => throw new RuntimeException("down"),
        sinceMs = t0, untilMs = t0 + stepMs, stepMs = stepMs, maxRetries = 3)
    }
    assert(e.attempts == 3)
  }

  test("file shipping puts and removes via the FileSystem API (S8)") {
    val tmp = java.nio.file.Files.createTempDirectory("ship").toString
    val src = java.nio.file.Files.writeString(
      java.nio.file.Paths.get(tmp, "BTC_USDT_1h.csv"), "timestamp,open\n1,2")
    val destDir = java.nio.file.Files.createTempDirectory("ship-dest").toString
    val dest = FileShip.put(src.toString, destDir)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(destDir, "BTC_USDT_1h.csv")))
    // overwrite like -f
    FileShip.put(src.toString, destDir)
    assert(FileShip.rm(dest))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(destDir, "BTC_USDT_1h.csv")))
  }

  test("producer message is the LAST of the latest candles (report §5.2.1)") {
    val latest = series.slice(10, 12)
    val msg = Paginator.latestMessage("BTC/USDT", "1m", latest.reverse).get
    assert(msg.contains(s""""timestamp":${latest.last.timestamp}"""))
    assert(msg.contains(""""symbol":"BTC/USDT""""))
    assert(msg.contains(""""timeframe":"1m""""))
    assert(Paginator.latestMessage("X", "1m", Nil).isEmpty)
  }
}
