package graft.stream

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import graft.schema.Schemas
import graft.store.ServingStore

/** Chart-data retention janitor — parity with the reference's 2-hour ILM
  * delete on `crypto_ohlcv_1m_chartdata-*` (README.md:74-82). The store is
  * partitioned by event DATE, so the sweep drops whole partition
  * directories strictly older than the retention horizon's date — a pure
  * metadata operation. Intra-day trimming (the final <24 h) is left to the
  * readers' time-range filters, exactly as the reference's daily indexes
  * only delete at day granularity.
  */
object Retention {

  private val dayFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  /** Drop chart partitions whose event-date is strictly before the date of
    * `now - keepHours`. Injected clock for testability (SURVEY §7.5.4).
    */
  def sweepChartData(store: ServingStore, now: Instant,
      keepHours: Long = 2): Unit = {
    val keepFromDate = dayFmt.format(now.minusSeconds(keepHours * 3600))
    store.dropPartitionsBefore(Schemas.Tables.ChartData, "dt", keepFromDate)
  }
}
