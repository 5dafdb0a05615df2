package graft.sources


import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the dtype-adaptive events loader on BOTH physical shapes the
  * corpus has shipped (round 9 lost 37 queries to the unhandled one):
  * the same instants written as INT64 nanos and as native timestamps
  * must load to identical canonical rows, including sub-second floors.
  */
class EventsTableSpec extends SparkSpec {

  private val instantsMicros = Seq(
    1717200000000000L,        // whole second
    1717200001234567L,        // sub-second micros
    1717200059999999L,        // just under the next second
    1717203600000001L)        // just over an hour boundary

  test("nanos-INT64 and timestamp[us] shapes load identically") {
    import spark.implicits._
    val nanosDir =
      java.nio.file.Files.createTempDirectory("graft-ev-ns").toString
    val tsDir =
      java.nio.file.Files.createTempDirectory("graft-ev-us").toString
    instantsMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, us * 1000L) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    instantsMicros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }
      .toDF("event_id", "us")
      // TIMESTAMP_NTZ is what the regenerated driver corpus actually
      // ships (parquet timestamp[us], isAdjustedToUTC=false)
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$tsDir/events.parquet")

    def canon(dir: String) =
      EventsTable.load(spark, dir)
        .select(col("event_id"), unix_timestamp(col("ts")).as("es"),
          col("ts").cast("long").as("us_exact"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val fromNanos = canon(nanosDir)
    val fromTs = canon(tsDir)
    assert(fromNanos == fromTs, s"nanos=$fromNanos ts=$fromTs")
    // and the epoch-second floor is a true floor, not a round
    val es = EventsTable.load(spark, nanosDir)
      .select(col("event_id"),
        EventsTable.epochSeconds(col("ts")).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(es(2L) == 1717200059L, s"floor broke: ${es(2L)}")
    assert(es(3L) == 1717203600L, s"floor broke: ${es(3L)}")
  }
}
