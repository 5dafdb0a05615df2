package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Dtype-adaptive reader for the driver-generated `events` table.
  *
  * The corpus has shipped `ts` in two physical forms across driver
  * regenerations:
  *
  *   - parquet `timestamp[ns]`, which Spark 4 cannot read natively
  *     (SPARK-40819) — with `spark.sql.legacy.parquet.nanosAsLong=true`
  *     it surfaces as an INT64 nanos column;
  *   - standard `timestamp[us]` (isAdjustedToUTC=false), which Spark
  *     infers as TIMESTAMP_NTZ.
  *
  * Hard-coding either shape breaks when the other ships (round 9 lost 37
  * queries to exactly that), so this loader inspects the actual column
  * dtype and canonicalizes to TimestampType (µs, instant semantics).
  * Every session in this repo runs with `spark.sql.session.timeZone=UTC`,
  * so the NTZ→TIMESTAMP cast maps wall-clock (which IS UTC in this
  * corpus) to the identical instant — the same value DuckDB's
  * `epoch_ms(ts)` sees on the oracle side.
  */
object EventsTable {

  def load(s: SparkSession, dir: String): DataFrame = {
    // harmless when ts is already a timestamp; required for the nanos form
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // INT64 nanos → µs timestamp; integral division is exact (double
        // division would wobble at the epoch-second boundary)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ: UTC session tz makes the cast instant-exact
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Floored epoch seconds — the one ts representation Spark and DuckDB
    * agree on bit-exactly (`unix_timestamp` = floorDiv(µs, 1e6); DuckDB
    * `epoch_ms(ts)//1000` floors the same way for the corpus's positive
    * timestamps).
    */
  def epochSeconds(c: Column): Column = unix_timestamp(c)
}
