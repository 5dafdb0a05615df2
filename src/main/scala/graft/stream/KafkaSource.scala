package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamReader

/** Kafka streaming source binding (S3) — the speed layer's production
  * entry point, option-compatible with the reference consumer
  * (stream_processor.py:55-61): subscribe to the 1-minute OHLCV topic from
  * the latest offsets and keep running across broker data-loss
  * (`failOnDataLoss=false`).
  *
  * The builder is split from `load()` so the option plumbing is unit-
  * testable in environments without the kafka connector jar or a broker;
  * [[StreamMain]] calls [[load]] in production.
  *
  * 100 TB notes: `maxOffsetsPerTrigger` bounds micro-batch size so a
  * backlogged topic cannot produce an unbounded first batch; partitions of
  * the Kafka topic map 1:1 to input partitions, so parallelism follows the
  * topic's partition count.
  */
object KafkaSource {

  final case class Config(
      bootstrapServers: String = "localhost:9092", // stream_processor.py:13
      topic: String = "crypto_ohlcv_1m",           // stream_processor.py:14
      startingOffsets: String = "latest",          // stream_processor.py:59
      failOnDataLoss: Boolean = false,             // stream_processor.py:60
      maxOffsetsPerTrigger: Option[Long] = None)

  /** The exact option map handed to the kafka source. */
  def options(c: Config): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> c.bootstrapServers,
    "subscribe" -> c.topic,
    "startingOffsets" -> c.startingOffsets,
    "failOnDataLoss" -> c.failOnDataLoss.toString) ++
    c.maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)

  def reader(spark: SparkSession, c: Config): DataStreamReader =
    spark.readStream.format("kafka").options(options(c))

  /** Resolve the source (requires the spark-sql-kafka connector on the
    * classpath). The result has the kafka envelope schema; feed `value`
    * to [[OhlcvStreamJob.parse]].
    */
  def load(spark: SparkSession, c: Config = Config()): DataFrame =
    reader(spark, c).load()
}
