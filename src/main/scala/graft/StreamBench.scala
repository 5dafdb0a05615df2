package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ingest.FixtureGen
import graft.store.ServingStore
import graft.stream.OhlcvStreamJob

/** Speed-layer throughput bench: N producer-shaped candles through the
  * full three-query fan-out (latest + windowed stats + partitioned chart)
  * into the serving store. Prints one JSON line:
  * {"metric":"stream_candles_per_sec","value":...,"candles":N,...}
  *
  * Usage: sbt "runMain graft.StreamBench [nCandles] [nSymbols]"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val nSymbols = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true") // batch merges in foreachBatch benefit; streaming plans ignore AQE
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val s: SparkSession = spark
    import spark.implicits._

    val t0 = 1717200000000L
    val symbols = (0 until nSymbols).map(i => s"SYM$i/USDT")
    val candlesPerSymbol = n / nSymbols
    val messages = symbols.flatMap { sym =>
      FixtureGen.candles(sym, t0, 60000L, candlesPerSymbol)
        .map(c => FixtureGen.streamJson(sym, "1m", c))
    }

    val store = new ServingStore(Files.createTempDirectory("sb-store").toString)
    val mem = MemoryStream[String](1)(implicitly, spark.sqlContext)
    val appendMode = args.drop(3).headOption.contains("append")
    val qs = OhlcvStreamJob.start(OhlcvStreamJob.parse(mem.toDF()), store,
      Files.createTempDirectory("sb-ckpt").toString,
      chartAppendLog = appendMode, statsVersionedLog = appendMode)
    // split into micro-batches of ~2000 to exercise incremental state
    val batchSize = args.drop(2).headOption.map(_.toInt).getOrElse(2000)
    val batches = messages.grouped(batchSize).toSeq
    val start = System.nanoTime()
    try {
      batches.foreach { b =>
        mem.addData(b: _*)
        qs.foreach(_.processAllAvailable())
      }
    } finally qs.foreach(_.stop())
    val sec = (System.nanoTime() - start) / 1e9
    val total = messages.size
    val latest = store.table(graft.schema.Schemas.Tables.Latest).count()
    if (appendMode) store.compact(graft.schema.Schemas.Tables.ChartData, "doc_id", Some("dt"))
    val chart = store.table(graft.schema.Schemas.Tables.ChartData).count()
    val stats = if (appendMode)
      store.tableLatestByEpoch(graft.schema.Schemas.Tables.Stats, "doc_id").count()
    else store.table(graft.schema.Schemas.Tables.Stats).count()
    println(s"""{"metric":"stream_candles_per_sec","value":${(total / sec).round},""" +
      s""""candles":$total,"batches":${batches.size},"chart_sink":"${if (appendMode) "append" else "merge"}","seconds":${f"$sec%.1f"},""" +
      s""""latest_rows":$latest,"chart_rows":$chart,"stats_windows":$stats}""")
    spark.stop()
  }
}
