package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamNearDupSpec extends SparkSpec {

  test("streaming near-dup gate: arrivals match the static corpus, " +
    "stateless across batches") {
    implicit val s = spark
    import spark.implicits._
    val dir = sf("sf0.001")
    // two docs lifted verbatim from the corpus (must match their source
    // at hamming 0), one alien doc (must have no hamming-0 match)
    val corpusTexts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val alien = (1 to 60).map(i => s"zzqx$i").mkString(" ")

    val mem = MemoryStream[(Long, String)](1)(implicitly, spark.sqlContext)
    val gate = StreamNearDup.againstCorpus(
      mem.toDF().toDF("doc_id", "text"), spark, dir)
    val out = Files.createTempDirectory("neardup-out").toString
    val q = gate.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
        df.dropDuplicates("in_id", "corpus_id")
          .write.mode("append").parquet(s"$out/matches")
      }.start()
    // two batches — the operator is stateless, so each batch matches
    // independently against the static side
    mem.addData((100001L, corpusTexts(3L)), (100002L, alien))
    q.processAllAvailable()
    mem.addData((100003L, corpusTexts(7L)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(s"$out/matches")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // each lifted doc found its source at hamming 0
    assert(rows.contains((100001L, 3L, 0)), "batch-1 arrival missed its source")
    assert(rows.contains((100003L, 7L, 0)), "batch-2 arrival missed its source")
    // the alien text is sketch-identical to nothing
    assert(!rows.exists(r => r._1 == 100002L && r._3 == 0),
      "alien doc matched a corpus doc at hamming 0")
    // no duplicate (in, corpus) pairs from multi-band agreement
    assert(rows.distinct.length == rows.length)
  }
}
