package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextAnalysis

/** The stateless streaming quality gate must agree EXACTLY with the
  * batch gate operators on the same documents — one expression, two
  * surfaces.
  */
class StreamQualitySpec extends SparkSpec {

  test("gopherKeptSql == gopherRules' kept flag on every corpus doc") {
    val viaRules = TextAnalysis.gopherRules(spark, sf("sf0.001"))
      .filter(col("kept") === 1).select("doc_id")
    val viaSql = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .filter(expr(TextAnalysis.gopherKeptSql("text")))
      .select("doc_id")
    assert(viaRules.exceptAll(viaSql).count() == 0 &&
      viaSql.exceptAll(viaRules).count() == 0,
      "gopherKeptSql drifted from gopherRules")
  }

  test("streaming quality gate passes exactly the batch-gated set " +
      "across micro-batches") {
    import spark.implicits._
    val floor = 1500000000L
    val batchKept = TextAnalysis.withEntNano(
        spark.read.parquet(sf("sf0.001") + "/documents.parquet"),
        "text", "ent_nano")
      .filter(expr(TextAnalysis.gopherKeptSql("text")) &&
        col("ent_nano") >= floor)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val rows = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)](13)(implicitly, spark.sqlContext)
    val gated = StreamQuality.qualityGate(
      mem.toDF().toDF("doc_id", "text"))
    val q = gated.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("squality-ckpt").toString)
      .format("memory").queryName("squality_out")
      .start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("squality_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == batchKept,
        s"missing=${(batchKept -- got).take(5)} " +
          s"extra=${(got -- batchKept).take(5)}")
      assert(got.nonEmpty && got.size < rows.length,
        "gate is vacuous (kept all or none)")
    } finally q.stop()
  }
}
