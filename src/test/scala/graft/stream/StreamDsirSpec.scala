package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.TextAnalysis

/** The stateless streaming DSIR gate must admit exactly the docs the
  * batch hashed scorer clears — one scoring expression, two surfaces
  * (the StreamQuality discipline applied to target-likeness).
  */
class StreamDsirSpec extends SparkSpec {

  test("streaming DSIR gate admits exactly the batch-scored set " +
      "across micro-batches, on a model frozen from the corpus") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val buckets = 1024
    val model = StreamDsir.freezeModel(spark, dir,
      col("lang") === "en", buckets)
    assert(model.size == buckets)

    // batch truth through the SAME shared expression path
    val scored = TextAnalysis.withDsirHashed(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text")),
      TextAnalysis.dsirModelHashed(spark, dir, col("lang") === "en",
        buckets),
      buckets, "text", "dsir_micro")
      .select("doc_id", "dsir_micro").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pick a floor that actually splits the corpus
    val floor = scored.values.toSeq.sorted.apply(scored.size / 2)
    val batchKept = scored.filter(_._2 >= floor).keySet

    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = MemoryStream[(Long, String)](41)(implicitly, spark.sqlContext)
    val gated = StreamDsir.dsirGate(
      mem.toDF().toDF("doc_id", "text"), model, buckets, floor)
    val q = gated.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sdsir-ckpt").toString)
      .format("memory").queryName("sdsir_out")
      .start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("sdsir_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == batchKept,
        s"missing=${(batchKept -- got).take(5)} " +
          s"extra=${(got -- batchKept).take(5)}")
      assert(got.nonEmpty && got.size < rows.length,
        "gate is vacuous (kept all or none)")
    } finally q.stop()
  }

  test("dsirGate rejects a model/bucket-width mismatch up front") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String)](42)(implicitly, spark.sqlContext)
    val err = intercept[IllegalArgumentException] {
      StreamDsir.dsirGate(mem.toDF().toDF("doc_id", "text"),
        Map(0L -> 1L), 1024, 0L)
    }
    assert(err.getMessage.contains("buckets"))
  }
}
