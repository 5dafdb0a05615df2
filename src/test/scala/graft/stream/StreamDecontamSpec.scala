package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Decontam

/** The stateless decontamination gate must admit exactly the docs the
  * batch ct3 filter admits (one expression, two surfaces), the frozen
  * benchmark must be bounded and deterministic, and the probe
  * expression must agree with an independent join-based overlap
  * computation on the same eval set.
  */
class StreamDecontamSpec extends SparkSpec {

  test("frozenEval is deterministic, bounded, and sorted") {
    val dir = sf("sf0.001")
    val (ids1, grams1) = Decontam.frozenEval(spark, dir)
    val (ids2, grams2) = Decontam.frozenEval(spark, dir)
    assert(ids1.toSeq == ids2.toSeq && grams1.toSeq == grams2.toSeq)
    assert(ids1.length == Decontam.EvalDocs)
    assert(grams1.toSeq == grams1.toSeq.sorted &&
      grams1.distinct.length == grams1.length)
  }

  test("the sortedContainsAny probe agrees with an explode+join " +
      "overlap computation on every corpus doc") {
    val dir = sf("sf0.001")
    val (_, grams) = Decontam.frozenEval(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val viaProbe = docs
      .filter(Decontam.contaminatedCol(grams, "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gramDf = spark.createDataFrame(
      spark.sparkContext.parallelize(grams.toSeq.map(Tuple1(_)), 2))
      .toDF("ng")
    val viaJoin = docs
      .select(col("doc_id"),
        explode(graft.functions.Expressions.shingleHashes(col("text"),
          Decontam.GramK)).as("ng"))
      .join(gramDf, "ng")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(viaProbe == viaJoin,
      s"probe-only=${(viaProbe -- viaJoin).take(5)} " +
        s"join-only=${(viaJoin -- viaProbe).take(5)}")
    assert(viaProbe.nonEmpty, "no contaminated docs — vacuous fixture")
  }

  test("streaming gate admits exactly the batch ct3 survivors across " +
      "micro-batches, and the gate plan has no shuffle or join") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val (ids, grams) = Decontam.frozenEval(spark, dir)
    val evalIds = ids.toSet
    val batchKept = Decontam.ct3DecontamSurvivors(spark, dir)
      .collect().map(_.getLong(0)).toSet

    // the stream carries non-benchmark docs (ct3's train side)
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .filterNot(r => evalIds(r._1))
    val mem = MemoryStream[(Long, String)](43)(implicitly, spark.sqlContext)
    val gated = StreamDecontam.decontamGate(
      mem.toDF().toDF("doc_id", "text"), grams)
    val q = gated.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("sct-ckpt").toString)
      .format("memory").queryName("sct_out")
      .start()
    try {
      val (h1, h2) = rows.splitAt(rows.length / 2)
      mem.addData(h1.toIndexedSeq); q.processAllAvailable()
      mem.addData(h2.toIndexedSeq); q.processAllAvailable()
      val got = spark.table("sct_out")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == batchKept,
        s"missing=${(batchKept -- got).take(5)} " +
          s"extra=${(got -- batchKept).take(5)}")
      assert(got.nonEmpty && got.size < rows.length,
        "gate is vacuous (kept all or none)")
    } finally q.stop()

    // stateless map-only serving: no exchange, no join in the plan
    val plan = gated.queryExecution.analyzed
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, s"gate plan joins: $joins")
  }
}
