package graft.stream

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.ext.Clustering

class StreamSemDedupSpec extends SparkSpec {

  test("streaming semantic gate: per-batch matches equal the batch-side " +
    "same-cell brute force; verbatim corpus vectors rediscover their " +
    "source at cosine 1") {
    implicit val s = spark
    import spark.implicits._
    val dir = sf("sf0.001")
    val tau = 0.35
    val corpusVecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val oneHot = { val a = Array.fill(64)(0f); a(0) = 1f; a }
    val inputs = Seq((90001L, corpusVecs(2L)), (90002L, oneHot),
      (90003L, corpusVecs(5L)))

    val mem = MemoryStream[(Long, Array[Float])](1)(implicitly,
      spark.sqlContext)
    val gate = StreamSemDedup.againstCorpus(
      mem.toDF().toDF("vec_id", "embedding"), spark, dir, tau)
    val out = Files.createTempDirectory("semgate-out").toString
    val q = gate.writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$out/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, epoch: Long) =>
        df.write.mode("append").parquet(s"$out/matches")
      }.start()
    mem.addData(inputs(0), inputs(1))
    q.processAllAvailable()
    // stateless: a second batch matches independently
    mem.addData(inputs(2))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$out/matches")
      .select("in_id", "corpus_id").as[(Long, Long)].collect().toSet

    // batch-side ground truth: nearest centroid by plain scala math,
    // then all same-cell corpus vectors with cosine >= tau
    val root = Clustering.clusterDir(spark, dir)
    val centroids = spark.read.parquet(s"$root/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val assign = spark.read.parquet(s"$root/assign")
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (for {
      (inId, v) <- inputs
      cell = centroids.map { case (c, ctr) =>
        val d2 = v.map(_.toDouble).zip(ctr)
          .map { case (x, c0) => (x - c0) * (x - c0) }.sum
        (d2, c)
      }.min._2
      (cid, cv) <- corpusVecs
      if assign(cid) == cell && cos(v, cv) >= tau
    } yield (inId, cid)).toSet
    assert(got == expected,
      s"gate vs brute force: extra=${got.diff(expected)} " +
        s"missing=${expected.diff(got)}")
    // and the verbatim vectors rediscover their sources at cosine ~1
    assert(got.contains((90001L, 2L)) && got.contains((90003L, 5L)))
    val c1 = spark.read.parquet(s"$out/matches")
      .filter(col("in_id") === 90001L && col("corpus_id") === 2L)
      .select("cosine").as[Double].head()
    assert(c1 > 0.9999)
  }

  test("nprobe widens recall monotonically; nprobe=k equals whole-corpus " +
    "brute force") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val tau = 0.35
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    // 20 query vectors = corpus vectors (offset ids) → guaranteed matches
    val queries = corpus.take(20).map { case (id, v) => (90000L + id, v) }
    val df = queries.toSeq.toDF("vec_id", "embedding")
    val k = spark.read
      .parquet(s"${Clustering.clusterDir(spark, dir)}/centroids").count().toInt
    def run(np: Int): Set[(Long, Long)] =
      StreamSemDedup.againstCorpus(df, spark, dir, tau, nprobe = np)
        .select("in_id", "corpus_id").as[(Long, Long)].collect().toSet
    val s1 = run(1); val s2 = run(2); val sk = run(k)
    assert(s1.subsetOf(s2) && s2.subsetOf(sk),
      s"recall must be monotone in nprobe: |s1|=${s1.size} |s2|=${s2.size} " +
        s"|sk|=${sk.size}")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val brute = (for {
      (qid, qv) <- queries
      (cid, cv) <- corpus
      if cos(qv, cv) >= tau
    } yield (qid, cid)).toSet
    assert(sk == brute,
      s"nprobe=k must be exhaustive: extra=${sk.diff(brute).take(5)} " +
        s"missing=${brute.diff(sk).take(5)}")
    // non-vacuity: the fixture must actually have boundary-straddling
    // matches, else the monotonicity claim tests nothing
    assert(s1 != sk, "nprobe=1 already exhaustive — fixture too easy")
  }
}
