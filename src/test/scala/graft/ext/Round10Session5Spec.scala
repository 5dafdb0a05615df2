package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-10 session-5: char entropy (t14), BPE merge application (v3),
  * signed random projection (e6).
  */
class Round10Session5Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("t14: entropy matches a hand computation, incl. the other-bucket") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-t14").toString
    Seq((1L, "aab"), (2L, "Ab!"), (3L, "zzzz"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.charEntropy(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    def nano(k: Long, n: Long): Long =
      math.floor((k.toDouble / n) * math.log(n.toDouble / k) * 1e9).toLong
    // "aab": a=2, b=1               -> two classes
    assert(got(1L) == ((3L, nano(2, 3) + nano(1, 3))), got(1L).toString)
    // "Ab!": b=1; 'A' and '!' fall in the other-bucket (k=2)
    assert(got(2L) == ((3L, nano(1, 3) + nano(2, 3))), got(2L).toString)
    // "zzzz": single class, entropy exactly 0
    assert(got(3L) == ((4L, 0L)), got(3L).toString)
  }

  test("t14: corpus pass is deterministic, positive, and bounded by ln(28)") {
    val rows = graft.queries.ExtQueries.t14CharEntropy(spark, sf("sf0.001"))
      .collect()
    assert(rows.length == 500, s"expected 500 docs, got ${rows.length}")
    val maxNano = (math.log(28.0) * 1e9).toLong // 28-class uniform bound
    rows.foreach { r =>
      val e = r.getLong(2)
      assert(e > 0 && e <= maxNano, s"doc ${r.getLong(0)}: ent_nano $e")
    }
  }

  test("v3: merge fold on a tiny corpus — rank order, boundary safety, " +
      "merged-token accounting") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-v3").toString
    // pairs: (a,b)x3 ranks first; (b,a)/(b,c)/(b,x) tie-break after but
    // never match post-merge (their b's are consumed by a+b tokens).
    Seq((1L, "a b a b c"), (2L, "a b x"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.bpeEncode(spark, dir, k = 50)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((5L, 3L, md5Hex("|a+b||a+b||c|"))), got(1L).toString)
    assert(got(2L) == ((3L, 2L, md5Hex("|a+b||x|"))), got(2L).toString)
  }

  test("v3: corpus invariants — n_after <= n_before, deterministic, " +
      "merges actually fire") {
    val dir = sf("sf0.001")
    val a = graft.queries.ExtQueries.v3BpeEncode(spark, dir).collect()
    val b = graft.queries.ExtQueries.v3BpeEncode(spark, dir).collect()
    assert(a.toSeq == b.toSeq, "two runs disagree")
    assert(a.length == 500)
    a.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1),
        s"doc ${r.getLong(0)}: n_after > n_before")
    }
    assert(a.exists(r => r.getLong(2) < r.getLong(1)),
      "no merge fired anywhere — fixture or fold broken")
  }

  test("g2: label propagation on a hand-traced graph (tie-to-min, " +
      "bipartite oscillation preserved)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-g2").toString
    // clique {1,2,3} + pendant 4 on 3 + isolated edge {5,6}
    Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 3L), (20L, 4L),
      (30L, 5L), (30L, 6L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.labelProp(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // traced by hand: clique+pendant converge to 1; the 2-cycle
    // oscillates (synchronous LPA on a bipartite component)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 6L, 6L -> 5L), got.toString)
  }

  test("w15: EWMA recurrence on a tiny ordered series") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-w15").toString
    Seq(
      (1L, "2024-01-01 00:00:00", 7L, 1.0),
      (2L, "2024-01-01 00:01:00", 7L, 2.0),
      (3L, "2024-01-01 00:02:00", 7L, 3.0),
      (4L, "2024-01-01 00:00:30", 9L, 4.0))
      .toDF("event_id", "ts_s", "user_id", "value")
      .selectExpr("event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.CoreQueries.w15Ewma(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // user 7: 1.0 ; .25*2+.75*1 = 1.25 ; .25*3+.75*1.25 = 1.6875
    assert(got == Map(1L -> 1000000L, 2L -> 1250000L, 3L -> 1687500L,
      4L -> 4000000L), got.toString)
  }

  test("w15: corpus pass is partition-layout-independent (3 vs 32 " +
      "shards) and covers every event") {
    val dir = sf("sf0.001")
    val n = spark.read.parquet(s"$dir/events.parquet").count()
    val a = graft.queries.CoreQueries.w15Ewma(spark, dir, shards = 32)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(a.length == n, s"${a.length} != $n")
    // a DIFFERENT shard count produces a different physical layout
    // (users co-located differently); the per-user fold must not notice
    val b = graft.queries.CoreQueries.w15Ewma(spark, dir, shards = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._2)
    assert(a.toSeq == b.toSeq, "shard layout changed the EWMA")
  }

  test("t15: hand-traced boundary split, full-tiling invariants on the " +
      "corpus") {
    import spark.implicits._
    // one shard (ids ≡ 0 mod 32), seqLen 512: docs of 300+300+512 tokens
    // → doc 32 crosses the seq-0/1 boundary at stream offset 512, doc 64
    // fills seq 1 to 600 then seq 2 to 1112
    val d = Seq((0L, 300L), (32L, 300L), (64L, 512L))
      .toDF("doc_id", "n_tokens")
    val got = BatchPacking.sequenceWindows(d, "doc_id", "n_tokens")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (0L, 0L, 0L, 300L),    // doc 0: all of it in seq 0
      (0L, 32L, 0L, 212L),   // doc 32: first 212 tokens finish seq 0
      (1L, 32L, 212L, 300L), // doc 32: remaining 88 open seq 1
      (1L, 64L, 0L, 424L),   // doc 64: 424 tokens finish seq 1
      (2L, 64L, 424L, 512L)  // doc 64: remaining 88 open seq 2
    ), got.mkString(","))

    val corpus = graft.ext.BatchPacking
      .t15SequenceWindows(spark, sf("sf0.001"))
    // every doc's spans tile it exactly
    val docBad = corpus.groupBy("doc_id")
      .agg(sum(expr("tok_end - tok_start")).as("covered"))
      .join(spark.read.parquet(sf("sf0.001") + "/documents.parquet")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
      .filter(col("covered") =!= col("n"))
    assert(docBad.count() == 0, "a doc is not exactly tiled by its spans")
    // every sequence is exactly 512 tokens except the last per shard
    val lastSeq = corpus.groupBy("shard")
      .agg(max("seq_in_shard").as("last"))
    val seqBad = corpus.groupBy("shard", "seq_in_shard")
      .agg(sum(expr("tok_end - tok_start")).as("filled"))
      .join(lastSeq, "shard")
      .filter(col("seq_in_shard") =!= col("last") &&
        col("filled") =!= graft.ext.BatchPacking.T15SeqLen)
    assert(seqBad.count() == 0, "a non-final sequence is not full")
  }

  test("e6: projections equal an independent driver-side recomputation") {
    val dir = sf("sf0.001")
    val signs = Similarity.rpSigns(16, 64)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val expected = for {
      (id, v) <- vecs.toSeq
      q = v.map(x => math.floor(x.toDouble * 1e6).toLong)
      i <- 0 until 16
    } yield (id, i, (0 until 64).map(j => q(j) * signs(i)(j)).sum)
    val got = graft.queries.ExtQueries.e6RandomProjection(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length == vecs.size * 16, s"rows ${got.length}")
    assert(got.toSet == expected.toSet, "projection mismatch")
  }
}
