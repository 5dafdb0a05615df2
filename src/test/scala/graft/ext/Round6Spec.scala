package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ExtQueries

/** Round-6 additions: kNN recall floor (e3r), LSH skew caps, and the
  * invariant/operator query-set split.
  */
class Round6Spec extends SparkSpec {

  /** Run `body` with the plan shape the skew guard exists for: a big-big
    * SHUFFLED join (broadcast joins don't have the hot-reducer problem,
    * and at this tiny test scale Spark would broadcast), and AQE
    * coalescing off (it would merge the tiny sub-blocks back together and
    * hide the split this suite needs to observe).
    */
  private def asShuffledJoin[T](body: => T): T = {
    val ks = Seq(
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // the shared test session runs 4 shuffle partitions; the spread
      // assertions need room for the ~12 sub-keys to separate
      "spark.sql.shuffle.partitions" -> "64")
    val olds = ks.map { case (k, _) => k -> spark.conf.getOption(k) }
    ks.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach { case (k, o) =>
      o.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("e3r: multi-table+probe kNN join clears the pinned recall floor") {
    // floor = 0.30; measured 0.39/0.31/0.36..0.43 across sf0.001..sf0.1
    // with nTables=4 + Hamming-1 probes (worst-case near-random vectors)
    assert(ExtQueries.e3rKnnRecall(spark, sf("sf0.01")).count() == 0L)
  }

  test("e3: multi-table candidates carry no duplicate (src, nb) pairs") {
    val dup = Similarity.knnJoin(spark, sf("sf0.01"), k = 3)
      .groupBy("src_id", "nb_id").count().filter(col("count") > 1).count()
    assert(dup == 0L)
  }

  test("cappedEquiJoin: complete on one giant key, spread across tasks") {
    import spark.implicits._
    val n = 600
    // adversarial: EVERY row lands in the same bucket
    val l = (0 until n).map(i => (i.toLong, 0, 0L)).toDF("doc_a", "band", "key")
    val r = (0 until n).map(i => (i.toLong, 0, 0L)).toDF("doc_b", "band", "key")
    val joined = SkewSafe.cappedEquiJoin(l, r, Seq("band", "key"),
      xxhash64(col("doc_b")), cap = 50)
    // completeness: all n*n matches appear exactly once
    assert(joined.count() == n.toLong * n)
    assert(joined.groupBy("doc_a", "doc_b").count()
      .filter(col("count") > 1).count() == 0L)
    // skew spread: no single task holds the quadratic block — with
    // g = ceil(600/50) = 12 sub-keys the biggest join partition holds
    // ~n*cap rows, not all 360k (AQE coalescing disabled so the split
    // is observable at this tiny scale)
    asShuffledJoin {
      val perPart = joined.withColumn("pid", spark_partition_id())
        .groupBy("pid").count().collect().map(_.getLong(1))
      assert(perPart.length >= 6, s"expected >=6 tasks, got ${perPart.length}")
      assert(perPart.max <= 2L * n * 50,
        s"hot bucket not split: max partition ${perPart.max} of ${n * n}")
    }
    // cold keys pass through unchanged (no replication overhead)
    val lc = Seq((1L, 1, 1L), (2L, 1, 1L)).toDF("doc_a", "band", "key")
    val rc = Seq((3L, 1, 1L)).toDF("doc_b", "band", "key")
    assert(SkewSafe.cappedEquiJoin(lc, rc, Seq("band", "key"),
      xxhash64(col("doc_b")), cap = 50).count() == 2L)
  }

  test("simhash pairs on an all-identical corpus: capped, still complete") {
    import spark.implicits._
    val n = 400
    val tmp = java.nio.file.Files.createTempDirectory("graft-skew").toString
    val text = "identical boilerplate document body for every single row"
    (0 until n).map(i => (i.toLong, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.simhashNearDupPairs(spark, tmp, maxDist = 3,
      bucketCap = 32)
    // identical docs => identical sketches => every unordered pair found
    assert(pairs.count() == n.toLong * (n - 1) / 2)
    // and the capped candidate join spreads the hot bucket: observe the
    // raw join stage (pre-distinct) with AQE coalescing off
    asShuffledJoin {
      val banded = Dedup.simhashes(spark, tmp).select(col("doc_id"),
        lit(0).as("band"), col("simhash").as("key"))
      val cand = SkewSafe.cappedEquiJoin(
        banded.select(col("doc_id").as("doc_a"), col("band"), col("key")),
        banded.select(col("doc_id").as("doc_b"), col("band"), col("key")),
        Seq("band", "key"), xxhash64(col("doc_b")), cap = 32)
      val perPart = cand.withColumn("pid", spark_partition_id())
        .groupBy("pid").count().collect().map(_.getLong(1))
      assert(perPart.length >= 6, s"expected >=6 tasks, got ${perPart.length}")
      assert(perPart.max <= 2L * n * 32,
        s"hot bucket not split: max partition ${perPart.max}")
    }
  }

  test("zorder_key fails loudly on out-of-range input instead of masking") {
    import spark.implicits._
    val bad = Seq((300L, 10L)).toDF("x", "y")
    val e = intercept[Exception] {
      bad.select(graft.functions.Expressions.zorderKey8(col("x"), col("y")))
        .collect()
    }
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(messages.contains("zorder_key"), s"unexpected error chain: $messages")
    // in-range inputs still interleave correctly
    val z = Seq((255L, 0L)).toDF("x", "y")
      .select(graft.functions.Expressions.zorderKey8(col("x"), col("y"))
        .as("z")).head().getLong(0)
    assert(z == graft.functions.Morton.zkey8(255L, 0L))
  }

  test("recall invariants fail loudly on an empty exact side") {
    import spark.implicits._
    // a corpus whose vec_ids all sit above the probe range: the exact
    // side is empty, which must emit a violation row, not pass vacuously
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-emb").toString
    val v = Array.tabulate(64)(i => i.toFloat / 64)
    (100 until 140).map(i => (i.toLong, "x", v))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    assert(Similarity.annRecallViolations(spark, tmp, nQueries = 10).count() == 1L,
      "empty exact side must surface as a violation")
  }

  test("invariant query tagging: declared, resolvable, and sane") {
    val inv = graft.SparkEntry.invariantQueries
    assert(inv.subsetOf(graft.SparkEntry.queries.keySet))
    // the known O(n^2) verifiers are tagged
    assert(inv("d8v_simhash_band_complete") && inv("e3r_knn_recall") &&
      inv("wv2_winnow_pairs_subset_exact"))
    // operators are NOT tagged
    assert(!inv("e3_knn_join") && !inv("d8_simhash_pairs") &&
      !inv("q1_lineitem_agg"))
  }

  test("t10: no per-word micro-logprob sits on an integer floor boundary") {
    // The t10 oracle floors ln(c/t)*1e6 per WORD so aggregation is exact
    // integer math; the only cross-engine risk left is a word whose value
    // lies within ~1 ulp of an integer boundary (Math.log vs libm ln).
    // Pin a 1e-6 margin — 500x a double ulp at this magnitude — for every
    // distinct (c, t) in the gated corpora.
    for (d <- Seq(sf("sf0.001"), sf("sf0.01"))) {
      val words = spark.read.parquet(s"$d/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
      val freqs = words.groupBy("w").count().collect().map(_.getLong(1))
      val t = freqs.sum.toDouble
      freqs.distinct.foreach { c =>
        val v = math.log(c / t) * 1000000
        val dist = math.abs(v - math.rint(v))
        assert(dist > 1e-6,
          f"c=$c t=$t%.0f: micro-logprob $v%.9f within $dist%.2e of a boundary")
      }
    }
  }

  test("d9 keep-best: partitions the corpus, keeper maximizes length") {
    val d = sf("sf0.01")
    val out = Dedup.keepBestPerCluster(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$d/documents.parquet").count()
    // survivors' member counts cover every doc exactly once
    assert(out.map(_._3).sum == nDocs)
    assert(out.map(_._1).distinct.length == out.length)
    // cross-check every multi-doc cluster's keeper against a direct
    // max-by over the cluster membership
    val clusters = Dedup.duplicateClusters(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val chars = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = clusters.groupBy(_._2).map { case (cid, ms) =>
      cid -> ms.map(_._1).minBy(id => (-chars(id), id))
    }
    val got = out.filter(_._3 > 1).map(r => r._2 -> r._1).toMap
    assert(got == want, "keeper mismatch vs direct max-by")
  }

  test("knnJoin survives an all-identical-embedding corpus (one hot bucket)") {
    import spark.implicits._
    val n = 300
    val tmp = java.nio.file.Files.createTempDirectory("graft-skew-emb").toString
    val v = Array.tabulate(64)(i => (1.0f / (i + 1)))
    (0 until n).map(i => (i.toLong, "same", v)).toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val knn = Similarity.knnJoin(spark, tmp, k = 3)
    val rows = knn.collect()
    // every vector finds neighbors (all in the same bucket), k each
    assert(rows.length == n * 3)
    assert(rows.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-6))
  }
}
