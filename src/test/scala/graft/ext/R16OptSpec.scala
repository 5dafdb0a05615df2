package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-16 OPTIMIZATION pins (the R15OptSpec contract): every perf
  * rewrite leaves the operator's rows identical to the pre-rewrite
  * construction, re-created inline here.
  */
class R16OptSpec extends SparkSpec {

  test("g1 pageRank with the dst-partitioned checkpointed edge table " +
      "and per-round broadcast equals the pre-r16 lazy shuffle loop " +
      "row-for-row on both fixture SFs") {
    for (dirName <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(dirName)
      // pre-r16 reference, re-created inline (lazy loop, shuffle joins)
      val edges = Graph.coOrderEdges(spark, dir)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val ed = edges.join(deg, "src")
      var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        pr = ed
          .join(pr.withColumnRenamed("node", "src"), "src")
          .select(col("dst"), expr("pr div outdeg").as("share"))
          .groupBy("dst")
          .agg(sum(col("share")).as("in_pr"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
              .as("pr"))
      }
      val ref = pr.select(col("node").as("part_key"), col("pr").as("pr_micro"))
      val got = Graph.pageRank(spark, dir, iters = 3)
      assert(got.exceptAll(ref).count() == 0 &&
        ref.exceptAll(got).count() == 0,
        s"$dirName: g1 rows diverged from the pre-r16 loop")
    }
  }

  test("g2 labelProp with the dst-partitioned checkpointed edge table " +
      "equals the pre-r16 loop row-for-row on both fixture SFs") {
    for (dirName <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(dirName)
      val edges = Graph.coOrderEdges(spark, dir)
      var labels = edges.select(col("src").as("node")).distinct()
        .withColumn("label", col("node"))
      for (_ <- 1 to 3) {
        labels = edges
          .join(broadcast(labels.select(col("node").as("src"), col("label"))),
            "src")
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("node")
          .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
          .select(col("node"), (-col("m.nl")).cast("long").as("label"))
      }
      val ref = labels.select(col("node").as("part_key"), col("label"))
      val got = Graph.labelProp(spark, dir, iters = 3)
      assert(got.exceptAll(ref).count() == 0 &&
        ref.exceptAll(got).count() == 0,
        s"$dirName: g2 rows diverged from the pre-r16 loop")
    }
  }

  test("e3 knnJoin generation-time scoring (broadcast path, no pair " +
      "distinct) equals the pre-r16 dedup-then-attach construction " +
      "row-for-row on both fixture SFs") {
    for (dirName <- Seq("sf0.001", "sf0.01")) {
      val dir = sf(dirName)
      val planes = Similarity.resolveKnnPlanes(spark, dir, 0)
      val tables = Similarity.resolveKnnTables(spark, dir, 0)
      // pre-r16 reference: dedup the candidate pairs, then attach + score
      val b = Similarity.lshBucketsMulti(spark, dir, planes, tables)
        .select("vec_id", "table_id", "bucket")
      val probes = array((Seq(col("bucket")) ++ (0 until planes).map(i =>
        col("bucket").bitwiseXOR(lit(1L << i)))): _*)
      val l = b.select(col("vec_id").as("src_id"), col("table_id"),
        explode(probes).as("bucket"))
      val r = b.select(col("vec_id").as("nb_id"), col("table_id"),
        col("bucket"))
      val pairs = SkewSafe.cappedEquiJoin(l, r, Seq("table_id", "bucket"),
          xxhash64(col("nb_id")), cap = 1024)
        .filter(col("src_id") =!= col("nb_id"))
        .select("src_id", "nb_id")
        .distinct()
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"),
          graft.functions.Expressions.normF(col("embedding")).as("nrm"))
      val cand = pairs
        .join(e.select(col("vec_id").as("src_id"),
          col("embedding").as("src_emb"), col("nrm").as("src_nrm")),
          Seq("src_id"))
        .join(e.select(col("vec_id").as("nb_id"),
          col("embedding").as("nb_emb"), col("nrm").as("nb_nrm")),
          Seq("nb_id"))
        .select(col("src_id"), col("nb_id"),
          graft.functions.Expressions.cosinePreF(col("src_emb"),
            col("src_nrm"), col("nb_emb"), col("nb_nrm")).as("cosine"))
      val ref = graft.plans.TopKPerGroup.topK(cand, Seq("src_id"),
        "cosine", 3, desc = true, tiebreakCols = Seq("nb_id"))
      val got = Similarity.knnJoin(spark, dir, k = 3)
      assert(got.exceptAll(ref).count() == 0 &&
        ref.exceptAll(got).count() == 0,
        s"$dirName: e3 rows diverged from the dedup-then-attach reference")
    }
  }

  test("g1/g2 loop bodies plan with ZERO added shuffle exchanges: the " +
      "formatted plan holds a CONSTANT shuffle count (edge build + one " +
      "dst repartition), not one per round — the r15 plan re-exchanged " +
      "the aggregate every round") {
    val dir = sf("sf0.001")
    // count EXECUTED shuffle-map stages (stages that wrote shuffle
    // bytes): the lazy plan TEXT repeats the edge-build subtree per
    // round (ReuseExchange dedupes it at runtime), and the executedPlan
    // TREE hides AQE's inner plan — runtime stage accounting is the
    // claim that matters: rounds must add no shuffle writes.
    def shuffleWriteStages(mk: => org.apache.spark.sql.DataFrame): Int = {
      val n = new java.util.concurrent.atomic.AtomicInteger(0)
      val seen = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          seen.incrementAndGet()
          if (e.stageInfo.taskMetrics != null &&
              e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten > 0)
            n.incrementAndGet(): Unit
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        mk.write.mode("overwrite").format("noop").save()
        org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
      } finally spark.sparkContext.removeSparkListener(listener)
      assert(seen.get() > 0, "listener saw no stages")
      n.get()
    }
    val g1a = shuffleWriteStages(Graph.pageRank(spark, dir, iters = 1))
    val g1b = shuffleWriteStages(Graph.pageRank(spark, dir, iters = 3))
    assert(g1b == g1a,
      s"g1 shuffle writes grow with rounds: iters=1 -> $g1a, iters=3 -> $g1b")
    val g2a = shuffleWriteStages(Graph.labelProp(spark, dir, iters = 1,
      managed = false))
    val g2b = shuffleWriteStages(Graph.labelProp(spark, dir, iters = 3,
      managed = false))
    assert(g2b == g2a,
      s"g2 shuffle writes grow with rounds: iters=1 -> $g2a, iters=3 -> $g2b")
  }
}
