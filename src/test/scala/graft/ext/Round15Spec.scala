package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pins: var-width broadcast-gate measurement one layer down
  * (UTF-8 octets for strings, measured arrays/maps — VERDICT r14 item 1
  * + ADVICE r14), the shared per-corpus memo invalidation registry, and
  * the calibratedNprobe fallback discipline.
  */
class Round15Spec extends SparkSpec {

  import graft.queries.JoinHints

  // ---- estBytes: octets, not characters -----------------------------------

  test("JoinHints.estBytes counts UTF-8 OCTETS for strings: a CJK dim " +
      "is charged ~3 bytes per character, not 1 (ADVICE r14 — length() " +
      "under-measured non-ASCII text up to 4x, re-admitting the " +
      "under-estimate-driven OOM broadcast)") {
    import spark.implicits._
    // 1000 rows x 90 CJK chars = 270_000 payload bytes but 90_000 chars
    val dim = (0L until 1000L).toDF("k")
      .select(col("k"), lit("大数据" * 30).as("t"))
    val est = JoinHints.estBytes(dim, "r15spec.cjk")
    val octets = 1000L * 90L * 3L
    assert(est >= octets,
      s"estimate $est below the $octets UTF-8 payload bytes")
  }

  test("JoinHints.estBytes MEASURES array columns: an array-of-string " +
      "dim that Catalyst defaultSize (one element's 20 B) would " +
      "broadcast routes to the exchange join, row-identical both ways " +
      "(VERDICT r14 item 1 — the string fix one layer down)") {
    import spark.implicits._
    val dir = sf("sf0.001")
    // 500 rows x 40-element arrays of 120-char strings ≈ 2.4 MB payload;
    // defaultSize charges ArrayType(StringType) a flat 20 B per ROW
    val dim = spark.read.parquet(s"$dir/documents.parquet")
      .limit(500)
      .select(col("doc_id").as("d_id"),
        expr("transform(sequence(1, 40), i -> repeat('tok', 40))")
          .as("d_toks"))
    val cap = 1L << 20 // 1 MB
    val schemaOnlyEst =
      (dim.schema.map(_.dataType.defaultSize).sum + 16) * 500L
    assert(schemaOnlyEst < cap,
      "fixture must be one defaultSize would wrongly broadcast")
    val measured = JoinHints.estBytes(dim, s"$dir|r15spec.arrdim")
    assert(measured > cap,
      s"measured $measured must exceed the $cap cap")
    val fact = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars"))
    def agg(d: org.apache.spark.sql.DataFrame) =
      fact.join(d, col("doc_id") === col("d_id"))
        .groupBy(size(col("d_toks")).as("ntok"))
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("nc"))
    val gatedDf = agg(JoinHints.gated(dim, s"$dir|r15spec.arrdim",
      bytesMax = cap))
    assert(!gatedDf.queryExecution.optimizedPlan.toString
      .contains("broadcast"), "over-cap array dim kept its hint")
    val forced = agg(broadcast(dim))
    val a = gatedDf.orderBy("ntok").collect().map(_.toSeq).toSeq
    val b = forced.orderBy("ntok").collect().map(_.toSeq).toSeq
    assert(a == b, "route changed the rows")
  }

  // ---- CorpusMemos: one registry clears every per-corpus memo -------------

  test("CorpusMemos.clearAll drops the broadcast-gate statistic: the " +
      "next estBytes for the same key re-runs its measurement job " +
      "(ADVICE r14 — the calibration-layer memos had no invalidation " +
      "hook; ScaleGen now clears ALL of them through the registry)") {
    import spark.implicits._
    val dim = (0L until 100L).toDF("k")
    val key = "r15spec.memoclear"
    JoinHints.estBytes(dim, key): Unit // prime
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      JoinHints.estBytes(dim, key): Unit // memoized: zero jobs
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
      assert(jobs.get() == 0L, "cached estBytes ran a job")
      CorpusMemos.clearAll()
      JoinHints.estBytes(dim, key): Unit // invalidated: re-measures
      org.apache.spark.graftbridge.ListenerDrain.drain(spark.sparkContext)
      assert(jobs.get() > 0L,
        "estBytes after clearAll never re-ran its measurement")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ensureBucketed after CorpusMemos.clearAll ADOPTS the existing " +
      "tables when the source corpus is unchanged — no destructive " +
      "rebuild (a rebuild deletes the part files under any in-flight " +
      "reader planned against the old list → FAILED_READ_FILE; with " +
      "parallel suites the clearAll test fired exactly that race)") {
    val dir = sf("sf0.001")
    val (ot, _) = Bucketing.ensureBucketed(spark, dir)
    def partFiles(t: String): Set[String] = {
      val wh = new java.net.URI(
        spark.conf.get("spark.sql.warehouse.dir")).getPath
      Option(new java.io.File(wh, t).listFiles()).getOrElse(Array.empty)
        .map(_.getName).filter(_.startsWith("part-")).toSet
    }
    val before = partFiles(ot)
    assert(before.nonEmpty)
    CorpusMemos.clearAll()
    val (ot2, _) = Bucketing.ensureBucketed(spark, dir)
    assert(ot2 == ot)
    assert(partFiles(ot) == before,
      "unchanged corpus was destructively rebuilt after memo clear")
  }

  // ---- multi-label public suffixes ----------------------------------------

  test("Domains.regDomainOf groups co.uk-style hosts under the correct " +
      "registrable domain via the embedded suffix snapshot, while " +
      ".com-class hosts keep the two-label rule (VERDICT r14 item 7 — " +
      "the bare two-label rule merged the whole UK commercial web into " +
      "one 'co.uk' bucket)") {
    import spark.implicits._
    val cases = Seq(
      ("https://www.example.co.uk/a?x=1", "example.co.uk"),
      ("https://deep.sub.example.co.uk/b", "example.co.uk"),
      ("https://news.bbc.ac.uk/c", "bbc.ac.uk"),
      ("https://shop.example.com.au/d", "example.com.au"),
      ("https://www.example.co.jp/e", "example.co.jp"),
      ("https://www.example.com/f", "example.com"),
      ("https://api.example.org/g", "example.org"),
      // a bare suffix host has no registrable label → two-label rule
      ("https://co.uk/h", "co.uk"))
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), Domains.regDomainOf(col("url")).as("rd"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (url, want) =>
      assert(got(url) == want, s"$url -> ${got(url)}, want $want")
    }
    // the u4 cap now buckets per REGISTRABLE domain: two co.uk hosts
    // with different subdomains share one cap bucket
    val docs = Seq(
      (1L, "https://a.example.co.uk/1", "t1"),
      (2L, "https://b.example.co.uk/2", "t2"),
      (3L, "https://c.example.co.uk/3", "t3"))
      .toDF("doc_id", "url", "text")
    val capped = graft.plans.TopKPerGroup.topK(
      docs.select(col("doc_id"),
        Domains.regDomainOf(col("url")).as("reg_domain"),
        md5(col("text")).as("h")),
      Seq("reg_domain"), "h", 2, desc = false,
      tiebreakCols = Seq("doc_id"))
    assert(capped.count() == 2L,
      "three same-registrable-domain docs must cap to 2")
  }

  // ---- chained-gate prefilter threshold calibration -----------------------

  test("chained-gate tauPre is read from the PQ artifact (margin x " +
      "measured ADC self-match floor), and the prefilter/exact-verify " +
      "match-set identity holds under it on BOTH the fixture corpus and " +
      "a clustered one (VERDICT r14 item 8 — the constant was justified " +
      "once at gate scale; now it is a per-artifact measurement)") {
    import spark.implicits._
    import graft.stream.StreamIvfPq

    def checkCorpus(dir: String): Unit = {
      val art = StreamIvfPq.artifact(spark, dir)
      val root = ProductQuant.pqDir(spark, dir)
      val calib = spark.read.parquet(s"$root/calib").head()
      val storedFloor = calib.getAs[Double]("adc_self_floor")
      val storedTauPre = calib.getAs[Double]("chain_tau_pre")
      assert(math.abs(storedTauPre -
        ProductQuant.ChainTauPreMargin * storedFloor) < 1e-12,
        s"$dir: stored tauPre not margin x floor")
      assert(art.tauPreCalib == storedTauPre,
        s"$dir: artifact carries ${art.tauPreCalib}, stored $storedTauPre")
      assert(storedFloor > 0.0 && storedFloor <= 1.0)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select("vec_id", "embedding")
      val probes = emb.filter(col("vec_id") < 20)
        .select((col("vec_id") + lit(100000L)).as("vec_id"),
          col("embedding"))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select("in_id", "corpus_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val chained = pairs(
        StreamIvfPq.chainedMatches(probes, art, emb, tau = 0.9))
      val baseline = pairs(StreamIvfPq.chainedMatches(probes, art, emb,
        tau = 0.9, tauPre = Double.NegativeInfinity))
      assert(chained == baseline,
        s"$dir: calibrated prefilter dropped exact matches: " +
          s"missing=${baseline -- chained}")
      assert(chained.nonEmpty, s"$dir: vacuous — no exact matches")
    }

    checkCorpus(sf("sf0.001"))

    // a deterministic CLUSTERED corpus: tight quantization -> a much
    // higher self-floor -> a higher calibrated tauPre, and the identity
    // must still hold there (the r14 lesson: constants tuned on the
    // structure-free fixture break on structured data, and vice versa)
    val cluDir = java.nio.file.Files
      .createTempDirectory("r15-clu-corpus").toString
    val rnd = new scala.util.Random(4242)
    val centers = IndexedSeq.fill(8)(
      Array.fill(64)(rnd.nextGaussian()))
    val rows = (0L until 500L).map { i =>
      val c = centers((i % 8).toInt)
      val e = c.map(x => (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq
      (i, e, s"c${i % 8}")
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"), col("label"))
      .repartition(4)
      .write.parquet(s"$cluDir/embeddings.parquet")
    checkCorpus(cluDir)

    // the clustered artifact's calibration really differs from the
    // fixture's — the whole point of measuring per artifact
    val fixtureTauPre = ProductQuant.chainTauPre(spark,
      ProductQuant.pqDir(spark, sf("sf0.001")))
    val cluTauPre = ProductQuant.chainTauPre(spark,
      ProductQuant.pqDir(spark, cluDir))
    assert(cluTauPre > fixtureTauPre,
      f"clustered tauPre $cluTauPre%.3f should exceed the " +
        f"structure-free fixture's $fixtureTauPre%.3f")
  }

  // ---- incremental IVF / PQ index maintenance -----------------------------

  /** Synthetic embedding corpus (vec_id, embedding[64]: float, label):
    * `clusters` tight Gaussian clusters, or structure-free when
    * `clusters = 0`.
    */
  private def embCorpus(n: Int, clusters: Int, seed: Int,
      idOffset: Long = 0L): Seq[(Long, Seq[Float], String)] = {
    val rnd = new scala.util.Random(seed)
    val centers = IndexedSeq.fill(math.max(clusters, 1))(
      Array.fill(64)(rnd.nextGaussian()))
    (0 until n).map { i =>
      val e =
        if (clusters == 0) Seq.fill(64)(rnd.nextGaussian().toFloat)
        else centers(i % clusters).map(x =>
          (x + 0.05 * rnd.nextGaussian()).toFloat).toSeq
      (idOffset + i, e, s"l${i % 7}")
    }
  }

  private def writeEmb(rows: Seq[(Long, Seq[Float], String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("r15-delta").toString
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"), col("label"))
      .repartition(4).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("ivfDeltaAppend: delta rows land in exactly the cells a frozen-" +
      "centroid one-shot assignment gives, base rows are untouched, and " +
      "a FULL-depth probe through the grown artifact equals the exact " +
      "top-k over the union (VERDICT r14 item 2 — the index artifacts " +
      "are now incrementally maintainable the curateDelta way)") {
    import spark.implicits._
    val base = embCorpus(256, clusters = 8, seed = 31)
    val delta = embCorpus(32, clusters = 8, seed = 32, idOffset = 1000L)
    val baseDir = writeEmb(base)
    val idx = Similarity.buildIvfFrom(spark, s"$baseDir|r15delta",
      spark.read.parquet(s"$baseDir/embeddings.parquet"), nlist = 16)
    val baseCells = spark.read.option("basePath", s"$idx/cells")
      .parquet(s"$idx/cells").select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val res = Similarity.ivfDeltaAppend(spark, idx,
      delta.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<float>")
          .as("embedding"), col("label")))
    assert(res.added == 32L)
    val after = spark.read.option("basePath", s"$idx/cells")
      .parquet(s"$idx/cells").select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(after.size == 288)
    baseCells.foreach { case (id, c) =>
      assert(after(id) == c, s"base row $id moved cell")
    }
    // one-shot frozen-centroid assignment, driver-side
    val centroids = spark.read.parquet(s"$idx/centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    def assign(e: Seq[Float]): Int =
      centroids.map { case (c, ctr) =>
        val d = ctr.zip(e).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, c)
      }.min._2
    delta.foreach { case (id, e, _) =>
      assert(after(id) == assign(e), s"delta row $id mis-assigned")
    }
    // full-depth probe == exact top-k over the union
    val all = (base ++ delta).map { case (id, e, _) =>
      (id, e.map(_.toDouble).toArray)
    }
    val q = all.find(_._1 == 1000L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val exact = all.filter(_._1 != 1000L)
      .map { case (id, e) => (id, cos(q, e)) }
      .sortBy { case (id, c) => (-c, id) }.take(20).map(_._1)
    val probed = Similarity.ivfProbe(spark, idx,
      Seq(Tuple1(all.find(_._1 == 1000L).get._2.map(_.toFloat).toSeq))
        .toDF("q_embedding")
        .select(col("q_embedding").cast("array<float>")
          .as("q_embedding")),
      queryId = 1000L, k = 20, np = 16)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(probed == exact,
      s"full-depth probe of the grown artifact != exact union top-k")
  }

  test("ivfDeltaAppend recalibrates IN the artifact: calib is rewritten " +
      "with delta-inclusive probes, calibratedNprobe re-reads it (memo " +
      "invalidated), and a structure-free delta behind a clustered base " +
      "RAISES the depth and recommends rebuild once even the worst-case " +
      "ratio cannot hold the floor") {
    import spark.implicits._
    val base = embCorpus(256, clusters = 8, seed = 41)
    val baseDir = writeEmb(base)
    val idx = Similarity.buildIvfFrom(spark, s"$baseDir|r15recal",
      spark.read.parquet(s"$baseDir/embeddings.parquet"), nlist = 16)
    val npBase = Similarity.calibratedNprobe(spark, idx)
    // a clustered base calibrates shallow — the premise of the test
    assert(npBase <= Similarity.autoNprobe(16),
      s"clustered base calibrated to $npBase, deeper than the fallback")
    // the delta is structure-free: the frozen clustered centroids do
    // not model it, so its true neighbors scatter across cells
    val delta = embCorpus(256, clusters = 0, seed = 42, idOffset = 5000L)
    val res = Similarity.ivfDeltaAppend(spark, idx,
      delta.toDF("vec_id", "embedding", "label")
        .select(col("vec_id"), col("embedding").cast("array<float>")
          .as("embedding"), col("label")))
    assert(res.nprobeBefore == npBase)
    assert(res.nprobeAfter > npBase,
      s"unmodeled delta did not deepen the probe " +
        s"(${res.nprobeBefore} -> ${res.nprobeAfter})")
    // the memo was invalidated: the resolved depth IS the stored one
    assert(Similarity.calibratedNprobe(spark, idx) == res.nprobeAfter)
    val calib = spark.read.parquet(s"$idx/calib").head()
    assert(calib.getAs[Int]("nprobe") == res.nprobeAfter)
    assert(calib.getAs[Int]("n_queries") == Similarity.IvfCalibQueries)
    // and the floor held at the re-resolved depth (full depth = exact,
    // so it is always reachable)
    assert(res.recall >= Similarity.IvfRecallFloor)
    // rebuild recommended iff the depth exceeded the worst-case ratio
    assert(res.rebuildRecommended ==
      (res.nprobeAfter > Similarity.autoNprobe(16)))
  }

  test("pqDeltaAppend: appended codes are the frozen-codebook argmin " +
      "(checked independently against the codebook parquet), and the " +
      "chained-gate threshold re-derives from the delta-inclusive " +
      "floor with the memo invalidated") {
    import spark.implicits._
    val base = embCorpus(256, clusters = 8, seed = 51)
    val baseDir = writeEmb(base)
    val root = ProductQuant.pqDir(spark, baseDir)
    val floorBefore = spark.read.parquet(s"$root/calib").head()
      .getAs[Double]("adc_self_floor")
    val tauPreBefore = ProductQuant.chainTauPre(spark, root)
    // structure-free delta quantizes WORSE against clustered codebooks
    val delta = embCorpus(64, clusters = 0, seed = 52, idOffset = 9000L)
    val deltaDf = delta.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"), col("label"))
    val res = ProductQuant.pqDeltaAppend(spark, root, deltaDf)
    assert(res.added == 64L)
    assert(res.floorBefore == floorBefore)
    assert(res.floorAfter <= floorBefore)
    assert(math.abs(res.tauPreAfter -
      ProductQuant.ChainTauPreMargin * res.floorAfter) < 1e-12)
    // memo invalidated: the resolved threshold is the re-measured one
    assert(ProductQuant.chainTauPre(spark, root) == res.tauPreAfter)
    assert(res.tauPreAfter <= tauPreBefore)
    // appended codes == frozen-codebook argmin, verified independently
    val books = spark.read.parquet(s"$root/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val bySub = books.groupBy(_._1)
    val m = bySub.keys.max + 1
    val dsub = books.head._3.length
    val codes = spark.read.parquet(s"$root/codes")
      .filter(col("vec_id") >= 9000L).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 64)
    delta.foreach { case (id, e, _) =>
      val want = (0 until m).map { j =>
        val sub = e.slice(j * dsub, (j + 1) * dsub).map(_.toDouble)
        bySub(j).map { case (_, code, ctr) =>
          (ctr.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum,
            code)
        }.min._2
      }
      assert(codes(id) == want, s"delta row $id codes mismatch")
    }
  }

  // ---- calibratedNprobe fallback discipline -------------------------------

  test("calibratedNprobe falls back to the fixed ratio ONLY for a " +
      "missing calib table; an unreadable one PROPAGATES instead of " +
      "memoizing a silent downgrade (ADVICE r14)") {
    import spark.implicits._
    val idx = java.nio.file.Files
      .createTempDirectory("r15-ivf-nocalib").toString
    Seq((0, Seq(0.0, 0.0)), (1, Seq(1.0, 1.0)), (2, Seq(2.0, 2.0)),
      (3, Seq(3.0, 3.0)), (4, Seq(4.0, 4.0)), (5, Seq(5.0, 5.0)),
      (6, Seq(6.0, 6.0)), (7, Seq(7.0, 7.0)))
      .toDF("cell", "centroid").coalesce(1)
      .write.parquet(s"$idx/centroids")
    // no calib/ → the documented pre-r14-artifact fallback
    assert(Similarity.calibratedNprobe(spark, idx) ==
      Similarity.autoNprobe(8))
    // corrupt calib/ → the read failure must propagate, not memoize
    val idx2 = java.nio.file.Files
      .createTempDirectory("r15-ivf-badcalib").toString
    spark.read.parquet(s"$idx/centroids").write
      .parquet(s"$idx2/centroids")
    val calibDir = new java.io.File(s"$idx2/calib")
    assert(calibDir.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$idx2/calib/part-00000.parquet"),
      "not a parquet file".getBytes("UTF-8")): Unit
    intercept[Exception] {
      Similarity.calibratedNprobe(spark, idx2): Unit
    }
  }

  // ---- MoneyDec2: the fast money cast is value-identical ------------------

  test("MoneyDec2 equals cast(double as decimal(p,2)) on EVERY money " +
      "column the q-family reads, and the 2-decimal precondition holds " +
      "(r15 — the built-in cast's per-row Double.toString+BigDecimal " +
      "parse was the dominant CPU of the relational aggregates)") {
    import graft.functions.Expressions.moneyDec2
    val cols: Seq[(String, String, Int)] = Seq(
      ("lineitem", "l_extendedprice", 12), ("lineitem", "l_discount", 4),
      ("lineitem", "l_quantity", 12), ("orders", "o_totalprice", 18),
      ("part", "p_retailprice", 12), ("events", "value", 18))
    for (sfd <- Seq("sf0.001", "sf0.01"); (tbl, c, p) <- cols) {
      val df =
        if (tbl == "events") graft.sources.EventsTable.load(spark, sf(sfd))
        else spark.read.parquet(s"${sf(sfd)}/$tbl.parquet")
      val r = df.select(
        sum(when(moneyDec2(col(c), p) =!=
          col(c).cast(s"decimal($p,2)"), 1).otherwise(0)).as("diff"),
        max(abs(col(c) * 100 - round(col(c) * 100))).as("maxerr"),
        count(lit(1)).as("n")).head()
      assert(r.getLong(0) == 0L, s"$sfd/$tbl.$c: ${r.getLong(0)} of " +
        s"${r.getLong(2)} rows differ from the built-in cast")
      assert(r.getDouble(1) < 1e-6,
        s"$sfd/$tbl.$c: 2-decimal precondition violated (${r.getDouble(1)})")
    }
    // edge contract: NaN/Infinity/overflow → NULL (the non-ANSI cast shape)
    import spark.implicits._
    val edges = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e18, -1e18).toDF("v")
      .select(moneyDec2(col("v"), 12).as("d"))
    assert(edges.filter(col("d").isNotNull).count() == 0)
    // and the derived (1 - discount) double used by q15 matches too
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val dd = li.select(
      sum(when(moneyDec2(lit(1) - col("l_discount"), 4) =!=
        (lit(1) - col("l_discount")).cast("decimal(4,2)"), 1)
        .otherwise(0)).as("diff")).head()
    assert(dd.getLong(0) == 0L)
  }

  test("l_quantity is exactly INTEGRAL on every fixture SF (ADVICE r15: " +
      "q9's cast('long') truncates toward zero where the old " +
      "decimal(4,0) cast rounded HALF_UP — equivalent only when every " +
      "quantity is a whole number, which the 2-decimal MoneyDec2 " +
      "precondition alone does not pin)") {
    for (sfd <- Seq("sf0.001", "sf0.01")) {
      val r = spark.read.parquet(s"${sf(sfd)}/lineitem.parquet")
        .agg(max(abs(col("l_quantity") - round(col("l_quantity"))))
          .as("maxfrac"), count(lit(1))).head()
      assert(r.getDouble(0) == 0.0,
        s"$sfd: l_quantity carries a fractional part (${r.getDouble(0)})")
    }
  }
}
