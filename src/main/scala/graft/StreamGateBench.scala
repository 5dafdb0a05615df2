package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.{StreamDedup, StreamNearDup, StreamSemDedup}

/** Ingest-gate throughput bench (VERDICT r7 item / r9): N documents
  * through the full dedup gate chain vs the same stream ungated, so the
  * gates' cost is a measured delta, not a guess.
  *
  * Pipeline shape (the production ingest layout):
  *   1. EXACT gate — `dropDuplicatesWithinWatermark` on the content
  *      fingerprint, a streaming STATEFUL op inside the query;
  *   2. NEAR-DUP gate — SimHash band join against the static corpus,
  *      executed per epoch inside foreachBatch as a left_anti;
  *   3. SEMANTIC gate — nearest-cell cosine match against the clustering
  *      artifact, also a per-epoch stream-static left_anti.
  * (2)+(3) live in foreachBatch because their DROP decision needs an
  * anti-join against the match set derived from the same stream — legal
  * on the epoch's batch frame, a stream-stream join otherwise.
  *
  * Input mix is deterministic: ~1/4 verbatim corpus texts (near-dup
  * fodder), ~1/8 exact repeats of an earlier synthetic row (exact-gate
  * fodder), the rest unique synthetic text; embeddings cycle the corpus
  * vectors, so the semantic gate sees everything that survives (1)+(2).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StreamGateBench
  * [nDocs] [batchSize]" — prints ONE JSON line with gate-on and
  * gate-off docs/sec plus per-gate drop counts.
  */
object StreamGateBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val batchSize = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // the gate joins run as per-epoch BATCH jobs inside foreachBatch:
      // AQE coalesces their 32-way shuffles down to the epoch's actual
      // data size (a 2000-row epoch does not want 32-task exchanges);
      // the streaming stateful plan itself ignores AQE
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // State/shuffle partitions sized to the EPOCH volume, not the core
    // count — the r9 sweep's dominant finding (380 → 955 docs/s from
    // 32 → 8 state partitions at 2k epochs). Env-overridable for sweeps.
    // toIntOption + floor clamp: a typo'd or non-positive override must
    // not kill the run before any measurement (nor set 0 partitions)
    val stateParts = sys.env.get("SPARK_GRAFT_STATE_PARTITIONS")
      .flatMap(_.toIntOption).map(math.max(1, _)) match {
      case Some(v) =>
        spark.conf.set("spark.sql.shuffle.partitions", v); v
      case None => graft.stream.StreamTuning
        .sizeShufflePartitionsForEpoch(spark, batchSize)
    }

    // FIXTURE-ONLY driver collect: the sf0.01 corpus (20k texts +
    // embeddings) is materialized on the driver purely to FEED
    // MemoryStream, which only accepts driver-side data. A production
    // ingest never does this — the stream arrives from a real source
    // (file/Kafka) and the static gate sides below stay distributed.
    // Do not copy this shape into an ingest path.
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").as[String].collect()
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").as[Array[Float]].collect()
    val t0 = 1717200000000L
    // deterministic mix: i%4==0 verbatim corpus text (near-dup fodder);
    // i%8==5 exact repeat of row i-2's text (exact-gate fodder; row i-2
    // has (i-2)%8==3 and (i-2)%4==2, so it really carried the synthetic
    // formula being repeated); else unique synthetic.
    // Embeddings: i%5==0 verbatim corpus vector (semantic-gate fodder);
    // else a two-vector blend (cosine to either parent well below the
    // 0.9 gate threshold).
    def blend(a: Array[Float], b: Array[Float]): Array[Float] =
      a.zip(b).map { case (x, y) => (x + y) / 2 }
    val rows: IndexedSeq[(Long, String, Array[Float], java.sql.Timestamp)] =
      (0 until n).map { i =>
        val text =
          if (i % 8 == 5) s"synthetic document nr ${i - 2} with body " +
            s"token${(i - 2) % 977}"
          else if (i % 4 == 0) texts(i % texts.length)
          else s"synthetic document nr $i with body token${i % 977}"
        val emb =
          if (i % 5 == 0) embs(i % embs.length)
          else blend(embs(i % embs.length), embs((i + 7) % embs.length))
        (100000L + i, text, emb, new java.sql.Timestamp(t0 + i * 1000L))
      }

    // static gate sides: built ONCE, persisted, reused every epoch (the
    // production layout — re-deriving them per epoch re-scans the corpus)
    val corpusBands = StreamNearDup.corpusBands(spark, dir).persist()
    corpusBands.count()
    val semArt = {
      val a = StreamSemDedup.artifact(spark, dir)
      a.copy(corpus = a.corpus.persist())
    }
    semArt.corpus.count()

    // gate 0.5 (r11): the stateless DSIR target-likeness gate, frozen
    // from the corpus once (the production epoch-artifact layout). The
    // floor is the 10th percentile of the generated mix's own scores so
    // the gate exercises real per-row work without starving the
    // stateful gates downstream (the synthetic texts are out-of-corpus,
    // so a corpus-percentile floor would drop nearly everything).
    val dsirBuckets = 1024
    val dsirModel = graft.stream.StreamDsir.freezeModel(spark, dir,
      col("lang") === "en", dsirBuckets)
    val dsirFloor = spark.createDataset(rows.map(_._2)).toDF("text")
      .select(graft.ext.TextAnalysis.dsirScoreCol(
        dsirModel, dsirBuckets, "text").cast("double").as("sc"))
      .stat.approxQuantile("sc", Array(0.1), 0.0).head.toLong

    def run(gates: Boolean): (Double, Long, Long, Long, Long) = {
      val mem = MemoryStream[(Long, String, Array[Float], java.sql.Timestamp)](
        1)(implicitly, spark.sqlContext)
      val df = mem.toDF().toDF("doc_id", "text", "embedding", "event_ts")
      val admitted = new java.util.concurrent.atomic.AtomicLong
      val inExact = new java.util.concurrent.atomic.AtomicLong
      val afterNear = new java.util.concurrent.atomic.AtomicLong
      // gate 0 (r10s5): the stateless quality gate in front of the
      // stateful chain — minWords relaxed to 5 because the synthetic
      // fixture rows are 7 words (production keeps Gopher's 30); its
      // cost rides inside the gates-on throughput number
      val gated = if (gates)
        StreamDedup.exactWithinWatermark(
          graft.stream.StreamDsir.dsirGate(
            graft.stream.StreamQuality.qualityGate(df, minWords = 5),
            dsirModel, dsirBuckets, dsirFloor))
      else df
      val q = gated.writeStream
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory("sgb-ckpt").toString)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!gates) admitted.addAndGet(batch.count()): Unit
          else {
            // ONE action per epoch: annotate each exact-admitted row with
            // its near-dup / semantic hit flags and aggregate the three
            // counts in a single job. (A row is admitted iff neither gate
            // hits — identical admission set to the chained anti-joins,
            // without 4 per-epoch actions whose plan compilation was the
            // dominant cost at small epochs.)
            val ndIds = StreamNearDup.matchesAgainst(batch, corpusBands)
              .select(col("in_id").as("doc_id")).distinct()
              .withColumn("nd", lit(1))
            val semIds = StreamSemDedup.matchesAgainst(
                batch.select(col("doc_id").as("vec_id"), col("embedding")),
                semArt, tau = 0.9)
              .select(col("in_id").as("doc_id")).distinct()
              .withColumn("sm", lit(1))
            val r = batch.join(ndIds, Seq("doc_id"), "left")
              .join(semIds, Seq("doc_id"), "left")
              .agg(count(lit(1)),
                sum(when(col("nd").isNull, 1L).otherwise(0L)),
                sum(when(col("nd").isNull && col("sm").isNull, 1L)
                  .otherwise(0L)))
              .head()
            inExact.addAndGet(r.getLong(0))
            afterNear.addAndGet(if (r.isNullAt(1)) 0L else r.getLong(1))
            admitted.addAndGet(if (r.isNullAt(2)) 0L else r.getLong(2)): Unit
          }
        }.start()
      val start = System.nanoTime()
      try {
        rows.grouped(batchSize).foreach { b =>
          mem.addData(b: _*)
          q.processAllAvailable()
        }
      } finally q.stop()
      val sec = (System.nanoTime() - start) / 1e9
      (sec, admitted.get(), inExact.get(), afterNear.get(), n.toLong)
    }

    val (offSec, offAdmitted, _, _, _) = run(gates = false)
    val (onSec, onAdmitted, exactOut, nearOut, _) = run(gates = true)

    // nprobe recall/latency sweep for the semantic gate (r10): the whole
    // corpus arrives as one epoch-shaped batch at the DEFAULT tau=0.35
    // (the bench's tau=0.9 yields zero cross-cell pairs on this corpus,
    // so it cannot exercise nprobe). Ground truth = nprobe=k, which
    // probes every cell and is brute-force equivalent; recall counts
    // distinct non-self (in_id, corpus_id) matches.
    val sweepTau = 0.35
    val selfCorpus = semArt.corpus
      .select(col("corpus_id").as("vec_id"), col("embedding"))
    def sweep(np: Int): (Long, Double) = {
      val t = System.nanoTime()
      val found = StreamSemDedup.matchesAgainst(selfCorpus, semArt,
          tau = sweepTau, nprobe = np)
        .filter(col("in_id") =!= col("corpus_id"))
        .select("in_id", "corpus_id").distinct().count()
      (found, (System.nanoTime() - t) / 1e9)
    }
    val k = semArt.centroids.length
    val (truth, _) = sweep(k)
    val probeJson = Seq(1, 2, 4).map { np =>
      val (found, sec) = sweep(np)
      val recall = if (truth == 0) 1.0 else found.toDouble / truth
      s""""nprobe_$np":{"recall":${f"$recall%.3f"},"sec":${f"$sec%.2f"}}"""
    }.mkString(",")

    // IVF-PQ gate (r13): the same ingest question answered through the
    // 8-byte-per-vector PQ code table instead of the float corpus —
    // the memory-bound artifact a production gate holds. Measured as an
    // epoch-shaped batch through the SAME function the stream runs
    // (StreamIvfPqSpec pins stream ≡ batch), at the auto probe depth.
    val pqArt = {
      val a = graft.stream.StreamIvfPq.artifact(spark, dir)
      a.copy(codes = a.codes.persist())
    }
    pqArt.codes.count()
    val pqStream = spark.createDataset(rows.map(r => (r._1, r._3)))
      .toDF("vec_id", "embedding")
    val pqT0 = System.nanoTime()
    val pqMatched = graft.stream.StreamIvfPq
      .matchesAgainst(pqStream, pqArt, tau = 0.9)
      .select("in_id").distinct().count()
    val pqSec = (System.nanoTime() - pqT0) / 1e9
    val pqJson =
      s""""ivfpq_gate":{"docs_per_sec":${(n / pqSec).round},""" +
      s""""sec":${f"$pqSec%.2f"},"matched":$pqMatched,""" +
      s""""nlist":${pqArt.centroids.length},""" +
      s""""nprobe":${pqArt.nprobeCalib}}"""

    // trained-classifier gate (r14): the fastText-style scorer distilled
    // offline from the corpus's Gopher labels, served through the same
    // stateless per-row fold as the DSIR gate (one integer sum, no
    // state, no shuffle) — measured one-shot on the generated stream.
    // The artifact build (16 capped-slice logistic steps) happens before
    // the clock starts: it is the offline epoch job, not serving cost.
    val qcW = graft.ext.QualityClassifier.frozenWeights(spark, dir)
    val qcStream = spark.createDataset(rows.map(r => (r._1, r._2)))
      .toDF("doc_id", "text")
    val qcT0 = System.nanoTime()
    val qcKept = graft.ext.QualityClassifier.classifierGate(qcStream, qcW)
      .count()
    val qcSec = (System.nanoTime() - qcT0) / 1e9
    val qcJson =
      s""""qc_gate":{"docs_per_sec":${(n / qcSec).round},""" +
      s""""sec":${f"$qcSec%.2f"},"admitted":$qcKept}"""

    // trained lang-id gate (r15): K-class argmax routing (the CCNet
    // language filter) served as a stateless K-fold projection — the
    // qc gate's shape with per-class weights; training is the offline
    // epoch job, not serving cost. The driver fixture's lang labels
    // are text-INDEPENDENT (LangClassifierSpec pins learnability on a
    // signal corpus instead), so a fixed keep-class can be one the
    // model routes nothing to; keep the model's own majority route on
    // this mix so the measured filter demonstrably admits AND drops
    // (the probe job runs before the clock).
    val (lcW, lcClasses) = graft.ext.LangClassifier.frozenModel(spark, dir)
    val lcMajority = graft.ext.LangClassifier
      .withPredictedLang(qcStream, lcW, lcClasses)
      .groupBy("pred_lang").count()
      .orderBy(col("count").desc, col("pred_lang")).limit(1)
      .collect().head.getString(0)
    val lcT0 = System.nanoTime()
    val lcKept = graft.ext.LangClassifier.langGate(qcStream, lcW, lcClasses,
      keep = Set(lcMajority)).count()
    val lcSec = (System.nanoTime() - lcT0) / 1e9
    val lcJson =
      s""""langid_gate":{"docs_per_sec":${(n / lcSec).round},""" +
      s""""sec":${f"$lcSec%.2f"},"admitted":$lcKept,""" +
      s""""keep":"$lcMajority","k":${lcClasses.size}}"""

    // frozen-benchmark decontamination gate (r15): the GPT-3/Gopher
    // n-gram admission rule — per-row binary search of each doc shingle
    // into the sorted benchmark-gram literal. Artifact is
    // O(benchmark), frozen before the clock (the eval set changes at
    // benchmark epochs, not per batch); serving is stateless.
    val (_, ctGrams) = graft.ext.Decontam.frozenEval(spark, dir)
    val ctT0 = System.nanoTime()
    val ctKept = graft.stream.StreamDecontam.decontamGate(qcStream, ctGrams)
      .count()
    val ctSec = (System.nanoTime() - ctT0) / 1e9
    val ctJson =
      s""""decontam_gate":{"docs_per_sec":${(n / ctSec).round},""" +
      s""""sec":${f"$ctSec%.2f"},"admitted":$ctKept,""" +
      s""""eval_grams":${ctGrams.length}}"""

    // chained IVF-PQ → exact-verify gate (r14): PQ prefilter at the x20
    // threshold, exact-cosine confirm at the semantic gate's tau=0.9 —
    // the x15 shortlist-verify pattern streamed. Float I/O is O(prefilter
    // matches); StreamIvfPqSpec pins the match set identical to
    // exact-verifying every probed-cell member.
    val corpusEmb = spark.read.parquet(s"$dir/embeddings.parquet")
      .persist()
    corpusEmb.count()
    val chT0 = System.nanoTime()
    val chMatched = graft.stream.StreamIvfPq
      .chainedMatches(pqStream, pqArt, corpusEmb, tau = 0.9)
      .select("in_id").distinct().count()
    val chSec = (System.nanoTime() - chT0) / 1e9
    val chJson =
      s""""ivfpq_chained_gate":{"docs_per_sec":${(n / chSec).round},""" +
      s""""sec":${f"$chSec%.2f"},"matched":$chMatched,""" +
      s""""tau":0.9,"tau_pre":${f"${pqArt.tauPreCalib}%.4f"}}"""

    println(s"""{"metric":"stream_gate_docs_per_sec",""" +
      s""""value":${(n / onSec).round},"docs":$n,"batch_size":$batchSize,""" +
      s""""state_partitions":$stateParts,""" +
      s""""gates_on_sec":${f"$onSec%.1f"},"gates_off_sec":${f"$offSec%.1f"},""" +
      s""""off_docs_per_sec":${(n / offSec).round},""" +
      s""""exact_admitted":$exactOut,"neardup_admitted":$nearOut,""" +
      s""""fully_admitted":$onAdmitted,"ungated_admitted":$offAdmitted,""" +
      s""""sem_probe_tau":$sweepTau,"sem_probe_truth_pairs":$truth,""" +
      s""""dsir_floor_micro":$dsirFloor,""" +
      s"""$probeJson,$pqJson,$chJson,$qcJson,$lcJson,$ctJson,""" +
      s""""sf_dir":"$dir"}""")
    spark.stop()
  }
}
