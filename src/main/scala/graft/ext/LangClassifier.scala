package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Expressions.fnv1a64

/** Trained multi-class language identifier (r15, VERDICT r14 item 5) —
  * the fastText lang-id shape (Joulin et al. 2016, public; the model
  * family CCNet and every production curation pipeline use for
  * language routing): hashed bag-of-words features, K per-class linear
  * scorers, softmax training, argmax serving. `t3_lang_guess` stays as
  * the zero-training heuristic; this is the LEARNED replacement,
  * trained on the corpus's own `lang` labels (supervised — unlike
  * [[QualityClassifier]]'s weak-supervision bootstrap, the reference
  * label here ships with the data).
  *
  * Engine-exactness is the [[QualityClassifier]] discipline verbatim:
  *   - features are fnv1a64(token) % [[Buckets]] — the same hash+bucket
  *     the DSIR/qc1 operators use, replayed in DuckDB by the
  *     x9-validated SQL emulation;
  *   - weights are integer MICRO-units, one dense vector per class plus
  *     a per-class BIAS (priors matter when token evidence is thin);
  *     the serving score for class c is the INTEGER
  *     score_c = Σ_t w_c[b(t)] + n · bias_c, and because every class
  *     divides by the same 1e6·n, argmax over the integer scores IS
  *     argmax over the mean-pooled margins — no float leaves the
  *     engine, ties break to the smallest class index;
  *   - training quantizes each token's/doc's gradient contribution to
  *     micro BEFORE the cross-partition sums, so the fitted weights are
  *     bit-identical under any partitioning.
  *
  * Scale shape: one projection computes all K margins (K folds through
  * one weight literal), softmax and the per-class gradient factors ride
  * the same row, and ONE explode→groupBy pass collects the
  * ≤ K·(Buckets+1)-row gradient — per step, over the capped training
  * slice only (the [[QualityClassifier.MaxTrainDocs]] discipline, so
  * 100 TB training is a bounded offline job). Serving is map-only.
  */
object LangClassifier {

  val Buckets = 1024
  val Iters = 16
  val Eta = 8.0
  /** Per-class weight stride: `Buckets` token buckets + 1 bias slot. */
  val Stride: Long = Buckets.toLong + 1L

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** The flat-key weight map as an ARRAY literal (the qc1 r15 lesson:
    * a map literal's element_at linearly scans all K·Stride entries
    * per lookup — measured 250 s for lc1's K=5 serving pass at sf10;
    * the keys are dense by construction, so the O(1) array index is
    * bit-identical).
    */
  private def wArrLit(w: Map[Long, Long], k: Int): Column =
    typedLit((0L until k * Stride).map(i => w.getOrElse(i, 0L)))

  /** The per-class integer score as ONE column:
    * score_c = Σ_t w[c·Stride + b(t)] + n · w[c·Stride + Buckets].
    * Shared by serving, training, and the streaming gate. `wLit` is
    * [[wArrLit]]'s flat array literal (1-based element_at).
    */
  private def scoreColFor(wLit: Column, c: Int, textCol: String): Column = {
    val toks = split(col(textCol), " ")
    val n = size(toks).cast("long")
    val base = aggregate(toks, lit(0L), (acc, t) =>
      acc + element_at(wLit,
        (lit(c * Stride + 1L) +
          pmod(fnv1a64(t), lit(Buckets.toLong))).cast("int")))
    base + n * element_at(wLit, lit((c * Stride + Buckets + 1L).toInt))
  }

  /** Argmax over the K integer scores, ties to the SMALLEST class
    * index. The scores ride ONE unconditional array;
    * `array_position(scores, array_max(scores))` returns the FIRST
    * index attaining the max — the same strictly-greater-replacement
    * semantics as a fold, integer-exact. Unconditional matters: the
    * previous when-chain nested the accumulated struct in BOTH
    * branches, so whether class c's fold evaluated once or
    * O(2^(K-c)) times rested on codegen's conditional subexpression
    * elimination catching it; the array form is evaluate-once by
    * construction (measured neutral at sf10 — lc1 is
    * training-dominated — but no longer CSE-dependent).
    */
  private def predCol(wLit: Column, classes: IndexedSeq[String],
      textCol: String): (Column, Column) = {
    val scores = array(classes.indices.map(c =>
      scoreColFor(wLit, c, textCol)): _*)
    val best = array_max(scores)
    val lang = element_at(typedLit(classes),
      array_position(scores, best).cast("int"))
    (lang, best)
  }

  /** Training slice: the [[QualityClassifier]] sampling discipline —
    * deterministic 1-in-[[QualityClassifier.SliceMod]] by doc_id, hash-
    * thinned to ≤ [[QualityClassifier.MaxTrainDocs]] rows; the label is
    * the corpus `lang` as an index into the sorted class list.
    */
  private def labeled(s: SparkSession, dir: String,
      classes: IndexedSeq[String]): DataFrame = {
    val mod = QualityClassifier.SliceMod
    val sliceRows = docs(s, dir)
      .filter(pmod(col("doc_id"), lit(mod)) === 0).count()
    val thin = math.max(1L,
      math.ceil(sliceRows.toDouble / QualityClassifier.MaxTrainDocs).toLong)
    val idxMap = typedLit(classes.zipWithIndex.map {
      case (l, i) => l -> i
    }.toMap)
    docs(s, dir)
      .filter(pmod(col("doc_id"), lit(mod)) === 0 &&
        pmod(xxhash64(col("doc_id")), lit(thin)) === 0)
      .select(col("doc_id"), col("text"),
        element_at(idxMap, col("lang")).as("y"))
  }

  /** One full-batch softmax step over `nDocs` slice docs. Per doc:
    * margins m_c = score_c / (1e6·n), p = softmax(m), and each token
    * occurrence contributes floor(1e6·η·(p_c − 1{y=c})/(n·D) + 0.5)
    * micro-units to bucket (c, b(t)) while the doc contributes
    * floor(1e6·η·(p_c − 1{y=c})/D + 0.5) to class c's bias. The 1/D is
    * the MEAN-gradient normalization: without it one step moves a
    * marker bucket tens of logits and the bias ±η per doc of class
    * imbalance — measured on the spec's signal corpus, the sum-gradient
    * blows past exp()'s range by iteration 3 and the argmax lands on
    * whichever class's bias diverged last. Quantization BEFORE the sums
    * keeps the update order-independent (the d4/ds1 discipline).
    */
  private def step(s: SparkSession, slice: DataFrame, k: Int,
      nDocs: Long, w: Map[Long, Long]): Map[Long, Long] = {
    val wLit = wArrLit(w, k)
    val n = size(split(col("text"), " ")).cast("long")
    val margins = (0 until k).map(c =>
      scoreColFor(wLit, c, "text").cast("double") / lit(1e6) /
        n.cast("double"))
    val exps = margins.map(m => exp(m))
    val denom = exps.reduce(_ + _)
    val gFactor = (0 until k).map { c =>
      exps(c) / denom -
        when(col("y") === c, lit(1.0)).otherwise(lit(0.0))
    }
    val gTokArr = array(gFactor.map(g =>
      floor(g * lit(Eta) / n.cast("double") / lit(nDocs.toDouble) *
        lit(1e6) + lit(0.5)).cast("long")): _*)
    val gBiasArr = array(gFactor.map(g =>
      floor(g * lit(Eta) / lit(nDocs.toDouble) * lit(1e6) + lit(0.5))
        .cast("long")): _*)
    val scored = slice.select(col("text"), gTokArr.as("gt"),
      gBiasArr.as("gb"))
    val tokRows = scored
      .select(explode(split(col("text"), " ")).as("tok"), col("gt"))
      .select(pmod(fnv1a64(col("tok")), lit(Buckets.toLong)).as("b"),
        posexplode(col("gt")).as(Seq("c", "g")))
      .select((col("c").cast("long") * Stride + col("b")).as("key"),
        col("g"))
    val biasRows = scored
      .select(posexplode(col("gb")).as(Seq("c", "g")))
      .select((col("c").cast("long") * Stride + lit(Buckets.toLong))
        .as("key"), col("g"))
    val grads = tokRows.unionByName(biasRows)
      .groupBy("key").agg(sum("g").as("g"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    w.map { case (key, v) => key -> (v - grads.getOrElse(key, 0L)) }
  }

  private val modelBuilt =
    CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, String]())

  /** Train (or reuse) the lang-id artifact for a corpus: `weights` —
    * dense (class, b, w_micro) with b = [[Buckets]] holding the bias —
    * and `classes` (class, lang), the sorted label vocabulary the
    * indices mean. Memoized per (dir, buckets, iters): the offline-
    * build stand-in, like qc1's.
    */
  def modelDir(s: SparkSession, dir: String): String =
    modelBuilt.computeIfAbsent(s"$dir|$Buckets|$Iters", _ => {
      import s.implicits._
      val classes = docs(s, dir).select("lang").distinct()
        .collect().map(_.getString(0)).sorted.toIndexedSeq
      require(classes.size >= 2, s"lang-id needs >= 2 classes in $dir")
      val slice = labeled(s, dir, classes)
      slice.persist()
      try {
        val nDocs = slice.count()
        var w: Map[Long, Long] =
          (0L until classes.size * Stride).map(_ -> 0L).toMap
        for (_ <- 0 until Iters)
          w = step(s, slice, classes.size, nDocs, w)
        val out =
          java.nio.file.Files.createTempDirectory("graft-langid").toString
        w.toSeq.sortBy(_._1)
          .map { case (key, v) =>
            ((key / Stride).toInt, key % Stride, v)
          }
          .toDF("class", "b", "w_micro").coalesce(1)
          .write.parquet(s"$out/weights")
        classes.zipWithIndex.map { case (l, c) => (c, l) }
          .toDF("class", "lang").coalesce(1)
          .write.parquet(s"$out/classes")
        Dedup.logRoute(s"langClassifier:$dir",
          s"trained $Iters softmax steps, k=${classes.size}",
          s"buckets=$Buckets eta=$Eta classes=${classes.mkString(",")}")
        out
      } finally { slice.unpersist(); () }
    })

  /** Frozen (flat-key weight map, sorted class list) for serving. */
  def frozenModel(s: SparkSession, dir: String)
      : (Map[Long, Long], IndexedSeq[String]) = {
    val md = modelDir(s, dir)
    val w = s.read.parquet(s"$md/weights").collect()
      .map(r => (r.getInt(0) * Stride + r.getLong(1)) -> r.getLong(2))
      .toMap
    val classes = s.read.parquet(s"$md/classes").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
      .map(_._2).toIndexedSeq
    (w, classes)
  }

  /** Predicted language for an arbitrary frame (stream or batch) with
    * frozen weights: the serving projection behind [[langGate]]/lc1,
    * exposed so callers can inspect the route distribution.
    */
  def withPredictedLang(df: DataFrame, w: Map[Long, Long],
      classes: IndexedSeq[String], textCol: String = "text",
      out: String = "pred_lang"): DataFrame = {
    require(w.size == classes.size * Stride,
      s"withPredictedLang: ${w.size} weights for ${classes.size} classes")
    val (pred, _) = predCol(wArrLit(w, classes.size), classes, textCol)
    df.withColumn(out, pred)
  }

  /** Stateless streaming language gate: admit docs whose PREDICTED
    * language is in `keep` — the CCNet routing move as an ingest
    * filter. Pure projection + filter; serves streams and batch frames
    * alike (stream ≡ batch by construction).
    */
  def langGate(stream: DataFrame, w: Map[Long, Long],
      classes: IndexedSeq[String], keep: Set[String],
      textCol: String = "text"): DataFrame = {
    require(w.size == classes.size * Stride,
      s"langGate: ${w.size} weights for ${classes.size} classes")
    val (pred, _) = predCol(wArrLit(w, classes.size), classes, textCol)
    stream.filter(pred.isin(keep.toSeq.map(lit(_)): _*))
  }

  /** lc1: predicted language for EVERY doc (train slice and held-out
    * alike) with the frozen weights — K folds per row, no join, no
    * shuffle. Output is integer-exact: pred_lang is the argmax class
    * (ties to the smallest index), score_micro its integer score.
    */
  def lc1LangPredictions(s: SparkSession, dir: String): DataFrame = {
    val (w, classes) = frozenModel(s, dir)
    recordedModelByDir.put(dir, modelDir(s, dir))
    val (pred, score) = predCol(wArrLit(w, classes.size), classes, "text")
    docs(s, dir).select(col("doc_id"), col("lang").as("labeled_lang"),
      pred.as("pred_lang"), score.as("score_micro"))
  }

  /** The model dir lc1 most recently scored each corpus with — the
    * per-dir-map discipline for the artifact-derived oracle.
    */
  private val recordedModelByDir =
    CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, String]())

  import scala.jdk.CollectionConverters._
  def recordedModels: Seq[String] =
    recordedModelByDir.values.asScala.toSeq.distinct
}
