package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{ProductQuant, Similarity}
import graft.functions.Expressions.cosineF

/** Sampled ANN recall at the corpus's AUTO-RESOLVED geometry (r14,
  * VERDICT r13 item 2): the sf10 sweep rightly skipped the O(n²)
  * recall invariants, which meant x4/e3/x19's floors had never been
  * MEASURED where autoPlanes / auto-nlist / calibrated-nprobe actually
  * resolve at 100× the gate corpus. Exact ground truth for `nq` sampled
  * queries is ONE linear scan (broadcast query side + the bounded-heap
  * top-k — the cosineTopK shape), not O(n²), so this runs anywhere.
  *
  * Prints one JSON line: resolved geometry (planes, nlist, nprobe —
  * including the artifact's calibrated depth and its stored build-time
  * recall) plus pooled recall@k vs the exact scan for
  *   - x4  annTopK        (multi-table Hamming-1-probed LSH),
  *   - e3  knnJoin        (the full kNN join, sampled sources),
  *   - x19 ivfPqTopK      (IVF probe → ADC shortlist → exact re-rank).
  *
  * Usage: runMain graft.tools.AnnRecallProbe [sfDir] [nq] [k]
  */
object AnnRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/scaledata/sf10")
    val nq = args.lift(1).map(_.toInt).getOrElse(10)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()

    // exact ground truth: one scan for all nq queries
    val qs = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("src_id"), col("embedding").as("q_emb"))
    val exactCand = emb.select(col("vec_id").as("nb_id"), col("embedding"))
      .join(broadcast(qs), col("nb_id") =!= col("src_id"))
      .select(col("src_id"), col("nb_id"),
        cosineF(col("embedding"), col("q_emb")).as("cosine"))
    val exact = graft.plans.TopKPerGroup.topK(exactCand, Seq("src_id"),
      "cosine", k, desc = true, tiebreakCols = Seq("nb_id"))
      .select("src_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(got: Set[(Long, Long)]): Double =
      if (exact.isEmpty) 1.0
      else exact.count(got.contains).toDouble / exact.size

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // a shortlist-sweep run is an x19-focused measurement: skip the
    // (expensive, already-measured) x4/e3 passes
    val sweepOnly = args.lift(3).isDefined

    // x4: per-query ANN top-k at the auto plane count
    val (x4Got, x4Sec) = if (sweepOnly) (Set.empty[(Long, Long)], 0.0)
    else timed {
      (0L until nq.toLong).flatMap { qid =>
        Similarity.annTopK(spark, dir, queryId = qid, k = k)
          .select("vec_id").collect().map(r => (qid, r.getLong(0)))
      }.toSet
    }

    // x19: per-query composed IVF-PQ at the calibrated probe depth.
    // Optional shortlist sweep (args(3) = comma list, 0 = the default):
    // ONE JVM, one index build, recall per shortlist — for sizing the
    // ADC shortlist against the probed-candidate volume.
    val shortlists = args.lift(3)
      .map(_.split(',').map(_.toInt).toSeq).getOrElse(Seq(0))
    val x19Runs = shortlists.map { sl =>
      val (got, sec) = timed {
        (0L until nq.toLong).flatMap { qid =>
          (if (sl > 0)
            ProductQuant.ivfPqTopK(spark, dir, queryId = qid, k = k,
              shortlist = sl)
          else ProductQuant.ivfPqTopK(spark, dir, queryId = qid, k = k))
            .select("vec_id").collect().map(r => (qid, r.getLong(0)))
        }.toSet
      }
      (sl, got, sec)
    }
    val (x19Got, x19Sec) = (x19Runs.head._2, x19Runs.head._3)

    // e3: the full kNN join (its own k — the operator's production
    // shape), recall over the sampled sources against exact top-that-k
    val e3k = 3
    val exactE3 = graft.plans.TopKPerGroup.topK(exactCand, Seq("src_id"),
      "cosine", e3k, desc = true, tiebreakCols = Seq("nb_id"))
      .select("src_id", "nb_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (e3Got, e3Sec) = if (sweepOnly) (Set.empty[(Long, Long)], 0.0)
    else timed {
      Similarity.knnJoinArtifact(spark, dir, k = e3k)
        .filter(col("src_id") < nq)
        .select("src_id", "nb_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val e3Recall = if (exactE3.isEmpty) 1.0
      else exactE3.count(e3Got.contains).toDouble / exactE3.size

    val planes = Similarity.autoPlanes(n)
    val idx = Similarity.ivfIndexDir(spark, dir)
    val calib = spark.read.parquet(s"$idx/calib").head()
    println(
      s"""{"metric":"ann_recall_at_resolved_geometry","sf_dir":"$dir",""" +
      s""""n_vectors":$n,"n_queries":$nq,"k":$k,""" +
      s""""auto_planes":$planes,"nlist":${calib.getAs[Int]("nlist")},""" +
      s""""nprobe_calibrated":${calib.getAs[Int]("nprobe")},""" +
      f""""calib_recall":${calib.getAs[Double]("recall")}%.3f,""" +
      f""""x4_recall":${recallOf(x4Got)}%.3f,"x4_sec":$x4Sec%.1f,""" +
      f""""x19_recall":${recallOf(x19Got)}%.3f,"x19_sec":$x19Sec%.1f,""" +
      s""""x19_shortlist_sweep":{${x19Runs.map { case (sl, got, sec) =>
        f""""$sl":{"recall":${recallOf(got)}%.3f,"sec":$sec%.1f}"""
      }.mkString(",")}},""" +
      f""""e3_recall":$e3Recall%.3f,"e3_k":$e3k,"e3_sec":$e3Sec%.1f}""")
    spark.stop()
  }
}
