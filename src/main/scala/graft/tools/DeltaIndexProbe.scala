package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{ProductQuant, Similarity}

/** Measures the incremental-maintenance crossover (r15, VERDICT r14
  * item 2 "Done" clause): what does admitting a small delta cost
  * through [[Similarity.ivfDeltaAppend]] / [[ProductQuant.pqDeltaAppend]]
  * versus re-paying the full index build over the union? Prints ONE
  * JSON line for SCALING.md.
  *
  * Usage: DeltaIndexProbe <sfDir> [deltaDenominator=100]
  * (delta = vec_id % den == 0, ~1/den of the corpus).
  */
object DeltaIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val den = if (args.length > 1) args(1).toLong else 100L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(pmod(col("vec_id"), lit(den)) =!= 0)
    val delta = e.filter(pmod(col("vec_id"), lit(den)) === 0)
    val (nBase, nDelta) = (base.count(), delta.count())
    val nlist = Similarity.autoNlist(nBase)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // full rebuild over the union (what the delta path avoids)
    val (_, tFull) = timed {
      Similarity.buildIvfFrom(spark, s"$sfDir|probe-full",
        e, Similarity.autoNlist(nBase + nDelta))
    }
    // base build (not part of the comparison — the production base
    // index already exists), then the incremental admit
    val idx = Similarity.buildIvfFrom(spark, s"$sfDir|probe-base",
      base, nlist)
    val (res, tDelta) = timed { Similarity.ivfDeltaAppend(spark, idx, delta) }

    // PQ: full fit over the union dir vs frozen-codebook delta encode.
    // The base-only artifact comes from a temp dir holding the base
    // slice (pqDir is corpus-dir-keyed).
    val baseDir = java.nio.file.Files
      .createTempDirectory("probe-pq-base").toString
    base.write.parquet(s"$baseDir/embeddings.parquet")
    val (_, tPqFull) = timed { ProductQuant.pqDir(spark, sfDir) }
    val root = ProductQuant.pqDir(spark, baseDir)
    val (_, tPqDelta) = timed { ProductQuant.pqDeltaAppend(spark, root, delta) }

    println(
      s"""{"metric":"delta_index_crossover","sf_dir":"$sfDir",""" +
      s""""n_base":$nBase,"n_delta":$nDelta,"nlist":$nlist,""" +
      s""""ivf_full_build_sec":${f"$tFull%.2f"},""" +
      s""""ivf_delta_append_sec":${f"$tDelta%.2f"},""" +
      s""""ivf_speedup":${f"${tFull / tDelta}%.1f"},""" +
      s""""pq_full_build_sec":${f"$tPqFull%.2f"},""" +
      s""""pq_delta_append_sec":${f"$tPqDelta%.2f"},""" +
      s""""pq_speedup":${f"${tPqFull / tPqDelta}%.1f"},""" +
      s""""nprobe_before":${res.nprobeBefore},""" +
      s""""nprobe_after":${res.nprobeAfter},""" +
      s""""recall":${f"${res.recall}%.3f"},""" +
      s""""rebuild_recommended":${res.rebuildRecommended}}""")
    spark.stop()
  }
}
