package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Clustered-embedding corpus generator (r14): the driver fixtures'
  * embeddings are near-random Gaussians — the WORST case for an IVF
  * index (recall tracks the scanned fraction almost linearly, so the
  * calibrated probe depth stays high). Real embedding corpora are
  * heavily clustered (that is the premise of IVF), so measuring the
  * streaming IVF-PQ gate only on the fixture understates it by
  * construction (VERDICT r13 item 1's "generate one" note).
  *
  * This derives a corpus from an existing one: `documents.parquet` is
  * copied verbatim (the text gates see identical work); embeddings are
  * regenerated as `nClusters` seeded-Gaussian centers + small noise,
  * same (vec_id, label, embedding) schema, same row count, same dim.
  * All randomness is java.util.Random seeded from (seed, vec_id) —
  * deterministic across runs.
  *
  * Usage: runMain graft.tools.ClusteredCorpusGen <outDir> [srcDir]
  *   [nClusters] [noise]
  */
object ClusteredCorpusGen {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/scaledata/clu0.01")
    val srcDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val nClusters = args.lift(2).map(_.toInt).getOrElse(50)
    val noise = args.lift(3).map(_.toDouble).getOrElse(0.05)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.read.parquet(s"$srcDir/documents.parquet")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val dim = src.select(size(col("embedding"))).head().getInt(0)
    val ids = src.select("vec_id").as[Long].collect().sorted
    val seed = 0xC1_05_7E_4EDL
    val centers = {
      val r = new java.util.Random(seed)
      IndexedSeq.fill(nClusters)(Array.fill(dim)(r.nextGaussian().toFloat))
    }
    val rows = ids.toIndexedSeq.map { id =>
      val r = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
      val c = centers((id % nClusters).toInt)
      val e = c.map(x => x + (noise * r.nextGaussian()).toFloat)
      (id, s"c${(id % nClusters).toInt}", e.toSeq)
    }
    rows.toDF("vec_id", "label", "embedding")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<float>").as("embedding"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    println(s"[clugen] wrote $outDir: ${ids.length} vectors, " +
      s"$nClusters clusters, dim=$dim, noise=$noise (from $srcDir)")
    spark.stop()
  }
}
