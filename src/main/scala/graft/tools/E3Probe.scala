package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, SkewSafe}
import graft.functions.Expressions.cosineF

/** Scratch A/B probe for the e3 kNN-join candidate exchange. Not on any
  * gate path — run with `sbt "runMain graft.tools.E3Probe [sfDir]"`.
  *
  * Hypothesis: the (table_id, bucket) candidate join currently carries a
  * 256-byte embedding on BOTH sides, with the left side exploded
  * ×(nPlanes+1) Hamming-1 probes and everything ×nTables — so each
  * vector's embedding crosses the candidate exchange ~36+4 times. LATE
  * MATERIALIZATION joins IDs only (16-byte rows), dedups the pair set,
  * and re-attaches the two embeddings via two narrow id-keyed joins —
  * each embedding crosses an exchange O(1) times regardless of probe
  * fan-out. Output must be bit-identical.
  */
object E3Probe {

  private def probeBuckets(nPlanes: Int) = array(
    (Seq(col("bucket")) ++ (0 until nPlanes).map(i =>
      col("bucket").bitwiseXOR(lit(1L << i)))): _*)

  def knnJoinVariant(s: SparkSession, dir: String, variant: String,
      k: Int = 3, nPlanes: Int = 8, nTables: Int = 4): DataFrame =
    variant match {
      case "late" => Similarity.knnJoin(s, dir, k, nPlanes,
        hamming1Probes = true, nTables = nTables)
      case "auto" => Similarity.knnJoin(s, dir, k, nPlanes = 0,
        hamming1Probes = true, nTables = nTables)
      case "base" =>
        // the pre-r10s3 shape: embeddings ride through the candidate
        // exchange on both sides, distinct runs on (pair, cosine)
        val b = Similarity.lshBucketsMulti(s, dir, nPlanes, nTables)
        val l = b.select(col("vec_id").as("src_id"),
          col("embedding").as("src_emb"), col("table_id"),
          explode(probeBuckets(nPlanes)).as("bucket"))
        val r = b.select(col("vec_id").as("nb_id"),
          col("embedding").as("nb_emb"), col("table_id"), col("bucket"))
        val cand = SkewSafe.cappedEquiJoin(l, r, Seq("table_id", "bucket"),
            xxhash64(col("nb_id")), cap = 1024)
          .filter(col("src_id") =!= col("nb_id"))
          .select(col("src_id"), col("nb_id"),
            cosineF(col("src_emb"), col("nb_emb")).as("cosine"))
          .distinct()
        graft.plans.TopKPerGroup.topK(cand, Seq("src_id"), "cosine", k,
          desc = true, tiebreakCols = Seq("nb_id"))
      case other =>
        sys.error(s"unknown variant '$other' (expected base|late|auto)")
    }

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // At-scale probes: shuffle partitions sized independently of thread
    // count (a cluster raises partitions, not per-task memory)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val order = if (args.length > 1) args.drop(1).toSeq
      else Seq("base", "late", "base", "late", "base", "late")
    for (v <- order) {
      val t0 = System.nanoTime()
      knnJoinVariant(spark, dir, v)
        .write.mode("overwrite").format("noop").save()
      println(f"[e3probe] $v ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    if (args.length <= 1) {
      val base = knnJoinVariant(spark, dir, "base")
      val late = knnJoinVariant(spark, dir, "late")
      // exceptAll both ways = exact multiset equality
      val extra = base.exceptAll(late).count()
      val missing = late.exceptAll(base).count()
      println(s"[e3probe] equivalence: only_in_base=$extra " +
        s"only_in_late=$missing " +
        (if (extra == 0 && missing == 0) "IDENTICAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
