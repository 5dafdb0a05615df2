package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the auto-routing statistics (dev tool) that ground the r12
  * thresholds: per sf dir, the d3 prefix-token enumeration estimate
  * (Σ df·(df−1)/2 over the prefix-kept token table — what
  * Dedup.AutoEnumRowsMax gates), the winnow fingerprint analog, and the
  * graph clique stats (what Graph.AutoCliqueEdgesMax /
  * AutoOrderPartsMax gate). The numbers in those Scaladocs and
  * SCALING.md come from this main.
  */
object AutoRouteStats extends App {
  val dirs = if (args.nonEmpty) args.toSeq
    else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
      "/root/repo/scaledata/sf1", "/root/repo/scaledata/sf10")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  for (dir <- dirs) {
    val t0 = System.nanoTime()
    // the d3 shape: k=3, jaccardMin=0.4, default blocking — the SAME
    // token table the production router aggregates, reproduced via the
    // production path at candCap=0 (probe independence not needed; this
    // IS the statistic the router sees)
    val sh = graft.ext.Dedup.shingles(
        spark.read.parquet(s"$dir/documents.parquet"), 3)
      .select(col("doc_id"), col("lang"), col("source"),
        col("shingle_hashes"))
      .filter(col("lang").isNotNull && col("source").isNotNull)
    // prefix keep: rarest-first over df>1-joined order, rn <= n-floor(.4n)+1
    val tokE = sh.select(col("doc_id"),
        size(col("shingle_hashes")).cast("long").as("n"),
        col("lang"), col("source"),
        explode(col("shingle_hashes")).as("h"))
      .select(col("doc_id"), col("n"),
        xxhash64(col("lang"), col("source"), col("h")).as("h"))
    val dfreq = tokE.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1)
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    val kept = tokE.join(dfreq, Seq("h"), "left").na.fill(1L, Seq("df"))
      .withColumn("rn", row_number().over(byDoc.orderBy("df", "h")))
      .filter(col("rn") <= col("n") - floor(lit(0.4) * col("n")) + 1)
      .select("doc_id", "n", "h")
    val d3Est = graft.ext.Dedup.enumRowsEstimate(kept, "h")
    // the x3 statistic: MinHash band buckets at the gate shape
    // (k=5, 32 hashes, 8 bands)
    val sig = graft.ext.Dedup.minhashSignatures(
      graft.ext.Dedup.shingles(
        spark.read.parquet(s"$dir/documents.parquet"), 5), 32)
    val x3Banded = sig.select(col("doc_id"),
        explode(expr("transform(sequence(0, 7), " +
          "b -> struct(b AS band, slice(sig, b * 4 + 1, 4) AS key))"))
          .as("bk"))
      .select(col("doc_id"),
        xxhash64(col("bk.band"), col("bk.key")).as("h"))
    val x3Est = graft.ext.Dedup.enumRowsEstimate(x3Banded, "h")
    val (cliqueEst, maxM) = graft.ext.Graph.cliqueStats(spark, dir)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[autostats] $dir d3EnumRows=$d3Est%.3g " +
      f"x3BandRows=$x3Est%.3g " +
      f"cliqueHalfEdges=$cliqueEst%.3g maxOrderParts=$maxM probe=$secs%.1fs")
  }
  spark.stop()
}
