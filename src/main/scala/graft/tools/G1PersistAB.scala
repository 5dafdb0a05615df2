package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B: g1's lazy unrolled loop vs persisting the
  * loop-invariant edge set (the r10s5 g2 finding — AQE never
  * ReuseExchange's identical subtrees across rounds, so lazy re-runs
  * the co-order build per round). Dev tool.
  */
object G1PersistAB extends App {
  val dir = args.headOption.getOrElse("/root/repo/scaledata/sf1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")

  // delegate to the PRODUCTION edge builder so the probe can
  // never drift from the shipped loop input
  def coOrderEdges(): DataFrame =
    graft.ext.Graph.coOrderEdges(spark, dir)
  def prB(edges: DataFrame): DataFrame = {
    // g2-style: broadcast the node-sized sides so the persisted edge
    // table is only scanned, never shuffled, per round
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var prDf = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      val in = edges.join(broadcast(deg), "src")
        .join(broadcast(prDf.withColumnRenamed("node", "src")), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("in_pr"))
      prDf = deg.select(col("src").as("node"))
        .join(in, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    prDf
  }
  def pr(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    var prDf = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      val in = edges.join(deg, "src")
        .join(prDf.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst").agg(sum(col("share")).as("in_pr"))
      prDf = deg.select(col("src").as("node"))
        .join(in, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    prDf
  }
  def time(tag: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.mode("overwrite").format("noop").save()
    println(f"[g1ab] $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }
  for (i <- 1 to 3) {
    time(s"lazy          $i") { pr(coOrderEdges()) }
    time(s"persist       $i") { val e = coOrderEdges().persist(); pr(e) }
    time(s"persist-bcast $i") { val e = coOrderEdges().persist(); prB(e) }
    time(s"lazy-bcast    $i") { prB(coOrderEdges()) }
  }
  spark.stop()
}
