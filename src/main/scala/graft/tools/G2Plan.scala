package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe for the g2 label-prop loop shape (dev tool):
  * lazy vs checkpointed vs persisted edge set, shuffle vs broadcast
  * label join. The r10s5 numbers in Graph.labelProp's comment come
  * from this main.
  */
object G2Plan extends App {
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
  def rounds(edges: DataFrame, bc: Boolean): DataFrame = {
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to 3) {
      val l = labels.select(col("node").as("src"), col("label"))
      labels = edges.join(if (bc) broadcast(l) else l, "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).cast("long").as("label"))
    }
    labels
  }
  def time(tag: String)(f: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    f.write.mode("overwrite").format("noop").save()
    println(f"[g2ab] $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
  }
  for (i <- 1 to 2) {
    time(s"lazy-shuffle  $i") { rounds(coOrderEdges(), bc = false) }
    time(s"lazy-bcast    $i") { rounds(coOrderEdges(), bc = true) }
    time(s"ckpt-bcast    $i") { rounds(coOrderEdges().localCheckpoint(true), bc = true) }
    time(s"ckpt-shuffle  $i") { rounds(coOrderEdges().localCheckpoint(true), bc = false) }
    time(s"persist-bcast $i") {
      val e = coOrderEdges().persist(); e.count(); rounds(e, bc = true) }
  }
  spark.stop()
}
