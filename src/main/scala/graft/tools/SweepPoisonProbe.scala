package graft.tools

import org.apache.spark.sql.SparkSession

/** Bisects the r13 in-sweep slowdown: queries measured 4-18x slower
  * inside the whole-surface sf10 sweep than standalone (ct1 181.6 s
  * in-sweep vs 11.4 s in TimeOne, same corpus, same CPUS/SHUFFLE/heap).
  * The sweep JVM differs from TimeOne's in ONE pre-query step: Bench
  * builds the IVF index artifact (auto nlist ~ sqrt(200k) = 448 at
  * sf10) before the first timed query. This probe times a fast query,
  * builds the index, drops leaked blocks the way Bench does, and times
  * the same query again — if run-2 regresses, the index build is the
  * poison and the fix belongs in the build (or the hygiene), not the
  * queries.
  *
  * Usage: tools/jrun.sh graft.tools.SweepPoisonProbe <sfDir> [query]
  */
object SweepPoisonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/scaledata/sf10")
    val name = args.lift(1).getOrElse("ct1_contamination")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "24")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "1024")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    def dropLeakedBlocks(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def once(tag: String): Unit = {
      dropLeakedBlocks()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[poison] $tag $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    once("pre-index ")
    val t0 = System.nanoTime()
    graft.ext.Similarity.ivfIndexDir(spark, sfDir)
    println(f"[poison] index-build ${(System.nanoTime() - t0) / 1e9}%.2f s")
    once("post-index")
    once("post-index2")
    spark.stop()
  }
}
