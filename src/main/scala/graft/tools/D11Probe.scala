package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch A/B: d11 dupSpans with 8-byte gram-hash shuffle keys vs
  * literal gram strings. `sbt "runMain graft.tools.D11Probe [sfDir]"`.
  */
object D11Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (hash <- Seq(false, true, false, true, false, true)) {
      val t0 = System.nanoTime()
      graft.ext.Dedup.dupSpans(spark, dir, k = 25, hashKeys = hash)
        .write.mode("overwrite").format("noop").save()
      println(f"[d11probe] hash=$hash ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
