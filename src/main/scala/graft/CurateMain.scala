package graft

import org.apache.spark.sql.SparkSession

/** Runnable composed curation pipeline: gates → redact → exact dedup →
  * near-dup prune → decontaminate → pack, printing one JSON line of
  * per-stage (docs, tokens) metrics and optionally writing the packed
  * corpus.
  *
  * Usage: runMain graft.CurateMain <sfDir> [outDir]
  */
object CurateMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val (packed, metrics) = graft.ext.CuratePipeline.curate(spark, sfDir)
    outDir.foreach(d => packed.write.mode("overwrite").parquet(d))
    if (outDir.isEmpty) packed.write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    val stages = metrics.map(m =>
      s""""${m.stage}":{"docs":${m.docs},"tokens":${m.tokens}}""")
      .mkString(",")
    println(f"""{"metric":"curate","sec":$secs%.2f,$stages,"sf":"$sfDir"}""")
    spark.stop()
  }
}
