package graft.tools

import org.apache.spark.sql.SparkSession

/** sf10 mitigation probe for the d3 prefix-filter set-similarity join:
  * the default (k=3, jaccardMin=0.4) dies on single-node shuffle
  * scratch at sf10 (SCALING.md); this measures the DOCUMENTED knob —
  * stricter threshold / longer grams → shorter prefixes → fewer
  * candidate rows — to show the wall is a parameter, not a plan flaw.
  * Usage: runMain graft.tools.D3Sf10Probe <dir> <k> <jaccardMin>
  */
object D3Sf10Probe extends App {
  val dir = args(0)
  val k = args(1).toInt
  val jmin = args(2).toDouble
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  val t0 = System.nanoTime()
  val n = graft.ext.Dedup.prefixJaccardPairs(spark, dir, k, jmin).count()
  println(f"[d3probe] k=$k jmin=$jmin pairs=$n " +
    f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
  spark.stop()
}
