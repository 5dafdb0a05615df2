package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-11 scale probes (dev tool, not library surface): candidate
  * degree distributions and capped-vs-exact behavior for the d3/d7
  * exact-verify wall, and sf10 completion runs. Usage:
  *   sbt "runMain graft.tools.R11Probe <mode> <sfDir> [args...]"
  * modes: deg | d3 <cap> | d7 <cap>
  */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val dir = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_GRAFT_MEM", "48g"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    mode match {
      case "deg" =>
        val p = graft.ext.Dedup
          .prefixJaccardPairs(spark, dir, k = 3, jaccardMin = 0.4)
        val deg = p.select(col("doc_a").as("d"))
          .unionAll(p.select(col("doc_b").as("d")))
          .groupBy("d").count()
        println(s"[probe] d3 pairs=${p.count()} " +
          s"maxdeg=${deg.agg(max("count")).head.getLong(0)}")
        val w = graft.ext.Dedup.winnowPairs(spark, dir)
        val wdeg = w.select(col("doc_a").as("d"))
          .unionAll(w.select(col("doc_b").as("d")))
          .groupBy("d").count()
        println(s"[probe] d7 pairs=${w.count()} " +
          s"maxdeg=${wdeg.agg(max("count")).head.getLong(0)}")
      case "d3" =>
        val cap = args(2).toInt
        val t0 = System.nanoTime()
        val n = graft.ext.Dedup
          .prefixJaccardPairs(spark, dir, k = 3, jaccardMin = 0.4,
            candCap = cap)
          .count()
        println(s"[probe] d3 cap=$cap pairs=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case "d7" =>
        val cap = args(2).toInt
        val t0 = System.nanoTime()
        val n = graft.ext.Dedup.winnowPairs(spark, dir, candCap = cap)
          .count()
        println(s"[probe] d7 cap=$cap pairs=$n " +
          f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
