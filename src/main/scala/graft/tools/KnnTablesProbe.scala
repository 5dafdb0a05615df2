package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the OR-depth calibration curve (reachability@10 vs table
  * count) for one or more corpora — the measurement behind
  * [[graft.ext.Similarity.resolveKnnTables]].
  *
  * Usage: runMain graft.tools.KnnTablesProbe <sfDir> [<sfDir> ...]
  */
object KnnTablesProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001")
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      val (t, curve) = graft.ext.Similarity.calibrateKnnTables(spark, d)
      println(s"""{"metric":"knn_tables_curve","sf_dir":"$d",""" +
        s""""chosen":$t,"curve":[${curve.map(v => f"$v%.3f")
          .mkString(",")}],""" +
        f""""sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    spark.stop()
  }
}
