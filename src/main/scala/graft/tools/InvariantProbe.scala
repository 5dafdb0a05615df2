package graft.tools

import org.apache.spark.sql.SparkSession

/** Run named SparkEntry queries and print ROW COUNTS (r14): Bench times
  * queries but never counts them, so a recall-floor invariant (which
  * emits violation rows on failure) can "pass" a scale sweep silently.
  * This is the missing assertion for running invariants at sf10+, where
  * the Verify+DuckDB gate doesn't reach.
  *
  * Usage: runMain graft.tools.InvariantProbe <nameRegex> [sfDir]
  */
object InvariantProbe {
  def main(args: Array[String]): Unit = {
    val pat = args.headOption.getOrElse("^(x4r|x19r|e3r)").r
    val dir = args.lift(1).getOrElse("/root/repo/scaledata/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "1024"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => pat.findFirstIn(n).isDefined }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        val out = try {
          val rows = fn(spark, dir).count()
          val inv = graft.SparkEntry.invariantQueries(name)
          val verdict =
            if (!inv) "rows"
            else if (rows == 0L) "CLEAN"
            else "VIOLATIONS"
          s""""$name":{"rows":$rows,"kind":"$verdict",""" +
            f""""sec":${(System.nanoTime() - t0) / 1e9}%.1f}"""
        } catch { case e: Throwable =>
          s""""$name":{"error":"${Option(e.getMessage).getOrElse("")
            .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120)}"}"""
        }
        System.err.println(s"[invprobe] $out")
        out
      }
    println(s"""{"metric":"invariant_probe","sf_dir":"$dir",""" +
      results.mkString(",") + "}")
    spark.stop()
  }
}
