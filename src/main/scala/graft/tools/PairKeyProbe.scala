package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.Dedup

/** Scratch A/B probe for the d3/d7 compact join keys (fold
  * (lang, source, h|fp) into one xxhash64 long before the candidate
  * exchanges). Not on any gate path — run with
  * `sbt "runMain graft.tools.PairKeyProbe [sfDir]"`.
  */
object PairKeyProbe {

  def variant(s: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "d3_str"  => Dedup.prefixJaccardPairs(s, dir, k = 3,
        jaccardMin = 0.4, compactKeys = false)
      case "d3_ckey" => Dedup.prefixJaccardPairs(s, dir, k = 3,
        jaccardMin = 0.4, compactKeys = true)
      case "d7_str"  => Dedup.winnowPairs(s, dir, k = 3, w = 8,
        jaccardMin = 0.4, compactKeys = false)
      case "d7_ckey" => Dedup.winnowPairs(s, dir, k = 3, w = 8,
        jaccardMin = 0.4, compactKeys = true)
      case other => sys.error(
        s"unknown variant '$other' (expected d3_str|d3_ckey|d7_str|d7_ckey)")
    }

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
    val order = if (args.length > 1) args.drop(1).toSeq
      else Seq("d3_str", "d3_ckey", "d7_str", "d7_ckey",
        "d3_str", "d3_ckey", "d7_str", "d7_ckey",
        "d3_str", "d3_ckey", "d7_str", "d7_ckey")
    for (v <- order) {
      val t0 = System.nanoTime()
      variant(spark, dir, v).write.mode("overwrite").format("noop").save()
      println(f"[pairkey] $v ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    for (q <- Seq("d3", "d7") if args.length <= 1) {
      val a = variant(spark, dir, s"${q}_str")
      val b = variant(spark, dir, s"${q}_ckey")
      // exceptAll both ways = exact multiset equality
      val extra = a.exceptAll(b).count()
      val missing = b.exceptAll(a).count()
      println(s"[pairkey] $q equivalence: only_in_str=$extra " +
        s"only_in_ckey=$missing " +
        (if (extra == 0 && missing == 0) "IDENTICAL" else "MISMATCH"))
    }
    spark.stop()
  }
}
