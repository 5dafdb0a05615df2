package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for the g1 PageRank edge build. Not on any gate
  * path — run with `sbt "runMain graft.tools.G1Probe [sfDir]"`.
  */
object G1Probe {
  def pageRankVariant(s: SparkSession, dir: String, variant: String,
      iters: Int = 3): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = variant match {
      case "base" =>
        li.alias("a").join(li.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
      case "half" =>
        // mine only src<dst, distinct on half the rows, mirror after
        val h = li.alias("a").join(li.alias("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        h.unionByName(h.select(col("dst").as("src"), col("src").as("dst")))
      case "set" =>
        // per-order distinct part set, pairs generated in-place
        val sets = li.groupBy("l_orderkey")
          .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
          .select(col("parts"))
        val h = sets
          .select(explode(col("parts")).as("src"), col("parts"))
          .select(col("src"), explode(col("parts")).as("dst"))
          .filter(col("src") < col("dst"))
          .distinct()
        h.unionByName(h.select(col("dst").as("src"), col("src").as("dst")))
    }
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = deg.select(col("src").as("node"), col("outdeg"))
    var pr = nodes.select(col("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val in = edges
        .join(deg, "src")
        .join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst")
        .agg(sum(col("share")).as("in_pr"))
      pr = nodes
        .join(in, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    pr.select(col("node").as("part_key"), col("pr").as("pr_micro"))
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
    for (v <- Seq("base", "half", "set", "base", "half", "set")) {
      val t0 = System.nanoTime()
      pageRankVariant(spark, dir, v)
        .write.mode("overwrite").format("noop").save()
      println(f"[g1probe] $v ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    // equivalence: all three must be bit-identical
    val base = pageRankVariant(spark, dir, "base")
    for (v <- Seq("half", "set")) {
      val d = pageRankVariant(spark, dir, v)
      val n = base.unionByName(d).distinct().count()
      val nb = base.count()
      println(s"[g1probe] equiv $v: union-distinct $n vs base $nb " +
        (if (n == nb) "OK" else "MISMATCH"))
    }
    spark.stop()
  }
}
