package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B probe for q21: dual countDistinct (Expand doubles the
  * pre-shuffle rows) vs a two-level aggregate (pre-agg on the natural
  * (orderkey, suppkey) key, then a plain count/sum roll-up — no Expand,
  * both shuffles map-side combined). Run with
  * `sbt "runMain graft.tools.Q21Probe [sfDir]"`.
  */
object Q21Probe {
  def variant(s: SparkSession, dir: String, which: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    which match {
      case "base" =>
        val rSupp = when(col("l_returnflag") === "R", col("l_suppkey"))
        li.groupBy("l_orderkey")
          .agg(countDistinct(col("l_suppkey")).as("n_supp"),
            countDistinct(rSupp).as("n_r"),
            min(rSupp).as("suppkey"))
          .filter(col("n_supp") >= 2 && col("n_r") === 1)
          .groupBy("suppkey")
          .agg(count(lit(1)).as("numwait"))
      case "twolevel" =>
        li.groupBy("l_orderkey", "l_suppkey")
          .agg(max(when(col("l_returnflag") === "R", lit(1L))
            .otherwise(lit(0L))).as("has_r"))
          .groupBy("l_orderkey")
          .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_r"),
            min(when(col("has_r") === 1L, col("l_suppkey"))).as("suppkey"))
          .filter(col("n_supp") >= 2 && col("n_r") === 1)
          .groupBy("suppkey")
          .agg(count(lit(1)).as("numwait"))
    }
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
    for (v <- Seq("base", "twolevel", "base", "twolevel", "base", "twolevel")) {
      val t0 = System.nanoTime()
      variant(spark, dir, v).write.mode("overwrite").format("noop").save()
      println(f"[q21probe] $v ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val a = variant(spark, dir, "base")
    val b = variant(spark, dir, "twolevel")
    val n = a.unionByName(b).distinct().count()
    val na = a.count()
    println(s"[q21probe] equiv: union-distinct $n vs base $na " +
      (if (n == na) "OK" else "MISMATCH"))
    spark.stop()
  }
}
