package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe: the gate fixture is ONE parquet row group per table, so
  * every scan stage runs its decode + partial-agg on one task of a
  * 32-core box (StageProbe: q1's scan stage = 0.78 s CPU on 1 task of
  * 1.0 s total). Does redistributing rows before the aggregate pay at
  * gate scale, and what does it cost at sf1 (multi-file)? Dev tool.
  */
object ScanParProbe extends App {
  val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  spark.range(1000000).selectExpr("sum(id)").collect()
  def time(tag: String)(f: => DataFrame): Unit = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[scanpar] $tag ${ts.map(t => f"$t%.2f").mkString(" ")} " +
      f"min=${ts.min}%.2f")
  }
  val li = spark.read.parquet(s"$dir/lineitem.parquet")
  def agg(df: DataFrame): DataFrame = {
    val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    df.groupBy("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }
  time("q1ish as-is   ") { agg(li) }
  time("q1ish repart  ") {
    agg(li.repartition(spark.sparkContext.defaultParallelism)) }
  time("q1ish as-is  2") { agg(li) }
  time("q1ish repart 2") {
    agg(li.repartition(spark.sparkContext.defaultParallelism)) }
  spark.stop()
}
