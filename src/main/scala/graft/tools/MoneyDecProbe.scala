package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe: isolates the double→decimal(p,2) cast cost inside a q1-shaped
  * aggregate — built-in cast (Double.toString + BigDecimal parse per row)
  * vs MoneyDec2 (Math.round, long-backed Decimal) vs a plain double sum
  * (the no-decimal floor). Dev tool.
  *
  * Usage: sbt "runMain graft.tools.MoneyDecProbe [sfDir]"
  */
object MoneyDecProbe {
  def main(args: Array[String]): Unit = {
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
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[mdec] $tag ${ts.map(t => f"$t%.3f").mkString(" ")} " +
        f"min=${ts.min}%.3f")
    }
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_extendedprice", "l_discount", "l_returnflag",
        "l_linestatus")
    import graft.functions.Expressions.moneyDec2
    time("scan only (count)      ") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
    }
    time("double sums            ") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_extendedprice")).as("s1"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("s2"))
    }
    time("builtin cast dec sums  ") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("s1"),
          sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") -
              col("l_discount").cast("decimal(4,2)"))).as("s2"))
    }
    time("MoneyDec2 dec sums     ") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(moneyDec2(col("l_extendedprice"), 12)).as("s1"),
          sum(moneyDec2(col("l_extendedprice"), 12) *
            (lit(1).cast("decimal(4,2)") -
              moneyDec2(col("l_discount"), 4))).as("s2"))
    }
    spark.stop()
  }
}
