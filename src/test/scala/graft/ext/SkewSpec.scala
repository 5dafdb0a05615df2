package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  test("salted two-phase sum equals plain groupBy sum") {
    val e = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .select(col("user_id"), col("event_id"),
        col("value").cast("decimal(18,2)").as("v"))
    val salted = SkewSafe.saltedSum(e, col("user_id"), col("v"),
      col("event_id"), salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val plain = e.groupBy("user_id").agg(sum("v").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    assert(salted == plain)
  }
}
