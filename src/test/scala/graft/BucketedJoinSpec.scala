package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: both sides bucketed on the join key at write
  * time → the join plan contains NO shuffle exchange. This is the 100 TB
  * lever for repeated fact-fact joins (SCALING.md "Joins") — pay the
  * bucketing once at ingest, join for free afterwards.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join over bucketed tables plans without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — warehouse.dir
    // is a static conf and cannot be set after session creation
    // disable broadcast so a non-bucketed join WOULD need a shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = sf("sf0.001")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      spark.read.parquet(s"$dir/customer.parquet")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.sparkPlan // pre-AQE: real operators
      def shufflesBelowJoin(p: org.apache.spark.sql.execution.SparkPlan): Int =
        p.collect { case e: ShuffleExchangeExec => e }.size
      // one exchange allowed for the final groupBy; the JOIN itself must
      // not shuffle — total exchanges in the whole plan <= 1
      val nShuffles = shufflesBelowJoin(plan)
      assert(nShuffles <= 1,
        s"bucketed join should not shuffle its inputs; found $nShuffles exchanges:\n$plan")
      assert(joined.collect().map(_.getLong(1)).sum == 1500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
