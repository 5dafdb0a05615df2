package graft

import org.apache.spark.sql.functions._

/** The engine is reachable from pure SQL: register the corpus as temp
  * views and run inventory queries as SQL text (the spark.sql front-end —
  * what a reference user typing SQL would hit).
  */
class SqlSurfaceSpec extends SparkSpec {

  test("inventory queries run via spark.sql over registered views") {
    val dir = sf("sf0.001")
    Seq("lineitem", "orders", "customer").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
    val q1 = spark.sql(
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
               count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""").collect()
    assert(q1.length == 6)
    val j = spark.sql(
      """SELECT c_mktsegment, count(*) AS n FROM orders
         JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment""")
      .collect()
    assert(j.map(_.getLong(1)).sum == 1500)
    // SQL and DataFrame produce identical results for the same query
    val sqlRes = spark.sql("SELECT sum(l_quantity) FROM lineitem").collect()(0).getDouble(0)
    val dfRes = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(sum("l_quantity")).collect()(0).getDouble(0)
    assert(sqlRes == dfRes)
  }

  test("driver contract wiring: oracles reference declared queries only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    val orphans = os -- qs
    assert(orphans.isEmpty,
      s"oracleSql keys with no queries entry (the driver would never run " +
      s"them): ${orphans.mkString(", ")}")
    // every declared query must resolve and build a plan at sf0.001
    // (catches a renamed column or a bad table reference at test time,
    // not in the driver's correctness run)
    val dir = sf("sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, s"$name produced an empty schema")
    }
  }
}
