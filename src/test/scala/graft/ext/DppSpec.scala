package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dynamic partition pruning over a date-partitioned landing zone — the
  * runtime half of the data-skipping story (z-order covers file-level
  * min/max; DPP skips whole partitions based on a JOIN's dim-side filter
  * that static pruning cannot see). At 100 TB this is the difference
  * between scanning the full history and scanning the days a dimension
  * selects.
  */
class DppSpec extends SparkSpec {

  test("date-partitioned join prunes partitions from the dim-side filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val ev = graft.sources.EventsTable.load(spark, sf("sf0.01"))
      .withColumn("day", expr("unix_timestamp(ts) div 86400"))
    ev.write.partitionBy("day").mode("overwrite").parquet(s"$dir/events")

    val facts = spark.read.parquet(s"$dir/events")
    val allDays = ev.select("day").distinct().collect().map(_.getLong(0)).sorted
    assert(allDays.length > 3, s"need several day partitions, got ${allDays.length}")
    val picked = allDays.take(2)

    import spark.implicits._
    // dim carries a non-partition attribute the filter targets, so only
    // the JOIN (not a static pushdown) can restrict the fact scan
    val dim = allDays.map(d => (d, if (picked.contains(d)) "keep" else "drop"))
      .toSeq.toDF("day", "tag")
    dim.write.mode("overwrite").parquet(s"$dir/dim")
    val dimT = spark.read.parquet(s"$dir/dim")

    val joined = facts.join(dimT.filter(col("tag") === "keep"), Seq("day"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")

    val expected = ev.filter(col("day").isin(picked.toIndexedSeq: _*)).count()
    assert(joined.count() == expected)
  }
}
