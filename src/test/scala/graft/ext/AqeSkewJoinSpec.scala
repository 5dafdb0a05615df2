package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins SCALING.md's "AQE handles skew" claim for fact⋈fact joins: on a
  * deliberately skewed build (one key carrying ~100× the median), AQE's
  * OptimizeSkewedJoin must SPLIT the hot partition — visible as
  * `skew=true` on the SortMergeJoin in the final plan — and the result
  * must equal the unskewed-planner result. SkewSafe.saltedSum covers
  * deterministic aggregation skew; this covers the join side Spark owns.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true) with exact rows") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // coalescing would merge the small partitions back below the
      // factor threshold before the skew check sees them
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 is hot: 50k of 60k fact rows; 100 cold keys share the rest
      val fact = spark.range(60000).select(
        when(col("id") < 50000, 0L).otherwise(col("id") % 100 + 1)
          .as("k"),
        col("id").as("v"),
        // pad so the hot partition clears the byte threshold
        lpad(lit("x"), 64, "x").as("pad"))
      val dim = (0L to 100L).map(k => (k, s"dim_$k")).toDF("k", "name")
      // global agg only: a per-key groupBy above the join would REQUIRE
      // hash distribution on k, and OptimizeSkewedJoin (correctly)
      // refuses to split when that adds a shuffle; the partial agg of a
      // global aggregate imposes no distribution, so the split is legal
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      // collect(), not head(): head() runs a separate limit-wrapped
      // query and would leave THIS plan unexecuted (isFinalPlan=false)
      val r = joined.collect().head
      // exact expectation, computed without a join (every k has a match)
      val e = fact.agg(count(lit(1)), sum("v")).collect().head
      assert(r.getLong(0) == e.getLong(0) && r.getLong(1) == e.getLong(1))
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
