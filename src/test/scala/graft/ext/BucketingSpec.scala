package graft.ext

import graft.SparkSpec

/** Pins the bucketed-join claim: same rows as the shuffle join, and the
  * ONLY exchange in the plan is the final aggregate's — the join reads
  * both bucketed tables co-partitioned and merges in place. Assertions
  * are over the executed-plan string because AQE wraps the tree in
  * query stages that a node-type collect does not traverse.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join agg equals the shuffle join agg row-for-row") {
    val d = sf("sf0.001")
    val got = Bucketing.bucketedJoinAgg(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.queries.CoreQueries.j2ShuffleJoinAgg(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("the join is exchange-free: one shuffle total, both scans bucketed") {
    val df = Bucketing.bucketedJoinAgg(spark, sf("sf0.001"))
    df.collect() // materialize so AQE finalizes the plan
    // keep only the final-plan section — the string also embeds the
    // "Initial Plan", which would double every marker count
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
    assert("Bucketed: true".r.findAllIn(plan).size == 2,
      s"both sides must read bucketed:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1,
      s"only the final aggregate may shuffle, got $exchanges:\n$plan")
    // and that one exchange is the aggregate's, not a join input's
    assert(plan.contains("Exchange hashpartitioning(c_mktsegment"),
      s"the surviving exchange must be the agg's:\n$plan")
  }
}
