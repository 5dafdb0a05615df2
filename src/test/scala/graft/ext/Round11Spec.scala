package graft.ext

import graft.SparkSpec

class Round11Spec extends SparkSpec {

  test("g2/labelProp is self-managing: edge cache released, at most the " +
      "result checkpoint stays pinned — WITHOUT a clearCache fallback") {
    val dir = sf("sf0.001")
    def pinnedIds() = spark.sparkContext.getPersistentRDDs.keySet
    val before = pinnedIds()
    val got = Graph.labelProp(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // unpersist is async; give it a bounded window, but NO clearCache —
    // the managed path must release its own edge cache (the r10 leak
    // specs needed the cached-frames exclusion exactly because it
    // didn't; this pins the fix)
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leakedNow(): Int = (pinnedIds() -- before).size
    var leaked = leakedNow()
    while (leaked > 1 && System.nanoTime() < deadline) {
      Thread.sleep(200)
      leaked = leakedNow()
    }
    val names = (pinnedIds() -- before).flatMap(id =>
      spark.sparkContext.getPersistentRDDs.get(id).map(r =>
        s"$id:${r.name}"))
    assert(leaked <= 1,
      s"$leaked RDDs still pinned after managed labelProp: $names")
  }

  test("managed and lazy labelProp agree exactly") {
    val dir = sf("sf0.001")
    val managed = Graph.labelProp(spark, dir, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lazyRun = Graph.labelProp(spark, dir, iters = 3, managed = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(managed == lazyRun)
  }
}
