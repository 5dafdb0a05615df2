package graft.ext

import graft.SparkSpec

/** Round-9 additions: convergence-mode PageRank. */
class Round9Spec extends SparkSpec {

  test("pageRankUntil at tight eps agrees with a long fixed-iteration " +
      "run and frees superseded checkpoint blocks") {
    val dir = sf("sf0.001")
    // Suites share one session and run concurrently, so the leak count
    // must ignore blocks pinned by OTHER suites: snapshot the pinned RDD
    // ids first, drop cached FRAMES before counting (clearCache
    // unpersists cache entries — e.g. g2's persisted edge table — but
    // checkpoint blocks survive it), and give the async unpersist
    // cleaner a bounded window.
    def pinnedIds() = spark.sparkContext.getPersistentRDDs.keySet
    val before = pinnedIds()
    val conv = Graph.pageRankUntil(spark, dir, epsMicro = 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only the final rank checkpoint may stay pinned (it backs the
    // returned frame); every superseded round + edges/deg must be freed
    // Poll WITHOUT touching other suites' caches; only if the window
    // expires do one clearCache (dropping concurrent cached frames from
    // the count — checkpoints survive it) before the final verdict, and
    // name the survivors so a real failure is diagnosable.
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    def leakedNow(): Int = (pinnedIds() -- before).size
    var leaked = leakedNow()
    while (leaked > 1 && System.nanoTime() < deadline) {
      Thread.sleep(200)
      leaked = leakedNow()
    }
    if (leaked > 1) {
      spark.sharedState.cacheManager.clearCache()
      Thread.sleep(500)
      leaked = leakedNow()
    }
    val names = (pinnedIds() -- before).flatMap(id =>
      spark.sparkContext.getPersistentRDDs.get(id).map(r =>
        s"$id:${r.name}"))
    assert(leaked <= 1, s"$leaked checkpoint RDDs still pinned: $names")
    // a 40-step unrolled power iteration is far past the integer
    // fixpoint; the converged loop must land on (essentially) the same
    // vector — identical nodes, per-node micro-PR within the eps mass
    val fixed = Graph.pageRank(spark, dir, iters = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv.keySet == fixed.keySet)
    val worst = conv.map { case (k, v) => math.abs(v - fixed(k)) }.max
    assert(worst <= 1000L, s"max per-node divergence $worst micro-PR")
    // non-vacuity: one iteration is NOT converged at this eps
    val one = Graph.pageRank(spark, dir, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(conv.map { case (k, v) => math.abs(v - one(k)) }.max > 1000L,
      "eps=1000 converged in one step — the agreement check is vacuous")
  }
}
