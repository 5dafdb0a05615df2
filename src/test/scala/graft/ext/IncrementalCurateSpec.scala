package graft.ext

import graft.SparkSpec

/** The id1 invariant lifted to the WHOLE pipeline: under the epoch
  * policy (keep-earliest, corpus-fit centroids, frozen eval slice),
  * admitting a shard incrementally against the corpus artifacts equals
  * the full epoch-policy recompute row-for-row.
  */
class IncrementalCurateSpec extends SparkSpec {

  test("curateDelta ∪ corpus run ≡ curateFrozen full recompute on the " +
      "sf0.01 80/20 split, and the delta does strictly less work") {
    val dir = sf("sf0.01")
    val splitId = 400L
    val state = CuratePipeline.corpusState(spark, dir, splitId)
    val (delta, deltaCounts) = CuratePipeline.curateDelta(spark, dir, state)
    val (full, fullCounts) = CuratePipeline.curateFrozen(spark, dir, splitId)

    val union = state.prevFinal.unionByName(delta)
      .collect().map(_.toString).sorted.toSeq
    val fullRows = full.collect().map(_.toString).sorted.toSeq
    assert(union.size == union.distinct.size, "epochs overlap")
    assert(union == fullRows,
      s"incremental ∪ previous != full: union=${union.size} " +
        s"full=${fullRows.size}")

    // non-vacuity: the shard admitted some docs AND rejected some at
    // each pipeline mechanism the composition exercises
    val byStage = deltaCounts.map(c => c.stage -> c.docs).toMap
    assert(byStage("decontaminated") > 0, "delta admitted nothing")
    assert(byStage("decontaminated") < byStage("raw"),
      "delta rejected nothing — equivalence is vacuous")
    assert(byStage("near_dedup") < byStage("exact_dedup"),
      "no shard doc was near-dup-rejected against corpus or shard")
    assert(byStage("semantic_dedup") < byStage("near_dedup"),
      "no shard doc was semantically rejected")

    // the full epoch-policy run shrank too (sanity on the reference)
    val fullBy = fullCounts.map(c => c.stage -> c.docs).toMap
    assert(fullBy("decontaminated") ==
      state.prevFinal.count() + byStage("decontaminated"))
  }
}
