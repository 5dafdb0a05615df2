package graft.plans

import graft.SparkSpec

/** Whole-surface plan-waste guard: every SparkEntry query's physical
  * plan is scanned for the three operators that are usually shuffle or
  * row-count waste at 100 TB — Expand, CartesianProduct,
  * BroadcastNestedLoopJoin — and any occurrence outside the documented
  * allowlist fails with the query name. The allowlist is the point: each
  * entry is a DELIBERATE use (rollup/cube's own mechanism, 1-row
  * scalar-subquery broadcasts, brute-force verifiers), so a future edit
  * that sneaks an accidental Expand or an un-keyed join into any of the
  * other ~136 queries fails one readable test instead of surfacing as a
  * bench regression three rounds later.
  */
class PlanWasteSpec extends SparkSpec {

  // query -> operators it is ALLOWED to plan, with why
  private val allow: Map[String, Set[String]] = Map(
    // Expand IS the grouping-sets mechanism (one pass over the fact
    // table instead of one scan per aggregation level)
    "r1_rollup" -> Set("Expand"),
    "r2_cube" -> Set("Expand"),
    "r3_grouping_sets" -> Set("Expand"),
    // one-pass multi-NDV stats: documented trade (swap to HLL sketches
    // at real scale — see st1 Scaladoc); x1v is a gate verifier
    "st1_table_stats" -> Set("Expand"),
    "x1v_fingerprint_injective" -> Set("Expand"),
    // 1-row scalar-subquery broadcasts (global aggregate, query vector,
    // vocab total, date bounds, mix weights, thresholds): BNLJ over a
    // single broadcast row is the correct plan, not a scale risk
    "c5_temperature_mix" -> Set("BroadcastNestedLoopJoin"),
    "dq1_quality_checks" -> Set("BroadcastNestedLoopJoin"),
    "e1_cosine_topk" -> Set("BroadcastNestedLoopJoin"),
    "q11_important_parts" -> Set("BroadcastNestedLoopJoin"),
    "q22_idle_customers" -> Set("BroadcastNestedLoopJoin"),
    "rd1_rolling_distinct" -> Set("BroadcastNestedLoopJoin"),
    "t10_unigram_lm_score" -> Set("BroadcastNestedLoopJoin"),
    "ds1_dsir_weights" -> Set("BroadcastNestedLoopJoin"),
    // (ds2 needs no entry since r13: the hashed model is a frozen map
    // literal, so the scoring plan has no join at all)
    "ds3_dsir_resample" -> Set("BroadcastNestedLoopJoin"),
    "rrf1_hybrid_topk" -> Set("BroadcastNestedLoopJoin"),
    // eval-embedding broadcast (benchmarks ≪ train corpus): the
    // all-pairs scan against a tiny broadcast side IS the plan
    "ct2_semantic_contamination" -> Set("BroadcastNestedLoopJoin"),
    // (mmr1 needs no entry: its candidate/pair BNLJs run eagerly inside
    // bounded localCheckpoints — the returned plan is checkpoint scans)
    "t6v_packing_invariants" -> Set("BroadcastNestedLoopJoin"),
    // IVF probe: nearest-cells-per-query vs (nlist ≤ 32)-row centroid
    // table; bounded by construction
    "x8_ivf_topk" -> Set("BroadcastNestedLoopJoin"),
    // delta-maintained IVF probe: the same 1-row query-vector broadcast
    // crossJoin as x8 (ivfProbe is shared)
    "xd1_ivf_delta_topk" -> Set("BroadcastNestedLoopJoin"),
    "x8v_ivf_subset_exact" -> Set("BroadcastNestedLoopJoin"),
    "x15_pq_adc_topk" -> Set("BroadcastNestedLoopJoin"),
    // composed IVF-PQ: same 1-row query-vector broadcast as x8/x15 in
    // the final O(shortlist) re-rank; the ADC/member stages are keyed
    "x19_ivfpq_topk" -> Set("BroadcastNestedLoopJoin"),
    "x19r_ivfpq_recall" -> Set("BroadcastNestedLoopJoin"),
    // deliberately brute-force verifiers (ground truth for the
    // approximate operators; Bench reports them outside the operator set)
    "d8v_simhash_band_complete" -> Set("BroadcastNestedLoopJoin"),
    "e4v_kmeans_nearest" -> Set("BroadcastNestedLoopJoin"),
    "x4r_ann_recall" -> Set("BroadcastNestedLoopJoin"),
    "x4v_ann_scores_match_brute" -> Set("BroadcastNestedLoopJoin"),
    "x15r_pq_recall" -> Set("BroadcastNestedLoopJoin"))

  private val flags = Seq("Expand", "CartesianProduct",
    "BroadcastNestedLoopJoin")

  test("no query plans Expand/cartesian/nested-loop outside the " +
      "documented allowlist") {
    val dir = sf("sf0.001")
    val bad = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val hits = flags.filter(plan.contains).toSet
        val extra = hits -- allow.getOrElse(name, Set.empty)
        if (extra.nonEmpty) Some(s"$name: ${extra.mkString(", ")}") else None
    }
    assert(bad.isEmpty, s"unexpected plan waste:\n${bad.mkString("\n")}")
  }

  test("the allowlist itself stays tight: every allowed entry still " +
      "plans its operator (stale entries must be removed)") {
    val dir = sf("sf0.001")
    val stale = allow.toSeq.sortBy(_._1).flatMap { case (name, ops) =>
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val gone = ops.filterNot(plan.contains)
      if (gone.nonEmpty) Some(s"$name no longer plans ${gone.mkString(", ")}")
      else None
    }
    assert(stale.isEmpty, s"stale allowlist entries:\n${stale.mkString("\n")}")
  }
}
