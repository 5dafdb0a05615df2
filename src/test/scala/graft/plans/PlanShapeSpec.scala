package graft.plans

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

import graft.SparkSpec
import graft.SparkEntry

/** Plan-shape regression guards: the scale properties this engine claims
  * (pushdown, broadcast choices, no global sorts, bounded-heap top-k)
  * are properties of the PHYSICAL PLAN — a silent planner regression
  * (lost filter pushdown, a broadcast turning into a sort-merge join, a
  * window sneaking back into d9) would keep every correctness oracle
  * green while destroying 100 TB behavior. These tests pin the
  * pre-AQE physical plan (`sparkPlan` — deterministic, no execution
  * needed; AQE only ever upgrades these shapes at runtime).
  */
class PlanShapeSpec extends SparkSpec {

  private val d = sf("sf0.001")

  private def plan(name: String) =
    SparkEntry.queries(name)(spark, d).queryExecution.sparkPlan

  private def planStr(name: String) = plan(name).toString

  test("s1: filters and projection reach the parquet scan") {
    val scans = plan("s1_scan_filter_project").collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no parquet scan in the plan")
    val scan = scans.head
    assert(scan.metadata.get("PushedFilters").exists(f => f != "[]"),
      s"no pushed filters: ${scan.metadata.get("PushedFilters")}")
    // pruned read schema: far fewer columns than lineitem's 16
    assert(scan.requiredSchema.length <= 6,
      s"scan reads ${scan.requiredSchema.length} columns: " +
        scan.requiredSchema.fieldNames.mkString(","))
  }

  test("dimension joins broadcast (j1, q18 survivor set)") {
    assert(planStr("j1_broadcast_join_agg").contains("BroadcastHashJoin"))
    assert(planStr("q18_large_orders").contains("BroadcastHashJoin"))
  }

  test("global top-k compiles to TakeOrderedAndProject, never a full sort") {
    for (q <- Seq("w5_top1_desc", "e1_cosine_topk")) {
      val p = planStr(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q lost TakeOrdered")
    }
  }

  test("d9: bounded-heap keeper selection — no window, partial+final heaps") {
    val p = plan("d9_cluster_keep_best")
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      "a WindowExec crept into d9")
    val topks = p.collect { case t: TopKPerGroupExec => t }
    assert(topks.length == 2, s"expected partial+final TopK, got ${topks.length}")
  }

  test("z1: the clustering key is a pure projection — zero exchanges") {
    val p = plan("z1_zorder_key")
    assert(p.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "z-key projection should not shuffle")
  }

  test("no accidental cartesian products in the new r6 queries") {
    for (q <- Seq("t10_unigram_lm_score", "d9_cluster_keep_best",
        "e3_knn_join", "x4r_ann_recall")) {
      val p = plan(q)
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q plans a CartesianProduct")
    }
  }

  test("r7 queries: broadcast max in q15, window counts, no cartesians") {
    // q15: the one-row max side must broadcast, never shuffle the agg
    assert(planStr("q15_top_supplier").contains("BroadcastHashJoin"),
      "q15 lost the broadcast of the scalar max")
    // f3: exactly one WindowExec (both leads share one frame pass)
    assert(plan("f3_event_trigrams")
      .collect { case w: WindowExec => w }.length == 1,
      "f3 should compute both leads in a single window pass")
    // w14: one window pass for the forward fill
    assert(plan("w14_gap_fill_forward")
      .collect { case w: WindowExec => w }.length == 1,
      "w14 should forward-fill in a single window pass")
    for (q <- Seq("q13_order_count_histogram", "q15_top_supplier",
        "f3_event_trigrams", "w14_gap_fill_forward",
        "d10_template_ngrams", "p17_pos_tokens", "x2v_simhash_recompute")) {
      assert(plan(q).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q plans a CartesianProduct")
    }
    // q7: the restricted dimensions ride as broadcasts — the fact side
    // must never sort-merge against supplier/customer
    val q7 = planStr("q7_nation_volume")
    assert(q7.contains("BroadcastHashJoin"), "q7 lost its dim broadcasts")
    assert(!q7.contains("SortMergeJoin"),
      "q7 shuffles the fact against a dimension")
    // dq2: the per-type moment table is a broadcast back over the scan
    assert(planStr("dq2_zscore_outliers").contains("BroadcastHashJoin"),
      "dq2 lost the broadcast of the moment table")
    // b1: one window pass computes the tiles
    assert(plan("b1_equidepth_bins")
      .collect { case w: WindowExec => w }.length == 1)
  }

  test("TPC-H completion set: dim broadcasts, semi/anti joins, " +
      "no cartesians") {
    // dimension prefilters must broadcast — the fact side never
    // sort-merges against part/supplier/nation
    for (q <- Seq("q2_min_cost_supplier", "q8_market_share",
        "q9_product_profit", "q16_supplier_cnt", "q19_disjunctive_preds")) {
      assert(planStr(q).contains("BroadcastHashJoin"),
        s"$q lost its dimension broadcast")
    }
    // q9: ONLY broadcasts touch the fact before the agg (both dims tiny)
    assert(!planStr("q9_product_profit").contains("SortMergeJoin"),
      "q9 shuffles the fact against a dimension")
    // EXISTS / IN shapes stay semi joins (no row multiplication)
    for (q <- Seq("q4_priority_exists", "q20_excess_suppliers")) {
      assert(planStr(q).contains("LeftSemi"), s"$q lost the semi join")
    }
    // q21: the double-EXISTS fuses into ONE fact scan (single aggregate
    // with conditional distinct), never a self-join of lineitem
    assert(plan("q21_sole_blame").collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.length == 1, "q21 should scan the fact exactly once")
    // q2: the correlated min is a window over ONE fact scan — exactly
    // two scans total (fact + part dimension), never a second fact read
    assert(plan("q2_min_cost_supplier").collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.length == 2, "q2 should scan fact once + part once")
    // NOT IN / NOT EXISTS shapes stay anti joins
    for (q <- Seq("q16_supplier_cnt", "q22_idle_customers")) {
      assert(planStr(q).contains("LeftAnti"), s"$q lost the anti join")
    }
    for (q <- Seq("q2_min_cost_supplier", "q4_priority_exists",
        "q8_market_share", "q9_product_profit", "q11_important_parts",
        "q16_supplier_cnt", "q17_small_qty_revenue", "q19_disjunctive_preds",
        "q20_excess_suppliers", "q21_sole_blame", "q22_idle_customers")) {
      assert(plan(q).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q plans a CartesianProduct")
    }
  }

  test("x15: ADC shortlist is a TakeOrdered over the CODE table only — " +
      "the float vectors are never scanned for scoring") {
    val p = plan("x15_pq_adc_topk")
    assert(p.toString.contains("TakeOrderedAndProject"),
      "x15 lost the bounded top-k")
    // the PQ point: scoring reads 8-byte codes, not 256-byte floats.
    // Exactly one scan may read `embedding` (the final re-rank of the
    // 100-row shortlist + the 1-row query side) — the corpus-wide
    // scoring scan must read codes only.
    val scans = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val codeScans = scans.filter(
      _.requiredSchema.fieldNames.contains("codes"))
    assert(codeScans.nonEmpty, "no code-table scan in the plan")
    assert(codeScans.forall(
      !_.requiredSchema.fieldNames.contains("embedding")),
      "the scoring scan reads the float vectors — PQ's point is lost")
  }

  test("e4/e5: centroid table broadcasts; the pair stage is a cell " +
      "equi-join, never a cartesian") {
    assert(planStr("e4v_kmeans_nearest").contains("BroadcastNestedLoopJoin")
        || planStr("e4v_kmeans_nearest").contains("BroadcastHashJoin"),
      "e4v lost the centroid broadcast")
    for (q <- Seq("e4_kmeans_assign", "e5_semantic_dedup",
        "e5v_semdedup_subset")) {
      assert(plan(q).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q plans a CartesianProduct")
    }
  }

  test("d11/g1/t12/t13: equi-joins only; span assembly is ONE window " +
      "pass; the rule gates are map-only (zero exchanges)") {
    for (q <- Seq("d11_dup_spans", "g1_pagerank")) {
      assert(plan(q).collect { case c: CartesianProductExec => c }.isEmpty,
        s"$q plans a CartesianProduct")
    }
    // Sorts/exchanges are inserted by EnsureRequirements, so pin the
    // POST-preparation plan (AQE off for determinism) for these:
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def executed(name: String) =
        SparkEntry.queries(name)(spark, d).queryExecution.executedPlan
      // both island windows (lag + running sum) share one doc_id sort
      val p11 = executed("d11_dup_spans")
      val wins = p11.collect { case w: WindowExec => w }
      assert(wins.length == 2, s"d11 has ${wins.length} WindowExec nodes")
      val sorts = p11.collect {
        case s: org.apache.spark.sql.execution.SortExec => s
      }
      assert(sorts.length == 1,
        s"d11 should sort once for both window passes, found ${sorts.length}")
      // map-only text gates: one codegen span over the scan, no shuffle
      for (q <- Seq("t12_pii_redact", "t13_gopher_rules")) {
        assert(executed(q).collect {
          case e: ShuffleExchangeExec => e }.isEmpty,
          s"$q shuffles — it should be a pure projection")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
  }
}
