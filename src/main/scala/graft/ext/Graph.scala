package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relational data — the link-analysis pass a
  * web-scale curation pipeline runs for document-importance weighting
  * (PageRank over the hyperlink graph is the classic corpus-quality
  * prior; Page et al. 1999).
  *
  * The fixture has no link table, so the graph is derived the TPC-H way:
  * parts are linked when they appear in the same order (a co-occurrence
  * graph — the same shape as co-citation links). Everything else is the
  * real algorithm.
  */
object Graph {

  /** Distinct directed co-order edge set (both directions). The graph is
    * symmetric, so only `src < dst` pairs go through the distinct — the
    * heaviest exchange of the whole PageRank build — and the mirror is a
    * narrow union afterwards. Measured at sf1 (20M raw co-order rows):
    * 41 s → 21 s for the full 3-iteration g1 vs distinct-ing both
    * directions, with a bit-identical edge set; at 100 TB this halves
    * both the shuffle bytes and the dedup hash-table footprint of the
    * edge build.
    */
  private[graft] def coOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val li = s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val half = li.alias("a")
      .join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .distinct()
    half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Fixed-iteration PageRank in INTEGER MICRO-UNITS: every per-node
    * mass is a BIGINT count of micro-PR, shares use integer division,
    * and the damping multiply is `(x * 85) div 100`. Integer sums are
    * associative-commutative, so the result is bit-identical across any
    * partitioning, retry, or engine — which is what lets a DuckDB oracle
    * replay the SAME three unrolled iterations and hash-match. (Float
    * PageRank would diverge between engines on summation order alone.)
    *
    * Scale shape: the edge build is an equi-join on the order key
    * (per-order fan-out is bounded by order size, so no quadratic
    * blow-up); each iteration is edges ⋈ pr (shuffle on the 8-byte node
    * key) + one keyed aggregate. `iters` is fixed and small — the
    * standard batch formulation (power iteration unrolled); convergence
    * loops at 100 TB checkpoint the rank table between steps exactly
    * like [[Dedup.duplicateClusters]] does.
    *
    * Deliberately LAZY (no localCheckpoint, unlike duplicateClusters):
    * with a FIXED iteration count the repeated edge/degree subtrees are
    * identical, so Spark's ReuseExchange computes them once — measured
    * 4.7 s lazy vs 5.7 s checkpointed at sf0.1. Checkpointing pays off
    * only for data-dependent loop bodies (the CC label table changes
    * every round, so its subtrees are never identical).
    */
  def pageRank(s: SparkSession, dir: String, iters: Int = 3): DataFrame = {
    // r15 lean loop (guide §2.4 — remove exchanges outright), output
    // row-identical to the pre-r15 shape (exceptAll 0 both ways at
    // sf0.1 AND sf1, tools/G1Decomp):
    //  - `outdeg` is joined into the edge table ONCE outside the loop
    //    (loop-invariant), so each iteration is one edge⋈pr join + one
    //    keyed aggregate instead of two joins + an aggregate.
    //  - the per-iteration `nodes ⟕ in` re-attach is DROPPED: the edge
    //    set is symmetric by construction (both directions unioned), so
    //    every node appears as a dst in every iteration — the left join
    //    could never add or drop a row and the coalesce never fired.
    //    Removing it removes a node-sized join + exchange per round.
    // Measured: sf0.1 warm 4.95 → 4.44 s, cold 11.2 → 6.0 s;
    // sf1 26.0/35.0 → 19.3/20.0 s.
    val edges = coOrderEdges(s, dir)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // r16 (VERDICT r15 item 6 — remove the per-round exchange): the
    // degree-joined edge table is hash-partitioned by dst ONCE — lazily,
    // so ReuseExchange materializes the repartition a single time and
    // its HashPartitioning(dst) flows through each round's broadcast
    // join (a localCheckpoint was measured and REJECTED here: under AQE
    // the LogicalRDD records UnknownPartitioning, so every round
    // re-exchanged anyway) — and each round joins the NODE-SIZED rank
    // table by broadcast, so the round's keyed aggregate reuses the dst
    // distribution and the loop body adds ZERO shuffle exchanges
    // (plans/r16/g1_*: per-round Exchange gone; 2 shuffles total).
    // Broadcasting pr is safe on every corpus this path serves: the
    // auto front door routes to the bipartite formulation above ~3e7
    // clique edges, so the clique node table is bounded far below
    // broadcast limits. Rows identical (R16OptSpec pins old-vs-new).
    val ed = edges.join(deg, "src").repartition(col("dst"))
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      pr = ed
        .join(broadcast(pr.withColumnRenamed("node", "src")), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst")
        .agg(sum(col("share")).as("in_pr"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    pr.select(col("node").as("part_key"), col("pr").as("pr_micro"))
  }

  /** Synchronous label propagation, `iters` fixed rounds (Raghavan et
    * al. 2007 — the near-linear community detector; here over the same
    * co-order graph g1 ranks, the community refinement pass a dedup
    * pipeline runs on its similarity graph). Fully deterministic and
    * integer-exact: every node takes the neighbor label with the
    * highest count, ties to the SMALLEST label (argmax via
    * max(struct(cnt, -label))) — so the unrolled rounds replay in SQL
    * exactly, no float anywhere.
    *
    * Scale shape: per round one shuffle of (dst, label) pairs + two
    * keyed aggregates; labels are 8-byte keys, the edge build is shared
    * across rounds by ReuseExchange (lazy, like [[pageRank]] — fixed
    * iteration count, identical subtrees).
    */
  def labelProp(s: SparkSession, dir: String, iters: Int = 3,
      managed: Boolean = true): DataFrame = {
    // `managed` (default, r11): the function OWNS the one action — the
    // final node-sized label table is eagerly localCheckpoint'd, so
    // callers hold one small self-contained block (the d4/pageRankUntil
    // pattern). managed=false keeps the fully-lazy frame (plan-shape
    // inspection, A/B probes).
    // r15: the edge persist() is GONE. Re-measured interleaved
    // (tools/G2G3Probe): persist+managed 8.9–43.7 s vs lazy+managed
    // 6.4–15.8 s at sf0.1/sf1 — the persist's blocking materialization
    // plus cached-plan AQE penalties cost more than the lazy re-reads
    // it saves on both measured scales; rows identical (exceptAll 0).
    // The broadcast build per round still executes each round's label
    // subtree exactly once, so the loop is not re-running prior rounds.
    // r16 (VERDICT r15 item 6, the g1 treatment): edges are
    // dst-partitioned ONCE — lazily, reused across rounds by
    // ReuseExchange (see pageRank for why not a localCheckpoint) — so
    // with the (unchanged) per-round broadcast of the node-sized label
    // table BOTH keyed aggregates reuse the distribution:
    // HashPartitioning(dst) satisfies the (dst, label) clustering and
    // the node rollup alike, and the loop body adds ZERO shuffle
    // exchanges. Rows identical (R16OptSpec).
    val edges = coOrderEdges(s, dir)
      .repartition(col("dst"))
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      // labels is node-sized (8+8 bytes/row) — broadcast it so the fat
      // edge table never re-shuffles; the (dst, label) count then
      // partial-aggregates map-side. At billions of nodes swap the hint
      // for a src-bucketed layout; the aggregate shape is unchanged.
      labels = edges
        .join(broadcast(labels.select(col("node").as("src"), col("label"))),
          "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).cast("long").as("label"))
    }
    val out = labels.select(col("node").as("part_key"), col("label"))
    if (!managed) out
    else out.localCheckpoint(true)
  }

  /** Distinct order↔part incidence — the BIPARTITE edge set. Linear in
    * lineitem by construction (one row per distinct (order, part)
    * membership), vs [[coOrderEdges]]' per-order cliques (m²/2 pairs for
    * an m-part order — the measured g1/g2 100× wall: ~200 M edges and a
    * 625 s/48 g cold build at sf10). Every walk the clique graph
    * supports runs as TWO keyed hops over this relation instead.
    */
  private[graft] def orderPartEdges(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey").as("ord"), col("l_partkey").as("part"))
      .distinct()

  /** PageRank computed DIRECTLY on the bipartite order↔part graph — the
    * standard web-graph formulation of co-occurrence ranking (rank flows
    * part → order → part), replacing the clique-expanded projection
    * whose edge build is quadratic per order. Each iteration is two
    * keyed joins + two keyed aggregates over O(lineitem) incidence rows
    * with 8-byte keys — linear at any order size; a whale order at
    * 100 TB is one hot aggregation key (AQE-splittable), not an m²
    * clique.
    *
    * Semantics note (deliberate, spec-pinned): this ranks by WALK
    * MULTIPLICITY — a part sharing many orders with few partners weighs
    * those links per shared order, and two-hop mass may return to the
    * source (p→o→p, the lazy-walk term) — whereas [[pageRank]] walks
    * the DISTINCT-partner clique graph. Both are legitimate
    * co-occurrence priors; this one is the shape that scales, and gets
    * its own unrolled DuckDB oracle (g3).
    *
    * Same integer micro-unit discipline as [[pageRank]]: BIGINT masses,
    * truncating integer division for shares, damping as (x·85) div 100
    * applied on the part side — bit-identical across partitioning,
    * retries, and engines.
    */
  def pageRankBipartite(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    // r15 lean loop (the pageRank rewrite applied to both hops), output
    // row-identical (tools/G2G3Probe exceptAll 0 both ways, sf0.1/sf1):
    // pd/od are joined into the incidence ONCE outside the loop
    // (loop-invariant subtrees — AQE materializes each exchange once),
    // and the final `pdeg ⟕ partIn` re-attach is dropped — every ord
    // appears in orderMass (all ords have ≥ 1 incidence) so every part
    // appears in partIn; the left join could never add or drop a row.
    // Measured: sf1 17.4–18.3 → 16.1–16.2 s; sf0.1 in-noise to −0.7 s.
    val inc = orderPartEdges(s, dir)
    val pdeg = inc.groupBy("part").agg(count(lit(1)).as("pd"))
    val odeg = inc.groupBy("ord").agg(count(lit(1)).as("od"))
    val incP = inc.join(pdeg, "part")
    val incO = inc.join(odeg, "ord")
    var pr = pdeg.select(col("part"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val orderMass = incP
        .join(pr, "part")
        .select(col("ord"), expr("pr div pd").as("share"))
        .groupBy("ord")
        .agg(sum(col("share")).as("om"))
      pr = incO
        .join(orderMass, "ord")
        .select(col("part"), expr("om div od").as("share"))
        .groupBy("part")
        .agg(sum(col("share")).as("in_pr"))
        .select(col("part"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"))
    }
    pr.select(col("part").as("part_key"), col("pr").as("pr_micro"))
  }

  /** Label propagation on the bipartite order↔part graph — the linear
    * formulation of [[labelProp]]'s community pass: each round an order
    * takes the majority label of its parts, then a part takes the
    * majority label of its orders (ties to the SMALLEST label at both
    * hops, the g2 argmax trick — fully deterministic, integer-only, so
    * the unrolled rounds replay in SQL). Two keyed join+aggregate pairs
    * per round over O(lineitem) incidences; labels stay 8-byte keys.
    * Like [[labelProp]] the result is eagerly checkpointed and the
    * incidence cache released before returning.
    */
  def labelPropBipartite(s: SparkSession, dir: String,
      iters: Int = 3): DataFrame = {
    val inc = orderPartEdges(s, dir).persist()
    def majority(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(key)
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col(key), (-col("m.nl")).cast("long").as("label"))
    var labels = inc.select(col("part")).distinct()
      .withColumn("label", col("part"))
    for (_ <- 1 to iters) {
      // each round's label table is node-sized — localCheckpoint it so
      // round r never re-executes rounds 1..r−1 (the d4 supersession
      // pattern) and release the superseded round's blocks. sf10 cost
      // is dominated by the per-round majority aggregations themselves
      // (~31 s/round over 60M incidences — linear, the point vs g2's
      // quadratic clique build), not by plan growth.
      // NO broadcast hint (unlike clique-graph labelProp): the label
      // tables here are part-/order-sized (2M/1.5M rows at sf10) and a
      // driver-built broadcast map per round dominated the runtime
      // (measured ~138 s). Keyed shuffle joins on the 8-byte keys let
      // AQE broadcast only when a side is genuinely small.
      val prev = labels
      val ordLabels = majority(inc.join(labels, "part"), "ord")
      labels = majority(inc.join(ordLabels, "ord"), "part")
        .localCheckpoint(true)
      Dedup.unpersistCheckpoint(prev)
    }
    val out = labels
      .select(col("part").as("part_key"), col("label"))
      .localCheckpoint(true)
    Dedup.unpersistCheckpoint(labels)
    inc.unpersist(false)
    out
  }

  /** Clique-edge volume threshold for the auto front doors: above this
    * many estimated half-edges (Σ m·(m−1)/2 over orders, m = distinct
    * parts per order) the per-order clique expansion is routed to the
    * bipartite formulation. Grounding (tools/AutoRouteStats, SCALING.md
    * r12): measured half-edge estimates are 1.2e6 at sf0.1, 1.2e7 at
    * sf1 (clique completes in ~21 s), 1.2e8 at sf10 — the measured wall
    * (a 625 s / 48 GB-driver cold build that OOMs below 32 GB). 3e7
    * sits 2.5× above sf1's volume and 4× under the wall.
    */
  val AutoCliqueEdgesMax: Long = 30000000L

  /** Whale-order guard: ONE order with m parts contributes m·(m−1)/2
    * clique edges on its own and lands them in one join bucket — route
    * to bipartite when any order exceeds this many distinct parts even
    * if the aggregate volume looks benign (10k parts → 5e7 pairs in one
    * task).
    */
  val AutoOrderPartsMax: Long = 10000L

  /** The two routing statistics as ONE cheap aggregate over lineitem
    * (compact 8-byte keys, linear): estimated clique half-edge count and
    * the maximum per-order distinct part count. Memoized per corpus dir
    * — they are frozen corpus properties (computed once at ingest in a
    * production pipeline), so g1 and g2 share one aggregate per JVM
    * instead of each paying it per query (measured ~1.3 s/call at
    * sf0.1).
    */
  private val cliqueStatsCache =
    CorpusMemos.register(
      new java.util.concurrent.ConcurrentHashMap[String, (Double, Long)]())

  private[graft] def cliqueStats(s: SparkSession, dir: String): (Double, Long) =
    cliqueStatsCache.computeIfAbsent(dir, _ => {
      val r = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(countDistinct(col("l_partkey")).cast("double").as("m"))
        .agg(coalesce(sum(col("m") * (col("m") - 1) / 2), lit(0.0)).as("e"),
          coalesce(max(col("m")), lit(0.0)).as("mx"))
        .head()
      (r.getDouble(0), r.getDouble(1).toLong)
    })

  /** The PageRank FRONT DOOR — the entry point to call when the caller
    * has not already chosen a formulation: one cheap aggregate over
    * lineitem estimates the clique-expansion volume, and the walk runs
    * on the distinct-partner clique graph ([[pageRank]]) below the wall
    * or directly on the bipartite incidence ([[pageRankBipartite]])
    * above it (the Similarity.autoPlanes pattern — data picks the shape,
    * not a knob).
    *
    * The two formulations are BOTH legitimate co-occurrence priors but
    * NOT numerically interchangeable (distinct-partner walk vs walk
    * multiplicity — see [[pageRankBipartite]]'s semantics note); what
    * the front door guarantees is a part-keyed integer micro-PR ranking
    * that completes at any scale. Callers that need one specific
    * formulation call it explicitly — both remain public and oracle-
    * gated (g1/g3).
    */
  def pageRankAuto(s: SparkSession, dir: String, iters: Int = 3,
      maxCliqueEdges: Long = AutoCliqueEdgesMax,
      maxOrderParts: Long = AutoOrderPartsMax): DataFrame = {
    val (est, mx) = cliqueStats(s, dir)
    if (est > maxCliqueEdges.toDouble || mx > maxOrderParts) {
      Dedup.logRoute("pageRankAuto", "bipartite",
        f"cliqueEdges=$est%.3g max=$maxCliqueEdges, " +
          s"maxOrderParts=$mx max=$maxOrderParts")
      pageRankBipartite(s, dir, iters)
    } else pageRank(s, dir, iters)
  }

  /** Label-propagation front door — same routing statistic and contract
    * as [[pageRankAuto]]: clique communities ([[labelProp]]) below the
    * wall, bipartite majority rounds ([[labelPropBipartite]]) above.
    */
  def labelPropAuto(s: SparkSession, dir: String, iters: Int = 3,
      maxCliqueEdges: Long = AutoCliqueEdgesMax,
      maxOrderParts: Long = AutoOrderPartsMax): DataFrame = {
    val (est, mx) = cliqueStats(s, dir)
    if (est > maxCliqueEdges.toDouble || mx > maxOrderParts) {
      Dedup.logRoute("labelPropAuto", "bipartite",
        f"cliqueEdges=$est%.3g max=$maxCliqueEdges, " +
          s"maxOrderParts=$mx max=$maxOrderParts")
      labelPropBipartite(s, dir, iters)
    } else labelProp(s, dir, iters)
  }

  /** Convergence-mode PageRank: iterate until the TOTAL L1 delta of the
    * micro-PR vector drops below `epsMicro` (or `maxIter` as a backstop).
    * This is the 100 TB formulation the fixed-iteration Scaladoc above
    * promises: a data-dependent loop body, so each round's rank table is
    * localCheckpoint'd (plan-growth truncation) and the superseded
    * round's blocks are unpersisted — the [[Dedup.connectedComponents]]
    * supersession pattern. The edge/degree tables are checkpointed ONCE
    * and reused by every round (they never change; without the
    * checkpoint each round would re-run the self-join edge build).
    *
    * Integer micro-units make the delta check exact and engine-stable:
    * with truncating integer division the iteration reaches a literal
    * fixpoint (delta 0) rather than oscillating in float ulps, so a
    * tight eps terminates deterministically. The carried `_old` column
    * lets the delta be a scan over the new checkpoint — no extra join.
    *
    * `g1` stays fixed-iteration (the gate needs a bit-exact DuckDB
    * replay of the same unrolled steps); ScalaTest pins that this loop
    * at tight eps agrees with a long fixed run.
    */
  def pageRankUntil(s: SparkSession, dir: String, epsMicro: Long = 1000L,
      maxIter: Int = 50): DataFrame = {
    val edges = coOrderEdges(s, dir).localCheckpoint(true)
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    var pr = deg.select(col("src").as("node"), lit(1000000L).as("pr"))
      .localCheckpoint(true)
    var delta = Long.MaxValue
    var iter = 0
    while (delta >= epsMicro && iter < maxIter) {
      val in = edges
        .join(deg, "src")
        .join(pr.select(col("node").as("src"), col("pr")), "src")
        .select(col("dst"), expr("pr div outdeg").as("share"))
        .groupBy("dst")
        .agg(sum(col("share")).as("in_pr"))
      val next = pr.select(col("node"), col("pr").as("_old"))
        .join(in, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(coalesce(in_pr, 0L) * 85) div 100"))
            .as("pr"),
          col("_old"))
        .localCheckpoint(true)
      delta = next.agg(sum(abs(col("pr") - col("_old")))).head().getLong(0)
      Dedup.unpersistCheckpoint(pr)
      pr = next.drop("_old")
      iter += 1
    }
    Dedup.unpersistCheckpoint(edges)
    Dedup.unpersistCheckpoint(deg)
    pr.select(col("node").as("part_key"), col("pr").as("pr_micro"))
  }
}
