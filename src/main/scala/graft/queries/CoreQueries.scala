package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SURVEY.md §2 operator inventory realized over the driver test corpus
  * (TESTDATA.md tables). Each query has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]]; results are designed to hash-match:
  *
  *   - money aggregates go through DECIMAL(18,2) so sums are exact and
  *     order-independent on both engines (raw double sums drift ~1e-3 at
  *     sf0.1 — enough to cross a round() boundary);
  *   - timestamps are projected as epoch seconds (LongType) — identical
  *     on both engines, no timezone/precision ambiguity;
  *   - every ordered/limited query orders by a unique key suffix so the
  *     row SET below the limit is deterministic.
  *
  * Scale notes are per-operator; the rule: no global sorts except under a
  * limit (TakeOrderedAndProject), no collects, joins keyed or broadcast.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Dtype-adaptive events reader — see [[graft.sources.EventsTable]]
    * (the corpus has shipped ts as both nanos-INT64 and timestamp[us]).
    */
  private def events(s: SparkSession, dir: String): DataFrame =
    graft.sources.EventsTable.load(s, dir)

  /** double→DECIMAL(p,2) for money columns. Same value as
    * `c.cast("decimal(p,2)")` on the corpus (measured: every money double
    * is within 4e-9 cents of a 2-decimal value, so shortest-string HALF_UP
    * and `Math.round(v·100)` agree — identity spec-pinned in Round15Spec)
    * but ~10× cheaper per row: the built-in cast allocates
    * `Double.toString` + a BigDecimal parse per row, and was measured as
    * the dominant CPU of the whole q-family's scan stages (r15,
    * OPTIMIZATION_r15.md §money-decimal).
    */
  private def dec2(c: org.apache.spark.sql.Column, p: Int) =
    graft.functions.Expressions.moneyDec2(c, p)

  /** Money-exact sum: cast each value to DECIMAL(18,2) first (exact,
    * commutative), return as double (cent-exact up to 2^53).
    */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(dec2(c, 18)).cast("double")

  /** Discounted price in the DECIMAL domain end-to-end. Computing
    * `price * (1 - discount)` in doubles and then casting to decimal is NOT
    * oracle-stable: Spark converts double→decimal via the shortest string
    * representation (HALF_UP on e.g. "95.285") while DuckDB rounds the
    * binary value (95.28499999… → 95.28). Casting each INPUT to decimal is
    * stable (money doubles are within 1e-13 of their decimal value), and
    * decimal multiply/sum is exact on both engines.
    */
  private def discPrice =
    dec2(col("l_extendedprice"), 12) *
      (lit(1).cast("decimal(4,2)") - dec2(col("l_discount"), 4))

  /** Deterministic HALF_UP rounding via floor(x*10^s + 0.5)/10^s: identical
    * double ops on both engines. Spark's round() goes through the shortest
    * string repr (BigDecimal HALF_UP on "47.44125") while DuckDB rounds the
    * binary value — they disagree whenever a quotient's shortest repr
    * terminates in 5 just past the scale. floor is exact on doubles.
    */
  private def r4(c: org.apache.spark.sql.Column) =
    floor(c * lit(10000.0) + lit(0.5)) / lit(10000.0)

  // ===== S/P: scans, projections, filters, scalar expressions ============

  /** S1+P2+P6: pushed-down filter + pruned projection. The parquet scan
    * must show PushedFilters + a 4-column ReadSchema.
    */
  def s1ScanFilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") < 5 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")

  /** P1: regexp_extract metadata recovery (batch_processor.py:63 pattern
    * style) over documents.source.
    */
  def p1RegexExtract(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      regexp_extract(col("source"), "^src([0-9]+)$", 1).as("src_num"),
      col("lang"))

  /** P4/P5: TimestampType → epoch seconds cast chain
    * (batch_processor.py:91-92).
    */
  def p4CastEpoch(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      col("event_id"),
      col("ts").cast("long").as("ts_s"),
      col("value"))

  /** P9/P12: deterministic doc_id generation by string concat
    * (batch_processor.py:132-135).
    */
  def p9ConcatKey(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      concat(col("event_type"), lit("_"), col("user_id").cast("string"),
        lit("_"), col("ts").cast("long").cast("string")).as("doc_id"),
      col("value"))

  /** P10: replace-in-key (stream_processor.py:134 `replace(symbol,'/','-')`
    * analog).
    */
  def p10ReplaceKey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      regexp_replace(col("source"), "src", "SRC-").as("src_key"))

  /** P13+A: date_format bucketing + money-exact monthly rollup
    * (stream_processor.py:154 / app.py label shaping).
    */
  def p13DateFormatAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"))

  // ===== A: aggregations ==================================================

  /** A1: deterministic latest-row-per-key (the `max_by` replacement for the
    * reference's arrival-order `F.last`, stream_processor.py:80-90).
    * row_number, not a global sort: one shuffle by user_id.
    */
  def a1LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("latest_event_id"),
        col("ts").cast("long").as("latest_ts_s"), col("value"))
  }

  /** A2: event-time tumbling window stats (batch analog of the streaming
    * sliding-window agg, stream_processor.py:114-130). Window start
    * projected as epoch seconds.
    */
  def a2WindowStats(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(
        // decimal-sum / count instead of avg(): order-independent, so the
        // round(4) can't straddle a boundary vs the oracle (value has 2dp)
        r4(sum(dec2(col("value"), 18)).cast("double") /
          count(lit(1))).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("event_count"))
      .select(col("w.start").cast("long").as("window_start_s"),
        col("event_type"), col("avg_value"), col("min_value"),
        col("max_value"), col("event_count"))

  /** A4: distinct terms listing, sorted, capped (app.py:57). */
  def a4DistinctTerms(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select("event_type").distinct()
      .orderBy("event_type").limit(500)

  /** A5: multi_terms pairs formatted `{a}_{b}` with counts (app.py:72). */
  def a5MultiTermsPairs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority").agg(count(lit(1)).as("cnt"))
      .select(concat(col("o_orderstatus"), lit("_"), col("o_orderpriority")).as("pair"),
        col("cnt"))
      .orderBy("pair").limit(1000)

  /** A6: filtered max-timestamp — the incremental-crawl frontier
    * (hourly_updater.py:70-97).
    */
  def a6IncrementalMaxTs(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === "click")
      .agg(max(col("ts").cast("long")).as("max_ts_s"),
        count(lit(1)).as("n_rows"))

  // ===== W: window functions / sorts / limits / top-k =====================

  /** W1/W2: rolling SMA-7 and SMA-30 row frames per key, one Window
    * partitioning → single exchange, both frames in one WindowExec pass
    * (batch_processor.py:111-115).
    */
  def w1RollingSma(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val vDec = dec2(col("value"), 18)
    def frameAvg(lo: Int) =
      r4(sum(vDec).over(w.rowsBetween(lo, 0)).cast("double") /
        count(lit(1)).over(w.rowsBetween(lo, 0)))
    events(s, dir)
      .withColumn("sma_7", frameAvg(-6))
      .withColumn("sma_30", frameAvg(-29))
      .select(col("user_id"), col("event_id"), col("sma_7"), col("sma_30"))
  }

  /** W5: top-1 by sort desc within a filter (app.py:102-104) —
    * TakeOrderedAndProject, no global sort.
    */
  def w5Top1Desc(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_type") === "purchase")
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(1)
      .select(col("event_id"), col("ts").cast("long").as("ts_s"), col("value"))

  /** W6: top-k newest rows (model-input fetch, app.py:219-228). */
  def w6TopkRecent(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(100)
      .select(col("event_id"), col("ts").cast("long").as("ts_s"), col("value"))

  /** W7: bounded range scan sorted asc with cap (app.py:166-168; chart and
    * history endpoints). Partition pruning would kick in on a
    * date-partitioned table.
    */
  def w7RangeScanAsc(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("ts") >= lit("2024-01-10 00:00:00") &&
        col("ts") < lit("2024-01-12 00:00:00"))
      .orderBy(col("ts"), col("event_id"))
      .limit(10000)
      .select(col("event_id"), col("ts").cast("long").as("ts_s"),
        col("event_type"), col("value"))

  /** W8: get-by-primary-key (app.py:97). */
  def w8GetByKey(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .filter(col("event_id") === 4242)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("long").as("ts_s"), col("value"))

  /** W10: top-k per group through the custom bounded-heap operator
    * ([[graft.plans.TopKPerGroup]]) — the grouped version of the serving
    * top-k patterns (w5/w6 are the reference's global sort+size fetches,
    * app.py:219-228; ES terms+top_hits is the grouped analog). Plans as
    * partial heap → one hash exchange → final heap: no WindowExec, no
    * per-group sort, shuffle bounded at k rows per group per partition.
    */
  def w10GroupedTopk(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topK(
      t(s, dir, "customer").select("c_nationkey", "c_custkey", "c_acctbal"),
      Seq("c_nationkey"), "c_acctbal", 3, desc = true,
      tiebreakCols = Seq("c_custkey"))

  // ===== Relational beyond the reference: joins / set ops =================

  /** TPC-H Q1-shaped rollup: the canonical scan-heavy agg; decimal-exact
    * money sums, partial aggregation map-side.
    */
  def q1LineitemAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        r4(sum(dec2(col("l_discount"), 4)).cast("double") /
          count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** On-disk parquet bytes of one table — the cheapest honest size
    * statistic for a join-side routing decision (a filesystem stat, no
    * Spark job; compression means in-memory build size is a small
    * multiple, absorbed into the threshold).
    */
  private def tableDiskBytes(s: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .getContentSummary(p).getLength
  }

  /** A broadcast hint is an ASSERTION that the build side fits executor
    * memory; 64 MB parquet ≈ a few hundred MB built. Above it, hinting
    * is how drivers die at scale — let the planner pick the exchange
    * join instead.
    */
  private val DimBroadcastDiskBytesMax: Long = 64L * 1024 * 1024

  /** Size-gated hint for a WHOLE scaling table (q14, j1): the free FS
    * stat suffices — derived/filtered dims go through
    * [[JoinHints.gated]]'s measured count instead.
    */
  private[queries] def gatedTableBroadcast(s: SparkSession, dir: String,
      table: String, site: String,
      bytesMax: Long = DimBroadcastDiskBytesMax): DataFrame = {
    val dim = t(s, dir, table)
    val dimBytes = tableDiskBytes(s, s"$dir/$table.parquet")
    if (dimBytes <= bytesMax) {
      graft.ext.Dedup.logRoute(site, "broadcast hint kept",
        f"dimDiskBytes=${dimBytes.toDouble}%.3g max=$bytesMax")
      broadcast(dim)
    } else {
      graft.ext.Dedup.logRoute(site, "planner join (dim over broadcast cap)",
        f"dimDiskBytes=${dimBytes.toDouble}%.3g max=$bytesMax")
      dim
    }
  }

  /** Broadcast dimension join: fact×dim where the fact side never
    * shuffles — but the hint is size-GATED (r13): TPC-H's part table
    * scales WITH the corpus (20 M rows / 178 MB parquet at sf100),
    * unlike nation/region, so an unconditional broadcast() is an
    * eventually-false assertion about executor memory. Below the gate:
    * one exchange total (on the agg key). Above: the planner's exchange
    * join — the same statistics-driven front-door pattern as the dedup
    * and graph routers, logged on graft.autoroute. Join method cannot
    * change the result (inner equi-join, agg downstream).
    */
  def j1BroadcastJoinAgg(s: SparkSession, dir: String,
      dimBroadcastBytesMax: Long = DimBroadcastDiskBytesMax): DataFrame = {
    val hinted = gatedTableBroadcast(s, dir, "part", "j1BroadcastJoinAgg",
      dimBroadcastBytesMax)
    t(s, dir, "lineitem")
      .join(hinted, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        sum(discPrice).cast("double").as("revenue"))
  }

  /** Bloom-pruned fact join ([[graft.ext.BloomPrune]]): the dim side is a
    * selective filter over orders, whose keys are bloom-aggregated and
    * applied to lineitem BEFORE its shuffle — only possible matches cross
    * the exchange. Row-identical to the plain join (bloom filters have no
    * false negatives; the join removes false positives), so the oracle is
    * the plain SQL join.
    */
  def bj1BloomPrunedJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      .select("o_orderkey", "o_orderpriority")
    graft.ext.BloomPrune.prunedJoin(
      t(s, dir, "lineitem"), dim,
      col("l_orderkey"), col("o_orderkey"), expectedItems = 100000L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(discPrice).cast("double").as("revenue"))
  }

  /** Shuffle join on keys + rollup: both sides large at scale → hash
    * exchange on the join key; AQE handles skew.
    */
  def j2ShuffleJoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"))

  /** Left-semi join — EXISTS semantics, no row multiplication. */
  def j3SemiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_mktsegment")

  /** Left-anti join — NOT EXISTS semantics. */
  def j4AntiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_nationkey")

  /** UNION ALL of two scans — the S1 multi-path read is exactly this. */
  def u1UnionAll(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    e.filter(col("event_type") === "click")
      .unionByName(e.filter(col("event_type") === "error"))
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
  }

  /** INTERSECT — set semantics (deduped), plans as aggregate + left-semi
    * join: users who both clicked and errored.
    */
  def u2Intersect(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    e.filter(col("event_type") === "click").select("user_id")
      .intersect(e.filter(col("event_type") === "error").select("user_id"))
  }

  /** EXCEPT — set difference via left-anti join, at (user, day) grain
    * (every user eventually does every event type at corpus density, so
    * user-grain difference would be vacuously empty): click-days with no
    * purchase.
    */
  def u3Except(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    def days(typ: String) = e.filter(col("event_type") === typ)
      .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
    days("click").except(days("purchase"))
  }

  /** Three-way join + top-k by aggregate (TPC-H Q3 shape): filters pushed
    * to all three scans, joins keyed, final top-10 via
    * TakeOrderedAndProject — no global sort at any scale.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01")),
        col("c_custkey") === col("o_custkey"))
      .join(t(s, dir, "lineitem").filter(col("l_shipdate") >= lit("2000-08-01")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5 shape (local supplier volume): the 6-table join chain —
    * region→nation broadcast down the dim hierarchy, customer⋈orders⋈
    * lineitem⋈supplier keyed hash joins with AQE picking build sides, the
    * co-nation constraint (c_nationkey = s_nationkey) applied as a post-
    * join filter. The canonical join-ORDER stressor: start from the most
    * selective dim (one region) and let the filter flow down.
    */
  def q5LocalSupplierVolume(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region").filter(col("r_name") === "ASIA")
      .join(broadcast(t(s, dir, "nation")),
        col("r_regionkey") === col("n_regionkey"))
      .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"))
      .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
      .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy("n_name")
      .agg(sum(discPrice).cast("double").as("revenue"))

  /** TPC-H Q10 shape (returned-item reporting): who returned the most
    * revenue — lineitem filtered to returns, joined up the
    * orders→customer→nation chain, top-20 customers by revenue via
    * TakeOrderedAndProject (no global sort). The return filter is pushed
    * to the lineitem scan; nation broadcasts.
    */
  def q10ReturnedCustomers(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** TPC-H Q14 shape (promo revenue share): conditional aggregation to a
    * single scalar — promo-typed parts' share of discounted revenue. Both
    * sums stay in the DECIMAL domain; only the final ratio is double
    * (identical double ops on both engines, floor-rounded to 4 places).
    */
  def q14PromoRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(gatedTableBroadcast(s, dir, "part", "q14.part"),
        col("l_partkey") === col("p_partkey"))
      .agg(r4(
        sum(when(col("p_type") === "PROMO", discPrice)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") * 100.0 /
          sum(discPrice).cast("double")).as("promo_pct"))

  /** TPC-H Q18 shape (large-volume orders): group-HAVING on the fact
    * table, then join the tiny survivor set back to orders/customer.
    * Scale: the l_orderkey aggregation is the one unavoidable fact
    * shuffle; the HAVING filter collapses it to a handful of keys, so AQE
    * turns both downstream joins into broadcasts — orders and customer
    * never shuffle. Quantity sums are DECIMAL-exact.
    */
  def q18LargeOrders(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sum(dec2(col("l_quantity"), 12)).cast("double")
        .as("sum_qty"))
      .filter(col("sum_qty") > 300)
    t(s, dir, "orders").join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q12 shape (priority class counts): a shipdate-bounded fact
    * scan joined to orders, conditional two-way counts per return flag.
    * Scale: the date predicate is pushed to the parquet scan (and prunes
    * partitions on a date-partitioned landing zone); the conditional
    * sums are map-side partial aggregates over 3 groups.
    */
  def q12PriorityCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))

  /** Batch-side JSON extraction (the P8 from_json capability outside the
    * stream): pull a typed field out of the semi-structured props column.
    * get_json_object is codegen'd path extraction — no UDF, no
    * row-by-row parser objects; at scale prefer promoting hot fields to
    * columns at ingest (this query IS that promotion pass).
    */
  def p15JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** ANALYZE-style table stats in ONE pass: row count, min/max, exact
    * NDVs, null counts — the inputs a cost-based optimizer (or a human
    * sizing shuffles) needs. One scan, one tiny aggregate. At 100 TB the
    * exact count-distincts swap for HLL (`x7_approx_distinct` path) —
    * exact NDV shuffles one row per distinct value; the rest is
    * map-side-combinable as-is.
    */
  def st1TableStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      min("l_quantity").as("qty_min"),
      max("l_quantity").as("qty_max"),
      countDistinct("l_returnflag").as("flag_ndv"),
      countDistinct("l_orderkey").as("orderkey_ndv"),
      sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L))
        .as("price_nulls"))

  /** Data-quality gate: violation counts for the constraint set a
    * pipeline would enforce before promoting a batch — null keys,
    * out-of-domain values, referential orphans. The conditional sums
    * ride the same single scan; the FK probe is a left-anti join
    * (no row multiplication) that AQE short-circuits when empty.
    */
  def dq1QualityChecks(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val base = li.agg(
      sum(when(col("l_orderkey").isNull, 1L).otherwise(0L))
        .as("null_orderkey"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("nonpos_qty"),
      sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
        .otherwise(0L)).as("bad_discount"))
    val orphans = li.join(t(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphan_lines"))
    base.crossJoin(orphans)
  }

  /** Funnel conversion (view → purchase within 1 h) — the sequence-
    * analytics shape: first qualifying event per user, then the earliest
    * follow-up event inside the window. All time math in integer epoch
    * seconds (the events table carries sub-second components; Spark
    * truncates ns→µs on read, so second-floored longs are the only
    * representation both engines agree on exactly).
    *
    * Scale: two aggregates and one join, all keyed on user_id — one
    * partitioning reused end-to-end (AQE co-partitions); per-user state
    * is one row. No window functions, no sort.
    */
  def f1FunnelConversion(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("user_id"), col("event_type"),
        graft.sources.EventsTable.epochSeconds(col("ts")).as("es"))
    val firstView = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("es").as("view_es"))
    val firstConv = ev.filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(col("es") > col("view_es") && col("es") <= col("view_es") + 3600L)
      .groupBy("user_id").agg(min("es").as("purchase_es"))
    firstView.join(firstConv, Seq("user_id"), "left")
      .select(col("user_id"), col("view_es"), col("purchase_es"),
        when(col("purchase_es").isNotNull, 1).otherwise(0)
          .cast("int").as("converted"))
  }

  /** Correlated scalar subquery through the SQL front-end: customers
    * richer than their nation's average balance. Catalyst decorrelates
    * the subquery into an aggregate + join (RewriteCorrelatedScalarSubquery)
    * — one nation-keyed agg, one join, no per-row re-execution. The
    * average is computed in the DECIMAL domain so the strict `>` compares
    * exact values on both engines (double averages are summation-order-
    * dependent and could flip boundary rows).
    */
  def sq1CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("sq1_customer")
    s.sql(
      """SELECT c_custkey, c_nationkey
         FROM sq1_customer c
         WHERE c_acctbal > (SELECT avg(CAST(c_acctbal AS DECIMAL(12,2)))
                            FROM sq1_customer c2
                            WHERE c2.c_nationkey = c.c_nationkey)""")
  }

  /** Correlated EXISTS through the SQL front-end — decorrelates to a
    * left-semi hash join (the SQL twin of j3's DataFrame `left_semi`).
    */
  def sq2ExistsSubquery(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("sq2_customer")
    t(s, dir, "orders").createOrReplaceTempView("sq2_orders")
    s.sql(
      """SELECT c_custkey, c_mktsegment
         FROM sq2_customer c
         WHERE EXISTS (SELECT 1 FROM sq2_orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 400000)""")
  }

  /** ROLLUP grouping sets over the Q1 dimensions — subtotals + grand total
    * in one pass (Expand + partial agg, still a single shuffle).
    */
  def r1Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))

  /** Exact distinct-count per group (two-phase: distinct shuffle then
    * count — Catalyst plans the expand/aggregate automatically).
    */
  def cd1CountDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))

  /** HLL approximate distinct — the sketch the reference's terms-agg would
    * need at real cardinalities. Flipped to a FULL SQL oracle in r11:
    * the library's own [[graft.functions.HllSketch]] (classic Flajolet
    * 2007 estimator, integer-exact registers + dyadic harmonic sum)
    * replays bit-for-bit in DuckDB through the shared XXH64 emulation,
    * where Spark's built-in `approx_count_distinct` (HLL++ with
    * engine-private bias tables) could not.
    */
  def x7ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(graft.functions.HllSketch.hllDistinct(col("user_id"), 12)
        .as("approx_users"),
        count(lit(1)).as("n_rows"))

  /** Sessionization: gap-based session ids per user (new session when
    * > 30 min since the previous event) via lag + running sum — one
    * shuffle on user_id, both window functions share the sort.
    */
  def s2Sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts").cast("long")).as("session_start_s"),
        max(col("ts").cast("long")).as("session_end_s"))
  }

  /** TPC-H Q6 shape: tight filter + single global agg — the all-pushdown
    * query (no groupBy shuffle at all; partial sums merge at the driver).
    */
  def q6RevenueDelta(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(
        sum((dec2(col("l_extendedprice"), 12) *
          dec2(col("l_discount"), 4))).cast("double")
          .as("revenue_delta"),
        count(lit(1)).as("n_rows"))

  /** Pivot: events count per user × event_type — Expand + single agg
    * shuffle; the pivoted column set is declared, not inferred (an
    * inference pass would scan twice).
    */
  def p14Pivot(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)

  /** UNPIVOT (wide → long) via `stack` — the inverse of p14's pivot and
    * the standard normalization step before measure-generic processing
    * (one metric column + a measure tag instead of N metric columns).
    * Generates 3 rows per input row inside the scan projection — no
    * shuffle, no UDF. Arithmetic stays DECIMAL(14,2) (exact), but the
    * OUTPUT is integer cents: raw DECIMAL columns hash differently
    * across engines at the gate (decimal vs float rendering of 44.00),
    * so we ship CAST(v*100 AS BIGINT) — the t10/c5 integer-unit
    * discipline.
    */
  def p16Unpivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"),
        expr("""stack(3,
                  'quantity', CAST(l_quantity AS DECIMAL(14,2)),
                  'price', CAST(l_extendedprice AS DECIMAL(14,2)),
                  'discount', CAST(l_discount AS DECIMAL(14,2)))
                AS (measure, val)"""))
      .select(col("l_orderkey"), col("line_no"), col("measure"),
        (col("val") * 100).cast("long").as("val_cents"))

  /** Exact grouped percentiles (percentile_cont semantics: linear
    * interpolation over the sorted group) — the exact twin of the
    * x10v/kq1v SKETCH percentile bounds: this is what they approximate.
    * Interpolated doubles floor-rounded at 4 places (both engines use
    * the same lo + f·(hi−lo) formula; noise is ~1e-13).
    */
  def a8ExactPercentiles(s: SparkSession, dir: String): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) =
      floor(c * 10000 + lit(0.5)) / 10000
    events(s, dir)
      .groupBy("event_type")
      .agg(
        r4(expr("percentile(value, 0.5)")).as("p50"),
        r4(expr("percentile(value, 0.9)")).as("p90"),
        r4(expr("percentile(value, 0.99)")).as("p99"),
        count(lit(1)).as("n"))
  }

  /** KMV bottom-k distinct sketch (custom TypedImperativeAggregate) next
    * to the exact count — at |users| < k the sketch must BE exact, which
    * doubles as its driver-checkable contract. Oracle-exact since r10s5:
    * the estimate replays in SQL (XXH64-on-long emulation + Bar-Yossef
    * formula with Scala's exact double/round shape) — validated on the
    * estimator branch too (sf0.1: 1756 est vs 1500 exact, hash-equal).
    */
  def x9KmvDistinct(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(graft.functions.KmvSketch.kmvDistinct(col("user_id"), 256)
        .as("kmv_users"),
        countDistinct(col("user_id")).as("exact_users"))

  /** x9 invariant (oracle-checked): a KMV sketch whose heap never fills
    * (domain 199 < k=256) IS the exact distinct count at every scale —
    * DuckDB computes the same count(DISTINCT) directly.
    */
  def x9vKmvExactSmall(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(graft.functions.KmvSketch
        .kmvDistinct(pmod(col("event_id"), lit(199L)), 256).as("kmv_mod"),
        countDistinct(pmod(col("event_id"), lit(199L))).as("exact_mod"))

  /** x7 invariant (oracle-checked): the HLL estimate must land within a
    * conservative 5% of the exact count per group; the oracle pins the
    * verdict column to all-ones.
    */
  def x7vHllErrorBound(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(graft.functions.HllSketch.hllDistinct(col("user_id"), 12)
        .as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .select(col("event_type"),
        when(abs(col("approx") - col("exact")) <=
          ceil(col("exact") * lit(0.05)), lit(1)).otherwise(lit(0))
          .cast("int").as("within_bound"))

  /** CUBE grouping sets with grouping_id — all four (returnflag,
    * linestatus) aggregation levels in ONE pass (Expand + single hash
    * aggregate), vs four scans done naively.
    */
  def r2Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")

  /** Offset windows + quartile bucketing: lag delta, lead peek, ntile —
    * the remaining window-function surface (all share one sort within one
    * user-keyed exchange; deltas are exact binary double subtraction so
    * both engines agree bit-for-bit).
    */
  /** GROUPING SETS through the SQL front-end — Catalyst plans one Expand
    * + one hash aggregate for an arbitrary set list (r1 rollup / r2 cube
    * are its fixed-shape specializations); grouping() disambiguates the
    * null-as-subtotal rows from genuine null keys. The Expand multiplies
    * map-side rows by the number of sets, but the shuffle still carries
    * only (set, group) partials — the 100 TB-safe shape for multi-grain
    * reporting in one pass.
    */
  def r3GroupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("r3_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
                CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                  AS BIGINT) AS gid,
                sum(l_quantity) AS sum_qty, count(1) AS cnt
         FROM r3_lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), (l_linestatus), ())""")
  }

  /** RANGE-frame window: per user, the trailing-1-hour sum of event
    * values — value-based frame bounds over event time (w1's SMA frames
    * are ROWS-based). Same single exchange + in-partition sort as every
    * window here; the frame scan is streaming (two pointers), not
    * quadratic. The frame sum runs in DECIMAL (exact, order-independent)
    * but the OUTPUT is integer cents — Spark widens sum(DECIMAL(14,2))
    * to DECIMAL(24,2), DuckDB to DECIMAL(38,2), and the gate's hasher
    * renders those through different dtypes; CAST(sum*100 AS BIGINT)
    * makes the shipped value engine-invariant.
    */
  def w12RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_s"))
      .rangeBetween(-3600L, Window.currentRow)
    events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_s"),
        dec2(col("value"), 14).as("v"))
      .select(col("event_id"), col("user_id"),
        (sum(col("v")).over(w) * 100).cast("long").as("trail_1h_cents"))
  }

  def w9LeadLagNtile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, dir).select(
      col("user_id"), col("event_id"),
      (col("value") - lag(col("value"), 1).over(w)).as("delta"),
      lead(col("event_type"), 1).over(w).as("next_type"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  /** Distribution-rank window functions (percent_rank / cume_dist /
    * nth_value / first_value) over the running frame — one WindowExec
    * pass, same single exchange as w9. Ratios floor-rounded to 4 places
    * (identical double ops both engines).
    */
  def w11RankDistributions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, dir).select(
      col("user_id"), col("event_id"),
      r4(percent_rank().over(w)).as("pct_rank"),
      r4(cume_dist().over(w)).as("cume"),
      nth_value(col("event_type"), 2).over(w).as("second_type"),
      first(col("value")).over(w).as("first_value"))
  }

  /** Full outer join with disjoint filters on both sides, so both
    * null-extended directions actually occur.
    */
  def j5FullOuter(s: SparkSession, dir: String): DataFrame = {
    val bigOrders = t(s, dir, "orders")
      .filter(col("o_totalprice") > 400000)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_big_orders"))
    val building = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_nationkey"))
    building.join(bigOrders, col("c_custkey") === col("o_custkey"),
        "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_nationkey"), col("n_big_orders"))
  }

  /** As-of join (point-in-time): each purchase matched to the user's
    * latest click at or before it — [[graft.operators.AsOfJoin]], the
    * union+window form (one shuffle, no range nested-loop). Clicks are
    * pre-deduped per (user, ts) with a max_by tiebreak so the match is
    * deterministic; DuckDB's native ASOF LEFT JOIN is the oracle.
    */
  def aj1AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts").as("c_ts"))
      .agg(max(col("event_id")).as("click_id"),
        max_by(col("value"), col("event_id")).as("click_value"))
    graft.operators.AsOfJoin.leftAsOf(purchases, clicks,
      on = Seq("user_id"), leftTime = "ts", rightTime = "c_ts",
      rightPayload = Seq("c_ts", "click_id", "click_value"))
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("ts_s"), col("value"),
        col("click_id"), col("c_ts").cast("long").as("click_ts_s"),
        col("click_value"))
  }

  /** Interval join via [[graft.operators.RangeJoin]]: clicks landing in
    * the 30-minute window after any error event, counted per error — a
    * keyless range join executed as a granule equi-join (no nested loop).
    * Inner semantics: errors with zero clicks in-window don't appear.
    */
  def rj1IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
      .withColumn("end_ts", col("err_ts") + expr("INTERVAL 30 MINUTES"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    graft.operators.RangeJoin.pointsInIntervals(
      clicks, "click_ts", errors, "err_ts", "end_ts",
      granuleSeconds = 1800L)
      .groupBy(col("err_id"),
        col("err_ts").cast("long").as("err_ts_s"))
      .agg(count(lit(1)).as("n_clicks"))
  }

  /** x12 invariant (oracle-checked): a SpaceSaving heavy-hitters sketch
    * whose capacity exceeds the domain (5 event types < 64 counters) IS
    * the exact top-k with zero error — DuckDB computes the same top-3
    * directly. Below-capacity exactness is the same invariant family as
    * KMV's (x9v).
    */
  def x12vHeavyHittersExact(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .agg(graft.functions.SpaceSaving.topK(col("event_type"), k = 3,
        capacity = 64).as("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t.term").as("term"), col("t.cnt").as("cnt"),
        col("t.err").as("err"))

  /** x10 invariant (oracle-checked): the approx-percentile sketch's
    * median must land between the exact 45th and 55th percentiles per
    * group — far looser than its rank-error guarantee at accuracy 1000,
    * so the flag is deterministically 1.
    */
  def x10vPercentileBound(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(
        percentile_approx(col("value"), lit(0.5), lit(1000)).as("med_approx"),
        expr("percentile(value, 0.45)").as("q45"),
        expr("percentile(value, 0.55)").as("q55"))
      .select(col("event_type"),
        when(col("med_approx").between(col("q45"), col("q55")), lit(1))
          .otherwise(lit(0)).cast("int").as("within_bound"))

  /** kq1 invariant (oracle-checked): the custom KLL sketch's median
    * ([[graft.functions.KllSketch]] — mergeable TypedImperativeAggregate
    * with a deterministic compaction coin) must land between the exact
    * 42nd and 58th percentiles per group; k=200 observes ~1-2% rank
    * error, so ±8% slack keeps the flag deterministically 1.
    */
  def kq1vKllRankBound(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(
        graft.functions.KllSketch.kllQuantile(col("value"), 0.5, 200)
          .as("med_kll"),
        expr("percentile(value, 0.42)").as("q42"),
        expr("percentile(value, 0.58)").as("q58"))
      .select(col("event_type"),
        when(col("med_kll").between(col("q42"), col("q58")), lit(1))
          .otherwise(lit(0)).cast("int").as("within_bound"))

  /** TPC-H Q13 shape: distribution of per-customer order counts — the
    * double-aggregation pattern (left join preserving zero-order
    * customers, count per key, then a histogram of the counts). The
    * second aggregate's input is one row per customer, so the expensive
    * shuffle is the first one only; the c_count histogram is tiny.
    */
  def q13OrderCountHistogram(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "customer").select(col("c_custkey"))
      .join(t(s, dir, "orders").select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    counts.groupBy("c_count").agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    * a scalar subquery over an aggregate (the "top of an agg" pattern
    * that can't be a window: the max is global). Revenue runs in
    * DECIMAL(12,2)×(4,2) so the comparison and output are exact integer
    * quarter-cents; the one-row max side is broadcast, so the agg output
    * is never shuffled again.
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= "1995-01-01" &&
        col("l_shipdate") < "1995-04-01")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg((sum(dec2(col("l_extendedprice"), 12) *
        dec2(lit(1) - col("l_discount"), 4)) * 10000)
        .cast("long").as("revenue_c4"))
    val mx = rev.agg(max(col("revenue_c4")).as("mx"))
    rev.join(broadcast(mx), col("revenue_c4") === col("mx"))
      .select("suppkey", "revenue_c4")
  }

  /** Sequential path mining: corpus-wide counts of per-user consecutive
    * event-type trigrams — the n-gram-over-sessions primitive behind
    * next-action models and funnel discovery. One window pass (same
    * user_id exchange + in-partition sort as w9), then a tiny 3-key agg:
    * at 100 TB the heavy operator is the per-user sort, which AQE sizes,
    * and the trigram space stays ≤ |event_types|³ rows.
    */
  def f3EventTrigrams(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(s, dir)
      .select(col("user_id"), col("event_type").as("e1"),
        lead(col("event_type"), 1).over(w).as("e2"),
        lead(col("event_type"), 2).over(w).as("e3"))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
  }

  /** Time-series regularization: per user, an hourly grid from first to
    * last activity with the latest value FORWARD-FILLED across gaps —
    * the resample step every charting/feature pipeline runs before
    * windowed models (the reference's chart endpoints simply skip gaps).
    * Deterministic: the per-hour representative is max_by over the
    * (ts, event_id) total order, and the fill only COPIES values (no
    * arithmetic), so doubles pass through engine-identically. Scale: one
    * keyed agg + an explode whose output is bounded by the user's active
    * span, then one window over the same user_id partitioning — the
    * grid join is a no-shuffle continuation under AQE.
    */
  def w14GapFillForward(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"),
      (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long").as("hr"),
      col("value"), col("ts"), col("event_id"))
    val hourly = e.groupBy("user_id", "hr")
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("v"))
    val span = e.groupBy("user_id").agg(min("hr").as("lo"), max("hr").as("hi"))
    val grid = span.select(col("user_id"),
      explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hr"))
    val w = Window.partitionBy("user_id").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .select(col("user_id"), col("hr"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
  }

  /** W15: exponentially-weighted moving average per user over the event
    * stream — the time-decay smoother next to w1's SMA (the online form
    * monitoring/feature pipelines keep per key). The recurrence
    * s_t = α·x_t + (1−α)·s_{t-1} (s_0 = x_0, α = 0.25 — dyadic, exact
    * in binary) is inherently sequential per key, so the distributed
    * shape is repartition-by-key + in-partition ordered fold (the
    * BatchPacking pattern): ONE shuffle, O(1) state per key, keys never
    * span partitions, output independent of parallelism.
    *
    * Oracle-exactness: both engines execute the identical double
    * sequence in identical (ts, event_id) order — the DuckDB recursive
    * CTE advances every user one ranked event per step — so the ewma is
    * bit-identical before the micro-unit floor.
    */
  def w15Ewma(s: SparkSession, dir: String, shards: Int = 32): DataFrame = {
    import s.implicits._
    // Null guard BEFORE the non-nullable typed encoder: a null
    // user_id/value/ts/event_id row would NPE inside the executor decode
    // (nulls are in-domain for events — x9 filters them too). The oracle
    // applies the identical predicate. The fold then tracks first-row
    // state with an explicit flag — a sentinel Long would silently
    // mis-seed a user whose id equals the sentinel.
    val e = events(s, dir)
      .filter(col("user_id").isNotNull && col("value").isNotNull &&
        col("ts").isNotNull && col("event_id").isNotNull)
      .select(col("user_id").cast("long").as("user_id"),
        expr("unix_micros(ts)").as("tsu"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("x"))
      .repartition(shards, col("user_id"))
      .sortWithinPartitions("user_id", "tsu", "event_id")
      .as[(Long, Long, Long, Double)]
    e.mapPartitions { it =>
      var seeded = false
      var curUser = 0L
      var sAcc = 0.0
      it.map { case (u, _, id, x) =>
        if (!seeded || u != curUser) { seeded = true; curUser = u; sAcc = x }
        else sAcc = 0.25 * x + 0.75 * sAcc
        (u, id, math.floor(sAcc * 1000000.0).toLong)
      }
    }.toDF("user_id", "event_id", "ewma_micro")
  }

  /** TPC-H Q7 shape: bilateral trade volume by year — the 5-way
    * fact-to-dimension join pipeline. Scale-correct order: the nation
    * filter restricts supplier and customer FIRST (each shrinks to 2/25
    * before touching the fact), both ride as broadcasts; lineitem joins
    * the restricted supplier (map-side, kills 92% of the fact
    * immediately), then one shuffle on orderkey against orders, then the
    * restricted customer broadcast. One fact shuffle total; revenue in
    * DECIMAL, output quarter-cents.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val nations = Seq("NATION_3", "NATION_7")
    val supp = t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin(nations: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")
        .filter(col("n_name").isin(nations: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t(s, dir, "lineitem")
      .join(JoinHints.gated(supp, s"$dir|q7.supp"),
        col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(JoinHints.gated(cust, s"$dir|q7.cust"),
        col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg((sum(discPrice) * 10000).cast("long").as("revenue_c4"),
        count(lit(1)).as("n_items"))
  }

  /** Data-quality anomaly gate: per-type 3σ outliers with EXACT moments —
    * sums of squares run on integer cents (sum and sum-of-squares are
    * order-independent there, unlike double accumulation, so mean/σ are
    * bit-identical on any engine and the >3σ verdict can't flip at a
    * boundary). c² ≤ 1e10 per row keeps the Long sum safe to ~10⁸ rows
    * per group; beyond that, widen s2 to DECIMAL(38,0). The per-type
    * moment table is one tiny agg broadcast back over the scan.
    */
  def dq2ZscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val c = round(col("value") * 100).cast("long")
    val e = events(s, dir).select(col("event_id"), col("event_type"),
      c.as("c"))
    val m = e.groupBy("event_type").agg(
      sum(col("c")).as("s1"),
      sum(col("c") * col("c")).as("s2"),
      count(lit(1)).as("n"))
    val mean = col("s1").cast("double") / col("n")
    val sd = sqrt(col("s2").cast("double") / col("n") - mean * mean)
    e.join(broadcast(m), "event_type")
      .filter(abs(col("c") - mean) > lit(3) * sd)
      .select(col("event_id"), col("event_type"),
        (floor((col("c") - mean) / sd * 10000 + lit(0.5)) / 10000).as("z"))
  }

  /** Equi-depth binning (feature quantization): per event type, 10
    * same-count value buckets via ntile with a (value, event_id) total
    * order — the deterministic form of quantile bucketing (a plain
    * ORDER BY value tie-breaks arbitrarily across engines). One window
    * pass + a 20-group agg; bucket edges emitted as integer cents.
    */
  def b1EquidepthBins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy(col("value"),
      col("event_id"))
    events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"),
        ntile(10).over(w).cast("long").as("tile"))
      .groupBy("event_type", "tile")
      .agg(count(lit(1)).as("n"),
        round(min(col("value")) * 100).cast("long").as("lo_cents"),
        round(max(col("value")) * 100).cast("long").as("hi_cents"))
  }

  /** Rolling 7-day distinct users per day — the sliding-window DISTINCT
    * aggregation (windowed countDistinct has no direct window-function
    * form). Shape: per-day distinct (one agg), then each (day, user)
    * fans out to the ≤7 target days it contributes to (explode of a
    * 7-element range — map-side, ×7 rows of 12 bytes), then one
    * distinct agg on (target_day, user). Linear in data with a small
    * constant; no self-join of day ranges, no window over collect_set.
    */
  def rd1RollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val du = events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val bounds = events(s, dir)
      .agg(min(to_date(col("ts"))).as("dmin"), max(to_date(col("ts"))).as("dmax"))
    du.select(col("user_id"), col("d"),
        explode(sequence(lit(0), lit(6))).as("off"))
      .select(col("user_id"), date_add(col("d"), col("off")).as("td"))
      .join(broadcast(bounds), col("td").between(col("dmin"), col("dmax")))
      .groupBy(col("td"))
      .agg(countDistinct(col("user_id")).as("u7"))
      .select(date_format(col("td"), "yyyy-MM-dd").as("day"), col("u7"))
  }

  /** M1 as a distributed transform: per-group MinMax scaling via window
    * min/max (app.py:232 scaler semantics, engine-side).
    */
  def m1MinmaxScale(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
    events(s, dir)
      .withColumn("mn", min(col("value")).over(w))
      .withColumn("mx", max(col("value")).over(w))
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("mn")) / (col("mx") - col("mn")), 6)
          .as("scaled_value"))
  }
}
