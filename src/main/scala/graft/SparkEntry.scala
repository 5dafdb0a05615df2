package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.CoreQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from the SURVEY.md §2
  * inventory (or a §7.4 extension) realized over the driver test corpus;
  * [[oracleSql]] carries the DuckDB-equivalent SQL for the hash compare.
  * Column names and types are aligned pairwise (the driver sorts columns
  * by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1LineitemAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // sources / projections / scalar expressions (§2.1-2.2)
    "s1_scan_filter_project" -> (CoreQueries.s1ScanFilterProject _),
    "p1_regex_extract" -> (CoreQueries.p1RegexExtract _),
    "p4_cast_epoch" -> (CoreQueries.p4CastEpoch _),
    "p9_concat_key" -> (CoreQueries.p9ConcatKey _),
    "p10_replace_key" -> (CoreQueries.p10ReplaceKey _),
    "p13_date_format_agg" -> (CoreQueries.p13DateFormatAgg _),
    // aggregations (§2.3)
    "a1_latest_per_key" -> (CoreQueries.a1LatestPerKey _),
    "a2_window_stats" -> (CoreQueries.a2WindowStats _),
    "a4_distinct_terms" -> (CoreQueries.a4DistinctTerms _),
    "a5_multi_terms_pairs" -> (CoreQueries.a5MultiTermsPairs _),
    "a6_incremental_max_ts" -> (CoreQueries.a6IncrementalMaxTs _),
    // window functions / sorts / top-k (§2.4-2.5)
    "w1_rolling_sma" -> (CoreQueries.w1RollingSma _),
    "w5_top1_desc" -> (CoreQueries.w5Top1Desc _),
    "w6_topk_recent" -> (CoreQueries.w6TopkRecent _),
    "w7_range_scan_asc" -> (CoreQueries.w7RangeScanAsc _),
    "w8_get_by_key" -> (CoreQueries.w8GetByKey _),
    // relational spine: agg / joins / set ops
    "q1_lineitem_agg" -> (CoreQueries.q1LineitemAgg _),
    "j1_broadcast_join_agg" -> (CoreQueries.j1BroadcastJoinAgg _),
    "j2_shuffle_join_agg" -> (CoreQueries.j2ShuffleJoinAgg _),
    "j3_semi_join" -> (CoreQueries.j3SemiJoin _),
    "j4_anti_join" -> (CoreQueries.j4AntiJoin _),
    "u1_union_all" -> (CoreQueries.u1UnionAll _),
    // ML surface (§2.6)
    "m1_minmax_scale" -> (CoreQueries.m1MinmaxScale _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "s1_scan_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity < 5 AND l_returnflag = 'R'""",
    "p1_regex_extract" ->
      """SELECT doc_id, regexp_extract(source, '^src([0-9]+)$', 1) AS src_num, lang
         FROM documents""",
    "p4_cast_epoch" ->
      """SELECT event_id, CAST(epoch_ms(ts)//1000 AS BIGINT) AS ts_s, value
         FROM events""",
    "p9_concat_key" ->
      """SELECT event_type || '_' || CAST(user_id AS VARCHAR) || '_'
                || CAST(CAST(epoch_ms(ts)//1000 AS BIGINT) AS VARCHAR) AS doc_id,
                value
         FROM events""",
    "p10_replace_key" ->
      """SELECT doc_id, replace(source, 'src', 'SRC-') AS src_key FROM documents""",
    "p13_date_format_agg" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
         FROM orders GROUP BY 1""",
    "a1_latest_per_key" ->
      """SELECT user_id, event_id AS latest_event_id,
                CAST(epoch_ms(ts)//1000 AS BIGINT) AS latest_ts_s, value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1""",
    "a2_window_stats" ->
      """SELECT CAST(epoch_ms(ts)//600000*600 AS BIGINT) AS window_start_s,
                event_type,
                floor(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                  / count(*) * 10000 + 0.5) / 10000 AS avg_value,
                min(value) AS min_value, max(value) AS max_value,
                count(*) AS event_count
         FROM events GROUP BY 1, 2""",
    "a4_distinct_terms" ->
      """SELECT DISTINCT event_type FROM events ORDER BY event_type LIMIT 500""",
    "a5_multi_terms_pairs" ->
      """SELECT o_orderstatus || '_' || o_orderpriority AS pair, count(*) AS cnt
         FROM orders GROUP BY o_orderstatus, o_orderpriority
         ORDER BY pair LIMIT 1000""",
    "a6_incremental_max_ts" ->
      """SELECT max(CAST(epoch_ms(ts)//1000 AS BIGINT)) AS max_ts_s,
                count(*) AS n_rows
         FROM events WHERE event_type = 'click'""",
    "w1_rolling_sma" ->
      """SELECT user_id, event_id,
                floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w7 AS DOUBLE)
                  / count(*) OVER w7 * 10000 + 0.5) / 10000 AS sma_7,
                floor(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w30 AS DOUBLE)
                  / count(*) OVER w30 * 10000 + 0.5) / 10000 AS sma_30
         FROM events
         WINDOW w7 AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
                w30 AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)""",
    "w5_top1_desc" ->
      """SELECT event_id, CAST(epoch_ms(ts)//1000 AS BIGINT) AS ts_s, value
         FROM events WHERE event_type = 'purchase'
         ORDER BY ts DESC, event_id DESC LIMIT 1""",
    "w6_topk_recent" ->
      """SELECT event_id, CAST(epoch_ms(ts)//1000 AS BIGINT) AS ts_s, value
         FROM events ORDER BY ts DESC, event_id DESC LIMIT 100""",
    "w7_range_scan_asc" ->
      """SELECT event_id, CAST(epoch_ms(ts)//1000 AS BIGINT) AS ts_s,
                event_type, value
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           AND ts < TIMESTAMP '2024-01-12 00:00:00'
         ORDER BY ts, event_id LIMIT 10000""",
    "w8_get_by_key" ->
      """SELECT event_id, user_id, event_type,
                CAST(epoch_ms(ts)//1000 AS BIGINT) AS ts_s, value
         FROM events WHERE event_id = 4242""",
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS sum_base_price,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS sum_disc_price,
                floor(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                  / count(*) * 10000 + 0.5) / 10000 AS avg_disc,
                count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "j1_broadcast_join_agg" ->
      """SELECT p_brand, count(*) AS cnt,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
                  AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "j2_shuffle_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",
    "j3_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "j4_anti_join" ->
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "u1_union_all" ->
      """SELECT event_type, count(*) AS cnt FROM (
           SELECT event_type FROM events WHERE event_type = 'click'
           UNION ALL
           SELECT event_type FROM events WHERE event_type = 'error')
         GROUP BY event_type""",
    "m1_minmax_scale" ->
      """SELECT event_id, event_type,
                round((value - mn) / (mx - mn), 6) AS scaled_value
         FROM (SELECT *, min(value) OVER (PARTITION BY event_type) AS mn,
                      max(value) OVER (PARTITION BY event_type) AS mx
               FROM events)""",
  )
}
