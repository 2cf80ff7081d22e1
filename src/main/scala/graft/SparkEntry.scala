package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2,
  * realized over the star-schema fixtures (FIXTURES.md §B).
  * `oracleSql`: DuckDB-equivalent ANSI SQL over the same parquet tables.
  * Column names and ordering are aligned between the two on purpose —
  * the driver sorts columns by name and hashes values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.topkCustomersByRegion(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w1_topk_by_scope"        -> ((s, d) => Relational.topkCustomersByRegion(s, d)),
    "a1_scalar_sum_coalesce"  -> ((s, d) => Relational.scalarSumCoalesce(s, d)),
    "a2_sum_by_group"         -> ((s, d) => Relational.sumByGroup(s, d)),
    "a3_count_by_group"       -> ((s, d) => Relational.countByGroup(s, d)),
    "a5_count_distinct"       -> ((s, d) => Relational.countDistinctPerGroup(s, d)),
    "a6_multi_agg"            -> ((s, d) => Relational.multiAggPerSupplier(s, d)),
    "a7_monthly_timeline"     -> ((s, d) => Relational.monthlyTimeline(s, d)),
    "a8_frontier_max"         -> ((s, d) => Relational.frontierMax(s, d)),
    "a9_pct_of_total"         -> ((s, d) => Relational.pctOfTotal(s, d)),
    "j2_threeway_revenue"     -> ((s, d) => Relational.threeWayRevenue(s, d)),
    "j3_join_then_filter"     -> ((s, d) => Relational.joinThenFilter(s, d)),
    "j4_scope_semi"           -> ((s, d) => Relational.scopeSemiJoin(s, d)),
    "j5_semi_in_subquery"     -> ((s, d) => Relational.semiInSubquery(s, d)),
    "j8_anti_never_ordered"   -> ((s, d) => Relational.antiNeverOrdered(s, d)),
    "j9_hierarchy_join"       -> ((s, d) => Relational.hierarchyJoin(s, d)),
    "p4_dynamic_filter"       -> ((s, d) => Relational.dynamicFilter(s, d)),
    "p7_keyword_like"         -> ((s, d) => Relational.keywordLike(s, d)),
    "p8_null_guards"          -> ((s, d) => Relational.nullGuards(s, d)),
    "w2_argmax_per_group"     -> ((s, d) => Relational.argmaxPerGroup(s, d)),
    "w3_recent_n"             -> ((s, d) => Relational.recentN(s, d)),
    "w5_pagination"           -> ((s, d) => Relational.pagination(s, d)),
    "u1_union_distinct"       -> ((s, d) => Relational.unionDistinct(s, d)),
    "u2_keep_last_dedup"      -> ((s, d) => Relational.keepLastDedup(s, d)),
    "u3_dedup_derived_key"    -> ((s, d) => Relational.dedupDerivedKey(s, d)),
    "j7_fuzzy_link"           -> ((s, d) => FuzzyLink.linkSuppliersToCustomers(s, d)),
    "s10_merge_upsert"        -> ((s, d) => MergeOps.mergeUpsert(s, d)),
    "s11_insert_ignore"       -> ((s, d) => MergeOps.insertIgnore(s, d)),
    "i1_update_log"           -> ((s, d) => Incremental.updateLogEntry(s, d)),
    "i2_watermark_filter"     -> ((s, d) => Incremental.watermarkFilter(s, d)),
    "f1_name_parse"           -> ((s, d) => Scalars.nameParse(s, d)),
    "f2_normalize_names"      -> ((s, d) => Scalars.normalizeNames(s, d)),
    "f11_date_coerce"         -> ((s, d) => Scalars.dateCoerce(s, d)),
    "f10_truncate_preview"    -> ((s, d) => Scalars.truncateAndFormat(s, d)),
    "f14_daily_counts"        -> ((s, d) => Scalars.dailyCounts(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "w1_topk_by_scope" ->
      """SELECT c.c_custkey, c.c_name,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS total_amount
         FROM orders o
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         JOIN region r ON n.n_regionkey = r.r_regionkey
         WHERE r.r_name = 'EUROPE'
         GROUP BY c.c_custkey, c.c_name
         ORDER BY total_amount DESC, c.c_custkey
         LIMIT 10""",
    "a1_scalar_sum_coalesce" ->
      """SELECT COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), CAST(0 AS DECIMAL(18,2))) AS total_amount
         FROM orders WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'""",
    "a2_sum_by_group" ->
      """SELECT o_orderpriority, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_amount
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "a3_count_by_group" ->
      """SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type ORDER BY event_type""",
    "a5_count_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "a6_multi_agg" ->
      """SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n_orders,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS total_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / COUNT(*) AS DECIMAL(18,2)) AS avg_price
         FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""",
    "a7_monthly_timeline" ->
      """SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month, o_orderstatus,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_amount
         FROM orders GROUP BY 1, 2 ORDER BY month, o_orderstatus""",
    "a8_frontier_max" ->
      """SELECT c_mktsegment, MAX(CAST(regexp_extract(c_name, '[0-9]+') AS INTEGER)) AS max_id
         FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "a9_pct_of_total" ->
      """WITH per_status AS (
           SELECT o_orderstatus, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_amount
           FROM orders GROUP BY o_orderstatus)
         SELECT o_orderstatus, total_amount,
           CAST(total_amount * 100 / SUM(total_amount) OVER () AS DECIMAL(18,6)) AS pct
         FROM per_status ORDER BY o_orderstatus""",
    "j2_threeway_revenue" ->
      """SELECT c.c_mktsegment, SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS revenue
         FROM lineitem l
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
    "j3_join_then_filter" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n_lines,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS revenue
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderstatus = 'F'
         GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""",
    "j4_scope_semi" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_amount
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "j5_semi_in_subquery" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "j8_anti_never_ordered" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE p_partkey NOT IN (
           SELECT l_partkey FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01')
         ORDER BY p_partkey""",
    "j9_hierarchy_join" ->
      """SELECT n.n_nationkey, n.n_name, r.r_name AS parent_name
         FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
         ORDER BY n.n_nationkey""",
    "p4_dynamic_filter" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer
         WHERE c_mktsegment = 'MACHINERY' AND c_acctbal >= 1000.0
           AND c_nationkey IN (1, 3, 5, 7)
         ORDER BY c_custkey""",
    "p7_keyword_like" ->
      """SELECT p_partkey, p_name, p_type FROM part
         WHERE lower(p_name) LIKE '%widget%' OR lower(p_name) LIKE '%bolt%'
         ORDER BY p_partkey""",
    "p8_null_guards" ->
      """SELECT COALESCE(NULLIF(o_orderstatus, 'O'), 'Unknown') AS status_or_unknown,
         COUNT(*) AS n FROM orders GROUP BY 1 ORDER BY status_or_unknown""",
    "w2_argmax_per_group" ->
      """SELECT c_mktsegment, c_custkey, c_name, c_acctbal FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) t
         WHERE rn = 1 ORDER BY c_mktsegment""",
    "w3_recent_n" ->
      """SELECT event_id, ts, user_id, event_type FROM events
         ORDER BY ts DESC, event_id LIMIT 20""",
    "w5_pagination" ->
      """SELECT c_custkey, c_name FROM customer
         ORDER BY c_custkey LIMIT 50 OFFSET 100""",
    "u1_union_distinct" ->
      """WITH u AS (
           SELECT * FROM orders WHERE o_orderstatus = 'F'
           UNION
           SELECT * FROM orders WHERE o_orderpriority = '1-URGENT')
         SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM u GROUP BY 1, 2 ORDER BY o_orderstatus, o_orderpriority""",
    "u2_keep_last_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM (
           SELECT l_orderkey, l_linenumber, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
           FROM lineitem) t
         WHERE rn = 1 ORDER BY l_orderkey""",
    "u3_dedup_derived_key" ->
      """SELECT CONCAT_WS('|', COALESCE(p_brand, ''), COALESCE(p_type, ''), CAST(p_size AS VARCHAR)) AS uid,
         MIN(p_partkey) AS first_partkey, COUNT(*) AS n_members
         FROM part GROUP BY 1 ORDER BY uid""",
    "j7_fuzzy_link" ->
      """WITH cn AS (
           SELECT c_custkey, c_name, c_nationkey,
             array_to_string(list_sort(regexp_split_to_array(trim(upper(trim(translate(c_name, '.,', '')))), '\s+')), ' ') AS norm_c
           FROM customer),
         sn AS (
           SELECT s_suppkey, s_name, s_nationkey,
             array_to_string(list_sort(regexp_split_to_array(trim(upper(trim(translate(replace(s_name, 'Supplier', 'Customer'), '.,', '')))), '\s+')), ' ') AS norm_s
           FROM supplier),
         scored AS (
           SELECT sn.s_suppkey, sn.s_name, cn.c_custkey, cn.c_name,
             CASE WHEN greatest(length(norm_c), length(norm_s)) = 0 THEN 100
                  ELSE CAST(floor(100 * (1 - CAST(levenshtein(norm_c, norm_s) AS DOUBLE)
                       / greatest(length(norm_c), length(norm_s)))) AS INTEGER) END AS score
           FROM sn JOIN cn ON sn.s_nationkey = cn.c_nationkey),
         ranked AS (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY s_suppkey
             ORDER BY score DESC, c_custkey) AS rn
           FROM scored)
         SELECT s_suppkey, s_name, c_custkey, c_name, score
         FROM ranked WHERE rn = 1 AND score > 85 ORDER BY s_suppkey""",
    "s10_merge_upsert" ->
      """WITH existing AS (
           SELECT user_id AS e_user, event_type AS e_type, COUNT(*) AS e_n,
             SUM(CAST(value AS DECIMAL(18,2))) AS e_total
           FROM events WHERE ts < TIMESTAMP '2024-01-03 00:00:00' GROUP BY 1, 2),
         incoming AS (
           SELECT user_id AS i_user, event_type AS i_type, COUNT(*) AS i_n,
             SUM(CAST(value AS DECIMAL(18,2))) AS i_total
           FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' GROUP BY 1, 2)
         SELECT COALESCE(i_user, e_user) AS user_id,
           COALESCE(i_type, e_type) AS event_type,
           COALESCE(i_n, e_n) AS n_events,
           COALESCE(i_total, e_total) AS total_value,
           CASE WHEN e_user IS NOT NULL AND i_user IS NOT NULL THEN 'updated'
                WHEN e_user IS NULL THEN 'inserted' ELSE 'unchanged' END AS merge_action
         FROM existing FULL OUTER JOIN incoming
           ON e_user = i_user AND e_type = i_type
         ORDER BY user_id, event_type""",
    "s11_insert_ignore" ->
      """SELECT user_id, event_type, MIN(ts) AS first_seen, COUNT(*) AS n_events
         FROM events e
         WHERE ts >= TIMESTAMP '2024-01-25 00:00:00'
           AND NOT EXISTS (
             SELECT 1 FROM events x
             WHERE x.ts < TIMESTAMP '2024-01-03 00:00:00'
               AND x.user_id = e.user_id AND x.event_type = e.event_type)
         GROUP BY user_id, event_type ORDER BY user_id, event_type""",
    "i1_update_log" ->
      """SELECT 'events' AS table_name, MAX(ts) AS last_update,
         COUNT(*) AS records_updated FROM events""",
    "i2_watermark_filter" ->
      """SELECT event_type, COUNT(*) AS n, MIN(ts) AS min_ts
         FROM events
         WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
         GROUP BY event_type ORDER BY event_type""",
    "f1_name_parse" ->
      """SELECT c_custkey,
           split_part(c_name || ', ' || c_mktsegment, ', ', 1) AS last_name,
           split_part(c_name || ', ' || c_mktsegment, ', ', 2) AS first_name,
           split_part(c_name || ', ' || c_mktsegment, ', ', 2) || ' ' ||
             split_part(c_name || ', ' || c_mktsegment, ', ', 1) AS display_name
         FROM customer ORDER BY c_custkey""",
    "f2_normalize_names" ->
      """SELECT s_suppkey, '  ' || lower(s_name) || ' .,' AS noisy,
           upper(trim(translate('  ' || lower(s_name) || ' .,', '.,', ''))) AS normalized
         FROM supplier ORDER BY s_suppkey""",
    "f11_date_coerce" ->
      """WITH coerced AS (
           SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL
                       ELSE CAST(o_orderdate AS DATE) END AS parsed
           FROM orders)
         SELECT year(parsed) AS yr, COUNT(*) AS n FROM coerced
         WHERE parsed IS NOT NULL GROUP BY 1 ORDER BY yr""",
    "f10_truncate_preview" ->
      """SELECT doc_id, substring(text, 1, 100) AS preview, length(text) AS text_len
         FROM documents ORDER BY doc_id""",
    "f14_daily_counts" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,2))) AS total_value
         FROM events GROUP BY 1 ORDER BY day""",
  )
}
