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
  )
}
