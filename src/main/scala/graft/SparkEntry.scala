package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has (a) an entry in
  * [[queries]] returning a deterministic DataFrame over the fixture
  * dir, and (b) where SQL-expressible, an equivalent DuckDB oracle in
  * [[oracleSql]] with *identical output column names* (the driver
  * sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q07StarJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_project"   -> (Relational.q01ScanProject _),
    "q02_filter"         -> (Relational.q02Filter _),
    "q03_global_agg"     -> (Relational.q03GlobalAgg _),
    "q04_distinct_agg"   -> (Relational.q04DistinctAgg _),
    "q05_groupby_agg"    -> (Relational.q05GroupbyAgg _),
    "q06_broadcast_join" -> (Relational.q06BroadcastJoin _),
    "q07_star_join"      -> (Relational.q07StarJoin _),
    "q08_semi_join"      -> (Relational.q08SemiJoin _),
    "q09_anti_join"      -> (Relational.q09AntiJoin _),
    "q10_outer_join"     -> (Relational.q10OuterJoin _),
    "q11_window_rank"    -> (Relational.q11WindowRank _),
    "q12_window_running" -> (Relational.q12WindowRunning _),
    "q13_topk"           -> (Relational.q13TopK _),
    "q14_setops"         -> (Relational.q14SetOps _),
    "q15_rollup"         -> (Relational.q15Rollup _),
    "q16_scalar_battery" -> (Relational.q16ScalarBattery _),
    "q17_tokens"         -> (Relational.q17Tokens _),
    "q17_wordcount"      -> (Relational.q17Wordcount _),
    "q17_json"           -> (Relational.q17Json _),
    "q18_approx_distinct" -> (Relational.q18ApproxDistinct _),
    "q19_dedup_count"    -> (Relational.q19DedupCount _),
    "q20_time_bucket"    -> (Relational.q20TimeBucket _),
    "q21_conditional_agg" -> (Relational.q21ConditionalAgg _),
    "q22_corr_subquery"  -> (Relational.q22CorrSubquery _),
  )

  /** DuckDB-equivalent ANSI SQL per query (same column names/types).
    * Omitted for approximate/non-SQL-expressible ops → driver records
    * a weaker rows-only check (q18). */
  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "q02_filter" ->
      """SELECT count(*) AS cnt FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06
        |  AND l_returnflag <> 'R'""".stripMargin,
    "q03_global_agg" ->
      """SELECT round(avg(length(text)), 6) AS avg_text_length,
        |       count(DISTINCT text) AS num_distinct_texts
        |FROM documents""".stripMargin,
    "q04_distinct_agg" ->
      "SELECT count(DISTINCT o_custkey) AS n_custkeys FROM orders",
    "q05_groupby_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q06_broadcast_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_star_join" ->
      """SELECT r_name,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q08_semi_join" ->
      """SELECT count(*) AS n_customers_with_orders FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,
    "q09_anti_join" ->
      """SELECT c_custkey FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY 1""".stripMargin,
    "q10_outer_join" ->
      """SELECT n_name, count(s_suppkey) AS n_suppliers
        |FROM nation LEFT JOIN supplier ON n_nationkey = s_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q12_window_running" ->
      """SELECT user_id, event_id,
        |       round(sum(value) OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |         AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q13_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q14_setops" ->
      """SELECT op, n_nations FROM (
        |  SELECT 'union' AS op, count(*) AS n_nations FROM (
        |    SELECT c_nationkey AS nk FROM customer
        |    UNION SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'intersect', count(*) FROM (
        |    SELECT c_nationkey FROM customer
        |    INTERSECT SELECT s_nationkey FROM supplier)
        |  UNION ALL
        |  SELECT 'except', count(*) FROM (
        |    SELECT c_nationkey FROM customer
        |    EXCEPT SELECT s_nationkey FROM supplier)
        |) ORDER BY op""".stripMargin,
    "q15_rollup" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       CAST(grouping(r_name) AS INT) AS g_region,
        |       CAST(grouping(n_name) AS INT) AS g_nation
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q16_scalar_battery" ->
      """SELECT o_orderkey,
        |       upper(c_name) AS name_upper,
        |       substring(c_name, 10, 8) AS name_tail,
        |       concat(c_mktsegment, '_', o_orderpriority) AS seg_prio,
        |       trim(concat('  ', c_mktsegment, '  ')) AS seg_trim,
        |       regexp_extract(c_name, '([0-9]+)', 1) AS cust_num,
        |       CAST(length(c_name) AS INT) AS name_len,
        |       CAST(year(o_orderdate) AS INT) AS order_year,
        |       CAST(month(o_orderdate) AS INT) AS order_month,
        |       CAST(date_diff('day', DATE '1995-01-01',
        |         CAST(o_orderdate AS DATE)) AS INT) AS days_since_95,
        |       round(abs(o_totalprice - 100000), 2) AS abs_delta,
        |       round(o_totalprice, 1) AS price_round1,
        |       CAST(floor(o_totalprice / 1000) AS BIGINT) AS price_k,
        |       round(power(o_totalprice / 100000, 2), 6) AS price_sq
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    "q17_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q17_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "q17_json" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    "q19_dedup_count" ->
      "SELECT count(DISTINCT text) AS n_unique_docs FROM documents",
    "q20_time_bucket" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_conditional_agg" ->
      """SELECT user_id,
        |       round(sum(CASE WHEN event_type = 'click' THEN value END), 2)
        |         AS click_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE o_totalprice > (SELECT avg(o2.o_totalprice) FROM orders o2
        |                      WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY 1""".stripMargin,
  )
}
