package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers a query here; SQL-expressible ones
  * also carry DuckDB oracle SQL (same column names, same ordering, floats
  * rounded identically on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.groupAvgBrandFlag(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core (§2.2–2.7) ---
    "q01_groupavg_brand_flag" -> (Relational.groupAvgBrandFlag _),
    "q02_groupavg_type_status" -> (Relational.groupAvgTypeStatus _),
    "q03_filter_eq" -> (Relational.filterEq _),
    "q04_having" -> (Relational.havingSupport _),
    "q05_join_left_outer" -> (Relational.joinLeftOuter _),
    "q06_join_semi" -> (Relational.joinSemi _),
    "q07_join_anti" -> (Relational.joinAnti _),
    "q08_topk" -> (Relational.topK _),
    "q09_distinct" -> (Relational.distinctPairs _),
    "q10_count_distinct" -> (Relational.countDistinct _),
    "q11_scalar_funcs" -> (Relational.scalarFuncs _),
    "q12_group_collect" -> (Relational.groupCollect _),
    "q13_fmt_11dp" -> (Relational.fmt11dp _),
    "q14_sql_api" -> (Relational.sqlApi _),
    // --- basket analytics (§2.9 G1) ---
    "q20_freq_items" -> ((s, d) => Baskets.freqItems(s, d)),
    "q21_freq_pairs" -> ((s, d) => Baskets.freqPairs(s, d)),
    "q22_son" -> ((s, d) => Baskets.son(s, d)),
    // --- graph (§2.9 G2–G6) ---
    "q30_cograph_edges" -> (GraphOps.edgesQuery _),
    "q31_degrees" -> (GraphOps.degrees _),
    "q32_conncomp" -> (GraphOps.connectedComponents _),
    "q33_betweenness" -> ((s, d) => GraphOps.betweenness(s, d)),
    "q34_communities" -> ((s, d) => GraphOps.communities(s, d)),
    "q35_modularity_curve" -> ((s, d) => GraphOps.modularityCurve(s, d)),
  )

  /** DuckDB oracle SQL per query (omitted → driver does a rows-only check).
    * Table names resolve against the same parquet fixtures. */
  def oracleSql: Map[String, String] = Map(
    "q01_groupavg_brand_flag" ->
      """SELECT p_brand, l_returnflag, round(avg(l_extendedprice), 6) AS avg_price,
        |       round(sum(l_quantity), 6) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |              JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY p_brand, l_returnflag ORDER BY p_brand, l_returnflag""".stripMargin,
    "q02_groupavg_type_status" ->
      """SELECT p_type, o_orderstatus, round(avg(l_extendedprice), 6) AS avg_price, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |              JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY p_type, o_orderstatus ORDER BY p_type, o_orderstatus""".stripMargin,
    "q03_filter_eq" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin,
    "q04_having" ->
      """SELECT l_partkey, count(*) AS n_orders
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |GROUP BY l_partkey HAVING count(*) >= 40 ORDER BY l_partkey""".stripMargin,
    "q05_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |       round(coalesce(sum(o_totalprice), 0), 6) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q06_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q07_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q08_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q10_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_scalar_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       least(l_partkey, l_suppkey) AS lo_key,
        |       greatest(l_partkey, l_suppkey) AS hi_key,
        |       concat_ws('|', l_returnflag, l_linestatus) AS tag,
        |       round(l_extendedprice * (1.0 - l_discount), 6) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q12_group_collect" ->
      """SELECT l_orderkey,
        |       string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY l_partkey) AS basket,
        |       count(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q13_fmt_11dp" ->
      """SELECT l_returnflag, printf('%.11f', avg(l_quantity)) AS avg_qty_11dp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q14_sql_api" ->
      """SELECT p_brand, round(avg(l_extendedprice), 6) AS avg_price, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q20_freq_items" ->
      """SELECT l_partkey, count(*) AS support
        |FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |GROUP BY l_partkey HAVING count(*) >= 40 ORDER BY l_partkey""".stripMargin,
    "q21_freq_pairs" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS item1, c.l_partkey AS item2, count(*) AS support
        |FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY item1, item2""".stripMargin,
    // SON at sf0.01 resolves to support=3 where the frequent itemsets are
    // exactly the size-1/size-2 sets (verified: no triple reaches support 3),
    // so the oracle is the union of the singleton and pair queries.
    "q22_son" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ones AS (SELECT l_partkey, count(*) AS n FROM b GROUP BY 1 HAVING count(*) >= 3),
        |twos AS (SELECT a.l_partkey AS x, c.l_partkey AS y, count(*) AS n
        |         FROM b a JOIN b c ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        |         GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT itemset, size, support FROM (
        |  SELECT CAST(l_partkey AS VARCHAR) AS itemset, 1 AS size, n AS support FROM ones
        |  UNION ALL
        |  SELECT CAST(x AS VARCHAR) || ',' || CAST(y AS VARCHAR), 2, n FROM twos)
        |ORDER BY size, itemset""".stripMargin,
    "q30_cograph_edges" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT a.c AS u, b.c AS v, count(*) AS shared
        |FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |GROUP BY 1, 2 HAVING count(*) >= 3 ORDER BY u, v""".stripMargin,
    "q31_degrees" ->
      """WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
        |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a.c AS u, b.c AS v FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
        |      GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT vertex, count(*) AS degree
        |FROM (SELECT u AS vertex FROM e UNION ALL SELECT v FROM e)
        |GROUP BY vertex ORDER BY vertex""".stripMargin,
  )
}
