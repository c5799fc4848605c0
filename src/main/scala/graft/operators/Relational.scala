package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator coverage (SURVEY.md §2.2–2.7): projections, filters,
  * equi/outer/semi/anti joins, partial+final hash aggregation, HAVING,
  * distinct, top-k, composite sorts, group-to-collection aggregation and the
  * scalar-function surface (least/greatest, concat_ws, format, casts).
  *
  * Reference semantics being re-expressed (cites into /root/reference/):
  *  - task1 avg-by-(movie,gender): `1-Group Average Calculation/task1.scala:60-83`
  *  - task2 avg-by-(genre,gender): `1-Group Average Calculation/task2.scala:15-45`
  *  - gender equality filter:      `2-Market Basket Analysis/Solutions/SON.scala:55-57`
  *  - HAVING-style support filter: `SON.scala:263`
  *
  * Scale notes: every query here is a declarative plan — Catalyst pushes
  * filters/projections into the parquet scan, picks broadcast-hash joins for
  * the small dimension sides (`part`, `customer`), and emits partial/final
  * HashAggregate pairs (map-side combine) for every groupBy, which is exactly
  * the hand-rolled `reduceByKey` structure of the reference but codegen'd.
  * Nothing below collects to the driver.
  */
object Relational {

  private def r6(c: Column): Column = round(c, 6)

  /** Flagship (task1 analog): avg(l_extendedprice) by (p_brand, l_returnflag)
    * over lineitem ⋈ part ⋈ orders. Mirrors ratings⋈users → groupBy(mid,
    * gender) → avg (`task1.scala:64-76`). `part` is broadcast (25 brands /
    * 2k–20k rows) so the only shuffle is the final aggregation exchange.
    */
  def groupAvgBrandFlag(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    val o = Tables(spark, dir, "orders")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("p_brand"), col("l_returnflag"))
      .agg(
        r6(avg("l_extendedprice")).as("avg_price"),
        r6(sum("l_quantity")).as("sum_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("p_brand", "l_returnflag")
  }

  /** task2 analog: avg by (p_type, o_orderstatus) — the "genre string is the
    * group key" variant (`task2.scala:23,32-38`). */
  def groupAvgTypeStatus(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    val o = Tables(spark, dir, "orders")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("p_type"), col("o_orderstatus"))
      .agg(r6(avg("l_extendedprice")).as("avg_price"), count(lit(1)).as("cnt"))
      .orderBy("p_type", "o_orderstatus")
  }

  /** Equality filter + projection (P1/P2: `SON.scala:55-57` gender filter). */
  def filterEq(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  /** HAVING-style threshold on a grouped count (P3: `SON.scala:263`). */
  def havingSupport(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .groupBy("l_partkey").agg(count(lit(1)).as("n_orders"))
      .where(col("n_orders") >= 40)
      .orderBy("l_partkey")

  /** Left outer join + NULL-side handling (J5: `Community.scala:40-41`):
    * order count per customer including zero-order customers. */
  def joinLeftOuter(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        r6(coalesce(sum("o_totalprice"), lit(0.0))).as("total_spend"))
      .orderBy("c_custkey")
  }

  /** Semi-join membership probe (J6: the reference's leftOuterJoin+nonEmpty
    * existence test, `Community.scala:40-41`). */
  def joinSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders").where(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Anti-join (P5: edge-removal membership test, `Community.scala:81,95`):
    * customers with no 'F'-status order. */
  def joinAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders").where(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Top-k by value with deterministic tie-break (O3: `Community.scala:79`).
    * `orderBy(...).limit(k)` compiles to TakeOrderedAndProject — a per-
    * partition heap + driver merge, no global sort at scale. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), r6(col("o_totalprice")).as("o_totalprice"))

  /** DISTINCT over a projection (A5: `SON.scala:219`). */
  def distinctPairs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** COUNT(DISTINCT) per group (A6: `Community.scala:123,128`). */
  def countDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_partkey")).as("n_parts"),
        count_distinct(col("l_suppkey")).as("n_supps"))
      .orderBy("l_returnflag")

  /** Scalar-function surface (F6/F7/F4: pair canonicalization via
    * least/greatest as in `Betweenness.scala:118-121`, concat_ws line
    * building as in `task1.scala:81`). Pure projection — stays in one
    * whole-stage-codegen span with the scan. */
  def scalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        least(col("l_partkey"), col("l_suppkey")).as("lo_key"),
        greatest(col("l_partkey"), col("l_suppkey")).as("hi_key"),
        concat_ws("|", col("l_returnflag"), col("l_linestatus")).as("tag"),
        r6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Group-to-collection aggregation (A4: `groupByKey` baskets,
    * `SON.scala:60`) rendered as a deterministic string: numeric-sort the
    * collected array THEN stringify (lexicographic sort would diverge). */
  def groupCollect(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(transform(sort_array(collect_list(col("l_partkey"))),
          _.cast("string")), ",").as("basket"),
        count(lit(1)).as("n_items"))
      .orderBy("l_orderkey")

  /** 11-decimal fixed-point formatting parity (F3: `"%.11f".format`,
    * `task1.scala:81`). */
  def fmt11dp(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("a"))
      .select(col("l_returnflag"), format_string("%.11f", col("a")).as("avg_qty_11dp"))
      .orderBy("l_returnflag")

  /** Global scalar aggregates, no grouping (A7: `Community.scala:25,43-44`
    * numEdges / driver-side sum — here a single partial+final agg, no
    * driver loop). */
  def globalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .agg(count(lit(1)).as("n_rows"),
        r6(sum("l_extendedprice")).as("total_price"),
        r6(avg("l_discount")).as("avg_discount"),
        count_distinct(col("l_orderkey")).as("n_orders"))

  /** Relational set operations (absent from the reference, §2.10 — engine
    * completeness): customers in BUILDING vs customers with open orders. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val building = c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val withOpen = c.join(o.where(col("o_orderstatus") === "O"),
      c("c_custkey") === o("o_custkey"), "left_semi").select("c_custkey")
    building.intersect(withOpen).withColumn("rel", lit("both"))
      .unionAll(building.except(withOpen).withColumn("rel", lit("building_only")))
      .orderBy("rel", "c_custkey")
  }

  /** Running-total window frame (ROWS UNBOUNDED PRECEDING): cumulative
    * spend per customer over order time. */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .where(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        r6(sum("o_totalprice").over(w)).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** ROLLUP hierarchy totals (brand → grand total); null group keys
    * coalesced to 'ALL' so the cross-engine compare is null-free. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .rollup(col("p_brand"))
      .agg(count(lit(1)).as("cnt"), r6(sum("l_quantity")).as("sum_qty"))
      .select(coalesce(col("p_brand"), lit("ALL")).as("brand"), col("cnt"), col("sum_qty"))
      .orderBy("brand")
  }

  /** Sketch aggregates — the approximate tier for 100 TB interactive
    * queries: HyperLogLog++ distinct counts and t-digest-style quantiles
    * in one pass, constant memory. No oracle (DuckDB's sketches differ
    * algorithmically); accuracy vs exact is asserted in RelationalSpec. */
  def sketches(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        round(element_at(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)), 1), 2).as("p50_price"),
        round(element_at(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)), 2), 2).as("p95_price"))
      .orderBy("l_returnflag")

  /** RANGE window frame (value-based, vs [[windowRunning]]'s ROWS frame):
    * trailing-30-day spend per customer at each order. The frame is
    * defined over a numeric epoch-seconds order key so both engines
    * resolve identical peer sets (RANGE includes value-ties regardless of
    * row order — deterministic where a ROWS frame would not be). */
  def windowRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("odate_s")
      .rangeBetween(-30L * 86400, Window.currentRow)
    Tables(spark, dir, "orders")
      .where(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("odate_s"), col("o_totalprice"))
      .withColumn("spend_30d", r6(sum("o_totalprice").over(w)))
      .select("o_custkey", "o_orderkey", "odate_s", "spend_30d")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q1e: the custom typed [[graft.functions.GeoMean]] Aggregator in a
    * grouped aggregation, also registered on the SQL surface. */
  def geoMean(spark: SparkSession, dir: String): DataFrame = {
    val gm = udaf(graft.functions.GeoMean)
    spark.udf.register("geomean", gm)
    Tables(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(gm(col("l_extendedprice")), 6).as("gm_price"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag")
  }

  /** PIVOT (long→wide reshape): order counts + spend per priority, one
    * column pair per order status. The status values are enumerated
    * explicitly — at scale the implicit form would need a separate
    * distinct pass to discover them, and pinned values keep the output
    * schema stable for the cross-engine compare. Plans as a single
    * hash aggregate over CASE projections — one shuffle, no join. */
  def pivotByStatus(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), r6(sum("o_totalprice")).as("spend"))
      .select(col("o_orderpriority"),
        coalesce(col("F_n"), lit(0L)).as("f_n"), col("F_spend").as("f_spend"),
        coalesce(col("O_n"), lit(0L)).as("o_n"), col("O_spend").as("o_spend"),
        coalesce(col("P_n"), lit(0L)).as("p_n"), col("P_spend").as("p_spend"))
      .orderBy("o_orderpriority")

  /** Exact interpolated percentiles (percentile_cont semantics) per group
    * — the exact twin of [[sketches]]' approximate quantiles. */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.25)), 6).as("p25"),
        round(percentile(col("l_extendedprice"), lit(0.5)), 6).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.75)), 6).as("p75"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 6).as("p99"))
      .orderBy("l_returnflag")

  /** ANALYZE-shape per-column statistics (count / nulls / exact NDV /
    * min / max / mean) in ONE scan: a single wide aggregate row reshaped
    * to per-column rows with `stack` — the profile pass a pipeline runs
    * before choosing join strategies or partition counts. The exact NDVs
    * make Catalyst plan one Expand (row ×4) before the shuffle; at 100 TB
    * swap them for approx_count_distinct (the q19 sketch tier) and the
    * whole profile collapses to one constant-memory pass. */
  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_partkey")
    // one narrow aggregate subtree PER COLUMN, unioned — not one wide agg
    // reshaped with stack: four count_distincts in one Aggregate make
    // Catalyst Expand every row ×(cols+1) into 13-wide null-padded rows
    // feeding a single hash aggregate keyed by every column's value space
    // at once. Per-column subtrees each scan ONE parquet column (same
    // total I/O — the wide form read all four), expand only ×2 (distinct
    // vs plain gid), and run as independent parallel stages. avg_v is an
    // exact decimal sum ÷ non-null count, NOT avg(double): double
    // summation is order-dependent, the per-column plan changed the
    // partial-aggregation order, and l_extendedprice's true mean at
    // sf0.1 sits 1.7e-7 from a 6-decimal rounding boundary — the r13
    // oracle-hash break. The decimal sum is order-independent and its
    // 6-decimal rounding matches the oracle's round(avg(c), 6).
    val l = Tables(spark, dir, "lineitem")
    cols.map { c =>
        l.select(col(c)).agg(
          count(lit(1)).as("n"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(col(c)).as("ndv"),
          r6(min(col(c)).cast("double")).as("min_v"),
          r6(max(col(c)).cast("double")).as("max_v"),
          r6(sum(col(c).cast("decimal(38,12)")).cast("double") / count(col(c))).as("avg_v"))
        .select(lit(c).as("col_name"), col("n"), col("n_nulls"), col("ndv"),
          col("min_v"), col("max_v"), col("avg_v"))
      }
      .reduce(_.unionAll(_))
      .orderBy("col_name")
  }

  /** Bag-semantics set ops ([[setOps]]' multiset twin): EXCEPT ALL keeps
    * duplicate multiplicity (n−m copies survive), which set-EXCEPT
    * destroys — the difference matters for event streams where repeat
    * counts are the signal. */
  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val shipped = l.where(col("l_linestatus") === "F").select("l_partkey")
    val returned = l.where(col("l_returnflag") === "R").select("l_partkey")
    shipped.exceptAll(returned)
      .groupBy("l_partkey").agg(count(lit(1)).as("surplus"))
      .orderBy("l_partkey")
  }

  /** collect_set (deduplicated group-to-collection), sorted for a stable
    * cross-engine compare — [[groupCollect]]'s DISTINCT twin. */
  def groupCollectSet(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_returnflag"))).as("flags"),
        count(lit(1)).as("n_lines"))
      .select(col("l_orderkey"), concat_ws(",", col("flags")).as("flags"),
        col("n_lines"))
      .orderBy("l_orderkey")

  /** CUBE: all grouping-set combinations of (brand, returnflag) — the
    * full lattice [[rollupAgg]]'s hierarchy is a slice of. Null group
    * keys coalesced for a null-free cross-engine compare. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .cube(col("p_brand"), col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"), r6(sum("l_quantity")).as("sum_qty"))
      .select(coalesce(col("p_brand"), lit("ALL")).as("brand"),
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        col("cnt"), col("sum_qty"))
      .orderBy("brand", "flag")
  }

  /** NTILE window: orders of each customer split into spend quartiles —
    * deterministic because the ordering is total (totalprice, orderkey). */
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables(spark, dir, "orders")
      .where(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("spend_quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Correlated scalar subquery through the SQL surface — orders above
    * their own customer's average spend. Catalyst decorrelates this into
    * an aggregate + join; the oracle runs the identical SQL. */
  def aboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 6) AS price
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders i
        |                            WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** The SQL surface: the same flagship query through `spark.sql` over
    * registered views — proves users can run plain SQL against the engine. */
  def sqlApi(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT p_brand, round(avg(l_extendedprice), 6) AS avg_price, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  /** Explicit GROUPING SETS — the general lattice [[rollupAgg]] and
    * [[cubeAgg]] are special cases of: two one-dimension marginals plus the
    * grand total, with no cross terms (a CUBE would add them). One Expand
    * over the named sets, then one hash aggregate — the same partial/final
    * shape as a plain GROUP BY, ×|sets| rows into the shuffle. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |       coalesce(l_linestatus, 'ALL') AS status,
        |       count(*) AS cnt, round(sum(l_quantity), 6) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY flag, status""".stripMargin)
  }

  /** INTERSECT ALL — [[setOpsAll]]'s multiset dual: min(n, m) copies of
    * each common element survive, where set-INTERSECT keeps one. */
  def intersectAllOp(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables(spark, dir, "lineitem")
    val shipped = l.where(col("l_linestatus") === "F").select("l_partkey")
    val returned = l.where(col("l_returnflag") === "R").select("l_partkey")
    shipped.intersectAll(returned)
      .groupBy("l_partkey").agg(count(lit(1)).as("n_common"))
      .orderBy("l_partkey")
  }

  /** Count-Min-sketch heavy hitters: keys whose exact count ≥ `threshold`,
    * found as sketch → shortlist → exact-verify. Pass 1 folds every key
    * into ONE mergeable CMS (`cms_agg`, Spark's own sketch aggregate —
    * bytes, not keys, cross the exchange); the driver ships the sketch
    * back as a literal and pass 2 keeps only rows whose ESTIMATED count
    * clears the threshold before the exact aggregation. CMS never
    * underestimates, so no true heavy hitter is lost (the result equals
    * the plain GROUP BY ... HAVING oracle exactly); on zipfian data ~all
    * light-key rows are dropped BEFORE the shuffle, which at 100 TB is
    * the difference between shuffling the corpus and shuffling the heavy
    * tail. `eps` bounds the overestimate at eps·N — size it to the
    * threshold's selectivity (φ·N/2), independent of corpus size. */
  def cmsHeavyHitters(spark: SparkSession, dir: String,
      threshold: Long = 45, eps: Double = 4e-5): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val keys = Tables(spark, dir, "lineitem").select("l_partkey")
    val sk = keys.agg(call_function("cms_agg", col("l_partkey"),
        lit(eps), lit(0.99), lit(42)).as("sk"))
      .head.getAs[Array[Byte]]("sk")
    keys
      .where(call_function("cms_estimate", lit(sk), col("l_partkey")) >= threshold)
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= threshold)
      .orderBy("l_partkey")
  }

  /** q8l: FULL OUTER join with danglers on BOTH sides — parts returned in
    * lineitem (flag R) against parts of one brand: a returned part of
    * another brand dangles left, a never-returned brand part dangles
    * right. The nullable columns stay NULL (the join's null semantics are
    * the point); `side` labels the provenance. Same broadcast-ability as
    * any dimension join — FULL OUTER only forbids broadcasting the side
    * that must produce unmatched rows, and Catalyst picks accordingly. */
  def fullOuterParts(spark: SparkSession, dir: String,
      brand: String = "Brand#11"): DataFrame = {
    val returned = Tables(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n_returns"))
    val branded = Tables(spark, dir, "part")
      .where(col("p_brand") === brand)
      .select(col("p_partkey"), round(col("p_retailprice"), 6).as("price"))
    returned.join(branded, col("l_partkey") === col("p_partkey"), "full_outer")
      .select(
        coalesce(col("l_partkey"), col("p_partkey")).as("partkey"),
        col("n_returns"), col("price"),
        when(col("l_partkey").isNotNull && col("p_partkey").isNotNull, "both")
          .when(col("l_partkey").isNotNull, "returned_only")
          .otherwise("brand_only").as("side"))
      .orderBy("partkey")
  }

  /** q8s: distribution-position windows — percent_rank + cume_dist of each
    * customer's balance within its market segment (the normalized-rank
    * features a scoring pipeline derives). Sort order inside the window is
    * fully pinned (balance, then key) so both engines rank identically.
    * One partitioned window: segment-keyed shuffle, per-partition sort —
    * no global sort at any scale. */
  def percentRankBal(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** q8t: UNPIVOT/melt — the wide-to-long reshape dual of q1a's PIVOT,
    * proven as a round trip: per-priority order totals pivoted to one
    * column per status, melted back with `Dataset.unpivot`, which must
    * land exactly on the plain GROUP BY (priority, status) — the oracle.
    * Absent combinations surface as NULL cells in the wide form and are
    * dropped on melt, mirroring their absence from the long form. */
  def unpivotTotals(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(sum("o_totalprice"), 6))
    wide.unpivot(Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")), "status", "total")
      .where(col("total").isNotNull)
      .orderBy("o_orderpriority", "status")
  }

  /** q8x: exact MEDIAN per group (interpolated 0.5-percentile — both
    * engines average the middle pair on even counts), beside avg to show
    * the robust/non-robust center pair. Exact medians need the per-group
    * values together: one segment-keyed shuffle; for 100 TB sketch-grade
    * accuracy the approx-quantile route is q19. */
  def medianBal(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(round(median(col("c_acctbal")), 6).as("med_bal"),
        round(avg("c_acctbal"), 6).as("avg_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  /** q9a: deterministic per-group MODE — most frequent nation per market
    * segment, ties broken to the smallest key (an engine must pin tie
    * order or the result is run-dependent; Spark's built-in `mode` and
    * DuckDB's leave ties unspecified, so the engine formulation IS the
    * rank-1-of-count window). The row_number pattern is rewritten by
    * [[graft.plans.TopKRewrite]] onto the native TopKPerGroup operator —
    * mode rides the same bounded-heap physical plan as q61/q66. */
  def modeNation(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir, "customer")
      .groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("n").desc, col("c_nationkey"))
    counts.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("c_mktsegment"), col("c_nationkey").as("mode_nation"), col("n"))
      .orderBy("c_mktsegment")
  }

  /** q9b: equal-width histogram of order totals — the profiling primitive
    * behind length/price-distribution dashboards. Global min/max is a
    * broadcast scalar; binning is pure arithmetic replayed identically in
    * the oracle (same IEEE ops in the same order), and the top edge
    * clamps into the last bin. One scan + one tiny agg + one bin-keyed
    * agg — nothing here grows with data volume except the scan. */
  def histogramTotals(spark: SparkSession, dir: String, bins: Int = 20): DataFrame = {
    val o = Tables(spark, dir, "orders").select(col("o_totalprice").as("x"))
    val mm = o.agg(min("x").as("lo"), max("x").as("hi"))
    o.crossJoin(broadcast(mm))
      .select(col("lo"), col("hi"),
        least(floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / bins)),
          lit(bins - 1)).cast("int").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min(col("lo") + col("bin") * (col("hi") - col("lo")) / bins), 6)
          .as("bin_lo"))
      .orderBy("bin")
  }

  /** qa6: null-safe equality join (`<=>`) — the ANSI trap every pipeline
    * with optional keys hits: a plain `=` join silently DROPS null-keyed
    * rows on both sides, while `<=>` (IS NOT DISTINCT FROM) matches the
    * null buckets to each other. Both sides derive a nullable key
    * deterministically and the join is null-safe; the hash-green oracle
    * row for the null bucket is the proof the rows survived. Catalyst
    * plans `<=>` as an ordinary hash join on a null-tolerant key, so the
    * shape costs nothing over the plain join. */
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame, idCol: String) = df
      .select(when(col(idCol) % 10 === 0, lit(null))
        .otherwise(col(idCol) % 100).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
    val a = keyed(Tables(spark, dir, "orders"), "o_custkey")
      .withColumnRenamed("n", "n_orders")
    val b = keyed(Tables(spark, dir, "customer"), "c_custkey")
      .withColumnRenamed("n", "n_customers")
    a.join(b, a("k") <=> b("k"))
      // the JOIN runs on the nullable key; the null bucket is PRESENTED
      // as an explicit flag + sentinel because sorted-row comparators
      // (the driver's included) can't order NULL against a number
      .select(a("k").isNull.as("k_is_null"),
        coalesce(a("k"), lit(-1L)).as("k"),
        col("n_orders"), col("n_customers"))
      .orderBy(col("k").asc)
  }

  /** q9o: Benford first-significant-digit audit of order totals — the
    * classic fabricated-data / data-quality screen: observed first-digit
    * frequencies beside the Benford expectation log10(1 + 1/d). The
    * first digit is computed ARITHMETICALLY (x / 10^floor(log10 x)) —
    * never via cast-to-string, whose scientific-notation thresholds
    * differ between engines. One scan + a 9-row aggregate. */
  def benfordTotals(spark: SparkSession, dir: String): DataFrame = {
    val x = col("o_totalprice")
    val digit = floor(x / pow(lit(10.0), floor(log10(x)))).cast("int")
    val counts = Tables(spark, dir, "orders")
      .where(x > 0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") / col("total"), 6).as("frac"),
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6)
          .as("benford"))
      .orderBy("digit")
  }

  /** q8y: correlated LATERAL subquery — each nation joined laterally to
    * its top customer by balance (per-row dependent subquery with ORDER BY
    * + LIMIT). Catalyst decorrelates this into a ranked window join — the
    * same shape q66 executes natively — so the "loop over rows" surface
    * syntax runs as one distributed plan, no per-row execution. */
  def lateralTopCustomer(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "nation").createOrReplaceTempView("nation_l")
    Tables(spark, dir, "customer").createOrReplaceTempView("customer_l")
    spark.sql(
      """SELECT n.n_nationkey, n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation_l n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer_l c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
        |ORDER BY n_nationkey""".stripMargin)
  }

  /** qat: Pareto / Lorenz concentration curve — "the top k×10% of
    * customers hold what share of revenue", the concentration view the
    * qan Gini summarizes to one number. Per-customer revenue is ROUNDED
    * to cents before ranking (sums of doubles rank-stably across
    * engines only after the scale's own rounding); deciles come from
    * the rank, the 10-row decile relation carries the cumulative
    * window. Aggregate-before-window throughout: the window never sees
    * more than 10 rows. */
  def paretoCurve(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables(spark, dir, "orders")
      .groupBy("o_custkey").agg(round(sum("o_totalprice"), 2).as("rev"))
    val n = rev.agg(count(lit(1)).as("n_cust"))
    val ranked = rev.withColumn("rk",
        row_number().over(Window.orderBy(col("rev").desc, col("o_custkey"))))
      .crossJoin(broadcast(n))
      .withColumn("decile",
        ceil(col("rk") * 10 / col("n_cust")).cast("int"))
    val deciles = ranked.groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), round(sum("rev"), 2).as("decile_rev"))
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deciles
      .withColumn("cum_rev", sum("decile_rev").over(w))
      .crossJoin(broadcast(deciles.agg(sum("decile_rev").as("total_rev"))))
      .select(col("decile"), col("n_customers"), col("decile_rev"),
        round(col("cum_rev") / col("total_rev"), 6).as("cum_rev_share"))
      .orderBy("decile")
  }

  /** qaq: median-absolute-deviation outlier screen per group — the
    * robust-statistics counterpart of the z-score (one inlier-corrupting
    * mean/stddev pair vs estimators with a 50% breakdown point): per
    * return flag, the exact interpolated median, the MAD, and how many
    * prices sit beyond the 3σ-equivalent band (1.4826·MAD ≈ σ under
    * normality). Two percentile aggregates over the same group key (the
    * second on a derived |x − med| column) and a final count — three
    * shuffles on one key, each producing 3 rows. */
  def madOutliers(spark: SparkSession, dir: String,
      cutoff: Double = 3.0): DataFrame = {
    val base = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("x"))
    val med = base.groupBy("l_returnflag")
      .agg(expr("percentile(x, 0.5)").as("med"))
    val mad = base.join(broadcast(med), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(expr("percentile(abs(x - med), 0.5)").as("mad"))
    base.join(broadcast(med), "l_returnflag")
      .join(broadcast(mad), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(first("med"), 6).as("med"),
        round(first("mad"), 6).as("mad"),
        sum(when(abs(col("x") - col("med")) >
          lit(cutoff) * lit(1.4826) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy("l_returnflag")
  }

  /** qa9: EXACT distinct-count via mergeable roaring bitmaps — the
    * warehouse pattern for distinct-count maintenance at 100 TB: each
    * segment (here: order month) builds per-bucket bitmaps with
    * `bitmap_construct_agg`, segments then merge with `bitmap_or_agg`
    * (associative/commutative — new months OR into the stored state in
    * O(delta), the q9x discipline applied to COUNT(DISTINCT)), and the
    * final count is a sum of per-bucket popcounts. Unlike HLL (q19) the
    * answer is exact, and unlike a naive count(distinct) the heavy state
    * is pre-sharded by bucket so no single reducer holds all keys. */
  def bitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val perSegment = Tables(spark, dir, "orders")
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        date_trunc("month", col("o_orderdate")).as("seg"),
        expr("bitmap_bucket_number(o_custkey)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
        .as("bm"))
    perSegment
      .groupBy("n_name", "bucket")
      .agg(expr("bitmap_or_agg(bm)").as("bm"))
      .groupBy("n_name")
      .agg(sum(expr("bitmap_count(bm)")).as("n_buyers"))
      .orderBy("n_name")
  }

  /** qaa: time-decayed popularity — per part, Σ exp(−λ·age_days) over its
    * order lines, age measured against the corpus max order date (so the
    * score is deterministic, not wall-clock-dependent). The freshness-
    * weighted ranking every feed/recsys pipeline needs; λ = 0.05/day
    * halves a line's weight every ~14 days. One broadcast scalar (max
    * date), one part-keyed aggregate — age is integer days so each
    * distinct age contributes an exactly-representable exp() term, and
    * both engines round only the final sum. */
  def decayedPopularity(spark: SparkSession, dir: String,
      lambda: Double = 0.05, k: Int = 100): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val maxDay = o.agg(max(date_trunc("day", col("o_orderdate"))).as("d_max"))
    val scored = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(maxDay))
      .select(col("l_partkey"),
        datediff(col("d_max"), date_trunc("day", col("o_orderdate")))
          .as("age_d"))
      .groupBy("l_partkey")
      .agg(round(sum(exp(col("age_d") * lit(-lambda))), 6).as("decay_score"),
        count(lit(1)).as("n_lines"))
    scored.orderBy(col("decay_score").desc, col("l_partkey")).limit(k)
  }

  /** qaf: per-group winsorization — order totals clipped to each nation's
    * [p05, p95] band before averaging, the outlier-robust preprocessing a
    * feature pipeline applies ahead of normalization. Two passes over the
    * same group key: an exact interpolated-percentile aggregate (25 rows —
    * broadcasts), then the clip + re-aggregate joined against it; at
    * 100 TB the second shuffle disappears into the first's partitioning
    * (same key, AQE reuse) and the percentile state is the only
    * per-group memory. Both engines interpolate identically
    * (quantile_cont semantics) and round once at the end. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir, "orders")
      .join(broadcast(Tables(spark, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_totalprice").as("x"))
    val bounds = base.groupBy("n_name").agg(
      expr("percentile(x, 0.05)").as("lo"),
      expr("percentile(x, 0.95)").as("hi"))
    base.join(broadcast(bounds), "n_name")
      .select(col("n_name"), col("x"),
        least(greatest(col("x"), col("lo")), col("hi")).as("xw"),
        col("lo"), col("hi"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"),
        round(avg("x"), 6).as("raw_avg"),
        round(avg("xw"), 6).as("wins_avg"),
        sum(when(col("x") =!= col("xw"), 1L).otherwise(0L)).as("n_clipped"),
        round(first("lo"), 6).as("p05"), round(first("hi"), 6).as("p95"))
      .orderBy("n_name")
  }

  /** qb5: rolling 7-day exact median of daily revenue — the robust
    * trend line a dashboard overlays on a spiky daily series (median
    * shrugs off the one-day outliers that drag a rolling mean). Revenue
    * is summed in exact integer cents per day (per-row cents rounding is
    * deterministic; the long sum is order-independent — no float-boundary
    * risk feeding the median), then the exact interpolating median of each
    * 7-row moving frame. Spark's `median` aggregate rejects window frames,
    * so the frame materializes through `collect_list` — sound precisely
    * BECAUSE the frame is constant-bounded (7 values), the bounded-frame
    * counterpart of an O(n) frame aggregate — and the sorted-array
    * midpoint interpolates even frames exactly as the oracle's `median`.
    * The window's ORDER BY spans the calendar day domain — thousands of
    * rows at any corpus size, because the day-keyed aggregate already
    * shuffled the data down to one row per day — so the single-partition
    * window is bounded by the calendar, not the data. */
  def rollingMedianRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables(spark, dir, "orders")
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
    val w = Window.orderBy("d").rowsBetween(-6, 0)
    val n = size(col("fr"))
    val med = when(n % 2 === 1,
        element_at(col("fr"), ((n + 1) / 2).cast("int")).cast("double"))
      .otherwise((element_at(col("fr"), (n / 2).cast("int"))
        + element_at(col("fr"), (n / 2).cast("int") + 1)) / 2.0)
    daily.select(col("d").cast("string").as("day"),
        round(col("rev_c") / 100.0, 2).as("revenue"),
        sort_array(collect_list(col("rev_c")).over(w)).as("fr"))
      .select(col("day"), col("revenue"),
        round(med / 100.0, 4).as("med7"), n.cast("long").as("n_days"))
      .orderBy("day")
  }

  /** qb7: order-independent content fingerprint per table partition — the
    * integrity check a 100 TB migration runs on BOTH sides: each row
    * canonicalizes to a delimited string (floats as exact integer cents,
    * dates as ISO strings — representations every engine prints
    * identically), hashes through md5, and the partition fingerprint is
    * the pair of XORs over the digest's low-quadword 32-bit halves plus
    * the row count. XOR is commutative/associative, so the fingerprint
    * is independent of row order and partitioning — mergeable across any
    * split of the data — and a single flipped row flips it. The halves
    * align with DuckDB's `md5_number_lower` (little-endian of digest
    * bytes 9–16), giving a cross-engine EQUALITY oracle, not a
    * statistical one. NULL-safe: every column passes through
    * coalesce(…, "\\N") before concatenation (concat_ws would silently
    * SKIP a null field — shifting all later fields left — while SQL `||`
    * would nullify the whole row; the sentinel makes both engines hash
    * the identical canonical string for null-bearing rows too). */
  def tableFingerprint(spark: SparkSession, dir: String): DataFrame = {
    def nn(c: Column): Column = coalesce(c.cast("string"), lit("\\N"))
    val canon = concat_ws("|",
      nn(col("o_orderkey")), nn(col("o_custkey")), nn(col("o_orderstatus")),
      nn(round(col("o_totalprice") * 100).cast("long")),
      nn(col("o_orderdate").cast("string")), nn(col("o_orderpriority")))
    // little-endian 32-bit halves of md5 bytes 9..16 (hex chars 17..32):
    // byte pairs reversed, then hex→long — matches md5_number_lower & 0xffffffff
    // and md5_number_lower >> 32 on the oracle side
    def le32(h: Column, c0: Int): Column = conv(concat(
      substring(h, c0 + 6, 2), substring(h, c0 + 4, 2),
      substring(h, c0 + 2, 2), substring(h, c0, 2)), 16, 10).cast("long")
    Tables(spark, dir, "orders")
      .select(col("o_orderstatus"), md5(canon.cast("binary")).as("h"))
      .select(col("o_orderstatus"), le32(col("h"), 17).as("lo"),
        le32(col("h"), 25).as("hi"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(lo)").as("xor_lo"), expr("bit_xor(hi)").as("xor_hi"))
      .orderBy("o_orderstatus")
  }
}
