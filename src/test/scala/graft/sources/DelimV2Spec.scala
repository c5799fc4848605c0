package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

/** DataSourceV2 `::` reader: round-trip fidelity, column pruning reaching
  * the scan, pushed-filter and pushed-aggregate behavior. */
class DelimV2Spec extends AnyFunSuite with SparkSuite
    with AdaptiveSparkPlanHelper {

  private def v2 = DelimV2.lineitemV2(spark, sfDir)

  test("V2 round trip equals the parquet relation") {
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    val got = v2.select(cols.map(col): _*).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    val want = Tables(spark, sfDir, "lineitem").select(cols.map(col): _*)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("column pruning narrows the scan's readSchema to the projection") {
    val q = v2.select("l_returnflag", "l_linestatus")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("l_returnflag", "l_linestatus"),
      s"scan read ${scans.head.scan.readSchema().fieldNames.mkString(",")}")
  }

  test("string-equality filter is pushed AND result stays exact") {
    val q = v2.where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_returnflag")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    val desc = scans.head.scan.description()
    assert(desc.contains("EqualTo(l_returnflag,R)"), s"pushed filters: $desc")
    val n = q.count()
    val want = Tables(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R").count()
    assert(n == want, s"pushed-filter count $n vs parquet $want")
  }

  test("aggregate pushdown: count/min/max served from the scan, exact result") {
    val q = DelimV2.aggStats(spark, sfDir)
    q.collect() // finalize adaptive plan
    val scans = collect(q.queryExecution.executedPlan) {
      case b: BatchScanExec => b
    }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    val scan = scans.head.scan
    assert(scan.description().contains(
      "pushedAggs=count,min(l_quantity),max(l_extendedprice)"),
      s"agg not pushed: ${scan.description()}")
    // the scan's schema is the 3-column partial-agg schema, NOT lineitem's
    assert(scan.readSchema().fields.length == 3,
      s"scan read ${scan.readSchema().fieldNames.mkString(",")}")
    val r = q.collect().head
    val want = Tables(spark, sfDir, "lineitem").agg(
      expr("count(*)"), expr("min(l_quantity)"),
      expr("max(l_extendedprice)")).collect().head
    assert(r.getLong(0) == want.getLong(0) &&
      r.getDouble(1) == want.getDouble(1) &&
      r.getDouble(2) == want.getDouble(2), s"pushed agg $r vs parquet $want")
  }

  test("count() above the pushed aggregate does not break planning") {
    // pruning empties the inner aggregation list — pushAggregation must
    // reject it (regression: vacuous accept returned the row scan while
    // Spark expected a zero-column agg scan)
    assert(DelimV2.aggStats(spark, sfDir).count() == 1L)
  }

  test("unsupported aggregates (avg, grouped) fall back to the row scan") {
    val grouped = v2.groupBy("l_returnflag").agg(expr("count(*)").as("n"))
    grouped.collect()
    val gScan = collect(grouped.queryExecution.executedPlan) {
      case b: BatchScanExec => b }.head.scan
    assert(!gScan.description().contains("pushedAggs"),
      s"grouped agg must not push: ${gScan.description()}")
    val avg = v2.agg(expr("avg(l_quantity)").as("a"))
    avg.collect()
    val aScan = collect(avg.queryExecution.executedPlan) {
      case b: BatchScanExec => b }.head.scan
    assert(!aScan.description().contains("pushedAggs"),
      s"avg must not push: ${aScan.description()}")
    // and both still compute correctly through the row path
    val got = grouped.orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = Tables(spark, sfDir, "lineitem")
      .groupBy("l_returnflag").agg(expr("count(*)").as("n"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("limit pushdown: the scan advertises the limit and rows stay exact") {
    val q = v2.select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").limit(7)
    // orderBy prevents limit pushdown (sort needs all rows) — use a bare
    // limit for the plan assertion, the ordered one for value-correctness
    val bare = v2.select("l_orderkey").limit(7)
    bare.collect()
    val scan = collect(bare.queryExecution.executedPlan) {
      case b: BatchScanExec => b }.head.scan
    assert(scan.description().contains("pushedLimit=7"),
      s"limit not pushed: ${scan.description()}")
    assert(bare.count() == 7)
    val got = q.collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val want = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber")
      .orderBy("l_orderkey", "l_linenumber").limit(7)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == want)
  }

  test("runtime filtering (dynamic pruning) reaches the source and stays exact") {
    DelimV2.lastRuntimeFilter = ""
    import spark.implicits._
    // the V2 scan carries no stats, so force the DPP benefit estimate to
    // the ratio fallback; the build side must RETAIN a selective Filter
    // node, so it reads parquet (a literal local Seq constant-folds into
    // a bare LocalRelation and DPP sees no selective predicate)
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "100.0")
    val dim = Tables(spark, sfDir, "part")
      .where(col("p_brand") === "Brand#11").select("p_partkey", "p_brand")
    val q = v2.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").agg(expr("count(*)").as("n"))
    val got =
      try q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      finally {
        spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
        spark.conf.unset(
          "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      }
    val want = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
        .where(col("p_brand") === "Brand#11"),
        col("l_partkey") === col("p_partkey"))
      .agg(expr("count(*)")).collect().head.getLong(0)
    assert(got == Seq(("Brand#11", want)), s"got $got want $want")
    assert(DelimV2.lastRuntimeFilter.contains("l_partkey"),
      s"runtime filter never reached the scan: '${DelimV2.lastRuntimeFilter}'")
  }

  test("q8f equals q09 shape (distinct flag/status through the V2 source)") {
    val got = DelimV2.distinctFlags(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val want = Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == want)
  }
}
