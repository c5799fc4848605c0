package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

/** DataSourceV2 `::` reader: round-trip fidelity, column pruning reaching
  * the scan, and pushed-filter behavior. */
class DelimV2Spec extends AnyFunSuite with SparkSuite {

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
