package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

class ScaleOpsSpec extends AnyFunSuite with SparkSuite {

  test("bucketed join plans without a shuffle exchange") {
    val l = Tables(spark, sfDir, "lineitem").select("l_partkey", "l_quantity")
    val p = Tables(spark, sfDir, "part").select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_part")
    ScaleOps.writeBucketed(l, "b_lineitem", 8, Seq("l_partkey"))
    ScaleOps.writeBucketed(p, "b_part", 8, Seq("l_partkey"))
    val joined = ScaleOps.bucketedJoin(spark, "b_lineitem", "b_part", Seq("l_partkey"))
    val physical = joined.queryExecution.executedPlan.toString()
    assert(!physical.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n${physical.take(1500)}")
    assert(physical.contains("SortMergeJoin"), "expected the non-broadcast path")
    assert(physical.contains("Bucketed: true"),
      s"bucketed reading not engaged:\n${physical.take(1500)}")
    // same result as the plain join
    assert(joined.count() ==
      l.join(p, Seq("l_partkey")).count())
  }

  test("salted join returns identical results to the plain join") {
    val l = Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val p = Tables(spark, sfDir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = l.join(p, Seq("l_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val salted = ScaleOps.saltedJoin(l, p, "l_partkey", "l_orderkey")
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-6) }
  }
}
