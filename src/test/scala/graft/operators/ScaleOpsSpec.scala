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

  test("partitioned layout prunes partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-partwrite").toString
    val docs = Tables(spark, sfDir, "documents")
    ScaleOps.writePartitioned(docs, dir, Seq("lang"))
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    assert(langs.length > 1, "fixture needs several languages for pruning to mean anything")
    val one = spark.read.parquet(dir).where(col("lang") === langs.head)
    val scan = one.queryExecution.executedPlan.toString()
    assert("PartitionFilters: \\[.*lang".r.findFirstMatchIn(scan).isDefined,
      s"no partition filter in scan:\n${scan.take(1500)}")
    assert(one.count() == docs.where(col("lang") === langs.head).count())
  }

  test("compaction preserves rows and hits the target file count") {
    val in = java.nio.file.Files.createTempDirectory("graft-small").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // simulate the small-files problem: one file per tiny partition
    Tables(spark, sfDir, "documents").repartition(64).write
      .mode("overwrite").parquet(in)
    val inFiles = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(inFiles > 32, s"expected many small files, got $inFiles")
    ScaleOps.compact(spark, in, out, targetFileBytes = 64L * 1024 * 1024)
    val outFiles = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles < inFiles / 8, s"compaction left $outFiles files")
    assert(spark.read.parquet(out).count() == spark.read.parquet(in).count())
  }

  test("salted join returns identical results to the plain join") {
    val l = Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val p = Tables(spark, sfDir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val plain = l.join(p, Seq("l_partkey"))
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val saltedDf = ScaleOps.saltedJoin(l, p, "l_partkey", "l_orderkey")
      .groupBy("p_brand").agg(sum("l_quantity").as("q"))
    val salted = saltedDf
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, v) => assert(math.abs(salted(k) - v) < 1e-6) }
    // the shuffle_hash hint must survive AQE: a broadcast would put every
    // salt replica into one hash table and demonstrate nothing
    val physical = saltedDf.queryExecution.executedPlan.toString()
    assert(!physical.contains("BroadcastHashJoin"),
      s"salted join was broadcast:\n${physical.take(1500)}")
    assert(physical.contains("ShuffledHashJoin"),
      s"expected the shuffled-hash path:\n${physical.take(1500)}")
  }

  test("bloom semi-join with a zero-row dim side returns empty, not an analysis error") {
    val out = ScaleOps.bloomSemiJoin(spark, sfDir, brand = "Brand#nope")
    assert(out.count() == 0)
  }

  test("staging dirs are fixed per (tag, key) and staged once per JVM") {
    var writes = 0
    val d1 = graft.sources.Staging.once("spec-stage", "k1") { d =>
      writes += 1
      java.nio.file.Files.writeString(java.nio.file.Paths.get(d, "x.txt"), "x")
      ()
    }
    val d2 = graft.sources.Staging.once("spec-stage", "k1") { _ => writes += 1 }
    assert(d1 == d2, "same (tag, key) must reuse the staged dir")
    assert(writes == 1, "second once() must not re-stage")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d1, "x.txt")))
    val other = graft.sources.Staging.once("spec-stage", "k2") { _ => () }
    assert(other != d1, "different keys must not collide")
  }
}
