package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSuite, Tables}

/** Manifest-driven packed source: round-trip fidelity against the parquet
  * table, record-aligned multi-slice planning, and payload-skipping column
  * pruning. */
class ManifestDocsSpec extends AnyFunSuite with SparkSuite
    with AdaptiveSparkPlanHelper {

  private def packed = ManifestDocs.read(spark, sfDir)

  test("packed round trip equals the parquet documents table") {
    val got = packed.collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.length == want.length && got.sameElements(want))
  }

  test("slice planning is record-aligned: small targetSliceBytes still reads every row") {
    val staged = ManifestDocs.stage(spark, sfDir)
    val sliced = spark.read.format("graft.sources.ManifestDocs")
      .option("manifest", s"$staged/manifest")
      .option("targetSliceBytes", "4096") // force many slices per pack
      .load()
    val parts = sliced.rdd.getNumPartitions
    assert(parts > 8, s"expected > 1 slice per pack, got $parts partitions")
    val got = sliced.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = Tables(spark, sfDir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.sameElements(want), "sliced read must still be exhaustive and exact")
  }

  test("column pruning narrows the scan and a doc_id projection skips payloads") {
    val q = packed.select("doc_id")
    val scans = q.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("doc_id"),
      s"scan read ${scans.head.scan.readSchema().fieldNames.mkString(",")}")
    val ids = q.collect().map(_.getLong(0)).sorted
    val want = Tables(spark, sfDir, "documents").select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(want))
  }

  test("qbq: the written manifest replays as a per-pack integer prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val got = ManifestDocs.manifestRelation(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent replay: pack = doc_id mod 8, start = running sum of
    // (12 + utf8 bytes) in doc_id order within the pack — the writer's
    // actual byte accounting must match the declarative formulation
    val w = Window.partitionBy("pack").orderBy("doc_id")
    val want = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(8L)).as("pack"),
        coalesce(octet_length(col("text")), lit(0)).cast("long").as("nbytes"))
      .withColumn("start",
        sum(col("nbytes") + lit(12L)).over(w) - (col("nbytes") + lit(12L)))
      .select("doc_id", "pack", "start", "nbytes")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == want.length && got.sameElements(want))
  }

  test("qbg face equals the q50 stats from the parquet route") {
    val viaManifest = ManifestDocs.textStatsFromManifest(spark, sfDir)
      .collect().map(_.toSeq)
    val viaParquet = graft.operators.TextOps.textStats(spark, sfDir)
      .collect().map(_.toSeq)
    assert(viaManifest.length == viaParquet.length)
    assert(viaManifest.sameElements(viaParquet))
  }
}
