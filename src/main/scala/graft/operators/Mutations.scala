package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Snapshot maintenance without a table format: the MERGE/upsert shape a
  * corpus pipeline runs on re-ingest (changed documents replace their
  * previous version, new documents insert). No Delta/Iceberg in this
  * container, so the operator is the engine-level kernel those formats
  * compile MERGE into anyway: union the two sides with a priority tag and
  * keep the highest-priority row per key.
  *
  * The per-key pick runs on [[graft.plans.TopKPerGroup]] (k=1) — ONE
  * shuffle on the key, bounded per-group state, no full-outer join and no
  * per-column coalesce list; at 100 TB this is the compaction-job shape
  * (co-partition both sides by key — bucketing — and even that shuffle
  * disappears). Contract: `key` is unique within each input.
  */
object Mutations {

  def upsert(snapshot: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val tagged = changes.withColumn("__pri", lit(1))
      .unionByName(snapshot.withColumn("__pri", lit(0)))
    graft.plans.TopKPerGroup(tagged, Seq(key), Seq(("__pri", true)), 1, "__rn")
      .drop("__pri", "__rn")
  }

  /** q72: re-ingest every 10th document with rewritten text; the merged
    * snapshot is fingerprinted per row (md5 travels cross-engine) so the
    * oracle pins which version won every key. */
  def upsertQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents")
    val changes = docs.where(col("doc_id") % 10 === 0)
      .withColumn("text", upper(col("text")))
    upsert(docs, changes, "doc_id")
      .select(col("doc_id"), col("lang"), md5(col("text").cast("binary")).as("h"))
      .orderBy("doc_id")
  }
}
