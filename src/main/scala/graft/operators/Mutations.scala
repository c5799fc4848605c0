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

  /** q9z: snapshot-as-of (time travel) — the versioned-read semantics a
    * table format provides, as the engine kernel it compiles to: with
    * change batches tagged by commit sequence, reading "as of seq k" is
    * a PRIORITY FILTER (`__pri <= k`) before the same latest-wins
    * per-key pick [[upsert]] runs — no format metadata required, and the
    * plan is one shuffle on the key regardless of how many batches are
    * visible. The three change batches are deterministic rewrites of the
    * corpus (upper / suffix / reverse over different key residues, with
    * overlaps — the case where as-of ordering matters), so the oracle
    * reconstructs the exact winning version per key arithmetically. */
  def snapshotAt(spark: SparkSession, dir: String, asOf: Int = 2): DataFrame = {
    val docs = Tables(spark, dir, "documents").select(col("doc_id"), col("text"))
    val batches = Seq(
      1 -> docs.where(col("doc_id") % 3 === 0)
        .withColumn("text", upper(col("text"))),
      2 -> docs.where(col("doc_id") % 5 === 0)
        .withColumn("text", concat(col("text"), lit(" v2"))),
      3 -> docs.where(col("doc_id") % 7 === 0)
        .withColumn("text", reverse(col("text"))))
    val log = batches.foldLeft(docs.withColumn("__pri", lit(0))) {
      case (acc, (k, b)) => acc.unionByName(b.withColumn("__pri", lit(k)))
    }
    graft.plans.TopKPerGroup(log.where(col("__pri") <= asOf),
        Seq("doc_id"), Seq(("__pri", true)), 1, "__rn")
      .select(col("doc_id"), col("__pri").cast("int").as("version"),
        md5(col("text").cast("binary")).as("h"))
      .orderBy("doc_id")
  }
}
