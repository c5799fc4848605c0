package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming face of exact corpus dedup (`operators.Dedup.exact`): documents
  * arrive as files on a directory stream (the "landing bucket" shape of a
  * training-data ingest) and the engine maintains one state row per distinct
  * content hash with the canonical keeper and copy count.
  *
  * Deliberately a streaming AGGREGATION (min-keeper per hash), not
  * `dropDuplicates`: dropDuplicates keeps the first ARRIVAL, which is
  * nondeterministic across file/partition order, while min(doc_id) is
  * arrival-order-independent — the drained stream is byte-equal to the
  * batch face and shares its DuckDB oracle (q40). State is O(distinct
  * contents), same as dropDuplicates' key set; a deployment bounds it with
  * a watermark on ingest time once late re-delivery has a horizon.
  */
object DedupStream {

  /** Run the file-source stream to completion over `dir`'s documents table
    * and return the final dedup state, sorted by keeper. */
  def dedupExactFromFiles(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.Paths
    val stage = Paths.get(graft.sources.Staging.fresh("dedupstream-src"))
    java.nio.file.Files.copy(Paths.get(s"$dir/documents.parquet"),
      stage.resolve("documents.parquet"))
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).parquet(stage.toString)

    // one row per DISTINCT CONTENT — corpus-sized in the worst case, so no
    // memory sink (driver collect); complete mode snapshots distributed
    // via foreachBatch overwrite (see CdcStream)
    val outDir = graft.sources.Staging.fresh("q58-sink")
    // state-store partition sizing: see EventStream.sessionizeFromFiles
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q =
      try stream
        .groupBy(md5(col("text").cast("binary")).as("content_hash"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("overwrite").parquet(outDir)
        }
        .outputMode("complete").start()
      finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    try q.processAllAvailable() finally q.stop()

    spark.read.parquet(outDir).orderBy("keeper")
  }
}
