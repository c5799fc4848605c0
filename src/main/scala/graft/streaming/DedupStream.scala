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
    // state-store partition sizing: see EventStream.sessionizeFromFiles;
    // the child session scopes it to this query (StreamSessions)
    val ss = StreamSessions.withShuffle(spark, 8)
    val stream = ss.readStream.schema(schema).parquet(stage.toString)

    // one row per DISTINCT CONTENT — corpus-sized in the worst case, so no
    // memory sink (driver collect); complete mode snapshots distributed
    // via foreachBatch overwrite (see CdcStream)
    val outDir = graft.sources.Staging.fresh("q58-sink")
    val q = stream
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    spark.read.parquet(outDir).orderBy("keeper")
  }

  /** Streaming NEAR-dup detection — the LSH ingest twin of
    * [[graft.operators.Dedup.minhashPairsIncremental]] (q4b): delta
    * documents land as files, each micro-batch runs the full signature
    * pipeline (shingles → MinHash → bands, all codegen expressions, so
    * the streaming plan is the batch plan) and probes the STATIC corpus
    * band index with a stream-static equi-join; candidates verify with
    * exact Jaccard in-stream and append to a distributed file sink. The
    * drained result equals q4b exactly (same candidates, same verify,
    * same threshold), so the face shares q4b's DuckDB oracle — a
    * hash-checked STREAMING LSH. Scale shape: per batch, only the
    * delta's band keys shuffle against the index (|delta| × bucket
    * occupancy, never |corpus|²); the band-duplicate collapse happens at
    * read-back (pairs re-surface once per shared band, with identical
    * payload — a `distinct` over the drained sink, not streaming state),
    * so the stream itself needs NO state store at all. */
  def minhashPairsFromStream(spark: SparkSession, dir: String,
      deltaFrom: Long = 400, minJaccard: Double = 0.5): DataFrame = {
    import graft.operators.Dedup
    val stage = graft.sources.Staging.fresh("lshstream-src")
    val docs = graft.Tables(spark, dir, "documents")
    docs.where(col("doc_id") >= deltaFrom).write.mode("overwrite").parquet(stage)
    val schema = docs.schema
    // the whole stream pipeline (source, static index, join) builds on a
    // child session so the state-store partition sizing never leaks into
    // concurrently-planned queries on the caller's session (StreamSessions)
    val ss = StreamSessions.withShuffle(spark, 8)
    val stream = ss.readStream.schema(schema).parquet(stage)

    val streamBands = Dedup.withBands(stream)
    // static side: the full corpus index, cached for the drain — every
    // micro-batch probes it, and without the pin Spark re-derives the
    // whole signature pipeline per batch (measured 31 s at sf1); a
    // resident deployment maintains this as its materialized band index
    val corpusBands = Dedup.withBands(graft.Tables(ss, dir, "documents")).cache()
    val pairs = streamBands.as("x")
      .join(corpusBands.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        Dedup.jaccardOf(col("x.sh"), col("y.sh")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)

    val outDir = graft.sources.Staging.fresh("lshstream-sink")
    val q = pairs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .outputMode("append").start()
    try q.processAllAvailable() finally { q.stop(); corpusBands.unpersist() }

    spark.read.parquet(outDir).distinct()
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
  }
}
