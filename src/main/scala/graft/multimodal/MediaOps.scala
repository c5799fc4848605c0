package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms (the Scala analog
  * of Pandas-UDF batching: one `mapPartitions` closure per partition, no
  * per-row JVM↔codec round-trips).
  *
  * The container ships no image/audio codecs, so `decodeStub` is a
  * CLEARLY-MARKED deterministic fake (bytes → pseudo-pixels via a rolling
  * hash); everything around it — schema, partitioning, batch shape,
  * metadata propagation — is the real pipeline. Swap `decodeStub` for a
  * JNI codec (libjpeg/ffmpeg) in production; the operator contracts do not
  * change.
  *
  * Scale notes: payloads stay columnar (parquet binary) until the decode
  * boundary; feature vectors come back as fixed-width arrays so downstream
  * ANN (graft.operators.Similarity) consumes them directly. Partition
  * sizing: media rows are large — set files.maxPartitionBytes so a batch of
  * decoded frames fits executor memory.
  */
object MediaOps {

  final case class MediaRow(media_id: Long, media: Array[Byte],
      format: String, width: Int, height: Int)
  final case class MediaFeatures(media_id: Long, format: String,
      n_bytes: Int, features: Array[Double])

  /** Synthesize a media table from the documents fixture: text bytes stand
    * in for encoded payloads (binary column + typed metadata). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("media"),
        // deterministic fake metadata derived from the payload
        lit("png").as("format"),
        (pmod(xxhash64(col("text")), lit(512)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("text"), lit(1)), lit(512)) + 64).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB ???: stands in for a real image decode. Deterministic rolling
    * hash over the payload — NOT a codec. Keeps the same signature a real
    * decoder would have: bytes → fixed-dim feature vector. */
  private[multimodal] def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val acc = new Array[Double](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < bytes.length) {
      h = 31 * h + bytes(i)
      acc(i % dim) += (h & 0xffff) / 65535.0
      i += 1
    }
    val n = math.max(1, bytes.length / dim)
    acc.map(x => math.rint(x / n * 1e6) / 1e6)
  }

  /** Batched feature extraction: one partition = one batch through the
    * (stub) decoder. Real pipeline shape: mapPartitions keeps the codec
    * context alive across rows instead of re-initializing per row. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // per-batch decoder context would be opened here (and closed after)
      batch.map(m => MediaFeatures(m.media_id, m.format, m.media.length,
        decodeStub(m.media, dim)))
    }
  }

  /** Metadata-only resize: scales the declared dims; payload untouched
    * (real impl re-encodes in the same mapPartitions batch). */
  def resizeMeta(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val s = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      m.copy(width = math.max(1, (m.width * s).toInt),
        height = math.max(1, (m.height * s).toInt))
    }
  }

  /** Frame sampling: every `stride`-th fixed-size slice of the payload —
    * the video→frames explode shape (one input row, many frame rows). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64,
      stride: Int = 4): DataFrame =
    media.toDF()
      .select(col("media_id"), col("format"),
        posexplode(expr(
          s"""filter(
             |  transform(sequence(0, greatest(int(length(media) / $frameBytes) - 1, 0)),
             |    i -> if(i % $stride = 0, substring(media, i * $frameBytes + 1, $frameBytes),
             |            cast(null as binary))),
             |  x -> x is not null)""".stripMargin)))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** Media features → similarity search: nearest media by cosine over the
    * (stub-)decoded feature vectors — the decode→embed→ANN pipeline shape,
    * demonstrating the multimodal output feeding graft.operators.Similarity
    * conventions (dense array column + norm + top-k). */
  def mediaNearest(spark: SparkSession, dir: String, k: Int = 3,
      nQueries: Long = 50): DataFrame = {
    val f = extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("media_id"), col("features").as("v"))
      .withColumn("norm", sqrt(expr("aggregate(zip_with(v, v, (x, y) -> x * y), 0D, (a, x) -> a + x)")))
      .where(col("norm") > 0)
    val q = f.where(col("media_id") < nQueries)
      .select(col("media_id").as("query_id"), col("v").as("qv"), col("norm").as("qn"))
    val dotCol = expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, (a, x) -> a + x)")
    val sims = broadcast(q).join(f, col("query_id") =!= col("media_id"))
      .select(col("query_id"), col("media_id").as("neighbor_id"),
        round(dotCol / (col("qn") * col("norm")), 6).as("cosine"))
    graft.operators.Similarity.topKByCosine(sims, k)
  }

  /** Query face: per-media feature summary (deterministic; rows-only). */
  def mediaFeatureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF()
      .select(col("media_id"), col("format"), col("n_bytes"),
        round(expr("aggregate(features, 0D, (a, x) -> a + x * x)"), 6).as("feat_sq_norm"))
      .orderBy("media_id")
  }
}
