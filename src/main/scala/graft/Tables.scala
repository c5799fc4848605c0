package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType,
  TimestampNTZType, TimestampType}

/** Fixture-table loader. Every query resolves inputs through here so the
  * physical layout (one parquet per table under the sf dir) lives in one
  * place. At cluster scale these would be catalog tables (partitioned,
  * bucketed); `registerViews` exposes them to the SQL surface.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
      // parquet. NANOS is only readable via the nanosAsLong legacy knob
      // (column resolves as LongType, epoch nanos); MICROS resolves as
      // TIMESTAMP_NTZ. Dispatch on the resolved type and normalize to one
      // session-TZ TimestampType so every downstream operator sees the same
      // type regardless of which writer produced the file (session TZ is
      // UTC, so the NTZ→LTZ cast preserves the instant).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else if (name == "embeddings") {
      normalizeEmbedding(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize an events-shaped relation's `ts` column to session-TZ
    * TimestampType, dispatching on how the parquet layout resolved (see
    * [[apply]]). Schema is static for batch and streaming DataFrames alike,
    * so the streaming file source routes through the same dispatch. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  /** Normalize `embeddings.embedding` to the engine-canonical
    * array<float> — the type every similarity/linalg kernel (float dot
    * rewrite, PQ, pooling aggregates) is compiled for. The same
    * schema-dispatch insurance as [[normalizeEventsTs]]: the ts fixture
    * regenerating with a different physical type silently took down 44
    * queries for a round; a float→double regen of the embedding column
    * would take down the ~20 similarity queries the same way. A
    * double-stored file of float-valued data casts losslessly. */
  def normalizeEmbedding(df: DataFrame): DataFrame =
    df.schema("embedding").dataType match {
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case _ => df
    }

  /** A `ts` expression 30 days past the row's own value, in the RAW layout's
    * physical type — for building watermark-flushing sentinel rows that must
    * byte-match the staged file's schema (nanos-long vs timestamp). */
  def sentinelTsPlus30d(rawTsType: org.apache.spark.sql.types.DataType) =
    rawTsType match {
      case LongType => expr(s"ts + ${30L * 24 * 3600}L * 1000000000L")
      case _        => expr("ts + INTERVAL 30 DAYS")
    }

  /** Register all fixture tables as temp views so `spark.sql` works as a
    * first-class query surface (the reference has no SQL layer; we do). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
