package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

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
      // events.ts is parquet TIMESTAMP(NANOS) which Spark refuses natively;
      // read it as a long and truncate to micros (DuckDB reads the same
      // file as TIMESTAMP_NS — epoch-second comparisons line up).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register all fixture tables as temp views so `spark.sql` works as a
    * first-class query surface (the reference has no SQL layer; we do). */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
