package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — extension surface beyond the reference's
  * delimited formats (§2.1): one JSON object per line, the interchange
  * format event collectors and labeling tools actually emit.
  *
  * Scale notes: an explicit schema is REQUIRED on read — schema inference
  * is a full extra pass over the data and type-drifts on dirty corpora
  * (a field that is int for a billion rows and string once infers
  * string); production readers pin the schema and route non-conforming
  * lines to `_corrupt_record` instead. JSON-lines splits by newline, so
  * large files parallelize like any text input. The sink keeps the data
  * distributed (one file per partition); use `DelimitedText
  * .writeSingleFile`-style coalescing only for driver-tiny results.
  */
object JsonLines {

  /** Read JSON-lines with a pinned schema; malformed lines land in
    * `_corrupt_record` when `keepCorrupt` (PERMISSIVE), else are dropped. */
  def read(spark: SparkSession, path: String, schema: StructType,
      keepCorrupt: Boolean = false): DataFrame = {
    val mode = if (keepCorrupt) "PERMISSIVE" else "DROPMALFORMED"
    spark.read.schema(schema).option("mode", mode).json(path)
  }

  /** Distributed JSON-lines sink. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
