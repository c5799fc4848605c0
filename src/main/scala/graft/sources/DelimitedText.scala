package graft.sources

import java.util.regex.Pattern
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Text ingestion parity with the reference (SURVEY.md §2.1):
  *  - S2: multi-char-delimiter files (`split("::")` + positional project,
  *    `task1.scala:64-65` — Spark's CSV reader only accepts 1-char
  *    separators, so `::` files go through text + split + cast)
  *  - S3: header CSV (`Betweenness.scala:20-21` drops line 0 by hand; the
  *    CSV reader's header option replaces that)
  *  - S4/S5: single-file delimited sink (`coalesce(1).saveAsTextFile`,
  *    `task1.scala:83`; driver PrintWriter, `SON.scala:278`)
  *
  * Scale note: `spark.read.text` splits large files by HDFS block, so the
  * multi-char parse stays fully parallel; the single-file sink is a
  * deliberate 1-partition funnel for small results only.
  */
object DelimitedText {

  /** Read a delimited text file with an explicit schema. Fields are split
    * on the literal `delim` (any length) and cast positionally. */
  def read(spark: SparkSession, path: String, delim: String,
      schema: StructType): DataFrame = {
    val parts = split(col("value"), Pattern.quote(delim))
    spark.read.text(path).select(
      schema.fields.zipWithIndex.map { case (f, i) =>
        parts.getItem(i).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
  }

  /** Header CSV with explicit or inferred schema. */
  def readHeaderCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Single-file delimited text sink (reference's coalesce(1) output).
    * Nulls become empty fields (concat_ws SKIPS null arguments, which would
    * silently drop the field and shift every later column on re-parse). */
  def writeSingleFile(df: DataFrame, path: String, delim: String): Unit =
    df.select(concat_ws(delim,
        df.columns.map(c => coalesce(col(c).cast("string"), lit(""))).toIndexedSeq: _*)
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(path)
}
