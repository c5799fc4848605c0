package graft.sources

import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for multi-char-delimited text (the reference's `::`
  * format, SURVEY.md §2.1 S2) — the ENGINE-INTEGRATED tier above the
  * `text + split + cast` helper in [[DelimitedText]]: a `TableProvider`
  * whose scans participate in Catalyst's pushdown negotiation.
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): only the
  *    requested field POSITIONS are parsed and cast; a 2-column projection
  *    of an 11-column file splits each line once but materializes two
  *    fields — `.explain` shows the narrowed ReadSchema exactly as a
  *    parquet scan would.
  *  - **Filter pushdown** (`SupportsPushDownFilters`): string-equality and
  *    IsNotNull filters are evaluated inside the reader against the raw
  *    split fields, BEFORE row materialization; they are also re-checked
  *    above the scan (returned as residuals), the standard
  *    correctness-preserving contract.
  *  - **Parallelism**: one `InputPartition` per file part — the format is
  *    line-oriented, so a production tier would add byte-range splits with
  *    first/last-line handoff exactly as Spark's text source does; part
  *    files from a distributed writer already give one task per part.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.DelimV2").schema(ddl)
  *     .option("path", dir).option("delimiter", "::").load()
  * }}}
  */
class DelimV2 extends TableProvider {

  // schema is caller-provided (positional formats carry no header)
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-delim: schema must be supplied (.schema(...)) — positional " +
        "delimited files carry no self-describing metadata")

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new DelimTable(schema, properties.asScala.toMap)
}

private[sources] class DelimTable(tableSchema: StructType,
    props: Map[String, String]) extends Table with SupportsRead {

  override def name(): String = s"graft-delim:${props.getOrElse("path", "?")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DelimScanBuilder(tableSchema,
      options.asScala.toMap.getOrElse("path",
        props.getOrElse("path", sys.error("graft-delim: path option required"))),
      options.asScala.toMap.getOrElse("delimiter",
        props.getOrElse("delimiter", "::")))
}

private[sources] class DelimScanBuilder(full: StructType, path: String,
    delim: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the caller's requested order; fields resolve by NAME to
    // their positions in the full schema at read time
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(a, _: String) => full.fieldNames.contains(a)
      case IsNotNull(a) => full.fieldNames.contains(a)
      case _ => false
    }
    pushed = accepted
    // everything is ALSO returned as residual: the reader's evaluation is
    // an optimization, Spark re-applies the exact predicate above the scan
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new DelimScan(full, required, pushed, path, delim)
}

private[sources] class DelimScan(full: StructType, required: StructType,
    pushed: Array[Filter], path: String, delim: String) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-delim $path delim='$delim' pushed=${pushed.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = java.nio.file.Paths.get(path)
    val files: Seq[String] =
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().asScala
          .filter(f => java.nio.file.Files.isRegularFile(f))
          .map(_.toString).filterNot(f =>
            f.endsWith(".crc") || f.endsWith("_SUCCESS")).toList
        finally s.close()
      } else Seq(p.toString)
    files.sorted.map(f => DelimInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    DelimReaderFactory(full, required, pushed, delim)
}

private[sources] case class DelimInputPartition(file: String) extends InputPartition

private[sources] case class DelimReaderFactory(full: StructType,
    required: StructType, pushed: Array[Filter], delim: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DelimPartitionReader(
      partition.asInstanceOf[DelimInputPartition].file, full, required, pushed, delim)
}

/** Per-partition line reader: split once, evaluate pushed filters on the
  * raw fields, then parse ONLY the required positions. */
private[sources] class DelimPartitionReader(file: String, full: StructType,
    required: StructType, pushed: Array[Filter], delim: String)
    extends PartitionReader[InternalRow] {

  private val pattern = Pattern.compile(Pattern.quote(delim))
  private val fullIndex = full.fieldNames.zipWithIndex.toMap
  // (position in the split line, target type) per required column
  private val cols: Array[(Int, DataType)] =
    required.fields.map(f => (fullIndex(f.name), f.dataType))
  // pushed filters compiled to (position, expected-raw-string | null=IsNotNull)
  private val rawChecks: Array[(Int, String)] = pushed.collect {
    case EqualTo(a, v: String) => (fullIndex(a), v)
    case IsNotNull(a) => (fullIndex(a), null)
  }

  private val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
  private val it = lines.iterator()
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (it.hasNext) {
      val parts = pattern.split(it.next(), -1)
      if (passes(parts)) { current = toRow(parts); return true }
    }
    false
  }

  private def passes(parts: Array[String]): Boolean = {
    var i = 0
    while (i < rawChecks.length) {
      val (pos, want) = rawChecks(i)
      if (pos >= parts.length) return false
      if (want != null && parts(pos) != want) return false
      i += 1
    }
    true
  }

  private def toRow(parts: Array[String]): InternalRow = {
    val values = new Array[Any](cols.length)
    var i = 0
    while (i < cols.length) {
      val (pos, dt) = cols(i)
      val raw = if (pos < parts.length) parts(pos) else null
      values(i) =
        if (raw == null || raw.isEmpty) null
        else dt match {
          case LongType => raw.toLong
          case IntegerType => raw.toInt
          case DoubleType => raw.toDouble
          case FloatType => raw.toFloat
          case StringType => UTF8String.fromString(raw)
          case DateType => java.time.LocalDate.parse(raw).toEpochDay.toInt
          case TimestampType => // "yyyy-MM-dd HH:mm:ss[.S]" (Spark cast format)
            java.sql.Timestamp.valueOf(raw).getTime * 1000L +
              (java.sql.Timestamp.valueOf(raw).getNanos / 1000L) % 1000L
          case other => sys.error(s"graft-delim: unsupported type $other")
        }
      i += 1
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  override def get(): InternalRow = current
  override def close(): Unit = lines.close()
}

/** Query-surface companion: the `::`-file round trip as an end-to-end
  * relational input. */
object DelimV2 {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  /** Stage `table` as multi-part `::`-delimited text once per JVM. */
  private[graft] def stage(spark: SparkSession, dir: String,
      table: String): String =
    Staging.once("delimv2", s"$dir/$table") { out =>
      val t = graft.Tables(spark, dir, table)
      t.select(concat_ws("::",
          t.columns.map(c => coalesce(col(c).cast("string"), lit(""))).toIndexedSeq: _*)
          .as("value"))
        .write.mode("overwrite").text(out)
    }

  /** Full lineitem relation through the V2 source. */
  private[graft] def lineitemV2(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.DelimV2")
      .schema(graft.Tables(spark, dir, "lineitem").schema)
      .option("path", stage(spark, dir, "lineitem"))
      .option("delimiter", "::")
      .load()

  /** q8f: distinct (returnflag, linestatus) read through the V2 source —
    * an 11-column file under a 2-column projection; the scan's ReadSchema
    * narrows to exactly those positions (spec-asserted), so 9 of 11
    * fields are never parsed. Shares q09's oracle. */
  def distinctFlags(spark: SparkSession, dir: String): DataFrame =
    lineitemV2(spark, dir)
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")
}
