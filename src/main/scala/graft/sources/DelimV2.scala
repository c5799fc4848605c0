package graft.sources

import java.util.regex.Pattern

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull}
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
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var aggs: Array[(String, Int, DataType)] = Array.empty
  private var limit: Int = -1

  /** Limit pushdown (`SupportsPushDownLimit`): each partition stops
    * READING after `limit` passing lines — partial pushdown
    * (`isPartiallyPushed` stays true), Spark's own Limit still applies the
    * exact global cut. Turns LIMIT k over a huge file set into k lines
    * read per partition instead of a full scan. */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve the caller's requested order; fields resolve by NAME to
    // their positions in the full schema at read time. When an aggregation
    // was pushed, Spark prunes to the AGGREGATED schema — ignored, the agg
    // scan defines its own output.
    if (aggs.isEmpty) required = requiredSchema

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

  /** Aggregate pushdown (`SupportsPushDownAggregates`): global (ungrouped)
    * COUNT(*) / MIN(col) / MAX(col) are computed INSIDE the reader — one
    * partial row per file partition, no row materialization at all — and
    * Spark's final aggregate merges the partials (partial pushdown, the
    * correctness-safe default: `supportCompletePushDown` stays false
    * because multiple part files each emit their own partial). Composes
    * with pushed filters: partials are computed over passing lines only. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    // an EMPTY aggregation list arrives when a count() sits above the
    // pushed aggregate and pruning removed every inner expression —
    // accepting it vacuously would make build() return the row scan while
    // Spark expects a zero-column agg scan ("unexpected number of columns")
    if (aggregation.groupByExpressions.nonEmpty ||
        aggregation.aggregateExpressions.isEmpty) return false
    def field(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[(Int, DataType)] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 &&
          full.fieldNames.contains(nr.fieldNames()(0)) =>
        val i = full.fieldIndex(nr.fieldNames()(0))
        Some((i, full.fields(i).dataType))
      case _ => None
    }
    val compiled: Array[Option[(String, Int, DataType)]] =
      aggregation.aggregateExpressions.map {
        case _: CountStar => Some(("count", -1, LongType: DataType))
        case m: Min => field(m.column).map { case (i, t) => ("min", i, t) }
        case m: Max => field(m.column).map { case (i, t) => ("max", i, t) }
        case _ => None
      }
    if (compiled.contains(None)) false
    else { aggs = compiled.flatten; true }
  }

  override def build(): Scan =
    if (aggs.nonEmpty) new DelimAggScan(full, aggs, pushed, path, delim)
    else new DelimScan(full, required, pushed, path, delim, limit)
}

private[sources] object DelimFiles {
  /** Part files under `path` (or `path` itself), sorted for determinism. */
  def list(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala
        .filter(f => java.nio.file.Files.isRegularFile(f))
        .map(_.toString).filterNot(f =>
          f.endsWith(".crc") || f.endsWith("_SUCCESS")).toList.sorted
      finally s.close()
    } else Seq(p.toString)
  }

  /** Parse one raw field to the Spark-internal value for `dt` (empty →
    * null, mirroring the `concat_ws` writer's null encoding). */
  def parseField(raw: String, dt: DataType): Any =
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

  /** Total order used by pushed MIN/MAX — matches Spark's ordering for
    * the supported types (UTF8String is binary-comparable). */
  def lt(a: Any, b: Any, dt: DataType): Boolean = dt match {
    case LongType => a.asInstanceOf[Long] < b.asInstanceOf[Long]
    case IntegerType => a.asInstanceOf[Int] < b.asInstanceOf[Int]
    case DoubleType => a.asInstanceOf[Double] < b.asInstanceOf[Double]
    case FloatType => a.asInstanceOf[Float] < b.asInstanceOf[Float]
    case StringType =>
      a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]) < 0
    case other => sys.error(s"graft-delim: agg pushdown unsupported for $other")
  }
}

private[sources] class DelimScan(full: StructType, required: StructType,
    pushed: Array[Filter], path: String, delim: String,
    limit: Int = -1) extends Scan with Batch with SupportsRuntimeFiltering {

  // runtime IN-sets per field position (allowed RAW strings), delivered by
  // Spark's dynamic pruning AFTER the build side of a join materializes
  private var runtimeIn: Array[(Int, Set[String])] = Array.empty

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-delim $path delim='$delim' pushed=${pushed.mkString(",")}" +
      (if (limit >= 0) s" pushedLimit=$limit" else "")

  /** Runtime filtering (`SupportsRuntimeFiltering`) — the DSv2 face of
    * dynamic partition pruning: when this scan is the probe side of a
    * join whose build side carries a selective filter, Spark delivers the
    * build side's join-key values as an `In` filter at EXECUTION time and
    * the reader drops non-matching lines on the raw field, before
    * parsing. Offered for types whose cast-to-string is canonical (the
    * writer's encoding), so raw-string comparison equals typed
    * comparison. */
  override def filterAttributes(): Array[NamedReference] =
    // resolved against the scan OUTPUT → advertise pruned columns only
    required.fields.collect {
      case f if f.dataType == StringType || f.dataType == LongType ||
          f.dataType == IntegerType => Expressions.column(f.name)
    }

  override def filter(filters: Array[Filter]): Unit = {
    runtimeIn = filters.collect {
      case In(a, vs) if full.fieldNames.contains(a) =>
        (full.fieldIndex(a),
          vs.iterator.filter(_ != null).map(_.toString).toSet)
    }
    DelimV2.lastRuntimeFilter = filters.mkString(",") // diagnostic (spec)
  }

  override def planInputPartitions(): Array[InputPartition] =
    DelimFiles.list(path).map(f => DelimInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    DelimReaderFactory(full, required, pushed, delim, limit, runtimeIn)
}

/** Scan for pushed global aggregates: one PARTIAL row per file partition
  * (count / min / max over passing lines), no row materialization. */
private[sources] class DelimAggScan(full: StructType,
    aggs: Array[(String, Int, DataType)], pushed: Array[Filter],
    path: String, delim: String) extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(aggs.zipWithIndex.map { case ((kind, _, dt), i) =>
      StructField(s"${kind}_$i", dt, nullable = true)
    }.toIndexedSeq)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-delim-agg $path pushedAggs=" +
      aggs.map { case (k, p, _) => if (p < 0) k else s"$k(${full.fieldNames(p)})" }
        .mkString(",")

  override def planInputPartitions(): Array[InputPartition] =
    DelimFiles.list(path).map(f => DelimInputPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    DelimAggReaderFactory(full, aggs, pushed, delim)
}

private[sources] case class DelimAggReaderFactory(full: StructType,
    aggs: Array[(String, Int, DataType)], pushed: Array[Filter], delim: String)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DelimAggPartitionReader(
      partition.asInstanceOf[DelimInputPartition].file, full, aggs, pushed, delim)
}

/** Single-pass partial aggregation over one file: split, filter on raw
  * fields, fold count/min/max — emits exactly one row. */
private[sources] class DelimAggPartitionReader(file: String, full: StructType,
    aggs: Array[(String, Int, DataType)], pushed: Array[Filter], delim: String)
    extends PartitionReader[InternalRow] {

  private val pattern = Pattern.compile(Pattern.quote(delim))
  private val fullIndex = full.fieldNames.zipWithIndex.toMap
  private val rawChecks: Array[(Int, String)] = pushed.collect {
    case EqualTo(a, v: String) => (fullIndex(a), v)
    case IsNotNull(a) => (fullIndex(a), null)
  }

  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (done) return false
    var count = 0L
    val acc = new Array[Any](aggs.length)
    val lines = java.nio.file.Files.lines(java.nio.file.Paths.get(file))
    try {
      val it = lines.iterator()
      while (it.hasNext) {
        val parts = pattern.split(it.next(), -1)
        if (passes(parts)) {
          count += 1
          var i = 0
          while (i < aggs.length) {
            val (kind, pos, dt) = aggs(i)
            if (pos >= 0 && pos < parts.length) {
              val v = DelimFiles.parseField(parts(pos), dt)
              if (v != null && (acc(i) == null ||
                  (kind == "min" && DelimFiles.lt(v, acc(i), dt)) ||
                  (kind == "max" && DelimFiles.lt(acc(i), v, dt))))
                acc(i) = v
            }
            i += 1
          }
        }
      }
    } finally lines.close()
    row = InternalRow.fromSeq(aggs.zipWithIndex.map { case ((kind, _, _), i) =>
      if (kind == "count") count else acc(i)
    }.toIndexedSeq)
    done = true
    true
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

  override def get(): InternalRow = row
  override def close(): Unit = ()
}

private[sources] case class DelimInputPartition(file: String) extends InputPartition

private[sources] case class DelimReaderFactory(full: StructType,
    required: StructType, pushed: Array[Filter], delim: String,
    limit: Int = -1, runtimeIn: Array[(Int, Set[String])] = Array.empty)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DelimPartitionReader(
      partition.asInstanceOf[DelimInputPartition].file, full, required, pushed,
      delim, limit, runtimeIn)
}

/** Per-partition line reader: split once, evaluate pushed filters on the
  * raw fields, then parse ONLY the required positions. */
private[sources] class DelimPartitionReader(file: String, full: StructType,
    required: StructType, pushed: Array[Filter], delim: String,
    limit: Int = -1, runtimeIn: Array[(Int, Set[String])] = Array.empty)
    extends PartitionReader[InternalRow] {

  private var emitted = 0L

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
    if (limit >= 0 && emitted >= limit) return false
    while (it.hasNext) {
      val parts = pattern.split(it.next(), -1)
      if (passes(parts)) { current = toRow(parts); emitted += 1; return true }
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
    i = 0
    while (i < runtimeIn.length) {
      val (pos, allowed) = runtimeIn(i)
      if (pos >= parts.length || !allowed.contains(parts(pos))) return false
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
      values(i) = DelimFiles.parseField(raw, dt)
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

  /** Diagnostic only (read by DelimV2Spec): the last runtime filter the
    * scan received, proving dynamic pruning reached the source. */
  @volatile private[sources] var lastRuntimeFilter: String = ""

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

  /** q9i: global COUNT/MIN/MAX served by AGGREGATE PUSHDOWN — the scan's
    * readSchema is the 3-column partial-agg schema (spec-asserted), so no
    * lineitem row is ever materialized: each file partition folds its
    * lines into one partial row and Spark's final aggregate merges them. */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    lineitemV2(spark, dir).agg(
      expr("count(*)").as("n"),
      expr("min(l_quantity)").as("min_qty"),
      expr("max(l_extendedprice)").as("max_price"))
  }
}
