package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension surface: top-k-per-group as a first-class plan
  * node (logical [[TopKPerGroupNode]] → [[TopKPerGroupStrategy]] →
  * physical [[TopKPerGroupExec]], registered through
  * SparkSessionExtensions — preference (c) when built-ins can't express
  * the shape efficiently).
  *
  * Why not `row_number().over(window)`: the window plan shuffles and
  * SORTS every row of every group to emit k of them — at 100 TB the sort
  * dominates and the shuffle carries the full input. This operator is the
  * aggregate shape instead: a PARTIAL pass keeps a bounded k-row heap per
  * group per partition (map-side combine — only `partitions × k` candidate
  * rows per group ever reach the exchange), then a FINAL pass merges heaps
  * under the same ordering and emits ranks 1..k. Per-task memory is
  * O(groups-in-partition × k) rows, no sort of the full input anywhere.
  * Results are identical to the window formulation whenever the ordering
  * is total (give it a tie-breaker column, exactly as you would for a
  * deterministic window) — q66 shares q61's DuckDB oracle as the proof.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rn originates HERE — without this, CheckAnalysis demands it from child
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans the logical node as partial (pre-shuffle) + final (post-shuffle)
  * [[TopKPerGroupExec]] — the same split Spark uses for partial/final
  * HashAggregate; EnsureRequirements inserts the exchange demanded by the
  * final node's ClusteredDistribution. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(groupExprs, sortOrder, k, rankAttr, child) =>
      val partial = TopKPerGroupExec(groupExprs, sortOrder, k, None, planLater(child))
      TopKPerGroupExec(groupExprs, sortOrder, k, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** One pass of bounded per-group heaps. `rankAttr = None` is the partial
  * tier (any distribution, emits surviving candidate rows unchanged);
  * `Some(attr)` is the final tier (requires clustering on the group key,
  * emits each group's rows in sort order with ranks 1..k appended).
  *
  * The heap keeps the k best rows under `sortOrder` with the WORST
  * survivor at the head (reversed comparator), so replacing it on a better
  * arrival is O(log k); rows and keys are copied on retention (Spark
  * iterators reuse row buffers). Correctness of the split: top-k selection
  * is monotone — a row in the global group top-k is in its partition's
  * top-k — so the union of partial survivors always contains the final
  * answer. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kCap = k
    val groupE = groupExprs
    val sortE = sortOrder
    val childOut = child.output
    val emitRank = rankAttr.isDefined
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOut)
      val toUnsafe = UnsafeProjection.create(childOut.map(_.dataType).toArray)
      val ord = GenerateOrdering.generate(sortE, childOut)
      val worstFirst = ord.reverse.asInstanceOf[java.util.Comparator[UnsafeRow]]
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      iter.foreach { row =>
        val u = toUnsafe(row)
        val key = keyProj(u)
        val heap = heaps.get(key)
        if (heap == null) {
          val h = new java.util.PriorityQueue[UnsafeRow](kCap, worstFirst)
          h.add(u.copy())
          heaps.put(key.copy(), h)
        } else if (heap.size < kCap) {
          heap.add(u.copy())
        } else if (ord.compare(u, heap.peek()) < 0) {
          heap.poll()
          heap.add(u.copy())
        }
      }
      if (!emitRank) {
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      } else {
        val projOut = UnsafeProjection.create(
          (childOut.map(_.dataType) :+ IntegerType).toArray)
        val rankRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        heaps.values().iterator().asScala.flatMap { heap =>
          val rows = new Array[UnsafeRow](heap.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = heap.poll(); i -= 1 } // drain worst→best
          rows.iterator.zipWithIndex.map { case (r, idx) =>
            rankRow.setInt(0, idx + 1)
            projOut(joined(r, rankRow)).copy()
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** Top `k` rows per group under `sortCols` (name → descending?), with a
    * 1-based rank column appended. The ordering must be total within a
    * group (add a tie-break column) for deterministic output — the same
    * contract as a deterministic window. */
  def apply(df: DataFrame, groupCols: Seq[String],
      sortCols: Seq[(String, Boolean)], k: Int,
      rankName: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(name: String): Attribute =
      analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val groupExprs = groupCols.map(attr)
    val order = sortCols.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    val node = TopKPerGroupNode(groupExprs, order, k, rankAttr, analyzed)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }

  /** Strategy registration for sessions not built with
    * `spark.sql.extensions=graft.functions.GraftExtensions`
    * (`experimental.extraStrategies` is the public live-session hook). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
}
