package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SortOrder, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer integration of the [[TopKPerGroupNode]] operator: the classic
  * per-group top-k idiom
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .where($"rn" <= k)
  *
  * analyzes to `Filter(rn <= k, Project(..., Window([row_number() AS rn],
  * g, o)))`. The window plan shuffles and fully SORTS every group to emit
  * k rows; Spark's own mitigation (`InsertWindowGroupLimit`) only
  * pre-filters per partition — the sort and the Window remain. This rule
  * replaces the whole pattern with [[TopKPerGroupNode]] (bounded heaps,
  * partial + final, no sort), reusing the ORIGINAL rank attribute (same
  * exprId, row_number's exact IntegerType shape) so the Project above and
  * anything downstream resolve unchanged, and dropping the Filter — the
  * node emits ranks 1..k by construction.
  *
  * Semantics: identical to row_number whenever the ordering is total, and
  * "some consistent choice among ties" otherwise — exactly row_number's
  * own contract. Guards: single row_number window expression, non-empty
  * partition spec (the node requires a clustering), only the rank
  * predicate in the Filter, k bounded so per-task heap memory stays
  * trivial. An already-inserted WindowGroupLimit child (same spec) is
  * stripped — the node's partial tier does that job.
  */
object TopKRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  private val MaxK = 100000

  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rank.exprId => Some(k)
      case LessThan(a: AttributeReference, IntegerLiteral(k))
        if a.exprId == rank.exprId => Some(k - 1)
      // reversed operand order (k >= rn / k > rn)
      case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
        if a.exprId == rank.exprId => Some(k)
      case GreaterThan(IntegerLiteral(k), a: AttributeReference)
        if a.exprId == rank.exprId => Some(k - 1)
      // rn = 1 is exactly top-1 (row_number is never < 1); rn = k for
      // k > 1 is NOT a prefix and must keep its Window
      case EqualTo(a: AttributeReference, IntegerLiteral(1))
        if a.exprId == rank.exprId => Some(1)
      case EqualTo(IntegerLiteral(1), a: AttributeReference)
        if a.exprId == rank.exprId => Some(1)
      case _ => None
    }

  private def rewrite(cond: Expression, proj: Option[Project],
      w: Window): Option[LogicalPlan] = w match {
    case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
        partitionSpec, orderSpec, child, _)
      if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      // compound filters rewrite too: the rank-limit conjunct is consumed
      // by the node, every other conjunct stays as a Filter ABOVE it (they
      // may reference the rank attr — its values are identical)
      val conjuncts = splitConjunctivePredicates(cond)
      val rank = alias.toAttribute
      val limits = conjuncts.flatMap(c => rankLimit(c, rank).map(c -> _))
      limits.headOption.flatMap { case (limitConjunct, k) =>
        if (k <= 0 || k > MaxK) None
        else {
          // Spark may already have inserted its per-partition pre-filter;
          // the node's partial tier subsumes it
          val realChild = child match {
            case WindowGroupLimit(ps, os, _, limit, c)
              if ps == partitionSpec && os == orderSpec && limit >= k => c
            case c => c
          }
          val node = TopKPerGroupNode(partitionSpec, orderSpec, k,
            rank.asInstanceOf[AttributeReference], realChild)
          val base = proj.map(p => p.copy(child = node)).getOrElse(node)
          val rest = conjuncts.filterNot(_ eq limitConjunct)
          Some(if (rest.isEmpty) base
            else Filter(rest.reduce(org.apache.spark.sql.catalyst.expressions.And), base))
        }
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      rewrite(cond, Some(p), w).getOrElse(f)
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, None, w).getOrElse(f)
  }
}
