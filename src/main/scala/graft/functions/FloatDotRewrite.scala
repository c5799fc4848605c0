package graft.functions

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** Optimizer rule (registered via GraftExtensions.injectOptimizerRule):
  * `array_dot(cast(a AS array<double>), cast(b AS array<double>))` over
  * array<float> inputs → `float_array_dot(a, b)`.
  *
  * The cast materializes a fresh double[] per row per side before the dot
  * loop even starts; the rewritten expression reads the float buffers
  * directly and widens per element in-register. float→double widening is
  * exact, so results are bit-identical — q49's DuckDB oracle doubles as the
  * rewrite's correctness proof. This is the engine's example of the
  * Rule[LogicalPlan] extension tier (SURVEY.md §7: none are *required* for
  * parity; this one pays for itself in the ANN hot path). */
object FloatDotRewrite extends Rule[LogicalPlan] {
  private def floatArray(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayDotProduct(Cast(a, _, _, _), Cast(b, _, _, _))
        if floatArray(a) && floatArray(b) =>
      FloatArrayDotProduct(a, b)
  }
}
