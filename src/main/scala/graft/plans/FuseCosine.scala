package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import graft.functions.{CosineSim, DotProduct}

/** Optimizer rule — SURVEY.md §4 ladder, the `Rule[LogicalPlan]` rung:
  * rewrites the three-pass cosine pattern
  *
  *   vector_dot(a, b) / (sqrt(vector_dot(a, a)) * sqrt(vector_dot(b, b)))
  *
  * into the fused single-pass [[CosineSim]] wherever a user (or
  * generated SQL) spelled it out long-hand. Safe because CosineSim is
  * bit-identical to the decomposed form (per-accumulator order and the
  * final scalar ops are the same — proven in VectorExpressionSpec);
  * profitable because one array traversal replaces three.
  *
  * Registered via `spark.sql.extensions=graft.GraftExtensions`
  * (injectOptimizerRule) or `GraftExtensions.register(spark)`
  * (experimental.extraOptimizations).
  */
object FuseCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(dot @ DotProduct(a, b),
                Multiply(Sqrt(DotProduct(a1, a2)), Sqrt(DotProduct(b1, b2)), _), _)
        if a1.semanticEquals(a) && a2.semanticEquals(a) &&
           b1.semanticEquals(b) && b2.semanticEquals(b) =>
      CosineSim(a, b)
  }
}
