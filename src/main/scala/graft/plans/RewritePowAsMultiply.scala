package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer-rule surface demo (`injectOptimizerRule` /
  * `spark.experimental.extraOptimizations`): rewrite `pow(x, 2)` into
  * `x * x` — `Math.pow` is a transcendental library call, the multiply is
  * one codegen'd instruction. Mirrors the XLA-style algebraic
  * simplifications `@jax.jit` applies to the reference's compute
  * (`trainer/flax_model.py:180`).
  *
  * Not wired into any oracle query (their arithmetic is written as explicit
  * products precisely so both engines share the operation); exercised by
  * RewriteRuleSpec and available via `GraftExtensions` for deployments that
  * opt in.
  */
object RewritePowAsMultiply extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Pow(x, Literal(2.0, DoubleType)) => Multiply(x, x)
    }
}
