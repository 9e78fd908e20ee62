package graft.plans

import graft.functions.TextNormalize
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Custom Catalyst optimizer rules for graft's native expressions —
  * the `Rule[LogicalPlan]` rung of the extension ladder (below
  * Expression, above SparkStrategy), registered through
  * [[graft.GraftExtensions]] with `injectOptimizerRule` so EVERY query
  * in an extensions-configured session benefits, SQL or Column API.
  */
object GraftRules {

  /** Collapse nested [[TextNormalize]] applications to one.
    *
    * The kernel is idempotent by construction — NFC is idempotent,
    * and stripping/collapsing/trimming an already-normalized string is
    * the identity — so `graft_normalize_text(graft_normalize_text(x))`
    * ≡ one application. Pipelines hit this shape constantly: each
    * cleaning stage defensively normalizes its input, and a composed
    * job would otherwise pay the full string pass per stage, per row.
    * The rule runs to fixpoint, so any nesting depth flattens.
    * (LlmOpsSpec asserts kernel idempotence; ExtensionsSpec asserts
    * the plan rewrite and result equality.)
    */
  object CollapseNormalize extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case TextNormalize(inner @ TextNormalize(_)) => inner
      }
  }
}
