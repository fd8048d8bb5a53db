package graft.expr

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rules for the graft expression family — the
  * `Rule[LogicalPlan]` rung of the custom-operator ladder
  * (expression → rule → strategy → plan node; the other rungs live in
  * [[VectorExprs]] and [[graft.plans.AsOfJoinPlan]]). Injected by
  * [[GraftExtensions]] via `injectOptimizerRule`, so every session
  * configured with `spark.sql.extensions=graft.expr.GraftExtensions`
  * optimizes these for free.
  */
object GraftRules {

  /** `graft_normalize(graft_normalize(x))` → `graft_normalize(x)`.
    *
    * Users compose normalization unknowingly (a pre-normalized view
    * joined into an operator that defensively normalizes again), and
    * each application is a full O(d) two-pass per row. The rewrite
    * applies graft_normalize's CONTRACT — projection onto the unit
    * sphere, idempotent for EVERY input class: degenerate input
    * (zero vector, NaN or infinite COMPONENTS) produces the ALL-NaN
    * array on both the single and the double application, finite
    * vectors whose squared norm overflows are rescued by
    * [[NormalizeArray]]'s max-abs pre-scale (the result is unit-norm,
    * so the second application takes the regular path), and for
    * regular input the inner result is unit-norm up to 1 ulp, so the
    * dropped outer pass could only rescale by a few ulps. No driver
    * key nests normalizes, so the DuckDB bit-parity contract is
    * untouched; the rule exists for user queries.
    */
  object NormalizeIdempotence extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case NormalizeArray(inner @ NormalizeArray(_)) => inner
      }
  }
}
