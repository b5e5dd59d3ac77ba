package graft.plans

import org.apache.spark.sql.catalyst.expressions.Size
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{ShingleCount, TokenShingles}

/** Optimizer rule: `size(graft_shingles(text, n))` →
  * `graft_shingle_count(text, n)`.
  *
  * A query that only needs the shingle COUNT (repetition_ratio, the
  * curation pipeline's sz column) would otherwise build every shingle
  * string plus a GenericArrayData per row just to read its length.
  * The count-only form probes a hash set per window and allocates
  * nothing else — the classic project-under-the-operator rewrite, done
  * where it belongs: in the optimizer, so USERS keep writing the
  * natural `size(...)` form and every call site benefits.
  *
  * Guarded on `legacySizeOfNull = false` (the default): under the
  * legacy flag `size(NULL)` is −1 while the count-only form is NULL,
  * so legacy plans are left untouched. Injected by
  * [[graft.GraftExtensions]] (injectOptimizerRule at build time,
  * `experimental.extraOptimizations` on live sessions).
  */
object CountOnlyShingles extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ts: TokenShingles, false) => ShingleCount(ts.child, ts.n)
    }
}
