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
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case op =>
      // Rewrite ONLY when the operator does not ALSO materialize the
      // same shingle array elsewhere (e.g. curationFlags selects both
      // `sh` and `size(sh)`): there, codegen subexpression elimination
      // shares ONE TokenShingles pass, and splitting the count into a
      // separate ShingleCount would tokenize every row twice — the
      // rewrite would be a pessimization, not a win.
      val all = op.expressions.flatMap(_.collect {
        case ts: TokenShingles => ts.canonicalized })
      val underSize = op.expressions.flatMap(_.collect {
        case Size(ts: TokenShingles, false) => ts.canonicalized })
      val counts = all.groupBy(identity).map { case (k, v) => k -> v.size }
      val sizeCounts = underSize.groupBy(identity).map { case (k, v) => k -> v.size }
      // `all` visits the TokenShingles under Size too, so an expression
      // is count-only iff every occurrence sits under a Size
      val countOnly = sizeCounts.keySet.filter(k => counts(k) == sizeCounts(k))
      if (countOnly.isEmpty) op
      else op.transformExpressions {
        case Size(ts: TokenShingles, false) if countOnly(ts.canonicalized) =>
          ShingleCount(ts.child, ts.n)
      }
  }
}
