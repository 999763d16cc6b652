package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite `levenshtein(a, b) <= k` guards (and their
  * mirrored/strict forms) into the banded `graft_edit_within(a, b, k)`
  * predicate — O(k·min(|a|,|b|)) with early band exit instead of the
  * full O(|a|·|b|) matrix whose exact distance the comparison throws
  * away. Semantics-preserving: both sides null-propagate and agree on
  * every non-null input (EditWithinExpr is property-tested against the
  * full DP), so the rewrite is safe anywhere the expression appears.
  *
  * This is the library's `Rule[LogicalPlan]` surface, injected through
  * [[GraftExtensions]]; only the thresholdless levenshtein form is
  * touched (Spark's own 3-arg thresholded variant already bands).
  */
object RewriteLevenshteinGuard extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 0 => EditWithinExpr(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 0 => EditWithinExpr(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
          if k >= 1 => EditWithinExpr(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
          if k >= 1 => EditWithinExpr(a, b, k - 1)
    }
}
