package graft.plans

import org.apache.spark.sql.catalyst.expressions.Lower
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (injected via SparkSessionExtensions): algebraic
  * simplifications for the graft native text expressions.
  *
  *  - strip_diacritics is idempotent: `strip(strip(x))` → `strip(x)`
  *  - case-folding commutes with diacritic stripping and NFD leaves ASCII
  *    untouched, so `strip(lower(strip(x)))` → `lower(strip(x))` — the
  *    shape search predicates naturally produce when callers normalize
  *    both sides defensively.
  *
  * A tiny rule, but it runs the full extension path (injectOptimizerRule)
  * and removes a per-row NFD normalization from the hot filter loop when
  * callers double-normalize.
  */
case class NormalizeSimplification(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeDiacritics(inner @ NormalizeDiacritics(_)) => inner
      case NormalizeDiacritics(Lower(inner @ NormalizeDiacritics(_))) => Lower(inner)
    }
}
