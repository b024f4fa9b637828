package graft.plans

import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Engine optimizer rules, injected via [[GraftExtensions]].
  */
object rules {

  /** `array_distinct(word_shingles(x, n))` → `word_shingles(x, n)`:
    * the shingle expression already emits first-occurrence-distinct
    * grams, so the extra distinct pass (an O(len²)-ish interpreted
    * collection op per row) is pure waste — the kind of idempotence
    * fact only the expression's author can teach the optimizer. */
  object CollapseShingleDistinct extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case ArrayDistinct(ws: expressions.WordShingles) => ws
      }
  }
}
