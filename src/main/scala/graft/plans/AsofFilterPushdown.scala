package graft.plans

import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Filter pushdown THROUGH the custom [[AsofJoin]] node — the
 * `Rule[LogicalPlan]` leg of the custom-operator tier. Catalyst's own
 * PushDownPredicates cannot see through an unknown plan node, so without
 * this rule a `filter` placed after `asofJoin` scans and merges the
 * whole left side before discarding rows; with it, left-side predicates
 * reach the parquet scan (PushedFilters) exactly as they would through a
 * built-in join.
 *
 * Only predicates that are deterministic and reference ONLY left-side
 * attributes move. Right-side predicates must stay above: the join is
 * left-outer, and post-join right columns are MATCH RESULTS — filtering
 * the right input would change which row matches (and null-extended rows
 * would pass/fail differently), so pushing them is not
 * semantics-preserving.
 */
object AsofFilterPushdown extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsofJoin) =>
      val (push, keep) = splitConjunctivePredicates(cond).partition(p =>
        p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(org.apache.spark.sql
          .catalyst.expressions.And), j.left))
        keep.reduceOption(org.apache.spark.sql.catalyst.expressions.And)
          .map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
