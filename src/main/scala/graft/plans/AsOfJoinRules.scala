package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through [[AsOfJoinPlan]].
  *
  * Catalyst's own PushDownPredicates only understands built-in nodes — a
  * custom operator is a pushdown BARRIER unless its extension also teaches
  * the optimizer what is safe to move. Without this rule, a filter above
  * the as-of join runs after the merge, and the scans read and shuffle the
  * full table: the difference between "scan one user's row groups" and
  * "shuffle 100 TB then drop 99.99%".
  *
  * Safe moves, derived from the operator's semantics (each left row joins
  * the latest right row with the same key and time <= left time):
  *
  *  - A conjunct referencing only LEFT attributes pushes to the left child:
  *    dropping left rows never affects other left rows' matches.
  *  - A conjunct referencing only the left KEY additionally pushes to the
  *    right child with the key substituted: a right row can only ever match
  *    a left row of its own key, so removing right rows of excluded keys is
  *    invisible to surviving left rows.
  *  - Everything else (right-side or mixed predicates) stays above the
  *    join: filtering right rows by payload would change WHICH right row is
  *    "latest" for a left row — semantics, not just cost.
  *
  * Fixed-point safe: the rule only fires while pushable conjuncts remain,
  * and each firing strictly moves them below the node.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, aj: AsOfJoinPlan) =>
      val conjuncts = splitConjuncts(cond)
      val (leftOnly, rest) =
        conjuncts.partition(_.references.subsetOf(aj.left.outputSet))
      // Left-key-only conjuncts mirror to the right side, keyed on rightKey.
      val keyRef = aj.leftKey.references
      val mirrored = leftOnly
        .filter(c => c.references == keyRef)
        .map(_.transform { case e if e.semanticEquals(aj.leftKey) => aj.rightKey })
      if (leftOnly.isEmpty) f
      else {
        val newLeft = Filter(leftOnly.reduce(And), aj.left)
        val newRight =
          if (mirrored.isEmpty) aj.right else Filter(mirrored.reduce(And), aj.right)
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
