package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical AS-OF join — the whole-operator extension tier the builder
  * contract reserves for semantics Spark's built-in operators can't
  * express as a single operator (preference (c): custom `LogicalPlan` +
  * `Rule`/`SparkStrategy` + `SparkPlan` via `SparkSessionExtensions`).
  *
  * Semantics (inner flavor, matching DuckDB `ASOF JOIN` and the composed
  * [[graft.ops.AsOf.asofJoin]]): for every left row, join the single right
  * row with the same key and the greatest right time <= the left row's
  * time; left rows with no such right row are dropped.
  *
  * The reference engine's analog is the hand-wired HashJoin build/probe
  * pair (`/root/reference/src/executor/mod.rs:310-381`) — here the
  * "build" is a co-partitioned co-sorted merge, declared to Catalyst via
  * distribution/ordering requirements instead of hand-scheduled.
  *
  * All four expressions must be resolved attributes of the respective
  * child (the API layer binds them by name), so this node never needs
  * analyzer help: it is born resolved.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
