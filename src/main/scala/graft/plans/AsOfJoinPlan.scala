package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Logical AS-OF join — the whole-operator extension tier the builder
  * contract reserves for semantics Spark's built-in operators can't
  * express as a single operator (preference (c): custom `LogicalPlan` +
  * `Rule`/`SparkStrategy` + `SparkPlan` via `SparkSessionExtensions`).
  *
  * Semantics (matching DuckDB `ASOF JOIN` / `ASOF LEFT JOIN` and the
  * composed [[graft.ops.AsOf.asofJoin]]): for every left row, join the
  * single right row with the same key and the greatest right time <= the
  * left row's time.
  *
  *  - `outer = false` (inner): left rows with no such right row are
  *    dropped.
  *  - `outer = true` (left outer): unmatched left rows emit with a
  *    null-extended right side — including left rows with a null key or
  *    time, which can never match (SQL comparison semantics).
  *  - `tolerance` (optional, in the native units of the time type — micros
  *    for timestamps): a candidate only matches if
  *    `leftTime - rightTime <= tolerance`. Because the retained candidate
  *    is the LATEST right row at-or-before the left time, a candidate
  *    outside the tolerance means no earlier row can qualify either, so
  *    the check is O(1) per left row. DuckDB mirrors it as a post-ASOF
  *    `epoch_us(l.ts) - epoch_us(r.ts) <= tol` predicate.
  *  - `forward = true` flips the time direction (DuckDB
  *    `ASOF JOIN ... ON l.ts <= r.ts`): each left row joins the EARLIEST
  *    right row with the same key at-or-after its time — "first purchase
  *    after signup" / next-quote semantics. The merge stays single-pass:
  *    the matching right head is peeked, never consumed (it may also match
  *    later left rows), and `tolerance` bounds `rightTime - leftTime`.
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
    rightTime: Expression,
    outer: Boolean = false,
    tolerance: Option[Long] = None,
    forward: Boolean = false)
  extends BinaryNode {

  // Fail at ANALYSIS time, not mid-job on an executor: the generated
  // orderings and the tolerance time-getter are derived from the LEFT
  // side's types but applied to right-side rows, so a type mismatch here
  // would otherwise surface as silently wrong comparisons (e.g. timestamp
  // micros ordered against raw longs) or a per-partition cast exception
  // deep into execution. Structural comparison (names/nullability ignored):
  // composite keys arrive as structs whose field NAMES differ per side by
  // construction, and orderings only consult the value layout.
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftKey.dataType, rightKey.dataType, ignoreNullability = true),
    s"as-of join key types must match: left ${leftKey.dataType} vs right ${rightKey.dataType}")
  require(org.apache.spark.sql.types.DataType.equalsStructurally(
      leftTime.dataType, rightTime.dataType, ignoreNullability = true),
    s"as-of join time types must match: left ${leftTime.dataType} vs right ${rightTime.dataType}")
  require(tolerance.isEmpty || (leftTime.dataType match {
    case TimestampType | TimestampNTZType | LongType | IntegerType | DateType | ShortType => true
    case _ => false
  }), s"as-of tolerance requires an integral or time-typed time column, got ${leftTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
