package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** Physical AS-OF join: a single-pass sort-merge over co-partitioned,
  * co-sorted children.
  *
  * The scale contract is declared, not hand-built: `requiredChildDistribution`
  * (both sides clustered on the key) and `requiredChildOrdering` (key, time)
  * make Catalyst's EnsureRequirements insert the exchanges and sorts —
  * exactly one shuffle per side, the same price as a sort-merge equi-join,
  * with NO range explosion (a naive `l.time >= r.time` theta-join is a
  * nested loop). The merge itself is O(|L| + |R|) per partition with O(1)
  * state: one retained candidate row per live key.
  *
  * Per-row work is codegen'd (round 8; previously interpreted
  * `Expression.eval` + interpreted orderings): key/time extraction runs
  * through `UnsafeProjection` (generated), and key/time comparison through
  * `RowOrdering.createNaturalAscendingOrdering` (generated with interpreted
  * fallback) — the same machinery SortMergeJoinExec binds its join keys
  * with.
  *
  * Null semantics: rows with a null key or null time on either side never
  * match (SQL comparison semantics, same as the composed variant and
  * DuckDB ASOF). Under `outer`, unmatched left rows — null-keyed included —
  * emit with a null-extended right side (DuckDB ASOF LEFT JOIN).
  * `tolerance` drops (inner) or null-extends (outer) matches with
  * `leftTime - rightTime > tolerance`; since the candidate is the latest
  * qualifying right row, no earlier row could qualify either. `forward`
  * flips the direction (earliest right at-or-after; tolerance bounds
  * `rightTime - leftTime`) — see [[AsOfJoinPlan]].
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    outer: Boolean,
    tolerance: Option[Long],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (outer) right.output.map(_.withNullability(true)) else right.output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)) ::
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)) :: Nil

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // The same observability contract as Spark's own join operators: the UI's
  // plan graph shows per-node output cardinality, which is how a user spots
  // an as-of join that matched nothing (or everything) at a glance.
  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" ->
      org.apache.spark.sql.execution.metric.SQLMetrics.createMetric(sparkContext, "number of output rows"))

  /** Single-field time value as a long in the type's native unit (micros
    * for timestamps, days for dates). Only consulted when `tolerance` is
    * set; resolved once per partition, not per row. */
  private def timeGetter: InternalRow => Long = leftTime.dataType match {
    case TimestampType | TimestampNTZType | LongType => (r: InternalRow) => r.getLong(0)
    case IntegerType | DateType => (r: InternalRow) => r.getInt(0).toLong
    case ShortType => (r: InternalRow) => r.getShort(0).toLong
    case t => throw new IllegalArgumentException(
      s"as-of tolerance requires an integral or time-typed time column, got $t")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = tolerance
    val emitUnmatched = outer
    val schema = output
    val numOutputRows = longMetric("numOutputRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(leftKey), left.output)
      val rKeyProj = UnsafeProjection.create(Seq(rightKey), right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftKey.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(leftTime.dataType))
      val getTime = if (tol.isDefined) timeGetter else null
      val proj = UnsafeProjection.create(schema.map(_.asInstanceOf[Expression]), schema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(right.output.size)
      // Buffered so the head right row can be examined before deciding to
      // consume it; rows are only copied when retained as the candidate
      // (the underlying iterator reuses its row object).
      val rBuf = rIter.buffered

      val joinedRows: Iterator[InternalRow] = if (forward) {
        // Forward merge: each left row matches the FIRST same-key right row
        // with time >= its own. The matching head is peeked, never consumed
        // — it may also be the match for later (larger-time) left rows of
        // the same key; rows are consumed only once no current-or-later
        // left can match them (smaller key, or same key with smaller time).
        lIter.flatMap { lRow =>
          val lkRow = lKeyProj(lRow)
          val ltRow = lTimeProj(lRow)
          if (lkRow.isNullAt(0) || ltRow.isNullAt(0)) {
            if (emitUnmatched) Iterator.single(proj(joined(lRow, nullRight)))
            else Iterator.empty
          } else {
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val head = rBuf.head
              val rkRow = rKeyProj(head)
              val rtRow = rTimeProj(head)
              if (rkRow.isNullAt(0) || rtRow.isNullAt(0)) { rBuf.next() } // never matches; skip
              else {
                val c = keyOrd.compare(rkRow, lkRow)
                if (c < 0) { rBuf.next() } // stale key; discard
                else if (c == 0 && timeOrd.compare(rtRow, ltRow) < 0) { rBuf.next() } // too early
                else advancing = false
              }
            }
            val matched = rBuf.hasNext && {
              val head = rBuf.head
              val rkRow = rKeyProj(head)
              !rkRow.isNullAt(0) && keyOrd.compare(rkRow, lkRow) == 0 &&
                tol.forall(t => getTime(rTimeProj(head)) - getTime(ltRow) <= t)
            }
            if (matched) Iterator.single(proj(joined(lRow, rBuf.head)))
            else if (emitUnmatched) Iterator.single(proj(joined(lRow, nullRight)))
            else Iterator.empty
          }
        }
      } else {
        var candKey: InternalRow = null
        var candRow: InternalRow = null
        var candTime: Long = 0L

        lIter.flatMap { lRow =>
          val lkRow = lKeyProj(lRow)
          val ltRow = lTimeProj(lRow)
          if (lkRow.isNullAt(0) || ltRow.isNullAt(0)) {
            if (emitUnmatched) Iterator.single(proj(joined(lRow, nullRight)))
            else Iterator.empty
          } else {
            // Advance the right side past every row that can still only match
            // this or a later left row: key strictly before lk, or same key
            // with time <= lt. The last same-key row consumed is the match
            // candidate (right is time-sorted, so later consumed = later time).
            var advancing = true
            while (advancing && rBuf.hasNext) {
              val head = rBuf.head
              val rkRow = rKeyProj(head)
              val rtRow = rTimeProj(head)
              if (rkRow.isNullAt(0) || rtRow.isNullAt(0)) { rBuf.next() } // never matches; skip
              else {
                val c = keyOrd.compare(rkRow, lkRow)
                if (c < 0) { rBuf.next() } // stale key; discard
                else if (c == 0 && timeOrd.compare(rtRow, ltRow) <= 0) {
                  val r = rBuf.next()
                  candKey = rkRow.copy()
                  candRow = r.copy()
                  if (tol.isDefined) candTime = getTime(rtRow)
                } else advancing = false
              }
            }
            val matched = candRow != null && candKey != null &&
              keyOrd.compare(candKey, lkRow) == 0 &&
              tol.forall(t => getTime(ltRow) - candTime <= t)
            if (matched) Iterator.single(proj(joined(lRow, candRow)))
            else if (emitUnmatched) Iterator.single(proj(joined(lRow, nullRight)))
            else Iterator.empty
          }
        }
      }
      joinedRows.map { r => numOutputRows += 1; r }
    }
  }
}
