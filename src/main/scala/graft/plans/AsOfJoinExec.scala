package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

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
  * Null semantics: rows with a null key or null time on either side never
  * match (SQL comparison semantics, same as the composed variant and
  * DuckDB ASOF).
  */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

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

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      .asInstanceOf[Ordering[Any]]
    val schema = left.output ++ right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema.map(_.asInstanceOf[Expression]), schema)
      val joined = new JoinedRow
      // Buffered so the head right row can be examined before deciding to
      // consume it; rows are only copied when retained as the candidate
      // (the underlying iterator reuses its row object).
      val rBuf = rIter.buffered
      var candKey: Any = null
      var candRow: InternalRow = null

      lIter.flatMap { lRow =>
        val lk = lKey.eval(lRow)
        val lt = lTime.eval(lRow)
        if (lk == null || lt == null) Iterator.empty
        else {
          // Advance the right side past every row that can still only match
          // this or a later left row: key strictly before lk, or same key
          // with time <= lt. The last same-key row consumed is the match
          // candidate (right is time-sorted, so later consumed = later time).
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val rk = rKey.eval(head)
            val rt = rTime.eval(head)
            if (rk == null || rt == null) { rBuf.next() } // never matches; skip
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next() } // stale key; discard
              else if (c == 0 && timeOrd.lteq(rt, lt)) {
                val r = rBuf.next()
                if (candKey == null || keyOrd.compare(candKey, rk) != 0) candKey = rk
                candRow = r.copy()
              } else advancing = false
            }
          }
          if (candRow != null && candKey != null && keyOrd.compare(candKey, lk) == 0) {
            joined(lRow, candRow)
            Iterator.single(proj(joined))
          } else Iterator.empty
        }
      }
    }
  }
}
