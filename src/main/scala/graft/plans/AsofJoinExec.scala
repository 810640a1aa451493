package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/**
 * Physical AS-OF join: co-partition both sides on the join keys, sort
 * each partition by (keys…, time), then ONE linear merge scan — the
 * textbook time-series as-of plan (DuckDB/kdb execute the same shape;
 * the q65 oracle IS DuckDB's `ASOF LEFT JOIN`).
 *
 * Scale contract, declared to the planner rather than hand-built:
 *  - `requiredChildDistribution` = ClusteredDistribution per side — the
 *    exact contract SortMergeJoinExec declares, so EnsureRequirements
 *    inserts co-partitioned exchanges (or reuses existing ones: an
 *    already-bucketed child plans ZERO new shuffles) and AQE remains
 *    free to re-plan them;
 *  - `requiredChildOrdering` = (keys…, time) ascending — satisfied
 *    orderings are reused, otherwise a partition-local sort is added;
 *  - the merge itself is O(|L| + |R|) per partition with O(1) state
 *    (ONE buffered right row per key group) — no window buffering, no
 *    per-key hash map, nothing driver-side, arbitrarily wide time
 *    ranges at constant memory. The window-over-union composition (q34)
 *    computes the same answer but carries every right column through a
 *    running `last(ignoreNulls)` frame; this node ships rows once and
 *    compares three projections per step.
 *
 * Semantics notes (asserted by AsofJoinSpec):
 *  - inclusive match: the right row with the greatest time <= left time
 *    within the key group; among right rows tied on (key, time) the
 *    last in sort order wins — pre-aggregate the right side for a
 *    deterministic pick, as q65 does;
 *  - left-outer: unmatched left rows emit null right columns;
 *  - keys compare null-safely (a null right key can match a null left
 *    key, like Spark's `<=>`): filter null keys upstream when SQL
 *    equality semantics are required;
 *  - a NULL TIME never matches, on either side (SQL comparison
 *    semantics — `t <= NULL` is not true — and DuckDB's ASOF agrees):
 *    a null-time left row emits null right columns, a null-time right
 *    row is never a candidate.
 */
case class AsofJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan,
    direction: AsofDirection = AsofBackward,
    tolerance: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** One row out per left row, in left's partition layout. */
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def ordering(keys: Seq[Expression], time: Expression): Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(ordering(leftKeys, leftTime), ordering(rightKeys, rightTime))

  /** The merge emits left rows in their sorted order. */
  override def outputOrdering: Seq[SortOrder] = ordering(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val lKeyExprs = leftKeys; val rKeyExprs = rightKeys
    val lTimeExpr = leftTime; val rTimeExpr = rightTime
    val outAttrs = output
    // locals, like every field above: referencing the case-class fields
    // inside zipPartitions would capture `this` — the whole operator
    // subtree — into every task closure
    val dir = direction
    val tolOpt = tolerance
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition, executor-side: codegen'd projections + ordering
      val lKey = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTime = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTime = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // bind against NULLABLE right attrs: the unmatched-row null fields
      // must be read with a null check, not unboxed to zero
      val result = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      // tolerance reads the time fields as raw longs — legal for the
      // LongType/Timestamp(NTZ) types the logical node admits (both are
      // long-backed in InternalRow); both sides are non-null by the
      // time withinTol runs (null times never reach a matched pair)
      val tol = tolOpt.getOrElse(Long.MaxValue)
      def withinTol(lRow: InternalRow, rRow: InternalRow): Boolean =
        tolOpt.isEmpty || {
          val lt = lTime(lRow).getLong(0); val rt = rTime(rRow).getLong(0)
          val diff = if (lt >= rt) lt - rt else rt - lt
          // a true |lt - rt| beyond Long.MaxValue wraps negative: that
          // distance cannot be within any non-negative tolerance
          diff >= 0 && diff <= tol
        }
      dir match {
        case AsofBackward =>
          // ONE buffered candidate: the latest right row at or before
          // the current left time within the current key group
          var candidate: InternalRow = null
          var candidateKey: UnsafeRow = null
          var rHead: InternalRow = null
          lIter.map { lRow =>
            val lk = lKey(lRow)
            if (lTime(lRow).isNullAt(0)) {
              // NULL left time matches nothing; no advance either — the
              // buffered right rows belong to later left rows (null
              // times sort first, so nothing behind them is needed)
              result(joined(lRow, nullRight))
            } else {
              var advancing = true
              while (advancing && (rHead != null || rIter.hasNext)) {
                if (rHead == null) rHead = rIter.next()
                val cmp = keyOrd.compare(rKey(rHead), lk)
                if (cmp < 0) {
                  rHead = null // right key group already passed: discard
                } else if (cmp == 0 && rTime(rHead).isNullAt(0)) {
                  rHead = null // NULL right time can never match any left
                } else if (cmp == 0 && timeOrd.compare(rTime(rHead), lTime(lRow)) <= 0) {
                  // match candidate; later rows in the group can only be better
                  candidate = rHead.copy()
                  candidateKey = rKey(rHead).copy()
                  rHead = null
                } else {
                  advancing = false // right is ahead of this left row: stop
                }
              }
              val matched = candidate != null &&
                keyOrd.compare(candidateKey, lk) == 0 &&
                withinTol(lRow, candidate)
              result(joined(lRow, if (matched) candidate else nullRight))
            }
          }
        case AsofForward =>
          // no buffering at all: the first right row with key == lk and
          // time >= left time IS the match (it is the nearest future
          // row), and it must NOT be consumed — the next left row may
          // need the same one. Rows the advance discards are strictly
          // in the past of every remaining left row (null right times
          // sort first and compare < 0, so they are discarded here too).
          var rHead: InternalRow = null
          lIter.map { lRow =>
            val lk = lKey(lRow)
            if (lTime(lRow).isNullAt(0)) {
              result(joined(lRow, nullRight)) // NULL left time: no match
            } else {
              var advancing = true
              while (advancing && (rHead != null || rIter.hasNext)) {
                if (rHead == null) rHead = rIter.next()
                val cmp = keyOrd.compare(rKey(rHead), lk)
                if (cmp < 0 ||
                    (cmp == 0 && timeOrd.compare(rTime(rHead), lTime(lRow)) < 0)) {
                  rHead = null // behind this (and every later) left row
                } else {
                  advancing = false
                }
              }
              val matched = rHead != null &&
                keyOrd.compare(rKey(rHead), lk) == 0 &&
                withinTol(lRow, rHead)
              result(joined(lRow, if (matched) rHead else nullRight))
            }
          }
      }
    }
  }
}
