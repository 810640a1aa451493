package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/**
 * Logical AS-OF join: for every left row, the single right row with the
 * same key and the greatest `rightTime <= leftTime` (left-outer: no such
 * row ⇒ nulls). The operator Spark's join menu lacks (SURVEY §2.2;
 * q34's window-over-union formulation is the composition fallback) —
 * implemented here at the brief's tier (c): a custom `LogicalPlan` +
 * `SparkStrategy` + `SparkPlan`, because whole-operator semantics can't
 * be a scalar expression and the composition can't expose a merge-scan
 * physical plan to EXPLAIN or reuse child partitioning.
 *
 * The node is built from ANALYZED children with resolved key/time
 * attributes ([[AsofOps.asofJoin]] handles name resolution and self-join
 * attribute dedup), so it passes the analyzer untouched and flows to
 * [[GraftStrategies]] at planning time.
 */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    direction: AsofDirection = AsofBackward,
    tolerance: Option[Long] = None) extends BinaryNode {

  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    s"as-of join needs matching non-empty key lists, " +
      s"got ${leftKeys.length}/${rightKeys.length}")
  // the exec orders RIGHT key rows with an ordering built from the LEFT
  // key types — mixed-width pairs (int vs long) would read garbage, so
  // reject them here like the time-type check below
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of key columns must agree in type pairwise: " +
      s"${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must agree in type: " +
      s"${leftTime.dataType} vs ${rightTime.dataType}")
  require(tolerance.forall(_ >= 0), s"negative as-of tolerance: $tolerance")
  require(tolerance.isEmpty || (leftTime.dataType match {
    case org.apache.spark.sql.types.LongType
       | org.apache.spark.sql.types.TimestampType
       | org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }), s"as-of tolerance needs a long/timestamp time column, " +
    s"got ${leftTime.dataType}")

  /** Left rows always survive; right columns are match-dependent. */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/**
 * Planner strategy mapping [[AsofJoin]] to [[AsofJoinExec]]. Injected two
 * ways, mirroring the function registration pattern
 * (graft.functions.GraftFunctions): `spark.sql.extensions` for session
 * build ([[graft.functions.GraftSparkExtensions]]) and
 * `spark.experimental.extraStrategies` for live sessions
 * ([[AsofOps.ensureStrategy]]).
 */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoin =>
      AsofJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        planLater(j.left), planLater(j.right), j.direction, j.tolerance) :: Nil
    case _ => Nil
  }
}

/** Which temporal neighbor an as-of match takes: the latest right row at
  * or before the left time ([[AsofBackward]], the classic state-lookup),
  * or the earliest at or after it ([[AsofForward]], "next event within
  * tolerance" — pandas `merge_asof(direction=...)` names). */
sealed trait AsofDirection
case object AsofBackward extends AsofDirection
case object AsofForward extends AsofDirection
