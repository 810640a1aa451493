package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Registration of the engine's native Catalyst expressions as SQL
 * functions, two ways:
 *
 *  - [[GraftFunctions.register]] adds them to an EXISTING session's
 *    function registry (what [[graft.SparkEntry.applySessionDefaults]]
 *    calls, so the driver's session can `spark.sql("... graft_dot(a, b)
 *    ...")`);
 *  - [[GraftSparkExtensions]] is the `spark.sql.extensions` entry point
 *    for cluster deployments (`--conf spark.sql.extensions=
 *    graft.functions.GraftSparkExtensions`), injecting the same
 *    functions at session build — the standard way a Spark library
 *    ships Catalyst extensions.
 */
object GraftFunctions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DoubleDotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, s"graft_dot takes 2 arguments, got ${exprs.length}")
        DoubleDotProduct(exprs.head, exprs(1))
      }),
    (FunctionIdentifier("graft_log2q20"),
      new ExpressionInfo(classOf[Log2Q20].getName, "graft_log2q20"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"graft_log2q20 takes 1 argument, got ${exprs.length}")
        Log2Q20(exprs.head)
      }))

  /** Idempotent registration into a live session. The existence check
    * matters: this runs on every SparkEntry query invocation, and an
    * unconditional re-register logs a replaced-function warning per
    * call. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` hook: injects every engine function AND the
  * planner strategy for the engine's own plan nodes
  * (graft.plans.AsofJoin) at session construction. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.functions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategies)
    ext.injectOptimizerRule(_ => graft.plans.AsofFilterPushdown)
  }
}
