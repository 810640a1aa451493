package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.graft.Bridge

/**
 * User-facing API over the native [[AsofJoin]] plan node. Columns are
 * named by string (resolved against each side's analyzed output) so the
 * call site reads like the other operator entry points; self-joins are
 * legal — right-side attributes colliding with left exprIds are
 * re-aliased under fresh ids before the node is built.
 */
object AsofOps {

  /** Make [[GraftStrategies]] + [[AsofFilterPushdown]] active on a live
    * session (idempotent). Cluster deployments get both at session build
    * via `spark.sql.extensions=graft.functions.GraftSparkExtensions`,
    * where the rule composes inside the operator-optimization fixpoint.
    * The live-session path runs extraOptimizations as the FINAL
    * optimizer batch (also a fixpoint), after the standard pushdown has
    * already run — so Spark's own PushDownPredicates is co-registered
    * there: once AsofFilterPushdown moves a predicate below the AsofJoin,
    * PushDownPredicates keeps pushing it through the left subtree's
    * standard operators down to the scan, same end state as the
    * extensions path. */
  def ensureStrategy(spark: SparkSession): Unit = {
    Bridge.addStrategy(spark, GraftStrategies)
    Bridge.addOptimization(spark, AsofFilterPushdown)
    Bridge.addOptimization(spark,
      org.apache.spark.sql.catalyst.optimizer.PushDownPredicates)
  }

  /** Resolve `name` with the session's resolver (case-insensitive
    * unless spark.sql.caseSensitive), and REJECT ambiguity instead of
    * silently binding the first duplicate — Spark's own column
    * resolution rules, not a literal string match. */
  private def resolve(spark: SparkSession, out: Seq[Attribute],
      name: String): Attribute = {
    val resolver = spark.sessionState.conf.resolver
    out.filter(a => resolver(a.name, name)) match {
      case collection.Seq(one) => one
      case collection.Seq() => throw new IllegalArgumentException(
        s"as-of column '$name' not in [${out.map(_.name).mkString(", ")}]")
      case many => throw new IllegalArgumentException(
        s"as-of column '$name' is ambiguous: matches " +
          s"[${many.map(_.name).mkString(", ")}]")
    }
  }

  /**
   * Left-outer AS-OF join: every `left` row paired with the `right` row
   * sharing `keys` that is its nearest temporal neighbor — the greatest
   * `rightTimeCol <= leftTimeCol` ([[AsofBackward]], default) or the
   * least `rightTimeCol >= leftTimeCol` ([[AsofForward]]); nulls when
   * none. `toleranceUs` (same units as the time columns, which must be
   * long/timestamp when set) additionally bounds |left − right|: an
   * out-of-tolerance nearest neighbor emits nulls — pandas
   * `merge_asof(tolerance=...)` semantics. Output = left columns ++
   * right columns (right nullable); disambiguate shared names by
   * renaming on the inputs.
   */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String,
      direction: AsofDirection = AsofBackward,
      toleranceUs: Option[Long] = None): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = Bridge.analyzed(left)
    val rp0 = Bridge.analyzed(right)
    // self-join hygiene: if any right attribute id collides with a left
    // one, re-alias the whole right output under fresh ids
    val rp =
      if (rp0.outputSet.intersect(lp.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    Bridge.ofRows(spark, AsofJoin(lp, rp,
      keys.map(k => resolve(spark, lp.output, k._1)),
      keys.map(k => resolve(spark, rp.output, k._2)),
      resolve(spark, lp.output, leftTimeCol),
      resolve(spark, rp.output, rightTimeCol),
      direction, toleranceUs))
  }
}
