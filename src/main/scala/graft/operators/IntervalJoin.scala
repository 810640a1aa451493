package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Interval-overlap join without the cross product.
 *
 * The naive formulation — `a JOIN b ON a.start <= b.end AND b.start <=
 * a.end` — has no equality conjunct, so Spark plans a (broadcast)
 * nested-loop over every key-pair: quadratic row touches, the classic
 * range-join scale killer. The binned plan turns the range predicate
 * into an EQUALITY join: explode each interval into the fixed-width
 * time bins it covers, hash-join on (keys…, bin), keep the exact
 * overlap predicate as a post-filter. Two overlapping intervals always
 * share the bin of any common instant, and each surviving pair is
 * emitted exactly ONCE with zero dedup shuffle: the join additionally
 * requires the shared bin to be the FIRST common bin,
 * `max(first_bin_a, first_bin_b)` — a deterministic function of the
 * pair itself. (Databricks' range-join optimization and the
 * interval-tree literature use the same binning idea.)
 *
 * Cost model: row inflation is `len/binSize + 1` per side — pick
 * `binSize` near the TYPICAL interval length so inflation is ~2×,
 * against which the join is hash not nested-loop. Degenerate inputs
 * (an interval spanning the whole timeline) inflate by their own
 * length; clamp or split such outliers upstream.
 */
object IntervalJoin {

  /**
   * Pairs of (a, b) rows with equal `keys` whose inclusive intervals
   * [aStart, aEnd] × [bStart, bEnd] overlap. Column sets of the two
   * inputs must be disjoint (rename upstream). Integral (epoch-unit)
   * bounds; binSize > 0.
   */
  def overlapJoin(a: DataFrame, b: DataFrame, keys: Seq[(String, String)],
      aStart: String, aEnd: String, bStart: String, bEnd: String,
      binSize: Long): DataFrame = {
    require(binSize > 0)
    def bins(df: DataFrame, s: String, e: String, out: String): DataFrame =
      df.withColumn(out, explode(expr(
        s"sequence($s div $binSize, $e div $binSize)")))
    val ab = bins(a, aStart, aEnd, "__bin_a")
    val bb = bins(b, bStart, bEnd, "__bin_b")
    val firstCommonBin: Column =
      greatest(expr(s"$aStart div $binSize"), expr(s"$bStart div $binSize"))
    // the bin equality is always present, so an EMPTY key list is the
    // legitimate keyless (global-timeline) overlap join, not an
    // empty.reduce crash
    val conds: Seq[Column] =
      keys.map { case (ka, kb) => ab(ka) === bb(kb) } ++ Seq(
        col("__bin_a") === col("__bin_b"),
        col("__bin_a") === firstCommonBin,
        col(aStart) <= col(bEnd), col(bStart) <= col(aEnd))
    ab.join(bb, conds.reduce(_ && _))
      .drop("__bin_a", "__bin_b")
  }
}
