package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Vehicle-motion analytics in pure INTEGER planar arithmetic — the
 * telemetry-hygiene pass the reference's data model implies but its
 * sink never computes: HFP rows carry lat/long/spd/odo
 * (run/init.sql:44-50), and a fleet-analytics consumer immediately
 * wants per-vehicle displacement, speed estimates, and GPS-glitch
 * (teleport) detection over the position stream.
 *
 * Determinism discipline: positions are millimeter-grid integers, the
 * displacement metric is L1 (|dx|+|dy| — exact, no sqrt), time deltas
 * are integral microseconds, and speed is one integer division
 * (mm/s = dist_mm · 1_000_000 div dt_us) — every engine computes the
 * identical longs, which is what lets q73 hash-gate against DuckDB.
 * Haversine-on-doubles would die a last-ulp death in the `sin`
 * library; at city scale the planar grid is the right model anyway
 * (and the production path would precompute the local metric factors
 * once per tile).
 *
 * Scale shape: one keyed window (partition by vehicle, order by event
 * time — hash-partitioned shuffle, in-partition sort) + one map-side
 * combined aggregate on the same key, so AQE reuses the partitioning.
 * State per vehicle is one previous row — this is the same shape as
 * the q20 sessionizer and streams as `lag` ≙ `flatMapGroupsWithState`.
 */
object MotionOps {

  /**
   * Per-vehicle motion rollup over a point stream with integer columns
   * (`xMmCol`, `yMmCol` millimeter grid positions, `tUsCol` epoch
   * micros). Emits per vehicle: fix count, total L1 distance, max
   * speed, and how many inter-fix steps exceeded `jumpMm` (teleports /
   * GPS glitches). Steps with a non-positive time delta (duplicate or
   * out-of-order timestamps surviving upstream dedup) are excluded
   * from speed but still counted as fixes.
   */
  def motionSummary(points: DataFrame, vehicleCol: String, tUsCol: String,
      xMmCol: String, yMmCol: String, orderTieCol: String,
      jumpMm: Long = 100000L): DataFrame = {
    val w = Window.partitionBy(col(vehicleCol))
      .orderBy(col(tUsCol), col(orderTieCol))
    val steps = points
      .withColumn("dx", col(xMmCol) - lag(col(xMmCol), 1).over(w))
      .withColumn("dy", col(yMmCol) - lag(col(yMmCol), 1).over(w))
      .withColumn("dt_us", col(tUsCol) - lag(col(tUsCol), 1).over(w))
      .withColumn("dist_mm", abs(col("dx")) + abs(col("dy")))
      .withColumn("speed_mm_s",
        when(col("dt_us") > 0, expr("(dist_mm * 1000000) div dt_us")))
    steps.groupBy(col(vehicleCol))
      .agg(
        count(lit(1)).as("n_fixes"),
        coalesce(sum(col("dist_mm")), lit(0L)).cast("long").as("dist_mm"),
        max(col("speed_mm_s")).as("max_speed_mm_s"),
        sum(when(col("dist_mm") > jumpMm, 1L).otherwise(0L)).cast("long")
          .as("n_jumps"))
  }

  /**
   * Dwell / stay-point episodes — the transit-domain counterpart of
   * [[motionSummary]]'s motion rollup: find the maximal runs of
   * consecutive fixes where every inter-fix step stays within
   * `maxStepMm` (L1, same metric as motionSummary), keep runs of at
   * least `minFixes` fixes, and roll them up per vehicle. For an HFP
   * vehicle-position feed these are stop dwells and terminal layovers
   * (dwell-time analysis is the bread-and-butter transit KPI); for any
   * GPS/telemetry stream they are the stay-points a visit-mining
   * pipeline extracts before reverse-geocoding.
   *
   * Islands discipline (q20/q116's): break = first fix of a vehicle OR
   * a step exceeding the threshold; episode id = running sum of breaks
   * over the SAME (t, tie)-ordered keyed window the step lag used —
   * one shuffle total; episodes then aggregate twice ((key, episode) →
   * key), both map-side combined on frames proportional to episode
   * counts, never fixes. A dwell episode's duration is last-fix −
   * first-fix time (exact integer micros).
   *
   * Emits per vehicle: episode count, total and longest dwell micros.
   * Vehicles with no qualifying episode are honestly absent (a left
   * spine join is the caller's one-liner if zeros are wanted); a
   * vehicle with a single fix can never dwell (`minFixes` ≥ 2
   * required).
   */
  def dwellEpisodes(points: DataFrame, vehicleCol: String, tUsCol: String,
      xMmCol: String, yMmCol: String, orderTieCol: String,
      maxStepMm: Long, minFixes: Int = 3): DataFrame = {
    require(minFixes >= 2, s"minFixes must be >= 2, got $minFixes")
    val w = Window.partitionBy(col(vehicleCol))
      .orderBy(col(tUsCol), col(orderTieCol))
    val flagged = points
      .withColumn("step_mm",
        abs(col(xMmCol) - lag(col(xMmCol), 1).over(w)) +
          abs(col(yMmCol) - lag(col(yMmCol), 1).over(w)))
      .withColumn("brk",
        when(col("step_mm").isNull || col("step_mm") > maxStepMm, 1L)
          .otherwise(0L))
      .withColumn("episode",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    flagged
      .groupBy(col(vehicleCol), col("episode"))
      .agg(count(lit(1)).as("n_fixes"),
        (max(col(tUsCol)) - min(col(tUsCol))).as("dur_us"))
      .filter(col("n_fixes") >= minFixes)
      .groupBy(col(vehicleCol))
      .agg(count(lit(1)).as("n_episodes"),
        sum(col("dur_us")).as("total_dwell_us"),
        max(col("dur_us")).as("longest_dwell_us"))
  }
}
