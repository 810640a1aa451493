package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join operators over the flattened vehicles stream — the two join
 * families Structured Streaming supports that the reference (a straight
 * pipe to TimescaleDB) delegates to its database entirely:
 *
 *  - stream-STATIC enrichment: per micro-batch broadcast hash join
 *    against a dimension table (routes, stops) — stateless, the
 *    standard way a landing stream picks up reference data;
 *  - stream-STREAM interval join: both sides watermarked, an equality
 *    key plus an event-time range condition. Spark evicts join state as
 *    the watermark passes the interval bound, so state is bounded by
 *    (keys active within the interval), never the stream history.
 */
object StreamingJoins {

  /** Stream-static dimension enrichment (left join keeps unmatched
    * telemetry). The dimension is broadcast: no shuffle of the stream,
    * stateless across batches. */
  def enrichRoutes(vehicles: DataFrame, routes: DataFrame): DataFrame =
    vehicles.join(broadcast(routes), Seq("route_id"), "left")

  /**
   * Event-time interval join, the general form shared by the batch and
   * streaming paths (q52 runs it on static frames — `withWatermark` is
   * a no-op in batch, eliminated by the optimizer — and
   * [[doorDwell]] runs the SAME operator on the live stream):
   * `keyExpr` equality plus right-time ∈ (left-time, left-time +
   * withinMinutes]. Both sides watermarked, so streaming state is
   * bounded by keys active within the interval, never stream history.
   *
   * `joinType` "inner": a match emits as soon as both rows arrive.
   * "left_outer": additionally, a LEFT row with no match emits with
   * null right columns once the watermark passes its interval bound
   * (eviction-time null emission) — the "open with no close" row a
   * dwell analysis actually wants.
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyExpr: Column,
      leftTimeCol: String, rightTimeCol: String, withinMinutes: Int,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTimeCol, s"$withinMinutes minutes")
    val r = right.withWatermark(rightTimeCol, s"$withinMinutes minutes")
    l.join(r, keyExpr &&
      col(rightTimeCol) > col(leftTimeCol) &&
      col(rightTimeCol) <= col(leftTimeCol) +
        expr(s"INTERVAL $withinMinutes MINUTES"),
      joinType)
  }

  /**
   * Door dwell time: each door-open (HFP `DOO`) matched to every
   * door-close (`DOC`) of the same vehicle within `withinMinutes` —
   * the canonical stream-stream interval join on the vehicles feed.
   * With the default inner join an open with no close is silently
   * dropped from state once the watermark passes its interval; with
   * `joinType = "left_outer"` that open EMITS with null dwell at
   * eviction — the semantically hard case (state eviction, not row
   * arrival, produces the output row).
   */
  /**
   * Streaming ε-proximity pairs — the live twin of the batch fixed-grid
   * spatial self-join (`operators.SpatialJoin.epsSelfJoin`, q108):
   * within each event-time tumbling window, every pair of points at
   * squared planar distance ≤ ε² — headway/bunching monitoring as it
   * happens instead of in tomorrow's batch.
   *
   * Same candidate discipline as batch: cell width = ε, probe side
   * explodes to its 3×3 neighborhood, build side stays home, `id_a <
   * id_b` keeps one orientation — each unordered pair emits exactly
   * once per window. The join keys are (window, cx, cy) EQUALITY: a
   * stream-stream self-join on the time-window column, which Spark
   * recognizes for watermark-based state eviction — state is bounded by
   * points in open windows, never stream history. The distance test
   * rides the join as a residual integer filter.
   *
   * `withWatermark` is a no-op in batch, so the SAME function body runs
   * on static frames — the spec proves batch ≡ replayed-stream output
   * bit-for-bit, and batch-mode output equals epsSelfJoin per window.
   */
  def proximityPairs(pts: DataFrame, idCol: String, xCol: String,
      yCol: String, tsCol: String, epsMm: Long,
      watermarkDelay: String = "2 minutes",
      windowDuration: String = "1 minute"): DataFrame = {
    require(epsMm >= 1 && epsMm <= 1000000000L,
      s"epsMm in [1, 1e9] (long-safe squared distance), got $epsMm")
    val eps = lit(epsMm)
    val base = pts.select(col(tsCol).as("ts"), col(idCol).as("pid"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
        graft.operators.TemporalOps.floorDiv(col(xCol).cast("long"), lit(epsMm)).as("cx"),
        graft.operators.TemporalOps.floorDiv(col(yCol).cast("long"), lit(epsMm)).as("cy"))
      .withWatermark("ts", watermarkDelay)
    val neighborhood = array(
      (for (dx <- -1 to 1; dy <- -1 to 1) yield
        struct((col("cx") + dx).as("cx"), (col("cy") + dy).as("cy"))): _*)
    val probe = base
      .select(window(col("ts"), windowDuration).as("w"),
        col("pid").as("id_a"), col("x").as("xa"), col("y").as("ya"),
        explode(neighborhood).as("c"))
      .select(col("w"), col("id_a"), col("xa"), col("ya"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val build = base
      .select(window(col("ts"), windowDuration).as("w"),
        col("pid").as("id_b"), col("x").as("xb"), col("y").as("yb"),
        col("cx"), col("cy"))
    val dx = col("xa") - col("xb")
    val dy = col("ya") - col("yb")
    val d2 = dx * dx + dy * dy
    probe.join(build,
        probe("w") === build("w") &&
          probe("cx") === build("cx") && probe("cy") === build("cy") &&
          col("id_a") < col("id_b") && d2 <= eps * eps)
      .select(unix_micros(probe("w.start")).as("window_start_us"),
        col("id_a"), col("id_b"), d2.as("dist2_mm2"))
  }

  def doorDwell(opens: DataFrame, closes: DataFrame,
      withinMinutes: Int = 10, joinType: String = "inner"): DataFrame = {
    val o = opens.select(col("unique_vehicle_id"), col("tst").as("open_tst"))
    val c = closes.select(col("unique_vehicle_id").as("veh_c"),
      col("tst").as("close_tst"))
    intervalJoin(o, c, col("unique_vehicle_id") === col("veh_c"),
      "open_tst", "close_tst", withinMinutes, joinType)
      .select(col("unique_vehicle_id"),
        unix_micros(col("open_tst")).as("open_us"),
        (unix_micros(col("close_tst")) - unix_micros(col("open_tst")))
          .as("dwell_us"))
  }
}
