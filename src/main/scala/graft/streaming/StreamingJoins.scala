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
