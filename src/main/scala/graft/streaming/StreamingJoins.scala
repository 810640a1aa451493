package graft.streaming

import org.apache.spark.sql.DataFrame
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
   * Door dwell time: each door-open (HFP `DOO`) matched to every
   * door-close (`DOC`) of the same vehicle within `withinMinutes` —
   * the canonical stream-stream interval join on the vehicles feed.
   * Inner join: a match emits as soon as both rows have arrived; the
   * watermarks only bound the buffered state (an open with no close is
   * dropped from state once the watermark passes its interval).
   */
  def doorDwell(opens: DataFrame, closes: DataFrame,
      withinMinutes: Int = 10): DataFrame = {
    val o = opens.withWatermark("tst", s"$withinMinutes minutes")
      .select(col("unique_vehicle_id"), col("tst").as("open_tst"))
    val c = closes.withWatermark("tst", s"$withinMinutes minutes")
      .select(col("unique_vehicle_id").as("veh_c"), col("tst").as("close_tst"))
    o.join(c,
      col("unique_vehicle_id") === col("veh_c") &&
        col("close_tst") > col("open_tst") &&
        col("close_tst") <= col("open_tst") +
          expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("unique_vehicle_id"),
        unix_micros(col("open_tst")).as("open_us"),
        (unix_micros(col("close_tst")) - unix_micros(col("open_tst")))
          .as("dwell_us"))
  }
}
