package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event-time operators over the flattened vehicles stream (SURVEY §2.2
 * rows "streaming watermark / late data", "streaming windows", "exactly-
 * once / dedup" — all absent from the reference, which keys everything on
 * arrival time and inserts late rows as-is, QueueWriter.java:62 vs 106).
 *
 * These are the opt-in upgrades the reference could not express: bounded
 * state via watermarks, per-window aggregation, and key-dedup within the
 * watermark horizon (the (unique_vehicle_id, tst, event_type) key of
 * FIXTURES.md F7 — upgrades the crash-duplicate window of
 * MessageProcessor.java:128 to effectively-once).
 *
 * Each operator works identically on a batch frame (minus the watermark,
 * which batch execution ignores) — the DuckDB-oracle batch twins are
 * q31-q33 (EventTimeQueries).
 */
object EventTimeOps {

  /**
   * Tumbling per-route counts: watermarked event-time windows; in append
   * mode a window emits once the watermark passes its end, and rows later
   * than the watermark are dropped (bounded state at any scale — state
   * size ∝ open windows × routes, never total history).
   */
  def tumblingRouteCounts(vehicles: DataFrame,
      watermarkDelay: String = "2 minutes",
      windowDuration: String = "1 minute"): DataFrame =
    vehicles
      .withWatermark("tst", watermarkDelay)
      .groupBy(window(col("tst"), windowDuration), col("route_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("spd")).as("sum_spd"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("route_id"), col("n_events"), col("sum_spd"))

  /**
   * Sliding per-route counts: like [[tumblingRouteCounts]] but windows
   * overlap (`slideDuration` < `windowDuration`), so each event lands in
   * windowDuration/slideDuration windows — the moving-average shape.
   * State stays bounded the same way: open windows × routes. Batch twin
   * q50 (EventTimeQueries).
   */
  def slidingRouteCounts(vehicles: DataFrame,
      watermarkDelay: String = "2 minutes",
      windowDuration: String = "2 minutes",
      slideDuration: String = "1 minute"): DataFrame =
    vehicles
      .withWatermark("tst", watermarkDelay)
      .groupBy(window(col("tst"), windowDuration, slideDuration), col("route_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("spd")).as("sum_spd"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        unix_micros(col("window.end")).as("window_end_us"),
        col("route_id"), col("n_events"), col("sum_spd"))

  /**
   * Session windows per vehicle: a session extends while successive events
   * arrive within `gap` of the previous one; closes (and emits, in append
   * mode) when the watermark passes session end + gap.
   */
  def vehicleSessions(vehicles: DataFrame,
      watermarkDelay: String = "2 minutes",
      gap: String = "5 minutes"): DataFrame =
    vehicles
      .withWatermark("tst", watermarkDelay)
      .groupBy(session_window(col("tst"), gap), col("unique_vehicle_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("unique_vehicle_id"), col("n_events"))

  /**
   * Key-dedup within the watermark horizon on the natural HFP message key.
   * Emits the first arrival immediately, suppresses duplicates until the
   * watermark passes the key's event time, then drops the key's state —
   * memory bounded by the duplicate-arrival window, not the stream length.
   */
  def dedupWithinWatermark(vehicles: DataFrame,
      watermarkDelay: String = "10 minutes"): DataFrame =
    vehicles
      .withWatermark("tst", watermarkDelay)
      .dropDuplicatesWithinWatermark("unique_vehicle_id", "tst", "event_type")

  /**
   * Streaming OHLC twin of `TemporalOps.resampleOhlc`: per-vehicle
   * tumbling event-time windows summarizing speed (as exact centi-units)
   * with open/high/low/close/count/total — the live dashboard resample,
   * emitted in append mode once the watermark closes a bucket.
   *
   * `min_by`/`max_by` buffers are mergeable and order-free (each keeps
   * one (value, ordering-key) pair), so they are legal in a streaming
   * aggregation, and the composite struct(tst, tsi) ordering makes
   * open/close deterministic under any arrival order — the
   * EventTimeStreamSpec equivalence test replays the stream in
   * micro-batches and asserts bit-equality with the batch operator over
   * the same rows. State ∝ open windows × vehicles, never history.
   */
  def vehicleOhlc(vehicles: DataFrame,
      watermarkDelay: String = "2 minutes",
      windowDuration: String = "1 minute"): DataFrame =
    vehicles
      // decimal cast FIRST (the house cents() discipline): a double
      // multiply rounds 8.13·100 to 812.999…, which a truncating long
      // cast turns into 812
      .select(col("tst"), col("tsi"), col("unique_vehicle_id"),
        (col("spd").cast("decimal(18,4)") * 100).cast("long").as("spd_c"))
      .withWatermark("tst", watermarkDelay)
      .groupBy(window(col("tst"), windowDuration), col("unique_vehicle_id"))
      .agg(
        count(lit(1)).as("n"),
        min_by(col("spd_c"), struct(col("tst"), col("tsi"))).as("open"),
        max(col("spd_c")).as("high"),
        min(col("spd_c")).as("low"),
        max_by(col("spd_c"), struct(col("tst"), col("tsi"))).as("close"),
        sum(col("spd_c")).as("total"))
      .select(
        unix_micros(col("window.start")).as("bucket_t"),
        col("unique_vehicle_id"),
        col("n"), col("open"), col("high"), col("low"), col("close"),
        col("total"))

  /**
   * Streaming twin of `TemporalOps.coalesceIntervals` (q116): live
   * gaps-and-islands — "is this vehicle's current service span still
   * open, and what has it covered so far" — via DYNAMIC-GAP session
   * windows. Each interval [s, e] enters as an event at `s` with gap
   * (e − s) + 1 µs, making its session window [s, e + 1 µs); two
   * windows merge iff s₂ < e₁ + 1 µs ⇔ s₂ ≤ e₁ — exactly the batch
   * operator's closed-interval touch-or-overlap merge. Spark merges
   * session state across micro-batches and keys, so islanding needs no
   * custom state: state is open sessions per key (watermark-evicted),
   * never stream history.
   *
   * The island bounds come from plain min/max aggregates over the
   * merged members — NOT from the session_window struct (whose end is
   * max(e)+1 µs by the gap construction; deriving bounds from member
   * aggregates keeps the emitted row identical to the batch twin's
   * bit-for-bit, which `StreamIslandsSpec` asserts). Degenerate
   * intervals (e < s, null start) are dropped as in batch. The gap
   * seconds ride a decimal cast (a double gap would round past 2⁵²
   * µs); emission is append-mode once the watermark passes session
   * close.
   *
   * Input: (key, startTs — TIMESTAMP event time, endUs — epoch-micros
   * long). Output per closed island: (key, island_start, island_end,
   * covered, n_intervals) in epoch micros — the batch twin's columns
   * minus the running island ordinal (a cross-history ordinal is not
   * computable from bounded state; consumers key islands by start).
   */
  def intervalIslands(intervals: DataFrame, key: String, startTs: String,
      endUs: String, watermarkDelay: String = "2 minutes"): DataFrame =
    intervals
      .filter(col(startTs).isNotNull &&
        col(endUs) >= unix_micros(col(startTs)))
      .withWatermark(startTs, watermarkDelay)
      .groupBy(
        // session_window's dynamic gap must be CalendarIntervalType
        // (make_interval), not DayTimeIntervalType (make_dt_interval) —
        // the analyzer rejects the latter; call_function keeps the
        // caller's column names going through the resolver instead of
        // being spliced into SQL text
        session_window(col(startTs),
          call_function("make_interval",
            lit(0), lit(0), lit(0), lit(0), lit(0), lit(0),
            ((col(endUs) - unix_micros(col(startTs)) + 1)
              .cast("decimal(24,0)") / lit(1000000)).cast("decimal(18,6)"))),
        col(key))
      .agg(min(unix_micros(col(startTs))).as("island_start"),
        max(col(endUs)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .select(col(key), col("island_start"), col("island_end"),
        (col("island_end") - col("island_start")).as("covered"),
        col("n_intervals"))
}
