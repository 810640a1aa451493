package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/**
 * Batch twins of the event-time streaming operators (EventTimeOps),
 * oracle-gated over the `events` table. `ts` arrives as epoch-NANOS longs
 * (TESTDATA); all conversions use integral `div` — a double division of
 * an epoch-nanos value would round off sub-microsecond bits. Emitted
 * times are epoch-micros BIGINTs per the registry determinism rules.
 */
object EventTimeQueries {

  private val GapUs = 30L * 60 * 1000000       // 30-minute session gap
  private val WindowUs = 6L * 3600 * 1000000   // 6-hour tumbling window
  private val SlideUs = 3L * 3600 * 1000000    // 3-hour slide (q50)

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q31 — tumbling event-time window aggregation (batch twin of
    // EventTimeOps.tumblingRouteCounts): epoch-aligned 6 h windows via the
    // real window() operator, partial-aggregated map-side.
    // ------------------------------------------------------------------
    "q31_tumbling_window" -> GraftQuery(
      build = (s, d) =>
        events(s, d)
          .select(timestamp_micros(expr("ts div 1000")).as("tsc"),
            col("event_type"), col("value"))
          .groupBy(window(col("tsc"), "6 hours"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
          .select(unix_micros(col("window.start")).as("window_start_us"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("window_start_us", "event_type"),
      oracle = Some(s"""
        WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events)
        SELECT us - us % $WindowUs AS window_start_us, event_type,
          count(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM e GROUP BY 1, 2 ORDER BY 1, 2"""),
      headline = true),

    // ------------------------------------------------------------------
    // q50 — SLIDING event-time windows (the third window family next to
    // q31 tumbling / q32 session): 6 h windows every 3 h, so each event
    // contributes to exactly two windows. Spark's window() generates
    // the per-event window set inline (a 2-row expansion, not a join);
    // the oracle unnests the same two aligned starts per event.
    // ------------------------------------------------------------------
    "q50_sliding_window" -> GraftQuery(
      build = (s, d) =>
        events(s, d)
          .select(timestamp_micros(expr("ts div 1000")).as("tsc"),
            col("event_type"), col("value"))
          .groupBy(window(col("tsc"), "6 hours", "3 hours"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 4))).cast(DoubleType).as("sum_value"))
          .select(unix_micros(col("window.start")).as("window_start_us"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy("window_start_us", "event_type"),
      oracle = Some(s"""
        WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
        w AS (SELECT unnest([us - us % $SlideUs, us - us % $SlideUs - $SlideUs])
            AS window_start_us, us, event_type, value FROM e)
        SELECT window_start_us, event_type, count(*) AS n_events,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        FROM w
        WHERE us >= window_start_us AND us < window_start_us + $WindowUs
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // q32 — session windows (batch twin of EventTimeOps.vehicleSessions)
    // via the real session_window() operator: session end = last event +
    // gap. Oracle restates it as gaps-and-islands SQL — two independent
    // formulations of the same semantics.
    // ------------------------------------------------------------------
    "q32_session_window" -> GraftQuery(
      build = (s, d) =>
        events(s, d)
          .select(col("user_id"), timestamp_micros(expr("ts div 1000")).as("tsc"))
          .groupBy(session_window(col("tsc"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("session_start_us"),
            unix_micros(col("session_window.end")).as("session_end_us"),
            col("n_events"))
          .orderBy("user_id", "session_start_us"),
      oracle = Some(s"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        l AS (SELECT user_id, us,
            lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev FROM e),
        f AS (SELECT user_id, us,
            CASE WHEN prev IS NULL OR us - prev > $GapUs THEN 1 ELSE 0 END AS new_s
          FROM l),
        s AS (SELECT user_id, us,
            SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
              ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        SELECT user_id, min(us) AS session_start_us,
          max(us) + $GapUs AS session_end_us, count(*) AS n_events
        FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_us""")),

    // ------------------------------------------------------------------
    // q52 — LEFT-OUTER event-time interval join (batch twin of
    // StreamingJoins.intervalJoin / doorDwell "left_outer"): every view
    // matched to each purchase by the same user within 30 min; views
    // with NO purchase survive with null dwell — the row the streaming
    // side emits at watermark-driven state eviction
    // (EventTimeStreamSpec proves that mechanic on the live stream).
    // Equality key + time-range predicate: a shuffle hash join on
    // user_id with the range as a post-join filter, never a cartesian.
    // ------------------------------------------------------------------
    "q52_interval_join_outer" -> GraftQuery(
      build = (s, d) => {
        val e = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), timestamp_micros(expr("ts div 1000")).as("tsc"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id").as("view_event_id"), col("tsc"))
        val buys = e.filter(col("event_type") === "purchase")
          .select(col("user_id").as("buy_user"), col("tsc").as("buy_tsc"))
        graft.streaming.StreamingJoins.intervalJoin(views, buys,
          col("user_id") === col("buy_user"), "tsc", "buy_tsc",
          withinMinutes = 30, joinType = "left_outer")
          .select(col("user_id"), col("view_event_id"),
            unix_micros(col("tsc")).as("view_us"),
            (unix_micros(col("buy_tsc")) - unix_micros(col("tsc"))).as("dwell_us"))
          .orderBy(col("view_event_id"), col("dwell_us").asc_nulls_first)
      },
      oracle = Some(s"""
        WITH v AS (SELECT user_id, event_id AS view_event_id,
            epoch_us(ts) AS view_us FROM events WHERE event_type = 'view'),
        b AS (SELECT user_id AS buy_user, epoch_us(ts) AS buy_us FROM events
          WHERE event_type = 'purchase')
        SELECT user_id, view_event_id, view_us, buy_us - view_us AS dwell_us
        FROM v LEFT JOIN b ON v.user_id = b.buy_user
          AND b.buy_us > v.view_us AND b.buy_us <= v.view_us + ${30L * 60 * 1000000}
        ORDER BY view_event_id, dwell_us NULLS FIRST""")),

    // ------------------------------------------------------------------
    // q33 — key-dedup keep-first (batch twin of
    // EventTimeOps.dedupWithinWatermark / dropDuplicates on a key):
    // earliest event per (user_id, event_type), total order tie-broken by
    // event_id. One shuffle on the dedup key.
    // ------------------------------------------------------------------
    "q33_dedup_keep_first" -> GraftQuery(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"), col("event_id"),
            expr("ts div 1000").as("ts_us"))
          .orderBy("user_id", "event_type")
      },
      oracle = Some("""
        WITH r AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
            row_number() OVER (PARTITION BY user_id, event_type
              ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT user_id, event_type, event_id, ts_us FROM r
        WHERE rn = 1 ORDER BY user_id, event_type"""))
  )
}
