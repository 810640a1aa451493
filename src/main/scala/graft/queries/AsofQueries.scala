package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/**
 * As-of and range enrichment — the joins-category residual (SURVEY §2.2:
 * "as-of via window `last` over union"; VERDICT r1 #9). The natural HFP
 * query shape is "which schedule/state applied to this observation";
 * restated over the driver's events table as "which signup preceded this
 * event".
 *
 * Scale design: Spark has no native ASOF join, and an inequality-join
 * formulation degenerates to a broadcast-nested-loop or range explosion.
 * Both queries instead use the partition-sort formulation — one shuffle
 * on the key, one sort, linear scan — which survives any corpus size and
 * any time-range width. The DuckDB oracle uses the engine-native
 * constructs (ASOF JOIN, RANGE frames): two independent implementations
 * of the same semantics.
 */
object AsofQueries {

  private val HourUs = 3600L * 1000000

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q34 — as-of join: each non-signup event enriched with the user's
    // nearest preceding (ts inclusive) signup. Union left+right, sort by
    // (ts, side) within user, running `last(..., ignoreNulls)` carries
    // the right side forward. Right side deduped to one row per
    // (user, ts) so tie-resolution is deterministic in both engines.
    // ------------------------------------------------------------------
    "q34_asof_join" -> GraftQuery(
      build = (s, d) => {
        val e = events(s, d).select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"))
        val left = e.filter(col("event_type") =!= "signup")
          .withColumn("signup_event_id", lit(null).cast(LongType))
          .withColumn("is_left", lit(1))
        val right = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("signup_event_id"))
          .withColumn("event_id", lit(null).cast(LongType))
          .withColumn("event_type", lit(null).cast(StringType))
          .withColumn("is_left", lit(0))
        // right rows sort before left at equal ts (is_left 0 < 1) → the
        // inclusive l.ts >= r.ts semantics of ASOF JOIN
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("is_left"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        left.unionByName(right.select(left.columns.toIndexedSeq.map(col): _*))
          .withColumn("asof_signup_event_id",
            last(col("signup_event_id"), ignoreNulls = true).over(w))
          .withColumn("asof_signup_ts_us",
            last(when(col("is_left") === 0, col("ts_us")), ignoreNulls = true).over(w))
          .filter(col("is_left") === 1)
          .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
            col("asof_signup_event_id"), col("asof_signup_ts_us"),
            (col("ts_us") - col("asof_signup_ts_us")).as("gap_us"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events WHERE event_type <> 'signup'),
        r AS (SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS signup_event_id
            FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ts_us, l.event_type,
          r.signup_event_id AS asof_signup_event_id,
          r.ts_us AS asof_signup_ts_us,
          l.ts_us - r.ts_us AS gap_us
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        ORDER BY l.event_id"""),
      headline = true),

    // ------------------------------------------------------------------
    // q65 — the SAME as-of semantics as q34 through the NATIVE plan node
    // (graft.plans.AsofJoin → AsofJoinExec, brief tier (c)): co-partition
    // + sort declared to EnsureRequirements, one O(|L|+|R|) merge scan
    // per partition with a single buffered right row — no union, no
    // running window frame. Identical oracle to q34: two engine-side
    // implementations (composition vs custom operator) and DuckDB's
    // native ASOF JOIN must all agree bit-for-bit.
    // ------------------------------------------------------------------
    "q65_asof_join_native" -> GraftQuery(
      build = (s, d) => {
        val e = events(s, d).select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"))
        val leftDf = e.filter(col("event_type") =!= "signup")
        val rightDf = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("signup_event_id"))
          .select(col("user_id").as("r_user_id"), col("ts_us").as("r_ts_us"),
            col("signup_event_id"))
        graft.plans.AsofOps.asofJoin(leftDf, rightDf,
            Seq("user_id" -> "r_user_id"), "ts_us", "r_ts_us")
          .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"),
            col("signup_event_id").as("asof_signup_event_id"),
            col("r_ts_us").as("asof_signup_ts_us"),
            (col("ts_us") - col("r_ts_us")).as("gap_us"))
          .orderBy("event_id")
      },
      oracle = Some("""
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events WHERE event_type <> 'signup'),
        r AS (SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS signup_event_id
            FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        SELECT l.event_id, l.user_id, l.ts_us, l.event_type,
          r.signup_event_id AS asof_signup_event_id,
          r.ts_us AS asof_signup_ts_us,
          l.ts_us - r.ts_us AS gap_us
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        ORDER BY l.event_id"""),
      headline = true),

    // ------------------------------------------------------------------
    // q82 — FORWARD as-of with tolerance through the native node: every
    // non-error event paired with the user's NEXT error event, but only
    // within one hour — the "what broke soon after this" query
    // (pandas merge_asof(direction='forward', tolerance=...)). The
    // forward merge needs NO buffered candidate at all: the first
    // not-yet-passed right row IS the nearest future neighbor, so the
    // scan is O(|L|+|R|) with zero state. An out-of-tolerance neighbor
    // nulls out — equivalent to DuckDB's forward ASOF plus a post-CASE,
    // because any other future row is even further away.
    // ------------------------------------------------------------------
    "q82_asof_forward_tolerance" -> GraftQuery(
      build = (s, d) => {
        val e = events(s, d).select(col("event_id"), col("user_id"),
          expr("ts div 1000").as("ts_us"), col("event_type"))
        val leftDf = e.filter(col("event_type") =!= "error")
        val rightDf = e.filter(col("event_type") === "error")
          .groupBy(col("user_id"), col("ts_us"))
          .agg(max(col("event_id")).as("error_event_id"))
          .select(col("user_id").as("r_user_id"), col("ts_us").as("r_ts_us"),
            col("error_event_id"))
        graft.plans.AsofOps.asofJoin(leftDf, rightDf,
            Seq("user_id" -> "r_user_id"), "ts_us", "r_ts_us",
            direction = graft.plans.AsofForward, toleranceUs = Some(HourUs))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("event_type"),
            col("error_event_id").as("next_error_event_id"),
            col("r_ts_us").as("next_error_ts_us"),
            (col("r_ts_us") - col("ts_us")).as("gap_us"))
          .orderBy("event_id")
      },
      oracle = Some(s"""
        WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
            FROM events WHERE event_type <> 'error'),
        r AS (SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS error_event_id
            FROM events WHERE event_type = 'error' GROUP BY 1, 2),
        j AS (SELECT l.event_id, l.user_id, l.ts_us, l.event_type,
            r.error_event_id, r.ts_us AS r_ts_us
          FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us <= r.ts_us)
        SELECT event_id, user_id, ts_us, event_type,
          CASE WHEN r_ts_us - ts_us <= $HourUs THEN error_event_id END
            AS next_error_event_id,
          CASE WHEN r_ts_us - ts_us <= $HourUs THEN r_ts_us END
            AS next_error_ts_us,
          CASE WHEN r_ts_us - ts_us <= $HourUs THEN r_ts_us - ts_us END
            AS gap_us
        FROM j ORDER BY event_id""")),

    // ------------------------------------------------------------------
    // q35 — range enrichment: events in the preceding hour per user,
    // restated as a value-RANGE window frame (the scalable twin of a
    // range self-join — no pair explosion, one sort per user).
    // ------------------------------------------------------------------
    "q35_range_window" -> GraftQuery(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-HourUs, -1)
        events(s, d)
          .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"))
          .withColumn("n_prev_events_1h", count(lit(1)).over(w))
          .orderBy("event_id")
      },
      oracle = Some(s"""
        SELECT event_id, user_id, epoch_us(ts) AS ts_us,
          COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN $HourUs PRECEDING AND 1 PRECEDING) AS n_prev_events_1h
        FROM events ORDER BY event_id"""))
  )
}
