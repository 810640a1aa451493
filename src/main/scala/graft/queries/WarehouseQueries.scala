package graft.queries

import org.apache.spark.sql.functions._

import Tables._
import graft.operators.{MergeOps, MotionOps}

/**
 * Warehouse-maintenance and telemetry-analytics queries: batch MERGE
 * (q68), integer-deterministic vehicle-motion rollups (q73), and
 * deterministic per-group sampling (q74). Each oracle is generated from
 * the same constants as the Spark build (cross-engine rules in
 * Tables.scala).
 */
object WarehouseQueries {

  /** q68: orders with `o_custkey % InsertMod == 0` roll up under a
    * shifted key that does NOT exist in customer — exercising the MERGE
    * insert branch on real data (the corpus has no source-only keys
    * otherwise; same injection discipline as DedupQueries). */
  val InsertMod = 11L
  val InsertShift = 10000000L

  /** q73 synthetic millimeter-grid track (shared generating arithmetic:
    * the oracle recomputes positions from the same constants — the
    * q53/q63 codec-query pattern). */
  val XA = 37L; val XB = 1009L; val YA = 91L; val YB = 2003L
  val GridMod = 500000L
  val JumpMm = 300000L

  /** q74 sample size per language group. */
  val SamplePerGroup = 5

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q68 — batch MERGE / SCD1 upsert (MergeOps.mergeUpsert): the day's
    // order rollup merged into the customer dimension — matched rows
    // get balance += order total + segment ACTIVE, source-only keys
    // insert as NEW, unmatched customers survive unchanged. One full
    // outer hash join on the key (AQE broadcasts the delta side when it
    // fits); decimal-exact balance arithmetic per the cross-engine
    // rules. The reference's only upsert is insert-if-absent
    // (QueueWriter.java:45-48 ON CONFLICT DO NOTHING); this is the full
    // warehouse MERGE surface that subsumes it.
    // ------------------------------------------------------------------
    "q68_merge_upsert" -> GraftQuery(
      build = (s, d) => {
        val src = orders(s, d)
          .groupBy(
            when(col("o_custkey") % InsertMod === 0,
              col("o_custkey") + InsertShift)
              .otherwise(col("o_custkey")).as("c_custkey"))
          .agg(
            sum(col("o_totalprice").cast("decimal(18,4)")).as("ord_total"),
            count(lit(1)).as("n_orders"))
        val merged = MergeOps.mergeUpsert(
          customer(s, d), src, Seq("c_custkey"),
          onMatch = Map(
            "c_acctbal" -> (col("t.c_acctbal").cast("decimal(18,4)")
              + col("s.ord_total")).cast("double"),
            "c_mktsegment" -> lit("ACTIVE"),
            "n_orders" -> col("s.n_orders")),
          onInsert = Map(
            "c_name" -> lit("NEW"),
            "c_nationkey" -> lit(-1L),
            "c_acctbal" -> col("s.ord_total").cast("double"),
            "c_mktsegment" -> lit("INSERTED"),
            "n_orders" -> col("s.n_orders")),
          outputCols = Seq("c_custkey", "c_name", "c_nationkey",
            "c_acctbal", "c_mktsegment", "n_orders"))
        merged
          .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
          .orderBy("c_custkey")
      },
      oracle = Some(s"""
        WITH src AS (
          SELECT CASE WHEN o_custkey % $InsertMod = 0
              THEN o_custkey + $InsertShift ELSE o_custkey END AS c_custkey,
            sum(CAST(o_totalprice AS DECIMAL(18,4))) AS ord_total,
            count(*) AS n_orders
          FROM orders GROUP BY 1)
        SELECT
          coalesce(t.c_custkey, s.c_custkey) AS c_custkey,
          CASE WHEN t.c_custkey IS NULL THEN 'NEW' ELSE t.c_name END AS c_name,
          CASE WHEN t.c_custkey IS NULL THEN CAST(-1 AS BIGINT)
            ELSE t.c_nationkey END AS c_nationkey,
          CASE
            WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL THEN
              CAST(CAST(t.c_acctbal AS DECIMAL(18,4)) + s.ord_total AS DOUBLE)
            WHEN t.c_custkey IS NULL THEN CAST(s.ord_total AS DOUBLE)
            ELSE t.c_acctbal END AS c_acctbal,
          CASE
            WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
              THEN 'ACTIVE'
            WHEN t.c_custkey IS NULL THEN 'INSERTED'
            ELSE t.c_mktsegment END AS c_mktsegment,
          coalesce(s.n_orders, 0) AS n_orders
        FROM customer t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey
        ORDER BY c_custkey""")),

    // ------------------------------------------------------------------
    // q73 — vehicle-motion rollup (MotionOps.motionSummary) over a
    // synthetic millimeter-grid track derived from the events table by
    // shared generating arithmetic (both engines compute positions from
    // the same integer constants). L1 displacement + integer-division
    // speeds keep every intermediate a long — the hash gate for the
    // lag-window + keyed-aggregate motion shape (speed estimates, GPS
    // teleport detection) the HFP data model implies.
    // ------------------------------------------------------------------
    "q73_gps_motion" -> GraftQuery(
      build = (s, d) => {
        val pts = events(s, d).select(
          col("user_id"), col("event_id"),
          expr("ts div 1000").as("t_us"),
          ((col("event_id") * XA + col("user_id") * XB) % GridMod).as("x_mm"),
          ((col("event_id") * YA + col("user_id") * YB) % GridMod).as("y_mm"))
        MotionOps.motionSummary(pts, "user_id", "t_us", "x_mm", "y_mm",
          "event_id", jumpMm = JumpMm)
          .select(col("user_id"), col("n_fixes"), col("dist_mm"),
            coalesce(col("max_speed_mm_s"), lit(0L)).as("max_speed_mm_s"),
            col("n_jumps"))
          .orderBy("user_id")
      },
      oracle = Some(s"""
        WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
            (event_id * $XA + user_id * $XB) % $GridMod AS x_mm,
            (event_id * $YA + user_id * $YB) % $GridMod AS y_mm
          FROM events),
        st AS (SELECT user_id,
            abs(x_mm - lag(x_mm) OVER w) + abs(y_mm - lag(y_mm) OVER w)
              AS dist_mm,
            t_us - lag(t_us) OVER w AS dt_us
          FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
        SELECT user_id,
          count(*) AS n_fixes,
          CAST(coalesce(sum(dist_mm), 0) AS BIGINT) AS dist_mm,
          CAST(coalesce(max(CASE WHEN dt_us > 0
            THEN (dist_mm * 1000000) // dt_us END), 0) AS BIGINT)
            AS max_speed_mm_s,
          CAST(coalesce(sum(CASE WHEN dist_mm > $JumpMm THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_jumps
        FROM st GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // q74 — deterministic per-group sampling: k docs per language chosen
    // by md5-hash rank — the distributed "reservoir" that needs no RNG
    // state and no driver coordination: rank-by-hash is reproducible
    // across engines, partitionings and reruns, and extends to any k
    // without a second pass (vs. q46's rate-based Bernoulli filter,
    // which cannot promise an exact k). One keyed window; WindowGroupLimit
    // prunes to k per group map-side before the shuffle.
    // ------------------------------------------------------------------
    "q74_group_sample" -> GraftQuery(
      build = (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("lang")
          .orderBy(col("hk"), col("doc_id"))
        documents(s, d)
          .select(col("doc_id"), col("lang"),
            md5(col("doc_id").cast("string").cast("binary")).as("hk"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= SamplePerGroup)
          .orderBy("lang", "rk")
      },
      oracle = Some(s"""
        WITH h AS (SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS hk
          FROM documents),
        r AS (SELECT doc_id, lang, hk,
            CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id)
              AS BIGINT) AS rk
          FROM h)
        SELECT doc_id, lang, hk, rk FROM r WHERE rk <= $SamplePerGroup
        ORDER BY lang, rk"""))
  )
}
