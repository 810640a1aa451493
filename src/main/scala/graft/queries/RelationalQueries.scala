package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/**
 * The relational query surface of the engine — the analytics layer the
 * reference delegates entirely to TimescaleDB (SURVEY.md §2.2: joins,
 * aggregations, window functions, sorts, set ops are absent from the
 * reference's 423 lines and must be provided by the Spark engine to cover
 * the intended query surface revealed by the DDL's indexes,
 * run/init.sql:78-85).
 *
 * Implemented with the declarative DataFrame API so Catalyst owns the
 * physical strategy: filters/projections push into the parquet scan, small
 * dimension tables are broadcast, aggregates get map-side partial
 * combining, AQE re-plans shuffles at runtime. Scale notes per query are
 * inline.
 */
object RelationalQueries {

  /** Exact-arithmetic operand cast: see GraftQuery determinism rules. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private val one = lit(1).cast(DecimalType(18, 4))

  /** q161 (TPC-H Q5 shape): one mid-corpus order year × one region. */
  val Q5Year = 1996
  val Q5Region = "ASIA"

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q49 — the SQL API surface: the same engine through temp views +
    // spark.sql (TPC-H Q3 shape — selective dim filter, two big joins,
    // grouped revenue, top-10). Catalyst plans the SQL text and the
    // DataFrame API identically (one parser away from the same logical
    // plan), so this gates the registration/parser path, with the usual
    // DECIMAL(18,4) determinism casts in both engines.
    // ------------------------------------------------------------------
    "q49_sql_api" -> GraftQuery(
      build = (s, d) => {
        Seq("customer", "orders", "lineitem")
          .foreach(t => tbl(s, d, t).createOrReplaceTempView(t))
        s.sql("""
          SELECT l_orderkey,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
              AS revenue,
            unix_millis(CAST(o_orderdate AS TIMESTAMP)) AS o_orderdate_ms,
            o_orderpriority
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING'
            AND o_orderdate < TIMESTAMP '1995-03-15'
            AND l_shipdate > TIMESTAMP '1995-03-15'
          GROUP BY l_orderkey, o_orderdate, o_orderpriority
          ORDER BY revenue DESC, l_orderkey
          LIMIT 10""")
      },
      oracle = Some("""
        SELECT l_orderkey,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
               * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
            AS revenue,
          epoch_ms(o_orderdate) AS o_orderdate_ms,
          o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10""")),

    // ------------------------------------------------------------------
    // q51 — arbitrary GROUPING SETS (the aggregation shape rollup/cube
    // can't express: a non-hierarchical set list), via Spark 4's
    // Dataset.groupingSets API. grouping() flags disambiguate NULL group
    // values; ORDER BY spells NULLS FIRST because the engines' default
    // null ordering differs.
    // ------------------------------------------------------------------
    "q51_grouping_sets" -> GraftQuery(
      build = (s, d) =>
        lineitem(s, d)
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_linestatus"))),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping(col("l_returnflag")).cast(LongType).as("g_rf"),
            grouping(col("l_linestatus")).cast(LongType).as("g_ls"),
            count(lit(1)).as("n"),
            sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"))
          .orderBy(col("g_rf"), col("g_ls"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus")),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
          GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls,
          COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus))
        ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus""")),

    // ------------------------------------------------------------------
    // q01 — full-scan hash aggregation (TPC-H Q1 shape). Map-side partial
    // agg over 4 groups → a 4-row shuffle: scan-bound at any scale.
    // ------------------------------------------------------------------
    "q01_agg_pricing_summary" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampNTZType))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast(DoubleType).as("sum_disc_price"),
            count(lit(1)).as("count_order"),
            (sum(dec(col("l_quantity"))).cast(DoubleType) /
              count(lit(1)).cast(DoubleType)).as("avg_qty"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      oracle = Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
          COUNT(*) AS count_order,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      headline = true),

    // ------------------------------------------------------------------
    // q02 — filter + projection. Both predicate and the 4-column read
    // schema push into the parquet scan (PushedFilters / ReadSchema).
    // ------------------------------------------------------------------
    "q02_filter_project" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .filter(
            col("l_shipdate") >= lit("1995-01-01").cast(TimestampNTZType) &&
            col("l_shipdate") < lit("1995-04-01").cast(TimestampNTZType) &&
            col("l_discount") >= lit(0.05) && col("l_quantity") < lit(10.0))
          .select(
            col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
            (dec(col("l_extendedprice")) * dec(col("l_discount")))
              .cast(DoubleType).as("disc_amount"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      oracle = Some("""
        SELECT l_orderkey, l_linenumber, l_returnflag,
          CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)) AS DOUBLE) AS disc_amount
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
          AND l_discount >= 0.05 AND l_quantity < 10.0
        ORDER BY l_orderkey, l_linenumber"""),
      headline = true),

    // ------------------------------------------------------------------
    // q03 — dimension hash join. No explicit broadcast() hint on customer:
    // it grows with sf, and a hard hint would force a driver-OOM broadcast
    // at 100× scale where AQE/autoBroadcastJoinThreshold would correctly
    // fall back to a shuffle join (VERDICT r1 perf). At bench sf the
    // threshold still broadcasts it — same plan, no scale cliff.
    // ------------------------------------------------------------------
    "q03_join_broadcast" -> GraftQuery(
      build = (s, d) => {
        orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast(DoubleType).as("revenue"))
          .orderBy("c_mktsegment")
      },
      oracle = Some("""
        SELECT c_mktsegment, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
      headline = true),

    // ------------------------------------------------------------------
    // q04 — 5-table star join. lineitem⋈orders is the only big-big join
    // (shuffle on orderkey); nation/region are broadcast-hinted (genuinely
    // constant-size: 25/5 rows at any sf); customer is left to
    // AQE/autoBroadcastJoinThreshold because it grows with sf — a hard
    // hint would OOM the driver at 100× (VERDICT r1 perf).
    // ------------------------------------------------------------------
    "q04_join_star" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_lineitems"))
          .orderBy("r_name", "n_name")
      },
      oracle = Some("""
        SELECT r_name, n_name,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
          COUNT(*) AS n_lineitems
        FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
      headline = true),

    // ------------------------------------------------------------------
    // q05 — left-semi join (EXISTS). Semi join keeps the build side
    // key-only: no payload duplication, broadcastable when filtered.
    // ------------------------------------------------------------------
    "q05_semi_join" -> GraftQuery(
      build = (s, d) => {
        customer(s, d)
          .join(
            orders(s, d).filter(col("o_totalprice") > lit(150000.0)),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_mktsegment")
      },
      oracle = Some("""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ------------------------------------------------------------------
    // q06 — left-anti join (NOT EXISTS): customers with no large order.
    // ------------------------------------------------------------------
    "q06_anti_join" -> GraftQuery(
      build = (s, d) => {
        customer(s, d)
          .join(orders(s, d).filter(col("o_totalprice") > lit(400000.0)),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("c_nationkey")
      },
      oracle = Some("""
        SELECT c_nationkey, COUNT(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ------------------------------------------------------------------
    // q07 — window function lag: inter-event gap per user. Single shuffle
    // on user_id; at 100 TB this is the per-vehicle analytics pattern
    // (partitionBy unique_vehicle_id ORDER BY tst — run/init.sql:72).
    // ------------------------------------------------------------------
    "q07_window_lag" -> GraftQuery(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        events(s, d)
          .withColumn("sec", expr("ts div 1000000000"))
          .withColumn("gap_s", col("sec") - lag(col("sec"), 1).over(w))
          .select(col("event_id"), col("user_id"), col("gap_s"))
          .orderBy("event_id")
      },
      oracle = Some("""
        SELECT event_id, user_id,
          CAST(floor(epoch(ts)) AS BIGINT)
            - LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        FROM events ORDER BY event_id"""),
      headline = true),

    // ------------------------------------------------------------------
    // q08 — per-group top-k via row_number window (deterministic
    // tie-break on orderkey). At scale: a single shuffle on the group
    // key; no global sort.
    // ------------------------------------------------------------------
    "q08_topk_per_group" -> GraftQuery(
      build = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        orders(s, d)
          .withColumn("rk", row_number().over(w).cast(LongType))
          .filter(col("rk") <= 3)
          .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
          .orderBy("o_custkey", "rk")
      },
      oracle = Some("""
        SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) t
        WHERE rk <= 3 ORDER BY o_custkey, rk""")),

    // ------------------------------------------------------------------
    // q09 — global top-N: orderBy+limit compiles to TakeOrderedAndProject
    // (per-partition heaps + driver merge), not a full sort.
    // ------------------------------------------------------------------
    "q09_sort_limit" -> GraftQuery(
      build = (s, d) => {
        orders(s, d)
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")),

    // ------------------------------------------------------------------
    // q10 — distinct (shuffle-dedup on the pair key).
    // ------------------------------------------------------------------
    "q10_distinct" -> GraftQuery(
      build = (s, d) => {
        events(s, d)
          .select(col("user_id"), col("event_type"))
          .distinct()
          .orderBy("user_id", "event_type")
      },
      oracle = Some("""
        SELECT DISTINCT user_id, event_type FROM events
        ORDER BY user_id, event_type""")),

    // ------------------------------------------------------------------
    // q11 — union + distinct/exact-distinct aggregate in one pass.
    // ------------------------------------------------------------------
    "q11_union_distinct" -> GraftQuery(
      build = (s, d) => {
        customer(s, d).select(col("c_custkey").as("key"))
          .union(orders(s, d).select(col("o_custkey").as("key")))
          .agg(
            count(lit(1)).as("n_all"),
            countDistinct(col("key")).as("n_distinct"),
            min(col("key")).as("min_key"),
            max(col("key")).as("max_key"))
      },
      oracle = Some("""
        SELECT COUNT(*) AS n_all, COUNT(DISTINCT key) AS n_distinct,
               MIN(key) AS min_key, MAX(key) AS max_key
        FROM (SELECT c_custkey AS key FROM customer
              UNION ALL SELECT o_custkey FROM orders) t""")),

    // ------------------------------------------------------------------
    // q12 — rollup (hierarchical grand-totals); Spark expands grouping
    // sets in one aggregation pass.
    // ------------------------------------------------------------------
    "q12_rollup" -> GraftQuery(
      build = (s, d) => {
        customer(s, d)
          .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(
            count(lit(1)).as("n_customers"),
            sum(dec(col("c_acctbal"))).cast(DoubleType).as("sum_acctbal"))
          .select(
            coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("n_name"), lit("ALL")).as("nation_name"),
            col("n_customers"), col("sum_acctbal"))
          .orderBy("region_name", "nation_name")
      },
      oracle = Some("""
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(n_name, 'ALL') AS nation_name,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
        FROM customer
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region_name, nation_name""")),

    // ------------------------------------------------------------------
    // q13 — exact count-distinct per group (expand + two-phase agg).
    // ------------------------------------------------------------------
    "q13_count_distinct" -> GraftQuery(
      build = (s, d) => {
        events(s, d)
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"))
          .orderBy("event_type")
      },
      oracle = Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q14 — semi-structured extraction: JSON field from the props column
    // (the raw-HFP payload envelope is JSON of exactly this shape).
    // ------------------------------------------------------------------
    "q14_json_extract" -> GraftQuery(
      build = (s, d) => {
        events(s, d)
          .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            count(col("k")).as("n_k"),
            max(col("k")).as("max_k"))
          .orderBy("event_type")
      },
      oracle = Some("""
        SELECT event_type,
          CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k, MAX(k) AS max_k
        FROM (SELECT event_type,
                TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events) t
        GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q15 — scalar function suite (date parts, string ops, conditionals)
    // — the O7/O8 expression classes over a relational table.
    // ------------------------------------------------------------------
    "q15_scalar_functions" -> GraftQuery(
      build = (s, d) => {
        orders(s, d)
          .filter(col("o_orderkey") <= 500)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            upper(substring(col("o_orderpriority"), 1, 3)).as("prio3"),
            length(col("o_orderpriority")).as("prio_len"),
            concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("tag"),
            when(col("o_totalprice") > 100000.0, lit("big"))
              .otherwise(lit("small")).as("size_class"),
            floor(col("o_totalprice") / lit(1000.0)).as("price_k"))
          .orderBy("o_orderkey")
      },
      oracle = Some("""
        SELECT o_orderkey,
          CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
          CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mo,
          CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
          UPPER(SUBSTRING(o_orderpriority, 1, 3)) AS prio3,
          CAST(LENGTH(o_orderpriority) AS INTEGER) AS prio_len,
          o_orderstatus || '-' || o_orderpriority AS tag,
          CASE WHEN o_totalprice > 100000.0 THEN 'big' ELSE 'small' END AS size_class,
          CAST(FLOOR(o_totalprice / 1000.0) AS BIGINT) AS price_k
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey""")),

    // ------------------------------------------------------------------
    // q16 — set ops: intersect & except on user sets.
    // ------------------------------------------------------------------
    "q16_set_ops" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
        def users(t: String) = ev.filter(col("event_type") === t).select(col("user_id"))
        val both = users("click").intersect(users("purchase"))
          .withColumn("set_name", lit("click_and_purchase"))
        val only = users("click").except(users("error"))
          .withColumn("set_name", lit("click_not_error"))
        both.union(only).orderBy("set_name", "user_id")
          .select(col("set_name"), col("user_id"))
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT 'click_and_purchase' AS set_name, user_id FROM
            (SELECT user_id FROM events WHERE event_type = 'click'
             INTERSECT
             SELECT user_id FROM events WHERE event_type = 'purchase') a
          UNION ALL
          SELECT 'click_not_error' AS set_name, user_id FROM
            (SELECT user_id FROM events WHERE event_type = 'click'
             EXCEPT
             SELECT user_id FROM events WHERE event_type = 'error') b) t
        ORDER BY set_name, user_id""")),

    // ------------------------------------------------------------------
    // q17 — correlated EXISTS over the fact table (semi join on a
    // filtered probe side).
    // ------------------------------------------------------------------
    "q17_exists_subquery" -> GraftQuery(
      build = (s, d) => {
        orders(s, d)
          .join(
            lineitem(s, d).filter(col("l_quantity") >= 49.0),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy("o_orderstatus")
      },
      oracle = Some("""
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49.0)
        GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ------------------------------------------------------------------
    // q18 — group + having (post-aggregation filter).
    // ------------------------------------------------------------------
    "q18_having" -> GraftQuery(
      build = (s, d) => {
        orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast(DoubleType).as("spend"))
          .filter(col("n_orders") >= 8)
          .orderBy("o_custkey")
      },
      oracle = Some("""
        SELECT o_custkey, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
        ORDER BY o_custkey""")),

    // ------------------------------------------------------------------
    // q19 — pivot / conditional aggregation: one row per user bucket,
    // one revenue column per event type.
    // ------------------------------------------------------------------
    "q19_pivot" -> GraftQuery(
      build = (s, d) => {
        // sign-following % on both sides (pmod vs DuckDB % diverge on
        // negative keys — ADVICE r1)
        events(s, d)
          .withColumn("bucket", col("user_id") % lit(10L))
          .groupBy(col("bucket"))
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(sum(dec(col("value"))).cast(DoubleType))
          .orderBy("bucket")
      },
      oracle = Some("""
        SELECT user_id % 10 AS bucket,
          CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS click,
          CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS error,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS purchase,
          CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS signup,
          CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE) AS "view"
        FROM events GROUP BY user_id % 10 ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // q20 — sessionization: 30-min-gap sessions per user via lag +
    // running sum. The batch twin of streaming session_window; one
    // shuffle on user_id.
    // ------------------------------------------------------------------
    "q20_sessionize" -> GraftQuery(
      build = (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events(s, d)
          .withColumn("sec", expr("ts div 1000000000"))
          .withColumn("new_session",
            when(col("sec") - lag(col("sec"), 1).over(byUser) > 1800 ||
              lag(col("sec"), 1).over(byUser).isNull, lit(1)).otherwise(lit(0)))
          .withColumn("session_id", sum(col("new_session")).over(run))
          .groupBy(col("user_id"))
          .agg(
            max(col("session_id")).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      oracle = Some("""
        SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM (
          SELECT user_id,
            SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
          FROM (
            SELECT user_id, ts, event_id,
              CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                        - LAG(CAST(floor(epoch(ts)) AS BIGINT))
                          OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   THEN 1 ELSE 0 END AS new_session
            FROM events) a) b
        GROUP BY user_id ORDER BY user_id"""),
      headline = true),

    // ------------------------------------------------------------------
    // q39 — CUBE aggregation + approx_count_distinct (SURVEY §2.2
    // aggregation residuals). The cube's exact aggregates are hash-gated
    // directly; the HLL++ estimate cannot be bit-paired with DuckDB's
    // sketch, so it is gated as a TOLERANCE BOOLEAN: Spark emits
    // |approx−exact|/exact ≤ 10% (5σ at rsd=2% — per-group excursion
    // probability ~3e-7, so the gate cannot trip on a legitimately
    // behaving sketch at any scale factor), the oracle emits literal
    // TRUE — an estimator drifting out of tolerance becomes a hash
    // mismatch.
    // ------------------------------------------------------------------
    "q39_cube_approx_distinct" -> GraftQuery(
      build = (s, d) => {
        // r17 OPTIMIZATION (guide §2.3 — shuffle fewer bytes): mixing
        // countDistinct with approx_count_distinct in ONE cube aggregate
        // routes the HLL sketch through the distinct-rewrite's expanded
        // (grouping-set, custkey) grain — one multi-KB HLL buffer per
        // partial group (232 k of them at bench scale) serialized through
        // the shuffle. Splitting the sketch into its own cube aggregate
        // keeps HLL buffers at the FINAL group grain (≤ 24 rows) and the
        // exact path's partials at two longs; the two 24-row cubes join
        // back null-safely on the grouping-id + keys. Same aggregates
        // over the same rows — HLL registers are duplicate-insensitive,
        // so the estimate is bit-identical. spreadSmallInput keeps the
        // expand + partial aggregate off the single parquet split.
        val o = graft.operators.ScanOps.spreadSmallInput(
          orders(s, d).select(col("o_orderpriority"), col("o_orderstatus"),
            col("o_custkey"), col("o_totalprice")), col("o_custkey"))
          .localCheckpoint(true)
        val exact = o
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(
            count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast(DoubleType).as("sum_total"),
            countDistinct(col("o_custkey")).as("n_cust_exact"),
            grouping_id().as("gid"))
        val apx = o
          .cube(col("o_orderpriority"), col("o_orderstatus"))
          .agg(approx_count_distinct(col("o_custkey"), 0.02).as("apx"),
            grouping_id().as("gid"))
          .select(col("o_orderpriority").as("p2"),
            col("o_orderstatus").as("s2"), col("gid").as("gid2"), col("apx"))
        exact
          .join(broadcast(apx),
            col("gid") === col("gid2") &&
              col("o_orderpriority") <=> col("p2") &&
              col("o_orderstatus") <=> col("s2"))
          .select(
            coalesce(col("o_orderpriority"), lit("ALL")).as("order_priority"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("order_status"),
            col("n_orders"), col("sum_total"), col("n_cust_exact"),
            (abs(col("apx") - col("n_cust_exact")).cast(DoubleType)
              / col("n_cust_exact").cast(DoubleType) <= 0.10).as("approx_ok"))
          .orderBy("order_priority", "order_status")
      },
      oracle = Some("""
        SELECT COALESCE(o_orderpriority, 'ALL') AS order_priority,
               COALESCE(o_orderstatus, 'ALL') AS order_status,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_total,
               COUNT(DISTINCT o_custkey) AS n_cust_exact,
               TRUE AS approx_ok
        FROM orders
        GROUP BY CUBE(o_orderpriority, o_orderstatus)
        ORDER BY order_priority, order_status""")),

    // ------------------------------------------------------------------
    // q40 — product-profit star (TPC-H Q9 shape): lineitem ⋈ part ⋈
    // supplier ⋈ nation ⋈ orders. Two big-big shuffle joins (partkey,
    // orderkey) that AQE sizes at runtime; `part` is filtered BEFORE the
    // join so the selective predicate pushes into its scan and the
    // post-filter side can be broadcast when small; constant-size nation
    // is broadcast-hinted. This is the plan shape that survives 100×:
    // no dimension hint on mid-size tables, no cartesian, partial aggs
    // before the final group shuffle.
    // ------------------------------------------------------------------
    "q40_part_supplier_profit" -> GraftQuery(
      build = (s, d) => {
        val l = lineitem(s, d)
        val p = part(s, d).filter(col("p_size") <= 15)
        val sup = supplier(s, d)
        val n = nation(s, d)
        val o = orders(s, d)
        l.join(p, col("l_partkey") === col("p_partkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"),
            col("p_brand"))
          .agg(
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast(DoubleType).as("profit"),
            count(lit(1)).as("n_lines"))
          .orderBy("n_name", "o_year", "p_brand")
      },
      oracle = Some("""
        SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year, p_brand,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS profit,
               COUNT(*) AS n_lines
        FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN orders ON l_orderkey = o_orderkey
        WHERE p_size <= 15
        GROUP BY n_name, year(o_orderdate), p_brand
        ORDER BY n_name, o_year, p_brand"""),
      headline = true),

    // ------------------------------------------------------------------
    // q42 — salted big-big join (SkewOps): lineitem ⋈ orders on orderkey
    // with 8-way salting of the probe side and ×8 replication of the
    // build side. The salt is pure routing — the oracle is the PLAIN SQL
    // join, so the hash gate proves salting is result-invariant. This is
    // the manual skew fallback for when AQE's runtime skew splitting
    // cannot apply (SURVEY §2.2 / builder brief: salting for skew).
    // ------------------------------------------------------------------
    "q42_salted_join" -> GraftQuery(
      build = (s, d) => {
        graft.operators.SkewOps.saltedJoin(
            lineitem(s, d).select(col("l_orderkey").as("o_orderkey"),
              col("l_quantity"), col("l_extendedprice")),
            orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
            key = "o_orderkey", salts = 8)
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_lines"),
            sum(dec(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast(DoubleType).as("sum_price"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority, COUNT(*) AS n_lines,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    // q54 — salted two-phase EXACT distinct count (SkewOps
    // .saltedDistinctCount): l_returnflag is a genuinely hot key (3
    // values over the whole table), and collect_set is a buffering
    // aggregate whose hot-key merge otherwise lands on one reducer.
    // Phase 1 builds 16 parallel distinct sets per flag, phase 2 unions
    // 16 deduplicated sets. The salt is pure routing — the oracle is
    // plain COUNT(DISTINCT) SQL, so the hash gate proves the two-phase
    // rewrite is result-invariant (the aggregate-side q42).
    // ------------------------------------------------------------------
    "q54_salted_distinct_agg" -> GraftQuery(
      build = (s, d) =>
        graft.operators.SkewOps.saltedDistinctCount(
          lineitem(s, d).select(col("l_returnflag"), col("l_partkey")),
          key = "l_returnflag", valueCol = "l_partkey", salts = 16)
          .orderBy("l_returnflag"),
      oracle = Some("""
        SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // q55 — UNPIVOT (wide→long reshape, the Dataset.unpivot API): four
    // same-typed measure columns melt into (measure, value) rows. A
    // per-row Expand, no shuffle until the final sort; values are
    // copied, never computed, so the gate is exact by construction.
    // ------------------------------------------------------------------
    "q55_unpivot" -> GraftQuery(
      build = (s, d) =>
        lineitem(s, d).filter(col("l_orderkey") < 200)
          .unpivot(
            ids = Array(col("l_orderkey"), col("l_linenumber")),
            values = Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            variableColumnName = "measure", valueColumnName = "value")
          .orderBy("l_orderkey", "l_linenumber", "measure"),
      oracle = Some("""
        WITH src AS (SELECT l_orderkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 200)
        SELECT l_orderkey, l_linenumber, measure, value FROM (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
            l_quantity AS value FROM src
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
            l_extendedprice FROM src
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
            l_discount FROM src
          UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM src)
        ORDER BY l_orderkey, l_linenumber, measure""")),

    // ------------------------------------------------------------------
    // q126 — PIVOT (long→wide, q55's inverse): revenue matrix nation ×
    // order priority via the Dataset.pivot API with an EXPLICIT value
    // list — the scale-correct form (inferring values costs a
    // driver-side distinct over the data; with the list the pivot
    // compiles into ONE hash aggregate whose buffers hold the five CASE
    // arms — no extra shuffle, no per-column pass). Empty cells stay
    // null (the oracle's no-ELSE CASE matches pivot semantics exactly);
    // revenue in cents so sums are integer-exact cross-engine.
    // ------------------------------------------------------------------
    "q126_pivot" -> GraftQuery(
      build = (s, d) => {
        val base = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("o_orderpriority"),
            Tables.cents(col("o_totalprice")).as("cents"))
        base.groupBy("n_name")
          .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
            "4-NOT SPECIFIED", "5-LOW"))
          .agg(sum("cents"))
          .withColumnsRenamed(Map("1-URGENT" -> "urgent", "2-HIGH" -> "high",
            "3-MEDIUM" -> "medium", "4-NOT SPECIFIED" -> "notspec",
            "5-LOW" -> "low"))
          .orderBy("n_name")
      },
      oracle = Some("""
        WITH base AS (SELECT n_name, o_orderpriority,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS cents
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey)
        SELECT n_name,
          CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN cents END)
            AS BIGINT) AS urgent,
          CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN cents END)
            AS BIGINT) AS high,
          CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN cents END)
            AS BIGINT) AS medium,
          CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
            THEN cents END) AS BIGINT) AS notspec,
          CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN cents END)
            AS BIGINT) AS low
        FROM base GROUP BY n_name ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // q57 — ranking window trio (ntile / percent_rank / cume_dist +
    // dense_rank), completing the window-function family beyond
    // lag/row_number/range frames (q07/q08/q35). The window order is
    // total (price, then unique orderkey), so the rational arithmetic
    // ((rank-1)/(n-1), rn/n) is tie-free and bit-identical across
    // engines.
    // ------------------------------------------------------------------
    "q57_ranking_windows" -> GraftQuery(
      build = (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        orders(s, d).filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("quartile", ntile(4).over(w).cast(LongType))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .withColumn("drnk", dense_rank().over(w).cast(LongType))
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
          CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          percent_rank() OVER w AS pct_rank,
          cume_dist() OVER w AS cume,
          CAST(dense_rank() OVER w AS BIGINT) AS drnk
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    // ------------------------------------------------------------------
    // q132 — value-window family (first_value / last_value / nth_value),
    // completing the window coverage beyond lag (q07), ranks (q57) and
    // range frames (q35): the "anchor observation" readouts — each
    // order against its customer's cheapest, priciest, runner-up-so-far
    // and a sliding 4-row local minimum anchor. EVERY frame is explicit
    // (the defaults differ: last_value over the default frame is the
    // CURRENT row — the classic silent-wrong-answer); the window order
    // is total (price, then unique orderkey) so all four anchors are
    // tie-free cross-engine. One customer-keyed exchange serves all
    // four frames.
    // ------------------------------------------------------------------
    "q132_value_windows" -> GraftQuery(
      build = (s, d) => {
        val ord = Window.partitionBy("o_custkey")
          .orderBy(col("price_cents"), col("o_orderkey"))
        val full = ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val slide = ord.rowsBetween(-3, Window.currentRow)
        orders(s, d).filter(col("o_custkey") < 200)
          .select(col("o_custkey"), col("o_orderkey"),
            Tables.cents(col("o_totalprice")).as("price_cents"))
          .withColumn("cheapest", first(col("price_cents")).over(full))
          .withColumn("priciest", last(col("price_cents")).over(full))
          .withColumn("runner_up",
            nth_value(col("price_cents"), 2).over(run))
          .withColumn("win4_floor", first(col("price_cents")).over(slide))
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
            AS price_cents,
          first_value(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
            AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
            UNBOUNDED FOLLOWING) AS cheapest,
          last_value(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
            AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
            UNBOUNDED FOLLOWING) AS priciest,
          nth_value(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
            AS BIGINT), 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND
            CURRENT ROW) AS runner_up,
          first_value(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
            AS BIGINT)) OVER (w ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            AS win4_floor
        FROM orders WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey""")),

    // ------------------------------------------------------------------
    // q58 — exact grouped percentiles (the quartile trio). Spark's
    // `percentile` and DuckDB's `quantile_cont` both use the type-7
    // (R/NumPy default) positioning p·(n-1) with linear interpolation;
    // l_quantity holds small integers, so lower + (upper-lower)·{.25,.5,
    // .75} is exact in binary and the gate is bit-deterministic without
    // decimal casts. One map-side-combined shuffle on the 6-key group.
    // At 100 TB the scale path is approx_percentile (t-digest-style GK
    // sketch, mergeable, bounded memory) — PercentileSpec asserts the
    // approx answer lands within its accuracy bound of this exact gate.
    // ------------------------------------------------------------------
    "q58_percentiles" -> GraftQuery(
      build = (s, d) =>
        lineitem(s, d)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            count(lit(1)).as("n"),
            percentile(col("l_quantity"), lit(0.25)).as("q25"),
            percentile(col("l_quantity"), lit(0.5)).as("q50"),
            percentile(col("l_quantity"), lit(0.75)).as("q75"))
          .orderBy("l_returnflag", "l_linestatus"),
      oracle = Some("""
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
          quantile_cont(l_quantity, 0.25) AS q25,
          quantile_cont(l_quantity, 0.5) AS q50,
          quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ------------------------------------------------------------------
    // q59 — correlated scalar subqueries: the UNIQUE top-balance supplier
    // per nation (balance equals the nation max AND nobody ties it).
    // Exercises Catalyst decorrelation: both correlated aggregates are
    // rewritten to grouped Aggregates + hash joins
    // (RewriteCorrelatedScalarSubquery), never a per-row re-execution —
    // PlanAuditSpec asserts the physical plan. Correlation is kept
    // EQUALITY-ONLY deliberately: a non-equality correlated predicate
    // (e.g. `s2.s_suppkey <> s.s_suppkey`) decorrelates into a DOMAIN
    // nested-loop join of the distinct outer keys against the inner
    // table — O(S²) at scale (measured: BroadcastNestedLoopJoin with an
    // unbounded build side) — so the same semantics are expressed as
    // max-equality + tie-count instead. max/count over doubles is
    // comparison-only (no FP arithmetic): exact by construction.
    // ------------------------------------------------------------------
    "q59_correlated_subquery" -> GraftQuery(
      build = (s, d) => {
        supplier(s, d).createOrReplaceTempView("supplier")
        nation(s, d).createOrReplaceTempView("nation")
        s.sql("""
          SELECT s_suppkey, s_name, n_name, s_acctbal
          FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE s_acctbal = (
              SELECT max(s2.s_acctbal) FROM supplier s2
              WHERE s2.s_nationkey = s.s_nationkey)
            AND 1 = (
              SELECT count(*) FROM supplier s3
              WHERE s3.s_nationkey = s.s_nationkey
                AND s3.s_acctbal = s.s_acctbal)
          ORDER BY s_suppkey""")
      },
      oracle = Some("""
        SELECT s_suppkey, s_name, n_name, s_acctbal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE s_acctbal = (
            SELECT max(s2.s_acctbal) FROM supplier s2
            WHERE s2.s_nationkey = s.s_nationkey)
          AND 1 = (
            SELECT count(*) FROM supplier s3
            WHERE s3.s_nationkey = s.s_nationkey
              AND s3.s_acctbal = s.s_acctbal)
        ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // q67 — fixed-point PageRank (GraphOps.pageRankFixed) over the REAL
    // part<->supplier bipartite graph from lineitem (suppliers carried
    // as negated ids: collision-free at any scale factor). Every
    // arithmetic step is on scaled longs — integer contribution
    // division, exact sums, integer damping — so 3 iterations
    // hash-match a generated DuckDB twin; float PageRank could never
    // gate (summation order). Iterations are joins + aggregates on the
    // same key; only (id, long) rows shuffle.
    // ------------------------------------------------------------------
    "q67_pagerank_bipartite" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        val fwd = li.select(col("l_partkey").as("src"), (-col("l_suppkey")).as("dst"))
        val rev = li.select((-col("l_suppkey")).as("src"), col("l_partkey").as("dst"))
        graft.operators.GraphOps.pageRankFixed(fwd.union(rev), "src", "dst",
          iterations = 3)
          .orderBy("id")
      },
      oracle = Some {
        val scale = graft.operators.GraphOps.PageRankScale
        val base = 15L * scale / 100
        val iters = (1 to 3).map { i =>
          val prev = s"r${i - 1}"
          s"""c$i AS (SELECT e.dst AS id, sum(r.rank_fp // d.outdeg) AS s
            FROM e JOIN deg d ON e.src = d.src
            JOIN $prev r ON e.src = r.id GROUP BY e.dst),
          r$i AS (SELECT n.id, $base + (85 * coalesce(c.s, 0)) // 100 AS rank_fp
            FROM nodes n LEFT JOIN c$i c ON n.id = c.id)"""
        }.mkString(",\n          ")
        s"""
        WITH e AS (
          SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
            CAST(-l_suppkey AS BIGINT) AS dst FROM lineitem
          UNION
          SELECT DISTINCT CAST(-l_suppkey AS BIGINT), CAST(l_partkey AS BIGINT)
          FROM lineitem),
        deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        r0 AS (SELECT id, CAST($scale AS BIGINT) AS rank_fp FROM nodes),
        $iters
        SELECT id, CAST(rank_fp AS BIGINT) AS rank_fp FROM r3 ORDER BY id"""
      }),

    // ------------------------------------------------------------------
    // q193 — HITS hubs & authorities (GraphOps.hitsFixed) on the
    // DIRECTED part→supplier graph from lineitem (suppliers negated,
    // collision-free): a part is a good hub when it points at
    // heavily-sourced suppliers; a supplier a good authority when many
    // good hubs point at it — the mutually-recursive centrality pair
    // PageRank's single score can't express. Two iterations
    // (auth ← Eᵀ·hub, hub ← E·auth) with exact L∞ renormalization
    // (decimal sums, integer max, truncating div) hash-match the
    // unrolled oracle twin — float HITS could never gate.
    // ------------------------------------------------------------------
    "q193_hits_bipartite" -> GraftQuery(
      build = (s, d) => {
        val e = lineitem(s, d)
          .select(col("l_partkey").as("src"), (-col("l_suppkey")).as("dst"))
        graft.operators.GraphOps.hitsFixed(e, "src", "dst", iterations = 2)
          .orderBy("id")
      },
      oracle = Some {
        val scale = graft.operators.GraphOps.HitsScale
        def aIter(i: Int, hubPrev: String) = s"""
          a${i}r AS (SELECT e.dst AS id, sum(CAST(h.v AS HUGEINT)) AS raw
            FROM e JOIN $hubPrev h ON e.src = h.id GROUP BY e.dst),
          a${i}m AS (SELECT max(raw) AS mx FROM a${i}r),
          a$i AS (SELECT n.id, CASE WHEN mx > 0
              THEN CAST((coalesce(raw, 0) * $scale) // mx AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS v
            FROM nodes n LEFT JOIN a${i}r USING (id) CROSS JOIN a${i}m)"""
        def hIter(i: Int) = s"""
          h${i}r AS (SELECT e.src AS id, sum(CAST(a.v AS HUGEINT)) AS raw
            FROM e JOIN a$i a ON e.dst = a.id GROUP BY e.src),
          h${i}m AS (SELECT max(raw) AS mx FROM h${i}r),
          h$i AS (SELECT n.id, CASE WHEN mx > 0
              THEN CAST((coalesce(raw, 0) * $scale) // mx AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS v
            FROM nodes n LEFT JOIN h${i}r USING (id) CROSS JOIN h${i}m)"""
        s"""
        WITH e AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src,
            CAST(-l_suppkey AS BIGINT) AS dst FROM lineitem),
        nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
        h0 AS (SELECT id, CAST($scale AS BIGINT) AS v FROM nodes),
        ${aIter(1, "h0")},
        ${hIter(1)},
        ${aIter(2, "h1")},
        ${hIter(2)}
        SELECT nodes.id, h2.v AS hub_fp, a2.v AS auth_fp
        FROM nodes JOIN h2 USING (id) JOIN a2 USING (id)
        ORDER BY nodes.id"""
      }),

    // ------------------------------------------------------------------
    // q106 — key-skew profile (SkewOps.keySkewProfile): the counts-of-
    // counts diagnostic that decides whether q42/q54's salting (or
    // AQE's skew split) is needed — keys bucketed by power-of-two
    // frequency band via the exact `length(bin(count)) − 1` log2, no
    // float. An injected hot key (every 7th event re-keyed to user −1,
    // ~14% of the table on one key) must surface as a lone populated
    // high band. Two map-side-combined aggregates; only (key, count)
    // rows shuffle.
    // ------------------------------------------------------------------
    "q106_key_skew_profile" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          when(col("event_id") % 7 === 0, lit(-1L))
            .otherwise(col("user_id")).as("uid"))
        graft.operators.SkewOps.keySkewProfile(ev, "uid")
          .orderBy("band")
      },
      oracle = Some("""
        WITH e AS (SELECT CASE WHEN event_id % 7 = 0 THEN -1
            ELSE user_id END AS uid FROM events),
        c AS (SELECT uid, count(*) AS cnt FROM e GROUP BY uid),
        b AS (SELECT CAST(length(bin(cnt)) - 1 AS BIGINT) AS band, cnt FROM c)
        SELECT band, count(*) AS n_keys, CAST(sum(cnt) AS BIGINT)
            AS total_rows,
          min(cnt) AS min_cnt, max(cnt) AS max_cnt
        FROM b GROUP BY band ORDER BY band""")),

    // ------------------------------------------------------------------
    // q161 — local-supplier revenue (the TPC-H Q5 shape): the canonical
    // deep star-join flow — region filter → nation → customer → orders
    // (one-year slice) → lineitem → supplier — with Q5's signature
    // CROSS-DIMENSION predicate c_nationkey = s_nationkey ("revenue
    // where the supplier is local to the customer"), which no single
    // dimension join expresses: it rides the lineitem⋈supplier join as
    // a second equi-key. Plan: dims broadcast (region/nation/supplier),
    // the year filter lands on the orders scan as a pushed predicate,
    // lineitem (the fact) shuffles once onto orders. Revenue is exact:
    // cents · (10⁴ − discount_e4) in 1e-8-dollar longs, summed in
    // decimal128.
    // ------------------------------------------------------------------
    "q161_local_supplier_revenue" -> GraftQuery(
      build = (s, d) => {
        val yearLo = s"$Q5Year-01-01"; val yearHi = s"${Q5Year + 1}-01-01"
        val ord = orders(s, d)
          .filter(col("o_orderdate").cast("date") >= lit(yearLo).cast("date") &&
            col("o_orderdate").cast("date") < lit(yearHi).cast("date"))
          .select(col("o_orderkey"), col("o_custkey"))
        val asia = broadcast(nation(s, d)
          .join(broadcast(region(s, d).filter(col("r_name") === Q5Region)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name")))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            (cents(col("l_extendedprice")) *
              (lit(10000L) - cents(col("l_discount")))).as("rev_e8"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(asia, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("rev_e8").cast("decimal(38,0)")).cast("long")
            .as("revenue_e8"),
            count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      oracle = Some(s"""
        SELECT n_name,
          CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
              10000 AS BIGINT) *
            (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS HUGEINT)) AS BIGINT) AS revenue_e8,
          CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = '$Q5Region'
          AND CAST(o_orderdate AS DATE) >= DATE '$Q5Year-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '${Q5Year + 1}-01-01'
        GROUP BY n_name ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // q199 — small-quantity revenue (the TPC-H Q17 shape): "revenue
    // locked in below-average orders" — lines whose quantity is under
    // 20% of their PART's average, summed per brand and divided by 7
    // ("average yearly"). The load-bearing rewrite is the correlated
    // scalar subquery (0.2 * avg(l_quantity) per part) DECORRELATED
    // into a per-part aggregate joined back to the fact — both sides
    // hash-partition on l_partkey, so the agg and the self-join share
    // one shuffle key, and the brand/size dimension filter broadcasts
    // AND semi-restricts the fact BEFORE the aggregate (restricting to
    // a part subset cannot change that part's own average, so the
    // pushdown is semantics-free — the classic magic-set step Catalyst
    // won't invent on its own). The threshold compares exactly:
    // 5·qty_c·n < Σqty_c in integer cents, no float avg anywhere.
    // ------------------------------------------------------------------
    "q199_small_quantity_revenue" -> GraftQuery(
      build = (s, d) => {
        val D = DecimalType(38, 0)
        val keep = broadcast(part(s, d).filter(col("p_size") <= 10)
          .select(col("p_partkey"), col("p_brand")))
        val li = lineitem(s, d)
          .select(col("l_partkey"), cents(col("l_quantity")).as("qty_c"),
            cents(col("l_extendedprice")).as("price_c"))
          .join(keep, col("l_partkey") === col("p_partkey"))
        val pa = li.groupBy(col("l_partkey").as("pk"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("qty_c").cast(D)).as("sum_qty"))
        li.join(pa, col("l_partkey") === col("pk"))
          .filter(col("qty_c").cast(D) * 5 * col("n_lines") <
            col("sum_qty"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_small"),
            expr("cast((sum(cast(price_c as decimal(38,0))) div 7) " +
              "as bigint)").as("avg_yearly_c"))
          .orderBy("p_brand")
      },
      oracle = Some("""
        WITH li AS (SELECT l_partkey, p_brand,
            CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS qty_c,
            CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS price_c
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_size <= 10),
        pa AS (SELECT l_partkey, count(*) AS n_lines,
            sum(CAST(qty_c AS HUGEINT)) AS sum_qty
          FROM li GROUP BY l_partkey)
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small,
          CAST(sum(CAST(price_c AS HUGEINT)) // 7 AS BIGINT)
            AS avg_yearly_c
        FROM li JOIN pa USING (l_partkey)
        WHERE CAST(qty_c AS HUGEINT) * 5 * n_lines < sum_qty
        GROUP BY p_brand ORDER BY p_brand""")),

    // ------------------------------------------------------------------
    // q200 — waiting-supplier lines (the TPC-H Q21 shape): suppliers
    // who were the SOLE late deliverer on a multi-supplier finished
    // order — the canonical EXISTS + NOT-EXISTS-on-the-same-table
    // pattern ("another supplier participated, no other supplier was
    // also late"). Late = shipped > 90 days after order date (this
    // schema has no receipt/commit dates; the gap proxy is the same
    // join shape). The load-bearing rewrite: both correlated
    // subqueries collapse into ONE per-order aggregate — n_supp =
    // distinct suppliers, n_late_supp = distinct LATE suppliers — and
    // the predicate becomes n_supp >= 2 AND n_late_supp = 1, turning
    // two shuffled semi/anti joins into a single orderkey-partitioned
    // agg + join, the aggregate decorrelation Catalyst can't derive
    // because it needs the "exactly one late supplier ⇒ it is the
    // candidate" argument. The fact pays ONE exchange total: an
    // explicit repartition on l_orderkey feeds BOTH the per-pair and
    // the per-order aggregate (hashpartitioning(ok) satisfies the
    // clustered distribution of a (ok, sk) grouping — same-key rows
    // can't cross partitions), the second branch resolves to a
    // ReusedExchange, and the pairs⋈ordStats join inherits the
    // partitioning from both children (plan-spec-pinned).
    // ------------------------------------------------------------------
    "q200_waiting_supplier_lines" -> GraftQuery(
      build = (s, d) => {
        // The explicit not-null filter is a plan-shape device: the
        // downstream supplier join infers isnotnull(l_suppkey) on ONE
        // of the two consumers of this frame, and that one-sided
        // inference would make the twin subtrees canonically unequal —
        // blocking AQE's shuffle-stage reuse. Stating it here keeps
        // both branches byte-identical below the repartition, so the
        // fact is shuffled once and the second branch reads the same
        // stage (plan-spec-pinned).
        val byOrder = lineitem(s, d)
          .filter(col("l_orderkey").isNotNull && col("l_suppkey").isNotNull)
          .join(orders(s, d).filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate").cast("date") >
              date_add(col("o_orderdate").cast("date"), 90)).as("late"))
          .repartition(col("l_orderkey"))
        // ordStats derives from the DEDUPED pairs frame, not the raw
        // lines: that turns both countDistincts into plain count/sum
        // (pairs is already one row per (order, supplier)), and — the
        // plan-shape point — avoids the Expand node a distinct
        // aggregate plans through, which reports UnknownPartitioning
        // and would force two fresh shuffles despite the repartition.
        val pairs = byOrder.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("late")).as("late"))
        val ordStats = pairs.groupBy(col("l_orderkey").as("ok"))
          .agg(count(lit(1)).as("n_supp"),
            sum(when(col("late"), 1L).otherwise(0L)).as("n_late_supp"))
        pairs.filter(col("late"))
          .join(ordStats, col("l_orderkey") === col("ok"))
          .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("numwait"))
          .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      oracle = Some("""
        WITH li AS (SELECT l_orderkey, l_suppkey,
            (CAST(l_shipdate AS DATE) >
              CAST(o_orderdate AS DATE) + INTERVAL 90 DAY) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'),
        os AS (SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
            count(DISTINCT CASE WHEN late THEN l_suppkey END)
              AS n_late_supp
          FROM li GROUP BY l_orderkey)
        SELECT s_name, CAST(count(DISTINCT li.l_orderkey) AS BIGINT)
            AS numwait
        FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM li
          WHERE late) li
        JOIN os USING (l_orderkey)
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE n_supp >= 2 AND n_late_supp = 1
        GROUP BY s_name ORDER BY numwait DESC, s_name""")),

    // ------------------------------------------------------------------
    // q217 — dormant high-balance customers (the TPC-H Q22 shape,
    // adapted to this DDL: no phone column, and every sf0.001 customer
    // orders constantly, so "no orders at all" is empty — the anti-join
    // predicate becomes "never placed a LARGE order", probed nonempty
    // at sf0.001 with T = $400k). The load-bearing pieces survive
    // intact: a global scalar threshold (positive-balance floor-average
    // in exact e-4 units — one 1-row broadcast, never a float avg), an
    // ANTI-join against the qualifying order set, and a per-nation
    // rollup. Positive sums make the truncating div a true floor in
    // both engines.
    // ------------------------------------------------------------------
    "q217_dormant_high_balance" -> GraftQuery(
      build = (s, d) => {
        val cust = customer(s, d).select(col("c_custkey"),
          col("c_nationkey"), cents(col("c_acctbal")).as("bal"))
        val thr = cust.filter(col("bal") > 0)
          .agg(expr("cast(sum(cast(bal as decimal(38,0))) div count(*) " +
            "as bigint)").as("t"))
        val big = orders(s, d)
          .filter(cents(col("o_totalprice")) > 4000000000L)
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(thr))
          .filter(col("bal") > col("t"))
          .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            sum(col("bal")).cast("long").as("total_bal_e4"))
          .orderBy("c_nationkey")
      },
      oracle = Some("""
        WITH cust AS (SELECT c_custkey, c_nationkey,
            CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS bal
          FROM customer),
        thr AS (SELECT CAST(sum(bal) AS BIGINT) // count(*) AS t
          FROM cust WHERE bal > 0),
        big AS (SELECT DISTINCT o_custkey FROM orders
          WHERE CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
            AS BIGINT) > 4000000000)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
          CAST(sum(bal) AS BIGINT) AS total_bal_e4
        FROM cust, thr
        WHERE bal > t AND NOT EXISTS (SELECT 1 FROM big
          WHERE big.o_custkey = cust.c_custkey)
        GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ------------------------------------------------------------------
    // q218 — top-revenue supplier (the TPC-H Q15 shape): quarterly
    // revenue per supplier, then the supplier(s) achieving the maximum.
    // The view + correlated max of the original is decorrelated into a
    // per-supplier aggregate plus ONE 1-row max broadcast — no window
    // over the supplier frame (at 100 TB "suppliers" can be
    // millions of rows; a global max needs an aggregate, not a sort).
    // Revenue is the q161 exact e-8 lattice. Ties on the max all
    // return (probed: unique at sf0.01), ordered by key.
    // ------------------------------------------------------------------
    "q218_top_revenue_supplier" -> GraftQuery(
      build = (s, d) => {
        val rev = lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >=
            lit("1996-01-01").cast("date") &&
            col("l_shipdate").cast("date") < lit("1996-04-01").cast("date"))
          .select(col("l_suppkey"),
            (cents(col("l_extendedprice")) *
              (lit(10000L) - cents(col("l_discount")))).as("rev_e8"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("rev_e8").cast("decimal(38,0)")).cast("long")
            .as("total_rev_e8"))
        val mx = rev.agg(max(col("total_rev_e8")).as("m"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_rev_e8") === col("m"))
          .join(broadcast(supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev_e8"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        WITH rev AS (SELECT l_suppkey,
            CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                10000 AS BIGINT) *
              (10000 - CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000
                AS BIGINT)) AS HUGEINT)) AS BIGINT) AS total_rev_e8
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_rev_e8
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_e8 = (SELECT max(total_rev_e8) FROM rev)
        ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // q219 — customer order-count distribution (the TPC-H Q13 shape):
    // LEFT join customers to a filtered order set (non-urgent — the
    // stand-in for Q13's comment exclusion; this DDL has no o_comment),
    // count per customer WITH zeros preserved (count(o_custkey) counts
    // non-nulls — probed: 1 zero-count customer exists at sf0.01), then
    // the distribution of those counts. Two aggregates, no window; the
    // (custdist desc, c_count desc) order is total because c_count is
    // unique per output row.
    // ------------------------------------------------------------------
    "q219_order_count_distribution" -> GraftQuery(
      build = (s, d) => {
        val o = orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"))
        customer(s, d).select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_custkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      oracle = Some("""
        WITH c AS (SELECT c_custkey,
            CAST(count(o_custkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
          GROUP BY 1)
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM c GROUP BY 1 ORDER BY custdist DESC, c_count DESC""")),

    // ------------------------------------------------------------------
    // q227 — late-order priority check (the TPC-H Q4 shape): orders
    // with AT LEAST one line shipped more than 90 days after the order
    // date, counted per priority. The EXISTS subquery decorrelates
    // into one key join + lateness filter + per-order dedup (the
    // semi-join that matters at scale: the fact joins ONCE on the
    // order key both sides already hash by, and the distinct collapses
    // multiplicity before the tiny priority rollup). Calendar-day
    // arithmetic is identical cross-engine (date_add vs + INTERVAL).
    // ------------------------------------------------------------------
    "q227_late_order_priority" -> GraftQuery(
      build = (s, d) => {
        val ord = orders(s, d).select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"),
          col("o_orderpriority"))
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate").cast("date")
            .as("sd"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("sd") > date_add(col("od"), 90))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .distinct()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy("o_orderpriority")
      },
      oracle = Some("""
        SELECT o_orderpriority,
          CAST(count(DISTINCT o_orderkey) AS BIGINT) AS order_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE CAST(l_shipdate AS DATE) >
          CAST(o_orderdate AS DATE) + INTERVAL 90 DAY
        GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
