package graft.queries

import org.apache.spark.sql.functions._

import Tables._

/**
 * The complete TPC-H decorrelation suite — the 15 classic rewrite shapes
 * the registry had not yet demonstrated (r11 verdict item #1), closing
 * the set at all 22: Q4/Q5/Q13/Q15/Q17/Q21/Q22 landed as
 * q227/q161/q219/q218/q40-era/q84-era/q217; this file adds Q1, Q2, Q3,
 * Q6, Q7, Q8, Q9, Q10, Q11, Q12, Q14, Q16, Q18, Q19, Q20 as q228–q242.
 *
 * The reference delegates ALL of this surface to TimescaleDB (SURVEY
 * §2.2 — its 423 Java lines contain no joins or aggregates); these
 * shapes are the canonical stress set for the decorrelation classes a
 * warehouse engine must handle: correlated MIN (Q2), nested IN with a
 * correlated aggregate (Q20), multi-dimension share/profit rollups
 * (Q8/Q9), group-sum vs scalar threshold (Q11), NOT-IN + distinct-count
 * (Q16), IN over grouped HAVING (Q18), conditional aggregates (Q12/Q14)
 * and a disjunctive-predicate join (Q19).
 *
 * Schema adaptations (this DDL has no partsupp / comment / phone /
 * shipmode / commitdate columns):
 *  - the supply relation is DERIVED: distinct (l_partkey, l_suppkey)
 *    pairs with min/sum lineitem measures stand in for partsupp
 *    (Q2 cost = min extendedprice, Q11 value = sum extendedprice,
 *    Q20 availability = shipped-quantity share);
 *  - lateness is l_shipdate vs o_orderdate + N days (the q227
 *    discipline), "shipmode" is l_linestatus, Q16's complaint
 *    suppliers are the low-balance ones.
 * Every adapted constant was DuckDB-probed nonempty at sf0.001, sf0.01
 * AND sf0.1 (scale-invariant forms only: Q11's classic 0.0001/SF
 * fraction is scale-VARIANT and probed empty at sf0.01, so the
 * threshold is 1.5x the average part value — same rewrite class, same
 * scalar-broadcast plan, stable at every scale).
 *
 * Determinism: the house exact lattices throughout — money in e4
 * "cents", revenue in e8, charge folded to e6, averages as floor-div
 * e4 units (all operands positive, so both engines' truncating
 * division IS floor), shares in ppm through decimal128 staging. Every
 * query ends in a total ORDER BY.
 *
 * Scale shapes: fact-fact joins key on l_orderkey/o_orderkey (already
 * the natural hash key both sides); dims (part, supplier, nation,
 * region) broadcast; aggregates run BEFORE dim joins wherever the
 * group key permits (Q10 aggregates per custkey before touching the
 * customer table); scalar thresholds are 1-row broadcasts (Q11/Q15
 * pattern), never windows over the full frame.
 */
object TpchQueries {

  /** Oracle-side twins of Tables.cents on the lineitem money columns. */
  private val CExt = "CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)"
  private val CDisc = "CAST(CAST(l_discount AS DECIMAL(18,4)) * 10000 AS BIGINT)"
  private val CTax = "CAST(CAST(l_tax AS DECIMAL(18,4)) * 10000 AS BIGINT)"
  /** Discounted revenue on the exact e8 lattice (the q161/q218 form). */
  private val RevE8 = s"$CExt * (10000 - $CDisc)"

  /** Spark-side e8 revenue column (long arithmetic: |e8| <= ~8e12/row). */
  private def revE8 = cents(col("l_extendedprice")) *
    (lit(10000L) - cents(col("l_discount")))

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q228 — TPC-H Q1: the full pricing summary (8 aggregates; the
    // registry's q01 carries a subset). One map-side-combined hash
    // aggregate to 6 groups; charge = ext*(1-disc)*(1+tax) lives on an
    // e12 lattice summed in decimal128 and floor-folded to e6 (a
    // per-group e12 sum tops 10^21 at sf0.1 — past int64, inside
    // decimal128; positive operands make div a true floor in both
    // engines). Averages are floor-div e4 units over the group count.
    // ------------------------------------------------------------------
    "q228_pricing_summary_full" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .filter(col("l_shipdate").cast("date") <=
            lit("2001-06-01").cast("date"))
          .select(col("l_returnflag"), col("l_linestatus"),
            col("l_quantity").cast("long").as("qty"),
            cents(col("l_extendedprice")).as("base_e4"),
            cents(col("l_discount")).as("disc_e4"),
            revE8.as("disc_price_e8"),
            (revE8 * (lit(10000L) + cents(col("l_tax"))))
              .as("charge_e12"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("qty")).as("sum_qty"),
            sum(col("base_e4").cast("decimal(38,0)")).cast("long")
              .as("sum_base_e4"),
            sum(col("disc_price_e8").cast("decimal(38,0)")).cast("long")
              .as("sum_disc_price_e8"),
            expr("cast(sum(cast(charge_e12 as decimal(38,0))) " +
              "div 1000000 as bigint)").as("sum_charge_e6"),
            expr("cast((sum(cast(qty as decimal(38,0))) * 10000) " +
              "div count(*) as bigint)").as("avg_qty_e4"),
            expr("cast(sum(cast(base_e4 as decimal(38,0))) " +
              "div count(*) as bigint)").as("avg_price_e4"),
            expr("cast(sum(cast(disc_e4 as decimal(38,0))) " +
              "div count(*) as bigint)").as("avg_disc_e4"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      oracle = Some(s"""
        SELECT l_returnflag, l_linestatus,
          CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
          CAST(sum(CAST($CExt AS HUGEINT)) AS BIGINT) AS sum_base_e4,
          CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT)
            AS sum_disc_price_e8,
          CAST(sum(CAST(($RevE8) * (10000 + $CTax) AS HUGEINT))
            // 1000000 AS BIGINT) AS sum_charge_e6,
          CAST((sum(CAST(l_quantity AS HUGEINT)) * 10000) // count(*)
            AS BIGINT) AS avg_qty_e4,
          CAST(sum(CAST($CExt AS HUGEINT)) // count(*) AS BIGINT)
            AS avg_price_e4,
          CAST(sum(CAST($CDisc AS HUGEINT)) // count(*) AS BIGINT)
            AS avg_disc_e4,
          CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) <= DATE '2001-06-01'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // q229 — TPC-H Q2: minimum-cost supplier (the correlated-MIN
    // class). The supply relation is derived (min e4 extendedprice per
    // distinct pair — ONE corpus-sized aggregate); the correlated
    // "cost = (SELECT min ...)" decorrelates into a per-part MIN over
    // the region-filtered candidates plus a keyed join back (never a
    // window, never a per-part subquery). Dims broadcast; the
    // candidate frame after the part/region filters is tiny.
    // ------------------------------------------------------------------
    "q229_min_cost_supplier" -> GraftQuery(
      build = (s, d) => {
        val supply = lineitem(s, d)
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(min(cents(col("l_extendedprice"))).as("cost_e4"))
        val eur = supplier(s, d)
          .join(broadcast(nation(s, d)
            .join(broadcast(region(s, d)
              .filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"),
            cents(col("s_acctbal")).as("bal_e4"), col("n_name"))
        val prt = part(s, d)
          .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
          .select(col("p_partkey"))
        val cand = supply
          .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
        val mn = cand.groupBy(col("l_partkey")).agg(min("cost_e4").as("mc"))
          .withColumnRenamed("l_partkey", "mpk")
        cand.join(mn, col("l_partkey") === col("mpk") &&
            col("cost_e4") === col("mc"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
            col("bal_e4"), col("n_name"), col("cost_e4"))
          .orderBy(col("bal_e4").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
      },
      oracle = Some(s"""
        WITH supply AS MATERIALIZED (
          SELECT l_partkey, l_suppkey, min($CExt) AS cost_e4
          FROM lineitem GROUP BY 1, 2),
        eur AS (SELECT s_suppkey, s_name,
            CAST(CAST(s_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS bal_e4, n_name
          FROM supplier JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE'),
        cand AS MATERIALIZED (
          SELECT l_partkey, s_suppkey, s_name, bal_e4, n_name, cost_e4
          FROM supply JOIN eur ON l_suppkey = s_suppkey
          JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'LARGE' AND p_size <= 10),
        mn AS (SELECT l_partkey AS mpk, min(cost_e4) AS mc
          FROM cand GROUP BY 1)
        SELECT l_partkey AS p_partkey, s_suppkey, s_name, bal_e4,
          n_name, cost_e4
        FROM cand JOIN mn ON l_partkey = mpk AND cost_e4 = mc
        ORDER BY bal_e4 DESC, n_name, s_name, p_partkey""")),

    // ------------------------------------------------------------------
    // q230 — TPC-H Q6: the forecasting-revenue filter-aggregate. The
    // point at scale is that ALL THREE predicates reach the parquet
    // scan (date bounds push as timestamp bounds — the Q161PlanSpec
    // pin — and quantity pushes as a double range); the discount band
    // compares on the EXACT e4 lattice, never a double equality.
    // ------------------------------------------------------------------
    "q230_forecast_revenue" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >=
              lit("1996-01-01").cast("date") &&
            col("l_shipdate").cast("date") <
              lit("1997-01-01").cast("date") &&
            cents(col("l_discount")).between(400L, 600L) &&
            col("l_quantity") < 24.0)
          .agg(sum((cents(col("l_extendedprice")) *
              cents(col("l_discount"))).cast("decimal(38,0)"))
              .cast("long").as("revenue_e8"),
            count(lit(1)).as("n_rows"))
      },
      oracle = Some(s"""
        SELECT CAST(sum(CAST($CExt * $CDisc AS HUGEINT)) AS BIGINT)
            AS revenue_e8,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
          AND $CDisc BETWEEN 400 AND 600
          AND l_quantity < 24""")),

    // ------------------------------------------------------------------
    // q231 — TPC-H Q7: volume shipping between two trade blocs (the
    // multi-join directed-flow shape), adapted region-level so both
    // directions are guaranteed populated at sf0.001 (single nations
    // are not: only 10 suppliers exist there). Both dims pre-filter to
    // the two blocs BEFORE the joins, the pair filter then only drops
    // intra-bloc flows; the lineitem→orders join keys on the natural
    // orderkey hash, supplier/customer-bloc maps broadcast.
    // ------------------------------------------------------------------
    "q231_volume_shipping" -> GraftQuery(
      build = (s, d) => {
        val natr = nation(s, d)
          .join(broadcast(region(s, d)
            .filter(col("r_name").isin("ASIA", "EUROPE"))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("r_name"))
        val sup = supplier(s, d)
          .join(broadcast(natr), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("r_name").as("supp_bloc"))
        val cus = customer(s, d)
          .join(broadcast(natr), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("r_name").as("cust_bloc"))
        lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >=
              lit("1996-01-01").cast("date") &&
            col("l_shipdate").cast("date") <
              lit("1998-01-01").cast("date"))
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate").cast("date")).cast("long")
              .as("l_year"),
            revE8.as("rev_e8"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cus, col("o_custkey") === col("c_custkey"))
          .filter(col("supp_bloc") =!= col("cust_bloc"))
          .groupBy(col("supp_bloc"), col("cust_bloc"), col("l_year"))
          .agg(sum(col("rev_e8").cast("decimal(38,0)")).cast("long")
              .as("revenue_e8"),
            count(lit(1)).as("n_rows"))
          .orderBy("supp_bloc", "cust_bloc", "l_year")
      },
      oracle = Some(s"""
        WITH natr AS (SELECT n_nationkey, r_name
          FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name IN ('ASIA', 'EUROPE'))
        SELECT sn.r_name AS supp_bloc, cn.r_name AS cust_bloc,
          CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS l_year,
          CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS revenue_e8,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN natr sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN natr cn ON c_nationkey = cn.n_nationkey
        WHERE sn.r_name <> cn.r_name
          AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ------------------------------------------------------------------
    // q232 — TPC-H Q8: market share (the share-of-rollup class). The
    // nested per-year "sum(case)/sum(all)" becomes ONE conditional
    // aggregate — numerator and denominator in the same groupBy, share
    // on the ppm lattice through decimal128 (numerator e8·10^6 tops
    // 10^22 at sf0.1). Bloc membership (EUROPE suppliers inside the
    // AMERICA-customer ECONOMY market) is a broadcast flag, not a
    // second pass.
    // ------------------------------------------------------------------
    "q232_market_share" -> GraftQuery(
      build = (s, d) => {
        val amer = customer(s, d)
          .join(broadcast(nation(s, d)
            .join(broadcast(region(s, d)
              .filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val supEur = supplier(s, d)
          .join(broadcast(nation(s, d).select(col("n_nationkey"),
            col("n_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"),
            (col("n_regionkey") === 3).as("is_eur"))
        lineitem(s, d)
          .join(broadcast(part(s, d)
            .filter(col("p_type") === "ECONOMY")
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_suppkey"), revE8.as("rev_e8"))
          .join(orders(s, d).select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate").cast("date")).cast("long")
              .as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .join(amer, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supEur), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("o_year"))
          .agg(sum(when(col("is_eur"), col("rev_e8")).otherwise(0L)
              .cast("decimal(38,0)")).as("eur_dec"),
            sum(col("rev_e8").cast("decimal(38,0)")).as("tot_dec"))
          .select(col("o_year"),
            col("eur_dec").cast("long").as("eur_rev_e8"),
            col("tot_dec").cast("long").as("total_rev_e8"),
            expr("cast((eur_dec * 1000000) div tot_dec as bigint)")
              .as("share_ppm"))
          .orderBy("o_year")
      },
      oracle = Some(s"""
        WITH amer AS (SELECT c_custkey
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'AMERICA')
        SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
          CAST(sum(CASE WHEN n_regionkey = 3
            THEN CAST($RevE8 AS HUGEINT) ELSE 0 END) AS BIGINT)
            AS eur_rev_e8,
          CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS total_rev_e8,
          CAST((sum(CASE WHEN n_regionkey = 3
              THEN CAST($RevE8 AS HUGEINT) ELSE 0 END) * 1000000)
            // sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS share_ppm
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN amer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_type = 'ECONOMY'
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q233 — TPC-H Q9: product-line profit by nation and year (the
    // profit-rollup class). With no partsupp, unit cost is the part's
    // retail price: profit_e8 = rev_e8 − retail_e4·qty·10^4 — can go
    // NEGATIVE per row, so the sum runs in decimal128 and both
    // engines' exact decimal summation makes sign irrelevant. Part
    // filter (name contains 'blue') and supplier→nation both
    // broadcast; the only corpus-sized shuffle is the orderkey join.
    // ------------------------------------------------------------------
    "q233_product_profit" -> GraftQuery(
      build = (s, d) => {
        val prt = part(s, d)
          .filter(col("p_name").contains("blue"))
          .select(col("p_partkey"),
            cents(col("p_retailprice")).as("retail_e4"))
        val sup = supplier(s, d)
          .join(broadcast(nation(s, d).select(col("n_nationkey"),
            col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        lineitem(s, d)
          .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (revE8 - col("retail_e4") *
              col("l_quantity").cast("long") * lit(10000L))
              .as("profit_e8"))
          .join(orders(s, d).select(col("o_orderkey"),
            year(col("o_orderdate").cast("date")).cast("long")
              .as("o_year")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("n_name"), col("o_year"))
          .agg(sum(col("profit_e8").cast("decimal(38,0)")).cast("long")
              .as("profit_e8"),
            count(lit(1)).as("n_rows"))
          .orderBy("n_name", "o_year")
      },
      oracle = Some(s"""
        SELECT n_name,
          CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
          CAST(sum(CAST($RevE8
            - CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 10000
                AS BIGINT) * CAST(l_quantity AS BIGINT) * 10000
            AS HUGEINT)) AS BIGINT) AS profit_e8,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE contains(p_name, 'blue')
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ------------------------------------------------------------------
    // q234 — TPC-H Q10: returned-item losers (top-k customers by lost
    // revenue). The scale discipline: aggregate to the custkey BEFORE
    // joining customer/nation — revenue collapses on the fact side, so
    // the customer table joins a customer-count-sized frame, and the
    // top-20 runs as TakeOrderedAndProject, never a full sort.
    // ------------------------------------------------------------------
    "q234_returned_item_losers" -> GraftQuery(
      build = (s, d) => {
        val ord = orders(s, d)
          .filter(col("o_orderdate").cast("date") >=
              lit("1996-01-01").cast("date") &&
            col("o_orderdate").cast("date") <
              lit("1996-04-01").cast("date"))
          .select(col("o_orderkey"), col("o_custkey"))
        lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), revE8.as("rev_e8"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("rev_e8").cast("decimal(38,0)")).cast("long")
            .as("revenue_e8"))
          .join(customer(s, d).select(col("c_custkey"), col("c_name"),
            col("c_nationkey"), cents(col("c_acctbal")).as("bal_e4")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation(s, d).select(col("n_nationkey"),
            col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("bal_e4"),
            col("n_name"), col("revenue_e8"))
          .orderBy(col("revenue_e8").desc, col("c_custkey"))
          .limit(20)
      },
      oracle = Some(s"""
        WITH agg AS (SELECT o_custkey,
            CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS revenue_e8
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
            AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
            AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
          GROUP BY 1)
        SELECT c_custkey, c_name,
          CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)
            AS bal_e4,
          n_name, revenue_e8
        FROM agg JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue_e8 DESC, c_custkey LIMIT 20""")),

    // ------------------------------------------------------------------
    // q235 — TPC-H Q11: important stock (group-sum vs a scalar derived
    // from the SAME frame). Part value = e4 extendedprice summed over
    // ASIA-supplier lineitems; the classic 0.0001/SF fraction is
    // scale-variant (probed EMPTY at sf0.01), so the threshold is
    // 1.5x the average part value — value·np·2 > total·3 entirely in
    // decimal128. One corpus aggregate, one 1-row totals broadcast
    // (PlanAuditSpec-allowlisted BroadcastNestedLoopJoin, the
    // q217/q218 scalar pattern).
    // ------------------------------------------------------------------
    "q235_important_stock" -> GraftQuery(
      build = (s, d) => {
        val asia = supplier(s, d)
          .join(broadcast(nation(s, d)
            .join(broadcast(region(s, d)
              .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val value = lineitem(s, d)
          .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("l_partkey"))
          .agg(sum(cents(col("l_extendedprice")).cast("decimal(38,0)"))
            .cast("long").as("value_e4"))
        val tot = value
          .agg(sum(col("value_e4").cast("decimal(38,0)")).as("tv"),
            count(lit(1)).as("np"))
        value.crossJoin(broadcast(tot))
          .filter(col("value_e4").cast("decimal(38,0)") * col("np") * 2 >
            col("tv") * 3)
          .select(col("l_partkey").as("p_partkey"), col("value_e4"))
          .orderBy(col("value_e4").desc, col("p_partkey"))
      },
      oracle = Some(s"""
        WITH val AS MATERIALIZED (SELECT l_partkey,
            CAST(sum(CAST($CExt AS HUGEINT)) AS BIGINT) AS value_e4
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA' GROUP BY 1),
        tot AS (SELECT sum(CAST(value_e4 AS HUGEINT)) AS tv,
            count(*) AS np
          FROM val)
        SELECT l_partkey AS p_partkey, value_e4
        FROM val, tot
        WHERE CAST(value_e4 AS HUGEINT) * np * 2 > tv * 3
        ORDER BY value_e4 DESC, p_partkey""")),

    // ------------------------------------------------------------------
    // q236 — TPC-H Q12: shipping-priority audit (the conditional-
    // aggregate class). "Shipmode" is this DDL's l_linestatus;
    // lateness is shipdate > orderdate + 60 days (the q227 calendar
    // arithmetic, identical cross-engine). The urgent/non-urgent split
    // is a CASE inside ONE aggregate — never two passes.
    // ------------------------------------------------------------------
    "q236_late_priority_by_status" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .select(col("l_orderkey"), col("l_linestatus"),
            col("l_shipdate").cast("date").as("sd"))
          .join(orders(s, d).select(col("o_orderkey"),
            col("o_orderdate").cast("date").as("od"),
            col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("sd") > date_add(col("od"), 60))
          .groupBy(col("l_linestatus"))
          .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              1L).otherwise(0L)).as("high_line_count"),
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
              0L).otherwise(1L)).as("low_line_count"))
          .orderBy("l_linestatus")
      },
      oracle = Some("""
        SELECT l_linestatus,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE CAST(l_shipdate AS DATE) >
          CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q237 — TPC-H Q14: promotion effect — the share-of-one-aggregate
    // class, numerator and denominator from the SAME pass (a CASE
    // aggregate), share on the ppm lattice through decimal128. The
    // month filter pushes to the scan; the part type map broadcasts.
    // ------------------------------------------------------------------
    "q237_promo_effect" -> GraftQuery(
      build = (s, d) => {
        lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >=
              lit("1996-09-01").cast("date") &&
            col("l_shipdate").cast("date") <
              lit("1996-10-01").cast("date"))
          .join(broadcast(part(s, d).select(col("p_partkey"),
            col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(sum(when(col("p_type") === "PROMO", revE8).otherwise(0L)
              .cast("decimal(38,0)")).as("promo_dec"),
            sum(revE8.cast("decimal(38,0)")).as("tot_dec"))
          .select(col("promo_dec").cast("long").as("promo_rev_e8"),
            col("tot_dec").cast("long").as("total_rev_e8"),
            expr("cast((promo_dec * 1000000) div tot_dec as bigint)")
              .as("promo_ppm"))
      },
      oracle = Some(s"""
        SELECT
          CAST(sum(CASE WHEN p_type = 'PROMO'
            THEN CAST($RevE8 AS HUGEINT) ELSE 0 END) AS BIGINT)
            AS promo_rev_e8,
          CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS total_rev_e8,
          CAST((sum(CASE WHEN p_type = 'PROMO'
              THEN CAST($RevE8 AS HUGEINT) ELSE 0 END) * 1000000)
            // sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS promo_ppm
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'""")),

    // ------------------------------------------------------------------
    // q238 — TPC-H Q16: supplier diversity per part segment (the
    // NOT-IN + distinct-count class). The supply relation is the
    // distinct (partkey, suppkey) frame; the NOT-IN "complaint"
    // exclusion (low-balance suppliers here — exact e4 compare) is a
    // broadcast ANTI join, and the distinct supplier count runs on the
    // already-distinct pair frame. Part filters broadcast.
    // ------------------------------------------------------------------
    "q238_supplier_diversity" -> GraftQuery(
      build = (s, d) => {
        val pairs = lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val excluded = supplier(s, d)
          .filter(cents(col("s_acctbal")) < 10000000L)
          .select(col("s_suppkey"))
        val prt = part(s, d)
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        pairs
          .join(broadcast(prt), col("l_partkey") === col("p_partkey"))
          .join(broadcast(excluded),
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"),
            col("p_type"), col("p_size"))
      },
      oracle = Some("""
        SELECT p_brand, p_type, p_size,
          CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
            WHERE CAST(CAST(s_acctbal AS DECIMAL(18,4)) * 10000
              AS BIGINT) < 10000000)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ------------------------------------------------------------------
    // q239 — TPC-H Q18: large-volume customers (the IN-over-grouped-
    // HAVING class). The IN subquery decorrelates into the qualifying
    // aggregate itself: group lineitem by orderkey, HAVING the sum —
    // the filtered frame IS the join input (threshold 300 probed: 5
    // orders at sf0.001, 473 at sf0.1), so orders/customer join a
    // handful of rows, never the fact table.
    // ------------------------------------------------------------------
    "q239_large_volume_customers" -> GraftQuery(
      build = (s, d) => {
        val qual = lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
          .filter(col("sum_qty") > 300L)
        qual
          .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(customer(s, d).select(col("c_custkey"), col("c_name")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            unix_millis(col("o_orderdate").cast("timestamp"))
              .as("o_orderdate_ms"),
            cents(col("o_totalprice")).as("total_price_e4"),
            col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
      },
      oracle = Some("""
        WITH qual AS (SELECT l_orderkey,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(l_quantity AS BIGINT)) > 300)
        SELECT c_custkey, c_name, o_orderkey,
          epoch_ms(o_orderdate) AS o_orderdate_ms,
          CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
            AS total_price_e4,
          sum_qty
        FROM qual JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY sum_qty DESC, o_orderkey""")),

    // ------------------------------------------------------------------
    // q240 — TPC-H Q19: the disjunctive-predicate join. The point of
    // the shape: an OR across three (brand, size-range, qty-range)
    // arms still executes as ONE equi-hash-join on partkey with the
    // disjunction as a residual filter — never three joins, never a
    // nested loop. Part map broadcasts; revenue on the e8 lattice.
    // ------------------------------------------------------------------
    "q240_disjunctive_revenue" -> GraftQuery(
      build = (s, d) => {
        val arm = (brand: String, szLo: Int, szHi: Int, qLo: Long,
            qHi: Long) =>
          col("p_brand") === brand &&
            col("p_size").between(szLo, szHi) &&
            col("qty").between(qLo, qHi)
        lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity").cast("long")
            .as("qty"), revE8.as("rev_e8"))
          .join(broadcast(part(s, d).select(col("p_partkey"),
            col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .filter(arm("Brand#12", 1, 15, 1L, 15L) ||
            arm("Brand#23", 1, 25, 10L, 30L) ||
            arm("Brand#34", 1, 35, 20L, 45L))
          .agg(sum(col("rev_e8").cast("decimal(38,0)")).cast("long")
              .as("revenue_e8"),
            count(lit(1)).as("n_rows"))
      },
      oracle = Some(s"""
        SELECT CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT)
            AS revenue_e8,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND CAST(l_quantity AS BIGINT) BETWEEN 1 AND 15)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
            AND CAST(l_quantity AS BIGINT) BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
            AND CAST(l_quantity AS BIGINT) BETWEEN 20 AND 45)""")),

    // ------------------------------------------------------------------
    // q241 — TPC-H Q20: excess-share suppliers (the nested-IN +
    // correlated-aggregate class). The innermost correlated agg ("half
    // of what this part shipped this year") decorrelates into the
    // per-part totals frame joined back by key; the part-name IN is a
    // broadcast semi; the outer supplier IN collapses to DISTINCT
    // suppkeys into a broadcast dim join. Share condition q·np > 2·tot
    // ("more than twice the average pair share") is scale-invariant —
    // the classic 50%-of-availability is not, with availability
    // derived from shipments (probed: 4 / 31 / 306 suppliers at the
    // three scales).
    // ------------------------------------------------------------------
    "q241_excess_share_suppliers" -> GraftQuery(
      build = (s, d) => {
        val pq = lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >=
              lit("1997-01-01").cast("date") &&
            col("l_shipdate").cast("date") <
              lit("1998-01-01").cast("date"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast("long")).as("q"))
        val pt = pq.groupBy(col("l_partkey"))
          .agg(sum(col("q")).as("tot"), count(lit(1)).as("np"))
          .withColumnRenamed("l_partkey", "tpk")
        pq
          .join(pt, col("l_partkey") === col("tpk"))
          .join(broadcast(part(s, d)
            .filter(col("p_name").startsWith("small"))
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"))
          .filter(col("q") * col("np") > col("tot") * 2)
          .select(col("l_suppkey")).distinct()
          .join(broadcast(supplier(s, d).select(col("s_suppkey"),
            col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"))
          .orderBy("s_suppkey")
      },
      oracle = Some("""
        WITH pq AS MATERIALIZED (SELECT l_partkey, l_suppkey,
            CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
          FROM lineitem
          WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
            AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
          GROUP BY 1, 2),
        pt AS (SELECT l_partkey AS tpk, CAST(sum(q) AS BIGINT) AS tot,
            count(*) AS np
          FROM pq GROUP BY 1),
        qual AS (SELECT DISTINCT l_suppkey
          FROM pq JOIN pt ON l_partkey = tpk
          JOIN part ON p_partkey = l_partkey
          WHERE starts_with(p_name, 'small') AND q * np > tot * 2)
        SELECT s_suppkey, s_name
        FROM qual JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // q242 — TPC-H Q3: shipping-priority top-10, the DataFrame twin of
    // q49's SQL-API form — and unlike q49's double revenue, this one
    // lands on the exact e8 lattice so the hash gate is bit-typed.
    // Segment filter broadcasts through the customer semi; both fact
    // filters push to their scans; the top-10 is TakeOrderedAndProject.
    // ------------------------------------------------------------------
    "q242_shipping_priority" -> GraftQuery(
      build = (s, d) => {
        val cust = customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = orders(s, d)
          .filter(col("o_orderdate").cast("date") <
            lit("1996-03-15").cast("date"))
          .select(col("o_orderkey"), col("o_custkey"),
            unix_millis(col("o_orderdate").cast("timestamp"))
              .as("o_orderdate_ms"))
          .join(cust, col("o_custkey") === col("c_custkey"))
        lineitem(s, d)
          .filter(col("l_shipdate").cast("date") >
            lit("1996-03-15").cast("date"))
          .select(col("l_orderkey"), revE8.as("rev_e8"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate_ms"))
          .agg(sum(col("rev_e8").cast("decimal(38,0)")).cast("long")
            .as("revenue_e8"))
          .orderBy(col("revenue_e8").desc, col("l_orderkey"))
          .limit(10)
      },
      oracle = Some(s"""
        SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
          CAST(sum(CAST($RevE8 AS HUGEINT)) AS BIGINT) AS revenue_e8
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND CAST(o_orderdate AS DATE) < DATE '1996-03-15'
          AND CAST(l_shipdate AS DATE) > DATE '1996-03-15'
        GROUP BY 1, 2
        ORDER BY revenue_e8 DESC, l_orderkey LIMIT 10"""))
  )
}
