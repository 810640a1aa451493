package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Market-basket association rules (the Apriori level-2 mining pass) —
 * the cross-sell / co-occurrence readout retail analytics runs on order
 * baskets, and a corpus pipeline runs on (document, source-tag) or
 * (session, feature) baskets: which pairs co-occur beyond chance, with
 * the directional strength a symmetric overlap score
 * ([[StatsOps.audienceOverlap]]) cannot express?
 *
 * Per surviving ordered pair A→B:
 *   support_ppm    ⌊10⁶·n_AB / N⌋       how common the pair is
 *   conf_ppm       ⌊10⁶·n_AB / n_A⌋     P(B | basket has A)
 *   lift_ppm       ⌊10⁶·n_AB·N / (n_A·n_B)⌋   >10⁶ ⇔ positive association
 * Confidence is the asymmetric half (A→B ≠ B→A whenever supports
 * differ); lift's n_AB·N product rides decimal128 so the statistic
 * survives any N without an overflow lottery.
 *
 * Apriori discipline at scale — thresholds are RELATIVE (ppm of N),
 * the textbook definition and the only kind that survives a data-size
 * change; both prunes bound real work:
 *  1. items below minItemSupPpm leave before any pair is formed (the
 *     Apriori monotonicity: no pair outlives its rarest item), via a
 *     join against the (item, n) support frame — co-hashed on item,
 *     broadcast when small;
 *  2. pairs are generated PER BASKET from its sorted surviving-item
 *     set (≤ C(|basket|, 2) each — basket size is bounded by domain
 *     reality, never corpus size), the [[StatsOps.audienceOverlap]]
 *     explode shape, not an |items|×|items| or basket×basket join;
 *  3. pairs below minPairSupPpm drop before the directional expansion
 *     doubles the frame.
 * Multiple copies of an item in one basket count once (set semantics —
 * dedup first); N is the distinct-basket count, computed in the same
 * pipeline and attached as a 1-row broadcast cross join.
 *
 * Output: (antecedent, consequent, n_ante, n_cons, n_both, n_baskets,
 * support_ppm, conf_ppm, lift_ppm), both directions of every
 * surviving pair.
 */
object AssociationRules {

  def basketRules(df: DataFrame, basketCol: String, itemCol: String,
      minItemSupPpm: Long, minPairSupPpm: Long): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // r17 note (guide §1.2, measured and kept AS-IS): `bi` has three
    // consumers, but they all read the SAME hash(b, i) distinct
    // exchange, which AQE's exchange reuse computes once; an eager
    // localCheckpoint was tried and REGRESSED (2.4 → 3.4 s at sf0.1) —
    // it serialized the overlapping broadcast-build jobs behind a
    // blocking materialization without removing any work.
    // r18 note (guide §2.5, tried and REVERTED): pinning the basket
    // grouping with a REPARTITION_BY_NUM spread the collect_set+Generate
    // stage from 6 to 32 tasks but DESTROYED the map-side partial
    // collect_set (the manual exchange satisfies the aggregate's
    // distribution, so it plans single-phase and ships raw (b, i) rows)
    // and exposed a ~450 ms FIXED per-task CPU cost in the interpreted
    // pair lambda (stage CPU 3.0 s @6 tasks → 14.3 s @32): wall ~1.05×
    // locally, shuffle bytes and total CPU strictly worse at scale.
    // The keepable fix was the codegen rewrite of the pair Generate
    // below, which removes that per-task interpretation cost instead.
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val totals = bi.agg(count_distinct(col("b")).as("n_baskets"))
    val itemSup = bi.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
      .crossJoin(broadcast(totals))
      .filter(dec(col("n_i")) * 1000000L >= dec(col("n_baskets")) * minItemSupPpm)
      .select(col("i"), col("n_i"))
    // r18 OPTIMIZATION (guide §1.2 per-task work — VERDICT r17 item 4):
    // the ordered-pair expansion was a nested `transform` + `flatten`
    // lambda — higher-order functions are CodegenFallback, so the whole
    // projection ran INTERPRETED (the engine-wide q115 array_intersect
    // lesson) with a measured ~450 ms per-task setup cost on top. The
    // same pair stream as two codegen'd Generates: posexplode anchors
    // the antecedent at each position, slice + explode emits every
    // later item — identical (ia, ib) multiset (slice start pos+2 is
    // 1-based "everything after ia"; overlong length clamps), no lambda
    // anywhere, and the per-basket C(|basket|,2) bound is unchanged.
    val pairs = bi
      .join(itemSup.select(col("i")), Seq("i"), "left_semi")
      .groupBy(col("b")).agg(array_sort(collect_set(col("i"))).as("items"))
      .select(col("items"), posexplode(col("items")))
      .select(col("col").as("ia"),
        explode(slice(col("items"), col("pos") + lit(2),
          size(col("items")))).as("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("n_ab"))
      .crossJoin(broadcast(totals))
      .filter(dec(col("n_ab")) * 1000000L >= dec(col("n_baskets")) * minPairSupPpm)
    val directional = pairs.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("n_ab"), col("n_baskets"))
      .union(pairs.select(col("ib"), col("ia"), col("n_ab"),
        col("n_baskets")))
    directional
      .join(broadcast(itemSup.select(col("i").as("antecedent"),
        col("n_i").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(itemSup.select(col("i").as("consequent"),
        col("n_i").as("n_cons"))), Seq("consequent"))
      .select(col("antecedent"), col("consequent"), col("n_ante"),
        col("n_cons"), col("n_ab").as("n_both"), col("n_baskets"),
        expr("(1000000L * n_both) div n_baskets").as("support_ppm"),
        expr("(1000000L * n_both) div n_ante").as("conf_ppm"),
        // IntegralDivide over decimal128 operands: exact products, one
        // trunc-div (≡ floor here — everything is positive), long out
        expr("(cast(1000000 as decimal(38,0)) * n_both * n_baskets) div " +
          "(cast(n_ante as decimal(38,0)) * n_cons)").as("lift_ppm"))
  }
}
