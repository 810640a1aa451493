package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distribution statistics over big fact tables: equi-width histograms,
 * integer-exact z-score outlier detection, and single-pass column
 * profiling. These are the "look at the data before training on it"
 * operators of a corpus pipeline — and the inputs to skew handling
 * (SkewOps) and quality filtering (TextAnalysis).
 *
 * Scale shapes:
 *  - histogram: one map-side-combined aggregate on a computed bucket id —
 *    the classic distributive aggregation, no sort, no window;
 *  - z-score: group stats are a tiny aggregate (|groups| rows) joined
 *    back broadcast — the fact table is scanned twice but shuffled never
 *    (stats shuffle |groups| rows; the flag join is broadcast);
 *  - profile: ALL columns' stats in ONE Aggregate pass (Spark plans the
 *    multi-distinct via Expand: one scan, one shuffle), then a constant-
 *    size reshape to rows — vs the naive per-column scan loop that reads
 *    a 100 TB table once per column.
 *
 * Every statistic is integer or decimal arithmetic — bit-identical
 * across engines and partitionings, so each operator hash-gates against
 * the DuckDB oracle (AnalyticsQueries q77/q78/q80).
 */
object StatsOps {

  /**
   * Equi-width histogram of an integral column: bucket i covers
   * [lo + i*width, lo + (i+1)*width), with under/overflow clamped into
   * the first/last bucket (SQL `width_bucket` edge semantics folded into
   * the clamp). Emits (bucket, n, lo_v, hi_v) — count plus the observed
   * min/max per bucket, which is what a query planner's stats collector
   * and a data-quality report both want.
   */
  def histogram(df: DataFrame, value: Column,
      lo: Long, width: Long, buckets: Int): DataFrame = {
    require(width > 0 && buckets > 0)
    val raw = TemporalOps.floorDiv(value - lo, lit(width))
    val b = least(greatest(raw, lit(0L)), lit(buckets - 1L))
    df.select(b.as("bucket"), value.as("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo_v"), max("v").as("hi_v"))
  }

  /**
   * Z-score outliers with NO floating point: |x - mean| > k·stddev is
   * algebraically identical to (n·x - s)² > k²·(n·ss - s²) where
   * s = Σx, ss = Σx² over the group — every term an exact integer, so
   * the flag is deterministic to the bit (a float-stddev implementation
   * flips rows sitting ON the threshold between engines). Sums are
   * DECIMAL(38,0): with cent-scale values the terms stay ~10 orders of
   * magnitude inside both decimal128 and DuckDB's HUGEINT.
   *
   * Input rows must have a non-null integral `value`; returns the input
   * plus an `is_outlier` flag — EVERY input row, including those whose
   * group column is null (they form their own group): the join back to
   * the stats row is null-safe, where a plain equality join would
   * silently drop null-group rows from a "returns the input plus a
   * flag" operator.
   */
  def zscoreFlags(df: DataFrame, group: String, value: String,
      k: Int): DataFrame = {
    val dec = col(value).cast("decimal(38,0)")
    val stats = df.groupBy(col(group))
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("zn"),
        sum(dec).as("zs"),
        sum(dec * dec).as("zss"))
      .withColumnRenamed(group, "__zg")
    df.join(broadcast(stats), col(group) <=> col("__zg"))
      .withColumn("is_outlier",
        (col("zn") * dec - col("zs")) * (col("zn") * dec - col("zs")) >
          lit(k.toLong * k) * (col("zn") * col("zss") - col("zs") * col("zs")))
      .drop("__zg", "zn", "zs", "zss")
  }

  /**
   * Robust per-group location/spread summary: exact MEDIAN and MAD
   * (median absolute deviation) with outlier counts at `|x − med| >
   * k·MAD` — the heavy-tail-safe twin of [[zscoreFlags]]: one extreme
   * value shifts mean and σ (masking itself from a z-test), while the
   * median/MAD pair is unmoved by up to 50% contamination.
   *
   * Determinism without fixed-point tricks: for INTEGRAL inputs the
   * interpolated median lives on the exact .5 grid and the MAD on the
   * exact .25 grid of IEEE doubles — both engines compute
   * lower + (upper − lower)/2 on exactly-representable integers, so
   * every statistic and every threshold comparison is bit-identical
   * (the same reason q78 needed the cross-multiplied integer form does
   * NOT apply: no sums of squares ever enter a float).
   *
   * Plan shape: exact medians need a per-group sort — two sort-aggregate
   * passes over (group, value) pairs plus a tiny broadcast join back;
   * the fact table itself never shuffles whole rows. At 100 TB the
   * drop-in scale path is `approx_percentile` (GK sketch, mergeable,
   * one pass) with this exact form as its small-SF correctness gate —
   * the q58 percentile discipline.
   */
  def robustStats(df: DataFrame, group: String, value: String,
      k: Int): DataFrame = {
    val meds = df.groupBy(col(group))
      .agg(median(col(value)).as("med"))
      .withColumnRenamed(group, "__rg")
    val dev = df.join(broadcast(meds), col(group) <=> col("__rg"))
      .withColumn("adev", abs(col(value) - col("med")))
    val mads = dev.groupBy(col(group))
      .agg(median(col("adev")).as("mad"))
      .withColumnRenamed(group, "__rm")
    dev.join(broadcast(mads), col(group) <=> col("__rm"))
      .groupBy(col(group))
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("adev") > lit(k.toLong) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /**
   * Grouped simple linear regression + correlation from EXACT sufficient
   * statistics: per group, one map-side-combined aggregate collects
   * (n, Σx, Σy, Σx², Σxy, Σy²) as decimal128, and slope / intercept /
   * correlation derive from the co-moment identities
   *
   *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
   *   intercept = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
   *   corr = cov_num / √(varx_num · vary_num)
   *
   * — the "distributed ML via sufficient statistics" move: a least-
   * squares fit over 100 TB is ONE aggregation pass, no iteration, no
   * gradient state; states from disjoint shards merge by addition (the
   * q81 IVM property), so the fit maintains incrementally too.
   *
   * Determinism: the built-in `covar_pop`/`corr`/`regr_slope` aggregates
   * accumulate FLOAT co-moments — partition-order-dependent in Spark
   * AND DuckDB — while integral inputs summed in decimal128 are exact in
   * any order. Slope/intercept are emitted in FLOOR milli-units via the
   * pmod identity (exact decimal pmod, then an exact integral divide);
   * corr is the one float emitted, computed by a fixed expression shape
   * over exactly-agreed operands (cast-of-exact-decimal, one multiply,
   * one correctly-rounded sqrt, one divide — bit-identical cross-engine).
   *
   * Caller keeps |x|,|y| small enough that n·Σxy stays well inside
   * decimal128 (dollar-scale y and cardinal x have ~15 orders of
   * headroom). Degenerate groups (constant x) emit null slope/intercept/
   * corr rather than a division error.
   */
  /**
   * Exact correlation in milli-units from decimal128 co-moment
   * numerators: sign(cov)·⌊√(((10⁶·|cov|) div varx)·|cov| div vary)⌋.
   * Cauchy–Schwarz (cov² ≤ varx·vary) keeps every stage inside
   * decimal128 and the radicand ≤ 10⁶ < 2⁵³, so the one sqrt is
   * exact-input and correctly rounded in BOTH engines — unlike
   * casting a > 2⁵³ co-moment to double, where DuckDB's
   * HUGEINT→DOUBLE is NOT correctly rounded (it splits into
   * upper·2⁶⁴ + lower and double-rounds): diff-fuzz seed 3311 caught
   * q98's vary_num = 25582605053599168403 casting one ulp apart
   * across engines. The staged-division lattice is magnitude-proof;
   * it is the same definition spearmanRho and kendallTauB use.
   */
  private def corrMilli(cov: String, varx: String, vary: String,
      out: String): Column =
    when(col(varx) > 0 && col(vary) > 0, expr(
      s"""cast(sign($cov) as bigint) * cast(floor(sqrt(cast(
           (((1000000 * abs($cov)) div $varx) * abs($cov)) div $vary
           as double))) as bigint)""")).as(out)

  def linearFit(df: DataFrame, group: String, x: String,
      y: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val xs = dec(col(x)); val ys = dec(col(y))
    df.groupBy(col(group))
      .agg(
        count(lit(1)).as("n"),
        sum(xs).as("sx"), sum(ys).as("sy"),
        sum(xs * xs).as("sxx"), sum(xs * ys).as("sxy"),
        sum(ys * ys).as("syy"))
      .withColumn("cov_num", dec(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx_num", dec(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary_num", dec(col("n")) * col("syy") - col("sy") * col("sy"))
      .withColumn("int_num", col("sy") * col("sxx") - col("sx") * col("sxy"))
      .select(
        col(group), col("n"),
        when(col("varx_num") =!= 0,
          expr("(1000 * cov_num - pmod(1000 * cov_num, varx_num))" +
            " div varx_num")).as("slope_milli"),
        when(col("varx_num") =!= 0,
          expr("(1000 * int_num - pmod(1000 * int_num, varx_num))" +
            " div varx_num")).as("intercept_milli"),
        corrMilli("cov_num", "varx_num", "vary_num", "corr_milli"))
  }

  /**
   * 2×2 chi-square independence test per group — the A/B-test primitive:
   * does binary factor `a` (cohort) predict binary outcome `b` within
   * each group? Emits the contingency counts, the chi² statistic in
   * exact floor micro-units via the closed 2×2 form
   *
   *   χ² = N·(n11·n22 − n12·n21)² / (r1·r2·c1·c2)
   *
   * and the α = 0.05 verdict (χ² ≥ 3.841459, one degree of freedom) as
   * an integer compare — every quantity derives from the four counts,
   * so the whole test is deterministic to the bit where a float
   * expected-frequency implementation flips verdicts sitting on the
   * threshold. Degenerate margins (an empty row/column) yield null
   * statistic, never a division error.
   *
   * Scale shape: ONE map-side-combined aggregate of four conditional
   * counts per group — the cheapest query in the engine's stats family;
   * the decimal128 arithmetic happens on |groups| rows. The counts
   * merge by addition, so the test maintains incrementally (q81 IVM).
   * Exactness envelope: N·d²·10⁶ must fit decimal128, and d reaches
   * N²/4 under perfect association — worst-case safe to N ≈ 4·10⁶ rows
   * per group (typical |d| ≪ N²/4 stretches much further); past the
   * envelope the statistic nulls out while the four counts (which ARE
   * the sufficient statistic and never overflow) still come out exact —
   * a 4-number driver-side computation finishes the job.
   */
  def chiSquare2x2(df: DataFrame, group: String, a: Column,
      b: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cnt = (p: Column) => sum(when(p, 1L).otherwise(0L))
    df.groupBy(col(group))
      .agg(
        cnt(a && b).as("n11"), cnt(a && !b).as("n12"),
        cnt(!a && b).as("n21"), cnt(!a && !b).as("n22"))
      .withColumn("den",
        dec(col("n11") + col("n12")) * dec(col("n21") + col("n22")) *
          dec(col("n11") + col("n21")) * dec(col("n12") + col("n22")))
      .withColumn("d",
        dec(col("n11")) * dec(col("n22")) - dec(col("n12")) * dec(col("n21")))
      .withColumn("chi2_micro",
        when(col("den") =!= 0, expr(
          "(1000000 * (n11 + n12 + n21 + n22) * (d * d)) div den")))
      .withColumn("significant_05",
        when(col("chi2_micro").isNotNull,
          (col("chi2_micro") >= 3841459L).cast("int")))
      .select(col(group), col("n11"), col("n12"), col("n21"), col("n22"),
        col("chi2_micro"), col("significant_05"))
  }

  /**
   * Equi-DEPTH histogram: `tiles` buckets of (near-)equal row count per
   * group, with each bucket's row count and observed value range — the
   * quantile-bucket twin of [[histogram]] (equi-width tells you where
   * the mass is; equi-depth tells you where the BOUNDARIES are — what a
   * range-partitioner, a query optimizer's histogram, and a feature
   * binner all want). `ntile` distributes remainders to the leading
   * buckets (SQL standard), and the (value, tie) order is total, so
   * bucket membership is deterministic to the row.
   *
   * Scale shape: exact ntile needs the per-group sort every keyed
   * window pays (one shuffle); at 100 TB the drop-in is
   * `approx_percentile` boundaries (GK sketch, one pass, mergeable) with
   * this exact form as its small-SF gate — the q58/q93 discipline.
   */
  def equiDepthHistogram(df: DataFrame, group: String, value: String,
      tie: String, tiles: Int): DataFrame = {
    require(tiles > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(col(value), col(tie))
    df.withColumn("tile", ntile(tiles).over(w).cast("long"))
      .groupBy(col(group), col("tile"))
      .agg(count(lit(1)).as("n"),
        min(col(value)).as("lo_v"), max(col(value)).as("hi_v"))
  }

  /**
   * Distribution-drift test between two dataset snapshots: bucket both
   * through the SAME equi-width [[histogram]] grid, then score each
   * bucket's contribution to the two-sample chi-square statistic
   *
   *   term_i = (o1_i·N2 − o2_i·N1)² / (N1·N2·(o1_i + o2_i))
   *
   * in exact floor micro-units — the training-data monitoring primitive
   * ("did yesterday's corpus look like today's?") that PSI answers with
   * a float `ln` lottery; the chi-square form is pure integer/decimal
   * arithmetic, deterministic to the bit. The STATISTIC IS DEFINED as
   * the sum of the per-bucket floored micro-terms (flooring then
   * summing, not summing then flooring) so both engines compute the
   * identical value; the definition under-counts the real χ² by at most
   * buckets·1e-6.
   *
   * Scale shape: two map-side-combined histogram aggregates (each
   * snapshot read once) joined on ≤ `buckets` rows; the totals window
   * runs on that bucket-count-sized frame, not on data. Empty buckets
   * on either side count zero; a bucket empty on BOTH sides contributes
   * null (no term).
   */
  def histogramDriftChi2(before: DataFrame, after: DataFrame,
      value: Column, lo: Long, width: Long, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val h1 = histogram(before, value, lo, width, buckets)
      .select(col("bucket"), col("n").as("n_before"))
    val h2 = histogram(after, value, lo, width, buckets)
      .select(col("bucket"), col("n").as("n_after"))
    // tiny frame (≤ buckets rows): the unpartitioned totals window is a
    // deliberate single-partition op on |buckets| rows, never on data
    val w = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    h1.join(h2, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
      .withColumn("n1", sum(col("n_before")).over(w))
      .withColumn("n2", sum(col("n_after")).over(w))
      .withColumn("d",
        dec(col("n_before")) * col("n2") - dec(col("n_after")) * col("n1"))
      // the denominator MUST multiply in decimal128 too: three long
      // factors wrap past 9.2e18 at ~3M-row snapshots under non-ANSI,
      // where the HUGEINT oracle stays exact — silent divergence
      .withColumn("dden",
        dec(col("n1")) * dec(col("n2")) *
          dec(col("n_before") + col("n_after")))
      .withColumn("chi2_term_micro",
        when(col("n_before") + col("n_after") > 0 &&
            col("n1") > 0 && col("n2") > 0,
          expr("(1000000 * (d * d)) div dden")))
      .select(col("bucket"), col("n_before"), col("n_after"),
        col("chi2_term_micro"))
  }

  /** Per-column profile spec: how to read one column as a comparable
    * canonical form — an integral `ord` (cents / epoch seconds / the
    * value itself) whose min/max stringify identically in any engine
    * (double min/max would drift on formatting, not value). */
  case class ProfileCol(name: String, ord: Column)

  /**
   * Table profile: for each spec'd column emit
   * (col_name, n_rows, n_null, n_distinct, min_v, max_v) — min/max as
   * strings of the canonical ord.
   *
   * Plan shape — per-column sub-aggregates unioned, NOT one Aggregate
   * with N `countDistinct`s: the multi-distinct rewrite Expands every
   * row once per distinct column (6× the rows) and, with string
   * min/max in the aggregation buffer (strings are not UnsafeRow-
   * mutable), every Aggregate in the chain degrades to SortAggregate
   * with full row sorts — measured 12× slower at sf0.1. Here each
   * column gets (a) a grouping-free global aggregate for
   * count/null/min/max (no grouping key ⇒ even SortAggregate sorts
   * nothing) and (b) a two-phase hash-aggregate `countDistinct`,
   * joined 1-row × 1-row. Columnar pruning makes total bytes read the
   * same as the single-pass form; no row multiplication, no sorts,
   * and the per-column branches schedule as independent stages.
   */
  def profile(df: DataFrame, cols: Seq[ProfileCol]): DataFrame = {
    val perCol = cols.map { c =>
      val base = df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(c.ord.isNull, 1L).otherwise(0L)).as("n_null"),
        min(c.ord).cast("string").as("min_v"),
        max(c.ord).cast("string").as("max_v"))
      val dist = df.agg(countDistinct(c.ord).as("n_distinct"))
      base.crossJoin(dist).select(
        lit(c.name).as("col_name"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_v"), col("max_v"))
    }
    perCol.reduce(_ unionAll _)
  }

  /**
   * Cluster/label agreement metrics — the quality readout for any
   * partitioning of labeled data (k-means cells, LSH buckets, topic
   * assignments vs. ground-truth labels): per cluster, the majority
   * label, its share (purity, ppm) and the Gini impurity (ppm). Both are
   * EXACT rationals of integer counts — unlike entropy, whose `ln` is a
   * cross-engine float lottery — so the output hash-gates: purity =
   * ⌊top·10⁶/n⌋, gini = 10⁶ − ⌊(Σ cntᵢ²)·10⁶/n²⌋.
   *
   * Scale shape: two stacked hash aggregates, (cluster, label) then
   * (cluster) — the second groups a prefix of the first's key, so AQE
   * reuses the exchange; nothing but (cluster, label, count) rows ever
   * shuffle. The squared sums run in DECIMAL(38,0): Σ cntᵢ² ≤ n² wraps a
   * long for clusters past ~3×10⁹ rows, and the ·10⁶ scaling long
   * before that. Majority tie-break: max count, then SMALLEST label
   * (max_by over (cnt, −label) — deterministic cross-engine).
   */
  def clusterPurity(df: DataFrame, clusterCol: String,
      labelCol: String): DataFrame = {
    val cl = df
      .groupBy(col(clusterCol).as("cluster"), col(labelCol).as("label"))
      .agg(count(lit(1)).as("cnt"))
    cl.groupBy("cluster")
      .agg(sum("cnt").cast("long").as("n_rows"),
        count(lit(1)).as("n_labels"),
        max("cnt").as("top_cnt"),
        max_by(col("label"), struct(col("cnt"), -col("label"))).as("top_label"),
        sum(col("cnt").cast("decimal(19,0)") * col("cnt")).as("sum_sq"))
      .select(col("cluster"), col("n_rows"), col("n_labels"),
        col("top_label"), col("top_cnt"),
        expr("(top_cnt * 1000000) div n_rows").as("purity_ppm"),
        expr("""1000000 - (cast(sum_sq as decimal(38,0)) * 1000000)
          div (cast(n_rows as decimal(38,0)) * n_rows)""").as("gini_ppm"))
  }

  /**
   * RFM (recency / frequency / monetary) segmentation — the behavioral
   * quartile code every customer/vehicle warehouse derives ("411 =
   * recent but rare and cheap"), and a stratification key for sampling
   * a corpus by contributor activity. Tile 1 is best on every axis
   * (most recent, most frequent, highest spend); `rfm_code` = r·100 +
   * f·10 + m.
   *
   * Determinism: every ntile orders by (metric, entity id) — a total
   * order, so tile boundaries are identical across engines and
   * partitionings (the q99 equi-depth discipline). Recency is measured
   * from a caller-supplied `asOfMs` reference stamp: "as of when" is an
   * INPUT of an RFM report, not a property of the data — and passing it
   * as a literal keeps the plan single-consumer (deriving it as
   * max(last_ms) would either re-aggregate the fact for a 1-row
   * broadcast or force a global window; an earlier draft paid exactly
   * that third exchange). Truncating `div` = floor since asOfMs must
   * be ≥ every activity stamp (violations would produce negative
   * recency with truncation ≠ floor — callers date reports after the
   * data they cover).
   *
   * Scale shape: the per-entity rollup is one map-side-combined
   * aggregate on (segment, entity); the three quartile windows share
   * ONE (segment)-keyed exchange over the AGGREGATED frame (entities,
   * not transactions — three sorts, one shuffle; asserted in the
   * spec). Windows are partitioned by segment — there is no global
   * single-partition sort anywhere.
   *
   * Input: transaction rows projected to (segCol, idCol, tMs — epoch
   * millis long, amtCol — integer fixed-point). Output: one row per
   * (segment, entity) with raw metrics, per-axis tiles, and the code.
   */
  def rfmSegments(tx: DataFrame, segCol: String, idCol: String,
      tMsCol: String, amtCol: String, tiles: Int, asOfMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(tiles > 0)
    val per = tx.groupBy(col(segCol).as("seg"), col(idCol).as("entity"))
      .agg(max(col(tMsCol)).as("last_ms"),
        count(lit(1)).as("frequency"),
        sum(col(amtCol)).as("monetary"))
    val wR = Window.partitionBy("seg").orderBy(col("recency_days"), col("entity"))
    val wF = Window.partitionBy("seg").orderBy(col("frequency").desc, col("entity"))
    val wM = Window.partitionBy("seg").orderBy(col("monetary").desc, col("entity"))
    per
      .withColumn("recency_days",
        expr(s"($asOfMs - last_ms) div 86400000"))
      .withColumn("r", ntile(tiles).over(wR).cast("long"))
      .withColumn("f", ntile(tiles).over(wF).cast("long"))
      .withColumn("m", ntile(tiles).over(wM).cast("long"))
      .select(col("seg"), col("entity"), col("recency_days"),
        col("frequency"), col("monetary"),
        (col("r") * 100 + col("f") * 10 + col("m")).as("rfm_code"))
  }

  /**
   * Kaplan-Meier survival curve in exact ppm — the churn/retention
   * readout ("what fraction of users survive past t, given censoring")
   * that a plain retention ratio gets wrong the moment observation
   * windows differ per subject: censored subjects leave the risk set
   * without counting as churn.
   *
   * THE ESTIMATOR IS DEFINED in sequential integer fixed-point: at each
   * death time t_k (ascending), S_k = ⌊S_{k−1}·(r_k − d_k) / r_k⌋ with
   * S_0 = 1,000,000 — flooring at every step, not once at the end, so
   * both engines walk the identical lattice (the q104 chi-square
   * discipline applied to a RECURRENCE; the float KM product is
   * order-sensitive). Each step under-counts true KM by < 1e-6·steps.
   * The fold is sequential by nature (non-associative flooring), so it
   * runs as an `aggregate` HOF over the cohort's death-time array —
   * CodegenFallback, but over |death times| rows per cohort (bounded by
   * the duration grid, ~10³), NEVER over subjects.
   *
   * Scale shape: subjects aggregate to (cohort, duration) counts first
   * (map-side combined — the 10⁹-subject table shuffles |cohorts×grid|
   * rows); the risk set r_k = n − Σ_{t<t_k} leavers comes from the two
   * windows sharing one cohort-keyed exchange; only death times enter
   * the fold array. Requires durations ≥ 0 (the -1 fold seed is a
   * sentinel below any real step).
   *
   * Input: one row per subject — (cohortCol, durCol integral duration
   * bucket, eventCol 1 = event observed / 0 = censored). Output: one
   * row per (cohort, death time): (cohort, t, n_risk, n_death,
   * surv_ppm), the step function S(t).
   */
  def kmSurvival(subjects: DataFrame, cohortCol: String, durCol: String,
      eventCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDur = subjects
      .groupBy(col(cohortCol).as("cohort"), col(durCol).cast("long").as("t"))
      .agg(count(lit(1)).as("n_all"),
        sum(col(eventCol).cast("long")).as("d"))
    val wTot = Window.partitionBy("cohort")
    val wPrev = Window.partitionBy("cohort").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val curve = byDur
      .withColumn("r",
        sum(col("n_all")).over(wTot) -
          coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .groupBy("cohort")
      .agg(array_sort(collect_list(struct(col("t"), col("r"), col("d"))))
        .as("steps"))
      .select(col("cohort"), explode(expr(
        """filter(
             aggregate(steps,
               array(named_struct('t', -1L, 'r', 1L, 'd', 0L, 's', 1000000L)),
               (acc, x) -> acc || array(named_struct(
                 't', x.t, 'r', x.r, 'd', x.d,
                 's', (element_at(acc, -1).s * (x.r - x.d)) div x.r))),
             a -> a.t >= 0L)""")).as("step"))
    curve.select(col("cohort"), col("step.t").as("t"),
      col("step.r").as("n_risk"), col("step.d").as("n_death"),
      col("step.s").as("surv_ppm"))
  }

  /**
   * Grouped weighted (lower) median: the smallest value whose cumulative
   * weight reaches half the group's total — the robust center for
   * importance-weighted data (token-weighted doc quality, quantity-
   * weighted price), where the plain median over rows answers the wrong
   * question. Integer weights only; the half-total comparison is the
   * exact integer form `2·cumw ≥ totw` (no division, no float).
   *
   * Scale shape, two-level — THE ROWS NEVER SHUFFLE ON THEIR VALUES.
   * The naive form (compress all rows to (group, value, Σw), one
   * cumulative window per group) shuffles the whole dataset keyed by
   * near-unique values and then sorts each group's full domain under
   * |groups|-way parallelism; this form's exchanges carry only
   * groups×buckets bucket sums plus the ≈1/buckets median-bucket
   * slice. At sf0.1 both measure ~2.1 s — the 4-stage plan sits on
   * this box's per-stage latency floor, so the shuffle-volume win is
   * invisible at 600k rows; it is the difference between "shuffle
   * 100 TB by price" and "shuffle kilobytes of bucket sums" at the
   * design scale:
   *  1. per (group, value-bucket) weight sums — map-side combining
   *     collapses each scan partition to ≤ groups×buckets rows before
   *     the shuffle, so the exchange carries bucket sums, not data;
   *  2. a running cum over the TINY per-group bucket table finds each
   *     group's MEDIAN BUCKET (first with 2·cum ≥ tot) and the weight
   *     below it;
   *  3. a second scan keeps only median-bucket rows (broadcast probe —
   *     ≈ 1/buckets of the data), compresses THAT slice by value, and
   *     walks it with the below-bucket offset. Buckets are value-order-
   *     preserving (v div width), so the in-bucket walk continues the
   *     global one exactly — the same decomposition as
   *     CorpusAssembly.curriculumOrder, and the single-window oracle
   *     formulation cross-checks it.
   * Row gate (identical on the oracle side, definitionally): rows with
   * w ≤ 0 or a NULL value are dropped BEFORE anything else — a
   * non-positive weight cannot move a lower median and a NULL value
   * carries no position on the value axis (keeping either would also
   * reopen the engines' NULLS FIRST/LAST ordering divergence). All-
   * dropped groups honestly disappear. `bucketWidth` trades bucket-
   * table size for the slice the exact pass re-reads.
   */
  def weightedMedian(df: DataFrame, group: String, value: String,
      weight: String, bucketWidth: Long = 1L << 40): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(bucketWidth > 0)
    val gated = df.filter(col(weight) > 0 && col(value).isNotNull)
    val bkt = TemporalOps.floorDiv(col(value), lit(bucketWidth))
    // per-group bucket table: running weight below each bucket
    val cumB = Window.partitionBy(group).orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val buckets = gated
      .groupBy(col(group), bkt.as("bkt"))
      .agg(sum(col(weight)).as("bw"))
      .withColumn("cumb", sum("bw").over(cumB))
      .withColumn("totw", sum("bw").over(Window.partitionBy(group)))
      // the group's median bucket: first with 2·cum ≥ tot
      .filter(col("cumb") * 2 >= col("totw"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(group).orderBy("bkt")))
      .filter(col("rn") === 1)
      .select(col(group).as("b_g"), col("bkt").as("b_bkt"),
        (col("cumb") - col("bw")).as("below"), col("totw"))
    // exact pass over ONLY the median bucket's slice of the data
    val cumV = Window.partitionBy(group).orderBy(value)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gated
      .join(broadcast(buckets),
        col(group) === col("b_g") && bkt === col("b_bkt"))
      .groupBy(col(group), col(value))
      .agg(sum(col(weight)).as("w"), max("below").as("below"),
        max("totw").as("totw"))
      .withColumn("cumw", col("below") + sum("w").over(cumV))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy(col(group))
      .agg(min(col(value)).as("w_median"),
        max(col("totw")).as("total_w"))
  }

  /**
   * Exact per-group Gini concentration — "how unequal is the spend /
   * how concentrated is the corpus on few sources", the inequality
   * readout behind data-mixing decisions (a 0.9-Gini source mix is a
   * deduplication smell) and revenue-concentration dashboards. Computed
   * from the rank-weighted form on integer units:
   *
   *   G = (2·Σ rankᵢ·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ),  ranks 1..n ascending
   *
   * emitted as floor-ppm. Ranks tie-break on the entity id, which does
   * NOT affect G: equal x at swapped ranks contribute identically, so
   * the statistic is total-order deterministic without being tie-
   * sensitive. The numerator is ≥ 0 by the rearrangement inequality
   * (ascending ranks maximize agreement), so truncating `div` is floor
   * here. All-long arithmetic: with cent-scale units, n·Σx stays ~4
   * orders inside Long.MaxValue at n = 10⁶ per group.
   *
   * Scale shape: one keyed exchange serves the rank window and the
   * group aggregate (same partitioning); input is the PRE-AGGREGATED
   * per-entity frame (entities × 1 row), never raw facts. Zero-total
   * groups (T = 0) yield a null gini, not a division error; negative
   * unit values are the caller's contract violation (Gini is defined on
   * nonnegative quantities) and left ungated to keep the formula
   * honest. The ppm numerator 10⁶·(2S − (n+1)T) wraps a long already
   * at gate scale (S ≈ n·T ≈ 2·10¹³ cents at sf0.01), so the final
   * expression rides decimal128 — DuckDB's BIGINT sums promote to
   * HUGEINT on their own, the q117 lesson.
   */
  def giniConcentration(df: DataFrame, group: String, unitCol: String,
      idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(col(unitCol), col(idCol))
    df.withColumn("rnk", row_number().over(w).cast("long"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n"), sum(col(unitCol)).as("total"),
        sum(col("rnk").cast("decimal(38,0)") *
          col(unitCol).cast("decimal(38,0)")).as("s"))
      .select(col(group), col("n"), col("total"),
        when(col("total") > 0, expr(
          """(cast(1000000 as decimal(38,0)) *
             (2 * s - (cast(n as decimal(38,0)) + 1) * total))
             div (cast(n as decimal(38,0)) * total)"""))
          .as("gini_ppm"))
  }

  /**
   * Two-dimensional Pareto frontier (skyline): the rows not dominated
   * under (minimize `x`, maximize `y`) — row A dominates B when
   * A.x ≤ B.x ∧ A.y ≥ B.y with at least one strict. The
   * cost/quality shortlist every procurement, model-selection and
   * data-mixing decision starts from; duplicates on both axes are
   * incomparable and BOTH kept.
   *
   * In 2-D the skyline is a sort problem, not the O(n²) dominance
   * anti-join: after ordering by x, a row survives iff its y strictly
   * exceeds every strictly-cheaper row's y AND no equal-x row beats
   * its y. Two window frames read both maxima exactly:
   * RANGE UNBOUNDED..−1 on x (the strictly-cheaper max, ties on x
   * correctly EXCLUDED by the range frame) and a partition-by-x max
   * (the equal-x max).
   *
   * Scale shape: a global ORDER BY x window is single-partition, so
   * running it raw on data would serialize. Two honest mitigations,
   * both used here: (1) the frontier input is an AGGREGATED frame
   * (per-entity stats, cardinality = |entities|, not |rows|); (2) a
   * distributed pre-prune first — per x-bucket local y-max, the tiny
   * per-bucket table gets the running max over CHEAPER buckets
   * broadcast back, and any row strictly below the max y of a strictly
   * cheaper bucket is provably dominated (that bucket's argmax has
   * x' < x, y' > y) and dropped before the exact single-partition
   * pass. The exact pass then sees only near-frontier survivors
   * (O(buckets + frontier), not O(n)). `bucketWidth` trades prune
   * sharpness for per-bucket table size.
   */
  def paretoFrontier2D(df: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // distributed pre-prune: max y of strictly cheaper buckets
    val bkt = df.groupBy(TemporalOps.floorDiv(col(xCol), lit(bucketWidth))
        .as("bx"))
      .agg(max(col(yCol)).as("by"))
      .withColumn("prev_by", max(col("by")).over(
        Window.orderBy("bx").rowsBetween(Window.unboundedPreceding, -1)))
      .filter(col("prev_by").isNotNull)
      .select(col("bx"), col("prev_by"))
    val pruned = df
      .join(broadcast(bkt),
        TemporalOps.floorDiv(col(xCol), lit(bucketWidth)) === col("bx"),
        "left")
      // y below a strictly-cheaper bucket's max ⇒ dominated for sure
      .filter(col("prev_by").isNull || col(yCol) >= col("prev_by"))
      .drop("bx", "prev_by")
    // exact pass on the survivors
    val cheaper = Window.orderBy(col(xCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val equalX = Window.partitionBy(col(xCol))
    pruned
      .withColumn("max_y_cheaper", max(col(yCol)).over(cheaper))
      .withColumn("max_y_equal", max(col(yCol)).over(equalX))
      .filter(
        (col("max_y_cheaper").isNull || col(yCol) > col("max_y_cheaper")) &&
          col(yCol) === col("max_y_equal"))
      .drop("max_y_cheaper", "max_y_equal")
  }

  /**
   * Largest-remainder proration: split an integer `total` per group over
   * members proportionally to a non-negative integer weight, producing
   * integer shares that sum EXACTLY to the total — budget allocation,
   * token-quota assignment across corpus sources, seat apportionment.
   * Hamilton's method: floor shares `(T·w) div W` first, then one extra
   * unit to the `r` members with the largest remainders `(T·w) mod W`,
   * ties broken by id so the result is a function of the data alone.
   *
   * The remainder count needs no second pass: summing T·w_i = base_i·W +
   * mod_i over a group gives T·W = W·Σbase + Σmod, so r = T − Σbase =
   * Σmod div W comes out of the SAME aggregate that computed W.
   *
   * Shape: one groupBy(group) (tiny output, broadcast back) + one per-
   * group rank window — both partitioned by the group key; nothing
   * global. Caller must keep T·max(w) inside Long (document the unit —
   * the q135 fixture prorates ppb over floor-dollar weights: ≤ 6·10^15).
   */
  def prorateLargestRemainder(df: DataFrame, group: String, idCol: String,
      weightCol: String, total: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = df.groupBy(col(group))
      .agg(sum(col(weightCol)).as("grp_w"))
    val based = df
      .join(broadcast(tot), group)
      .withColumn("base", expr(s"($total * $weightCol) div grp_w"))
      .withColumn("rem", expr(s"($total * $weightCol) % grp_w"))
    val byRem = Window.partitionBy(group)
      .orderBy(col("rem").desc, col(idCol))
    val wsum = Window.partitionBy(group)
    based
      .withColumn("rn", row_number().over(byRem).cast("long"))
      .withColumn("rem_sum", sum(col("rem")).over(wsum))
      .withColumn("extra_units", expr("rem_sum div grp_w"))
      .withColumn("alloc",
        col("base") + when(col("rn") <= col("extra_units"), 1L)
          .otherwise(0L))
      .drop("rn", "rem", "rem_sum", "extra_units")
  }

  /**
   * Rolling beta of a per-key series against a reference series, over a
   * trailing row window of pre-aggregated buckets: the co-movement
   * readout behind pairs monitoring, canary-vs-fleet metric drift and
   * feature/target leakage screens. Input is the already-bucketed frame
   * (key, bucket, x, m) — the caller aggregates raw facts to buckets
   * first, so the window runs over |keys|·|buckets| rows, never raw
   * data (the same "windows on aggregated frames" rule as OHLC/EWMA).
   *
   * beta = cov(x, m) / var(m) with both moments over the SAME trailing
   * window; with equal n the 1/n² factors cancel, so the exact integer
   * form is (n·Σxm − Σx·Σm) / (n·Σmm − (Σm)²). Emitted as floor-ppm
   * with an EXPLICIT sign split — Spark's `div` truncates toward zero
   * while DuckDB's `//` floors, so negative covariances would silently
   * diverge by one ulp between engines if divided directly.
   */
  def rollingBeta(buckets: DataFrame, key: String, bucketCol: String,
      xCol: String, mCol: String, windowRows: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(bucketCol))
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    buckets
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col(xCol)).over(w))
      .withColumn("sm", sum(col(mCol)).over(w))
      .withColumn("sxm", sum(col(xCol) * col(mCol)).over(w))
      .withColumn("smm", sum(col(mCol) * col(mCol)).over(w))
      .withColumn("cov_num", col("n") * col("sxm") - col("sx") * col("sm"))
      .withColumn("var_num", col("n") * col("smm") - col("sm") * col("sm"))
      .withColumn("beta_ppm",
        when(col("var_num") === 0L, lit(null).cast("long"))
          .when(col("cov_num") < 0L,
            -expr("(1000000L * -cov_num) div var_num"))
          .otherwise(expr("(1000000L * cov_num) div var_num")))
      .drop("sx", "sm", "sxm", "smm")
  }

  /**
   * Period-over-period report: each group's per-period value beside its
   * previous period and the floor-ppm relative change — the
   * week-over-week movers table every warehouse dashboard leads with.
   * Input is the PRE-AGGREGATED (group, period, value) frame (the
   * windows-on-aggregates rule); one group-keyed lag window, nothing
   * global. The ppm division sign-splits (Spark `div` truncates,
   * DuckDB `//` floors — see [[rollingBeta]]); a zero or absent
   * previous period yields null change, never a division error or a
   * fake 0. Contract: values are revenue-like (non-negative) — a
   * signed series has no meaningful relative change through zero.
   */
  def periodOverPeriod(agg: DataFrame, group: String, periodCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(group).orderBy(col(periodCol))
    agg
      .withColumn("prev", lag(col(valueCol), 1).over(w))
      .withColumn("delta", col(valueCol) - col("prev"))
      .withColumn("delta_ppm",
        when(col("prev").isNull || col("prev") === 0L,
          lit(null).cast("long"))
          .when(col("delta") < 0L, -expr("(1000000L * -delta) div prev"))
          .otherwise(expr("(1000000L * delta) div prev")))
  }

  /**
   * Audience-overlap matrix: for every pair of categories, how many ids
   * belong to both, with the Jaccard in floor-ppm — the
   * segment-cannibalization / corpus-source-overlap readout (two
   * "different" crawl sources sharing 80% of their documents is a dedup
   * smell upstream of any mixing decision).
   *
   * Shape: distinct (id, category) first (one shuffle, output ≤ rows),
   * then pairs are generated PER ID from its sorted category set — at
   * most C(|categories|, 2) per id, bounded by the category-domain size,
   * never an |ids|×|ids| self-join — and counted; per-category sizes are
   * a tiny aggregate broadcast back onto the pair frame.
   */
  def audienceOverlap(df: DataFrame, idCol: String,
      catCol: String): DataFrame = {
    val pairs = df.select(col(idCol).as("id"), col(catCol).as("cat"))
      .distinct()
      .groupBy("id").agg(array_sort(collect_set(col("cat"))).as("cats"))
      .select(explode(expr(
        """flatten(transform(cats, (a, i) ->
             transform(slice(cats, i + 2, size(cats)), b ->
               struct(a as cat_a, b as cat_b))))""")).as("p"))
      .groupBy(col("p.cat_a").as("cat_a"), col("p.cat_b").as("cat_b"))
      .agg(count(lit(1)).as("n_both"))
    val sizes = df.select(col(idCol).as("id"), col(catCol).as("cat"))
      .distinct()
      .groupBy("cat").agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(sizes.select(col("cat").as("cat_a"),
        col("n").as("n_a"))), "cat_a")
      .join(broadcast(sizes.select(col("cat").as("cat_b"),
        col("n").as("n_b"))), "cat_b")
      .withColumn("jaccard_ppm",
        expr("(1000000L * n_both) div (n_a + n_b - n_both)"))
      .select("cat_a", "cat_b", "n_a", "n_b", "n_both", "jaccard_ppm")
  }

  /**
   * Serial (lag-ℓ) correlation per group — the autocorrelation readout
   * that separates trending/seasonal series from noise (is today's
   * value informative about tomorrow's? about the same weekday next
   * week?), the feature-screening step before fitting any AR/seasonal
   * model, and the stationarity sanity check a forecast backtest
   * ([[TemporalOps.seasonalNaiveBacktest]]) pairs with.
   *
   * Defined as the Pearson correlation of the pair set
   * {(x_t, x_{t+ℓ})} for each ℓ ∈ 1..maxLag — the "sample ACF with
   * per-lag re-centering" variant, chosen over the fixed-overall-mean
   * textbook ACF because it is EXACTLY the [[linearFit]] sufficient-
   * statistics shape: each (group, lag) cell collects exact decimal128
   * co-moments (n, Σx, Σy, Σxy, Σx², Σy²) and emits acf_milli on the
   * [[corrMilli]] staged-division lattice — bit-identical cross-engine
   * at ANY magnitude, any partitioning (the float-accumulating
   * built-in `corr` is neither; a raw cast of > 2⁵³ numerators to
   * double is ulp-fragile, see [[corrMilli]]). Constant windows emit
   * null rather than 0/0.
   *
   * Scale shape: ONE keyed window (the per-group time sort every keyed
   * window op pays) emits all maxLag pair streams via `lead` at
   * offsets 1..maxLag — no self-joins, no re-sorts (lead at k reuses
   * the same sorted frame); then one map-side-combined aggregate on
   * (group, lag). Output is |groups|·maxLag rows. The series mean
   * shifting between the x- and y-windows at series edges is the
   * documented estimator choice, not drift: both engines compute the
   * identical pair set.
   */
  def lagCorrelation(df: DataFrame, group: String, tCol: String,
      tieCol: String, valueCol: String, maxLag: Int): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(tCol), col(tieCol))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val paired = df.select(
      col(group) +: col(valueCol).as("x") +:
        (1 to maxLag).map(l => lead(col(valueCol), l).over(w).as(s"y$l")): _*)
    val long = paired.select(col(group), col("x"),
      explode(array((1 to maxLag).map(l =>
        struct(lit(l).cast("long").as("lag"), col(s"y$l").as("y"))): _*))
        .as("p"))
      .select(col(group), col("p.lag").as("lag"), col("x"), col("p.y").as("y"))
      // both sides must drop nulls: a null x would still count into n
      // via count(lit(1)) while the decimal sums skip it, silently
      // corrupting the co-moments (|acf| could exceed 1)
      .filter(col("y").isNotNull && col("x").isNotNull)
    long
      .groupBy(col(group), col("lag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .withColumn("cov_num", dec(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx_num", dec(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary_num", dec(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col(group), col("lag"), col("n"),
        corrMilli("cov_num", "varx_num", "vary_num", "acf_milli"))
  }

  /**
   * Trimmed and winsorized statistics per group — the robust location
   * estimates between the raw mean (outlier-hostage) and the median
   * (throws away 98% of the data): drop (trimmed) or clamp
   * (winsorized) the tails beyond the [loPct, hiPct] discrete
   * percentile ranks, then average. The pair is the metrology
   * standard for latency/price/amount dashboards, and disagreement
   * between them is itself an outlier-mass signal.
   *
   * Everything is rank arithmetic on a total (value, tie) order — the
   * q139/q99 discrete-order-statistic discipline, no interpolated
   * floats: r_lo = ⌊n·loPct/100⌋, r_hi = ⌊n·hiPct/100⌋; trimmed keeps
   * ranks (r_lo, r_hi], winsor clamps to the values AT ranks r_lo+1
   * and r_hi; means are floor-divided integers. Callers pick loPct <
   * hiPct; groups smaller than the trim window emit null means rather
   * than inventing a statistic.
   *
   * Shape: one keyed rank window; the two bound values per group come
   * from rank-predicate conditional aggregates on the SAME ranked
   * frame and broadcast-join back for the winsor clamp; then one
   * map-side-combined aggregate. Facts shuffle once.
   */
  def trimmedStats(df: DataFrame, group: String, valueCol: String,
      tieCol: String, loPct: Int, hiPct: Int): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= loPct < hiPct <= 100, got [$loPct, $hiPct]")
    val w = Window.partitionBy(col(group))
    val ranked = df
      .withColumn("rn", row_number()
        .over(w.orderBy(col(valueCol), col(tieCol))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("r_lo", expr(s"n * $loPct div 100"))
      .withColumn("r_hi", expr(s"n * $hiPct div 100"))
    val bounds = ranked.groupBy(col(group))
      .agg(
        max(when(col("rn") === col("r_lo") + 1, col(valueCol)))
          .as("lo_v"),
        max(when(col("rn") === col("r_hi"), col(valueCol))).as("hi_v"))
    ranked
      .join(broadcast(bounds), Seq(group))
      .groupBy(col(group))
      .agg(
        max(col("n")).as("n"),
        sum(when(col("rn") > col("r_lo") && col("rn") <= col("r_hi"),
          col(valueCol))).as("t_sum"),
        coalesce(sum(when(col("rn") > col("r_lo") &&
          col("rn") <= col("r_hi"), 1L)), lit(0L)).as("trimmed_n"),
        sum(greatest(least(col(valueCol), col("hi_v")), col("lo_v")))
          .as("w_sum"),
        sum(col(valueCol)).as("raw_sum"),
        max(col("lo_v")).as("lo_v"), max(col("hi_v")).as("hi_v"))
      .select(col(group), col("n"), col("trimmed_n"), col("lo_v"),
        col("hi_v"),
        when(col("trimmed_n") > 0,
          floorDiv0(col("t_sum"), col("trimmed_n"))).as("trimmed_mean"),
        when(col("hi_v").isNotNull && col("lo_v").isNotNull,
          floorDiv0(col("w_sum"), col("n"))).as("winsorized_mean"),
        floorDiv0(col("raw_sum"), col("n")).as("raw_mean"))
  }

  /** [[TemporalOps.floorDiv]] re-exposed for this file's signed means
    * (values may be negative; Spark div truncates, DuckDB // floors). */
  private def floorDiv0(a: Column, b: Column): Column =
    TemporalOps.floorDiv(a, b)

  /**
   * Per-group feature scaling — the two normalizations every tabular
   * feature pipeline applies before a model sees a raw amount, both in
   * the engine's exact ppm lattice:
   *   minmax_ppm  ⌊10⁶·(v − min) / (max − min)⌋  (range position)
   *   cdf_ppm     ⌊10⁶·(rank − 1) / (n − 1)⌋     (quantile transform)
   * The CDF uses `rank()` (min rank of equal values), so ties map to
   * ONE value — the property that makes the quantile transform
   * monotone and engine-order-independent (row_number would scatter
   * equal inputs across distinct outputs by shuffle luck). Degenerate
   * groups (constant value, or a single row) null both columns — a
   * scale-free feature has no position in its range.
   *
   * Shape: ONE keyed window partitioning serves min/max/count (frame
   * aggregates) and rank (ordered) — facts shuffle once; output is
   * row-level BY DESIGN (this is a per-row transform, not a rollup),
   * so callers bound what they materialize downstream.
   */
  /**
   * Leave-one-out target encoding — the category→number feature a
   * gradient-boosted model consumes, computed WITHOUT label leakage:
   * each row's encoding is its category's mean target EXCLUDING the
   * row itself, (Σ_cat − v) / (n_cat − 1), plus the smoothed variant
   * (Σ_cat − v + m·μ_global) / (n_cat − 1 + m) that shrinks rare
   * categories toward the global mean (m = pseudo-observations). Plain
   * per-category mean encoding leaks the row's own label into its
   * feature — the classic silent overfit this operator exists to
   * avoid; every mean here is an exact floor-divided integer (pmod
   * identity — targets may be negative), so the encoding is
   * reproducible to the bit across engines and reruns (a float
   * encoding varies by summation order, and trees split on exact
   * thresholds).
   *
   * Shape: one category-keyed window provides (Σ, n); the global mean
   * is a 1-row broadcast (μ floor-divided ONCE, then reused — the
   * smoothed form is defined on the floored μ so both engines walk
   * the same lattice). Singleton categories null the LOO encoding
   * (no other rows to learn from) while the smoothed one falls back
   * to μ_global — exactly the shrinkage behavior the variant exists
   * for. Row-level output; callers bound the slice they materialize.
   */
  def targetEncoding(df: DataFrame, catCol: String, targetCol: String,
      tieCol: String, smoothing: Int): DataFrame = {
    require(smoothing >= 1, s"smoothing must be >= 1, got $smoothing")
    val byCat = Window.partitionBy(col(catCol))
    val glob = df.agg(sum(col(targetCol)).as("g_sum"),
      count(lit(1)).as("g_n"))
      .select(floorDiv0(col("g_sum"), col("g_n")).as("g_mean"))
    df
      .withColumn("c_sum", sum(col(targetCol)).over(byCat))
      .withColumn("c_n", count(lit(1)).over(byCat))
      .crossJoin(broadcast(glob))
      .select(col(catCol), col(tieCol), col(targetCol),
        when(col("c_n") > 1,
          floorDiv0(col("c_sum") - col(targetCol), col("c_n") - 1))
          .as("loo_mean"),
        floorDiv0(
          col("c_sum") - col(targetCol) + lit(smoothing.toLong) * col("g_mean"),
          col("c_n") - 1 + smoothing).as("smoothed_mean"))
  }

  /**
   * Lead-lag cross-correlation between two aligned series — "does x
   * LEAD y?": Pearson corr of {(x_t, y_{t+ℓ})} for ℓ ∈ [−L, L]; the
   * lag of the peak |corr| is the lead time (positive ℓ ⇒ x moves
   * first). The causality-screening step between q150's
   * self-correlation and any bivariate model — marketing spend vs
   * conversions, errors vs latency, clicks vs purchases.
   *
   * Same exact sufficient-statistics discipline as [[lagCorrelation]]
   * (decimal128 co-moments, one correctly-rounded sqrt/divide). The
   * pair streams come from an equi-join of the aligned frame to
   * itself on period+ℓ after a 2L+1-row lag explode — on the
   * PRE-AGGREGATED (period, x, y) frame this is |periods|·(2L+1)
   * rows, co-hashed on period; holes in either series drop that pair
   * (no zero-fill hallucination).
   */
  def leadLagCorrelation(aligned: DataFrame, periodCol: String,
      xCol: String, yCol: String, maxLag: Int): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val lags = (-maxLag to maxLag).map(l => lit(l.toLong))
    val xs = aligned.select(col(periodCol).as("p"), col(xCol).as("x"))
      .filter(col("x").isNotNull)
      .select(col("p"), col("x"), explode(array(lags: _*)).as("lag"))
    val ys = aligned.select(col(periodCol).as("py"), col(yCol).as("y"))
      .filter(col("y").isNotNull)
    xs.join(ys, col("p") + col("lag") === col("py"))
      .groupBy(col("lag"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("x"))).as("sx"), sum(dec(col("y"))).as("sy"),
        sum(dec(col("x")) * dec(col("x"))).as("sxx"),
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .withColumn("cov_num", dec(col("n")) * col("sxy") - col("sx") * col("sy"))
      .withColumn("varx_num", dec(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("vary_num", dec(col("n")) * col("syy") - col("sy") * col("sy"))
      .select(col("lag"), col("n"),
        corrMilli("cov_num", "varx_num", "vary_num", "xcorr_milli"))
  }

  /**
   * CUPED variance-reduced experiment readout (Deng et al. 2013) — the
   * standard trick that makes A/B tests decide in days instead of
   * weeks: subtract the part of the metric the PRE-experiment
   * covariate already predicts, y_adj = y − θ(x − x̄), shrinking
   * variance by the squared correlation without biasing the mean
   * (E[x − x̄] = 0 in both arms by randomization). θ comes from the
   * POOLED pre/post regression (the standard choice — per-arm θ leaks
   * the treatment into the adjustment).
   *
   * Exact lattice, engine-identical end to end: θ ships in FLOOR
   * milli-units from q98's co-moment identity (pmod floor — cov can
   * be negative); x̄ is the floored pooled mean; each adjusted value
   * is the exact long 1000·y − θ_milli·(x − x̄) and per-arm means
   * floor-divide. The variance-reduction readout compares exact
   * decimal128 co-moments of 1000·y vs y_adj in floor ppm — the
   * number that justifies the machinery (10⁶ = no help).
   *
   * Shape: one 1-row pooled-stats broadcast (θ, x̄) + one map-side
   * per-arm aggregate; the unit frame never shuffles twice. Degenerate
   * covariates (zero variance) fall back to θ = 0 — CUPED degrades to
   * the raw test, never an error.
   */
  def cupedAdjust(units: DataFrame, armCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val pooled = units.agg(
        count(lit(1)).as("pn"),
        sum(dec(col(xCol))).as("psx"), sum(dec(col(yCol))).as("psy"),
        sum(dec(col(xCol)) * dec(col(xCol))).as("psxx"),
        sum(dec(col(xCol)) * dec(col(yCol))).as("psxy"))
      .select(
        when(expr("pn * psxx - psx * psx") =!= 0,
          expr("(1000 * (pn * psxy - psx * psy) - " +
            "pmod(1000 * (pn * psxy - psx * psy), pn * psxx - psx * psx))" +
            " div (pn * psxx - psx * psx)")).otherwise(lit(0L))
          .as("theta_milli"),
        // x̄ stays in decimal — a long cast of psx would silently null
        // past ±2⁶³ and null every y_adj; the quotient (a mean of
        // long-ranged x) always fits the div's long result
        TemporalOps.floorDiv(col("psx"), col("pn").cast("decimal(38,0)"))
          .as("x_bar"))
    units
      .crossJoin(broadcast(pooled))
      .withColumn("y_adj",
        lit(1000L) * col(yCol) -
          col("theta_milli") * (col(xCol) - col("x_bar")))
      .groupBy(col(armCol))
      .agg(
        count(lit(1)).as("n"),
        max(col("theta_milli")).as("theta_milli"),
        sum(col(yCol)).as("sum_y"),
        sum(dec(lit(1000L) * col(yCol)) * dec(lit(1000L) * col(yCol)))
          .as("syy_m"),
        sum(col("y_adj")).as("sum_adj"),
        sum(dec(col("y_adj")) * dec(col("y_adj"))).as("saa"))
      .select(col(armCol), col("n"), col("theta_milli"),
        TemporalOps.floorDiv(col("sum_y"), col("n")).as("raw_mean"),
        TemporalOps.floorDiv(col("sum_adj"), col("n")).as("adj_mean_milli"),
        // 1000·sum_y squares in decimal128 from the first multiply — a
        // plain long 1000*sum_y wraps past sum_y ≈ 9.2·10¹⁵ (cents at
        // 100 TB reach that) before the decimal cast could save it
        when(expr("n * syy_m - (1000 * cast(sum_y as decimal(38,0))) * " +
            "(1000 * cast(sum_y as decimal(38,0)))") =!= 0,
          expr("((n * saa - cast(sum_adj as decimal(38,0)) * sum_adj) * 1000000) div " +
            "(n * syy_m - (1000 * cast(sum_y as decimal(38,0))) * " +
            "(1000 * cast(sum_y as decimal(38,0))))"))
          .as("var_ratio_ppm"))
  }

  /**
   * Bucket-prefix decomposition of a total (v DESC, tie ASC) order —
   * the q128 curriculumOrder machinery generalized so NOTHING in the
   * repo needs a single-partition window, not even over a bucket
   * table: rows bucket by an exact width-division of the descending
   * order value (equal values ALWAYS share a bucket, so every tie
   * stays inside one partitioned window), the per-bucket count/sum
   * table (≤ nBuckets+1 rows) gets EXCLUSIVE prefix offsets via a
   * triangular broadcast join (bk2 < bk — nBuckets² pairs of a tiny
   * frame, never data), and the offsets broadcast back. Then
   * global_rank = off_n + per-bucket row_number and global_cumsum =
   * off_s + per-bucket running sum — a pure re-association of the
   * same total order, bit-identical to the single-window formulation
   * the oracles keep.
   *
   * Input must carry `_v` decimal(38,0) (the order value, non-null);
   * it is localCheckpoint'ed here — the reduced frame feeds the
   * bounds probe, the bucket counts and the final join, and one
   * materialization beats three upstream re-aggregations. Envelope:
   * the value SPAN (max−min) must fit int64 (cents-scale revenue at
   * 100 TB ≈ 10¹⁸ — inside); bucket ids are exact integer div, so the
   * mapping is deterministic and monotone. All order values equal →
   * one bucket: a single order class has no parallel decomposition —
   * callers' value spread (revenue, model scores) buys the fan-out.
   *
   * Returns (pinned rows with `_bk`, offsets keyed `_bk` with
   * exclusive-prefix `_off_n` long and `_off_s` decimal(38,0)).
   */
  private[operators] def bucketPrefixOffsets(df: DataFrame,
      nBuckets: Int): (DataFrame, DataFrame) = {
    require(nBuckets >= 1 && nBuckets <= (1 << 16), s"nBuckets: $nBuckets")
    val pinned = df.localCheckpoint(true)
    val bounds = pinned.agg(min(col("_v")).as("_mn"), max(col("_v")).as("_mx"))
    val bucketed = pinned
      .crossJoin(broadcast(bounds))
      .withColumn("_bk",
        expr(s"(_mx - _v) div (((_mx - _mn) div $nBuckets) + 1)"))
      .drop("_mn", "_mx")
    val counts = bucketed.groupBy(col("_bk"))
      .agg(count(lit(1)).as("_bn"), sum(col("_v")).as("_bs"))
      .localCheckpoint(true)
    val offsets = counts
      .join(broadcast(counts.select(col("_bk").as("_bk2"),
          col("_bn").as("_bn2"), col("_bs").as("_bs2"))),
        col("_bk2") < col("_bk"), "left")
      .groupBy(col("_bk"))
      .agg(coalesce(sum(col("_bn2")), lit(0L)).as("_off_n"),
        coalesce(sum(col("_bs2")), lit(0L).cast("decimal(38,0)"))
          .as("_off_s"))
    (bucketed, offsets)
  }

  /**
   * Cumulative gains / lift table — the model-evaluation readout for a
   * targeting score ("if we contact the top k% by score, what share of
   * all converters do we capture?"): units rank into `tiles` equal
   * buckets by (score desc, id), and each bucket row carries the
   * CUMULATIVE conversion capture and the lift vs random targeting in
   * floor ppm (10⁶ = the model knows nothing). The q133 Lorenz/Gini
   * machinery pointed at a BINARY outcome — which is exactly what a
   * gains chart is.
   *
   * Exact: the tile IS ntile's (score desc, id) assignment, but
   * computed DISTRIBUTED — [[bucketPrefixOffsets]] gives every unit
   * its exact global rank r from a per-bucket window plus a broadcast
   * prefix offset, and the closed-form ntile arithmetic (first
   * N mod t tiles take ⌈N/t⌉ rows, the rest ⌊N/t⌋) maps r → tile with
   * no global window anywhere: not over units, and — via a
   * triangular self-join on the ≤ tiles-row tile table — not over the
   * tile cumsums either. Capture and lift are cross-multiplied
   * integer ratios (lift = cum_conv·N_units·10⁶ div
   * (cum_units·N_conv)) on decimal128. Zero total conversions null
   * the lift rather than dividing.
   */
  def cumulativeGains(units: DataFrame, idCol: String, scoreCol: String,
      convCol: String, tiles: Int, nBuckets: Int = 256): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    val (bucketed, offsets) = bucketPrefixOffsets(
      units.withColumn("_v", col(scoreCol).cast("decimal(38,0)")), nBuckets)
    val totals = bucketed.agg(count(lit(1)).as("t_units"),
      coalesce(sum(when(col(convCol), 1L)), lit(0L)).as("t_conv"))
    val byScoreInBk = Window.partitionBy(col("_bk"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val tiled = bucketed
      .join(broadcast(offsets), "_bk")
      .crossJoin(broadcast(totals))
      .withColumn("r", col("_off_n") + row_number().over(byScoreInBk))
      .withColumn("q", expr(s"t_units div $tiles"))
      .withColumn("rem", expr(s"t_units % $tiles"))
      .withColumn("tile",
        when(col("r") <= col("rem") * (col("q") + 1),
          expr("(r + q) div (q + 1)"))
          .otherwise(col("rem") +
            expr("(r - rem * (q + 1) + q - 1) div q")))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n_units"),
        coalesce(sum(when(col(convCol), 1L)), lit(0L)).as("n_conv"),
        max(col("t_units")).as("t_units"),
        max(col("t_conv")).as("t_conv"))
      .localCheckpoint(true)
    tiled
      .join(broadcast(tiled.select(col("tile").as("t2"),
          col("n_units").as("nu2"), col("n_conv").as("nc2"))),
        col("t2") <= col("tile"))
      .groupBy(col("tile"))
      .agg(max(col("n_units")).as("n_units"),
        max(col("n_conv")).as("n_conv"),
        sum(col("nu2")).as("cum_units"), sum(col("nc2")).as("cum_conv"),
        max(col("t_units")).as("t_units"),
        max(col("t_conv")).as("t_conv"))
      .select(col("tile"), col("n_units"), col("n_conv"),
        col("cum_units"), col("cum_conv"),
        when(col("t_conv") > 0,
          expr("(1000000L * cum_conv) div t_conv")).as("capture_ppm"),
        when(col("t_conv") > 0 && col("cum_units") > 0,
          expr("(cast(cum_conv as decimal(38,0)) * t_units * 1000000) " +
            "div (cast(cum_units as decimal(38,0)) * t_conv)"))
          .as("lift_ppm"))
  }

  /**
   * Per-group total-variation distance from the corpus-wide
   * distribution — the mixing guardrail "which source drifted": over a
   * shared bucketing, TV(p_s, p) = ½Σ_i |p_s(i) − p(i)| ∈ [0, 1] is
   * the largest probability mass any event can differ by — emitted in
   * floor ppm via the common-denominator form Σ|n_is·N − n_i·N_s|·10⁶
   * div (2·N_s·N) — EXACT integers, no per-bucket float division
   * (q104's χ² weights squared deviations by expectation; TV is the
   * worst-case-mass view, and both belong on a drift dashboard).
   *
   * Shape: one (group, bucket) count + one bucket-marginal count
   * (broadcast — bucket cardinality is the histogram's, tiny) + one
   * per-group sum; buckets a group never hits still contribute |0 −
   * n_i·N_s| through the bucket-marginal join (a LEFT join from the
   * marginal side — absence is drift, and dropping it understates TV).
   */
  def tvDistance(df: DataFrame, group: String,
      bucketCol: Column): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df.select(col(group).as("g"), bucketCol.as("b"))
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("n_gb"))
    val gTot = cells.groupBy(col("g")).agg(sum(col("n_gb")).as("n_g"))
    val bTot = cells.groupBy(col("b")).agg(sum(col("n_gb")).as("n_b"))
    val nTot = cells.agg(sum(col("n_gb")).as("n")).localCheckpoint(true)
    gTot
      .crossJoin(broadcast(bTot))
      .join(cells, Seq("g", "b"), "left")
      .withColumn("n_gb", coalesce(col("n_gb"), lit(0L)))
      .crossJoin(broadcast(nTot))
      .withColumn("num",
        abs(dec(col("n_gb")) * col("n") - dec(col("n_b")) * col("n_g")))
      .groupBy(col("g"))
      .agg(max(col("n_g")).as("n_rows"),
        expr("(sum(num) * 1000000) div (2 * max(cast(n_g as decimal(38,0))) * max(n))")
          .cast("long").as("tv_ppm"))
  }

  /**
   * ABC/XYZ classification — the inventory/catalog segmentation every
   * supply-chain and assortment team runs: ABC ranks items by revenue
   * share (A = the head that earns the first `aPpm` of cumulative
   * revenue, C = the long tail), XYZ by demand VARIABILITY (X =
   * steady, Z = erratic — the axis that decides safety stock and
   * forecastability). The cross matters: an AZ item is high-revenue
   * but unforecastable — the exact segment naive per-revenue planning
   * mishandles.
   *
   * Exactness: cumulative share is ⌊10⁶·cumsum/total⌋ over the TOTAL
   * (revenue desc, item) order with cumsum INCLUDING the current item;
   * variability is the exact squared coefficient of variation
   * cv² = (n·Σv² − (Σv)²)/(Σv)² in floor ppm on decimal128 — no
   * mean, no float variance. Zero-revenue items class C/Z with null
   * cv² (no scale to be variable against). Variability sees OBSERVED
   * buckets only — imputing absent periods as zero demand is a
   * gap-fill decision (q76), not a classifier default.
   *
   * Shape: facts reduce to (item, bucket, v) upstream; the cumulative
   * revenue share is then fully DISTRIBUTED via
   * [[bucketPrefixOffsets]] — items bucket by revenue range, the
   * running sum is a per-bucket window plus a broadcast prefix
   * offset, and no single-partition window exists anywhere in the
   * plan (the decomposition the r9 verdict asked to wire under the
   * q124 model-size boundary; a 10⁹-item catalog now just raises
   * nBuckets).
   */
  def abcXyz(buckets: DataFrame, itemCol: String, valueCol: String,
      aPpm: Long, bPpm: Long, xCv2Ppm: Long, yCv2Ppm: Long,
      nBuckets: Int = 256): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val per = buckets.groupBy(col(itemCol))
      .agg(count(lit(1)).as("n"),
        sum(dec(col(valueCol))).as("sv"),
        sum(dec(col(valueCol)) * dec(col(valueCol))).as("svv"))
    val (bucketed, offsets) = bucketPrefixOffsets(
      per.withColumn("_v", col("sv")), nBuckets)
    val total = bucketed.agg(sum(col("sv")).as("tot"))
    val byRevInBk = Window.partitionBy(col("_bk"))
      .orderBy(col("sv").desc, col(itemCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .join(broadcast(offsets), "_bk")
      .crossJoin(broadcast(total))
      .withColumn("cum", col("_off_s") + sum(col("sv")).over(byRevInBk))
      .select(col(itemCol),
        col("sv").cast("long").as("revenue"),
        expr("(cum * 1000000) div tot").as("cum_ppm"),
        when(col("sv") > 0,
          expr("((n * svv - sv * sv) * 1000000) div (sv * sv)"))
          .as("cv2_ppm"))
      .withColumn("abc",
        when(col("cum_ppm") <= aPpm, "A")
          .when(col("cum_ppm") <= bPpm, "B").otherwise("C"))
      .withColumn("xyz",
        when(col("cv2_ppm").isNull, "Z")
          .when(col("cv2_ppm") <= xCv2Ppm, "X")
          .when(col("cv2_ppm") <= yCv2Ppm, "Y").otherwise("Z"))
  }

  /**
   * Q-Q decile comparison between two groups' distributions — the
   * quantile-level view of distribution shift that q104's histogram χ²
   * summarizes to one number: per decile q, the two groups' EXACT
   * order statistics side by side, their gap, and the ratio in floor
   * ppm — where in the distribution do the populations diverge (a
   * tail-only gap and a uniform shift χ² can't tell apart). Discrete
   * order statistics on a total (value, tie) order (the q139/q156
   * pick: value at the smallest rank with rank·tiles ≥ n·q), never
   * interpolated floats.
   *
   * Shape: one rank window over the two filtered groups (partitioned
   * by group), rank-predicate picks aggregate to |tiles−1| rows per
   * group, and the two columns meet in a tiny conditional-aggregate
   * pivot. Ratio nulls when the B-side quantile is 0.
   */
  def qqCompare(df: DataFrame, group: String, valueCol: String,
      tieCol: String, groupA: String, groupB: String,
      tiles: Int): DataFrame = {
    require(tiles >= 2, s"tiles must be >= 2, got $tiles")
    val two = df.filter(col(group).isin(groupA, groupB))
    val w = Window.partitionBy(col(group))
    val ranked = two
      .withColumn("rn", row_number()
        .over(w.orderBy(col(valueCol), col(tieCol))).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
    val picks = ranked.select(col(group), col(valueCol),
        explode(array((1 until tiles).map(q => lit(q.toLong)): _*)).as("q"),
        col("rn"), col("n"))
      .filter(col("rn") * tiles >= col("n") * col("q") &&
        (col("rn") - 1) * tiles < col("n") * col("q"))
      .groupBy(col("q"), col(group))
      .agg(min(col(valueCol)).as("v"))
    picks.groupBy(col("q"))
      .agg(max(when(col(group) === groupA, col("v"))).as("q_a"),
        max(when(col(group) === groupB, col("v"))).as("q_b"))
      .select(col("q"), col("q_a"), col("q_b"),
        (col("q_a") - col("q_b")).as("gap"),
        when(col("q_b") > 0,
          expr("(1000000L * q_a) div q_b")).as("ratio_ppm"))
  }

  def featureScaling(df: DataFrame, group: String, valueCol: String,
      tieCol: String): DataFrame = {
    val byGrp = Window.partitionBy(col(group))
    val ordered = byGrp.orderBy(col(valueCol))
    df
      .withColumn("mn", min(col(valueCol)).over(byGrp))
      .withColumn("mx", max(col(valueCol)).over(byGrp))
      .withColumn("n", count(lit(1)).over(byGrp))
      .withColumn("rk", rank().over(ordered).cast("long"))
      .select(col(group), col(tieCol), col(valueCol),
        when(col("mx") =!= col("mn"),
          expr(s"(1000000L * ($valueCol - mn)) div (mx - mn)"))
          .as("minmax_ppm"),
        when(col("n") > 1, expr("(1000000L * (rk - 1)) div (n - 1)"))
          .as("cdf_ppm"))
  }

  /**
   * Cohen's κ inter-annotator agreement per group — the label-quality
   * gate every human- or model-annotated training set needs before its
   * labels are trusted: raw agreement overstates quality whenever the
   * label distribution is skewed (two raters stamping "ok" on 95% of
   * rows agree 90%+ by luck alone); κ subtracts exactly that
   * chance-agreement floor. κ = (p_o − p_e)/(1 − p_e) with
   * p_e = Σ_k r_k·c_k / n² — in the common-denominator integer form
   *
   *   κ_ppm = ⌊10⁶ · (n·agree − Σ_k r_k·c_k) / (n² − Σ_k r_k·c_k)⌋
   *
   * on decimal128 (n·agree and n² stay exact at any corpus size; κ can
   * be NEGATIVE — worse than chance — so the division is the total
   * [[TemporalOps.floorDiv]], oracle-matched by the pmod identity).
   * Degenerate groups (n² = Σ r_k·c_k: both raters constant) null κ —
   * there is no chance floor to beat. NULL labels are a real category
   * (an abstaining rater), handled null-safe end to end.
   *
   * Shape: ONE (group, label_a, label_b) confusion-matrix aggregate —
   * map-side-combined, output |groups|·|labels|² rows, the only pass
   * over data — localCheckpoint'ed and reduced three ways (totals, row
   * marginals, column marginals); the marginal join runs on
   * label-cardinality frames. Facts never shuffle twice.
   */
  def cohenKappa(df: DataFrame, group: String, aCol: String,
      bCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .groupBy(col(group).as("g"), col(aCol).as("la"), col(bCol).as("lb"))
      .agg(count(lit(1)).as("n_ab"))
      .localCheckpoint(true)
    val tot = cells.groupBy(col("g"))
      .agg(sum(col("n_ab")).as("n"),
        coalesce(sum(when(col("la") <=> col("lb"), col("n_ab"))), lit(0L))
          .as("agree"))
    val ra = cells.groupBy(col("g").as("gr"), col("la").as("k"))
      .agg(sum(col("n_ab")).as("r_k"))
    val cb = cells.groupBy(col("g").as("gc"), col("lb").as("k2"))
      .agg(sum(col("n_ab")).as("c_k"))
    val pe = ra
      .join(cb, col("gr") === col("gc") && col("k") <=> col("k2"))
      .groupBy(col("gr"))
      .agg(sum(dec(col("r_k")) * dec(col("c_k"))).as("pe"))
    tot
      .join(pe, col("g") === col("gr"), "left")
      .withColumn("pe", coalesce(col("pe"), lit(0L).cast("decimal(38,0)")))
      .select(col("g"), col("n"), col("agree"),
        when(dec(col("n")) * col("n") =!= col("pe"),
          TemporalOps.floorDiv(
            (dec(col("n")) * col("agree") - col("pe")) * 1000000L,
            dec(col("n")) * col("n") - col("pe")))
          .as("kappa_ppm"))
  }

  /**
   * Mann–Whitney U rank-sum test (tie-corrected) — "did sample A's
   * distribution shift vs sample B's", the nonparametric two-sample
   * readout that needs no normality assumption (the t-test machinery
   * q98/q173 lean on). Entirely in the counts-per-distinct-value
   * domain: per (cell, value) the two samples' counts (a, b) aggregate
   * map-side, and U needs only the cumulative count of B below each
   * value — never a per-row rank. 2U₁ = Σ_v a_v·(2·B_less(v) + b_v)
   * (the doubled form keeps half-ties integer), the tie term
   * T = Σ_v (t³ − t) feeds the exact variance, and the normal
   * approximation is a DEFINED integer lattice both engines replay:
   * rad = (3·10⁶·n(n−1)·(2U₁ − n₁n₂)²) div (n₁n₂·((n+1)n(n−1) − T)),
   * z_milli = sign(2U₁ − n₁n₂)·⌊√rad⌋ (rad < 2⁵³ so the double sqrt
   * is exact-input and correctly rounded in both engines; staged
   * truncation IS the definition — and the welchT family guard is
   * ENFORCED in-plan: a radicand at or beyond 2⁵³ emits null rather
   * than a silently double-rounded z). z > 0 ⇔ A stochastically
   * larger.
   *
   * Scale shape: one (cell, value) aggregate is the only corpus-sized
   * shuffle; the prefix window runs on the distinct-value frame
   * partitioned by cell — callers pass a BINNED value column when the
   * domain is continuous (the tie correction is exactly what makes a
   * rank test on binned data valid). Decimal envelope: cell sizes to
   * ~2.8·10⁵ rows keep the z numerator inside decimal128 (3·10⁶·
   * n(n−1)·(n₁n₂)² < 10³⁸); bigger cells need coarser cells, not a
   * wider type. Degenerate guards: an empty sample or an all-tied
   * cell (variance 0) emits null z, never a division error.
   */
  def mannWhitneyU(df: DataFrame, cellCol: String, groupCol: String,
      groupA: String, groupB: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val vc = df
      .filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .groupBy(col(cellCol).as("cell"), col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("b"))
    val w = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wv = vc.withColumn("b_less", coalesce(sum(col("b")).over(w),
      lit(0L)))
    wv.groupBy(col("cell"))
      .agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
        sum(dec(col("a")) * (dec(col("b_less")) * 2 + dec(col("b"))))
          .as("two_u_d"),
        sum(dec(col("a") + col("b")) * dec(col("a") + col("b")) *
          dec(col("a") + col("b")) - dec(col("a") + col("b")))
          .as("tie_t"))
      .withColumn("z_milli", expr(
        """CASE WHEN n_a > 0 AND n_b > 0
             AND cast(n_a + n_b + 1 as decimal(38,0)) * (n_a + n_b) *
               (n_a + n_b - 1) - tie_t > 0
           THEN cast(two_u_d - cast(n_a as decimal(38,0)) * n_b as
               decimal(38,0)) END"""))
      .withColumn("rad",
        when(col("z_milli").isNotNull, expr(
          """(z_milli * z_milli * 3000000 * (n_a + n_b) *
               (n_a + n_b - 1)) div
             (cast(n_a as decimal(38,0)) * n_b *
               (cast(n_a + n_b + 1 as decimal(38,0)) * (n_a + n_b) *
                 (n_a + n_b - 1) - tie_t))""")))
      .withColumn("z_milli",
        // the welchT family guard: a radicand at or beyond 2^53 emits
        // null rather than a silently double-rounded value
        when(col("rad").isNotNull && col("rad") < lit(9007199254740992L),
          expr("""cast(sign(z_milli) as bigint) *
            cast(floor(sqrt(cast(rad as double))) as bigint)""")))
      .select(col("cell"), col("n_a"), col("n_b"),
        col("two_u_d").cast("long").as("two_u"),
        col("tie_t").cast("long").as("tie_t"), col("z_milli"))
  }

  /**
   * Median absolute deviation — the robust scale estimate that a 2%
   * outlier cohort cannot move (the property stddev catastrophically
   * lacks; emitted side-by-side as `std_units` so the robustness gap
   * is READ, not asserted). Exact in the counts-per-distinct-value
   * domain: the lower median is the smallest value v with
   * 2·cum(v) ≥ n (a prefix window over DISTINCT values, never a
   * per-row sort), deviations |v − med| re-aggregate counts (two
   * values can fold onto one deviation), and MAD is the lower median
   * of that frame by the same rule. `std_units` is the defined
   * integer lattice floor(√((n·Σx² − (Σx)²) div n²)) — co-moments in
   * decimal128, the radicand < 2⁵³ when the per-cell value SPREAD is
   * ≤ ~10⁸ units (callers bin; the q98 discipline).
   *
   * Scale shape: two (cell, value)-grain aggregates are the only
   * corpus-sized shuffles; both median scans run on bounded distinct
   * frames and the per-cell medians broadcast back. Constant cells
   * emit mad = 0, std = 0 — never a division error.
   */
  def madScale(df: DataFrame, cellCol: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    def lowerMedian(counts: DataFrame, vCol: String): DataFrame = {
      val w = Window.partitionBy("cell").orderBy(vCol)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wt = Window.partitionBy("cell")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      counts
        .withColumn("cum", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(wt))
        .filter(col("cum") * 2 >= col("n"))
        .groupBy(col("cell"))
        .agg(min(col(vCol)).as("med"), first(col("n")).as("n"))
    }
    val vc = df.filter(col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"), col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"), col("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(dec(col("v"))).as("sx_part"),
        sum(dec(col("v")) * col("v")).as("sxx_part"))
    val med = lowerMedian(
      vc.select(col("cell"), col("v"), col("cnt")), "v")
    val moments = vc.groupBy(col("cell"))
      .agg(sum(dec(col("cnt"))).as("n"), sum(col("sx_part")).as("sx"),
        sum(col("sxx_part")).as("sxx"))
    val dev = vc.select(col("cell"), col("v"), col("cnt"))
      .join(broadcast(med.select(col("cell"), col("med"))), Seq("cell"))
      .groupBy(col("cell"), abs(col("v") - col("med")).as("d"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = lowerMedian(dev, "d")
      .select(col("cell"), col("med").as("mad"))
    med.select(col("cell"), col("n").cast("long").as("n"), col("med"))
      .join(mad, Seq("cell"))
      .join(moments.select(col("cell"), col("sx"), col("sxx")), Seq("cell"))
      .withColumn("std_units", expr(
        """cast(floor(sqrt(cast(
             (sxx * n - sx * sx) div (cast(n as decimal(38,0)) * n)
             as double))) as bigint)"""))
      .select(col("cell"), col("n"), col("med"), col("mad"),
        col("std_units"))
  }

  /**
   * Jensen–Shannon divergence on the exact Q20 log lattice — the
   * distribution-space drift readout that completes the divergence
   * family (q104 χ² weights rare-cell surprises, q175 TV reads mass
   * displacement; JS reads INFORMATION loss, is symmetric, and is
   * always finite even on disjoint supports — the standard "did this
   * corpus slice drift" number in LLM-pipeline hygiene). Every log is
   * the defined [[graft.functions.Log2Q20]] lattice, so the statistic
   * is integer-exact cross-engine: per key with slice counts (p, q)
   * and slice totals (P, Q), the ratio p̂/m̂ = 2pQ/(pQ+qP) turns each
   * KL term into p·(L(2pQ) − L(pQ+qP)) — pure int64 lattice calls —
   * and js_q20 = Σ_A div 2P + Σ_B div 2Q in Q20 bits (∈ [0, 2²⁰]);
   * identical distributions give EXACTLY 0 (2pQ = pQ+qP per key).
   *
   * Scale shape: one (cell, key) aggregate is the only corpus-sized
   * shuffle; totals ride a full-frame window on the bounded distinct-
   * key frame and the per-key lattice calls are codegen'd projections.
   * Envelope: slice counts ≤ 2³¹ keep every lattice argument < 2⁶³
   * (bigger slices: quantize keys or subsample — int64 is the lattice
   * contract, not decimal128). A cell with an empty slice emits null
   * js (KL against nothing is not 0), never a lattice error.
   */
  def jsDivergence(df: DataFrame, cellCol: String, groupCol: String,
      groupA: String, groupB: String, keyCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.LongType
    val lg = (c: Column) =>
      Bridge.column(graft.functions.Log2Q20(Bridge.expression(
        c.cast(LongType))))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val kc = df
      .filter(col(groupCol).isin(groupA, groupB) && col(keyCol).isNotNull)
      .groupBy(col(cellCol).as("cell"), col(keyCol).as("k"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("p"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("q"))
    val wt = Window.partitionBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    kc
      .withColumn("tp", sum(col("p")).over(wt))
      .withColumn("tq", sum(col("q")).over(wt))
      .withColumn("mix", col("p") * col("tq") + col("q") * col("tp"))
      .withColumn("ca", when(col("p") > 0 && col("tq") > 0,
        dec(col("p")) * (lg(col("p") * col("tq") * 2) - lg(col("mix"))))
        .otherwise(lit(0)))
      .withColumn("cb", when(col("q") > 0 && col("tp") > 0,
        dec(col("q")) * (lg(col("q") * col("tp") * 2) - lg(col("mix"))))
        .otherwise(lit(0)))
      .groupBy(col("cell"))
      .agg(first(col("tp")).as("n_a"), first(col("tq")).as("n_b"),
        count(lit(1)).as("n_keys"),
        sum(dec(col("ca"))).as("sa"), sum(dec(col("cb"))).as("sb"))
      .select(col("cell"), col("n_a"), col("n_b"), col("n_keys"),
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          """cast((sa div (2 * cast(n_a as decimal(38,0)))) +
               (sb div (2 * cast(n_b as decimal(38,0)))) as bigint)"""))
          .as("js_q20"))
  }

  /**
   * Markov transition fingerprint — the behavioral summary of an event
   * stream: the empirical transition matrix of consecutive per-user
   * states plus the stationary distribution it implies, the standard
   * "where does this process SPEND its time" readout that per-state
   * frequency counts can't give when sequences are short-windowed or
   * truncated. Everything is a defined ppm lattice: T_ppm(i,j) =
   * (n_ij·10⁶) div n_i·, π₀ is uniform with largest-remainder
   * apportionment (sums to exactly 10⁶), and `iters` synchronous
   * power steps apply π'(j) = Σ_i (π(i)·T_ppm(i,j)) div 10⁶ — the
   * per-term truncation IS the definition, replayed by the oracle as
   * `iters` chained CTEs, so the fixed-point is bit-identical
   * cross-engine (mass lost to truncation stays visible: Σπ < 10⁶ by
   * a few ppm, emitted rather than hidden by renormalization).
   *
   * Scale shape: ONE user-keyed lag window over the fact extracts
   * transitions (the q50/q116 session discipline); the matrix and π
   * frames are |states|²-bounded, so the iteration is `iters` tiny
   * broadcast joins — corpus cost is the single windowed pass.
   * The π₀ ranking runs on the ≤|states|-row frame (PlanAuditSpec
   * allowlists its global window).
   */
  def markovStationary(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stateCol: String, iters: Int = 16): DataFrame = {
    require(iters >= 1)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wSeq = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val pairs = df
      .select(col(stateCol).as("cur"),
        lag(col(stateCol), 1).over(wSeq).as("prev"))
      .filter(col("prev").isNotNull)
    // r18 OPTIMIZATION (guide §1.2): `trans` feeds BOTH the checkpointed
    // t_ppm matrix and `outTot`, and `outTot` is itself consumed twice
    // (inside tmat and again in the final dense join) — the second
    // consumer re-ran the corpus-sized lag window + pair aggregate end
    // to end. Materializing the |states|²-bounded `trans` once makes
    // the corpus window run exactly one time; everything downstream
    // derives from the tiny checkpointed frame.
    val trans = pairs.groupBy(col("prev"), col("cur"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // EAGER deliberately (r18 A/B: lazy 0.88x) —
                             // the downstream consumers are independent
                             // broadcast-build JOBS that race on an
                             // unpersisted frame and each recompute the
                             // corpus window; the lazy fusion only pays
                             // when one job deterministically
                             // materializes the frame first
    val outTot = trans.groupBy(col("prev")).agg(sum(col("n")).as("n_out"))
    // the matrix is read 16+ times (every power step + the self-loop
    // projection) — materialize once so the corpus-windowed subtree
    // runs a single time (the q67/q193 iteration discipline)
    val tmat = trans.join(broadcast(outTot), Seq("prev"))
      .select(col("prev"), col("cur"),
        expr("cast((cast(n as decimal(38,0)) * 1000000) div n_out " +
          "as bigint)").as("t_ppm"))
      .localCheckpoint(true)
    // r17 OPTIMIZATION (guide §1.2): `states` (≤ a handful of rows) is
    // consumed twice — the uniform-start vector and the final dense
    // join — and each consumption replayed the corpus-sized windowed
    // subtree feeding `df`. Materialize the distinct-state frame once.
    val states = df.select(col(stateCol).as("state")).distinct()
      .localCheckpoint(true)
    val nS = Window.orderBy("state")
    val cnt = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    var pi = states
      .withColumn("rk", row_number().over(nS).cast("long"))
      .withColumn("s_cnt", count(lit(1)).over(cnt))
      .select(col("state"),
        (expr("1000000 div s_cnt") +
          when(col("rk") <= expr("1000000 % s_cnt"), 1L).otherwise(0L))
          .as("pi_ppm"))
    for (_ <- 1 to iters)
      pi = tmat.join(broadcast(pi),
          tmat("prev") === pi("state"))
        .groupBy(col("cur").as("state"))
        .agg(expr("sum((cast(pi_ppm as decimal(38,0)) * t_ppm) " +
          "div 1000000)").cast("long").as("pi_ppm"))
        .select(col("state"), col("pi_ppm"))
    states
      .join(outTot.withColumnRenamed("prev", "state"), Seq("state"), "left")
      .join(tmat.filter(col("prev") === col("cur"))
        .select(col("prev").as("state"), col("t_ppm").as("self_ppm")),
        Seq("state"), "left")
      .join(pi, Seq("state"), "left")
      .select(col("state"), coalesce(col("n_out"), lit(0L)).as("n_out"),
        coalesce(col("self_ppm"), lit(0L)).as("self_ppm"),
        coalesce(col("pi_ppm"), lit(0L)).as("pi_ppm"))
  }

  /**
   * Expected calibration error — "when the model says 70%, is it right
   * 70% of the time", the deployment gate for any probabilistic
   * scorer (a model can have perfect AUC and be uselessly
   * miscalibrated). Exact in integers: scores arrive in ppm, each
   * equal-width bin accumulates conf_sum = Σ score_ppm and acc_sum =
   * 10⁶·Σ label (the SAME ppm·count units), the per-bin gap
   * |acc_sum − conf_sum| is an exact integer, ECE_ppm = Σ gaps div N
   * and MCE_ppm = max_b (gap_b div n_b) — no floating averages
   * anywhere, so the statistic hash-gates.
   *
   * Scale shape: ONE map-side-combined (cell, bin) aggregate is the
   * only corpus-sized shuffle; everything after runs on the ≤ nBins
   * frame. Empty cells cannot occur; a cell emits its bin count so a
   * thin cell's noisy ECE is readable as such.
   */
  def calibrationError(df: DataFrame, cellCol: String,
      scorePpmCol: String, labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val width = 1000000L / nBins
    df
      .filter(col(scorePpmCol).isNotNull && col(labelCol).isNotNull)
      .select(col(cellCol).as("cell"),
        least(expr(s"cast($scorePpmCol as bigint) div $width"),
          lit(nBins - 1L)).as("bin"),
        col(scorePpmCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("cell"), col("bin"))
      .agg(count(lit(1)).as("n_b"), sum(dec(col("s"))).as("conf_sum"),
        (sum(dec(col("y"))) * 1000000).as("acc_sum"))
      .withColumn("gap", abs(col("acc_sum") - col("conf_sum")))
      .groupBy(col("cell"))
      .agg(sum(col("n_b")).as("n"), count(lit(1)).as("n_bins"),
        expr("cast(sum(gap) div sum(cast(n_b as decimal(38,0))) " +
          "as bigint)").as("ece_ppm"),
        expr("cast(max(gap div cast(n_b as decimal(38,0))) as bigint)")
          .as("mce_ppm"))
  }

  /**
   * Kendall τ-b — concordance-based rank association, the third leg of
   * the dependence family (Pearson q98 = linear, Spearman q196 =
   * monotone-via-ranks, τ-b = pairwise concordance with full tie
   * correction — the variant of choice for heavily-tied binned data).
   * Exact in the contingency domain: concordant pairs C = Σ n_xy ·
   * G(x,y) where G = Σ_{x'<x, y'<y} n — and G computes via TWO CHAINED
   * prefix windows on the dense (x × y) grid per cell (first over y
   * within x, then over x within y), never a pairwise scan; discordant
   * D mirrors with a suffix window. Knight's O(n log n) algorithm is
   * inherently sequential — the grid double-prefix is its distributed
   * re-derivation, costing O(|X|·|Y|) bounded grid rows instead
   * (callers bin; the q195/q196 discipline). The binning contract is
   * ENFORCED in-plan (r11 verdict advisory #1): a scalar probe over
   * the distinct frames fails loudly — the q153 discipline — when any
   * cell's grid would exceed `maxGridCells`, instead of quietly
   * building an |X|·|Y| monster for an unbinned caller. τ_milli is
   * the Spearman staged-division lattice on num = C − D against the
   * tie-corrected denominators dx = N₀ − T_x, dy = N₀ − T_y (all
   * exact integers; τ-b ∈ [−1,1] keeps every stage in range).
   * Constant columns emit null, never a division error.
   */
  def kendallTauB(df: DataFrame, cellCol: String, xCol: String,
      yCol: String, maxGridCells: Long = 4000000L): DataFrame = {
    val (cxy, pair) = contingencyPairs(df, cellCol, xCol, yCol,
      maxGridCells, "kendallTauB")
    val tx = cxy.groupBy(col("cell"), col("x"))
      .agg(sum(col("nxy")).as("nx"))
      .groupBy(col("cell"))
      .agg(expr("cast(sum(cast(nx as decimal(38,0)) * (nx - 1)) div 2" +
        " as decimal(38,0))").as("tx"))
    val ty = cxy.groupBy(col("cell"), col("y"))
      .agg(sum(col("nxy")).as("ny"))
      .groupBy(col("cell"))
      .agg(expr("cast(sum(cast(ny as decimal(38,0)) * (ny - 1)) div 2" +
        " as decimal(38,0))").as("ty"))
    pair.join(tx, Seq("cell")).join(ty, Seq("cell"))
      .withColumn("n0", expr("cast((n * (n - 1)) div 2 as decimal(38,0))"))
      .withColumn("num", col("conc") - col("disc"))
      .withColumn("tau_milli", expr(
        """CASE WHEN n0 - tx > 0 AND n0 - ty > 0 THEN
             cast(sign(num) as bigint) * cast(floor(sqrt(cast(
               (((1000000 * abs(num)) div (n0 - tx)) * abs(num))
                 div (n0 - ty) as double))) as bigint) END"""))
      .select(col("cell"), col("n").cast("long").as("n"),
        col("conc").cast("long").as("conc"),
        col("disc").cast("long").as("disc"), col("tau_milli"))
  }

  /** Shared concordance core of [[kendallTauB]] and [[mannKendall]]:
    * the (cell, x, y) contingency aggregate plus the per-cell
    * (n, conc, disc) frame from the dense-grid double-prefix — and the
    * in-plan grid guard (scalar probe over the distinct frames, the
    * k-core/CC convergence-probe cost class) that fails loudly when an
    * unbinned caller would build an |X|·|Y| monster. */
  private def contingencyPairs(df: DataFrame, cellCol: String,
      xCol: String, yCol: String, maxGridCells: Long,
      opName: String): (DataFrame, DataFrame) = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // one materialization serves the guard probe, both marginal
    // re-aggregates and the grid join (the q189 rule — without it the
    // corpus-sized contingency aggregate recomputes five times).
    // r17 OPTIMIZATION (guide §2.5 — stragglers): the checkpoint used
    // to materialize with whatever partition count AQE's coalescing
    // left on the aggregate (ONE partition at bench scale), and a
    // single-partition RDD satisfies every downstream distribution
    // requirement — so no exchange was ever inserted and the dense
    // grid + both window passes ran SERIALLY in one task (measured:
    // a 2.15 s single-task stage inside q205's 4.5 s). Repartitioning
    // to the session default parallelism before the checkpoint keeps
    // the downstream grid/window work parallel; the frame is bounded
    // by the maxGridCells guard below, so defaultParallelism-sized
    // partitions are right at any scale, and the count comes from the
    // session (local[N] / cluster), never a constant.
    val cxy = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(cellCol).as("cell"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
      .groupBy(col("cell"), col("x"), col("y"))
      .agg(count(lit(1)).as("nxy"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism,
        col("cell"), col("x"))
      .localCheckpoint(true)
    // dx is the STREAM side of the dense-grid build below; routing its
    // distinct through an explicit repartition-by-num pins the grid
    // build's parallelism (see the grid comment below — an
    // ENSURE_REQUIREMENTS exchange here gets byte-coalesced to one
    // task and serializes the whole grid+window pipeline).
    val np0 = df.sparkSession.sparkContext.defaultParallelism
    val dx = cxy.select(col("cell"), col("x"))
      .repartition(np0, col("cell"), col("x")).distinct()
    val dy = cxy.select(col("cell"), col("y")).distinct()
    val worst = dx.groupBy(col("cell")).agg(count(lit(1)).as("ndx"))
      .join(dy.groupBy(col("cell")).agg(count(lit(1)).as("ndy")),
        Seq("cell"))
      .agg(max(col("ndx") * col("ndy"))).head()
    val worstCells = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(worstCells <= maxGridCells,
      s"$opName: a cell's dense grid would hold $worstCells " +
        s"(> maxGridCells = $maxGridCells) (x, y) combinations - bin " +
        "the inputs first (the q195/q196 discipline)")
    // r17 OPTIMIZATION (guide §2.5): the two window passes carry the
    // grid's per-row CPU (two sorts + four running sums), but AQE's
    // byte-size coalescing folded their EnsureRequirements exchanges to
    // ONE partition (grid bytes ≪ the 1 MB floor while grid CPU is
    // seconds) — the whole double-prefix ran serially in one task. The
    // exchanges the windows need anyway are pinned as explicit
    // repartition-by-key with the SESSION's default parallelism
    // (REPARTITION_BY_NUM is exempt from AQE coalescing): same shuffle
    // count, restored parallelism, and the count is right at any scale
    // because the grid is bounded by the maxGridCells guard above.
    val np = df.sparkSession.sparkContext.defaultParallelism
    val grid = dx
      .join(broadcast(dy), Seq("cell"))
      .join(cxy, Seq("cell", "x", "y"), "left")
      .withColumn("nc", coalesce(col("nxy"), lit(0L)))
    val wyLt = Window.partitionBy("cell", "x").orderBy("y")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wyGt = Window.partitionBy("cell", "x").orderBy("y")
      .rowsBetween(1, Window.unboundedFollowing)
    val wxLt = Window.partitionBy("cell", "y").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val g = grid
      .withColumn("hlt", coalesce(sum(col("nc")).over(wyLt), lit(0L)))
      .withColumn("hgt", coalesce(sum(col("nc")).over(wyGt), lit(0L)))
      .repartition(np, col("cell"), col("y"))
      .withColumn("glt", coalesce(sum(col("hlt")).over(wxLt), lit(0L)))
      .withColumn("ggt", coalesce(sum(col("hgt")).over(wxLt), lit(0L)))
    val pair = g.groupBy(col("cell"))
      .agg(sum(dec(col("nc"))).as("n"),
        sum(dec(col("nc")) * col("glt")).as("conc"),
        sum(dec(col("nc")) * col("ggt")).as("disc"))
    (cxy, pair)
  }

  /**
   * Mann–Kendall trend test — "is this series monotonically drifting",
   * the nonparametric trend readout for operational time series (daily
   * volumes, drift scores, ingest rates): S = Σ_{t_i<t_j}
   * sign(v_j − v_i) = C − D over the (time, value) frame, the exact
   * concordance statistic [[kendallTauB]]'s grid double-prefix already
   * computes — never a pairwise scan. TIME POINTS MUST BE UNIQUE per
   * cell (aggregate to your time grain first); enforced loudly by a
   * scalar probe, because duplicated times silently change the
   * variance law. The normal approximation is a defined lattice:
   * den = n(n−1)(2n+5) − Σ_v t_v(t_v−1)(2t_v+5) (the tie-corrected
   * 18·Var), z_milli = sign(S)·⌊√((18·10⁶·(|S|−1)²) div den)⌋ with the
   * continuity correction, S = 0 reading exactly 0 and a degenerate
   * den (n < 2 or all-tied values) emitting null — and the welchT
   * family guard: a radicand at or beyond 2⁵³ emits null rather than
   * a double-rounded z.
   *
   * Scale shape: identical to [[kendallTauB]] — one (cell, t, v)
   * contingency aggregate is the only corpus-sized shuffle; the grid
   * is |T|·|V| bounded by the guard; everything after is
   * cell-frame arithmetic.
   */
  def mannKendall(df: DataFrame, cellCol: String, tCol: String,
      vCol: String, maxGridCells: Long = 4000000L): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val (cxy, pair) = contingencyPairs(df, cellCol, tCol, vCol,
      maxGridCells, "mannKendall")
    val dupT = cxy.groupBy(col("cell"), col("x"))
      .agg(sum(col("nxy")).as("nx"))
      .agg(max(col("nx"))).head()
    require(dupT.isNullAt(0) || dupT.getLong(0) <= 1L,
      "mannKendall: time points must be unique per cell - aggregate " +
        "to your time grain first")
    val tcub = cxy.groupBy(col("cell"), col("y"))
      .agg(sum(col("nxy")).as("ny"))
      .groupBy(col("cell"))
      .agg(sum(dec(col("ny")) * (col("ny") - 1) * (col("ny") * 2 + 5))
        .as("tcub"))
    pair.join(tcub, Seq("cell"))
      .withColumn("s", col("conc") - col("disc"))
      .withColumn("den", expr(
        "n * (n - 1) * (n * 2 + 5) - tcub"))
      .withColumn("rad", when(col("den") > 0 && col("s") =!= 0, expr(
        "(18000000 * (abs(s) - 1) * (abs(s) - 1)) div den")))
      .select(col("cell"), col("n").cast("long").as("n"),
        col("s").cast("long").as("s"),
        when(col("den") > 0 && col("s") === 0, lit(0L))
          .when(col("rad").isNotNull &&
              col("rad") < lit(9007199254740992L),
            expr("""cast(sign(s) as bigint) *
              cast(floor(sqrt(cast(rad as double))) as bigint)"""))
          .as("z_milli"))
  }

  /**
   * Gini concentration — "how unevenly is this mass distributed", the
   * Lorenz-curve scalar for corpus governance (token mass over
   * documents per source: 0 = perfectly even, →1 = one document is
   * the corpus). Exact on the rank lattice: with per-cell ascending
   * ranks i (ties ordered by id — the i·x_i sum is invariant under
   * tie permutation, so the tiebreak cannot change the answer),
   * gini_ppm = ⌊10⁶·(2·Σi·x_i − (n+1)·Σx) / (n·Σx)⌋, numerator in
   * decimal128. Zero-total or single-row cells emit null.
   *
   * Scale shape: one window per cell for the ranks (PARTITIONED — a
   * cell's rows, never the corpus) plus one cell aggregate. For a
   * cell too large for one partition's window, the q171/q174
   * bucket-prefix rank decomposition slots in upstream; corpus
   * sources are nowhere near that.
   */
  def giniConcentrationByCell(df: DataFrame, cellCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val w = Window.partitionBy("cell").orderBy(col("x"), col("id"))
    df.select(col(cellCol).as("cell"), col(idCol).as("id"),
        col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
      .withColumn("i", row_number().over(w))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"),
        sum(dec(col("x")) * col("i")).as("ix"))
      .select(col("cell"), col("n"), col("total"),
        when(col("n") > 1 && col("total") > 0, expr(
          """cast((1000000 * (2 * ix - cast(n + 1 as decimal(38,0)) *
               total)) div (cast(n as decimal(38,0)) * total)
             as bigint)""")).as("gini_ppm"))
  }

  /**
   * Nelson–Aalen cumulative hazard — the survival-analysis readout
   * for retention/lifetime data ("how fast does this cohort die"),
   * censoring-aware where a naive lifetime histogram is not: at each
   * distinct duration t with d_t events, the hazard increment is
   * d_t/n_t against the risk set n_t = subjects (events AND censored)
   * with duration ≥ t. The lattice is DEFINED as the running sum of
   * per-time floors: h_inc_ppm = (10⁶·d_t) div n_t, h_cum_ppm =
   * Σ_{u≤t} h_inc_ppm — sum-of-floors, not floor-of-sums, so both
   * engines replay it term by term. Emits one row per (cell, t) with
   * d_t > 0; censored-only times contribute risk, never a row.
   *
   * Input: (cellCol, durCol, eventCol) — one row per subject,
   * eventCol 1 = observed event, 0 = right-censored at durCol.
   *
   * Scale shape: one (cell, dur) aggregate is the only subject-sized
   * shuffle; the risk set is a suffix-sum window over the bounded
   * distinct-duration frame per cell, and the cumulative hazard a
   * prefix window on the same frame.
   */
  def nelsonAalen(df: DataFrame, cellCol: String, durCol: String,
      eventCol: String): DataFrame = {
    val byDur = df
      .select(col(cellCol).as("cell"), col(durCol).cast("long").as("t"),
        col(eventCol).cast("long").as("ev"))
      .filter(col("t").isNotNull && col("t") >= 0)
      .groupBy(col("cell"), col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("ev")).as("d"))
    val wRisk = Window.partitionBy("cell").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.partitionBy("cell").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .withColumn("h_inc_ppm", expr("(1000000 * d) div n_risk"))
      .withColumn("h_cum_ppm", sum(when(col("d") > 0,
        col("h_inc_ppm")).otherwise(0L)).over(wCum))
      .filter(col("d") > 0)
      .select(col("cell"), col("t"), col("n_risk"), col("d"),
        col("h_inc_ppm"), col("h_cum_ppm"))
  }

  /**
   * Mutual information between two categorical columns on the exact
   * Q20 log lattice — "does knowing x tell you anything about y",
   * the dependence readout χ² (q104) can only threshold and
   * correlation (q98/q196) can't see for nominal data; with the two
   * marginal entropies emitted alongside, callers normalize to NMI
   * however they prefer. Same lattice contract as [[jsDivergence]]:
   * per (x, y) cell the contribution is n_xy·(L(n_xy·N) − L(n_x·n_y))
   * — pure int64 lattice calls, identical cross-engine — and
   * mi_q20 = Σ div N in Q20 bits. The lattice is EXACTLY zero under
   * independence-by-construction: a constant x gives n_x = N and
   * n_xy = n_y, so both lattice arguments coincide term-by-term.
   *
   * Scale shape: one (cell, x, y) aggregate is the only corpus-sized
   * shuffle; marginals re-aggregate the bounded distinct frame and
   * BROADCAST back onto it. Envelope: per-cell counts ≤ ~3·10⁹ keep
   * n_xy·N < 2⁶³ (int64 is the lattice contract — quantize or
   * subsample beyond).
   */
  def mutualInformation(df: DataFrame, cellCol: String, xCol: String,
      yCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.LongType
    val lg = (c: Column) =>
      Bridge.column(graft.functions.Log2Q20(Bridge.expression(
        c.cast(LongType))))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cxy = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(cellCol).as("cell"), col(xCol).as("x"),
        col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
    val cx = cxy.groupBy(col("cell"), col("x"))
      .agg(sum(col("nxy")).as("nx"))
    val cy = cxy.groupBy(col("cell"), col("y"))
      .agg(sum(col("nxy")).as("ny"))
    val nc = cxy.groupBy(col("cell")).agg(sum(col("nxy")).as("nn"))
    val mi = cxy
      .join(broadcast(cx), Seq("cell", "x"))
      .join(broadcast(cy), Seq("cell", "y"))
      .join(broadcast(nc), Seq("cell"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("nxy")) *
          (lg(col("nxy") * col("nn")) - lg(col("nx") * col("ny"))))
          .as("mi_sum"))
    def entropy(marg: DataFrame, mCol: String, out: String) =
      marg.join(broadcast(nc), Seq("cell"))
        .groupBy(col("cell"))
        .agg(sum(dec(col(mCol)) * (lg(col("nn")) - lg(col(mCol))))
          .as(out))
    mi
      .join(nc, Seq("cell"))
      .join(entropy(cx, "nx", "hx_sum"), Seq("cell"))
      .join(entropy(cy, "ny", "hy_sum"), Seq("cell"))
      .select(col("cell"), col("nn").cast("long").as("n"),
        col("n_pairs"),
        expr("cast(mi_sum div cast(nn as decimal(38,0)) as bigint)")
          .as("mi_q20"),
        expr("cast(hx_sum div cast(nn as decimal(38,0)) as bigint)")
          .as("hx_q20"),
        expr("cast(hy_sum div cast(nn as decimal(38,0)) as bigint)")
          .as("hy_q20"))
  }

  /**
   * Kolmogorov–Smirnov two-sample statistic — "WHERE does the
   * distribution shift, and by how much": D = max_v |F_A(v) − F_B(v)|
   * over the pooled support, the location-free complement to q195's
   * Mann–Whitney (U integrates the shift; D reads its peak). Exact in
   * the counts-per-distinct-value domain: inclusive prefix sums of the
   * two samples' counts on the distinct-value frame give cross-
   * multiplied gaps |cumA·n_B − cumB·n_A| (decimal128 — two 10¹¹
   * counts would overflow int64), the max and its LOWEST attaining
   * value ride one struct-max aggregate (deterministic argmax, no
   * max_by tie lottery), and d_ppm = (10⁶·maxgap) div (n_A·n_B).
   *
   * Scale shape: identical to mannWhitneyU — one (cell, value)
   * aggregate is the only corpus-sized shuffle; the prefix window runs
   * on the distinct-value frame partitioned by cell (callers bin
   * continuous domains). A cell missing either sample emits null
   * d_ppm/v_at_max, never a division error.
   */
  def ksTest(df: DataFrame, cellCol: String, groupCol: String,
      groupA: String, groupB: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val vc = df
      .filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .groupBy(col(cellCol).as("cell"), col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("b"))
    val w = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wt = Window.partitionBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    vc
      .withColumn("cum_a", sum(col("a")).over(w))
      .withColumn("cum_b", sum(col("b")).over(w))
      .withColumn("n_a", sum(col("a")).over(wt))
      .withColumn("n_b", sum(col("b")).over(wt))
      .withColumn("gap", abs(dec(col("cum_a")) * col("n_b") -
        dec(col("cum_b")) * col("n_a")))
      .groupBy(col("cell"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        max(struct(col("gap"), (-col("v")).as("nv"))).as("mx"))
      .select(col("cell"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          "cast((mx.gap * 1000000) div " +
            "(cast(n_a as decimal(38,0)) * n_b) as bigint)")).as("d_ppm"),
        when(col("n_a") > 0 && col("n_b") > 0, -col("mx.nv"))
          .as("v_at_max"))
  }

  /**
   * Spearman rank correlation — monotone association on integer-exact
   * DOUBLED average ranks, the outlier-robust complement to q98's
   * Pearson: drank(v) = 2·|{smaller}| + |{equal}| + 1 is always an
   * integer (2× the textbook average rank, so ties never produce .5),
   * Σ drank = n(n+1) makes the mean drank exactly n+1, and the
   * deviations u = drank − (n+1) feed plain integer co-moments.
   * ρ_milli = sign(Σuₓu_y)·⌊√(((10⁶·|Σuₓu_y|) div Σuₓ²)·|Σuₓu_y| div
   * Σu_y²)⌋ — the two-stage truncating division is the cross-engine
   * definition (num² ≤ Σuₓ²·Σu_y² by Cauchy–Schwarz keeps every stage
   * inside decimal128 at ANY cell size; the radicand ≤ 10⁶ < 2⁵³ so
   * the sqrt is exact-input).
   *
   * Scale shape: ranks come from the per-(cell, value) count frame —
   * cntless via a cell-partitioned window over distinct values, then
   * the drank lookup BROADCASTS back onto the fact (callers pass
   * binned/integer values, so the distinct frame is bounded); the fact
   * itself shuffles once for each value-count aggregate and never for
   * the join. Constant columns (Σu² = 0) emit null, not an error.
   */
  def spearmanRho(df: DataFrame, cellCol: String, xCol: String,
      yCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    // r17 OPTIMIZATION (guide §1.2): `base` has FOUR consumers (both
    // drank lookups, the per-cell count and the final fact pass) and
    // each re-ran the scan + projection; one eager localCheckpoint
    // (spread first — the fact scan is a single small parquet split)
    // materializes it once and parallelizes every downstream pass.
    val base = graft.operators.ScanOps.spreadSmallInput(df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(cellCol).as("cell"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y")), col("cell"), col("x"))
      .localCheckpoint(true)
    def dranks(vCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("cell").orderBy(vCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      base.groupBy(col("cell"), col(vCol))
        .agg(count(lit(1)).as("cnt"))
        .withColumn(out,
          coalesce(sum(col("cnt")).over(w), lit(0L)) * 2 +
            col("cnt") + 1)
        .drop("cnt")
    }
    val nCell = base.groupBy(col("cell")).agg(count(lit(1)).as("n"))
    base
      .join(broadcast(dranks("x", "drx")), Seq("cell", "x"))
      .join(broadcast(dranks("y", "dry")), Seq("cell", "y"))
      .join(broadcast(nCell), Seq("cell"))
      .select(col("cell"), col("n"),
        (col("drx") - col("n") - 1).as("ux"),
        (col("dry") - col("n") - 1).as("uy"))
      .groupBy(col("cell"))
      .agg(first(col("n")).as("n"),
        sum(dec(col("ux")) * col("uy")).as("num"),
        sum(dec(col("ux")) * col("ux")).as("dx"),
        sum(dec(col("uy")) * col("uy")).as("dy"))
      .withColumn("rho_milli", expr(
        """CASE WHEN dx > 0 AND dy > 0 THEN
             cast(sign(num) as bigint) * cast(floor(sqrt(cast(
               (((1000000 * abs(num)) div dx) * abs(num)) div dy
               as double))) as bigint) END"""))
      .select(col("cell"), col("n"), col("rho_milli"))
  }

  /**
   * Exact tie-corrected AUC-ROC — THE binary-ranking readout (equal to
   * the probability a random positive outscores a random negative, ties
   * counting half), computed in the counts domain: group to
   * (cell, score) → (c₁, c₀), take one PARTITIONED prefix window over
   * the distinct-score spine for the exclusive cumulative count, and
   * read the positive rank-sum in closed form — 2·R₁ = Σ_s c₁(s) ·
   * (2·cumBefore(s) + c(s) + 1) (each positive at a tied score gets the
   * midrank; doubling keeps it integer). Then
   * auc_ppm = ⌊10⁶·(2R₁ − n₁(n₁+1)) / (2·n₁·n₀)⌋ — the Mann–Whitney
   * identity (q195's U statistic normalized), exact on decimal128, so
   * the metric itself hash-gates. gini_ppm = 2·auc_ppm − 10⁶ is derived
   * from the floored AUC (defined, identical cross-engine). Cells with
   * no positives or no negatives emit null rather than dividing.
   *
   * Scale shape: one map-side-combined aggregate to the (cell, score)
   * frame; the window runs per cell over DISTINCT scores — bounded by
   * the score lattice (callers score on an integer lattice, the q206
   * calibration discipline), never by row count. Nothing corpus-sized
   * shuffles twice and no global window exists.
   */
  def aucRoc(df: DataFrame, cellCol: String, scoreCol: String,
      labelCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val sc = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(col(cellCol).as("cell"), col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("long").as("y"))
      .groupBy(col("cell"), col("s"))
      .agg(sum(col("y")).as("c1"), sum(lit(1L) - col("y")).as("c0"))
    val wPrev = Window.partitionBy("cell").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    sc
      .withColumn("cb", coalesce(sum(col("c1") + col("c0")).over(wPrev),
        lit(0L)))
      .groupBy(col("cell"))
      .agg(sum(col("c1")).as("n_pos"), sum(col("c0")).as("n_neg"),
        sum(dec(col("c1")) *
          (col("cb") * 2 + col("c1") + col("c0") + 1)).as("r2"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0, expr(
          """cast((1000000 * (r2 - cast(n_pos as decimal(38,0)) *
               (n_pos + 1))) div
             (2 * cast(n_pos as decimal(38,0)) * n_neg) as bigint)""")))
      .select(col("cell"), col("n_pos"), col("n_neg"), col("auc_ppm"),
        (col("auc_ppm") * 2 - 1000000L).as("gini_ppm"))
  }

  /**
   * Population stability index — the model-monitoring drift standard
   * (credit-risk scorecards onward): PSI = Σ_bins (p−q)·log(p/q), here
   * in exact Q20 log2 units like its siblings q198 (JS) and q204 (MI).
   * Per (cell, bin): counts a/b against slice totals ta/tb give
   * p−q = (a·tb − b·ta)/(ta·tb) and log2(p/q) = lg(a·tb) − lg(b·ta) on
   * the native [[graft.functions.Log2Q20]] lattice; both factors share
   * a sign so every term is ≥ 0, terms sum exactly in decimal128, and
   * ONE truncating division by ta·tb lands psi_q20 — bit-identical
   * cross-engine. Bins empty on either side (where log(p/q) diverges)
   * are EXCLUDED from the sum — the standard clamp, made honest: their
   * count and their probability mass ship alongside as n_excl /
   * excl_a_ppm / excl_b_ppm instead of being silently smoothed away.
   *
   * Scale shape: identical to jsDivergence — one map-side-combined
   * aggregate to the (cell, bin) frame, windows over the bin-bounded
   * frame, nothing corpus-sized past the first aggregate.
   */
  /**
   * Welch's two-sample t — the parametric leg of the inferential
   * family (q195 MW-U = rank-based, q197 KS = distributional, q103 χ² =
   * categorical; Welch = difference of MEANS under unequal variances,
   * the default two-sample test since equal-variance Student is never
   * safe to assume). Exact rational form from the five sufficient
   * statistics per (cell, group): with D = sx₁n₂ − sx₂n₁ and
   * Aᵢ = nᵢ·sxxᵢ − sxᵢ² (n²(n−1)-scaled variances),
   * t² = D²(n₁−1)(n₂−1) / E where E = A₁n₂²(n₂−1) + A₂n₁²(n₁−1) —
   * one common denominator, no float mean anywhere. t_milli is the
   * defined staged lattice (the q196/q98 discipline):
   * sign(D)·⌊√(((10⁶·D²·(n₁−1)) div E)·(n₂−1))⌋ — (n₁−1) multiplies
   * BEFORE the division (the post-division form quantized t in steps
   * of √((n₁−1)(n₂−1)) ≈ 2.4 whole t units — measured before this
   * staging), leaving a residual quantization of ~(n₂−1)/(2√rad),
   * ≈ 1 milli on real frames. Envelope (documented, not guessed):
   * D is translation-invariant and ≈ n₁n₂·Δm on real data, so
   * 10⁶·D²·n ≤ 10³⁸ holds whenever n₁n₂·|Δm| ≤ 10¹⁴ lattice units —
   * callers bin values (the q195 discipline); a radicand at or beyond
   * 2⁵³ emits null rather than a silently double-rounded value. Zero
   * pooled variance (both groups constant) emits null, never a
   * division error.
   *
   * Scale shape: ONE map-side-combined aggregate to the (cell) frame —
   * the cheapest operator in the family; nothing shuffles but the
   * five-statistic rows.
   */
  def welchT(df: DataFrame, cellCol: String, groupCol: String,
      groupA: String, groupB: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df
      .filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        when(col(groupCol) === groupA, 1L).otherwise(0L).as("ia"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"))
      .agg(sum(col("ia")).as("n1"), sum(lit(1L) - col("ia")).as("n2"),
        sum(dec(col("v")) * col("ia")).as("sx1"),
        sum(dec(col("v")) * (lit(1L) - col("ia"))).as("sx2"),
        sum(dec(col("v")) * col("v") * col("ia")).as("sxx1"),
        sum(dec(col("v")) * col("v") * (lit(1L) - col("ia"))).as("sxx2"))
      .withColumn("d", expr("sx1 * n2 - sx2 * n1"))
      .withColumn("e", expr(
        """(n1 * sxx1 - sx1 * sx1) * n2 * n2 * (n2 - 1) +
           (n2 * sxx2 - sx2 * sx2) * n1 * n1 * (n1 - 1)"""))
      .withColumn("rad", when(col("n1") >= 2 && col("n2") >= 2 &&
          col("e") > 0,
        expr("((1000000 * d * d * (n1 - 1)) div e) * (n2 - 1)")))
      .select(col("cell"), col("n1").as("n_a"), col("n2").as("n_b"),
        when(col("rad").isNotNull &&
            col("rad") < lit(9007199254740992L),
          expr("""cast(sign(d) as bigint) *
            cast(floor(sqrt(cast(rad as double))) as bigint)"""))
          .as("t_milli"))
  }

  def psiDrift(df: DataFrame, cellCol: String, sliceCol: String,
      sliceA: String, sliceB: String, binCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.types.LongType
    val lg = (c: Column) =>
      Bridge.column(graft.functions.Log2Q20(Bridge.expression(
        c.cast(LongType))))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val kc = df
      .filter(col(sliceCol).isin(sliceA, sliceB) && col(binCol).isNotNull)
      .groupBy(col(cellCol).as("cell"), col(binCol).as("bin"))
      .agg(sum(when(col(sliceCol) === sliceA, 1L).otherwise(0L)).as("a"),
        sum(when(col(sliceCol) === sliceB, 1L).otherwise(0L)).as("b"))
    val wt = Window.partitionBy("cell")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    kc
      .withColumn("ta", sum(col("a")).over(wt))
      .withColumn("tb", sum(col("b")).over(wt))
      .withColumn("core", col("a") > 0 && col("b") > 0)
      .withColumn("term", when(col("core"),
        dec(col("a") * col("tb") - col("b") * col("ta")) *
          (lg(col("a") * col("tb")) - lg(col("b") * col("ta"))))
        .otherwise(lit(0)))
      .groupBy(col("cell"))
      .agg(first(col("ta")).as("n_a"), first(col("tb")).as("n_b"),
        count(lit(1)).as("n_bins"),
        sum(when(col("core"), 0L).otherwise(1L)).as("n_excl"),
        sum(when(col("core"), 0L).otherwise(col("a"))).as("xa"),
        sum(when(col("core"), 0L).otherwise(col("b"))).as("xb"),
        sum(col("term")).as("num"))
      .select(col("cell"), col("n_a"), col("n_b"), col("n_bins"),
        col("n_excl"),
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          "cast(num div (cast(n_a as decimal(38,0)) * n_b) as bigint)"))
          .as("psi_q20"),
        when(col("n_a") > 0,
          expr("cast((1000000 * cast(xa as decimal(38,0))) div n_a " +
            "as bigint)")).as("excl_a_ppm"),
        when(col("n_b") > 0,
          expr("cast((1000000 * cast(xb as decimal(38,0))) div n_b " +
            "as bigint)")).as("excl_b_ppm"))
  }

  /**
   * Log-rank test — "do these two cohorts die at the same rate", the
   * hypothesis-test leg closing the survival family ([[kmSurvival]]
   * draws the curves, [[nelsonAalen]] the cumulative hazard; this
   * says whether the A/B difference is signal). At each pooled event
   * time t: observed A-deaths d_At vs expected d_t·n_At/n_t under the
   * null, with the hypergeometric variance
   * d_t·n_At·n_Bt·(n_t−d_t)/(n_t²·(n_t−1)).
   *
   * THE LATTICE IS DEFINED as sum-of-floors on common scales — both
   * engines replay it term by term: e_ppm_t = (10⁶·d_t·n_At) div n_t,
   * v_pp12_t = (10¹²·d_t·n_At·n_Bt·(n_t−d_t)) div (n_t²·(n_t−1))
   * (zero when n_t = 1), O_ppm = 10⁶·Σd_At; z_milli rides the welchT
   * staged floor-sqrt on Δ = O − E against V with the 2⁵³ radicand
   * guard, V = 0 emitting null. Rows whose time has no event (d_t = 0)
   * contribute risk through the suffix windows, never a term.
   *
   * Input: one row per subject — (cellCol, groupCol ∈ {gA, gB} — other
   * values drop, durCol integral, eventCol 1 = event / 0 = censored).
   * Output: (cell, n_a, n_b, d_a, e_a_ppm, z_milli).
   *
   * Scale shape: one (cell, t) aggregate is the only subject-sized
   * shuffle; both risk sets ride suffix windows over the bounded
   * distinct-duration frame per cell, sharing one cell-keyed exchange
   * with the final rollup.
   */
  def logRank(df: DataFrame, cellCol: String, groupCol: String,
      gA: String, gB: String, durCol: String, eventCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val byT = df
      .filter(col(groupCol).isin(gA, gB) && col(durCol).isNotNull &&
        col(durCol) >= 0)
      .select(col(cellCol).as("cell"),
        (col(groupCol) === gA).cast("long").as("ia"),
        col(durCol).cast("long").as("t"),
        col(eventCol).cast("long").as("ev"))
      .groupBy(col("cell"), col("t"))
      .agg(sum(col("ia")).as("na_at"),
        sum(lit(1L) - col("ia")).as("nb_at"),
        sum(col("ia") * col("ev")).as("da"),
        sum((lit(1L) - col("ia")) * col("ev")).as("db"))
    val wRisk = Window.partitionBy("cell").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byT
      .withColumn("na_risk", sum(col("na_at")).over(wRisk))
      .withColumn("nb_risk", sum(col("nb_at")).over(wRisk))
      .withColumn("d", col("da") + col("db"))
      .withColumn("n", col("na_risk") + col("nb_risk"))
      .withColumn("e_ppm", when(col("d") > 0,
        expr("(1000000 * d * na_risk) div n")).otherwise(0L))
      .withColumn("v_pp12", when(col("d") > 0 && col("n") > 1, expr(
        """(cast(1000000000000 as decimal(38,0)) * d * na_risk * nb_risk
           * (n - d)) div (cast(n as decimal(38,0)) * n * (n - 1))"""))
        .otherwise(lit(0)).cast("decimal(38,0)"))
      .groupBy(col("cell"))
      .agg(sum(col("na_at")).as("n_a"), sum(col("nb_at")).as("n_b"),
        sum(col("da")).as("d_a"),
        sum(dec(col("e_ppm"))).as("e_sum"),
        sum(col("v_pp12")).as("v_sum"))
      .withColumn("delta", expr("cast(1000000 as decimal(38,0)) * d_a") -
        col("e_sum"))
      .withColumn("rad", when(col("v_sum") > 0,
        expr("(1000000 * abs(delta) * abs(delta)) div v_sum")))
      .select(col("cell"), col("n_a"), col("n_b"), col("d_a"),
        col("e_sum").cast("long").as("e_a_ppm"),
        when(col("rad").isNotNull && col("rad") < lit(9007199254740992L),
          expr("""cast(sign(delta) as bigint) *
            cast(floor(sqrt(cast(rad as double))) as bigint)"""))
          .as("z_milli"))
  }

  /**
   * Theil–Sen slope — the robust trend MAGNITUDE beside
   * [[mannKendall]]'s trend EXISTENCE: the median pairwise slope over
   * a per-cell (time, value) series, immune to ~29% outliers where
   * least-squares (q98) is wrecked by one. THE LATTICE IS DEFINED as
   * slope_milli(i,j) = (1000·(v_j − v_i)) div (t_j − t_i) per ordered
   * pair — integral division truncating toward zero, identical in
   * Spark `div` and DuckDB `//` (measured; the engines agree on
   * truncation, so the lattice needs no floor correction) — and the
   * statistic is the LOWER median: the ⌈n_pairs/2⌉-th smallest
   * (value-determined — row_number tie order cannot move it).
   *
   * TIME POINTS MUST BE UNIQUE per cell (aggregate to your grain
   * first) — enforced loudly; the pair join is the series' own
   * O(n²/2), bounded by `maxPairsPerCell` with the contingencyPairs
   * loud-guard discipline (callers aggregate; a 30-point daily series
   * is 435 pairs, a 10⁴-point one is 5·10⁷ — bin first).
   *
   * Scale shape: one (cell, t) dedup-check aggregate + the bounded
   * per-cell pair self-join; the median rides one cell-partitioned
   * rank window over the pair frame.
   */
  def theilSen(df: DataFrame, cellCol: String, tCol: String,
      vCol: String, maxPairsPerCell: Long = 2000000L): DataFrame = {
    val pts = df
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(cellCol).as("cell"), col(tCol).cast("long").as("t"),
        col(vCol).cast("long").as("v"))
    val sizes = pts.groupBy(col("cell"), col("t"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("cell"))
      .agg(max(col("c")).as("mx"), count(lit(1)).as("n"))
      .agg(max(col("mx")).as("dup"),
        max(expr("(n * (n - 1)) div 2")).as("pairs")).head()
    require(sizes.isNullAt(0) || sizes.getLong(0) <= 1L,
      "theilSen: time points must be unique per cell - aggregate to " +
        "your time grain first")
    require(sizes.isNullAt(1) || sizes.getLong(1) <= maxPairsPerCell,
      s"theilSen: a cell's pair join would hold ${sizes.getLong(1)} " +
        s"pairs (> maxPairsPerCell = $maxPairsPerCell) - aggregate to " +
        "a coarser grain first (the contingencyPairs discipline)")
    val pairs = pts.as("a")
      .join(pts.as("b"),
        col("a.cell") === col("b.cell") && col("a.t") < col("b.t"))
      .select(col("a.cell").as("cell"),
        expr("(1000 * (b.v - a.v)) div (b.t - a.t)").as("s"))
    val wRank = Window.partitionBy("cell").orderBy("s")
    pairs
      .withColumn("r", row_number().over(wRank).cast("long"))
      .withColumn("np", count(lit(1)).over(Window.partitionBy("cell")))
      .filter(col("r") === expr("(np + 1) div 2"))
      .select(col("cell"), col("np").as("n_pairs"),
        col("s").as("slope_milli"))
  }

  /**
   * CUSUM changepoint monitor — the sequential drift detector for
   * operational series (daily quality scores, ingest volumes): the
   * classic recursions S⁺_t = max(0, S⁺_{t−1} + x_t − kUp) /
   * S⁻_t = max(0, S⁻_{t−1} + kDn − x_t) accumulate sustained
   * excursions a threshold test on single points can't see. The
   * recursion LOOKS sequential, but distributes exactly via the
   * prefix identity S_t = P_t − min(0, min_{j≤t} P_j) with
   * P_t = Σ_{i≤t}(x_i − k) — two windows (prefix sum, running min)
   * per side, all integer arithmetic, no fold and no approximation.
   * Alarms fire strictly above the side's threshold.
   *
   * TIME POINTS MUST BE UNIQUE per cell (aggregate first — duplicated
   * times would make the prefix order, and so the statistic,
   * nondeterministic); enforced loudly.
   *
   * Output: (cell, t, v, s_up, alarm_up, s_dn, alarm_dn) — one row
   * per input point, alarms as 0/1 ints.
   *
   * Scale shape: all four windows share ONE cell-keyed exchange and
   * one sort (same partition spec + ordering); per-cell series are
   * the bounded time grain, never raw facts.
   */
  def cusum(df: DataFrame, cellCol: String, tCol: String, vCol: String,
      kUp: Long, hUp: Long, kDn: Long, hDn: Long): DataFrame = {
    val pts = df
      .filter(col(tCol).isNotNull && col(vCol).isNotNull)
      .select(col(cellCol).as("cell"), col(tCol).cast("long").as("t"),
        col(vCol).cast("long").as("v"))
    val dup = pts.groupBy(col("cell"), col("t"))
      .agg(count(lit(1)).as("c")).agg(max(col("c"))).head()
    require(dup.isNullAt(0) || dup.getLong(0) <= 1L,
      "cusum: time points must be unique per cell - aggregate to " +
        "your time grain first")
    val wPre = Window.partitionBy("cell").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("p_up", sum(col("v") - kUp).over(wPre))
      .withColumn("p_dn", sum(lit(kDn) - col("v")).over(wPre))
      .withColumn("s_up", col("p_up") -
        least(lit(0L), min(col("p_up")).over(wPre)))
      .withColumn("s_dn", col("p_dn") -
        least(lit(0L), min(col("p_dn")).over(wPre)))
      .select(col("cell"), col("t"), col("v"),
        col("s_up"), (col("s_up") > hUp).cast("int").as("alarm_up"),
        col("s_dn"), (col("s_dn") > hDn).cast("int").as("alarm_dn"))
  }

  /**
   * Benjamini–Hochberg FDR control — the multiple-testing gate the
   * engine's per-cell test family (q195 MW-U, q197 KS, q220 Welch,
   * q247 Mann–Kendall, q250 log-rank) was missing: run m tests, and
   * WITHOUT a correction ~α·m nulls "discover" by chance. Input is one
   * row per test (family, test, p_ppm ∈ [0, 10⁶]); within each family
   * the step-up procedure sorts p ascending (ties broken by test id —
   * a defined total order, so ranks are cross-engine exact), finds
   * k* = max{i : p₍ᵢ₎·m ≤ α·i} (integer cross-multiplication — no
   * rational division anywhere in the decision), and discovers exactly
   * ranks 1..k*. Also emits the BH-adjusted p-value, the standard
   * monotone readout: p_adj₍ᵢ₎ = min_{j≥i} min(10⁶, ⌊p₍ⱼ₎·m / j⌋) — a
   * reverse running min over the floored lattice.
   *
   * Output: (cell, test, p_ppm, rnk, m, p_adj_ppm, discovery).
   *
   * Scale shape: the input is a TEST frame (one row per hypothesis —
   * thousands, not facts); the corpus-sized work already happened
   * upstream producing the p-values. Two windows over one cell-keyed
   * exchange; nothing here ever touches raw facts.
   */
  def bhFdr(df: DataFrame, cellCol: String, testCol: String,
      pCol: String, alphaPpm: Long = 50000L): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val t = df
      .filter(col(pCol).isNotNull)
      .select(col(cellCol).as("cell"), col(testCol).as("test"),
        col(pCol).cast("long").as("p_ppm"))
    val wRank = Window.partitionBy("cell").orderBy("p_ppm", "test")
    val wCell = Window.partitionBy("cell")
    val wTail = Window.partitionBy("cell").orderBy("rnk")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    t
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wCell))
      .withColumn("pass",
        when(dec(col("p_ppm")) * col("m") <=
          dec(lit(alphaPpm)) * col("rnk"), col("rnk")).otherwise(0L))
      .withColumn("kstar", max(col("pass")).over(wCell))
      .withColumn("p_adj_ppm",
        min(least(lit(1000000L),
          expr("cast((cast(p_ppm as decimal(38,0)) * m) div rnk" +
            " as bigint)"))).over(wTail))
      .select(col("cell"), col("test"), col("p_ppm"), col("rnk"),
        col("m"), col("p_adj_ppm"),
        (col("rnk") <= col("kstar")).cast("int").as("discovery"))
  }

  /**
   * χ² test of independence on an r×c contingency table with Cramér's
   * V — the categorical-association readout [[chiSquare2x2]] only
   * covers at 2×2 (is status associated with priority; is language
   * associated with source): per cell, χ² = N·Σ_{observed} o²/(r_T·c_T)
   * − N — the sparse identity (zero cells contribute o²/e = 0, so the
   * dense e-grid is NEVER built; Σe = N absorbs it), each term floored
   * on the milli lattice: chi2_milli = max(0, Σ ⌊10³·N·o²/(r_T·c_T)⌋ −
   * 10³·N) (per-term floors can undershoot the exact sum by < #terms
   * milli — the clamp keeps the degenerate all-independent read at 0).
   * Cramér's V = √(χ²/(N·min(r−1, c−1))) lands as v_milli =
   * ⌊√((10³·chi2_milli) div (N·d))⌋ with the welchT-family 2⁵³ radicand
   * guard. Numerator 10³·N·o² stays inside decimal128 for N·o² ≤ 10³⁵
   * — any realistic table.
   *
   * Output: (cell, n, r, c, dof, chi2_milli, v_milli); single-level
   * cells (dof = 0) emit null v_milli.
   *
   * Scale shape: ONE corpus-sized aggregate to (cell, x, y) counts,
   * localCheckpointed (the q189 rule — four consumers: two marginal
   * re-aggregates and the term join's probe side would otherwise
   * recompute it); marginals are keyed re-aggregates of that bounded
   * frame; the term join is (cell, x)/(cell, y)-keyed on frames no
   * larger than the contingency itself. No grid, no window, no guard
   * needed — cost is O(observed combinations).
   */
  def chiSquareIndependence(df: DataFrame, cellCol: String,
      xCol: String, yCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cxy = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(cellCol).as("cell"), col(xCol).cast("string").as("x"),
        col(yCol).cast("string").as("y"))
      .groupBy(col("cell"), col("x"), col("y"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rx = cxy.groupBy(col("cell"), col("x"))
      .agg(sum(col("o")).as("rt"))
    val cy = cxy.groupBy(col("cell"), col("y"))
      .agg(sum(col("o")).as("ct"))
    val nn = cxy.groupBy(col("cell"))
      .agg(sum(col("o")).as("n"))
      .join(rx.groupBy(col("cell")).agg(count(lit(1)).as("r")),
        Seq("cell"))
      .join(cy.groupBy(col("cell")).agg(count(lit(1)).as("c")),
        Seq("cell"))
    cxy
      .join(rx, Seq("cell", "x"))
      .join(cy, Seq("cell", "y"))
      .join(nn, Seq("cell"))
      .withColumn("term_milli",
        expr("cast((1000 * cast(n as decimal(38,0)) * o * o) div " +
          "(cast(rt as decimal(38,0)) * ct) as bigint)"))
      .groupBy(col("cell"))
      .agg(max(col("n")).as("n"), max(col("r")).as("r"),
        max(col("c")).as("c"),
        // the term SUM runs in decimal128 (Σ⌊10³·N·o²/(r_T·c_T)⌋ ≈
        // 10³·N·(d+1) wraps a long past N ≈ 10¹⁵/d); chi2 itself
        // (≤ 10³·N·d) is the documented long-domain bound
        greatest(lit(0L),
          (sum(dec(col("term_milli"))) - dec(max(col("n"))) * 1000)
            .cast("long")).as("chi2_milli"))
      .withColumn("dof", (col("r") - 1L) * (col("c") - 1L))
      .withColumn("rad",
        when(col("dof") > 0L, expr(
          "(1000 * cast(chi2_milli as decimal(38,0))) div " +
            "(cast(n as decimal(38,0)) * least(r - 1, c - 1))")))
      .withColumn("v_milli",
        when(col("rad").isNotNull && col("rad") < lit(9007199254740992L),
          expr("cast(floor(sqrt(cast(rad as double))) as bigint)")))
      .select(col("cell"), col("n"), col("r"), col("c"), col("dof"),
        col("chi2_milli"), col("v_milli"))
  }

  /**
   * Isotonic calibration (pool-adjacent-violators) over score bins —
   * the monotone recalibration step downstream of [[calibrationError]]:
   * a ranking model's raw per-bin positive rates can dip (overfit
   * segments, small bins), and PAV is THE least-squares monotone fit.
   * Distributed exactly via the minimax identity fitted(i) =
   * max_{j≤i} min_{k≥i} avg(j..k) — never the sequential
   * stack algorithm: per-cell bin averages land on the ppm lattice
   * F(j,k) = ⌊10⁶·(S_k − S_{j−1}) / (W_k − W_{j−1})⌋, and the minimax
   * runs over those integers (one reverse running min over k within
   * (cell, j), one max group-by over j — O(B²) pair rows per cell,
   * loudly bounded by maxBins). The floored lattice preserves the
   * proof of monotonicity: relaxing k ≥ i to k ≥ i+1 can only raise
   * the inner min, so fitted is non-decreasing in i — asserted by
   * spec, exact cross-engine.
   *
   * Input is FACT-grain (cell, bin, label ∈ {0,1}); output one row per
   * (cell, bin): (cell, bin, n, pos, raw_ppm, fitted_ppm).
   *
   * Scale shape: one corpus-sized aggregate to (cell, bin) weights is
   * the only shuffle that sees facts; the pair expansion is B²/2 rows
   * per cell on the BOUNDED bin frame (256 bins → 33k pairs), windows
   * and the final join all run on that lattice.
   */
  def isotonicCalibration(df: DataFrame, cellCol: String,
      binCol: String, labelCol: String,
      maxBins: Int = 256): DataFrame = {
    val bins = df
      .filter(col(binCol).isNotNull && col(labelCol).isNotNull)
      .select(col(cellCol).as("cell"), col(binCol).cast("long").as("bin"),
        col(labelCol).cast("long").as("lab"))
      .groupBy(col("cell"), col("bin"))
      .agg(count(lit(1)).as("w"), sum(col("lab")).as("s"))
      .localCheckpoint(true)
    val worst = bins.groupBy(col("cell")).agg(count(lit(1)).as("nb"))
      .agg(max(col("nb"))).head()
    require(worst.isNullAt(0) || worst.getLong(0) <= maxBins.toLong,
      s"isotonicCalibration: a cell holds ${worst.getLong(0)} bins " +
        s"(> maxBins = $maxBins) - coarsen the score binning first " +
        "(the contingencyPairs discipline)")
    val wI = Window.partitionBy("cell").orderBy("bin")
    val idx = bins
      .withColumn("i", row_number().over(wI).cast("long"))
      .withColumn("cw", sum(col("w")).over(
        wI.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cs", sum(col("s")).over(
        wI.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val lo = idx.select(col("cell"), col("i").as("j"),
      (col("cw") - col("w")).as("wj"), (col("cs") - col("s")).as("sj"))
    val hi = idx.select(col("cell"), col("i").as("k"),
      col("cw").as("wk"), col("cs").as("sk"))
    val wMin = Window.partitionBy("cell", "j").orderBy("k")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val fitted = lo
      .join(hi, Seq("cell"))
      .filter(col("j") <= col("k"))
      .withColumn("f", expr(
        "cast((1000000 * cast(sk - sj as decimal(38,0))) div " +
          "(wk - wj) as bigint)"))
      .withColumn("g", min(col("f")).over(wMin))
      .groupBy(col("cell"), col("k").as("i"))
      .agg(max(col("g")).as("fitted_ppm"))
    idx
      .join(fitted, Seq("cell", "i"))
      .select(col("cell"), col("bin"), col("w").as("n"),
        col("s").as("pos"),
        expr("(1000000 * s) div w").as("raw_ppm"), col("fitted_ppm"))
  }

  /**
   * Brier-score decomposition over score bins — Murphy's REL − RES +
   * UNC split of mean squared forecast error, the companion readout
   * to [[isotonicCalibration]] (REL is what PAV removes; RES is what
   * reranking could still buy): with per-bin weight w_b, positive
   * rate o_b = s_b/w_b, stated forecast p_b (the bin's ppm midpoint,
   * supplied as a column — the operator scores STATED probabilities,
   * not refit ones) and base rate ō = Σs/Σw,
   *   REL = Σ w_b(p_b − o_b)²/N,  RES = Σ w_b(o_b − ō)²/N,
   *   UNC = ō(1 − ō).
   * All on the ppm² lattice: each per-bin square lands as
   * ⌊w_b·(10⁶·s_b − p_b·w_b)² / (w_b²)⌋-style decimal128 terms summed
   * then divided by N once — the ppm_sq outputs are exact integers
   * both engines reproduce, and brier_ppm_sq = REL − RES + UNC holds
   * to the lattice (emitted so the identity is READ, not asserted).
   *
   * Output: one row per cell — (cell, n, base_ppm, rel_ppm_sq,
   * res_ppm_sq, unc_ppm_sq, brier_ppm_sq).
   *
   * Scale shape: one corpus-sized aggregate to (cell, bin, p) weights;
   * everything after is a bounded-lattice re-aggregate. No windows, no
   * joins beyond the 1-row-per-cell base-rate merge.
   */
  def brierDecomposition(df: DataFrame, cellCol: String,
      binCol: String, pCol: String, labelCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val bins = df
      .filter(col(binCol).isNotNull && col(labelCol).isNotNull &&
        col(pCol).isNotNull)
      .select(col(cellCol).as("cell"), col(binCol).cast("long").as("bin"),
        col(pCol).cast("long").as("p"),
        col(labelCol).cast("long").as("lab"))
      .groupBy(col("cell"), col("bin"), col("p"))
      .agg(count(lit(1)).as("w"), sum(col("lab")).as("s"))
    val base = bins.groupBy(col("cell"))
      .agg(sum(col("w")).as("nw"), sum(col("s")).as("ns"))
      .withColumn("base_ppm", expr("(1000000 * ns) div nw"))
    bins
      .join(base, Seq("cell"))
      .withColumn("rel_t", expr(
        """cast((cast(p as decimal(38,0)) * w - 1000000 * s) *
             (cast(p as decimal(38,0)) * w - 1000000 * s) div w
           as decimal(38,0))"""))
      .withColumn("res_t", expr(
        """cast((1000000 * cast(s as decimal(38,0)) - base_ppm * w) *
             (1000000 * cast(s as decimal(38,0)) - base_ppm * w) div w
           as decimal(38,0))"""))
      .groupBy(col("cell"))
      .agg(max(col("nw")).as("n"), max(col("base_ppm")).as("base_ppm"),
        expr("cast(sum(rel_t) div max(nw) as bigint)").as("rel_ppm_sq"),
        expr("cast(sum(res_t) div max(nw) as bigint)").as("res_ppm_sq"))
      .withColumn("unc_ppm_sq", expr(
        "cast(cast(base_ppm as decimal(38,0)) * (1000000 - base_ppm)" +
          " as bigint)"))
      .withColumn("brier_ppm_sq",
        col("rel_ppm_sq") - col("res_ppm_sq") + col("unc_ppm_sq"))
      .select(col("cell"), col("n"), col("base_ppm"), col("rel_ppm_sq"),
        col("res_ppm_sq"), col("unc_ppm_sq"), col("brier_ppm_sq"))
  }

  /**
   * Kruskal–Wallis k-sample rank test — [[mannWhitneyU]]'s k-group
   * generalization ("do ANY of these k segments draw from a shifted
   * distribution"), the omnibus gate run before k·(k−1)/2 pairwise
   * MW-U tests inflate the false-discovery rate ([[bhFdr]] is the
   * other half of that discipline). Exact in the counts-per-distinct-
   * value domain: per cell, doubled midranks (a tie run of length t
   * after c earlier rows ranks 2·c + t + 1 doubled — integers, never
   * the .5 lattice) sum per group to S2ᵢ, and
   *   h_milli = max(0, ⌊Σᵢ ⌊3000·S2ᵢ² / nᵢ⌋ / (N(N+1))⌋ − 3000(N+1))
   * (12/(N(N+1))·ΣRᵢ²/nᵢ − 3(N+1) with Rᵢ = S2ᵢ/2 — the 4 folds into
   * the 12; per-term floors undershoot < k milli, the clamp keeps the
   * all-one-group read at exactly 0). The tie-corrected statistic
   * divides by 1 − ΣT/(N³−N) as one rational:
   *   h_tie_milli = (h_milli·(N³−N)) div (N³−N − ΣT), T = t³−t,
   * null when every value ties (the correction is undefined).
   * Envelope: 3000·S2ᵢ² ≤ 1.2·10⁴·N⁴ stays inside decimal128 for
   * N ≤ ~10⁸ rows per cell (callers bin coarser past that).
   *
   * Output: (cell, k, n, dof, tie_t, h_milli, h_tie_milli).
   *
   * Scale shape: ONE corpus-sized aggregate to (cell, grp, v) counts,
   * localCheckpointed (two consumers: the value-level re-aggregate
   * and the midrank join); the rank window runs over the bounded
   * distinct-value frame, and everything downstream re-aggregates
   * count frames. No grid, no driver probe.
   */
  def kruskalWallis(df: DataFrame, cellCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gvc = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"), col("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val wB = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cv = gvc.groupBy(col("cell"), col("v"))
      .agg(sum(col("cnt")).as("t"))
      .withColumn("cb", coalesce(sum(col("t")).over(wB), lit(0L)))
    val gs = gvc
      .join(cv, Seq("cell", "v"))
      .withColumn("s2_t",
        dec(col("cnt")) * (dec(col("cb")) * 2 + col("t") + 1))
      .groupBy(col("cell"), col("grp"))
      .agg(sum(col("cnt")).as("ni"), sum(col("s2_t")).as("s2"))
    val ties = cv.groupBy(col("cell"))
      .agg(sum(dec(col("t")) * col("t") * col("t") - col("t"))
        .as("tie_t"))
    gs
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("k"), sum(col("ni")).as("n"),
        sum(expr("cast((3000 * s2 * s2) div ni as decimal(38,0))"))
          .as("hs"))
      .join(ties, Seq("cell"))
      .withColumn("h_milli", greatest(lit(0L), expr(
        """cast(hs div (cast(n as decimal(38,0)) * (n + 1)) -
             3000 * (n + 1) as bigint)""")))
      .withColumn("dof", col("k") - 1L)
      .withColumn("h_tie_milli",
        when(dec(col("n")) * col("n") * col("n") - col("n") -
            col("tie_t") > 0, expr(
          """cast((cast(h_milli as decimal(38,0)) *
               (cast(n as decimal(38,0)) * n * n - n)) div
             (cast(n as decimal(38,0)) * n * n - n - tie_t)
             as bigint)""")))
      .select(col("cell"), col("k"), col("n"), col("dof"),
        col("tie_t").cast("long").as("tie_t"), col("h_milli"),
        col("h_tie_milli"))
  }

  /**
   * Cliff's delta ordinal effect size — the companion readout
   * [[mannWhitneyU]]'s z only half-tells: z says whether A ≠ B is
   * believable, δ = P(a > b) − P(a < b) says how LARGE the dominance
   * is in a sample-size-free unit (z grows with √n on a fixed effect;
   * δ does not — the pair the A/B readouts need side by side). Exact
   * from the same counts-per-distinct-value frame: with per-value
   * counts a(v), b(v) and the cumulative b below/above v,
   *   gt = Σ a(v)·b_less(v),  lt = Σ a(v)·b_greater(v),
   *   ties = Σ a(v)·b(v),  gt + lt + ties = n_a·n_b (the identity is
   * emitted to be READ),  δ_ppm = sign·(10⁶·|gt − lt|) div (n_a·n_b)
   * (sign applied AFTER the floor — Spark's div truncates toward
   * zero, DuckDB's // floors; on the non-negative magnitude they
   * agree). The |δ| magnitude band is Romano et al.'s standard
   * ladder: < 0.147 negligible, < 0.33 small, < 0.474 medium, else
   * large.
   *
   * Output: (cell, n_a, n_b, gt, lt, ties, delta_ppm, magnitude).
   *
   * Scale shape: one corpus-sized aggregate to (cell, v) counts; one
   * window over the bounded distinct-value frame; one cell rollup.
   */
  def cliffsDelta(df: DataFrame, cellCol: String, groupCol: String,
      groupA: String, groupB: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val vc = df
      .filter(col(groupCol).isin(groupA, groupB) &&
        col(valueCol).isNotNull)
      .groupBy(col(cellCol).as("cell"),
        col(valueCol).cast("long").as("v"))
      .agg(sum(when(col(groupCol) === groupA, 1L).otherwise(0L)).as("a"),
        sum(when(col(groupCol) === groupB, 1L).otherwise(0L)).as("b"))
    val wLess = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCell = Window.partitionBy("cell")
    vc
      .withColumn("b_less", coalesce(sum(col("b")).over(wLess), lit(0L)))
      .withColumn("nb", sum(col("b")).over(wCell))
      .withColumn("b_greater", col("nb") - col("b_less") - col("b"))
      .groupBy(col("cell"))
      .agg(sum(col("a")).as("n_a"), max(col("nb")).as("n_b"),
        sum(dec(col("a")) * col("b_less")).as("gt_d"),
        sum(dec(col("a")) * col("b_greater")).as("lt_d"),
        sum(dec(col("a")) * col("b")).as("ties_d"))
      .withColumn("delta_ppm",
        when(col("n_a") > 0 && col("n_b") > 0, expr(
          """cast(case when gt_d < lt_d then -1 else 1 end *
               ((1000000 * abs(gt_d - lt_d)) div
                (cast(n_a as decimal(38,0)) * n_b)) as bigint)""")))
      .withColumn("magnitude",
        when(col("delta_ppm").isNull, lit(null).cast("string"))
          .when(abs(col("delta_ppm")) < 147000L, "negligible")
          .when(abs(col("delta_ppm")) < 330000L, "small")
          .when(abs(col("delta_ppm")) < 474000L, "medium")
          .otherwise("large"))
      .select(col("cell"), col("n_a"), col("n_b"),
        col("gt_d").cast("long").as("gt"),
        col("lt_d").cast("long").as("lt"),
        col("ties_d").cast("long").as("ties"),
        col("delta_ppm"), col("magnitude"))
  }

  /**
   * Brown–Forsythe variance-homogeneity test — the robust Levene
   * variant (deviations from the group MEDIAN, not mean): the k
   * location tests above ([[kruskalWallis]], [[welchT]]) read SHIFT;
   * this reads SPREAD — "did one segment's dispersion blow out", the
   * question behind every variance-gated sampling decision, and the
   * assumption check classic ANOVA silently needs. On z = |v − medᵢ|
   * (medᵢ the exact lower median per (cell, group) — the [[madScale]]
   * rule, min v with 2·cum ≥ n) the one-way F statistic lands as two
   * same-scale integer sums of per-group floors:
   *   ssb_t = ⌊10³·(N·Zᵢ − nᵢ·Z)² / (nᵢ·N²)⌋   (between-group SS)
   *   ssw_t = ⌊10³·(nᵢ·Z2ᵢ − Zᵢ²) / nᵢ⌋         (within-group SS)
   *   f_milli = (10³·(N−k)·Σssb_t) div ((k−1)·Σssw_t)
   * with Zᵢ = Σz, Z2ᵢ = Σz² per group (decimal128 exact). Null when
   * k < 2 or Σssw_t = 0 (all groups deviation-constant — F is
   * undefined, not infinite). Envelope: |N·Zᵢ − nᵢ·Z| < 3·10¹⁷ keeps
   * 10³·(·)² inside decimal128 — callers bin values so the per-cell
   * deviation mass does (the q98 discipline).
   *
   * Output: (cell, k, n, ssb_milli, ssw_milli, f_milli).
   *
   * Scale shape: ONE corpus-sized aggregate to (cell, grp, v) counts,
   * localCheckpointed (two consumers: the median scan and the
   * deviation join); medians come off prefix windows over the bounded
   * distinct-value frames; the moment rollup and the 1-row-per-cell
   * merge never touch facts.
   */
  def brownForsythe(df: DataFrame, cellCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gvc = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"), col("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val wCum = Window.partitionBy("cell", "grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy("cell", "grp")
    val med = gvc
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("nw", sum(col("cnt")).over(wTot))
      .filter(col("cum") * 2 >= col("nw"))
      .groupBy(col("cell"), col("grp"))
      .agg(min(col("v")).as("med"))
    val gm = gvc
      .join(med, Seq("cell", "grp"))
      .withColumn("z", abs(col("v") - col("med")))
      .groupBy(col("cell"), col("grp"))
      .agg(sum(col("cnt")).as("ni"),
        sum(dec(col("cnt")) * col("z")).as("zi"),
        sum(dec(col("cnt")) * col("z") * col("z")).as("z2i"))
    val tot = gm.groupBy(col("cell"))
      .agg(sum(col("ni")).as("n"), count(lit(1)).as("k"),
        sum(col("zi")).as("zt"))
    gm
      .join(tot, Seq("cell"))
      .withColumn("ssb_t", expr(
        """cast((1000 * (cast(n as decimal(38,0)) * zi - ni * zt) *
               (cast(n as decimal(38,0)) * zi - ni * zt)) div
             (cast(ni as decimal(38,0)) * n * n) as decimal(38,0))"""))
      .withColumn("ssw_t", expr(
        """cast((1000 * (cast(ni as decimal(38,0)) * z2i - zi * zi))
             div ni as decimal(38,0))"""))
      .groupBy(col("cell"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("ssb_t")).as("ssb"), sum(col("ssw_t")).as("ssw"))
      .withColumn("f_milli",
        when(col("k") > 1L && col("ssw") > 0, expr(
          """cast((1000 * (n - k) * ssb) div
               (cast(k - 1 as decimal(38,0)) * ssw) as bigint)""")))
      .select(col("cell"), col("k"), col("n"),
        col("ssb").cast("long").as("ssb_milli"),
        col("ssw").cast("long").as("ssw_milli"), col("f_milli"))
  }

  /**
   * Jonckheere–Terpstra ordered-alternative test — the dose-response
   * reading [[kruskalWallis]] deliberately ignores: KW asks "is ANY
   * group shifted", JT asks "do the groups shift MONOTONICALLY with
   * their order" (priority tiers, dosage levels, size classes), which
   * against an ordered alternative is far more powerful than the
   * omnibus. JT is the cross-group concordance count #{a ∈ gᵢ, b ∈
   * gⱼ, i < j : vₐ < v_b} — exactly [[kendallTauB]]'s concordant
   * pairs with x = the group ordinal, so the shared
   * [[contingencyPairs]] grid double-prefix computes it with no
   * pairwise scan (and its loud grid guard applies: bin values
   * first). Value-tied cross-group pairs count half, kept exact by
   * doubling: jt2 = 2·conc + (T_y − T_xy) with T_y = all same-value
   * pairs and T_xy = same-(group, value) pairs, both from the
   * contingency frame. The readout is the dominance share
   *   jt_ppm = ⌊10⁶·jt2 / (2·(n₀ − T_x))⌋
   * (n₀ − T_x = all cross-group pairs): 500000 is the null, above
   * reads an increasing trend, below a decreasing one — the ordered
   * k-group generalization of [[cliffsDelta]]'s scale-free unit.
   *
   * Output: (cell, k, n, jt2, max_pairs2, jt_ppm, trend ∈
   * increasing/decreasing/flat — null jt_ppm when a cell has no
   * cross-group pair).
   *
   * Scale shape: [[contingencyPairs]]'s — ONE corpus aggregate to the
   * (cell, grp, value) contingency (localCheckpointed for its
   * consumers), dense-grid windows bounded by the guard, count-frame
   * re-aggregates after.
   */
  def jonckheereTerpstra(df: DataFrame, cellCol: String,
      groupOrdCol: String, valueCol: String,
      maxGridCells: Long = 4000000L): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val (cxy, pair) = contingencyPairs(df, cellCol, groupOrdCol,
      valueCol, maxGridCells, "jonckheereTerpstra")
    val tx = cxy.groupBy(col("cell"), col("x"))
      .agg(sum(col("nxy")).as("nx"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("k"),
        expr("cast(sum(cast(nx as decimal(38,0)) * (nx - 1)) div 2" +
          " as decimal(38,0))").as("tx"))
    val ty = cxy.groupBy(col("cell"), col("y"))
      .agg(sum(col("nxy")).as("ny"))
      .groupBy(col("cell"))
      .agg(expr("cast(sum(cast(ny as decimal(38,0)) * (ny - 1)) div 2" +
        " as decimal(38,0))").as("ty"))
    val txy = cxy.groupBy(col("cell"))
      .agg(expr("cast(sum(cast(nxy as decimal(38,0)) * (nxy - 1)) " +
        "div 2 as decimal(38,0))").as("txy"))
    pair
      .join(tx, Seq("cell")).join(ty, Seq("cell")).join(txy, Seq("cell"))
      .withColumn("n0", expr("cast((n * (n - 1)) div 2 as decimal(38,0))"))
      .withColumn("jt2", col("conc") * 2 + (col("ty") - col("txy")))
      .withColumn("mp2", (col("n0") - col("tx")) * 2)
      .withColumn("jt_ppm",
        when(col("mp2") > 0,
          expr("cast((1000000 * jt2) div mp2 as bigint)")))
      .select(col("cell"), col("k"), col("n").cast("long").as("n"),
        col("jt2").cast("long").as("jt2"),
        col("mp2").cast("long").as("max_pairs2"), col("jt_ppm"),
        when(col("jt_ppm").isNull, lit(null).cast("string"))
          .when(col("jt_ppm") > 500000L, "increasing")
          .when(col("jt_ppm") < 500000L, "decreasing")
          .otherwise("flat").as("trend"))
  }

  /**
   * Wald's sequential probability ratio test (SPRT), Bernoulli case —
   * the HYPOTHESIS-TESTING sequential leg beside [[cusum]]'s
   * monitoring one: "stop the experiment as soon as the evidence is
   * in" rather than "run to a fixed n and then look" (the fixed-n
   * readouts are q103/q173/q220; SPRT's expected sample size beats
   * them ~2× at the same α/β). Offline evaluation of the sequential
   * rule over the recorded (ordered) trial stream: with H₀: p = p₀ vs
   * H₁: p = p₁, after t trials with s successes
   *   LLR_t = s·a + (t−s)·b,
   *   a = log₂(p₁/p₀) > 0,  b = log₂((1−p₁)/(1−p₀)) < 0,
   * decided the FIRST time LLR crosses log₂((1−β)/α) above (accept
   * H₁) or log₂(β/(1−α)) below (accept H₀). EXACT cross-engine: a, b
   * and both boundaries are Q20 lattice DIFFERENCES of
   * [[graft.functions.FixedLog.log2q20]] values, computed ONCE here
   * and interpolated into both engines' plans as literal constants —
   * the q46/q255 one-table discipline, so no float log ever runs in
   * either engine. Trials order by (tsCol, tieCol) — a total order,
   * so "first crossing" is defined, not partition-dependent.
   *
   * Output, one row per cell: (cell, n, s, decision ∈ h1/h0/continue,
   * n_dec, s_dec, llr_dec_q20, bound_q20) — n_dec/s_dec/llr null when
   * the walk never crosses (an honest 'continue', never a forced
   * call).
   *
   * Scale shape: one cell-keyed window pass over the facts (the q252
   * shape — two window functions sharing one exchange), then the
   * crossing argmin and the totals re-aggregate count frames. The
   * lattice constants ride the plan as literals; nothing touches the
   * driver after planning.
   */
  def sprtBernoulli(df: DataFrame, cellCol: String, tsCol: String,
      tieCol: String, successCol: String, p0Ppm: Long, p1Ppm: Long,
      alphaPpm: Long = 50000L, betaPpm: Long = 50000L): DataFrame = {
    require(0 < p0Ppm && p0Ppm < p1Ppm && p1Ppm < 1000000L,
      s"sprtBernoulli: need 0 < p0 < p1 < 1e6 ppm, got $p0Ppm/$p1Ppm")
    require(0 < alphaPpm && alphaPpm < 500000L &&
      0 < betaPpm && betaPpm < 500000L,
      s"sprtBernoulli: alpha/beta out of (0, 0.5): $alphaPpm/$betaPpm")
    val L = graft.functions.FixedLog.log2q20 _
    val a = L(p1Ppm) - L(p0Ppm)
    val b = L(1000000L - p1Ppm) - L(1000000L - p0Ppm)
    val up = L(1000000L - betaPpm) - L(alphaPpm)
    val lo = L(betaPpm) - L(1000000L - alphaPpm)
    val base = df
      .filter(col(successCol).isNotNull)
      .select(col(cellCol).as("cell"), col(tsCol).as("o1"),
        col(tieCol).as("o2"), col(successCol).cast("long").as("succ"))
    val wOrd = Window.partitionBy("cell").orderBy("o1", "o2")
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    val walk = base
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("s_t", sum(col("succ")).over(wCum))
      .withColumn("llr",
        col("s_t") * a + (col("t") - col("s_t")) * b)
    val totals = base.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("succ")).as("s"))
    val dec = walk
      .filter(col("llr") >= up || col("llr") <= lo)
      .groupBy(col("cell"))
      .agg(min(struct(col("t"), col("s_t"), col("llr"))).as("d"))
    totals
      .join(dec, Seq("cell"), "left")
      .select(col("cell"), col("n"), col("s"),
        when(col("d").isNull, "continue")
          .when(col("d.llr") >= up, "h1").otherwise("h0").as("decision"),
        col("d.t").as("n_dec"), col("d.s_t").as("s_dec"),
        col("d.llr").as("llr_dec_q20"), lit(up).as("bound_q20"))
  }

  /**
   * Friedman blocked-rank test — the repeated-measures complement of
   * [[kruskalWallis]]: KW asks "did any group's distribution shift"
   * across INDEPENDENT samples; Friedman asks it across MATCHED blocks
   * (the k systems ranked per query, the k treatments per subject —
   * the multi-system eval table every ranking comparison produces),
   * removing between-block variation that would drown the effect in
   * KW. Ranks are per-block doubled mid-ranks (rank2 = 2·below +
   * ties + 1, the [[kruskalWallis]] lattice partitioned by block);
   * with per-group doubled-rank sums R2ⱼ over n complete blocks,
   *   Q_milli = max(0, ⌊3000·ΣR2ⱼ² / (n·k·(k+1))⌋ − 3000·n·(k+1))
   * (the doubled lattice folds the classic 12/(nk(k+1)) into 3), and
   * the tie-corrected statistic rescales by the block-tie mass T =
   * Σ_blocks Σ_v (t³−t):  Q_tie = Q·nk(k²−1) div (nk(k²−1) − T),
   * null when every block is all-ties (denominator ≤ 0).
   *
   * COMPLETE blocks only — the classic design requirement: a block
   * missing a treatment is DROPPED and counted (n_dropped emitted,
   * never silently), where k is the cell-wide distinct group count.
   * Callers with one-row-per-(block,group) data pass it directly;
   * multi-observation data pre-aggregates to one value first (which
   * statistic — mean, sum, median — is the caller's design choice,
   * not this operator's).
   *
   * Output: (cell, k, n_blocks, n_dropped, tie_t, q_milli,
   * q_tie_milli).
   *
   * Scale shape: one corpus aggregate to (cell, block, grp) grain;
   * rank windows run inside (cell, block) partitions — k rows each,
   * never a cell-wide sort; the cell-distinct group count and the
   * final rollup are |cells|-bounded broadcasts.
   */
  def friedman(df: DataFrame, cellCol: String, blockCol: String,
      grpCol: String, valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val (dropped, r2, ties) =
      blockedRanks(df, cellCol, blockCol, grpCol, valueCol)
    val r2agg = r2
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("k"), sum(col("r2j") * col("r2j")).as("ss"))
    // dropped drives: a cell whose every block was incomplete still
    // reports (n_blocks = 0, n_dropped, null statistics) — the design
    // failure is data the caller must see
    dropped
      .join(r2agg, Seq("cell"), "left")
      .join(ties, Seq("cell"), "left")
      .withColumn("q_milli",
        when(col("n_blocks") > 0, greatest(lit(0L), expr(
          """cast((3000 * ss) div
               (cast(n_blocks as decimal(38,0)) * k * (k + 1)) -
             3000 * n_blocks * (k + 1) as bigint)"""))))
      .withColumn("q_tie_milli",
        when(col("q_milli").isNotNull &&
          dec(col("n_blocks")) * col("k") *
            (dec(col("k")) * col("k") - 1) - col("tie_t") > 0, expr(
          """cast((cast(q_milli as decimal(38,0)) *
               (cast(n_blocks as decimal(38,0)) * k *
                 (cast(k as decimal(38,0)) * k - 1))) div
             (cast(n_blocks as decimal(38,0)) * k *
               (cast(k as decimal(38,0)) * k - 1) - tie_t)
             as bigint)""")))
      .select(col("cell"), col("k"), col("n_blocks"), col("n_dropped"),
        col("tie_t").cast("long").as("tie_t"), col("q_milli"),
        col("q_tie_milli"))
  }

  /**
   * Wilcoxon signed-rank test — the PAIRED complement of
   * [[mannWhitneyU]]: MWU compares two independent samples; this
   * tests whether paired differences (before/after per subject, model
   * A − model B per prompt) center on zero, on the exact doubled
   * mid-rank lattice over |d|. Zero differences are dropped per the
   * classic treatment and COUNTED (n_zero — a mostly-zero diff column
   * should be read, not hidden). With S2⁺ = Σ rank2(|d|) over d > 0
   * and n nonzero pairs, the centered numerator is
   *   num4 = 2·S2⁺ − n(n+1)   (= 4·(W⁺ − μ), doubled lattice ×2)
   * and with tie mass T = Σ(t³−t) over |d| values,
   *   z² = 3·num4² / (2n(n+1)(2n+1) − T),
   * emitted as z_milli = sign(num4)·⌊√(10⁶·z²)⌋ under the welchT
   * radicand guard (null at ≥ 2⁵³ rather than silently
   * double-rounded).
   *
   * Output: (cell, n_pairs, n_zero, n, s2_plus, tie_t, z_milli).
   *
   * Scale shape: one corpus aggregate to (cell, |d|) counts with the
   * positive mass alongside; one prefix window over the bounded
   * distinct-|d| frame; one cell rollup. Null when n = 0 or the
   * variance term is ≤ 0 (all differences tie at one magnitude).
   */
  def wilcoxonSignedRank(df: DataFrame, cellCol: String, aCol: String,
      bCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d0 = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(cellCol).as("cell"),
        (col(aCol).cast("long") - col(bCol).cast("long")).as("d"))
    val zeros = d0.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d") === 0L, 1L).otherwise(0L)).as("n_zero"))
    val vc = d0.filter(col("d") =!= 0L)
      .groupBy(col("cell"), abs(col("d")).as("ad"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("d") > 0L, 1L).otherwise(0L)).as("pos"))
    val wB = Window.partitionBy("cell").orderBy("ad")
      .rowsBetween(Window.unboundedPreceding, -1)
    val agg = vc
      .withColumn("cb", coalesce(sum(col("t")).over(wB), lit(0L)))
      .groupBy(col("cell"))
      .agg(sum(col("t")).as("n"),
        sum(dec(col("pos")) * (dec(col("cb")) * 2 + col("t") + 1))
          .as("s2_plus"),
        sum(dec(col("t")) * col("t") * col("t") - col("t")).as("tie_t"))
    zeros.join(agg, Seq("cell"), "left")
      .withColumn("num4",
        when(col("n").isNotNull,
          dec(col("s2_plus")) * 2 - dec(col("n")) * (col("n") + 1)))
      .withColumn("den",
        when(col("n").isNotNull,
          dec(col("n")) * (col("n") + 1) * (col("n") * 2 + 1) * 2 -
            col("tie_t")))
      .withColumn("rad",
        when(col("den").isNotNull && col("den") > 0,
          expr("(3000000 * num4 * num4) div den")))
      .withColumn("z_milli",
        when(col("rad").isNotNull && col("rad") < lit(9007199254740992L),
          expr("""cast(sign(num4) as bigint) *
            cast(floor(sqrt(cast(rad as double))) as bigint)""")))
      .select(col("cell"), col("n_pairs"), col("n_zero"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("s2_plus").cast("long").as("s2_plus"),
        col("tie_t").cast("long").as("tie_t"), col("z_milli"))
  }

  /**
   * McNemar paired-binary test — did a model CHANGE more answers for
   * the better than for the worse: on paired outcome bits (x = before
   * correct, y = after correct), only the DISCORDANT pairs carry
   * signal — b = #(1→0), c = #(0→1) — and
   *   χ²_milli = ⌊1000·(b−c)² / (b+c)⌋,
   *   χ²cc_milli = ⌊1000·max(|b−c|−1, 0)² / (b+c)⌋ (Edwards
   * continuity correction — the guard against the ±1 discreteness at
   * small discordant counts; emitting BOTH makes the correction's
   * bite readable). Null when b+c = 0 (no discordant pairs — the
   * test is undefined, not zero). The concordant counts ride along
   * so the readout shows how much of the sample the test ignored.
   *
   * Output: (cell, n_pairs, n_both, n_neither, b, c, chi2_milli,
   * chi2_cc_milli).
   *
   * Scale shape: ONE map-side-combined aggregate to four counts per
   * cell — nothing else shuffles.
   */
  def mcnemar(df: DataFrame, cellCol: String, xCol: String,
      yCol: String): DataFrame =
    df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("x") === 1L && col("y") === 1L, 1L).otherwise(0L))
          .as("n_both"),
        sum(when(col("x") === 0L && col("y") === 0L, 1L).otherwise(0L))
          .as("n_neither"),
        sum(when(col("x") === 1L && col("y") === 0L, 1L).otherwise(0L))
          .as("b"),
        sum(when(col("x") === 0L && col("y") === 1L, 1L).otherwise(0L))
          .as("c"))
      .withColumn("chi2_milli",
        when(col("b") + col("c") > 0, expr(
          "cast((1000 * cast(b - c as decimal(38,0)) * (b - c)) div " +
            "(b + c) as bigint)")))
      .withColumn("chi2_cc_milli",
        when(col("b") + col("c") > 0, expr(
          """cast((1000 * cast(greatest(abs(b - c) - 1, 0) as
               decimal(38,0)) * greatest(abs(b - c) - 1, 0)) div
             (b + c) as bigint)""")))
      .select(col("cell"), col("n_pairs"), col("n_both"),
        col("n_neither"), col("b"), col("c"), col("chi2_milli"),
        col("chi2_cc_milli"))

  /**
   * Cochran–Armitage trend test — is a success RATE monotone in an
   * ordered exposure (does quality-gate pass rate fall with document
   * length bucket; does defect rate rise with batch size): the 2×k
   * contingency test with the k levels' ORDER built in, which the
   * omnibus χ² ([[chiSquareRxC]]'s geometry) deliberately ignores.
   * With integer level scores sᵢ, per-level totals nᵢ and successes
   * rᵢ, N = Σnᵢ, R = Σrᵢ:
   *   num = Σ sᵢ·(rᵢ·N − nᵢ·R)
   *   z²  = N·num² / (R·(N−R)·(N·Σsᵢ²nᵢ − (Σsᵢnᵢ)²))
   * — every term integer-exact in decimal128 — emitted as z_milli =
   * sign(num)·⌊√(10⁶·z²)⌋ under the radicand guard. The sign carries
   * the trend DIRECTION (positive = rate rises with score). Null when
   * R = 0, R = N, or the score variance is 0 (one level).
   *
   * Output: (cell, k_levels, n, r, t_num, z_milli).
   *
   * Scale shape: one map-side-combined aggregate to (cell, score)
   * totals; a |cells×levels| rollup; nothing else shuffles. Envelope:
   * 10⁶·N·num² needs |num| ≲ 10¹⁶/√N at decimal128 — callers keep
   * scores small ordinals (the bin index, not the raw value; the q98
   * binning discipline).
   */
  def cochranArmitage(df: DataFrame, cellCol: String, scoreCol: String,
      successCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df
      .filter(col(scoreCol).isNotNull && col(successCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(scoreCol).cast("long").as("s"),
        col(successCol).cast("long").as("succ"))
      .groupBy(col("cell"), col("s"))
      .agg(count(lit(1)).as("ni"), sum(col("succ")).as("ri"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("k_levels"),
        sum(col("ni")).as("n"), sum(col("ri")).as("r"),
        sum(dec(col("s")) * col("ni")).as("sn"),
        sum(dec(col("s")) * col("s") * col("ni")).as("s2n"),
        sum(dec(col("s")) * col("ri")).as("sr"))
      .withColumn("t_num",
        dec(col("sr")) * col("n") - dec(col("sn")) * col("r"))
      .withColumn("den",
        dec(col("r")) * (col("n") - col("r")) *
          (dec(col("s2n")) * col("n") - dec(col("sn")) * col("sn")))
      .withColumn("rad",
        when(col("den") > 0,
          expr("(1000000 * n * t_num * t_num) div den")))
      .withColumn("z_milli",
        when(col("rad").isNotNull && col("rad") < lit(9007199254740992L),
          expr("""cast(sign(t_num) as bigint) *
            cast(floor(sqrt(cast(rad as double))) as bigint)""")))
      .select(col("cell"), col("k_levels"), col("n"), col("r"),
        col("t_num").cast("long").as("t_num"), col("z_milli"))
  }

  /**
   * Fleiss' kappa — multi-rater categorical agreement, the k-rater
   * generalization [[q183's|AnalyticsQueries]] two-rater Cohen κ
   * cannot provide (label-quality audits run 3+ annotators; pairwise
   * Cohen over-counts shared marginal bias). On the classic complete
   * design — exactly `nRaters` ratings per item — with per-(item,
   * category) counts n_ij, N items, category marginals c_j = Σᵢn_ij,
   * S2 = ΣΣn_ij², C2 = Σc_j²:
   *   κ = (N·n·(S2 − N·n) − (n−1)·C2) / ((n−1)·(N²n² − C2))
   * (the closed rational form of (P̄−P̄ₑ)/(1−P̄ₑ); exact in
   * decimal128), emitted sign-after-floor in ppm alongside the two
   * agreement components — p_bar_ppm = 10⁶(S2−Nn)/(Nn(n−1)) and
   * p_e_ppm = 10⁶·C2/(N²n²) — so the κ denominator's meaning is
   * READ, not recalled. Items with a rating count ≠ nRaters are
   * DROPPED and counted (n_dropped): an incomplete panel is a data
   * fact, not an interpolation license. Null κ when P̄ₑ = 1 (every
   * rating one category — agreement is undefined, not perfect).
   *
   * Output: (cell, n_items, n_raters, n_dropped, p_bar_ppm, p_e_ppm,
   * kappa_ppm).
   *
   * Scale shape: one aggregate to (cell, item, category) counts, one
   * item-keyed completeness filter, two bounded rollups (item grain,
   * then cell grain). Category marginals are a |cells×categories|
   * frame. Nothing driver-side.
   */
  def fleissKappa(df: DataFrame, cellCol: String, itemCol: String,
      categoryCol: String, nRaters: Int): DataFrame = {
    require(nRaters >= 2, s"nRaters >= 2, got $nRaters")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val ic = df
      .filter(col(categoryCol).isNotNull)
      .groupBy(col(cellCol).as("cell"), col(itemCol).as("item"),
        col(categoryCol).cast("string").as("cat"))
      .agg(count(lit(1)).as("nij"))
    val itemTot = ic.groupBy(col("cell"), col("item"))
      .agg(sum(col("nij")).as("nr"))
      .withColumn("ok", col("nr") === nRaters.toLong)
      .localCheckpoint(true)
    val dropped = itemTot.groupBy(col("cell"))
      .agg(sum(when(col("ok"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_items"))
    val kept = ic.join(itemTot.filter(col("ok"))
      .select(col("cell"), col("item")), Seq("cell", "item"))
    val marg = kept.groupBy(col("cell"), col("cat"))
      .agg(sum(col("nij")).as("cj"))
      .groupBy(col("cell"))
      .agg(sum(dec(col("cj")) * col("cj")).as("c2"))
    val s2 = kept.groupBy(col("cell"))
      .agg(sum(dec(col("nij")) * col("nij")).as("s2"))
    dropped
      .join(s2, Seq("cell"), "left")
      .join(marg, Seq("cell"), "left")
      .withColumn("nn", dec(col("n_items")) * nRaters)
      .withColumn("p_bar_ppm",
        when(col("n_items") > 0, expr(
          s"""cast((1000000 * (s2 - nn)) div
               (nn * ${nRaters - 1}) as bigint)""")))
      .withColumn("p_e_ppm",
        when(col("n_items") > 0,
          expr("cast((1000000 * c2) div (nn * nn) as bigint)")))
      .withColumn("knum",
        when(col("n_items") > 0,
          dec(col("n_items")) * nRaters * (col("s2") - col("nn")) -
            (col("c2") * (nRaters - 1))))
      .withColumn("kden",
        when(col("n_items") > 0,
          (col("nn") * col("nn") - col("c2")) * (nRaters - 1)))
      .withColumn("kappa_ppm",
        when(col("kden").isNotNull && col("kden") > 0, expr(
          """cast(case when knum < 0 then -1 else 1 end *
               ((1000000 * abs(knum)) div kden) as bigint)""")))
      .select(col("cell"), col("n_items"),
        lit(nRaters.toLong).as("n_raters"), col("n_dropped"),
        col("p_bar_ppm"), col("p_e_ppm"), col("kappa_ppm"))
  }

  /**
   * Dunn's post-hoc pairwise test — the step [[kruskalWallis]]'s
   * omnibus verdict leaves open: KW says SOME group shifted; Dunn
   * says WHICH pairs differ, using the cell-wide mid-rank frame KW
   * already built (not pairwise MWU re-ranks — Dunn's variance is
   * pooled from ALL groups, the statistically correct follow-up).
   * With cell-wide doubled-rank sums R2ᵢ, sizes nᵢ, N = Σnᵢ and tie
   * mass T = Σ(t³−t), for each pair (a, b):
   *   D = R2ₐ·n_b − R2_b·nₐ      (positive ⇒ a ranks higher)
   *   z² = 3·(N−1)·D² / (nₐ·n_b·(nₐ+n_b)·(N·(N²−1) − T))
   * emitted as z_milli = sign(D)·⌊√(10⁶·z²)⌋. The radicand runs as a
   * TWO-STAGE floor — (3·10⁶·(N−1)·|D| div nₐn_b(nₐ+n_b))·|D| div
   * (N(N²−1)−T) — keeping every intermediate inside decimal128 at
   * the ×10 gate scale (the single-expression form overflows near
   * N ≈ 10⁶); the oracle replays the identical floor sequence. The
   * Bonferroni-adjusted 5% two-sided line for m = k(k−1)/2
   * comparisons is the caller's read of |z| (q253's BH machinery
   * applies downstream when p-ranks are wanted).
   *
   * Output: (cell, grp_a, grp_b, n_a, n_b, d_sign, z_milli), one row
   * per unordered pair, grp_a < grp_b lexically.
   *
   * Scale shape: the rank machinery is [[kruskalWallis]]'s — one
   * (cell, grp, v) aggregate, windows over bounded distinct-value
   * frames; the pair join runs on the |cells×k| per-group frame
   * (broadcast), never on facts.
   */
  def dunnTest(df: DataFrame, cellCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val gvc = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"), col("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val wB = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cv = gvc.groupBy(col("cell"), col("v"))
      .agg(sum(col("cnt")).as("t"))
      .withColumn("cb", coalesce(sum(col("t")).over(wB), lit(0L)))
    val gs = gvc
      .join(cv, Seq("cell", "v"))
      .groupBy(col("cell"), col("grp"))
      .agg(sum(col("cnt")).as("ni"),
        sum(dec(col("cnt")) * (dec(col("cb")) * 2 + col("t") + 1))
          .as("r2"))
    val cellTot = cv.groupBy(col("cell"))
      .agg(sum(col("t")).as("nn"),
        sum(dec(col("t")) * col("t") * col("t") - col("t")).as("tie_t"))
    gs.as("a")
      .join(gs.as("b"),
        col("a.cell") === col("b.cell") && col("a.grp") < col("b.grp"))
      .select(col("a.cell").as("cell"),
        col("a.grp").as("grp_a"), col("b.grp").as("grp_b"),
        col("a.ni").as("n_a"), col("b.ni").as("n_b"),
        (col("a.r2") * col("b.ni") - col("b.r2") * col("a.ni")).as("d"))
      .join(broadcast(cellTot), Seq("cell"))
      .withColumn("den2",
        dec(col("nn")) * (dec(col("nn")) * col("nn") - 1) - col("tie_t"))
      .withColumn("rad",
        when(col("den2") > 0 && col("n_a") > 0 && col("n_b") > 0, expr(
          """((3000000 * cast(nn - 1 as decimal(38,0)) * abs(d)) div
               (cast(n_a as decimal(38,0)) * n_b * (n_a + n_b))) *
             abs(d) div den2""")))
      .withColumn("z_milli",
        when(col("rad").isNotNull && col("rad") < lit(9007199254740992L),
          expr("""cast(sign(d) as bigint) *
            cast(floor(sqrt(cast(rad as double))) as bigint)""")))
      .select(col("cell"), col("grp_a"), col("grp_b"), col("n_a"),
        col("n_b"), expr("cast(sign(d) as bigint)").as("d_sign"),
        col("z_milli"))
  }

  /**
   * Mantel–Haenszel pooled odds ratio over stratified 2×2 tables —
   * the confounding-proof effect estimate, with the crude (pooled-
   * first) odds ratio alongside and a SIMPSON FLIP flag when the two
   * disagree in direction: the textbook audit for any "model B wins"
   * claim that ignores a stratifying variable (prompt length, source,
   * difficulty). Per stratum i with cells a (exposed·success),
   * b (exposed·failure), c (unexposed·success), d (unexposed·
   * failure), nᵢ = a+b+c+d, the estimator is Σ(aᵢdᵢ/nᵢ) / Σ(bᵢcᵢ/nᵢ);
   * ON THE LATTICE each stratum term floors once to ppm —
   * r6ᵢ = (10⁶·aᵢ·dᵢ) div nᵢ, s6ᵢ = (10⁶·bᵢ·cᵢ) div nᵢ — and
   * or_mh_ppm = (10⁶·Σr6) div Σs6 (the per-stratum floor is the
   * DEFINED estimator both engines replay; error < |strata|·10⁻⁶
   * relative). Crude: or_ppm = (10⁶·A·D) div (B·C) on the pooled
   * margins. flip = the two sit on strictly opposite sides of 1.
   * Nulls where a denominator is 0 (no discordant product — the OR
   * is undefined, not infinite; flip needs both defined).
   *
   * Output: (cell, n_strata, n, or_crude_ppm, or_mh_ppm,
   * simpson_flip).
   *
   * Scale shape: one map-side-combined aggregate to (cell, stratum)
   * 2×2 counts, one cell rollup. Nothing else shuffles.
   */
  def mantelHaenszel(df: DataFrame, cellCol: String, stratumCol: String,
      exposedCol: String, outcomeCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    df
      .filter(col(exposedCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(cellCol).as("cell"), col(stratumCol).as("stratum"),
        col(exposedCol).cast("long").as("e"),
        col(outcomeCol).cast("long").as("o"))
      .groupBy(col("cell"), col("stratum"))
      .agg(sum(when(col("e") === 1L && col("o") === 1L, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("e") === 1L && col("o") === 0L, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("e") === 0L && col("o") === 1L, 1L)
          .otherwise(0L)).as("c"),
        sum(when(col("e") === 0L && col("o") === 0L, 1L)
          .otherwise(0L)).as("d"))
      .withColumn("ni", col("a") + col("b") + col("c") + col("d"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_strata"), sum(col("ni")).as("n"),
        sum(col("a")).as("aa"), sum(col("b")).as("bb"),
        sum(col("c")).as("cc"), sum(col("d")).as("dd"),
        sum(expr("(1000000 * cast(a as decimal(38,0)) * d) div ni"))
          .as("r6"),
        sum(expr("(1000000 * cast(b as decimal(38,0)) * c) div ni"))
          .as("s6"))
      .withColumn("or_crude_ppm",
        when(dec(col("bb")) * col("cc") > 0, expr(
          "cast((1000000 * cast(aa as decimal(38,0)) * dd) div " +
            "(cast(bb as decimal(38,0)) * cc) as bigint)")))
      .withColumn("or_mh_ppm",
        when(col("s6") > 0,
          expr("cast((1000000 * r6) div s6 as bigint)")))
      .withColumn("simpson_flip",
        when(col("or_crude_ppm").isNotNull && col("or_mh_ppm").isNotNull,
          (col("or_crude_ppm") > 1000000L && col("or_mh_ppm") < 1000000L) ||
            (col("or_crude_ppm") < 1000000L && col("or_mh_ppm") > 1000000L)))
      .select(col("cell"), col("n_strata"), col("n"),
        col("or_crude_ppm"), col("or_mh_ppm"), col("simpson_flip"))
  }

  /**
   * Restricted mean survival time — the scalar the [[kmSurvival]]
   * curve and the q250 log-rank verdict both stop short of: "how much
   * lifetime does a subject get, on average, within the first τ
   * units" — the area under the KM step function on [0, τ], the
   * effect-SIZE companion to log-rank's significance (medians fail
   * when S never crosses ½; RMST always exists). Computed from the
   * kmSurvival lattice directly: the segment before the first death
   * carries S = 10⁶, each step t_k carries its floored surv_ppm until
   * the next step or τ, and a cohort with NO observed deaths reads
   * the full τ·10⁶ — driven from subject totals, so all-censored
   * cohorts emit rather than vanish.
   *   rmst_ppm = 10⁶·min(t₁, τ) + Σ s_k·max(0, min(t_{k+1}, τ) − t_k)
   * in ppm·duration units (divide by 10⁶ for duration units; exact,
   * since every input is the already-floored curve).
   *
   * Output: (cohort, tau, n_subjects, n_events, n_steps, rmst_ppm).
   *
   * Scale shape: [[kmSurvival]]'s — subjects collapse to duration
   * counts; the segment fold is a lead window over the bounded step
   * frame plus a cohort rollup.
   */
  def rmst(subjects: DataFrame, cohortCol: String, durCol: String,
      eventCol: String, tau: Long): DataFrame = {
    require(tau > 0, s"tau > 0, got $tau")
    val curve = kmSurvival(subjects, cohortCol, durCol, eventCol)
    val w = Window.partitionBy("cohort").orderBy("t")
    val seg = curve
      .withColumn("next_t", coalesce(lead(col("t"), 1).over(w), lit(tau)))
      .withColumn("contrib",
        col("surv_ppm") * greatest(lit(0L),
          least(col("next_t"), lit(tau)) - least(col("t"), lit(tau))))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_steps"), min(col("t")).as("first_t"),
        sum(col("contrib")).as("tail_area"))
    subjects
      .groupBy(col(cohortCol).as("cohort"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(col(eventCol).cast("long")).as("n_events"))
      .join(seg, Seq("cohort"), "left")
      .select(col("cohort"), lit(tau).as("tau"), col("n_subjects"),
        col("n_events"),
        coalesce(col("n_steps"), lit(0L)).as("n_steps"),
        (lit(1000000L) *
          least(coalesce(col("first_t"), lit(tau)), lit(tau)) +
          coalesce(col("tail_area"), lit(0L))).as("rmst_ppm"))
  }

  /**
   * Wilson score interval — the per-cell success-rate confidence
   * band that stays honest at extreme rates and small n, where the
   * Wald ±z√(p̂(1−p̂)/n) band collapses to zero width at p̂ ∈ {0,1}
   * and escapes [0,1]: the correct readout for eval dashboards and
   * quality-gate pass rates. At z = 1.96 (95% two-sided), on the 10⁴
   * lattice (z·10⁴ = 19600, z²·10⁴ = 38416), with n4 = 10⁴n + 38416:
   *   center_ppm = (10⁶·(10⁴·r + 19208)) div n4
   *   rad        = (10¹²·38416·(4·10⁴·r·(n−r) + 38416·n))
   *                  div (4·n·n4²)          (= half-width² in ppm²)
   *   half_ppm   = ⌊√rad⌋  (guarded < 2⁵³)
   * and the band clamps to [0, 10⁶], with the r = 0 / r = n edges
   * pinned to their analytic 0 / 10⁶ identities (the closed form
   * collapses there; two separate floors would read 1 ppm short).
   * The numerator stays < 1.4·10³⁴ at n = 10⁷ — inside
   * decimal128/HUGEINT at the ×10 gate.
   *
   * Output: (cell, n, r, p_ppm, center_ppm, lo_ppm, hi_ppm).
   *
   * Scale shape: one map-side-combined aggregate to (n, r) per cell;
   * everything after is per-cell scalar arithmetic.
   */
  def wilsonInterval(df: DataFrame, cellCol: String,
      successCol: String): DataFrame =
    df
      .filter(col(successCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(successCol).cast("long").as("succ"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("succ")).as("r"))
      .withColumn("n4",
        (col("n").cast("decimal(38,0)") * 10000) + 38416)
      .withColumn("center_ppm", expr(
        "cast((1000000 * (10000 * cast(r as decimal(38,0)) + 19208)) " +
          "div n4 as bigint)"))
      .withColumn("rad", expr(
        """(1000000000000 * 38416 *
             (40000 * cast(r as decimal(38,0)) * (n - r) + 38416 * n))
           div (4 * cast(n as decimal(38,0)) * n4 * n4)"""))
      .withColumn("half_ppm",
        when(col("rad") < lit(9007199254740992L),
          expr("cast(floor(sqrt(cast(rad as double))) as bigint)")))
      .select(col("cell"), col("n"), col("r"),
        expr("(1000000 * r) div n").as("p_ppm"), col("center_ppm"),
        // explicit null-through: Spark's greatest/least SKIP nulls, so
        // an unguarded clamp would turn a guarded-out half-width into
        // a fake 0/10⁶ band. The r = 0 / r = n edges are ANALYTIC
        // identities (lo = 0, hi = 1 exactly — the closed form
        // collapses); pinning them beats the ±1 ppm residue two
        // separate floors would leave
        when(col("half_ppm").isNotNull,
          when(col("r") === 0L, 0L).otherwise(
            greatest(lit(0L), col("center_ppm") - col("half_ppm"))))
          .as("lo_ppm"),
        when(col("half_ppm").isNotNull,
          when(col("r") === col("n"), 1000000L).otherwise(
            least(lit(1000000L), col("center_ppm") + col("half_ppm"))))
          .as("hi_ppm"))

  /**
   * Mood's median test — the k-sample location test that asks ONLY
   * "does each group put the expected mass above the pooled median",
   * trading [[kruskalWallis]]'s rank power for total outlier
   * immunity (a group's values beyond the median can move arbitrarily
   * without changing the statistic — the right gate when heavy tails
   * are the data's nature, not its defect). The pooled cell median is
   * the exact lower median ([[madScale]] rule: min v with 2·cum ≥ N);
   * per group the above/not-above counts form a 2×k table and
   *   χ²_milli = Σᵢ ⌊1000·(aᵢN − nᵢA)²/(N·nᵢ·A)⌋
   *            + ⌊1000·(bᵢN − nᵢB)²/(N·nᵢ·B)⌋
   * (A = Σaᵢ above-mass, B = N−A; per-term floors, the q103/q254
   * lattice). Null when A = 0 or B = 0 (a median at the domain edge
   * leaves one row of the table empty — the test is undefined).
   *
   * Output: (cell, k, n, med, n_above, chi2_milli, dof).
   *
   * Scale shape: one (cell, grp, v) aggregate feeds both the pooled
   * median (prefix window over the bounded (cell, v) frame) and the
   * above-split rollup; the median joins back broadcast.
   */
  def moodsMedian(df: DataFrame, cellCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val gvc = df
      .filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"), col("grp"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val wCum = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy("cell")
    val med = gvc.groupBy(col("cell"), col("v"))
      .agg(sum(col("cnt")).as("t"))
      .withColumn("cum", sum(col("t")).over(wCum))
      .withColumn("ntot", sum(col("t")).over(wTot))
      .filter(col("cum") * 2 >= col("ntot"))
      .groupBy(col("cell"))
      .agg(min(col("v")).as("med"))
    val grp = gvc
      .join(broadcast(med), Seq("cell"))
      .groupBy(col("cell"), col("grp"))
      .agg(max(col("med")).as("med"), sum(col("cnt")).as("ni"),
        sum(when(col("v") > col("med"), col("cnt")).otherwise(0L))
          .as("ai"))
    val tot = grp.groupBy(col("cell"))
      .agg(count(lit(1)).as("k"), sum(col("ni")).as("nn"),
        sum(col("ai")).as("aTot"))
    grp
      .join(broadcast(tot), Seq("cell"))
      .withColumn("term",
        when(col("aTot") > 0 && col("aTot") < col("nn"),
          expr("""(1000 * (cast(ai as decimal(38,0)) * nn -
                     cast(ni as decimal(38,0)) * aTot) *
                   (cast(ai as decimal(38,0)) * nn -
                     cast(ni as decimal(38,0)) * aTot)) div
                 (cast(nn as decimal(38,0)) * ni * aTot)""") +
            expr("""(1000 * (cast(ni - ai as decimal(38,0)) * nn -
                       cast(ni as decimal(38,0)) * (nn - aTot)) *
                     (cast(ni - ai as decimal(38,0)) * nn -
                       cast(ni as decimal(38,0)) * (nn - aTot))) div
                   (cast(nn as decimal(38,0)) * ni * (nn - aTot))""")))
      .groupBy(col("cell"))
      .agg(max(col("k")).as("k"), max(col("nn")).as("n"),
        max(col("med")).as("med"), max(col("aTot")).as("n_above"),
        sum(col("term")).as("chi2_d"))
      .select(col("cell"), col("k"), col("n"), col("med"),
        col("n_above"),
        col("chi2_d").cast("long").as("chi2_milli"),
        (col("k") - 1L).as("dof"))
  }

  /** Shared complete-block doubled-rank core of [[friedman]],
    * [[pageTrend]] and [[kendallW]]: enforce block completeness (every
    * block holds exactly one observation of each of the cell's k
    * groups; incomplete blocks drop AND count — a silent drop would
    * bias every downstream rank sum), double mid-ranks within block so
    * ties stay on the integer lattice, and return the three bounded
    * frames every blocked-rank statistic consumes: per-cell drop
    * accounting (n_blocks, n_dropped), per-(cell, grp) doubled-rank
    * sums r2j, and the per-cell block-tie mass Σ(t³−t). Rank windows
    * run inside (cell, block) partitions — k rows each, never a
    * cell-wide sort. */
  private def blockedRanks(df: DataFrame, cellCol: String,
      blockCol: String, grpCol: String, valueCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df
      .filter(col(grpCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"), col(blockCol).as("block"),
        col(grpCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
    val kPerCell = base.groupBy(col("cell"))
      .agg(countDistinct(col("grp")).as("k"))
    val blockStat = base.groupBy(col("cell"), col("block"))
      .agg(count(lit(1)).as("nb"), countDistinct(col("grp")).as("gb"))
      .join(broadcast(kPerCell), Seq("cell"))
      .withColumn("ok", col("nb") === col("k") && col("gb") === col("k"))
    val dropped = blockStat.groupBy(col("cell"))
      .agg(sum(when(col("ok"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_blocks"))
    val kept = base.join(
      blockStat.filter(col("ok")).select(col("cell"), col("block")),
      Seq("cell", "block"))
    val wB = Window.partitionBy("cell", "block").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bv = kept.groupBy(col("cell"), col("block"), col("v"))
      .agg(count(lit(1)).as("t"))
      .withColumn("cb", coalesce(sum(col("t")).over(wB), lit(0L)))
      .localCheckpoint(true)
    val r2 = kept
      .join(bv, Seq("cell", "block", "v"))
      .withColumn("rank2", col("cb") * 2 + col("t") + 1)
      .groupBy(col("cell"), col("grp"))
      .agg(sum(dec(col("rank2"))).as("r2j"))
    val ties = bv.groupBy(col("cell"))
      .agg(sum(dec(col("t")) * col("t") * col("t") - col("t"))
        .as("tie_t"))
    (dropped, r2, ties)
  }

  /**
   * Cochran's Q — the k-treatment generalization of McNemar (q269):
   * did ANY of k matched binary treatments change the success rate,
   * across blocks (subjects) that saw every treatment. The closed
   * rational form off complete blocks only ([[friedman]] discipline —
   * incomplete blocks drop AND count):
   *   Q = (k−1)·(k·ΣGⱼ² − N²) / (k·N − ΣLᵢ²)
   * with Gⱼ = per-treatment success sums, Lᵢ = per-block success
   * sums, N = ΣGⱼ = ΣLᵢ — every term an exact integer, so
   * q_milli = ⌊1000·(k−1)·(k·ΣGⱼ² − N²) / (k·N − ΣLᵢ²)⌋ hash-gates.
   * The numerator is ≥ 0 by Cauchy–Schwarz; the denominator is 0
   * exactly when every block answered all-0 or all-k (no discordance
   * anywhere — the statistic is undefined, emitted null, the McNemar
   * zero-discordance convention).
   *
   * Output: (cell, k, n_blocks, n_dropped, n_succ, q_milli, dof).
   *
   * Scale shape: one corpus aggregate to (cell, block) grain feeds
   * both the completeness gate and the Lᵢ² sum; the Gⱼ aggregate and
   * the final rollup run on bounded frames; nothing re-sorts.
   */
  def cochranQ(df: DataFrame, cellCol: String, blockCol: String,
      grpCol: String, outcomeCol: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val base = df
      .filter(col(grpCol).isNotNull && col(outcomeCol).isNotNull)
      .select(col(cellCol).as("cell"), col(blockCol).as("block"),
        col(grpCol).cast("string").as("grp"),
        when(col(outcomeCol).cast("long") > 0, 1L).otherwise(0L)
          .as("y"))
    val kPerCell = base.groupBy(col("cell"))
      .agg(countDistinct(col("grp")).as("k"))
    val blockStat = base.groupBy(col("cell"), col("block"))
      .agg(count(lit(1)).as("nb"), countDistinct(col("grp")).as("gb"),
        sum(col("y")).as("li"))
      .join(broadcast(kPerCell), Seq("cell"))
      .withColumn("ok", col("nb") === col("k") && col("gb") === col("k"))
    val perCell = blockStat.groupBy(col("cell"))
      .agg(max(col("k")).as("k"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_blocks"),
        sum(when(col("ok"), col("li")).otherwise(0L)).as("n_succ"),
        sum(when(col("ok"), dec(col("li")) * col("li"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("sum_l2"))
    val gj = base.join(
        blockStat.filter(col("ok")).select(col("cell"), col("block")),
        Seq("cell", "block"))
      .groupBy(col("cell"), col("grp"))
      .agg(sum(col("y")).as("gjs"))
      .groupBy(col("cell"))
      .agg(sum(dec(col("gjs")) * col("gjs")).as("sum_g2"))
    perCell
      .join(gj, Seq("cell"), "left")
      .withColumn("den",
        dec(col("k")) * col("n_succ") - col("sum_l2"))
      .withColumn("q_milli",
        when(col("n_blocks") > 0 && col("den") > 0, expr(
          """cast((1000 * (k - 1) *
               (cast(k as decimal(38,0)) * sum_g2 -
                cast(n_succ as decimal(38,0)) * n_succ)) div den
             as bigint)""")))
      .select(col("cell"), col("k"), col("n_blocks"), col("n_dropped"),
        col("n_succ"), col("q_milli"), (col("k") - 1L).as("dof"))
  }

  /**
   * Wald–Wolfowitz runs test — is a time-ordered binary sequence
   * exchangeable, or do like outcomes clump (regime switches, sticky
   * failures, batched spam)? With n₁ ones, n₀ zeros and R observed
   * runs, E[R] = 1 + 2n₁n₀/n and Var(R) = 2n₁n₀(2n₁n₀−n)/(n²(n−1)),
   * so z² = (Rn − n − 2n₁n₀)²·(n−1) / (2n₁n₀·(2n₁n₀−n)) is exact in
   * integers. The readout is STAGED on the [[kendallTauB]] /
   * [[ansariBradley]] lattice (r14 advice: the one-shot decimal128
   * numerator 10⁶·dnum²·(n−1) silently nulls past ~3·10⁶ rows per
   * cell under heavy clumping) — with dnum = Rn − n − m2, m2 = 2n₁n₀:
   *   z_milli = sign(dnum)·⌊√(min(⌊⌊10⁶|dnum|/m2⌋·|dnum|·(n−1)
   *             /(m2−n)⌋, 10¹²))⌋
   * — every LONG quotient bounded (first ≤ 10⁶·n, second clamped at
   * 10¹², which also keeps the radicand under the 2⁵³ double-isqrt
   * line; z saturates at 1000σ, far beyond any interpretable value),
   * and the decimal products stay ≤ ~10⁶·n⁴ — per-cell ceiling
   * ~1.7·10⁸ rows, 60× the one-shot form's. Null when 2n₁n₀ ≤ n (one
   * class too thin for the normal approximation to be defined); both
   * engines spell the identical staged expression.
   *
   * Scale shape — the reason this isn't one big lag window: runs are
   * counted HIERARCHICALLY ([[bucketPrefixOffsets]] discipline). Rows
   * bucket by ⌊order/bucketWidth⌋; within-bucket transitions count in
   * (cell, bucket)-partitioned windows (bounded, parallel), each
   * bucket emits its first/last flag, and cross-bucket boundary
   * transitions resolve on the |buckets|-bounded frame — a cell's
   * whole series never lands in one partition.
   *
   * Output: (cell, n, n1, n0, r_runs, z_milli).
   */
  def runsTest(df: DataFrame, cellCol: String, orderCol: String,
      flagCol: String, bucketWidth: Long = 65536L): DataFrame = {
    val base = df
      .filter(col(orderCol).isNotNull && col(flagCol).isNotNull)
      .select(col(cellCol).as("cell"), col(orderCol).cast("long").as("o"),
        when(col(flagCol).cast("long") > 0, 1L).otherwise(0L).as("b"))
      .withColumn("bkt", expr(s"o div ${bucketWidth}L"))
    val wIn = Window.partitionBy("cell", "bkt").orderBy("o")
    val perBucket = base
      .withColumn("chg",
        when(lag(col("b"), 1).over(wIn).isNull, 0L)
          .when(lag(col("b"), 1).over(wIn) =!= col("b"), 1L)
          .otherwise(0L))
      .groupBy(col("cell"), col("bkt"))
      .agg(count(lit(1)).as("nb"), sum(col("b")).as("n1b"),
        sum(col("chg")).as("chg"),
        min(struct(col("o"), col("b"))).as("fst"),
        max(struct(col("o"), col("b"))).as("lst"))
    val wBk = Window.partitionBy("cell").orderBy("bkt")
    val joined = perBucket
      .withColumn("prev_last", lag(col("lst.b"), 1).over(wBk))
      .withColumn("bchg",
        when(col("prev_last").isNotNull &&
          col("prev_last") =!= col("fst.b"), 1L).otherwise(0L))
      .groupBy(col("cell"))
      .agg(sum(col("nb")).as("n"), sum(col("n1b")).as("n1"),
        (sum(col("chg")) + sum(col("bchg")) + 1L).as("r_runs"))
    joined
      .withColumn("n0", col("n") - col("n1"))
      .withColumn("m2", expr(
        "2 * cast(n1 as decimal(38,0)) * n0"))
      .withColumn("dnum", expr(
        "cast(r_runs as decimal(38,0)) * n - n - m2"))
      .withColumn("z_milli",
        when(col("n") > 1L && col("m2") > dec38(col("n")), expr(
          """cast(sign(dnum) as bigint) * cast(floor(sqrt(cast(
               least((((1000000 * abs(dnum)) div m2) *
                   abs(dnum) * (n - 1)) div (m2 - n),
                 1000000000000)
               as double))) as bigint)""")))
      .select(col("cell"), col("n"), col("n1"), col("n0"),
        col("r_runs"), col("z_milli"))
  }

  private def dec38(c: Column): Column = c.cast("decimal(38,0)")

  /**
   * Page's L trend test — [[friedman]]'s ORDERED-alternative cousin:
   * where Friedman asks "did any treatment shift", Page asks "do the
   * treatments shift MONOTONICALLY in their a-priori order" (model
   * sizes, dosage levels, retrieval depths), which against an ordered
   * alternative is far more powerful than the omnibus. On the doubled
   * mid-rank lattice over m complete blocks: L2 = Σⱼ j·R2ⱼ with j the
   * per-cell ordinal rank of the treatment key, E[L2] = m·k·(k+1)²/2
   * (always an integer: k·(k+1)² is even for every k), Var(L2) =
   * m·k²·(k+1)·(k²−1)/36, so
   *   z_milli = sign·⌊√(36·10⁶·(L2−E[L2])² / (m·k²·(k+1)·(k²−1)))⌋
   * — the no-tie normal approximation (ties enter L2 exactly via the
   * mid-ranks; the variance keeps the classic form, stated here so
   * the reader knows which convention hashes). Null when k < 3 or
   * m = 0.
   *
   * The group column must be NUMERIC — its value order IS the tested
   * order (the caller encodes the hypothesis in the ordinals).
   *
   * Output: (cell, k, n_blocks, n_dropped, l2, e2, z_milli).
   */
  def pageTrend(df: DataFrame, cellCol: String, blockCol: String,
      ordCol: String, valueCol: String): DataFrame = {
    val (dropped, r2, _) =
      blockedRanks(df, cellCol, blockCol, ordCol, valueCol)
    // j = dense ordinal rank within cell, computed on the bounded
    // (cell, grp) frame — grp is the stringified numeric ordinal, so
    // rank by its numeric value, never its lexicographic shadow
    val wOrd = Window.partitionBy("cell").orderBy(col("grp").cast("long"))
    val lagg = r2
      .withColumn("j", row_number().over(wOrd).cast("long"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("k"),
        sum(dec38(col("j")) * col("r2j")).as("l2"))
    dropped
      .join(lagg, Seq("cell"), "left")
      .withColumn("e2", expr(
        """(cast(n_blocks as decimal(38,0)) * k * (k + 1) * (k + 1))
           div 2"""))
      .withColumn("dn", col("l2") - col("e2"))
      .withColumn("z_milli",
        when(col("n_blocks") > 0 && col("k") >= 3, expr(
          """cast(sign(dn) as bigint) * cast(floor(sqrt(cast(
               (36000000 * dn * dn) div
               (cast(n_blocks as decimal(38,0)) * k * k * (k + 1) *
                (cast(k as decimal(38,0)) * k - 1))
               as double))) as bigint)""")))
      .select(col("cell"), col("k"), col("n_blocks"), col("n_dropped"),
        col("l2").cast("long").as("l2"),
        col("e2").cast("long").as("e2"), col("z_milli"))
  }

  /**
   * Kendall's W (coefficient of concordance) — how much do m raters
   * AGREE on the ranking of k objects, the inter-annotator gate for
   * ranked eval panels ([[friedman]] answers "is any object rated
   * differently"; W answers "how coherent is the panel", and the two
   * are one identity apart: Q = m·(k−1)·W). On the doubled mid-rank
   * lattice the column-sum deviation mass is S2 = ΣR2ⱼ² − k·m²·(k+1)²
   * (ΣR2ⱼ = m·k·(k+1) exactly, so the cross term folds), and
   *   w_milli     = ⌊3000·S2 / (m²·k·(k²−1))⌋
   *   w_tie_milli = ⌊3000·S2 / (m²·k·(k²−1) − m·T)⌋, T = Σ(t³−t)
   * (the classic tie-corrected denominator; null when every block is
   * all-ties). W ∈ [0, 1] keeps every stage in decimal128 range.
   *
   * Output: (cell, k, n_blocks, n_dropped, tie_t, w_milli,
   * w_tie_milli).
   */
  def kendallW(df: DataFrame, cellCol: String, blockCol: String,
      grpCol: String, valueCol: String): DataFrame = {
    val (dropped, r2, ties) =
      blockedRanks(df, cellCol, blockCol, grpCol, valueCol)
    val agg = r2.groupBy(col("cell"))
      .agg(count(lit(1)).as("k"),
        sum(col("r2j") * col("r2j")).as("ss"))
    dropped
      .join(agg, Seq("cell"), "left")
      .join(ties, Seq("cell"), "left")
      .withColumn("s2", expr(
        """ss - cast(k as decimal(38,0)) *
             (cast(n_blocks as decimal(38,0)) * n_blocks) *
             ((k + 1) * (k + 1))"""))
      .withColumn("den0", expr(
        """cast(n_blocks as decimal(38,0)) * n_blocks * k *
           (cast(k as decimal(38,0)) * k - 1)"""))
      .withColumn("w_milli",
        when(col("n_blocks") > 0 && col("k") >= 2 && col("den0") > 0,
          expr("cast((3000 * s2) div den0 as bigint)")))
      .withColumn("w_tie_milli",
        when(col("n_blocks") > 0 && col("k") >= 2 &&
          col("den0") - dec38(col("n_blocks")) * col("tie_t") > 0,
          expr("""cast((3000 * s2) div
                    (den0 - cast(n_blocks as decimal(38,0)) * tie_t)
                  as bigint)""")))
      .select(col("cell"), col("k"), col("n_blocks"), col("n_dropped"),
        col("tie_t").cast("long").as("tie_t"), col("w_milli"),
        col("w_tie_milli"))
  }

  /**
   * Ordinal association pair — Goodman–Kruskal γ and both Somers' D
   * asymmetries, the [[kendallTauB]] family members that answer
   * different questions off the SAME concordance counts: γ ignores
   * ties entirely ((C−D)/(C+D) — "among pairs that order, how
   * aligned"), Somers' D_y|x conditions on x ((C−D)/(n₀−T_x) — the
   * effect-size companion of a y-on-x ordinal regression, and the
   * statistic behind the c-index identity c = (D+1)/2). All three are
   * single-stage exact divisions on the [[contingencyPairs]] dense-
   * grid double-prefix — no isqrt, no pairwise scan; the in-plan grid
   * guard applies (callers bin, the q195/q196 discipline).
   *
   * Output: (cell, n, conc, disc, gamma_milli, d_yx_milli,
   * d_xy_milli) — gamma null when C+D = 0, each D null when its
   * conditioning margin is all-ties.
   */
  def ordinalAssociation(df: DataFrame, cellCol: String, xCol: String,
      yCol: String, maxGridCells: Long = 4000000L): DataFrame = {
    val (cxy, pair) = contingencyPairs(df, cellCol, xCol, yCol,
      maxGridCells, "ordinalAssociation")
    val tx = cxy.groupBy(col("cell"), col("x"))
      .agg(sum(col("nxy")).as("nx"))
      .groupBy(col("cell"))
      .agg(expr("cast(sum(cast(nx as decimal(38,0)) * (nx - 1)) div 2" +
        " as decimal(38,0))").as("tx"))
    val ty = cxy.groupBy(col("cell"), col("y"))
      .agg(sum(col("nxy")).as("ny"))
      .groupBy(col("cell"))
      .agg(expr("cast(sum(cast(ny as decimal(38,0)) * (ny - 1)) div 2" +
        " as decimal(38,0))").as("ty"))
    pair.join(tx, Seq("cell")).join(ty, Seq("cell"))
      .withColumn("n0", expr("cast((n * (n - 1)) div 2 as decimal(38,0))"))
      .withColumn("num", col("conc") - col("disc"))
      .withColumn("gamma_milli",
        when(col("conc") + col("disc") > 0, expr(
          """cast(sign(num) as bigint) *
             cast((1000 * abs(num)) div (conc + disc) as bigint)""")))
      .withColumn("d_yx_milli",
        when(col("n0") - col("tx") > 0, expr(
          """cast(sign(num) as bigint) *
             cast((1000 * abs(num)) div (n0 - tx) as bigint)""")))
      .withColumn("d_xy_milli",
        when(col("n0") - col("ty") > 0, expr(
          """cast(sign(num) as bigint) *
             cast((1000 * abs(num)) div (n0 - ty) as bigint)""")))
      .select(col("cell"), col("n").cast("long").as("n"),
        col("conc").cast("long").as("conc"),
        col("disc").cast("long").as("disc"),
        col("gamma_milli"), col("d_yx_milli"), col("d_xy_milli"))
  }

  /**
   * Ljung–Box portmanteau test — is a series white noise, or does ANY
   * of the first `maxLag` autocorrelations carry signal (the residual
   * sanity check after every seasonal/trend fit, and the "is this
   * metric actually iid" gate before a control chart is trusted).
   * Exact on the centered-by-n lattice: c_t = n·y_t − Σy (integer
   * centering with NO division), r_k_ppm = sign·⌊10⁶·|Σc_t·c_{t+k}| /
   * Σc_t²⌋ (the classic sample ACF: full-series denominator, n−k
   * cross products), term_k = ⌊r_k_ppm² / (n−k)⌋, and
   *   lb_milli = ⌊n·(n+2)·Σterm_k / 10⁹⌋
   * (the 1000·Q with r² in ppm² folding 10¹²). Per-stage floors are
   * the statistic's DEFINITION here — both engines spell them
   * identically. Null when the series is constant (Σc² = 0) or
   * shorter than maxLag+2.
   *
   * Input contract ([[lagCorrelation]]'s): the caller passes a series
   * already aggregated to bounded per-cell length (daily grain etc.)
   * — the per-cell order window is a |periods|-bounded frame, never a
   * corpus sort.
   *
   * Output: (cell, n, max_lag, lb_milli).
   */
  def ljungBox(df: DataFrame, cellCol: String, orderCol: String,
      valueCol: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 12)
    val base = df
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"), col(orderCol).cast("long").as("o"),
        col(valueCol).cast("long").as("v"))
    val st = base.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(dec38(col("v"))).as("sv"))
    val w = Window.partitionBy("cell").orderBy("o")
    val withC = base
      .join(broadcast(st), Seq("cell"))
      .withColumn("c", dec38(col("v")) * col("n") - col("sv"))
    val led = withC.select(
      col("cell") +: col("n") +: col("c") +:
        (1 to maxLag).map(k => lead(col("c"), k).over(w).as(s"c$k")): _*)
    val perCell = led.groupBy(col("cell"))
      .agg(max(col("n")).as("n"),
        sum(col("c") * col("c")).as("d") +:
          (1 to maxLag).map(k =>
            sum(when(col(s"c$k").isNotNull, col("c") * col(s"c$k"))
              .otherwise(lit(0).cast("decimal(38,0)"))).as(s"nk$k")): _*)
    val terms = (1 to maxLag).map { k =>
      when(col("n") > k.toLong && col("d") > 0, expr(
        s"""(((1000000 * abs(nk$k)) div d) * ((1000000 * abs(nk$k)) div d))
            div (n - $k)""")).otherwise(lit(0).cast("decimal(38,0)"))
    }.reduce(_ + _)
    perCell
      .withColumn("tsum", terms)
      .withColumn("lb_milli",
        when(col("d") > 0 && col("n") > (maxLag + 1).toLong, expr(
          """cast((cast(n as decimal(38,0)) * (n + 2) * tsum)
               div 1000000000 as bigint)""")))
      .select(col("cell"), col("n"), lit(maxLag.toLong).as("max_lag"),
        col("lb_milli"))
  }

  /**
   * Durbin–Watson statistic — first-order serial correlation in the
   * residuals of the per-cell least-squares line (the q98 linear-fit
   * family's diagnostic: a trend fit whose residuals autocorrelate is
   * under-modeled, and its confidence claims are fiction). Exact to
   * the milli lattice: with integer moment sums, S0 = n·Σx²−(Σx)² and
   * S1 = n·Σxy−ΣxΣy, the scaled residual n·S0·e_t = n·S0·y_t −
   * S0·Σy + S1·Σx − n·S1·x_t is an EXACT integer; e_milli =
   * sign·⌊1000·|·|/(n·S0)⌋ is the defined lattice, and
   *   dw_milli = ⌊1000·Σ(e_t−e_{t−1})² / Σe_t²⌋
   * (≈2000 = no autocorrelation, →0 positive, →4000 negative). Null
   * for constant x (S0 = 0) or zero residual mass (perfect fit).
   *
   * Input contract ([[ljungBox]]'s): a bounded per-cell series; the
   * order window runs on |periods| rows per cell.
   *
   * Output: (cell, n, dw_milli).
   */
  def durbinWatson(df: DataFrame, cellCol: String, xCol: String,
      yCol: String): DataFrame = {
    val base = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(cellCol).as("cell"), col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"))
    val st = base.groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(dec38(col("x"))).as("sx"),
        sum(dec38(col("y"))).as("sy"),
        sum(dec38(col("x")) * col("x")).as("sxx"),
        sum(dec38(col("x")) * col("y")).as("sxy"))
      .withColumn("s0", dec38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .withColumn("s1", dec38(col("n")) * col("sxy") - col("sx") * col("sy"))
    val w = Window.partitionBy("cell").orderBy("x")
    val resid = base
      .join(broadcast(st), Seq("cell"))
      .filter(col("s0") > 0)
      .withColumn("rnum",
        dec38(col("n")) * col("s0") * col("y") - col("s0") * col("sy") +
          col("s1") * col("sx") - dec38(col("n")) * col("s1") * col("x"))
      .withColumn("e", expr(
        """cast(sign(rnum) as bigint) *
           cast((1000 * abs(rnum)) div (cast(n as decimal(38,0)) * s0)
             as bigint)"""))
      .withColumn("ep", lag(col("e"), 1).over(w))
    resid.groupBy(col("cell"))
      .agg(max(col("n")).as("n"),
        sum(dec38(col("e")) * col("e")).as("se2"),
        sum(when(col("ep").isNotNull,
          dec38(col("e") - col("ep")) * (col("e") - col("ep")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("sd2"))
      .withColumn("dw_milli",
        when(col("se2") > 0,
          expr("cast((1000 * sd2) div se2 as bigint)")))
      .select(col("cell"), col("n"), col("dw_milli"))
  }

  /**
   * Hampel outlier audit — the robust location/scale gate ([[madScale]]
   * family): flag values beyond kMad MAD units of the cell median,
   * immune to the outliers it hunts (a z-score's mean and σ are
   * dragged by the very points under test; median and MAD are not).
   * Both medians are the exact lower median (min v with 2·cum ≥ N —
   * the [[moodsMedian]] convention) on count-aggregated frames; the
   * flag is the strict integer inequality |v − med| > kMad·mad (MAD
   * units by design — the 1.4826 σ-equivalence constant is a float
   * and stays out of the lattice; at mad = 0, any deviation from the
   * median flags, stated so the constant-heavy edge is readable).
   *
   * Output: (cell, n, med, mad, n_out, out_ppm).
   *
   * Scale shape: ONE corpus aggregate to (cell, v, cnt) grain serves
   * the median prefix, the deviation re-aggregate and the final count
   * (localCheckpointed — the q189/contingencyPairs rule); medians
   * join back broadcast.
   */
  def hampelOutliers(df: DataFrame, cellCol: String, valueCol: String,
      kMad: Int = 3): DataFrame = {
    val gvc = df
      .filter(col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"), col(valueCol).cast("long").as("v"))
      .groupBy(col("cell"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    def lowerMedian(f: DataFrame, vCol: String): DataFrame = {
      val wCum = Window.partitionBy("cell").orderBy(vCol)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wTot = Window.partitionBy("cell")
      f.withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("ntot", sum(col("cnt")).over(wTot))
        .filter(col("cum") * 2 >= col("ntot"))
        .groupBy(col("cell"))
        .agg(min(col(vCol)).as("m"))
    }
    val med = lowerMedian(gvc, "v").withColumnRenamed("m", "med")
    val dev = gvc
      .join(broadcast(med), Seq("cell"))
      .groupBy(col("cell"), abs(col("v") - col("med")).as("dv"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = lowerMedian(dev, "dv").withColumnRenamed("m", "mad")
    gvc
      .join(broadcast(med), Seq("cell"))
      .join(broadcast(mad), Seq("cell"))
      .groupBy(col("cell"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(col("cnt")).as("n"),
        sum(when(abs(col("v") - col("med")) >
          lit(kMad.toLong) * col("mad"), col("cnt")).otherwise(0L))
          .as("n_out"))
      .withColumn("out_ppm",
        expr("cast((1000000 * cast(n_out as decimal(38,0))) div n" +
          " as bigint)"))
      .select(col("cell"), col("n"), col("med"), col("mad"),
        col("n_out"), col("out_ppm"))
  }

  /** Loud two-group guard shared by the two-sample operators
    * ([[twoSampleCums]] consumers, [[hodgesLehmann]],
    * [[effectSizes]]): a 3+-group caller would have every
    * non-minimum group silently lumped into sample B, producing a
    * plausible-looking but WRONG statistic — so probe max
    * countDistinct(grp) per cell and require()-fail, matching the
    * existing scalar-probe discipline (contingencyPairs grid probe,
    * mannKendall unique-times probe, hodgesLehmann grid probe).
    *
    * The bound is AT MOST 2, deliberately not exactly 2: a 1-group
    * cell (a sparse cell that lost one parity under subsampling) is a
    * WELL-DEFINED degenerate, not a silent lumping — sample B is
    * empty (n=0), every m·n-denominated statistic hits its operator's
    * own zero guard, and the SQL oracle computes the identical
    * degenerate row, so cross-engine agreement holds. Failing on it
    * would make legitimately sparse inputs (the diff-fuzz subsamples)
    * throw where both engines agree on the answer.
    * Expects the caller's normalized frame with `cell`/`grp` cols. */
  private def requireTwoGroups(base: DataFrame, op: String): Unit = {
    val worst = base.groupBy(col("cell"))
      .agg(countDistinct(col("grp")).as("g"))
      .agg(max(col("g"))).head()
    require(worst.isNullAt(0) || worst.getLong(0) <= 2L,
      s"$op: a cell has ${if (worst.isNullAt(0)) 0L else worst.getLong(0)} " +
        "distinct groups - the two-sample lattice allows at most 2 per " +
        "cell (every non-minimum group would silently lump into sample " +
        "B); pre-filter or pre-bucket the group column. 1-group cells " +
        "are accepted and yield the documented empty-sample-B " +
        "degenerate")
  }

  /** Shared two-sample value-count spine of [[cramerVonMises]],
    * [[andersonDarling2]] and [[ansariBradley]]: per (cell, v), the
    * two groups' counts plus inclusive cumulative counts, and the
    * per-cell (m, n) totals — ONE corpus aggregate, prefix windows on
    * the bounded distinct-value frame, totals joined back broadcast.
    * The group column must take exactly 2 distinct values per cell —
    * ENFORCED by the [[requireTwoGroups]] probe (r14 advice: the
    * documented contract used to be silent); group A is the
    * lexicographically smaller name (deterministic, stated —
    * orientation flips sign-free statistics not at all and signed
    * ones symmetrically). */
  private def twoSampleCums(df: DataFrame, cellCol: String,
      grpCol: String, valueCol: String): DataFrame = {
    val base = df
      .filter(col(grpCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(grpCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
    requireTwoGroups(base, "twoSampleCums")
    val ab = base.groupBy(col("cell"))
      .agg(min(col("grp")).as("ga"))
    val gvc = base
      .join(broadcast(ab), Seq("cell"))
      .groupBy(col("cell"), col("v"))
      .agg(sum(when(col("grp") === col("ga"), 1L).otherwise(0L))
          .as("ca"),
        sum(when(col("grp") =!= col("ga"), 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy("cell").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = gvc.groupBy(col("cell"))
      .agg(sum(col("ca")).as("m"), sum(col("cb")).as("nn"))
    gvc
      .withColumn("cuma", sum(col("ca")).over(w))
      .withColumn("cumb", sum(col("cb")).over(w))
      .join(broadcast(tot), Seq("cell"))
  }

  /**
   * Cramér–von Mises two-sample test — "are these two distributions
   * the SAME", weighting every quantile equally where q197's KS reads
   * only the single worst gap (KS misses broad small shifts; CvM
   * integrates them). Exact on the count lattice: at every distinct
   * value, the ecdf gap is the integer d = cumA·n − cumB·m (over the
   * common denominator mn), and the classic T = mn/N²·Σ_obs(F_A−F_B)²
   * becomes
   *   t_ppm = ⌊10⁶·Σ_v (ca+cb)·d² / (N²·m·n)⌋
   * — ONE floor at the end, everything before it an exact integer.
   * Null when either sample is empty. T ranges ~(1/6N → small) under
   * H₀; ≫ 1/6 under shift.
   *
   * Scale shape: one (cell, v) count aggregate is the only corpus
   * shuffle; prefix windows run on the bounded distinct-value frame.
   *
   * Output: (cell, m, n, t_ppm).
   */
  def cramerVonMises(df: DataFrame, cellCol: String, grpCol: String,
      valueCol: String): DataFrame = {
    twoSampleCums(df, cellCol, grpCol, valueCol)
      .withColumn("d", dec38(col("cuma")) * col("nn") -
        dec38(col("cumb")) * col("m"))
      .groupBy(col("cell"))
      .agg(max(col("m")).as("m"), max(col("nn")).as("n"),
        sum((dec38(col("ca")) + col("cb")) * col("d") * col("d"))
          .as("s"))
      .withColumn("t_ppm",
        when(col("m") > 0 && col("n") > 0, expr(
          """cast((1000000 * s) div
               (cast(m + n as decimal(38,0)) * (m + n) * m * n)
             as bigint)""")))
      .select(col("cell"), col("m"), col("n"), col("t_ppm"))
  }

  /**
   * Anderson–Darling two-sample test (Pettitt / Scholz–Stephens k=2
   * with ties) — the tail-sensitive member of the two-sample family:
   * KS (q197) reads the worst gap, CvM (q286) the mean square, AD
   * re-weights the square by 1/(H(1−H)) so discrepancies in the
   * TAILS — where a heavy-tailed corpus hides its trouble — count
   * most. The discrete tie form over distinct values j with pooled
   * cum Bⱼ < N:
   *   term_ppm(j) = ⌊10⁶·lⱼ·|dⱼ| / (Bⱼ·(N−Bⱼ))⌋ · |dⱼ|,
   *                 dⱼ = N·Mⱼ − m·Bⱼ
   *   ad_milli   = ⌊(m+n)·Σ term_ppm / (m·n·N·1000)⌋
   * (with N = m+n the leading factor cancels to Σterm/(mn·1000); the
   * unreduced form is kept so both engines spell the same
   * expression). The d² split is LOAD-BEARING, not cosmetic: Spark's
   * `div` is IntegralDivide returning LONG, and the one-shot quotient
   * 10⁶·l·d²/(B(N−B)) tops 6·10²¹ at ×10 scale — it WRAPS (caught by
   * the ×10 gate, Spark read a negative AD). Staged, the quotient
   * stays ≤ ~10¹¹ and the outer product returns to decimal128.
   * (lⱼ = pooled count at j, Mⱼ = A-sample cum; the B-sample term is
   * the SAME square — m·Bⱼ−N·Mⱼ negated — so the (1/m+1/n) factor
   * folds analytically). Per-term floors are the spelled lattice (the
   * logRank discipline). Null when either sample is empty.
   *
   * Output: (cell, m, n, ad_milli).
   */
  def andersonDarling2(df: DataFrame, cellCol: String, grpCol: String,
      valueCol: String): DataFrame = {
    twoSampleCums(df, cellCol, grpCol, valueCol)
      .withColumn("bj", col("cuma") + col("cumb"))
      .withColumn("ntot", col("m") + col("nn"))
      .withColumn("dj",
        abs(dec38(col("ntot")) * col("cuma") -
          dec38(col("m")) * col("bj")))
      .withColumn("term",
        when(col("bj") < col("ntot"), expr(
          """cast((1000000 * (ca + cb) * dj) div
               (cast(bj as decimal(38,0)) * (ntot - bj))
             as decimal(38,0)) * dj"""))
          .otherwise(lit(0).cast("decimal(38,0)")))
      .groupBy(col("cell"))
      .agg(max(col("m")).as("m"), max(col("nn")).as("n"),
        sum(col("term")).as("s"))
      .withColumn("ad_milli",
        when(col("m") > 0 && col("n") > 0, expr(
          """cast((cast(m + n as decimal(38,0)) * s) div
               (cast(m as decimal(38,0)) * n * (m + n) * 1000)
             as bigint)""")))
      .select(col("cell"), col("m"), col("n"), col("ad_milli"))
  }

  /**
   * Ansari–Bradley scale test — same center, different SPREAD: the
   * dispersion alternative the location tests (q195 MWU, q277 Mood)
   * are blind to (two feeds with equal medians, one 4× noisier —
   * AB fires, MWU reads nothing). Scores rank from BOTH ends inward
   * on the doubled mid-rank lattice: s2 = min(r2, 2(N+1) − r2), so
   * extreme values score LOW and a low A-sum means A is the wide
   * sample. The z is EXACT under ties because it uses the
   * permutation (sampling-without-replacement) moments of the
   * realized score multiset — no tabulated even/odd constants:
   *   z² = (N·AB2 − m·S1)²·(N−1) / (m·n·(N·S2 − S1²))
   * (S1 = Σs2·cnt, S2 = Σs2²·cnt over the pooled frame), staged as
   *   z_milli = sign·⌊√( ⌊⌊10⁶·|znum|/(m·n)⌋·|znum| / V⌋·(N−1) )⌋
   * (V = N·S2 − S1²) — the [[kendallTauB]] staged-division lattice:
   * the naive 10⁶·znum²·(N−1) radicand tops 10³⁹ at ×10 scale and
   * would overflow decimal128 in BOTH engines; each stage here stays
   * under ~10²⁵. Null for a constant pooled sample (score variance 0)
   * or an empty side.
   *
   * Output: (cell, m, n, ab2, z_milli).
   */
  def ansariBradley(df: DataFrame, cellCol: String, grpCol: String,
      valueCol: String): DataFrame = {
    twoSampleCums(df, cellCol, grpCol, valueCol)
      .withColumn("ntot", col("m") + col("nn"))
      .withColumn("r2",
        (col("cuma") + col("cumb") - col("ca") - col("cb")) * 2 +
          (col("ca") + col("cb")) + 1)
      .withColumn("s2",
        least(col("r2"), (col("ntot") + 1) * 2 - col("r2")))
      .groupBy(col("cell"))
      .agg(max(col("m")).as("m"), max(col("nn")).as("n"),
        max(col("ntot")).as("nt"),
        sum(dec38(col("s2")) * col("ca")).as("ab2"),
        sum(dec38(col("s2")) * (col("ca") + col("cb"))).as("s1"),
        sum(dec38(col("s2")) * col("s2") * (col("ca") + col("cb")))
          .as("s2sum"))
      .withColumn("znum",
        dec38(col("nt")) * col("ab2") - dec38(col("m")) * col("s1"))
      .withColumn("vvar",
        dec38(col("nt")) * col("s2sum") - col("s1") * col("s1"))
      .withColumn("z_milli",
        when(col("m") > 0 && col("n") > 0 && col("vvar") > 0, expr(
          """cast(sign(znum) as bigint) * cast(floor(sqrt(cast(
               ((((1000000 * abs(znum)) div
                   (cast(m as decimal(38,0)) * n)) * abs(znum))
                 div vvar) * (nt - 1)
               as double))) as bigint)""")))
      .select(col("cell"), col("m"), col("n"),
        col("ab2").cast("long").as("ab2"), col("z_milli"))
  }

  /**
   * Cronbach's α — internal-consistency reliability of a k-item
   * score panel (do the k judge prompts / quality signals measure ONE
   * underlying thing, or k unrelated things — the scale-construction
   * gate before anyone averages item scores into "the" quality
   * score). Exact as a ratio of variance NUMERATORS (the n² common
   * denominator of D = n·Σx² − (Σx)² cancels analytically):
   *   α_milli = ⌊1000·k·(D_total − ΣD_item) / ((k−1)·D_total)⌋
   * over COMPLETE subjects only (the [[friedman]] discipline —
   * incomplete panels drop AND count). Null when k < 2 or the total
   * score is constant (D_total = 0). Negative α is real data (items
   * anti-correlate) and passes through on the sign·floor lattice.
   *
   * Output: (cell, k, n_subjects, n_dropped, alpha_milli).
   *
   * Scale shape: one (cell, subject, item) aggregate feeds the
   * completeness gate; item moments and subject-total moments are two
   * map-side-combined aggregates over the kept grain; the final
   * assembly is |cells|-bounded.
   */
  def cronbachAlpha(df: DataFrame, cellCol: String, subjectCol: String,
      itemCol: String, valueCol: String): DataFrame = {
    val base = df
      .filter(col(itemCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"), col(subjectCol).as("subj"),
        col(itemCol).cast("string").as("item"),
        col(valueCol).cast("long").as("v"))
    val kPerCell = base.groupBy(col("cell"))
      .agg(countDistinct(col("item")).as("k"))
    val subjStat = base.groupBy(col("cell"), col("subj"))
      .agg(count(lit(1)).as("nb"), countDistinct(col("item")).as("gb"),
        sum(col("v")).as("tot"))
      .join(broadcast(kPerCell), Seq("cell"))
      .withColumn("ok", col("nb") === col("k") && col("gb") === col("k"))
    val dropped = subjStat.groupBy(col("cell"))
      .agg(max(col("k")).as("k"),
        sum(when(col("ok"), 0L).otherwise(1L)).as("n_dropped"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_subjects"),
        sum(when(col("ok"), col("tot")).otherwise(0L)).as("st"),
        sum(when(col("ok"), dec38(col("tot")) * col("tot"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("stt"))
      .withColumn("dtot", dec38(col("n_subjects")) * col("stt") -
        dec38(col("st")) * col("st"))
    val items = base.join(
        subjStat.filter(col("ok")).select(col("cell"), col("subj")),
        Seq("cell", "subj"))
      .groupBy(col("cell"), col("item"))
      .agg(count(lit(1)).as("ni"), sum(col("v")).as("si"),
        sum(dec38(col("v")) * col("v")).as("sii"))
      .groupBy(col("cell"))
      .agg(sum(dec38(col("ni")) * col("sii") -
        dec38(col("si")) * col("si")).as("ditems"))
    dropped
      .join(items, Seq("cell"), "left")
      .withColumn("anum", col("dtot") - col("ditems"))
      .withColumn("alpha_milli",
        when(col("n_subjects") > 0 && col("k") >= 2 && col("dtot") > 0,
          expr("""cast(sign(anum) as bigint) *
                  cast((1000 * k * abs(anum)) div ((k - 1) * dtot)
                    as bigint)""")))
      .select(col("cell"), col("k"), col("n_subjects"),
        col("n_dropped"), col("alpha_milli"))
  }

  /**
   * Hodges–Lehmann shift estimator — the EFFECT SIZE the two-sample
   * tests only gate: the median of all m·n pairwise differences
   * A − B, the robust "how far apart are these two feeds" readout
   * (q195 says THAT they differ, HL says BY HOW MUCH, in the
   * column's own units, 50%-breakdown-robust). Never materializes
   * the m·n pairs: differences and their multiplicities come from
   * the two distinct-value count frames joined per cell (|V_A|·|V_B|
   * grid rows — the [[kendallTauB]] grid guard applies and fails
   * loudly on unbinned callers), and the estimate is the exact lower
   * weighted median ([[moodsMedian]] rule) of that weighted diff
   * frame.
   *
   * Output: (cell, m, n, n_pairs, hl_shift) — shift oriented A − B
   * with A the lexicographically smaller group name.
   */
  def hodgesLehmann(df: DataFrame, cellCol: String, grpCol: String,
      valueCol: String, maxGridCells: Long = 4000000L): DataFrame = {
    val base = df
      .filter(col(grpCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(grpCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
    requireTwoGroups(base, "hodgesLehmann")
    val ab = base.groupBy(col("cell")).agg(min(col("grp")).as("ga"))
    val gvc = base
      .join(broadcast(ab), Seq("cell"))
      .groupBy(col("cell"), (col("grp") === col("ga")).as("isa"),
        col("v"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val da = gvc.filter(col("isa")).select(col("cell"),
      col("v").as("va"), col("cnt").as("cna"))
    val db = gvc.filter(!col("isa")).select(col("cell"),
      col("v").as("vb"), col("cnt").as("cnb"))
    val worst = da.groupBy(col("cell")).agg(count(lit(1)).as("na"))
      .join(db.groupBy(col("cell")).agg(count(lit(1)).as("nb")),
        Seq("cell"))
      .agg(max(col("na") * col("nb"))).head()
    val worstCells = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(worstCells <= maxGridCells,
      s"hodgesLehmann: a cell's diff grid would hold $worstCells " +
        s"(> maxGridCells = $maxGridCells) value pairs - bin the " +
        "inputs first (the q195/q196 discipline)")
    val diffs = da.join(db, Seq("cell"))
      .groupBy(col("cell"), (col("va") - col("vb")).as("d"))
      .agg(sum(col("cna") * col("cnb")).as("w"))
    val wCum = Window.partitionBy("cell").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wTot = Window.partitionBy("cell")
    val med = diffs
      .withColumn("cum", sum(col("w")).over(wCum))
      .withColumn("ntot", sum(col("w")).over(wTot))
      .filter(col("cum") * 2 >= col("ntot"))
      .groupBy(col("cell"))
      .agg(min(col("d")).as("hl_shift"), max(col("ntot")).as("n_pairs"))
    val tot = gvc.groupBy(col("cell"))
      .agg(sum(when(col("isa"), col("cnt")).otherwise(0L)).as("m"),
        sum(when(!col("isa"), col("cnt")).otherwise(0L)).as("n"))
    tot.join(med, Seq("cell"), "left")
      .select(col("cell"), col("m"), col("n"), col("n_pairs"),
        col("hl_shift"))
  }

  /**
   * Sign test — the assumption-free paired location gate: of the
   * nonzero paired differences a − b, are positives and negatives
   * balanced? Where [[wilcoxonSignedRank]] needs symmetric
   * differences to mean what it says, the sign test needs NOTHING —
   * the coarse but unbreakable fallback (and the one-sample median
   * test when b is a hypothesized constant). Zeros are dropped AND
   * counted (n_zero — the q268 convention made visible). The
   * continuity-corrected normal readout is exact on the lattice:
   *   z_milli = sign(p−q)·⌊√(10⁶·(|p−q|−1)²/(p+q))⌋
   * when |p−q| > 1 and p+q > 0; 0 when |p−q| ≤ 1 (the correction
   * cannot cross zero); null on an all-zero cell.
   *
   * Output: (cell, n_pairs, n_pos, n_neg, n_zero, z_milli).
   * One map-side-combined aggregate; nothing else touches the facts.
   */
  def signTest(df: DataFrame, cellCol: String, aCol: String,
      bCol: String): DataFrame = {
    df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(cellCol).as("cell"),
        (col(aCol).cast("long") - col(bCol).cast("long")).as("d"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d") > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("d") === 0, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("z_milli",
        when(col("n_pos") + col("n_neg") === 0L, lit(null).cast("long"))
          .when(abs(col("n_pos") - col("n_neg")) <= 1L, lit(0L))
          .otherwise(expr(
            """cast(sign(n_pos - n_neg) as bigint) *
               cast(floor(sqrt(cast(
                 (1000000 * (abs(n_pos - n_neg) - 1) *
                   (abs(n_pos - n_neg) - 1)) div (n_pos + n_neg)
                 as double))) as bigint)""")))
      .select(col("cell"), col("n_pairs"), col("n_pos"), col("n_neg"),
        col("n_zero"), col("z_milli"))
  }

  /**
   * Cox–Stuart trend test — the distribution-free "is this series
   * drifting" gate: pair each first-half observation with its
   * second-half counterpart (odd-length series drop the middle
   * point, the classic construction) and run the [[signTest]] on
   * later − earlier. Complements [[mannKendall]]'s all-pairs
   * concordance with an O(n) pairing that a quick monitoring sweep
   * can afford, and reads the SAME sign convention (positive z =
   * increasing). Pairing runs on the [[ljungBox]] bounded-series
   * contract: row numbers inside |periods|-bounded cell windows, the
   * halves equi-joined on the pair index — never a corpus sort.
   *
   * Output: (cell, n, n_pairs, n_pos, n_neg, n_zero, z_milli).
   */
  def coxStuart(df: DataFrame, cellCol: String, orderCol: String,
      valueCol: String): DataFrame = {
    val base = df
      .filter(col(orderCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"), col(orderCol).cast("long").as("o"),
        col(valueCol).cast("long").as("v"))
    val w = Window.partitionBy("cell").orderBy("o")
    val idx = base
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("cell")))
      .withColumn("half", expr("n div 2"))
    val first = idx.filter(col("rn") <= col("half"))
      .select(col("cell"), col("rn").as("i"), col("v").as("va"),
        col("n"))
    val second = idx.filter(col("rn") > col("n") - col("half"))
      .select(col("cell"),
        (col("rn") - (col("n") - col("half"))).as("i"),
        col("v").as("vb"))
    val paired = first.join(second, Seq("cell", "i"))
      .select(col("cell"), col("n"), col("vb").as("later"),
        col("va").as("earlier"))
    val z = signTest(paired, "cell", "later", "earlier")
    paired.groupBy(col("cell")).agg(max(col("n")).as("n"))
      .join(z, Seq("cell"))
      .select(col("cell"), col("n"), col("n_pairs"), col("n_pos"),
        col("n_neg"), col("n_zero"), col("z_milli"))
  }

  /**
   * Standardized effect-size panel — Cohen's d, Hedges' g and
   * Glass's Δ for two groups: the "HOW BIG is the difference, in
   * noise units" readout that q220's Welch t only gates (a 10⁹-row
   * A/B test makes a 0.001-SD effect "significant"; d is what tells
   * you it's nothing). Exact off one moment aggregate per group:
   * with Δ = n₂S₁ − n₁S₂ and D'ᵢ = nᵢΣx²ᵢ − Sᵢ²,
   *   d² = Δ²·(n₁+n₂−2) / (n₁n₂·(n₂D'₁ + n₁D'₂))
   * staged on the [[kendallTauB]] lattice (two floors, each quotient
   * long-safe), sign = sign(Δ), orientation A − B with A the
   * lexicographically smaller group; Hedges' g applies the exact
   * small-sample rational J = (4df−4)/(4df−1) to d_milli; Glass's Δ
   * standardizes by the B-group (control) SD alone:
   *   Δ²_glass = Δ²·(n₂−1) / (n₁²n₂·D'₂).
   * Null when the pooled (resp. control) variance is zero or a group
   * is empty/singleton. Both radicands saturate at 10¹² (d = 1000
   * SD) via least() — beyond that the statistic is "the groups don't
   * overlap" however it's spelled, and an unclamped radicand would
   * cross the 2⁵³ line where DuckDB's HUGEINT→DOUBLE cast stops
   * rounding correctly (the r11 q98 lesson). The clamp is applied to
   * the DECIMAL numerator (capped at pool·10¹² / d2·10¹²) BEFORE the
   * long-typed `div` (r14 advice): for a near-degenerate pool the
   * one-shot LONG quotient would wrap past 2⁶³ before an after-the-
   * fact least() could see it, while DuckDB's HUGEINT divides
   * cleanly — an engine divergence. When pool > ~10²⁶ the clamp
   * product overflows decimal128 to null and least() skips it — safe,
   * because in that region the quotient is far below the wrap line.
   *
   * Output: (cell, n1, n2, d_milli, g_milli, glass_milli).
   */
  def effectSizes(df: DataFrame, cellCol: String, grpCol: String,
      valueCol: String): DataFrame = {
    val base = df
      .filter(col(grpCol).isNotNull && col(valueCol).isNotNull)
      .select(col(cellCol).as("cell"),
        col(grpCol).cast("string").as("grp"),
        col(valueCol).cast("long").as("v"))
    requireTwoGroups(base, "effectSizes")
    val ab = base.groupBy(col("cell")).agg(min(col("grp")).as("ga"))
    val st = base
      .join(broadcast(ab), Seq("cell"))
      .groupBy(col("cell"))
      .agg(sum(when(col("grp") === col("ga"), 1L).otherwise(0L))
          .as("n1"),
        sum(when(col("grp") =!= col("ga"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("grp") === col("ga"), dec38(col("v")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("s1"),
        sum(when(col("grp") =!= col("ga"), dec38(col("v")))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("s2"),
        sum(when(col("grp") === col("ga"), dec38(col("v")) * col("v"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("q1"),
        sum(when(col("grp") =!= col("ga"), dec38(col("v")) * col("v"))
          .otherwise(lit(0).cast("decimal(38,0)"))).as("q2"))
      .withColumn("dl", dec38(col("n2")) * col("s1") -
        dec38(col("n1")) * col("s2"))
      .withColumn("d1", dec38(col("n1")) * col("q1") -
        col("s1") * col("s1"))
      .withColumn("d2", dec38(col("n2")) * col("q2") -
        col("s2") * col("s2"))
      .withColumn("pool",
        dec38(col("n2")) * col("d1") + dec38(col("n1")) * col("d2"))
    st
      .withColumn("d_milli",
        when(col("n1") > 0 && col("n2") > 0 &&
          col("n1") + col("n2") > 2 && col("pool") > 0, expr(
          """cast(sign(dl) as bigint) * cast(floor(sqrt(cast(
               least((least(
                   ((1000000 * abs(dl)) div
                     (cast(n1 as decimal(38,0)) * n2)) *
                     (abs(dl) * (n1 + n2 - 2)),
                   pool * cast(1000000000000 as decimal(38,0)))
                 div pool),
                 1000000000000)
               as double))) as bigint)""")))
      .withColumn("g_milli",
        when(col("d_milli").isNotNull, expr(
          """cast(sign(d_milli) as bigint) *
             cast((abs(d_milli) * (4 * (n1 + n2 - 2) - 4)) div
               (4 * (n1 + n2 - 2) - 1) as bigint)""")))
      .withColumn("glass_milli",
        when(col("n1") > 0 && col("n2") > 1 && col("d2") > 0, expr(
          """cast(sign(dl) as bigint) * cast(floor(sqrt(cast(
               least((least(
                   ((1000000 * abs(dl)) div
                     (cast(n1 as decimal(38,0)) * n1 * n2)) *
                     (abs(dl) * (n2 - 1)),
                   d2 * cast(1000000000000 as decimal(38,0)))
                 div d2),
                 1000000000000)
               as double))) as bigint)""")))
      .select(col("cell"), col("n1"), col("n2"), col("d_milli"),
        col("g_milli"), col("glass_milli"))
  }
}
