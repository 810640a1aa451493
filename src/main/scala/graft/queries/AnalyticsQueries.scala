package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._
import graft.operators.{MergeOps, StatsOps, TemporalOps}

/**
 * Warehouse-analytics queries layered on round-7 operators: SCD2
 * history (q75), time-series gap-fill (q76), histograms (q77),
 * integer-exact anomaly flags (q78), funnel analysis (q79), single-pass
 * profiling (q80) and incremental aggregation maintenance (q81).
 *
 * Cross-engine rules as everywhere in the registry: fixed-point
 * integer/decimal arithmetic only, total ORDER BY, identical output
 * aliases both sides.
 */
object AnalyticsQueries {

  /** The co-purchase part graph q115 (triangles) and q118 (BFS) both
    * walk: parts linked when they share an order. ONE definition so the
    * two queries can never drift onto different graphs (the oracle SQL
    * duplicates it by the standalone-oracle contract). Bounded at
    * C(max order size, 2) pairs per order. */
  private def coPurchasePairs(s: SparkSession, d: String): DataFrame = {
    // r17 OPTIMIZATION (guide §2.5): the pair fan-out (a broadcast
    // self-join at bench scale) ran at the parquet split count — a
    // 3-task, seconds-long stage. Spreading the probe side first keeps
    // the C(order,2) expansion at session parallelism; the build side
    // stays unspread (it is broadcast/shuffled anyway).
    val li = lineitem(s, d)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    graft.operators.ScanOps.spreadSmallInput(li.as("x"), col("ok"))
      .join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("u"), col("y.pk").as("v"))
  }

  /** q75 version labels (strings — version metadata, not arithmetic). */
  val D0 = "2024-01-01"; val Eff = "2024-06-01"; val High = "9999-12-31"
  /** q75 source-only-key injection (q68's discipline: the corpus has no
    * natural source-only keys, so a shifted key exercises the insert
    * branch). */
  val Scd2InsertMod = 13L; val Scd2InsertShift = 20000000L

  /** q76 grid: hourly instants, gaps capped at 48 h (beyond the cap the
    * series is honestly absent, not hallucinated). */
  val GridStepS = 3600L; val MaxGapS = 48L * 3600L

  /** q109 cohort bucket: one week of epoch micros. */
  val RetentionBucketUs = 7L * 86400L * 1000000L

  /** q77 histogram grid: the fixed-point unit from cents() is 1e-4
    * dollars, so $10k-wide buckets are 1e8 units — 12 of them cover
    * lineitem's $900-105k l_extendedprice span informatively (the
    * original 1e6 width was $100, not the $10k its comment claimed,
    * clamping nearly everything into the top cell). */
  val HistLo = 0L; val HistWidth = 100000000L; val HistBuckets = 12

  /** q78: deterministic spike injection (uniform data has |z| < √3, so
    * unpolluted fixtures would gate nothing) + the z threshold. */
  val SpikeMod = 97L; val SpikeFactor = 21L; val ZScoreK = 3

  /** q93 MAD multiplier (k·MAD ≈ 4σ for normal data at k = 6; the
    * uniform fixture's max |x − med| is ~1.5·MAD·k/6, far inside). */
  val MadK = 6

  /** q96 user-slice modulus (bounds the row-per-event output). */
  val LocfUserMod = 5L

  /** q99 quantile-bucket count. */
  val DepthTiles = 8

  /** q116 interval length unit: event_id%7+1 hours of epoch micros
    * (events arrive ~11 h apart per user at sf0.01, so 1–7 h spans give
    * a real mix of merged islands and gaps at every SF). */
  val IslandHourUs = 3600L * 1000000L

  /** q118 BFS: every 97th part seeds the walk; 3 hops of co-purchase
    * proximity (beyond 3 the dense basket graph saturates anyway). */
  val BfsSeedMod = 97L; val BfsMaxHops = 3

  /** q119 RFM quartiles; report dated 2002-01-01 UTC (after the last
    * 2001-08-01 order at every SF, so recency is nonnegative). */
  val RfmTiles = 4; val RfmAsOfMs = 1009843200000L

  /** q208 power-iteration depth: 16 steps take the uniform start to
    * the (1,1,1,1,3)/7 fixed point within per-step truncation ppm. */
  val MarkovIters = 16

  /** q120 KM survival: study closes 2024-01-31T00:00Z; a user whose
    * last event is >24 h before close churned (event=1), else censored;
    * durations on an hourly grid; cohorts = user_id mod 3 (synthetic
    * arms — the estimator is cohort-generic). */
  /** One epoch day in microseconds — the shared day-bucket unit of
    * q120's churn horizon, q129's state partitions and q131's shifted
    * regimes. */
  val DayUs = 86400000000L

  val KmStudyEndUs = 1706659200000000L
  val KmChurnHorizonUs = DayUs
  val KmHourUs = 3600000000L
  val KmCohortMod = 3L

  /** q274 restriction horizon: RMST over the first 1000 hours —
    * inside every cohort's observed span, so the τ-tail path (last
    * segment carried at the final surv_ppm) is genuinely exercised. */
  val RmstTauH = 1000L

  /** q121 domain gate: event values live in [0, 500] dollars. */
  val AuditValueLo = 0L; val AuditValueHi = 500L

  /** q103 success threshold: value ≥ $50 in cents. */
  val ChiSuccessCents = 500000L

  /** q255/q256 warped-cohort label rates (‰) per score decile — the
    // ONE table both engines' CASE is generated from (the q46
    // SampleRates discipline). Deliberately NON-monotone (dips at
    // bins 2, 4, 6, 8 — each rate below its predecessor) so PAV has
    // real violators to pool and Brier REL reads real
    // miscalibration. */
  val IsoThresh: Seq[Int] =
    Seq(150, 350, 250, 500, 420, 650, 600, 800, 700, 900)

  /** Spark CASE over the decile bin → IsoThresh ‰ rate. */
  private def isoThreshExpr(bin: Column): Column =
    IsoThresh.zipWithIndex.foldLeft(lit(0)) { case (acc, (t, i)) =>
      when(bin === i.toLong, t).otherwise(acc)
    }

  /** DuckDB CASE twin of [[isoThreshExpr]] over a column named `bin`. */
  private val IsoThreshSql: String =
    IsoThresh.zipWithIndex
      .map { case (t, i) => s"WHEN $i THEN $t" }
      .mkString("CASE bin ", " ", " ELSE 0 END")

  /** q265 SPRT design: H₀ p = 0.30 vs H₁ p = 0.40 at α = β = 5%. The
    * four walk constants are Q20-lattice DIFFERENCES computed ONCE
    * from the defining integer algorithm and interpolated into BOTH
    * engines' plans (the q46/q255 one-table discipline) — no float
    * log ever runs in either engine. */
  val SprtP0 = 300000L
  val SprtP1 = 400000L
  private val Lq20 = graft.functions.FixedLog.log2q20 _
  val SprtA: Long = Lq20(SprtP1) - Lq20(SprtP0)
  val SprtB: Long = Lq20(1000000L - SprtP1) - Lq20(1000000L - SprtP0)
  val SprtUp: Long = Lq20(950000L) - Lq20(50000L)
  val SprtLo: Long = Lq20(50000L) - Lq20(950000L)

  /** q104 snapshot cut: 1998-01-01T00:00:00Z in epoch millis. The
    * "drift" injection doubles late-window prices for a key stratum, so
    * the two snapshots genuinely differ in shape. */
  val DriftCutMs = 883612800000L
  val DriftMod = 3L; val DriftFactor = 2L
  /** q104 grid: $50k-wide buckets (5e8 units) cover orders' $1k-500k
    * o_totalprice span — doubled late-window prices reach the clamped
    * top bucket. */
  val DriftHistWidth = 500000000L

  /** q81 incremental cut: 2024-01-15T00:00:00Z. */
  val CutS = 1705276800L

  /** q83 interval half-width (2 h in µs) and the matching bin size:
    * bin ≈ interval length ⇒ ≤ 2 bins per interval. */
  val IvalUs = 7200L * 1000000L

  /** q88 SCD2 version labels (ISO strings compare chronologically). */
  val DimD0 = "2024-01-01"; val DimEff = "2024-01-15"

  /** q124 pre-prune bucket: $100 of price cents (~12 buckets over the
    * part table's ~$900–2100 retail span — enough for the per-bucket
    * max table to stay tiny while pruning most dominated rows). */
  val ParetoBucketCents = 1000000L

  /** q129 histogram-state geometry: event values live in [0, 500]
    * dollars (q121's domain gate), so $25-wide buckets give 20 cells —
    * informative everywhere, clamped edges absorb any drift. */
  val QsLo = 0L; val QsWidth = 250000L; val QsBuckets = 20
  val QsPcts = Seq(50, 90, 99)

  /** q131 CUSUM tuning (cents). Allowance k = $150 sits far above the
    * ~$50 value mean, so the unshifted walk decays ~$100/event and
    * pins to 0; the injected +$150 level shift (every 5th epoch day —
    * the q78 injection discipline: uniform data never shifts regime on
    * its own) makes shifted days drift +$50/event, crossing the $200
    * alarm threshold within each shifted day and fully resetting
    * between them. */
  val CusumK = 1500000L; val CusumH = 2000000L; val CusumShift = 1500000L
  val CusumDayMod = 5L

  // cents() now lives in Tables (imported via Tables._) — one shared
  // definition of the fixed-point conversion.

  /** q134 FIFO fixture: every 3rd customer's orders as an inventory
    * ledger (orderkey parity splits lots/demands — the q125 signed-walk
    * injection discipline), quantities in floor dollars so cumulative
    * products stay far inside Long, time in days since the TPC-H epoch. */
  val FifoCustMod = 3L; val FifoEpoch = "1992-01-01"

  /** q135 proration: one billion ppb units per nation, weights in floor
    * dollars of customer spend (T·max(w) ≈ 6·10^15 « Long.Max). */
  val ProrateTotal = 1000000000L

  /** q137 rolling beta: hourly buckets of floor-dollar value sums
    * (dollars, not cents, keep n·Σxm inside Long even at 100× event
    * density), trailing 24 observed buckets. */
  val HourNs = 3600000000000L; val BetaWindow = 24

  /** q140 time-bounded funnel: each stage must land within 7 days of
    * the previous one (epoch micros). */
  val FunnelGapUs = 7L * 86400L * 1000000L

  /** q144 session gap (30 min of epoch micros — events arrive ~11 h
    * apart per user at sf0.01, so most sessions are singletons with a
    * real multi-event tail) and the result depth. */
  val SessionGapUs = 1800L * 1000000L; val PathTopK = 20

  /** q145 period: epoch weeks of o_orderdate (day div 7). */
  val PopEpoch = "1992-01-01"

  /** q147/q150 share the daily-revenue-per-type series; q147 backtests
    * it at weekly seasonality, q150 reads its serial correlation. q150
    * quantizes to whole dollars so every ACF co-moment numerator stays
    * under 2^53 — cast-to-double is then EXACT (not merely correctly
    * rounded) through ~sf10; q147's integer metrics keep full cents. */
  val BacktestSeason = 7
  val AcfMaxLag = 3

  /** q149 rolling-active window: 7 days (the WAU in DAU/WAU). */
  val RauWindowDays = 7

  /** q152 Apriori thresholds, RELATIVE (ppm of basket count — the
    * textbook definition and the only kind that survives a data-size
    * change): brands sit at ~155k ppm item support and pair supports
    * cluster around ~22k ppm at every sf, so 100k/20k prune genuinely
    * without emptying the rule set. */
  val BasketItemSupPpm = 100000L
  val BasketPairSupPpm = 20000L

  /** q153 k-core: the co-purchase graph's degrees sit at median ~115
    * / min ~40 at sf0.01+ and median 89 / min 49 at sf0.001, so
    * k = 68 keeps a nonempty core at EVERY test sf — including
    * sf0.001's (176/200 nodes after a genuine 5-round cascade), where
    * k = 80 unravels the small graph to zero and k ≥ 95 unravels every
    * sf. The 10-round bound is BOTH the Spark loop's loud-failure cap
    * and the oracle's unroll depth — the two must move together. */
  val KCoreK = 68
  val KCorePeelRounds = 10

  /** q156 winsor/trim window: drop/clamp the deciles. */
  val TrimLoPct = 10; val TrimHiPct = 90

  /** q162 coverage budget: 3 greedy picks over 25 brands. */
  val CovK = 3

  /** q163 rolling-median window: 7 daily buckets. */
  val RollMedWin = 7

  /** q164 output slice (scaling uses FULL-group statistics; only every
    * 37th event's scaled row materializes — the q96 bounded-output
    * discipline for row-level transforms). */
  val ScaleSliceMod = 37L

  /** q166 target-encoding shrinkage (pseudo-observations) and output
    * slice. */
  val TeSmoothing = 10
  val TeSliceMod = 41L

  /** q167 lead-lag scan width: ±3 days. */
  val XcorrMaxLag = 3

  /** q168 Neyman sampling budget. */
  val NeymanK = 100

  /** q169 Q-Q grid: deciles. */
  val QqTiles = 10

  /** q171 demand-bucket epoch (pure day arithmetic — no calendar fns). */
  val EpochDay0 = "1970-01-01"

  /** q171 class boundaries: ABC at 80%/95% cumulative revenue; XYZ at
    * cv² ≤ 0.30 / ≤ 0.45 (measured part-demand cv²-ppm quartiles sit
    * at ~300k/380k/468k, so the splits populate all three classes at
    * every sf). */
  val AbcAPpm = 800000L; val AbcBPpm = 950000L
  val XyzXPpm = 300000L; val XyzYPpm = 450000L

  /** q172 injections: weekday amplification ×(10+dow)/10 and a ×3
    * true spike on every 11th epoch day — the deseasonalizer must
    * absorb the first and flag the second. */
  val DeseasSpikeMod = 11L; val DeseasSpikeFactor = 3L
  val DeseasZk = 2

  /** q173/q174 share q81's mid-period cut (2024-01-15T00:00Z): the
    * pre-cut window provides the CUPED covariate / targeting score,
    * the post-cut window the measured outcome. */
  val ExpCutUs = CutS * 1000000L

  /** q174 gains grid: deciles; conversion = ≥ 9 post-cut purchases
    * (~28% base rate); score noise modulus (deterministic tie-break
    * jitter under the simulated-model score). */
  val GainsTiles = 10
  val GainsConvMin = 9L
  val GainsNoiseMod = 7L

  /** q175 drift bucketing: 100-char document-length bins (6 bins over
    * the 48..553 n_chars span). */
  val TvBucketChars = 100L

  /** q180 A-ES weighted sample: 40 customers per market segment,
    * weighted by positive account balance. */
  val AesK = 40

  /** q183 κ fixture: $100 value bands clamped to 0..4; annotator B
    * misfiles every 7th event one band up and abstains (null) on every
    * 13th — κ must land well below raw agreement but far above 0. */
  val KappaBandCents = 1000000L
  val KappaMaxBand = 4L

  /** q184 split fractions (ppm, sum = 10⁶): the classic 80/10/10. */
  val SplitPpm: Seq[(String, Long)] =
    Seq(("train", 800000L), ("val", 100000L), ("test", 100000L))

  /** q178 burst window: 1 h — per-type arrivals run ~2.8/h, so peaks
    * reach the informative 6–10 range at every sf. */
  val BurstWindowUs = 3600L * 1000000L

  /** q158 visit gap: 1 day of epoch micros — events arrive ~11 h apart
    * per user, so day-gapped visits average ~2 events (a real
    * bounce/multi-event mix where q144's 30-min sessions are
    * singleton-dominated by design). */
  val ExitSessionGapUs = 86400L * 1000000L

  val all: Map[String, GraftQuery] = Map(

    // ------------------------------------------------------------------
    // q75 — SCD2 history MERGE (MergeOps.scd2Merge): urgent-order
    // revenue rolls into the customer dimension WITH history — matched
    // keys close their old version at Eff and open a VIP row with the
    // rebalanced account, source-only (shifted) keys insert, untouched
    // customers keep their open row. One full-outer join; the 1-or-2
    // output versions per key come from an exploded 2-array, never a
    // second dimension scan.
    // ------------------------------------------------------------------
    "q75_scd2_history" -> GraftQuery(
      build = (s, d) => {
        val delta = orders(s, d)
          .filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(
            when(col("o_custkey") % Scd2InsertMod === 0,
              col("o_custkey") + Scd2InsertShift)
              .otherwise(col("o_custkey")).as("c_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("bal_add"))
        // c_nationkey pre-cast long: the old/new version structs must
        // agree field-by-field (the insert branch writes -1L), and the
        // oracle casts to BIGINT for the same reason
        MergeOps.scd2Merge(
          customer(s, d)
            .withColumn("c_nationkey", col("c_nationkey").cast("long")),
          delta, Seq("c_custkey"),
          tracked = Map(
            "c_mktsegment" -> lit("VIP"),
            "c_acctbal" -> (col("t.c_acctbal").cast("decimal(18,4)")
              + col("s.bal_add")).cast("double")),
          onInsert = Map(
            "c_name" -> lit("NEW"),
            "c_nationkey" -> lit(-1L),
            "c_acctbal" -> col("s.bal_add").cast("double"),
            "c_mktsegment" -> lit("INSERTED")),
          outputCols = Seq("c_custkey", "c_name", "c_nationkey",
            "c_acctbal", "c_mktsegment"),
          currentFrom = lit(D0), effDate = Eff, highDate = High)
          .orderBy("c_custkey", "valid_from")
      },
      oracle = Some(s"""
        WITH delta AS (
          SELECT CASE WHEN o_custkey % $Scd2InsertMod = 0
              THEN o_custkey + $Scd2InsertShift ELSE o_custkey END AS c_custkey,
            sum(CAST(o_totalprice AS DECIMAL(18,4))) AS bal_add
          FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        m AS (SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal,
            t.c_mktsegment, s.bal_add
          FROM customer t JOIN delta s USING (c_custkey))
        SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
            c_acctbal, c_mktsegment,
            '$D0' AS valid_from, '$High' AS valid_to, true AS is_current
          FROM customer WHERE c_custkey NOT IN (SELECT c_custkey FROM delta)
        UNION ALL
        SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT), c_acctbal,
            c_mktsegment, '$D0', '$Eff', false
          FROM m
        UNION ALL
        SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT),
            CAST(CAST(c_acctbal AS DECIMAL(18,4)) + bal_add AS DOUBLE),
            'VIP', '$Eff', '$High', true
          FROM m
        UNION ALL
        SELECT s.c_custkey, 'NEW', CAST(-1 AS BIGINT),
            CAST(s.bal_add AS DOUBLE), 'INSERTED', '$Eff', '$High', true
          FROM delta s
          WHERE s.c_custkey NOT IN (SELECT c_custkey FROM customer)
        ORDER BY c_custkey, valid_from""")),

    // ------------------------------------------------------------------
    // q76 — gap-fill interpolation (TemporalOps.gapFillInterpolate):
    // per-user event values resampled onto an hourly grid — every grid
    // instant strictly inside an observation gap of ≤ 48 h gets the
    // integer-lerp value. Grid rows are GENERATED per gap (sequence +
    // explode), proportional to holes, never keys × calendar.
    // ------------------------------------------------------------------
    "q76_gap_fill" -> GraftQuery(
      build = (s, d) => {
        val pts = events(s, d).select(
          col("user_id"), col("event_id"),
          expr("ts div 1000000000").as("t_s"),
          cents(col("value")).as("v"))
        TemporalOps.gapFillInterpolate(pts, "user_id", "t_s", "event_id",
          "v", GridStepS, MaxGapS)
          .orderBy("user_id", "grid_t")
      },
      oracle = Some(s"""
        WITH p AS (SELECT user_id, event_id,
            epoch_us(ts) // 1000000 AS s,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
          FROM events),
        pr AS (SELECT user_id, s AS t0, v AS v0,
            lead(s) OVER w AS t1, lead(v) OVER w AS v1
          FROM p WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)),
        g AS (SELECT user_id, t0, v0, t1, v1,
            unnest(generate_series(t0 // $GridStepS + 1,
              (t1 - 1) // $GridStepS)) AS k
          FROM pr
          WHERE t1 IS NOT NULL AND t1 > t0 AND t1 - t0 <= $MaxGapS),
        l AS (SELECT user_id, k * $GridStepS AS grid_t, v0,
            (v1 - v0) * (k * $GridStepS - t0) AS num, t1 - t0 AS den
          FROM g)
        SELECT user_id, grid_t,
          v0 + (num - ((num % den + den) % den)) // den AS v_interp
        FROM l ORDER BY user_id, grid_t""")),

    // ------------------------------------------------------------------
    // q77 — equi-width histogram (StatsOps.histogram) of price cents in
    // $10k buckets with clamped edges: one map-side-combined aggregate
    // on a computed bucket id.
    // ------------------------------------------------------------------
    "q77_histogram" -> GraftQuery(
      build = (s, d) =>
        StatsOps.histogram(lineitem(s, d), cents(col("l_extendedprice")),
          HistLo, HistWidth, HistBuckets)
          .orderBy("bucket"),
      oracle = Some(s"""
        WITH c AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
            AS BIGINT) AS v FROM lineitem),
        b AS (SELECT least(greatest((v - $HistLo) // $HistWidth, 0),
            ${HistBuckets - 1}) AS bucket, v FROM c)
        SELECT bucket, count(*) AS n, min(v) AS lo_v, max(v) AS hi_v
        FROM b GROUP BY bucket ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // q78 — integer-exact z-score anomalies (StatsOps.zscoreFlags):
    // (n·x − Σx)² > k²·(n·Σx² − (Σx)²) in DECIMAL(38,0)/HUGEINT — the
    // float-free form of |x − mean| > k·σ, deterministic to the bit.
    // Deterministic spikes (event_id ≡ 0 mod 97 → ×21) give the uniform
    // fixture real outliers. Group stats broadcast back; the fact side
    // never shuffles.
    // ------------------------------------------------------------------
    "q78_anomaly_zscore" -> GraftQuery(
      build = (s, d) => {
        val vc = events(s, d).select(
          col("event_id"), col("event_type"),
          (cents(col("value")) *
            when(col("event_id") % SpikeMod === 0, SpikeFactor)
              .otherwise(1L)).as("v"))
        StatsOps.zscoreFlags(vc, "event_type", "v", ZScoreK)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
            min(when(col("is_outlier"), col("event_id"))).as("min_outlier_id"),
            max(when(col("is_outlier"), col("event_id"))).as("max_outlier_id"))
          .orderBy("event_type")
      },
      oracle = Some(s"""
        WITH v AS (SELECT event_id, event_type,
            CAST(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) *
              CASE WHEN event_id % $SpikeMod = 0 THEN $SpikeFactor ELSE 1 END
              AS HUGEINT) AS v
          FROM events),
        st AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS zn,
            sum(v) AS zs, sum(v * v) AS zss
          FROM v GROUP BY event_type),
        f AS (SELECT v.event_id, v.event_type,
            (st.zn * v.v - st.zs) * (st.zn * v.v - st.zs) >
              ${ZScoreK * ZScoreK} * (st.zn * st.zss - st.zs * st.zs)
              AS is_outlier
          FROM v JOIN st ON v.event_type IS NOT DISTINCT FROM st.event_type)
        SELECT event_type, count(*) AS n,
          CAST(sum(CASE WHEN is_outlier THEN 1 ELSE 0 END) AS BIGINT)
            AS n_outliers,
          min(CASE WHEN is_outlier THEN event_id END) AS min_outlier_id,
          max(CASE WHEN is_outlier THEN event_id END) AS max_outlier_id
        FROM f GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q79 — ordered funnel (signup → click → purchase, strictly
    // increasing time): each stage's reach time is the min over rows
    // AFTER the previous stage — three tiny per-user aggregates chained
    // by key joins; the events table shuffles once per stage on the
    // SAME key, so AQE/exchange-reuse co-locates them.
    // ------------------------------------------------------------------
    "q79_funnel" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("user_id"), col("event_type"), expr("ts div 1000").as("t_us"))
        val s1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("t_us").as("t_signup"))
        val s2 = ev.filter(col("event_type") === "click").as("e")
          .join(s1.as("a"), col("e.user_id") === col("a.user_id") &&
            col("e.t_us") > col("a.t_signup"))
          .groupBy(col("e.user_id").as("user_id"))
          .agg(min("e.t_us").as("t_click"))
        val s3 = ev.filter(col("event_type") === "purchase").as("e")
          .join(s2.as("b"), col("e.user_id") === col("b.user_id") &&
            col("e.t_us") > col("b.t_click"))
          .groupBy(col("e.user_id").as("user_id"))
          .agg(min("e.t_us").as("t_purchase"))
        ev.select("user_id").distinct()
          .join(s1, Seq("user_id"), "left")
          .join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .withColumn("stage",
            when(col("t_purchase").isNotNull, 3L)
              .when(col("t_click").isNotNull, 2L)
              .when(col("t_signup").isNotNull, 1L)
              .otherwise(0L))
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t_us
          FROM events),
        s1 AS (SELECT user_id, min(t_us) AS t_signup FROM ev
          WHERE event_type = 'signup' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.t_us) AS t_click
          FROM ev e JOIN s1 a ON e.user_id = a.user_id
            AND e.t_us > a.t_signup
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.t_us) AS t_purchase
          FROM ev e JOIN s2 b ON e.user_id = b.user_id
            AND e.t_us > b.t_click
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT u.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
          CAST(CASE WHEN s3.t_purchase IS NOT NULL THEN 3
            WHEN s2.t_click IS NOT NULL THEN 2
            WHEN s1.t_signup IS NOT NULL THEN 1
            ELSE 0 END AS BIGINT) AS stage
        FROM (SELECT DISTINCT user_id FROM ev) u
        LEFT JOIN s1 ON u.user_id = s1.user_id
        LEFT JOIN s2 ON u.user_id = s2.user_id
        LEFT JOIN s3 ON u.user_id = s3.user_id
        ORDER BY u.user_id""")),

    // ------------------------------------------------------------------
    // q80 — column profile (StatsOps.profile): every column's
    // null/distinct/min/max from ONE table scan — per-column pruned
    // sub-aggregates unioned at 1-row-each cost, deliberately NOT the
    // multi-distinct single-Aggregate form (that plans as an Expand
    // multiplying the scan by the column count; StatsOpsSpec asserts
    // no Expand and no sort appear). Numeric/time columns profile a
    // canonical integral ord so min/max stringify identically across
    // engines.
    // ------------------------------------------------------------------
    "q80_column_profile" -> GraftQuery(
      build = (s, d) =>
        StatsOps.profile(lineitem(s, d), Seq(
          StatsOps.ProfileCol("l_returnflag", col("l_returnflag")),
          StatsOps.ProfileCol("l_linestatus", col("l_linestatus")),
          StatsOps.ProfileCol("l_quantity", cents(col("l_quantity"))),
          StatsOps.ProfileCol("l_orderkey", col("l_orderkey")),
          StatsOps.ProfileCol("l_shipdate",
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))"))))
          .orderBy("col_name"),
      oracle = Some("""
        SELECT 'l_returnflag' AS col_name, count(*) AS n_rows,
          CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null,
          count(DISTINCT l_returnflag) AS n_distinct,
          CAST(min(l_returnflag) AS VARCHAR) AS min_v,
          CAST(max(l_returnflag) AS VARCHAR) AS max_v FROM lineitem
        UNION ALL
        SELECT 'l_linestatus', count(*),
          CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          count(DISTINCT l_linestatus),
          CAST(min(l_linestatus) AS VARCHAR),
          CAST(max(l_linestatus) AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_quantity', count(*),
          CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          count(DISTINCT CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
            AS BIGINT)),
          CAST(min(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT))
            AS VARCHAR),
          CAST(max(CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT))
            AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_orderkey', count(*),
          CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          count(DISTINCT l_orderkey),
          CAST(min(l_orderkey) AS VARCHAR),
          CAST(max(l_orderkey) AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_shipdate', count(*),
          CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
          count(DISTINCT epoch_ms(l_shipdate)),
          CAST(min(epoch_ms(l_shipdate)) AS VARCHAR),
          CAST(max(epoch_ms(l_shipdate)) AS VARCHAR) FROM lineitem
        ORDER BY col_name""")),

    // ------------------------------------------------------------------
    // q83 — interval-overlap join WITHOUT the cross product
    // (IntervalJoin.overlapJoin): error windows × purchase windows per
    // user — which purchases fell inside two hours of an error. The
    // range predicate becomes an equality hash join on (user, time
    // bin); each overlapping pair emits exactly once (first-common-bin
    // rule), the exact predicate filters survivors. The oracle is the
    // plain inequality join — same answer, quadratic plan only the
    // oracle can afford.
    // ------------------------------------------------------------------
    "q83_interval_overlap_join" -> GraftQuery(
      build = (s, d) => {
        val e = events(s, d).select(col("event_id"), col("user_id"),
          col("event_type"), expr("ts div 1000").as("t_us"))
        val a = e.filter(col("event_type") === "error").select(
          col("event_id").as("err_id"), col("user_id").as("a_user"),
          col("t_us").as("a_start"), (col("t_us") + IvalUs).as("a_end"))
        val b = e.filter(col("event_type") === "purchase").select(
          col("event_id").as("pur_id"), col("user_id").as("b_user"),
          col("t_us").as("b_start"), (col("t_us") + IvalUs).as("b_end"))
        graft.operators.IntervalJoin.overlapJoin(a, b,
            Seq("a_user" -> "b_user"),
            "a_start", "a_end", "b_start", "b_end", binSize = IvalUs)
          .select(col("err_id"), col("pur_id"), col("a_user").as("user_id"),
            (least(col("a_end"), col("b_end")) -
              greatest(col("a_start"), col("b_start"))).as("overlap_us"))
          .orderBy("err_id", "pur_id")
      },
      oracle = Some(s"""
        WITH a AS (SELECT event_id AS err_id, user_id,
            epoch_us(ts) AS a_start, epoch_us(ts) + $IvalUs AS a_end
          FROM events WHERE event_type = 'error'),
        b AS (SELECT event_id AS pur_id, user_id AS b_user,
            epoch_us(ts) AS b_start, epoch_us(ts) + $IvalUs AS b_end
          FROM events WHERE event_type = 'purchase')
        SELECT err_id, pur_id, user_id,
          least(a_end, b_end) - greatest(a_start, b_start) AS overlap_us
        FROM a JOIN b ON user_id = b_user
          AND a_start <= b_end AND b_start <= a_end
        ORDER BY err_id, pur_id""")),

    // ------------------------------------------------------------------
    // q88 — POINT-IN-TIME lookup against SCD2 history: build a user
    // dimension's history with scd2Merge (users with any error event
    // flag to 'FLAGGED' at DimEff), then resolve EVERY event against
    // the version valid at its date — composed through the NATIVE as-of
    // join (q65/q82's exec) with an ISO-date STRING time axis
    // (lexicographic == chronological; versions per key partition time,
    // so "latest valid_from <= event date" IS the active version). The
    // oracle is the textbook BETWEEN join. Two round-7 operators
    // composing is the point: history production and history
    // consumption in one plan.
    // ------------------------------------------------------------------
    "q88_temporal_dim_lookup" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("event_id"), col("user_id"), col("event_type"),
          date_format(expr("timestamp_seconds(ts div 1000000000)"),
            "yyyy-MM-dd").as("d"))
        val dim = ev.select(col("user_id")).distinct()
          .withColumn("segment", lit("STD"))
        val delta = ev.filter(col("event_type") === "error")
          .select(col("user_id")).distinct()
        val hist = MergeOps.scd2Merge(
          dim, delta, Seq("user_id"),
          tracked = Map("segment" -> lit("FLAGGED")),
          onInsert = Map("segment" -> lit("FLAGGED")),
          outputCols = Seq("user_id", "segment"),
          currentFrom = lit(DimD0), effDate = DimEff)
          .select(col("user_id").as("h_user_id"), col("segment"),
            col("valid_from"), col("valid_to"))
        graft.plans.AsofOps.asofJoin(ev, hist,
            Seq("user_id" -> "h_user_id"), "d", "valid_from")
          .filter(col("d") < col("valid_to"))
          .select(col("event_id"), col("user_id"), col("d"),
            col("segment"), col("valid_from"))
          .orderBy("event_id")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT event_id, user_id, event_type,
            CAST(CAST(ts AS DATE) AS VARCHAR) AS d FROM events),
        dim AS (SELECT DISTINCT user_id FROM ev),
        flagged AS (SELECT DISTINCT user_id FROM ev
          WHERE event_type = 'error'),
        hist AS (
          SELECT user_id, 'STD' AS segment, '$DimD0' AS valid_from,
            '9999-12-31' AS valid_to FROM dim
          WHERE user_id NOT IN (SELECT user_id FROM flagged)
          UNION ALL
          SELECT user_id, 'STD', '$DimD0', '$DimEff' FROM flagged
          UNION ALL
          SELECT user_id, 'FLAGGED', '$DimEff', '9999-12-31' FROM flagged)
        SELECT e.event_id, e.user_id, e.d, h.segment, h.valid_from
        FROM ev e JOIN hist h ON e.user_id = h.user_id
          AND h.valid_from <= e.d AND e.d < h.valid_to
        ORDER BY e.event_id""")),

    // ------------------------------------------------------------------
    // q89 — deterministic importance sampling (CorpusAssembly
    // .weightedSample): keep-rate per ROW from a quality proxy
    // (n_chars), hash-keyed like q46 — reproducible on any cluster and
    // monotone in the weight (raising a doc's score can only admit it,
    // never reshuffle the rest — rand()-sampling gives neither). Pure
    // per-row filter at scan speed.
    // ------------------------------------------------------------------
    "q89_weighted_sample" -> GraftQuery(
      build = (s, d) =>
        graft.operators.CorpusAssembly.weightedSample(
          graft.operators.ScanOps.spreadSmallInput(documents(s, d), col("doc_id"))
            .select(col("doc_id"), col("lang"), col("text"), col("n_chars")),
          "text", expr("n_chars div 2"))
          .select(col("doc_id"), col("lang"), col("hash_bucket"), col("rate_pm"))
          .orderBy("doc_id"),
      oracle = Some(s"""
        WITH h AS (SELECT doc_id, lang,
            (CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
              % ${graft.operators.CorpusAssembly.RateDenominator} AS hash_bucket,
            least(greatest(n_chars // 2, 0),
              ${graft.operators.CorpusAssembly.RateDenominator}) AS rate_pm
          FROM documents)
        SELECT doc_id, lang, hash_bucket, rate_pm FROM h
        WHERE hash_bucket < rate_pm ORDER BY doc_id""")),

    // ------------------------------------------------------------------
    // q81 — incremental aggregation maintenance (MergeOps.
    // mergeAggStates): merge(agg(before cut), agg(after cut)) must
    // equal agg(everything) — the invariant that lets a standing state
    // table absorb a daily delta instead of recomputing 100 TB. The
    // oracle computes the full aggregate directly, so the gate IS the
    // equivalence proof.
    // ------------------------------------------------------------------
    "q81_incremental_agg" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("user_id"), expr("ts div 1000000000").as("t_s"),
          cents(col("value")).as("v"))
        def state(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("user_id").agg(
            count(lit(1)).as("n_events"), sum("v").as("sum_cents"))
        MergeOps.mergeAggStates(
          state(ev.filter(col("t_s") < CutS)),
          state(ev.filter(col("t_s") >= CutS)),
          Seq("user_id"))
          .orderBy("user_id")
      },
      oracle = Some(s"""
        SELECT user_id, count(*) AS n_events,
          CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
            AS BIGINT) AS sum_cents
        FROM events GROUP BY user_id ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // q93 — robust (median/MAD) outlier summary (StatsOps.robustStats):
    // the heavy-tail-safe twin of q78 — a ×21 spike shifts mean and σ
    // enough to partially mask itself from a z-test, while median and
    // MAD ignore it entirely. Exact interpolated medians of integral
    // cents live on the .5/.25 IEEE grids, so every statistic and the
    // k·MAD threshold compare bit-identically cross-engine with no
    // fixed-point scaffolding. Same spike injection as q78 (uniform
    // fixtures flag nothing unpolluted).
    // ------------------------------------------------------------------
    "q93_robust_outliers" -> GraftQuery(
      build = (s, d) => {
        val b = orders(s, d).select(
          col("o_orderpriority").as("grp"),
          (cents(col("o_totalprice")) *
            when(col("o_orderkey") % SpikeMod === 0, SpikeFactor)
              .otherwise(1L)).as("cents"))
        StatsOps.robustStats(b, "grp", "cents", MadK)
          .orderBy("grp")
      },
      oracle = Some(s"""
        WITH b AS (SELECT o_orderpriority AS grp,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) *
              CASE WHEN o_orderkey % $SpikeMod = 0 THEN $SpikeFactor
              ELSE 1 END AS cents
          FROM orders),
        m AS (SELECT grp, median(cents) AS med FROM b GROUP BY grp),
        dv AS (SELECT b.grp, b.cents, m.med, abs(b.cents - m.med) AS adev
          FROM b JOIN m USING (grp)),
        md AS (SELECT grp, median(adev) AS mad FROM dv GROUP BY grp)
        SELECT dv.grp, count(*) AS n, min(dv.med) AS med, min(md.mad) AS mad,
          CAST(sum(CASE WHEN dv.adev > $MadK * md.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
        FROM dv JOIN md USING (grp) GROUP BY dv.grp ORDER BY dv.grp""")),

    // ------------------------------------------------------------------
    // q96 — LOCF forward fill (TemporalOps.locfFill): every event row
    // carries the user's most recent purchase amount — the step-function
    // twin of q76's interpolation (LOCF repeats the last observed state
    // instead of inventing intermediate values; right for state-like
    // metrics). Rows before a user's first purchase stay null. One
    // keyed window with an O(1) running last(ignoreNulls); integer
    // cents observations so carried values are bit-exact.
    // ------------------------------------------------------------------
    "q96_locf_fill" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .filter(col("user_id") % LocfUserMod === 0)
          .select(col("user_id"), col("event_id"),
            expr("ts div 1000").as("t_us"),
            when(col("event_type") === "purchase", cents(col("value")))
              .as("obs"))
        TemporalOps.locfFill(ev, "user_id", "t_us", "event_id", "obs")
          .orderBy("user_id", "t_us", "event_id")
      },
      oracle = Some(s"""
        WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us,
            CASE WHEN event_type = 'purchase'
              THEN CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              END AS obs
          FROM events WHERE user_id % $LocfUserMod = 0)
        SELECT user_id, event_id, t_us, obs,
          last_value(obs IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY t_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS obs_filled
        FROM e ORDER BY user_id, t_us, event_id""")),

    // ------------------------------------------------------------------
    // q98 — grouped least-squares fit + correlation (StatsOps.
    // linearFit): quantity→price regression per return flag from ONE
    // map-side-combined aggregate of exact decimal128 sufficient
    // statistics — no iteration, states merge by addition (the q81 IVM
    // property). The built-in covar_pop/corr/regr_slope accumulate
    // float co-moments and are partition-order-dependent in BOTH
    // engines; the co-moment identities over exact integer sums are
    // deterministic to the bit, and the one emitted float (corr) comes
    // from a fixed expression shape over exactly-agreed operands.
    // y is quantized to dollars so n·Σy² keeps ~15 digits of decimal128
    // headroom at any SF.
    // ------------------------------------------------------------------
    "q98_linear_fit" -> GraftQuery(
      build = (s, d) => {
        val b = lineitem(s, d).select(
          col("l_returnflag").as("grp"),
          col("l_quantity").cast("long").as("x"),
          expr("cast(cast(l_extendedprice as decimal(18,4)) * 10000 as bigint)"
            + " div 100").as("y"))
        StatsOps.linearFit(b, "grp", "x", "y").orderBy("grp")
      },
      oracle = Some(s"""
        WITH b AS (SELECT l_returnflag AS grp,
            CAST(l_quantity AS BIGINT) AS x,
            CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 100 AS y
          FROM lineitem),
        st AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * x) AS sxx,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(y AS HUGEINT) * y) AS syy
          FROM b GROUP BY grp),
        dd AS (SELECT grp, n,
            n * sxy - sx * sy AS cov_num,
            n * sxx - sx * sx AS varx_num,
            n * syy - sy * sy AS vary_num,
            sy * sxx - sx * sxy AS int_num
          FROM st)
        SELECT grp, CAST(n AS BIGINT) AS n,
          CASE WHEN varx_num <> 0 THEN CAST((1000 * cov_num -
            ((1000 * cov_num % varx_num + varx_num) % varx_num))
            // varx_num AS BIGINT) END AS slope_milli,
          CASE WHEN varx_num <> 0 THEN CAST((1000 * int_num -
            ((1000 * int_num % varx_num + varx_num) % varx_num))
            // varx_num AS BIGINT) END AS intercept_milli,
          CASE WHEN varx_num > 0 AND vary_num > 0 THEN
            CAST(CASE WHEN cov_num < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (((1000000 * abs(cov_num)) // varx_num) * abs(cov_num))
                  // vary_num AS DOUBLE))) AS BIGINT) AS BIGINT)
            END AS corr_milli
        FROM dd ORDER BY grp""")),

    // ------------------------------------------------------------------
    // q99 — equi-depth histogram (StatsOps.equiDepthHistogram): 8
    // quantile buckets of order prices per priority — the boundary-
    // finding twin of q77's equi-width buckets (what a range
    // partitioner / optimizer histogram / feature binner consumes).
    // ntile over a TOTAL (value, key) order makes bucket membership
    // row-deterministic; approx_percentile is the one-pass 100 TB
    // drop-in, gated by this exact form (q58/q93 discipline).
    // ------------------------------------------------------------------
    "q99_equidepth_hist" -> GraftQuery(
      build = (s, d) => {
        val b = orders(s, d).select(
          col("o_orderpriority").as("grp"), col("o_orderkey"),
          cents(col("o_totalprice")).as("cents"))
        StatsOps.equiDepthHistogram(b, "grp", "cents", "o_orderkey",
          DepthTiles)
          .orderBy("grp", "tile")
      },
      oracle = Some(s"""
        WITH b AS (SELECT o_orderpriority AS grp, o_orderkey,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS cents
          FROM orders),
        t AS (SELECT grp, cents,
            CAST(ntile($DepthTiles) OVER (PARTITION BY grp
              ORDER BY cents, o_orderkey) AS BIGINT) AS tile
          FROM b)
        SELECT grp, tile, count(*) AS n,
          min(cents) AS lo_v, max(cents) AS hi_v
        FROM t GROUP BY grp, tile ORDER BY grp, tile""")),

    // ------------------------------------------------------------------
    // q103 — 2×2 chi-square independence test (StatsOps.chiSquare2x2):
    // per event type, does the user-parity cohort predict a high-value
    // outcome? The A/B-test primitive as one map-side-combined aggregate
    // of four conditional counts, with χ² in exact floor micro-units via
    // the closed 2×2 form and the α = 0.05 verdict as an integer
    // compare — a float expected-frequency χ² flips threshold verdicts
    // between engines; this one cannot.
    // ------------------------------------------------------------------
    "q103_chi_square_ab" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("event_type").as("grp"),
          (col("user_id") % 2 === 0).as("a"),
          (cents(col("value")) >= ChiSuccessCents).as("b"))
        StatsOps.chiSquare2x2(ev, "grp", col("a"), col("b"))
          .orderBy("grp")
      },
      oracle = Some(s"""
        WITH e AS (SELECT event_type AS grp,
            user_id % 2 = 0 AS a,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              >= $ChiSuccessCents AS b
          FROM events),
        c AS (SELECT grp,
            CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
            CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n12,
            CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n21,
            CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT)
              AS n22
          FROM e GROUP BY grp),
        x AS (SELECT grp, n11, n12, n21, n22,
            CAST(n11 + n12 AS HUGEINT) * (n21 + n22) * (n11 + n21)
              * (n12 + n22) AS den,
            CAST(n11 AS HUGEINT) * n22 - CAST(n12 AS HUGEINT) * n21 AS d
          FROM c),
        y AS (SELECT grp, n11, n12, n21, n22,
            CASE WHEN den <> 0 THEN CAST(
              (1000000 * (n11 + n12 + n21 + n22) * (d * d)) // den AS BIGINT)
              END AS chi2_micro
          FROM x)
        SELECT grp, n11, n12, n21, n22, chi2_micro,
          CASE WHEN chi2_micro IS NOT NULL
            THEN CAST(chi2_micro >= 3841459 AS INT) END AS significant_05
        FROM y ORDER BY grp""")),

    // ------------------------------------------------------------------
    // q104 — histogram drift detection (StatsOps.histogramDriftChi2):
    // "does this week's corpus look like last week's?" — both order
    // snapshots (split at DriftCutMs, late-window prices deterministically
    // doubled for a key stratum so the shapes really differ) bucket
    // through q77's equi-width grid, and each bucket contributes its
    // two-sample chi-square term in exact floor micro-units. The PSI
    // alternative needs ln (a cross-engine float lottery); the χ² form
    // is integer/decimal only. Two histogram scans + a bucket-count-
    // sized join; the totals window runs on ≤ 12 rows.
    // ------------------------------------------------------------------
    "q104_histogram_drift" -> GraftQuery(
      build = (s, d) => {
        val base = orders(s, d).select(
          expr("unix_millis(cast(o_orderdate as timestamp))").as("t_ms"),
          col("o_orderkey"),
          cents(col("o_totalprice")).as("c0"))
        val priced = base.withColumn("cents",
          when(col("t_ms") >= DriftCutMs && col("o_orderkey") % DriftMod === 0,
            col("c0") * DriftFactor).otherwise(col("c0")))
        StatsOps.histogramDriftChi2(
          priced.filter(col("t_ms") < DriftCutMs),
          priced.filter(col("t_ms") >= DriftCutMs),
          col("cents"), HistLo, DriftHistWidth, HistBuckets)
          .orderBy("bucket")
      },
      oracle = Some(s"""
        WITH b AS (SELECT epoch_ms(o_orderdate) AS t_ms, o_orderkey,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS c0
          FROM orders),
        p AS (SELECT t_ms,
            CASE WHEN t_ms >= $DriftCutMs AND o_orderkey % $DriftMod = 0
              THEN c0 * $DriftFactor ELSE c0 END AS cents
          FROM b),
        hb AS (SELECT least(greatest((cents - $HistLo) // $DriftHistWidth, 0),
              ${HistBuckets - 1}) AS bucket, count(*) AS n_before
          FROM p WHERE t_ms < $DriftCutMs GROUP BY 1),
        ha AS (SELECT least(greatest((cents - $HistLo) // $DriftHistWidth, 0),
              ${HistBuckets - 1}) AS bucket, count(*) AS n_after
          FROM p WHERE t_ms >= $DriftCutMs GROUP BY 1),
        j AS (SELECT coalesce(hb.bucket, ha.bucket) AS bucket,
            CAST(coalesce(n_before, 0) AS BIGINT) AS n_before,
            CAST(coalesce(n_after, 0) AS BIGINT) AS n_after
          FROM hb FULL OUTER JOIN ha ON hb.bucket = ha.bucket),
        t AS (SELECT bucket, n_before, n_after,
            CAST(sum(n_before) OVER () AS BIGINT) AS n1,
            CAST(sum(n_after) OVER () AS BIGINT) AS n2,
            CAST(n_before AS HUGEINT) * (sum(n_after) OVER ())
              - CAST(n_after AS HUGEINT) * (sum(n_before) OVER ()) AS d
          FROM j)
        SELECT bucket, n_before, n_after,
          CASE WHEN n_before + n_after > 0 AND n1 > 0 AND n2 > 0
            THEN CAST((1000000 * (d * d)) //
              (CAST(n1 AS HUGEINT) * n2 * (n_before + n_after)) AS BIGINT)
            END AS chi2_term_micro
        FROM t ORDER BY bucket""")),

    // ------------------------------------------------------------------
    // q109 — cohort retention triangle over the events stream: users
    // cohorted by first-event week, distinct-user counts per (cohort,
    // week offset) with retention ppm against the cohort census
    // (TemporalOps.cohortRetention scaladoc — one user-keyed exchange
    // serves both the first-event window and the dedup; the ppm window
    // runs on the aggregated triangle, never on data).
    // ------------------------------------------------------------------
    "q109_cohort_retention" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("user_id"), expr("ts div 1000").as("t_us"))
        TemporalOps.cohortRetention(ev, "user_id", "t_us", RetentionBucketUs)
          .orderBy("cohort_bucket", "bucket_offset")
      },
      oracle = Some(s"""
        WITH e AS (SELECT user_id,
            epoch_us(ts) // $RetentionBucketUs AS wk FROM events),
        c AS (SELECT user_id, wk,
            min(wk) OVER (PARTITION BY user_id) AS cohort FROM e),
        d AS (SELECT DISTINCT user_id, cohort, wk - cohort AS off FROM c),
        n AS (SELECT cohort, off, count(*) AS n_users
          FROM d GROUP BY cohort, off)
        SELECT cohort AS cohort_bucket, off AS bucket_offset, n_users,
          CAST((n_users * 1000000) // (max(CASE WHEN off = 0 THEN n_users
            END) OVER (PARTITION BY cohort)) AS BIGINT) AS retained_ppm
        FROM n ORDER BY cohort_bucket, bucket_offset""")),

    // ------------------------------------------------------------------
    // q115 — co-purchase triangle counts (GraphOps.triangleCounts):
    // parts are linked when they appear in the same order; per-part
    // triangle participation counts the affinity TRIADS basket analysis
    // mines (and, run on a dedup candidate graph, the same operator's
    // clustering coefficient separates near-clique duplicate clusters
    // from false-positive chains). The engine pays O(m^1.5) via
    // degree-ordered orientation; the oracle enumerates the identical
    // wedge-close joins in SQL. Pair generation self-joins lineitem on
    // l_orderkey — bounded at C(13,2) pairs per order by the order-size
    // cap in the data.
    // ------------------------------------------------------------------
    "q115_triangle_count" -> GraftQuery(
      build = (s, d) => {
        graft.operators.GraphOps
          .triangleCounts(coPurchasePairs(s, d), "u", "v")
          .orderBy("node")
      },
      oracle = Some("""
        WITH pairs AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        deg AS (SELECT n, count(*) AS d FROM (
            SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
          GROUP BY n),
        o AS (SELECT
            CASE WHEN (da.d, u) < (db.d, v) THEN u ELSE v END AS s,
            CASE WHEN (da.d, u) < (db.d, v) THEN v ELSE u END AS t
          FROM pairs JOIN deg da ON da.n = u JOIN deg db ON db.n = v),
        tri AS (SELECT o1.s AS a, o1.t AS b, o2.t AS c
          FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t
          JOIN o o3 ON least(o3.s, o3.t) = o1.t
            AND greatest(o3.s, o3.t) = o2.t),
        pern AS (SELECT n2 AS node, count(*) AS tri_cnt FROM (
            SELECT a AS n2 FROM tri UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
          GROUP BY n2)
        SELECT deg.n AS node, CAST(coalesce(tri_cnt, 0) AS BIGINT) AS tri_cnt
        FROM deg LEFT JOIN pern ON pern.node = deg.n
        ORDER BY node""")),

    // ------------------------------------------------------------------
    // q116 — gaps-and-islands interval coalescing
    // (TemporalOps.coalesceIntervals): each event opens a service span
    // of event_id%7+1 hours; per user the overlapping/touching spans
    // merge into maximal coverage islands (when was the vehicle/user
    // actually live; how many distinct outages). One keyed exchange
    // serves the running-max window, the island-id sum and the rollup.
    // Oracle: the identical running-max formulation in DuckDB window
    // SQL — islanding via running max, not lag-previous (a long early
    // interval must swallow later short ones; the spec pins that).
    // ------------------------------------------------------------------
    "q116_interval_islands" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("user_id"),
          expr("ts div 1000").as("s_us"),
          (expr("ts div 1000") +
            (col("event_id") % 7 + 1) * IslandHourUs).as("e_us"))
        TemporalOps.coalesceIntervals(ev, "user_id", "s_us", "e_us")
          .orderBy("user_id", "island_start")
      },
      oracle = Some(s"""
        WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
            epoch_us(ts) + (event_id % 7 + 1) * $IslandHourUs AS e
          FROM events),
        f AS (SELECT user_id, s, e,
            max(e) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM iv),
        g AS (SELECT user_id, s, e,
            CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS nw
          FROM f),
        h AS (SELECT user_id, s, e,
            sum(nw) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
          FROM g)
        SELECT user_id, CAST(island AS BIGINT) AS island_id,
          min(s) AS island_start, max(e) AS island_end,
          max(e) - min(s) AS covered, CAST(count(*) AS BIGINT) AS n_intervals
        FROM h GROUP BY user_id, island
        ORDER BY user_id, island_start""")),

    // ------------------------------------------------------------------
    // q117 — time-weighted average (TemporalOps.timeWeightedAvg): each
    // event's value holds until the user's next event; the per-user
    // mean weighs by holding time, not sample count (the idle-vs-chatty
    // key correction every telemetry warehouse needs). value rides as
    // integer 1e-4-dollar units (house cents discipline), products sum
    // in decimal128 (a long wraps after ~18 segments here), and the
    // truncating decimal div matches DuckDB's // exactly. One keyed
    // exchange serves the lead window and the aggregate.
    // ------------------------------------------------------------------
    "q117_time_weighted_avg" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          col("user_id"),
          expr("ts div 1000").as("t_us"),
          col("event_id"),
          expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)")
            .as("v_e4"))
        TemporalOps.timeWeightedAvg(ev, "user_id", "t_us", "event_id", "v_e4")
          .withColumnRenamed("twa", "twap_e4")
          .withColumnRenamed("span", "span_us")
          .orderBy("user_id")
      },
      oracle = Some("""
        WITH s AS (SELECT user_id, epoch_us(ts) AS t, event_id AS tie,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
          FROM events
          WHERE ts IS NOT NULL AND value IS NOT NULL),
        d AS (SELECT user_id, v,
            lead(t) OVER (PARTITION BY user_id ORDER BY t, tie) - t AS dur
          FROM s),
        g AS (SELECT user_id, sum(CAST(v AS HUGEINT) * dur) AS num,
            sum(dur) AS den, count(*) AS n_seg
          FROM d WHERE dur IS NOT NULL GROUP BY user_id)
        SELECT user_id, CAST(num // den AS BIGINT) AS twap_e4,
          CAST(den AS BIGINT) AS span_us, CAST(n_seg AS BIGINT) AS n_seg
        FROM g WHERE den > 0 ORDER BY user_id""")),

    // ------------------------------------------------------------------
    // q118 — multi-source BFS hop distances (GraphOps.bfsDistances):
    // "how many co-purchase hops from any seed product" — the
    // graph-proximity feature joined back onto a catalog/corpus (and on
    // a dup-candidate graph: distance from a known-bad cluster). Every
    // 97th part seeds; 3 frontier rounds of join+anti-join move only
    // (node, hop) longs; unreached nodes report -1. Oracle: DuckDB
    // recursive CTE bounded by the same hop cap, min-hop per node.
    // ------------------------------------------------------------------
    "q118_bfs_hops" -> GraftQuery(
      build = (s, d) => {
        val seeds = part(s, d)
          .filter(col("p_partkey") % BfsSeedMod === 0)
          .select(col("p_partkey"))
        graft.operators.GraphOps
          .bfsDistances(coPurchasePairs(s, d), "u", "v",
            seeds, "p_partkey", BfsMaxHops)
          .orderBy("node")
      },
      oracle = Some(s"""
        WITH RECURSIVE pairs AS (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
        nodes AS (SELECT DISTINCT u AS n FROM edges),
        seeds AS (SELECT p_partkey AS n FROM part
          WHERE p_partkey % $BfsSeedMod = 0),
        reach(n, d) AS (
          SELECT s.n, 0 FROM seeds s JOIN nodes x ON x.n = s.n
          UNION
          SELECT e.v, r.d + 1 FROM reach r JOIN edges e ON e.u = r.n
          WHERE r.d < $BfsMaxHops),
        m AS (SELECT n, min(d) AS d FROM reach GROUP BY n)
        SELECT nodes.n AS node, CAST(coalesce(m.d, -1) AS BIGINT) AS hops
        FROM nodes LEFT JOIN m ON m.n = nodes.n ORDER BY node""")),

    // ------------------------------------------------------------------
    // q119 — RFM segmentation (StatsOps.rfmSegments): per-mktsegment
    // recency/frequency/monetary quartiles over the orders fact, tile 1
    // best on each axis, code = r·100+f·10+m. Quartile windows are
    // partitioned by segment (no global single-partition sort) and
    // totally ordered by (metric, custkey) so boundaries are
    // cross-engine exact; the as-of reference date is a report INPUT
    // (a literal — no fact re-aggregation for a 1-row broadcast).
    // Monetary rides as integer 1e-4-dollar units.
    // ------------------------------------------------------------------
    "q119_rfm_segments" -> GraftQuery(
      build = (s, d) => {
        val tx = orders(s, d)
          .join(customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"), col("o_custkey"),
            expr("unix_millis(cast(o_orderdate as timestamp))").as("t_ms"),
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 as bigint)")
              .as("amt_e4"))
        StatsOps.rfmSegments(tx, "seg", "o_custkey", "t_ms", "amt_e4",
            RfmTiles, RfmAsOfMs)
          .withColumnRenamed("entity", "custkey")
          .withColumnRenamed("monetary", "monetary_e4")
          .orderBy("seg", "custkey")
      },
      oracle = Some(s"""
        WITH tx AS (SELECT c_mktsegment AS seg, o_custkey AS custkey,
            epoch_ms(o_orderdate) AS t,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS amt
          FROM orders JOIN customer ON o_custkey = c_custkey),
        per AS (SELECT seg, custkey, max(t) AS last_ms,
            count(*) AS frequency, sum(amt) AS monetary
          FROM tx GROUP BY seg, custkey),
        m0 AS (SELECT seg, custkey,
            ($RfmAsOfMs - last_ms) // 86400000 AS recency_days,
            frequency, monetary FROM per),
        t AS (SELECT seg, custkey, recency_days, frequency, monetary,
            ntile($RfmTiles) OVER (PARTITION BY seg
              ORDER BY recency_days, custkey) AS r,
            ntile($RfmTiles) OVER (PARTITION BY seg
              ORDER BY frequency DESC, custkey) AS f,
            ntile($RfmTiles) OVER (PARTITION BY seg
              ORDER BY monetary DESC, custkey) AS m
          FROM m0)
        SELECT seg, custkey, CAST(recency_days AS BIGINT) AS recency_days,
          CAST(frequency AS BIGINT) AS frequency,
          CAST(monetary AS BIGINT) AS monetary_e4,
          CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code
        FROM t ORDER BY seg, custkey""")),

    // ------------------------------------------------------------------
    // q120 — Kaplan-Meier churn survival (StatsOps.kmSurvival): per
    // cohort, the fraction of users surviving past each tenure hour
    // given right-censoring (users still active at study close leave
    // the risk set without counting as churn — the error a plain
    // retention ratio makes). The estimator IS DEFINED as the
    // sequential ppm-floored recurrence S_k = floor(S_{k-1}(r_k-d_k)/
    // r_k), so the Spark HOF fold and the DuckDB recursive CTE walk the
    // identical integer lattice.
    // ------------------------------------------------------------------
    "q120_km_survival" -> GraftQuery(
      build = (s, d) => {
        val subj = events(s, d)
          .select(col("user_id"), expr("ts div 1000").as("t_us"))
          .groupBy("user_id")
          .agg(min("t_us").as("first_us"), max("t_us").as("last_us"))
          .select(
            (col("user_id") % KmCohortMod).as("cohort"),
            expr(s"(last_us - first_us) div $KmHourUs").as("dur_h"),
            when(col("last_us") < KmStudyEndUs - KmChurnHorizonUs, 1L)
              .otherwise(0L).as("ev"))
        StatsOps.kmSurvival(subj, "cohort", "dur_h", "ev")
          .withColumnRenamed("t", "t_hours")
          .orderBy("cohort", "t_hours")
      },
      oracle = Some(s"""
        WITH RECURSIVE subj AS (
          SELECT user_id % $KmCohortMod AS cohort,
            (max(epoch_us(ts)) - min(epoch_us(ts))) // $KmHourUs AS t,
            CASE WHEN max(epoch_us(ts)) < ${KmStudyEndUs - KmChurnHorizonUs}
              THEN 1 ELSE 0 END AS ev
          FROM events GROUP BY user_id),
        byd AS (SELECT cohort, t, count(*) AS n_all, sum(ev) AS d
          FROM subj GROUP BY cohort, t),
        r0 AS (SELECT cohort, t, d,
            sum(n_all) OVER (PARTITION BY cohort) -
              coalesce(sum(n_all) OVER (PARTITION BY cohort ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
          FROM byd),
        deaths AS (SELECT cohort, t, r, d,
            row_number() OVER (PARTITION BY cohort ORDER BY t) AS rk
          FROM r0 WHERE d > 0),
        km(cohort, rk, t, r, d, s) AS (
          SELECT cohort, rk, t, r, d, (1000000 * (r - d)) // r
          FROM deaths WHERE rk = 1
          UNION ALL
          SELECT x.cohort, x.rk, x.t, x.r, x.d, (km.s * (x.r - x.d)) // x.r
          FROM km JOIN deaths x
            ON x.cohort = km.cohort AND x.rk = km.rk + 1)
        SELECT cohort, t AS t_hours, CAST(r AS BIGINT) AS n_risk,
          CAST(d AS BIGINT) AS n_death, CAST(s AS BIGINT) AS surv_ppm
        FROM km ORDER BY cohort, t_hours""")),

    // ------------------------------------------------------------------
    // q121 — data-quality constraint audit (QualityAudit): the
    // promote-gate report — completeness, key uniqueness (single and
    // composite), functional dependencies (one that holds through a
    // join, one that genuinely fails: an order spans suppliers),
    // referential integrity, and a domain range — each ONE report row
    // of counts; violating rows never leave the executors. Oracle
    // recomputes every check definitionally.
    // ------------------------------------------------------------------
    "q121_quality_audit" -> GraftQuery(
      build = (s, d) => {
        import graft.operators.QualityAudit._
        val li = lineitem(s, d); val ev = events(s, d)
        val liOrders = li.join(orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        completeness(ev, "value", "events.value")
          .unionAll(uniqueness(orders(s, d), Seq("o_orderkey"),
            "orders.o_orderkey"))
          .unionAll(uniqueness(li, Seq("l_orderkey", "l_partkey"),
            "lineitem.(l_orderkey,l_partkey)"))
          .unionAll(functionalDependency(li, "l_orderkey", "l_suppkey",
            "lineitem: l_orderkey->l_suppkey"))
          .unionAll(functionalDependency(liOrders, "l_orderkey", "o_custkey",
            "lineitem*orders: l_orderkey->o_custkey"))
          .unionAll(referentialOrphans(li, "l_partkey", part(s, d),
            "p_partkey", "lineitem.l_partkey->part.p_partkey"))
          .unionAll(inRange(ev, "value", AuditValueLo, AuditValueHi,
            "events.value in [0,500]"))
          .orderBy("check_name", "target")
      },
      oracle = Some(s"""
        SELECT * FROM (
          SELECT 'completeness' AS check_name, 'events.value' AS target,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(*) - count(value) AS BIGINT) AS n_violations,
            CAST(count(*) - count(value) = 0 AS INT) AS pass
          FROM events
          UNION ALL
          SELECT 'uniqueness', 'orders.o_orderkey',
            CAST(sum(cnt) AS BIGINT), CAST(sum(cnt) - count(*) AS BIGINT),
            CAST(sum(cnt) - count(*) = 0 AS INT)
          FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey)
          UNION ALL
          SELECT 'uniqueness', 'lineitem.(l_orderkey,l_partkey)',
            CAST(sum(cnt) AS BIGINT), CAST(sum(cnt) - count(*) AS BIGINT),
            CAST(sum(cnt) - count(*) = 0 AS INT)
          FROM (SELECT count(*) AS cnt FROM lineitem
            GROUP BY l_orderkey, l_partkey)
          UNION ALL
          SELECT 'functional_dependency', 'lineitem: l_orderkey->l_suppkey',
            CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS INT)
          FROM (SELECT det, count(*) AS ndep FROM
            (SELECT DISTINCT l_orderkey AS det, l_suppkey FROM lineitem)
            GROUP BY det)
          UNION ALL
          SELECT 'functional_dependency',
            'lineitem*orders: l_orderkey->o_custkey',
            CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) = 0 AS INT)
          FROM (SELECT det, count(*) AS ndep FROM
            (SELECT DISTINCT l_orderkey AS det, o_custkey FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey)
            GROUP BY det)
          UNION ALL
          SELECT 'referential', 'lineitem.l_partkey->part.p_partkey',
            CAST(count(*) AS BIGINT),
            CAST(sum(CASE WHEN fk IS NOT NULL AND pk IS NULL
              THEN 1 ELSE 0 END) AS BIGINT),
            CAST(sum(CASE WHEN fk IS NOT NULL AND pk IS NULL
              THEN 1 ELSE 0 END) = 0 AS INT)
          FROM (SELECT l_partkey AS fk, p.p_partkey AS pk FROM lineitem
            LEFT JOIN (SELECT DISTINCT p_partkey FROM part) p
              ON l_partkey = p_partkey)
          UNION ALL
          SELECT 'in_range', 'events.value in [0,500]',
            CAST(count(*) AS BIGINT),
            CAST(count(*) - sum(CASE WHEN value BETWEEN $AuditValueLo AND
              $AuditValueHi THEN 1 ELSE 0 END) AS BIGINT),
            CAST(count(*) - sum(CASE WHEN value BETWEEN $AuditValueLo AND
              $AuditValueHi THEN 1 ELSE 0 END) = 0 AS INT)
          FROM events
        ) ORDER BY check_name, target""")),

    // ------------------------------------------------------------------
    // q122 — event transition matrix (TemporalOps.transitionMatrix):
    // the empirical Markov kernel over per-user event sequences —
    // "after a view, what happens next, how often" — for journey
    // analytics and sequence-anomaly scoring. Each user's last event
    // emits no transition (successor unobserved); probabilities are
    // floor-ppm of the from-state's outgoing total, computed on the
    // ≤ |states|² aggregated frame, never on the sequences.
    // ------------------------------------------------------------------
    "q122_transition_matrix" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_id"),
          col("event_type"))
        TemporalOps.transitionMatrix(ev, "user_id", "t_us", "event_id",
            "event_type")
          .orderBy("from_state", "to_state")
      },
      oracle = Some("""
        WITH seq AS (SELECT event_type AS from_state,
            lead(event_type) OVER (PARTITION BY user_id
              ORDER BY epoch_us(ts), event_id) AS to_state
          FROM events),
        c AS (SELECT from_state, to_state, count(*) AS cnt FROM seq
          WHERE to_state IS NOT NULL GROUP BY from_state, to_state),
        t AS (SELECT from_state, to_state, cnt,
            sum(cnt) OVER (PARTITION BY from_state) AS from_total
          FROM c)
        SELECT from_state, to_state, CAST(cnt AS BIGINT) AS cnt,
          CAST(from_total AS BIGINT) AS from_total,
          CAST((cnt * 1000000) // from_total AS BIGINT) AS prob_ppm
        FROM t ORDER BY from_state, to_state""")),

    // ------------------------------------------------------------------
    // q123 — multi-touch attribution (TemporalOps.attribution): each
    // purchase distributes conversion credit over the touches back to
    // the previous purchase — first-touch / last-touch counts and
    // floor-ppm linear shares per channel, all three models from ONE
    // user-keyed shuffle (reverse-running-count assignment, no
    // per-conversion interval join). Touches after a user's last
    // purchase credit nothing (their conversion never happened). The
    // channel sort is pinned NULLS FIRST on both sides: Spark ascending
    // defaults nulls-first, DuckDB nulls-last — a NULL channel (absent
    // from today's fixture, but fixtures have been regenerated
    // mid-round before) must not flip the output order cross-engine.
    // ------------------------------------------------------------------
    "q123_attribution" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_id"),
          col("event_type"))
        TemporalOps.attribution(ev, "user_id", "t_us", "event_id",
            "event_type", "purchase")
          .orderBy("channel")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id,
            event_type AS channel,
            CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
          FROM events),
        g AS (SELECT *, sum(is_conv) OVER (PARTITION BY user_id
            ORDER BY t DESC, event_id DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conv_grp
          FROM ev),
        t AS (SELECT channel,
            count(*) OVER (PARTITION BY user_id, conv_grp) AS n_touches,
            row_number() OVER (PARTITION BY user_id, conv_grp
              ORDER BY t, event_id) AS rn_first,
            row_number() OVER (PARTITION BY user_id, conv_grp
              ORDER BY t DESC, event_id DESC) AS rn_last
          FROM g WHERE is_conv = 0 AND conv_grp >= 1)
        SELECT channel, CAST(count(*) AS BIGINT) AS touches,
          CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS first_touch,
          CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS last_touch,
          CAST(sum(1000000 // n_touches) AS BIGINT) AS linear_ppm
        FROM t GROUP BY channel ORDER BY channel NULLS FIRST""")),

    // ------------------------------------------------------------------
    // q124 — Pareto frontier (StatsOps.paretoFrontier2D): the parts no
    // other part beats on BOTH price (lower better) and size (higher
    // better) — the procurement shortlist. Engine side runs the
    // distributed bucket pre-prune + exact range-frame pass; the oracle
    // is the pure two-window formulation — agreement cross-checks the
    // prune's correctness proof, not just the arithmetic.
    // ------------------------------------------------------------------
    "q124_pareto_frontier" -> GraftQuery(
      build = (s, d) => {
        val p = part(s, d).select(col("p_partkey"),
          cents(col("p_retailprice")).as("price_cents"),
          col("p_size").cast("long").as("size_l"))
        StatsOps.paretoFrontier2D(p, "price_cents", "size_l",
            ParetoBucketCents)
          .orderBy("price_cents", "p_partkey")
      },
      oracle = Some("""
        WITH p AS (SELECT p_partkey,
            CAST(CAST(p_retailprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS price_cents,
            CAST(p_size AS BIGINT) AS size_l
          FROM part),
        m AS (SELECT *,
            max(size_l) OVER (ORDER BY price_cents
              RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS myc,
            max(size_l) OVER (PARTITION BY price_cents) AS mye
          FROM p)
        SELECT p_partkey, price_cents, size_l FROM m
        WHERE (myc IS NULL OR size_l > myc) AND size_l = mye
        ORDER BY price_cents, p_partkey""")),

    // ------------------------------------------------------------------
    // q125 — clamped running balance (TemporalOps.clampedBalance): the
    // floor-at-zero ledger recurrence solved in closed form (reflection
    // identity: balance = free walk − its running min), so the
    // "inherently sequential" fold costs one keyed window shuffle.
    // Fixture: each customer's orders as a signed ledger (orderkey
    // parity splits ~50/50 into charges/payments — the q78 injection
    // discipline: TPC-H has no natural signs, and an unsigned walk
    // never clamps). Per-customer summary: closing/peak balance and
    // how often the floor bound.
    // ------------------------------------------------------------------
    "q125_clamped_balance" -> GraftQuery(
      build = (s, d) => {
        val led = orders(s, d).select(col("o_custkey").as("cust"),
          expr("unix_millis(cast(o_orderdate as timestamp))").as("t_ms"),
          col("o_orderkey").as("ok"),
          (when(col("o_orderkey") % 2 === 0, -1L).otherwise(1L) *
            cents(col("o_totalprice"))).as("amt"))
        TemporalOps.clampedBalance(led, "cust", "t_ms", "ok", "amt")
          .withColumn("rn_last", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("cust")
              .orderBy(col("t_ms").desc, col("ok").desc)))
          .groupBy(col("cust"))
          .agg(count(lit(1)).as("n_tx"),
            max(when(col("rn_last") === 1, col("balance")))
              .as("final_balance"),
            max(col("balance")).as("peak_balance"),
            sum(col("clamped").cast("long")).as("n_clamped"))
          .orderBy("cust")
      },
      oracle = Some("""
        WITH led AS (SELECT o_custkey AS cust, epoch_ms(o_orderdate) AS t_ms,
            o_orderkey AS ok,
            CAST(CASE WHEN o_orderkey % 2 = 0 THEN -1 ELSE 1 END AS BIGINT) *
              CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS amt
          FROM orders),
        s1 AS (SELECT *, sum(amt) OVER (PARTITION BY cust ORDER BY t_ms, ok
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS free
          FROM led),
        s2 AS (SELECT *, least(CAST(0 AS BIGINT), min(free) OVER
            (PARTITION BY cust ORDER BY t_ms, ok
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS runmin
          FROM s1),
        s3 AS (SELECT *,
            free - runmin AS balance,
            free < lag(runmin, 1, CAST(0 AS BIGINT)) OVER
              (PARTITION BY cust ORDER BY t_ms, ok) AS clamped,
            row_number() OVER (PARTITION BY cust
              ORDER BY t_ms DESC, ok DESC) AS rn_last
          FROM s2)
        SELECT cust, CAST(count(*) AS BIGINT) AS n_tx,
          CAST(max(CASE WHEN rn_last = 1 THEN balance END) AS BIGINT)
            AS final_balance,
          CAST(max(balance) AS BIGINT) AS peak_balance,
          CAST(sum(CASE WHEN clamped THEN 1 ELSE 0 END) AS BIGINT)
            AS n_clamped
        FROM s3 GROUP BY cust ORDER BY cust""")),

    // ------------------------------------------------------------------
    // q127 — grouped weighted median (StatsOps.weightedMedian): the
    // quantity-weighted median price per return flag — "the price at
    // which half the UNITS moved", which the row median gets wrong
    // whenever quantity correlates with price. Exact integer halving
    // test (2·cumw ≥ totw) on the (group, value)-compressed frame;
    // weights in quantity cents so fractional quantities stay exact.
    // ------------------------------------------------------------------
    "q127_weighted_median" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d).select(col("l_returnflag"),
          cents(col("l_extendedprice")).as("price_cents"),
          cents(col("l_quantity")).as("qty_w"))
        StatsOps.weightedMedian(li, "l_returnflag", "price_cents", "qty_w",
            HistWidth)
          .orderBy("l_returnflag")
      },
      oracle = Some("""
        WITH r AS (SELECT l_returnflag,
            CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS price_cents,
            CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT) AS rw
          FROM lineitem),
        c AS (SELECT l_returnflag, price_cents, sum(rw) AS w
          FROM r WHERE rw > 0 AND price_cents IS NOT NULL
          GROUP BY 1, 2),
        cw AS (SELECT *,
            sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_cents
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
            sum(w) OVER (PARTITION BY l_returnflag) AS totw
          FROM c)
        SELECT l_returnflag, min(price_cents) AS w_median,
          CAST(max(totw) AS BIGINT) AS total_w
        FROM cw WHERE cumw * 2 >= totw
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    // q129 — incremental quantiles via mergeable histogram state
    // (MergeOps.histogramState/mergeHistogramStates/quantilesFromState):
    // q81's IVM discipline extended to an ORDER statistic — per-day
    // bucket-count states land at ingest, combine by bucket-wise
    // addition (any merge tree, same state), and p50/p90/p99 read off
    // the merged ≤20-row state without rescanning history. The
    // estimator is a defined integer statistic (ceil-rank target,
    // floor-interpolated inside the answering bucket); the oracle
    // recomputes state→merge→estimate from scratch, so the hash gate
    // proves the per-day decomposition lossless.
    // ------------------------------------------------------------------
    "q129_ivm_quantile" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(
          expr("ts div 1000").as("t_us"), cents(col("value")).as("v"))
        val state = MergeOps.histogramState(ev,
          TemporalOps.floorDiv(col("t_us"), lit(DayUs)),
          col("v"), QsLo, QsWidth, QsBuckets)
        MergeOps.quantilesFromState(
            MergeOps.mergeHistogramStates(state), QsPcts, QsLo, QsWidth)
          .orderBy("q_pct")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT epoch_us(ts) // $DayUs AS day,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
          FROM events),
        state AS (SELECT day,
            least(greatest((v - $QsLo) // $QsWidth, 0), ${QsBuckets - 1})
              AS bucket, count(*) AS n
          FROM ev GROUP BY day, bucket),
        merged AS (SELECT bucket, CAST(sum(n) AS BIGINT) AS n FROM state
          GROUP BY bucket),
        cw AS (SELECT bucket, n,
            sum(n) OVER (ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(n) OVER () AS total
          FROM merged),
        qs AS (SELECT CAST(unnest([${QsPcts.mkString(", ")}]) AS BIGINT)
            AS q_pct),
        probe AS (SELECT q_pct, bucket, n, cum, total,
            (q_pct * total + 99) // 100 AS target
          FROM qs CROSS JOIN cw)
        SELECT q_pct,
          CAST($QsLo + bucket * $QsWidth +
            ((target - (cum - n)) * $QsWidth) // n AS BIGINT) AS estimate,
          CAST(total AS BIGINT) AS n_rows
        FROM probe WHERE cum >= target AND cum - n < target
        ORDER BY q_pct""")),

    // ------------------------------------------------------------------
    // q130 — EWMA smoother / control chart (TemporalOps.ewmaSmooth):
    // each customer's order-value trend under dyadic decay, with the
    // per-step deviation from forecast (the control-chart signal). The
    // q120 sequential-lattice discipline: Spark's aggregate fold and
    // the oracle's recursive CTE walk the same trunc-div recurrence,
    // hash-gated row for row.
    // ------------------------------------------------------------------
    "q130_ewma_smooth" -> GraftQuery(
      build = (s, d) => {
        val led = orders(s, d).select(col("o_custkey").as("cust"),
          expr("unix_millis(cast(o_orderdate as timestamp))").as("t_ms"),
          col("o_orderkey").as("ok"), cents(col("o_totalprice")).as("x"))
        TemporalOps.ewmaSmooth(led, "cust", "t_ms", "ok", "x")
          .withColumnRenamed("tie", "ok")
          .orderBy("cust", "t", "ok")
      },
      oracle = Some("""
        WITH RECURSIVE led AS (SELECT o_custkey AS cust,
            epoch_ms(o_orderdate) AS t, o_orderkey AS ok,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS x,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY epoch_ms(o_orderdate), o_orderkey) AS rn
          FROM orders),
        walk(cust, rn, t, ok, x, e, dev) AS (
          SELECT cust, rn, t, ok, x, x, CAST(NULL AS BIGINT)
          FROM led WHERE rn = 1
          UNION ALL
          SELECT l.cust, l.rn, l.t, l.ok, l.x,
            CAST((walk.e + l.x) AS BIGINT) // 2, l.x - walk.e
          FROM walk JOIN led l ON l.cust = walk.cust
            AND l.rn = walk.rn + 1)
        SELECT cust, t, ok, x, e, dev FROM walk
        ORDER BY cust, t, ok""")),

    // ------------------------------------------------------------------
    // q131 — CUSUM change-point detection: the classic upward-shift
    // monitor S_i = max(0, S_{i−1} + (x_i − k)) IS q125's clamped
    // ledger applied to allowance-shifted deviations — pure operator
    // reuse, zero new machinery (the reflection identity solves CUSUM's
    // "sequential" recurrence too). Per event type: alarm count
    // (upward h-crossings via a lag of the walk), first alarm time,
    // walk peak. Fixture injects +$150 on every 5th epoch day so the
    // shifted regimes the monitor exists to catch actually occur.
    // ------------------------------------------------------------------
    "q131_cusum_changepoints" -> GraftQuery(
      build = (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("t_us", "event_id")
        val ev = events(s, d).select(col("event_type"),
          expr("ts div 1000").as("t_us"), col("event_id"),
          (cents(col("value")) +
            when(TemporalOps.floorDiv(expr("ts div 1000"), lit(DayUs))
              % CusumDayMod === 0, CusumShift).otherwise(0L) -
            CusumK).as("x"))
        TemporalOps.clampedBalance(ev, "event_type", "t_us", "event_id", "x")
          .withColumn("alarm",
            (col("balance") >= CusumH &&
              coalesce(lag(col("balance"), 1).over(w), lit(0L)) < CusumH)
              .cast("long"))
          .groupBy(col("event_type"))
          .agg(sum(col("alarm")).as("n_alarms"),
            min(when(col("alarm") === 1, col("t_us"))).as("first_alarm_us"),
            max(col("balance")).as("peak_cusum"))
          .orderBy("event_type")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT event_type, epoch_us(ts) AS t_us, event_id,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) +
              CASE WHEN (epoch_us(ts) // $DayUs) % $CusumDayMod = 0
                THEN $CusumShift ELSE 0 END - $CusumK AS x
          FROM events),
        s1 AS (SELECT *, sum(x) OVER (PARTITION BY event_type
            ORDER BY t_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS free
          FROM ev),
        s2 AS (SELECT *, least(CAST(0 AS BIGINT), min(free) OVER
            (PARTITION BY event_type ORDER BY t_us, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS runmin
          FROM s1),
        s3 AS (SELECT event_type, t_us, event_id,
            free - runmin AS balance,
            coalesce(lag(free - runmin, 1) OVER (PARTITION BY event_type
              ORDER BY t_us, event_id), 0) AS prev_balance
          FROM s2)
        SELECT event_type,
          CAST(sum(CASE WHEN balance >= $CusumH AND prev_balance < $CusumH
            THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms,
          min(CASE WHEN balance >= $CusumH AND prev_balance < $CusumH
            THEN t_us END) AS first_alarm_us,
          CAST(max(balance) AS BIGINT) AS peak_cusum
        FROM s3 GROUP BY event_type ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q133 — revenue-concentration Gini (StatsOps.giniConcentration):
    // how unequally a nation's revenue spreads over its customers — the
    // inequality readout behind data-mixing decisions (a near-1 Gini on
    // corpus sources is a dedup smell) computed on the per-entity
    // pre-aggregate, never raw facts. Rank-weighted exact form in
    // floor-ppm; ranks tie-break on custkey without affecting G (equal
    // spends contribute identically at swapped ranks).
    // ------------------------------------------------------------------
    "q133_gini_concentration" -> GraftQuery(
      build = (s, d) => {
        val spend = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(tbl(s, d, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("spend"))
        StatsOps.giniConcentration(spend, "n_name", "spend", "c_custkey")
          .orderBy("n_name")
      },
      oracle = Some("""
        WITH spend AS (SELECT n_name, c_custkey,
            sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS spend
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        ranked AS (SELECT n_name, spend,
            CAST(row_number() OVER (PARTITION BY n_name
              ORDER BY spend, c_custkey) AS BIGINT) AS rnk
          FROM spend),
        agg AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(spend) AS BIGINT) AS total,
            sum(CAST(rnk AS HUGEINT) * CAST(spend AS HUGEINT)) AS s
          FROM ranked GROUP BY 1)
        SELECT n_name, n, total,
          CASE WHEN total > 0 THEN CAST(
            (CAST(1000000 AS HUGEINT) *
              (2 * s - (CAST(n AS HUGEINT) + 1) * total))
            // (CAST(n AS HUGEINT) * total) AS BIGINT) END AS gini_ppm
        FROM agg ORDER BY n_name""")),

    // ------------------------------------------------------------------
    // q134 — FIFO lot matching (TemporalOps.fifoMatch): the cost-basis /
    // inventory-consumption pairing solved without a sequential fold —
    // on each side's cumulative-quantity axis, FIFO matches are exactly
    // the interval overlaps (unit-rank pairing: the i-th unit out
    // consumes the i-th unit in, backorders allowed), so the whole op is
    // two keyed window cumsums + one key-equi join whose per-key output
    // is a staircase of ≤ lots+demands−1 rows. Fixture: every 3rd
    // customer's orders as a ledger, even orderkeys are inflow lots.
    // ------------------------------------------------------------------
    "q134_fifo_match" -> GraftQuery(
      build = (s, d) => {
        val led = orders(s, d)
          .filter(col("o_custkey") % FifoCustMod === 0)
          .select(col("o_custkey").as("cust"),
            datediff(col("o_orderdate").cast("date"),
              lit(FifoEpoch).cast("date")).cast("long").as("t_day"),
            col("o_orderkey").as("ok"),
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000" +
              " as bigint) div 10000").as("qty"),
            (col("o_orderkey") % 2 === 0).as("is_lot"))
        TemporalOps.fifoMatch(led, "cust", "t_day", "ok", "qty", "is_lot")
          .withColumn("hold_days", col("d_t") - col("lot_t"))
          .orderBy("cust", "lot_tie", "d_tie")
      },
      oracle = Some(s"""
        WITH led AS (SELECT o_custkey AS cust,
            date_diff('day', DATE '$FifoEpoch', CAST(o_orderdate AS DATE))
              AS t_day,
            o_orderkey AS ok,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 10000 AS qty,
            o_orderkey % 2 = 0 AS is_lot
          FROM orders WHERE o_custkey % $FifoCustMod = 0),
        cum AS (SELECT *, CAST(sum(qty) OVER (PARTITION BY cust, is_lot
            ORDER BY t_day, ok
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS hi
          FROM led),
        c2 AS (SELECT *, hi - qty AS lo FROM cum),
        l AS (SELECT cust, t_day AS lot_t, ok AS lot_tie, lo, hi
          FROM c2 WHERE is_lot),
        dd AS (SELECT cust, t_day AS d_t, ok AS d_tie, lo, hi
          FROM c2 WHERE NOT is_lot)
        SELECT l.cust, lot_t, lot_tie, d_t, d_tie,
          least(l.hi, dd.hi) - greatest(l.lo, dd.lo) AS matched_qty,
          d_t - lot_t AS hold_days
        FROM l JOIN dd ON l.cust = dd.cust
          AND l.lo < dd.hi AND dd.lo < l.hi
        ORDER BY l.cust, lot_tie, d_tie""")),

    // ------------------------------------------------------------------
    // q135 — largest-remainder proration (StatsOps.
    // prorateLargestRemainder): split one billion budget units per
    // nation over its customers proportionally to spend, with integer
    // shares that sum EXACTLY to the total (Hamilton's method; the
    // remainder count falls out of the same aggregate that computed the
    // group weight, so the op is one tiny groupBy broadcast back + one
    // per-group rank window). The floor-dollar weight unit keeps
    // T·max(w) ≈ 6·10^15 inside Long at every SF.
    // ------------------------------------------------------------------
    "q135_proration" -> GraftQuery(
      build = (s, d) => {
        val spend = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(tbl(s, d, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), col("c_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
          .withColumn("weight", expr("spend_cents div 10000"))
          .select("n_name", "c_custkey", "weight")
        StatsOps.prorateLargestRemainder(spend, "n_name", "c_custkey",
            "weight", ProrateTotal)
          .select("n_name", "c_custkey", "weight", "alloc")
          .orderBy("n_name", "c_custkey")
      },
      oracle = Some(s"""
        WITH spend AS (SELECT n_name, c_custkey,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) // 10000 AS weight
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        tot AS (SELECT n_name, CAST(sum(weight) AS BIGINT) AS grp_w
          FROM spend GROUP BY 1),
        based AS (SELECT s.n_name, c_custkey, weight, grp_w,
            ($ProrateTotal * weight) // grp_w AS base,
            ($ProrateTotal * weight) % grp_w AS rem
          FROM spend s JOIN tot t USING (n_name)),
        r AS (SELECT *, CAST(row_number() OVER (PARTITION BY n_name
              ORDER BY rem DESC, c_custkey) AS BIGINT) AS rn,
            CAST(sum(rem) OVER (PARTITION BY n_name) AS BIGINT) AS rem_sum
          FROM based)
        SELECT n_name, c_custkey, weight,
          base + CASE WHEN rn <= rem_sum // grp_w THEN 1 ELSE 0 END AS alloc
        FROM r ORDER BY n_name, c_custkey""")),

    // ------------------------------------------------------------------
    // q137 — rolling beta vs the market (StatsOps.rollingBeta): each
    // event type's hourly value sums regressed against the all-types
    // hourly series over a trailing 24-bucket window — the co-movement /
    // drift screen. Exact integer moments (n·Σxm − Σx·Σm over
    // n·Σmm − (Σm)²) in floor dollars; the ppm division sign-splits
    // because Spark div truncates while DuckDB // floors. Windows run on
    // the |types|·|hours| aggregated frame, never raw events.
    // ------------------------------------------------------------------
    "q137_rolling_beta" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("event_type"),
          expr(s"ts div $HourNs").as("h"),
          expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)" +
            " div 10000").as("v"))
        val byType = ev.groupBy("event_type", "h").agg(sum("v").as("x"))
        val mkt = ev.groupBy("h").agg(sum("v").as("m"))
        StatsOps.rollingBeta(byType.join(broadcast(mkt), "h"),
            "event_type", "h", "x", "m", BetaWindow)
          .select("event_type", "h", "x", "m", "n", "cov_num", "var_num",
            "beta_ppm")
          .orderBy("event_type", "h")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT event_type,
            epoch_us(ts) // ${HourNs / 1000L} AS h,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) // 10000
              AS v
          FROM events),
        bt AS (SELECT event_type, h, CAST(sum(v) AS BIGINT) AS x
          FROM ev GROUP BY 1, 2),
        mk AS (SELECT h, CAST(sum(v) AS BIGINT) AS m FROM ev GROUP BY 1),
        j AS (SELECT event_type, h, x, m FROM bt JOIN mk USING (h)),
        wnd AS (SELECT event_type, h, x, m,
            CAST(count(*) OVER w AS BIGINT) AS n,
            CAST(sum(x) OVER w AS BIGINT) AS sx,
            CAST(sum(m) OVER w AS BIGINT) AS sm,
            CAST(sum(x * m) OVER w AS BIGINT) AS sxm,
            CAST(sum(m * m) OVER w AS BIGINT) AS smm
          FROM j WINDOW w AS (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN ${BetaWindow - 1} PRECEDING AND CURRENT ROW))
        SELECT event_type, h, x, m, n,
          n * sxm - sx * sm AS cov_num,
          n * smm - sm * sm AS var_num,
          CASE WHEN n * smm - sm * sm = 0 THEN NULL
            WHEN n * sxm - sx * sm < 0
              THEN -((1000000 * (sx * sm - n * sxm)) // (n * smm - sm * sm))
            ELSE (1000000 * (n * sxm - sx * sm)) // (n * smm - sm * sm)
          END AS beta_ppm
        FROM wnd ORDER BY event_type, h""")),

    // ------------------------------------------------------------------
    // q138 — audience-overlap matrix (StatsOps.audienceOverlap): for
    // every event-type pair, how many users do both, with floor-ppm
    // Jaccard — the segment-cannibalization / corpus-source-overlap
    // readout. Pairs are generated per user from the sorted distinct
    // type set (≤ C(|types|,2) per user), never an |users|² self-join;
    // per-type sizes broadcast back onto the C(|types|,2)-row frame.
    // ------------------------------------------------------------------
    "q138_audience_overlap" -> GraftQuery(
      build = (s, d) => {
        StatsOps.audienceOverlap(
            events(s, d).select("user_id", "event_type"),
            "user_id", "event_type")
          .orderBy("cat_a", "cat_b")
      },
      oracle = Some("""
        WITH uc AS (SELECT DISTINCT user_id, event_type FROM events),
        sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM uc GROUP BY 1),
        pr AS (SELECT a.event_type AS cat_a, b.event_type AS cat_b,
            CAST(count(*) AS BIGINT) AS n_both
          FROM uc a JOIN uc b
            ON a.user_id = b.user_id AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT cat_a, cat_b, sa.n AS n_a, sb.n AS n_b, n_both,
          (1000000 * n_both) // (sa.n + sb.n - n_both) AS jaccard_ppm
        FROM pr
        JOIN sz sa ON cat_a = sa.event_type
        JOIN sz sb ON cat_b = sb.event_type
        ORDER BY cat_a, cat_b""")),

    // ------------------------------------------------------------------
    // q139 — arrival-cadence profile (TemporalOps.cadenceProfile):
    // per-type inter-arrival gap p25/p50/p75 as DISCRETE order
    // statistics (the value at rank ceil(q·n) — never an interpolated
    // float) plus the IQR/median regularity ratio in floor-ppm (≈0 =
    // metronome/bot, large = bursty). Two keyed windows on the event
    // stream; the percentile picks are rank-predicate aggregates, not
    // sorts.
    // ------------------------------------------------------------------
    "q139_cadence_profile" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("event_type"),
          expr("ts div 1000").as("t_us"), col("event_id"))
        TemporalOps.cadenceProfile(ev, "event_type", "t_us", "event_id")
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH ev AS (SELECT event_type, epoch_us(ts) AS t_us, event_id
          FROM events),
        g AS (SELECT event_type, event_id,
            t_us - lag(t_us) OVER (PARTITION BY event_type
              ORDER BY t_us, event_id) AS gap
          FROM ev),
        g2 AS (SELECT event_type, gap,
            CAST(row_number() OVER (PARTITION BY event_type
              ORDER BY gap, event_id) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM g WHERE gap IS NOT NULL),
        p AS (SELECT event_type, max(n) AS n_gaps,
            max(CASE WHEN rn * 100 >= n * 25 AND (rn - 1) * 100 < n * 25
              THEN gap END) AS p25,
            max(CASE WHEN rn * 100 >= n * 50 AND (rn - 1) * 100 < n * 50
              THEN gap END) AS p50,
            max(CASE WHEN rn * 100 >= n * 75 AND (rn - 1) * 100 < n * 75
              THEN gap END) AS p75
          FROM g2 GROUP BY 1)
        SELECT event_type, n_gaps, p25, p50, p75, p75 - p25 AS iqr,
          (1000000 * (p75 - p25)) // nullif(p50, 0) AS regularity_ppm
        FROM p ORDER BY event_type""")),

    // ------------------------------------------------------------------
    // q140 — time-bounded funnel (TemporalOps.funnelWithin): earliest
    // signup → click-within-7d → purchase-within-7d-of-click per user —
    // q79's funnel with the conversion windows marketing actually uses
    // (greedy-earliest is optimal: any later qualifying event only
    // shrinks the next stage's window). One key-equi join + groupBy per
    // stage on the same hash partitioning; the gap predicate bounds
    // every join's buffered range.
    // ------------------------------------------------------------------
    "q140_windowed_funnel" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_type"))
        TemporalOps.funnelWithin(ev, "user_id", "t_us", "event_type",
            Seq("signup", "click", "purchase"), FunnelGapUs)
          .orderBy("user_id")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS t_us, event_type
          FROM events),
        s1 AS (SELECT user_id, min(t_us) AS t_1 FROM ev
          WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id, min(e.t_us) AS t_2
          FROM ev e JOIN s1 p ON e.user_id = p.user_id
            AND e.t_us > p.t_1 AND e.t_us <= p.t_1 + $FunnelGapUs
          WHERE e.event_type = 'click' GROUP BY 1),
        s3 AS (SELECT e.user_id, min(e.t_us) AS t_3
          FROM ev e JOIN s2 p ON e.user_id = p.user_id
            AND e.t_us > p.t_2 AND e.t_us <= p.t_2 + $FunnelGapUs
          WHERE e.event_type = 'purchase' GROUP BY 1)
        SELECT s1.user_id, t_1, t_2, t_3,
          CAST(CASE WHEN t_3 IS NOT NULL THEN 3
            WHEN t_2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
            AS stage_reached
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
        ORDER BY s1.user_id""")),

    // ------------------------------------------------------------------
    // q144 — session path mining (TemporalOps.sessionPaths): the most
    // frequent within-session event-type sequences — the discovery side
    // of funnel analysis (q79/q140 TEST a path; this finds which paths
    // are worth testing). q20's gap sessionization (>30 min opens a new
    // session), paths joined in (t, event_id) order, frequencies
    // counted on the SESSION-sized frame, top-20 by (n desc, path asc)
    // as a TakeOrderedAndProject.
    // ------------------------------------------------------------------
    "q144_session_paths" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_id"),
          col("event_type"))
        TemporalOps.sessionPaths(ev, "user_id", "t_us", "event_id",
          "event_type", SessionGapUs, PathTopK)
      },
      oracle = Some(s"""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS t, event_id,
            event_type
          FROM events),
        g AS (SELECT *, CASE WHEN lag(t) OVER
              (PARTITION BY user_id ORDER BY t, event_id) IS NULL
              OR t - lag(t) OVER
              (PARTITION BY user_id ORDER BY t, event_id)
                > $SessionGapUs
            THEN 1 ELSE 0 END AS brk
          FROM ev),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
            ORDER BY t, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
          FROM g),
        p AS (SELECT user_id, sess,
            string_agg(event_type, '>' ORDER BY t, event_id) AS path
          FROM s GROUP BY 1, 2)
        SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1
        ORDER BY n DESC, path LIMIT $PathTopK""")),

    // ------------------------------------------------------------------
    // q145 — period-over-period movers (StatsOps.periodOverPeriod):
    // weekly revenue per nation beside the previous week and the
    // floor-ppm relative change — the dashboard lead table. The lag
    // window runs on the |nations|·|weeks| PRE-AGGREGATED frame, never
    // orders; the ppm change sign-splits (Spark div truncates, DuckDB
    // // floors); week 1 and zero-revenue predecessors yield null
    // change, never a fake 0.
    // ------------------------------------------------------------------
    "q145_period_over_period" -> GraftQuery(
      build = (s, d) => {
        val weekly = orders(s, d)
          .join(customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(tbl(s, d, "nation"),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            TemporalOps.floorDiv(datediff(col("o_orderdate").cast("date"),
              lit(PopEpoch).cast("date")).cast("long"), lit(7L))
              .as("week"))
          .agg(sum(cents(col("o_totalprice"))).as("rev"))
        StatsOps.periodOverPeriod(weekly, "n_name", "week", "rev")
          .orderBy("n_name", "week")
      },
      oracle = Some(s"""
        WITH weekly AS (SELECT n_name,
            date_diff('day', DATE '$PopEpoch', CAST(o_orderdate AS DATE))
              // 7 AS week,
            CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) AS rev
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        l AS (SELECT n_name, week, rev,
            lag(rev) OVER (PARTITION BY n_name ORDER BY week) AS prev
          FROM weekly)
        SELECT n_name, week, rev, prev, rev - prev AS delta,
          CASE WHEN prev IS NULL OR prev = 0 THEN NULL
            WHEN rev - prev < 0
              THEN -((1000000 * (prev - rev)) // prev)
            ELSE (1000000 * (rev - prev)) // prev END AS delta_ppm
        FROM l ORDER BY n_name, week""")),

    // ------------------------------------------------------------------
    // q147 — seasonal-naive forecast backtest
    // (TemporalOps.seasonalNaiveBacktest): the rolling-origin harness
    // every forecast deployment runs BEFORE trusting a model — "how
    // wrong was periodic carry-forward (f_d = revenue_{d−7}) on
    // history?" WAPE/bias floors any real model must beat, in exact
    // ppm. Facts reduce to (type, day, Σcents) first; the seasonal base
    // is an equi-join of that tiny frame to itself on (type, day−7) —
    // co-partitioned, no window over facts. Signed bias rides the
    // floorDiv pmod identity (Spark div truncates, DuckDB // floors).
    // ------------------------------------------------------------------
    "q147_forecast_backtest" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("period"))
          .agg(sum(cents(col("value"))).as("v"))
        TemporalOps.seasonalNaiveBacktest(daily, "grp", "period", "v",
            BacktestSeason)
          .orderBy("grp")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS period,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
              AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        j AS (SELECT a.grp AS grp, a.v AS actual, b.v AS forecast
          FROM daily a JOIN daily b
            ON a.grp = b.grp AND b.period = a.period - $BacktestSeason),
        m AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_eval,
            CAST(sum(abs(actual - forecast)) AS BIGINT) AS sum_abs_err,
            CAST(sum(actual) AS BIGINT) AS sum_actual,
            CAST(sum(forecast - actual) AS BIGINT) AS sum_signed_err
          FROM j GROUP BY grp)
        SELECT grp, n_eval, sum_abs_err, sum_actual,
          CASE WHEN sum_actual > 0
            THEN (1000000 * sum_abs_err) // sum_actual END AS wape_ppm,
          CASE WHEN sum_actual > 0
            THEN (1000000 * sum_signed_err
              - ((1000000 * sum_signed_err % sum_actual + sum_actual)
                 % sum_actual)) // sum_actual END AS bias_ppm
        FROM m ORDER BY grp""")),

    // ------------------------------------------------------------------
    // q148 — Benford first-digit audit (QualityAudit.benfordAudit): the
    // forensic screen on organically-grown amount columns — order
    // totals put digit d first with probability log₁₀(1+1/d);
    // fabricated/clamped data drifts toward uniform. Per (priority,
    // digit 1..9): count, observed ppm, the compile-time-constant
    // Benford ppm table (the only log₁₀, taken once at build time) and
    // the signed deviation; all 9 rows always emit (an absent digit is
    // the loudest signal). One (grp, digit) map-side count + a
    // broadcast 9-row spine — nothing else touches the facts.
    // ------------------------------------------------------------------
    "q148_benford_audit" -> GraftQuery(
      build = (s, d) => {
        val amounts = orders(s, d).select(
          col("o_orderpriority").as("g"),
          cents(col("o_totalprice")).as("amt"))
        graft.operators.QualityAudit.benfordAudit(amounts, "g", "amt")
          .withColumnRenamed("g", "grp")
          .orderBy("grp", "digit")
      },
      oracle = Some(s"""
        WITH v AS (SELECT o_orderpriority AS grp,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS amt
          FROM orders),
        obs AS (SELECT grp,
            CAST(substr(CAST(amt AS VARCHAR), 1, 1) AS BIGINT) AS digit,
            CAST(count(*) AS BIGINT) AS n_obs
          FROM v WHERE amt > 0 GROUP BY 1, 2),
        e(digit, exp_ppm) AS (VALUES
          (CAST(1 AS BIGINT), CAST(301029 AS BIGINT)), (2, 176091),
          (3, 124938), (4, 96910), (5, 79181), (6, 66946), (7, 57991),
          (8, 51152), (9, 45757)),
        spine AS (SELECT DISTINCT grp FROM obs),
        f AS (SELECT s.grp AS grp, e.digit AS digit, e.exp_ppm AS exp_ppm,
            coalesce(o.n_obs, 0) AS n_obs
          FROM spine s CROSS JOIN e
          LEFT JOIN obs o ON o.grp = s.grp AND o.digit = e.digit),
        t AS (SELECT grp, digit, n_obs,
            (1000000 * n_obs) //
              CAST(sum(n_obs) OVER (PARTITION BY grp) AS BIGINT)
              AS obs_ppm,
            exp_ppm
          FROM f)
        SELECT grp, digit, n_obs, CAST(obs_ppm AS BIGINT) AS obs_ppm,
          exp_ppm, CAST(obs_ppm - exp_ppm AS BIGINT) AS dev_ppm
        FROM t ORDER BY grp, digit""")),

    // ------------------------------------------------------------------
    // q149 — rolling distinct actives, DAU/WAU/stickiness
    // (TemporalOps.rollingActiveUsers): the canonical "you cannot
    // window-DISTINCT at scale" operator. DuckDB single-node CAN —
    // count(DISTINCT) over a RANGE frame, which IS this oracle — while
    // the distributed shape must explode each (user, day) to the ≤7
    // window days it covers and re-dedup: linear ×7 blow-up, two hash
    // shuffles, no driver-side sets, no quadratic self-join. Output
    // keeps only days with observed activity (window tails are a grid
    // question — q76's job).
    // ------------------------------------------------------------------
    "q149_rolling_dau_wau" -> GraftQuery(
      build = (s, d) => {
        val days = events(s, d).select(col("user_id"),
          expr(s"(ts div 1000) div $DayUs").as("day"))
        TemporalOps.rollingActiveUsers(days, "user_id", "day",
            RauWindowDays)
          .orderBy("day")
      },
      oracle = Some(s"""
        WITH ud AS (SELECT DISTINCT user_id AS u,
            epoch_us(ts) // $DayUs AS d FROM events),
        dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau
          FROM ud GROUP BY d),
        wau AS (SELECT DISTINCT d,
            CAST(count(DISTINCT u) OVER (ORDER BY d RANGE BETWEEN
              ${RauWindowDays - 1} PRECEDING AND CURRENT ROW) AS BIGINT)
              AS wau
          FROM ud)
        SELECT dau.d AS day, dau.dau AS dau, wau.wau AS wau,
          (1000000 * dau.dau) // wau.wau AS stickiness_ppm
        FROM dau JOIN wau ON wau.d = dau.d ORDER BY day""")),

    // ------------------------------------------------------------------
    // q150 — serial (lag-ℓ) correlation / sample ACF
    // (StatsOps.lagCorrelation): is the daily-revenue series trending
    // or noise? Pearson correlation of {(x_t, x_{t+ℓ})} for ℓ = 1..3
    // per event type, from exact decimal128 co-moments (the q98
    // sufficient-statistics shape — one keyed window emits all lag
    // pair streams via lead, one map-side-combined aggregate, no
    // self-joins). Values quantized to whole dollars keep every
    // numerator under 2^53, so cast-to-double is exact and the one
    // sqrt/divide is bit-identical cross-engine.
    // ------------------------------------------------------------------
    "q150_acf" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("period"))
          .agg(sum(cents(col("value"))).as("vc"))
          .select(col("grp"), col("period"), expr("vc div 10000").as("v"))
        StatsOps.lagCorrelation(daily, "grp", "period", "period", "v",
            AcfMaxLag)
          .orderBy("grp", "lag")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS period,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
              AS BIGINT) // 10000 AS v
          FROM events GROUP BY 1, 2),
        p AS (SELECT grp, v,
            lead(v, 1) OVER w AS y1, lead(v, 2) OVER w AS y2,
            lead(v, 3) OVER w AS y3
          FROM daily WINDOW w AS (PARTITION BY grp ORDER BY period)),
        pairs AS (
          SELECT grp, CAST(1 AS BIGINT) AS lag, v AS x, y1 AS y
            FROM p WHERE y1 IS NOT NULL
          UNION ALL SELECT grp, 2, v, y2 FROM p WHERE y2 IS NOT NULL
          UNION ALL SELECT grp, 3, v, y3 FROM p WHERE y3 IS NOT NULL),
        st AS (SELECT grp, lag, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * x) AS sxx,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(y AS HUGEINT) * y) AS syy
          FROM pairs GROUP BY grp, lag),
        dd AS (SELECT grp, lag, n, n * sxy - sx * sy AS cov_num,
            n * sxx - sx * sx AS varx_num,
            n * syy - sy * sy AS vary_num
          FROM st)
        SELECT grp, lag, CAST(n AS BIGINT) AS n,
          CASE WHEN varx_num > 0 AND vary_num > 0 THEN
            CAST(CASE WHEN cov_num < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (((1000000 * abs(cov_num)) // varx_num) * abs(cov_num))
                  // vary_num AS DOUBLE))) AS BIGINT) AS BIGINT)
            END AS acf_milli
        FROM dd ORDER BY grp, lag""")),

    // ------------------------------------------------------------------
    // q152 — market-basket association rules (AssociationRules
    // .basketRules): Apriori level-2 over order baskets of brands —
    // which brands co-occur beyond chance, with the DIRECTIONAL
    // confidence q138's symmetric Jaccard cannot express, plus lift in
    // exact ppm (decimal128 n_AB·N product — no overflow lottery).
    // Relative (ppm-of-N) thresholds prune before pairs form (Apriori
    // monotonicity) and again before the directional expansion; pairs
    // generate per basket from its sorted surviving-item set, never an
    // items² or baskets² join.
    // ------------------------------------------------------------------
    "q152_basket_rules" -> GraftQuery(
      build = (s, d) => {
        val bi = lineitem(s, d)
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey"), col("p_brand"))
        graft.operators.AssociationRules.basketRules(bi, "l_orderkey",
            "p_brand", BasketItemSupPpm, BasketPairSupPpm)
          .orderBy("antecedent", "consequent")
      },
      oracle = Some(s"""
        WITH bi AS (SELECT DISTINCT l_orderkey AS b, p_brand AS i
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        tot AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
        isup AS (SELECT i, CAST(count(*) AS BIGINT) AS n_i
          FROM bi GROUP BY i),
        fi AS (SELECT i, n_i FROM isup, tot
          WHERE n_i * 1000000 >= n * $BasketItemSupPpm),
        pr AS (SELECT a.i AS ia, b.i AS ib, CAST(count(*) AS BIGINT)
              AS n_ab
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          JOIN fi fa ON fa.i = a.i JOIN fi fb ON fb.i = b.i
          GROUP BY 1, 2),
        fp AS (SELECT ia, ib, n_ab FROM pr, tot
          WHERE n_ab * 1000000 >= n * $BasketPairSupPpm),
        dir AS (SELECT ia AS antecedent, ib AS consequent, n_ab FROM fp
          UNION ALL SELECT ib, ia, n_ab FROM fp)
        SELECT d.antecedent, d.consequent, fa.n_i AS n_ante,
          fb.n_i AS n_cons, d.n_ab AS n_both, tot.n AS n_baskets,
          (1000000 * d.n_ab) // tot.n AS support_ppm,
          (1000000 * d.n_ab) // fa.n_i AS conf_ppm,
          CAST((1000000 * CAST(d.n_ab AS HUGEINT) * tot.n) //
            (CAST(fa.n_i AS HUGEINT) * fb.n_i) AS BIGINT) AS lift_ppm
        FROM dir d
        JOIN fi fa ON fa.i = d.antecedent
        JOIN fi fb ON fb.i = d.consequent, tot
        ORDER BY antecedent, consequent""")),

    // ------------------------------------------------------------------
    // q153 — k-core membership (GraphOps.kCore) on the q115/q118
    // co-purchase graph: iterated peeling (drop degree < k, recount,
    // repeat — removal CASCADES, which is exactly what a one-shot
    // degree filter gets wrong; at k = 68 the cascade needs 5 rounds
    // on the sf0.001 graph) isolating the dense region worth
    // clustering. Each round
    // moves only (node, count) longs + the shrinking edge list,
    // localCheckpointed; convergence is a 2-scalar probe; the operator
    // THROWS past KCorePeelRounds because the oracle unrolls exactly
    // that bound — peels after the fixpoint are no-ops, so converging
    // earlier is equivalence, not slack.
    // ------------------------------------------------------------------
    "q153_kcore" -> GraftQuery(
      build = (s, d) =>
        graft.operators.GraphOps
          .kCore(coPurchasePairs(s, d), "u", "v", KCoreK, KCorePeelRounds)
          .orderBy("node"),
      oracle = Some {
        // AS MATERIALIZED is load-bearing: e_r references e_{r-1} twice
        // (once through k_r, once directly), so DuckDB's default
        // inline-CTE expansion is a 2^rounds tree — 1024 lineitem scans
        // at 10 rounds ("Too many open files"); materialized, each peel
        // computes once, exactly like the Spark loop's localCheckpoint
        val peels = (1 to KCorePeelRounds).map { r =>
          s"""k$r AS MATERIALIZED (SELECT u FROM e${r - 1} GROUP BY u
              HAVING count(*) >= $KCoreK),
            e$r AS MATERIALIZED (SELECT a.u, a.v FROM e${r - 1} a
              JOIN k$r x ON a.u = x.u JOIN k$r y ON a.v = y.u)"""
        }.mkString(",\n        ")
        s"""
        WITH pairs AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        e0 AS MATERIALIZED (SELECT u, v FROM pairs
          UNION ALL SELECT v, u FROM pairs),
        $peels
        SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
        FROM e$KCorePeelRounds GROUP BY u ORDER BY node"""
      }),

    // ------------------------------------------------------------------
    // q155 — growth accounting (TemporalOps.growthAccounting): each
    // day's actives decomposed into new / retained / resurrected, plus
    // churned (active yesterday, silent today) and the quick ratio
    // (new+resurrected)/churned in floor ppm — the engagement
    // decomposition q109's cohort matrix and q149's DAU/WAU don't
    // give: WHY the active count moved. One user-keyed window serves
    // lag (classification) and lead (churn) off one sort; churn emits
    // at period+1 capped at the observed max (beyond the data's edge
    // churn is unknowable, not zero).
    // ------------------------------------------------------------------
    "q155_growth_accounting" -> GraftQuery(
      build = (s, d) => {
        val days = events(s, d).select(col("user_id"),
          expr(s"(ts div 1000) div $DayUs").as("day"))
        TemporalOps.growthAccounting(days, "user_id", "day")
          .orderBy("period")
      },
      oracle = Some(s"""
        WITH ud AS (SELECT DISTINCT user_id AS u,
            epoch_us(ts) // $DayUs AS p FROM events),
        m AS (SELECT u, p, lag(p) OVER w AS prev, lead(p) OVER w AS next
          FROM ud WINDOW w AS (PARTITION BY u ORDER BY p)),
        status AS (SELECT p, CASE WHEN prev IS NULL THEN 'new'
            WHEN prev = p - 1 THEN 'retained'
            ELSE 'resurrected' END AS kind FROM m),
        mx AS (SELECT max(p) AS max_p FROM ud),
        churn AS (SELECT p + 1 AS p, 'churned' AS kind FROM m, mx
          WHERE (next IS NULL OR next > p + 1) AND p + 1 <= max_p),
        allk AS (SELECT * FROM status UNION ALL SELECT * FROM churn),
        agg AS (SELECT p AS period,
            CAST(coalesce(sum(CASE WHEN kind = 'new' THEN 1 END), 0)
              AS BIGINT) AS n_new,
            CAST(coalesce(sum(CASE WHEN kind = 'retained' THEN 1 END), 0)
              AS BIGINT) AS n_retained,
            CAST(coalesce(sum(CASE WHEN kind = 'resurrected' THEN 1 END),
              0) AS BIGINT) AS n_resurrected,
            CAST(coalesce(sum(CASE WHEN kind = 'churned' THEN 1 END), 0)
              AS BIGINT) AS n_churned
          FROM allk GROUP BY p)
        SELECT period, n_new, n_retained, n_resurrected, n_churned,
          CASE WHEN n_churned > 0 THEN
            (1000000 * (n_new + n_resurrected)) // n_churned END
            AS quick_ratio_ppm
        FROM agg ORDER BY period""")),

    // ------------------------------------------------------------------
    // q156 — trimmed + winsorized means (StatsOps.trimmedStats): the
    // robust location estimates between raw mean and median — drop
    // (trim) or clamp (winsorize) beyond the [10, 90] discrete
    // percentile RANKS on a total (value, key) order; every statistic
    // is integer rank arithmetic + floor-divided means (q139/q99's
    // order-statistic discipline, no interpolated floats). One rank
    // window, bounds by rank-predicate aggregate broadcast back, one
    // final aggregate.
    // ------------------------------------------------------------------
    "q156_trimmed_stats" -> GraftQuery(
      build = (s, d) => {
        val v = orders(s, d).select(col("o_orderpriority").as("grp"),
          col("o_orderkey").as("tie"), cents(col("o_totalprice")).as("v"))
        StatsOps.trimmedStats(v, "grp", "v", "tie", TrimLoPct, TrimHiPct)
          .orderBy("grp")
      },
      oracle = Some(s"""
        WITH v AS (SELECT o_orderpriority AS grp, o_orderkey AS tie,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS val
          FROM orders),
        r AS (SELECT grp, val,
            row_number() OVER (PARTITION BY grp ORDER BY val, tie) AS rn,
            count(*) OVER (PARTITION BY grp) AS n FROM v),
        rr AS (SELECT *, (n * $TrimLoPct) // 100 AS r_lo,
            (n * $TrimHiPct) // 100 AS r_hi FROM r),
        b AS (SELECT grp,
            max(CASE WHEN rn = r_lo + 1 THEN val END) AS lo_v,
            max(CASE WHEN rn = r_hi THEN val END) AS hi_v
          FROM rr GROUP BY grp),
        j AS (SELECT rr.grp AS grp, val, rn, n, r_lo, r_hi, lo_v, hi_v
          FROM rr JOIN b ON rr.grp = b.grp)
        SELECT grp, CAST(max(n) AS BIGINT) AS n,
          CAST(coalesce(sum(CASE WHEN rn > r_lo AND rn <= r_hi
            THEN 1 END), 0) AS BIGINT) AS trimmed_n,
          max(lo_v) AS lo_v, max(hi_v) AS hi_v,
          CAST(sum(CASE WHEN rn > r_lo AND rn <= r_hi THEN val END) //
            coalesce(nullif(sum(CASE WHEN rn > r_lo AND rn <= r_hi
              THEN 1 END), 0), NULL) AS BIGINT) AS trimmed_mean,
          CAST(sum(greatest(least(val, hi_v), lo_v)) // max(n) AS BIGINT)
            AS winsorized_mean,
          CAST(sum(val) // max(n) AS BIGINT) AS raw_mean
        FROM j GROUP BY grp ORDER BY grp""")),

    // ------------------------------------------------------------------
    // q157 — day-of-week seasonal index (TemporalOps.seasonalIndex):
    // the multiplicative weekday factor (dow mean ÷ overall mean,
    // floor ppm; 10⁶ = flat) a calendar-adjusted forecast or anomaly
    // detector divides out — the quantifying leg beside q147's
    // backtest and q150's ACF. Weekday is pure epoch-day arithmetic
    // ((day+3) mod 7, 0 = Monday) — no calendar function, no
    // timezone/locale surface; the ratio-of-ratios evaluates exactly
    // on decimal128 over observed days only.
    // ------------------------------------------------------------------
    "q157_seasonal_index" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("day"))
          .agg(sum(cents(col("value"))).as("v"))
        TemporalOps.seasonalIndex(daily, "grp", "day", "v")
          .orderBy("grp", "dow")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS day,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
              AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        d2 AS (SELECT grp, ((day + 3) % 7 + 7) % 7 AS dow,
            CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(v) AS BIGINT) AS sum_v
          FROM daily GROUP BY 1, 2),
        t AS (SELECT grp, dow, n_days, sum_v,
            CAST(sum(n_days) OVER (PARTITION BY grp) AS BIGINT) AS n_all,
            CAST(sum(sum_v) OVER (PARTITION BY grp) AS BIGINT) AS sum_all
          FROM d2)
        SELECT grp, dow, n_days, sum_v,
          CASE WHEN sum_all <> 0 THEN
            CAST((CAST(sum_v AS HUGEINT) * n_all * 1000000) //
              (CAST(n_days AS HUGEINT) * sum_all) AS BIGINT) END
            AS index_ppm
        FROM t ORDER BY grp, dow""")),

    // ------------------------------------------------------------------
    // q158 — session entry/exit/bounce rates
    // (TemporalOps.sessionExitRates): each event type's ROLE in
    // day-gapped visits — sessions containing / entering on / exiting
    // on / bouncing on it, exit rate in floor ppm ("where do people
    // leave") — the flow readout beside q144 (which sequences occur)
    // and q122 (which transitions occur). One q20-style sessionization
    // window; first/last are rank predicates off the same sort; three
    // tiny per-type aggregates broadcast-join back.
    // ------------------------------------------------------------------
    "q158_session_exits" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_id"),
          col("event_type"))
        TemporalOps.sessionExitRates(ev, "user_id", "t_us", "event_id",
            "event_type", ExitSessionGapUs)
          .orderBy("etype")
      },
      oracle = Some(s"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id,
            event_type FROM events),
        s AS (SELECT user_id, t, event_id, event_type,
            CASE WHEN t - lag(t) OVER w > $ExitSessionGapUs
              OR lag(t) OVER w IS NULL THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
        s2 AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
            ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
          FROM s),
        f AS (SELECT *, row_number() OVER (PARTITION BY user_id, sid
              ORDER BY t, event_id) AS rn,
            count(*) OVER (PARTITION BY user_id, sid) AS n FROM s2),
        contain AS (SELECT event_type AS etype,
            CAST(count(*) AS BIGINT) AS n_contain
          FROM (SELECT DISTINCT user_id, sid, event_type FROM f)
          GROUP BY 1),
        ee AS (SELECT event_type AS etype,
            CAST(coalesce(sum(CASE WHEN rn = 1 THEN 1 END), 0) AS BIGINT)
              AS n_enter,
            CAST(coalesce(sum(CASE WHEN rn = n THEN 1 END), 0) AS BIGINT)
              AS n_exit,
            CAST(coalesce(sum(CASE WHEN n = 1 THEN 1 END), 0) AS BIGINT)
              AS n_bounce
          FROM f GROUP BY 1)
        SELECT c.etype AS etype, n_contain, n_enter, n_exit, n_bounce,
          (1000000 * n_exit) // n_contain AS exit_rate_ppm
        FROM contain c JOIN ee ON c.etype = ee.etype ORDER BY etype""")),

    // ------------------------------------------------------------------
    // q162 — greedy maximum coverage (CoverageOps.greedyMaxCoverage):
    // "which 3 brands cover the most distinct orders" — the submodular
    // facility-location greedy (1−1/e guarantee) a corpus assembler
    // runs before committing ingest budget to redundant sources. Each
    // step: one anti-join against covered elements + a |sets|-row
    // argmax; the oracle unrolls the same 3 steps as MATERIALIZED
    // argmax CTEs (the q153/q154 discipline on both sides).
    // ------------------------------------------------------------------
    "q162_greedy_coverage" -> GraftQuery(
      build = (s, d) => {
        val bi = lineitem(s, d)
          .join(part(s, d), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"), col("l_orderkey"))
        graft.operators.CoverageOps
          .greedyMaxCoverage(bi, "p_brand", "l_orderkey", CovK)
          .orderBy("step")
      },
      oracle = Some(s"""
        WITH bi AS MATERIALIZED (SELECT DISTINCT p_brand AS s,
            l_orderkey AS e
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        s1 AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT)
            AS marginal
          FROM bi GROUP BY s ORDER BY marginal DESC, s LIMIT 1),
        cov1 AS MATERIALIZED (SELECT DISTINCT e FROM bi
          JOIN s1 USING (s)),
        s2 AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT)
            AS marginal
          FROM bi WHERE s NOT IN (SELECT s FROM s1)
            AND e NOT IN (SELECT e FROM cov1)
          GROUP BY s ORDER BY marginal DESC, s LIMIT 1),
        cov2 AS MATERIALIZED (SELECT e FROM cov1
          UNION SELECT e FROM bi JOIN s2 USING (s)),
        s3 AS MATERIALIZED (SELECT s, CAST(count(*) AS BIGINT)
            AS marginal
          FROM bi WHERE s NOT IN (SELECT s FROM s1)
            AND s NOT IN (SELECT s FROM s2)
            AND e NOT IN (SELECT e FROM cov2)
          GROUP BY s ORDER BY marginal DESC, s LIMIT 1)
        SELECT CAST(1 AS BIGINT) AS step, s AS p_brand,
          marginal AS marginal_covered,
          (SELECT CAST(count(*) AS BIGINT) FROM cov1)
            AS cumulative_covered FROM s1
        UNION ALL SELECT 2, s, marginal,
          (SELECT count(*) FROM cov2) FROM s2
        UNION ALL SELECT 3, s, marginal,
          (SELECT count(*) FROM cov2) +
            (SELECT marginal FROM s3) FROM s3
        ORDER BY step""")),

    // ------------------------------------------------------------------
    // q163 — rolling exact median (TemporalOps.rollingMedian): the
    // robust centerline beside EWMA (q130) and rolling beta (q137) —
    // one wild day drags a rolling mean for the whole window but moves
    // the median one rank. LOWER median (rank ⌈n/2⌉ — an observed
    // value, never interpolated) over the trailing 7 daily buckets of
    // the PRE-AGGREGATED per-type series; the collect window holds ≤ 7
    // longs per row.
    // ------------------------------------------------------------------
    "q163_rolling_median" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("day"))
          .agg(sum(cents(col("value"))).as("v"))
        TemporalOps.rollingMedian(daily, "grp", "day", "v", RollMedWin)
          .orderBy("grp", "day")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS day,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
              AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        w AS (SELECT grp, day, v,
            list_sort(list(v) OVER (PARTITION BY grp ORDER BY day
              ROWS BETWEEN ${RollMedWin - 1} PRECEDING AND CURRENT ROW))
              AS win
          FROM daily)
        SELECT grp, day, v, CAST(len(win) AS BIGINT) AS n_win,
          win[(len(win) + 1) // 2] AS rolling_med
        FROM w ORDER BY grp, day""")),

    // ------------------------------------------------------------------
    // q164 — per-group feature scaling (StatsOps.featureScaling): the
    // min-max and quantile (CDF) transforms in exact floor ppm — what
    // a tabular model consumes instead of raw amounts. rank() (min
    // rank of ties) keeps the quantile transform monotone and
    // engine-order-independent; scaling uses FULL-group statistics
    // while only every 37th event's row materializes (the q96
    // bounded-output discipline — the filter provably cannot push
    // below the windows because it references a non-partition column).
    // ------------------------------------------------------------------
    "q164_feature_scaling" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("event_type").as("grp"),
          col("event_id"), cents(col("value")).as("v"))
        StatsOps.featureScaling(ev, "grp", "v", "event_id")
          .filter(col("event_id") % ScaleSliceMod === 0)
          .orderBy("grp", "event_id")
      },
      oracle = Some(s"""
        WITH v AS (SELECT event_type AS grp, event_id,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
          FROM events),
        t AS (SELECT grp, event_id, v,
            min(v) OVER g AS mn, max(v) OVER g AS mx,
            count(*) OVER g AS n,
            rank() OVER (PARTITION BY grp ORDER BY v) AS rk
          FROM v WINDOW g AS (PARTITION BY grp))
        SELECT grp, event_id, v,
          CASE WHEN mx <> mn
            THEN (1000000 * (v - mn)) // (mx - mn) END AS minmax_ppm,
          CASE WHEN n > 1
            THEN (1000000 * (rk - 1)) // (n - 1) END AS cdf_ppm
        FROM t WHERE event_id % $ScaleSliceMod = 0
        ORDER BY grp, event_id""")),

    // ------------------------------------------------------------------
    // q166 — leave-one-out target encoding (StatsOps.targetEncoding):
    // the category→number feature a GBM consumes WITHOUT label leakage
    // (plain category-mean encoding leaks each row's own label into
    // its feature — the classic silent overfit): per order, its
    // priority's mean total EXCLUDING itself, plus the m=10-pseudo-obs
    // smoothed variant shrinking rare categories toward the floored
    // global mean. Every mean is an exact pmod-floored integer — trees
    // split on exact thresholds, so a float encoding that varies by
    // summation order changes the model.
    // ------------------------------------------------------------------
    "q166_target_encoding" -> GraftQuery(
      build = (s, d) => {
        val v = orders(s, d).select(col("o_orderpriority").as("cat"),
          col("o_orderkey").as("okey"), cents(col("o_totalprice")).as("t"))
        StatsOps.targetEncoding(v, "cat", "t", "okey", TeSmoothing)
          .filter(col("okey") % TeSliceMod === 0)
          .orderBy("cat", "okey")
      },
      oracle = Some(s"""
        WITH v AS (SELECT o_orderpriority AS cat, o_orderkey AS okey,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS t
          FROM orders),
        g AS (SELECT CAST(sum(t) AS BIGINT) //
            CAST(count(*) AS BIGINT) AS g_mean FROM v),
        w AS (SELECT cat, okey, t,
            CAST(sum(t) OVER (PARTITION BY cat) AS BIGINT) AS c_sum,
            CAST(count(*) OVER (PARTITION BY cat) AS BIGINT) AS c_n
          FROM v)
        SELECT cat, okey, t,
          CASE WHEN c_n > 1
            THEN (c_sum - t) // (c_n - 1) END AS loo_mean,
          (c_sum - t + $TeSmoothing * g_mean) //
            (c_n - 1 + $TeSmoothing) AS smoothed_mean
        FROM w, g WHERE okey % $TeSliceMod = 0
        ORDER BY cat, okey""")),

    // ------------------------------------------------------------------
    // q167 — lead-lag cross-correlation (StatsOps.leadLagCorrelation):
    // does daily click VOLUME lead daily purchase REVENUE? Pearson
    // corr of {(x_t, y_{t+ℓ})} for ℓ ∈ [−3, 3] — the causality screen
    // between q150's self-correlation and any bivariate model; the
    // peak-|corr| lag is the lead time. Exact decimal128 co-moments on
    // the pre-aggregated daily frame; the ±3 pair streams come from a
    // 7-way lag explode + equi-join on day, holes dropping their pair
    // (no zero-fill hallucination).
    // ------------------------------------------------------------------
    "q167_lead_lag_xcorr" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(expr(s"(ts div 1000) div $DayUs").as("day"))
          .agg(
            coalesce(sum(when(col("event_type") === "click", 1L)), lit(0L))
              .as("x"),
            coalesce(sum(when(col("event_type") === "purchase",
              cents(col("value")))), lit(0L)).as("yc"))
          .select(col("day"), col("x"), expr("yc div 10000").as("y"))
        StatsOps.leadLagCorrelation(daily, "day", "x", "y", XcorrMaxLag)
          .orderBy("lag")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT epoch_us(ts) // $DayUs AS day,
            CAST(coalesce(sum(CASE WHEN event_type = 'click'
              THEN 1 END), 0) AS BIGINT) AS x,
            CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
              THEN CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              END), 0) AS BIGINT) // 10000 AS y
          FROM events GROUP BY 1),
        lags AS (SELECT CAST(range AS BIGINT) AS lag
          FROM range(-$XcorrMaxLag, ${XcorrMaxLag + 1})),
        pairs AS (SELECT l.lag AS lag, a.x AS x, b.y AS y
          FROM daily a CROSS JOIN lags l
          JOIN daily b ON b.day = a.day + l.lag),
        st AS (SELECT lag, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
            sum(CAST(x AS HUGEINT) * x) AS sxx,
            sum(CAST(x AS HUGEINT) * y) AS sxy,
            sum(CAST(y AS HUGEINT) * y) AS syy
          FROM pairs GROUP BY lag),
        dd AS (SELECT lag, n, n * sxy - sx * sy AS cov_num,
            n * sxx - sx * sx AS varx_num,
            n * syy - sy * sy AS vary_num
          FROM st)
        SELECT lag, CAST(n AS BIGINT) AS n,
          CASE WHEN varx_num > 0 AND vary_num > 0 THEN
            CAST(CASE WHEN cov_num < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (((1000000 * abs(cov_num)) // varx_num) * abs(cov_num))
                  // vary_num AS DOUBLE))) AS BIGINT) AS BIGINT)
            END AS xcorr_milli
        FROM dd ORDER BY lag""")),

    // ------------------------------------------------------------------
    // q168 — Neyman-allocation stratified sample (CorpusAssembly
    // .neymanStratifiedSample): for a fixed budget K, sampling each
    // stratum ∝ N_h·σ_h minimizes estimator variance (uniform
    // stratified sampling — q46/q74 — leaves that on the table).
    // N_h·σ_h IS the single sqrt of the exact decimal128 co-moment
    // n·Σx² − (Σx)² (no division); allocation integers via q135's
    // largest-remainder proration (shares sum EXACTLY to K); the draw
    // is q74's rank-by-md5 reservoir. The one float is a sqrt both
    // engines take on the identical correctly-rounded double.
    // ------------------------------------------------------------------
    "q168_neyman_sample" -> GraftQuery(
      build = (s, d) => {
        val v = orders(s, d).select(col("o_orderpriority").as("stratum"),
          col("o_orderkey"), cents(col("o_totalprice")).as("v"))
        graft.operators.CorpusAssembly
          .neymanStratifiedSample(v, "stratum", "o_orderkey", "v", NeymanK)
          .orderBy("stratum", "rk")
      },
      oracle = Some(s"""
        WITH v AS (SELECT o_orderpriority AS stratum, o_orderkey,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS v
          FROM orders),
        m AS (SELECT stratum, CAST(count(*) AS HUGEINT) AS n_h,
            sum(CAST(v AS HUGEINT)) AS sv,
            sum(CAST(v AS HUGEINT) * v) AS svv
          FROM v GROUP BY stratum),
        wts AS (SELECT stratum,
            greatest(CAST(floor(sqrt(
              CAST(n_h * svv - sv * sv AS DOUBLE))) AS BIGINT), 1)
              AS neyman_w
          FROM m),
        tot AS (SELECT CAST(sum(neyman_w) AS BIGINT) AS grp_w FROM wts),
        based AS (SELECT stratum, neyman_w, grp_w,
            ($NeymanK * neyman_w) // grp_w AS base,
            ($NeymanK * neyman_w) % grp_w AS rem
          FROM wts, tot),
        r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC,
              stratum) AS BIGINT) AS rn,
            CAST(sum(rem) OVER () AS BIGINT) AS rem_sum
          FROM based),
        alloc AS (SELECT stratum, neyman_w,
            base + CASE WHEN rn <= rem_sum // grp_w THEN 1 ELSE 0 END
              AS alloc
          FROM r),
        h AS (SELECT v.stratum AS stratum, o_orderkey, v,
            md5(CAST(o_orderkey AS VARCHAR)) AS hk, alloc, neyman_w
          FROM v JOIN alloc ON v.stratum = alloc.stratum),
        rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY stratum
            ORDER BY hk, o_orderkey) AS BIGINT) AS rk FROM h)
        SELECT stratum, o_orderkey, v, rk, alloc, neyman_w
        FROM rk WHERE rk <= alloc ORDER BY stratum, rk""")),

    // ------------------------------------------------------------------
    // q169 — Q-Q decile comparison (StatsOps.qqCompare): where in the
    // distribution do click and purchase amounts diverge — the
    // quantile-level view of distribution shift that q104's single χ²
    // number can't localize (a tail-only gap and a uniform shift look
    // identical to a summary statistic). Exact order statistics at
    // each decile on a total (value, id) order; one rank window + a
    // 9-row conditional-aggregate pivot.
    // ------------------------------------------------------------------
    "q169_qq_deciles" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("event_type").as("grp"),
          col("event_id"), cents(col("value")).as("v"))
        StatsOps.qqCompare(ev, "grp", "v", "event_id", "click",
            "purchase", QqTiles)
          .orderBy("q")
      },
      oracle = Some(s"""
        WITH two AS (SELECT event_type AS grp, event_id,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS v
          FROM events WHERE event_type IN ('click', 'purchase')),
        ranked AS (SELECT grp, v,
            CAST(row_number() OVER (PARTITION BY grp ORDER BY v,
              event_id) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
          FROM two),
        q AS (SELECT CAST(range AS BIGINT) AS q
          FROM range(1, $QqTiles)),
        picks AS (SELECT q.q AS q, grp, min(v) AS v
          FROM ranked CROSS JOIN q
          WHERE rn * $QqTiles >= n * q.q
            AND (rn - 1) * $QqTiles < n * q.q
          GROUP BY 1, 2)
        SELECT q,
          max(CASE WHEN grp = 'click' THEN v END) AS q_a,
          max(CASE WHEN grp = 'purchase' THEN v END) AS q_b,
          max(CASE WHEN grp = 'click' THEN v END) -
            max(CASE WHEN grp = 'purchase' THEN v END) AS gap,
          CASE WHEN max(CASE WHEN grp = 'purchase' THEN v END) > 0
            THEN (1000000 * max(CASE WHEN grp = 'click' THEN v END)) //
              max(CASE WHEN grp = 'purchase' THEN v END) END AS ratio_ppm
        FROM picks GROUP BY q ORDER BY q""")),

    // ------------------------------------------------------------------
    // q170 — funnel stage-latency percentiles (TemporalOps
    // .funnelStageLatency): HOW LONG each signup→click→purchase hop
    // takes (q140 counts who converts; this times the hops — a funnel
    // can convert well and still take a week at one stage). Delays
    // from the same greedy-earliest anchors as q140; p25/50/75 as
    // discrete order statistics on a total (delay, user) order;
    // non-transitions are absent, not zero.
    // ------------------------------------------------------------------
    "q170_funnel_latency" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("user_id"),
          expr("ts div 1000").as("t_us"), col("event_type"))
        TemporalOps.funnelStageLatency(ev, "user_id", "t_us",
            "event_type", Seq("signup", "click", "purchase"), FunnelGapUs)
          .orderBy("transition")
      },
      oracle = Some(s"""
        WITH ev AS (SELECT user_id, epoch_us(ts) AS t_us, event_type
          FROM events),
        s1 AS (SELECT user_id, min(t_us) AS t_1 FROM ev
          WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (SELECT e.user_id AS user_id, min(p.t_1) AS t_1,
            min(e.t_us) AS t_2
          FROM ev e JOIN s1 p ON e.user_id = p.user_id
            AND e.event_type = 'click' AND e.t_us > p.t_1
            AND e.t_us <= p.t_1 + $FunnelGapUs
          GROUP BY 1),
        s3 AS (SELECT e.user_id AS user_id, min(p.t_2) AS t_2,
            min(e.t_us) AS t_3
          FROM ev e JOIN s2 p ON e.user_id = p.user_id
            AND e.event_type = 'purchase' AND e.t_us > p.t_2
            AND e.t_us <= p.t_2 + $FunnelGapUs
          GROUP BY 1),
        delays AS (
          SELECT CAST(1 AS BIGINT) AS transition, user_id AS k,
            t_2 - t_1 AS delay FROM s2
          UNION ALL SELECT 2, user_id, t_3 - t_2 FROM s3),
        ranked AS (SELECT transition, delay,
            CAST(row_number() OVER (PARTITION BY transition
              ORDER BY delay, k) AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY transition) AS BIGINT) AS n
          FROM delays)
        SELECT transition, max(n) AS n_transitions,
          max(CASE WHEN rn * 100 >= n * 25 AND (rn - 1) * 100 < n * 25
            THEN delay END) AS p25_us,
          max(CASE WHEN rn * 100 >= n * 50 AND (rn - 1) * 100 < n * 50
            THEN delay END) AS p50_us,
          max(CASE WHEN rn * 100 >= n * 75 AND (rn - 1) * 100 < n * 75
            THEN delay END) AS p75_us,
          max(delay) AS max_us
        FROM ranked GROUP BY transition ORDER BY transition""")),

    // ------------------------------------------------------------------
    // q171 — ABC/XYZ classification (StatsOps.abcXyz): the assortment
    // segmentation — ABC by cumulative revenue share (A = the head
    // earning the first 80%), XYZ by exact demand variability
    // cv² = (n·Σv² − (Σv)²)/(Σv)² in floor ppm; the AZ cross
    // (high-revenue, unforecastable) is the segment naive per-revenue
    // planning mishandles. Facts reduce to (part, 30-day bucket, Σ)
    // first; the cumulative-revenue cumsum is fully DISTRIBUTED via
    // StatsOps.bucketPrefixOffsets (r10: the q128 bucket-prefix
    // machinery wired under the classifier — per-bucket windows plus
    // triangular broadcast offsets, no single-partition window
    // anywhere; pinned in PlanAuditSpec).
    // ------------------------------------------------------------------
    "q171_abc_xyz" -> GraftQuery(
      build = (s, d) => {
        // r17 OPTIMIZATION (guide §2.5): the decimal partial aggregate
        // over 600 k rows ran at the 3-split scan count; spread first.
        val buckets = graft.operators.ScanOps.spreadSmallInput(
            lineitem(s, d).select(col("l_partkey"), col("l_shipdate"),
              col("l_extendedprice")), col("l_partkey"))
          .groupBy(col("l_partkey"),
            TemporalOps.floorDiv(datediff(col("l_shipdate").cast("date"),
              lit(EpochDay0).cast("date")).cast("long"), lit(30L))
              .as("m"))
          .agg(sum(cents(col("l_extendedprice"))).as("v"))
        StatsOps.abcXyz(buckets, "l_partkey", "v", AbcAPpm, AbcBPpm,
            XyzXPpm, XyzYPpm)
          .orderBy("l_partkey")
      },
      oracle = Some(s"""
        WITH b AS (SELECT l_partkey,
            date_diff('day', DATE '$EpochDay0',
              CAST(l_shipdate AS DATE)) // 30 AS m,
            CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) AS v
          FROM lineitem GROUP BY 1, 2),
        per AS (SELECT l_partkey, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(v AS HUGEINT)) AS sv,
            sum(CAST(v AS HUGEINT) * v) AS svv
          FROM b GROUP BY 1),
        tot AS (SELECT sum(sv) AS tot FROM per),
        c AS (SELECT l_partkey, sv, n, svv, tot,
            sum(sv) OVER (ORDER BY sv DESC, l_partkey
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM per, tot),
        o AS (SELECT l_partkey, CAST(sv AS BIGINT) AS revenue,
            CAST((cum * 1000000) // tot AS BIGINT) AS cum_ppm,
            CASE WHEN sv > 0 THEN CAST(((n * svv - sv * sv) * 1000000) //
              (sv * sv) AS BIGINT) END AS cv2_ppm
          FROM c)
        SELECT l_partkey, revenue, cum_ppm, cv2_ppm,
          CASE WHEN cum_ppm <= $AbcAPpm THEN 'A'
            WHEN cum_ppm <= $AbcBPpm THEN 'B' ELSE 'C' END AS abc,
          CASE WHEN cv2_ppm IS NULL THEN 'Z'
            WHEN cv2_ppm <= $XyzXPpm THEN 'X'
            WHEN cv2_ppm <= $XyzYPpm THEN 'Y' ELSE 'Z' END AS xyz
        FROM o ORDER BY l_partkey""")),

    // ------------------------------------------------------------------
    // q172 — deseasonalized anomaly flags: the q147/q150/q157
    // forecasting trio IN USE — the fixture amplifies daily revenue by
    // a ×(10+dow)/10 weekday pattern AND injects ×3 spikes on every
    // 11th epoch day; dividing out q157's seasonal index must ABSORB
    // the weekday swing (a raw z-test would flag high-dow days) while
    // the spikes survive to trip q78's cross-multiplied integer
    // z-criterion on the ADJUSTED series. One dow aggregate + tiny
    // windows + one broadcast stats join — facts reduce to
    // |types|·|days| immediately.
    // ------------------------------------------------------------------
    "q172_deseasonalized_anomalies" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("day"))
          .agg(sum(cents(col("value"))).as("base"))
          .withColumn("v_amp",
            expr(s"""(base * (10 + (day + 3) % 7) div 10) *
              (CASE WHEN day % $DeseasSpikeMod = 0
                THEN $DeseasSpikeFactor ELSE 1 END)"""))
        val idx = TemporalOps.seasonalIndex(daily, "grp", "day", "v_amp")
          .select(col("grp").as("ig"), col("dow").as("idow"),
            col("index_ppm"))
        val adj = daily
          .join(broadcast(idx),
            col("grp") === col("ig") &&
              pmod(col("day") + 3, lit(7)) === col("idow"))
          .select(col("grp"), col("day"), col("v_amp"),
            expr("(v_amp * 1000000L) div index_ppm").as("adj"))
        StatsOps.zscoreFlags(adj, "grp", "adj", DeseasZk)
          .orderBy("grp", "day")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS day,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT))
              AS BIGINT) AS base
          FROM events GROUP BY 1, 2),
        amp AS (SELECT grp, day, base,
            (base * (10 + (day + 3) % 7) // 10) *
              (CASE WHEN day % $DeseasSpikeMod = 0
                THEN $DeseasSpikeFactor ELSE 1 END) AS v_amp
          FROM daily),
        d2 AS (SELECT grp, ((day + 3) % 7 + 7) % 7 AS dow,
            CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(v_amp) AS BIGINT) AS sum_v
          FROM amp GROUP BY 1, 2),
        idx AS (SELECT grp, dow,
            CAST((CAST(sum_v AS HUGEINT) *
              CAST(sum(n_days) OVER (PARTITION BY grp) AS BIGINT) *
              1000000) //
              (CAST(n_days AS HUGEINT) *
               CAST(sum(sum_v) OVER (PARTITION BY grp) AS BIGINT))
              AS BIGINT) AS index_ppm
          FROM d2),
        adj AS (SELECT a.grp AS grp, day, v_amp,
            (v_amp * 1000000) // index_ppm AS adj
          FROM amp a JOIN idx i
            ON a.grp = i.grp AND ((a.day + 3) % 7 + 7) % 7 = i.dow),
        st AS (SELECT grp, CAST(count(*) AS HUGEINT) AS zn,
            sum(CAST(adj AS HUGEINT)) AS zs,
            sum(CAST(adj AS HUGEINT) * adj) AS zss
          FROM adj GROUP BY grp)
        SELECT a.grp AS grp, day, v_amp, adj,
          (zn * adj - zs) * (zn * adj - zs) >
            ${DeseasZk.toLong * DeseasZk} * (zn * zss - zs * zs)
            AS is_outlier
        FROM adj a JOIN st ON a.grp = st.grp
        ORDER BY grp, day""")),

    // ------------------------------------------------------------------
    // q173 — CUPED experiment readout (StatsOps.cupedAdjust): the
    // variance-reduction standard that makes A/B tests decide faster —
    // y_adj = y − θ(x − x̄) with θ from the POOLED pre/post regression
    // (per-arm θ would leak treatment into the adjustment). Units are
    // users; x = pre-cut spend, y = post-cut spend (per-user activity
    // level correlates them, which is exactly what CUPED exploits);
    // arms = user_id parity. θ in pmod-floored milli-units, adjusted
    // values exact longs, and the var_ratio_ppm column IS the
    // justification readout (10⁶ = no help).
    // ------------------------------------------------------------------
    "q173_cuped" -> GraftQuery(
      build = (s, d) => {
        val units = events(s, d)
          .groupBy(col("user_id"))
          .agg(
            coalesce(sum(when(expr(s"ts div 1000 < $ExpCutUs"),
              cents(col("value")))), lit(0L)).as("x"),
            coalesce(sum(when(expr(s"ts div 1000 >= $ExpCutUs"),
              cents(col("value")))), lit(0L)).as("y"))
          .withColumn("arm", (col("user_id") % 2).cast("long"))
        StatsOps.cupedAdjust(units, "arm", "x", "y")
          .orderBy("arm")
      },
      oracle = Some(s"""
        WITH units AS (SELECT user_id,
            CAST(coalesce(sum(CASE WHEN epoch_us(ts) < $ExpCutUs
              THEN CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              END), 0) AS BIGINT) AS x,
            CAST(coalesce(sum(CASE WHEN epoch_us(ts) >= $ExpCutUs
              THEN CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              END), 0) AS BIGINT) AS y,
            user_id % 2 AS arm
          FROM events GROUP BY user_id),
        pooled AS (SELECT CAST(count(*) AS HUGEINT) AS pn,
            sum(CAST(x AS HUGEINT)) AS psx, sum(CAST(y AS HUGEINT)) AS psy,
            sum(CAST(x AS HUGEINT) * x) AS psxx,
            sum(CAST(x AS HUGEINT) * y) AS psxy
          FROM units),
        th AS (SELECT
            CASE WHEN pn * psxx - psx * psx <> 0 THEN
              CAST((1000 * (pn * psxy - psx * psy) -
                ((1000 * (pn * psxy - psx * psy) %
                  (pn * psxx - psx * psx) + (pn * psxx - psx * psx)) %
                 (pn * psxx - psx * psx))) //
                (pn * psxx - psx * psx) AS BIGINT)
              ELSE 0 END AS theta_milli,
            CAST(psx // pn AS BIGINT) AS x_bar
          FROM pooled),
        a AS (SELECT arm, x, y,
            1000 * y - theta_milli * (x - x_bar) AS y_adj,
            theta_milli
          FROM units, th),
        g AS (SELECT arm, CAST(count(*) AS HUGEINT) AS n,
            max(theta_milli) AS theta_milli,
            sum(CAST(y AS HUGEINT)) AS sum_y,
            sum(CAST(1000 * y AS HUGEINT) * (1000 * y)) AS syy_m,
            sum(CAST(y_adj AS HUGEINT)) AS sum_adj,
            sum(CAST(y_adj AS HUGEINT) * y_adj) AS saa
          FROM a GROUP BY arm)
        SELECT CAST(arm AS BIGINT) AS arm, CAST(n AS BIGINT) AS n,
          theta_milli,
          CAST(sum_y // n AS BIGINT) AS raw_mean,
          CAST((sum_adj - ((sum_adj % n + n) % n)) // n AS BIGINT)
            AS adj_mean_milli,
          CASE WHEN n * syy_m - (1000 * sum_y) * (1000 * sum_y) <> 0
            THEN CAST(((n * saa - sum_adj * sum_adj) * 1000000) //
              (n * syy_m - (1000 * sum_y) * (1000 * sum_y)) AS BIGINT)
            END AS var_ratio_ppm
        FROM g ORDER BY arm""")),

    // ------------------------------------------------------------------
    // q174 — cumulative gains / lift table (StatsOps.cumulativeGains):
    // "contact the top k% by score, capture what share of converters?"
    // — the model-eval readout for any targeting score. The synthetic
    // users have NO natural predictor (activity is generator-uniform,
    // corr ≈ 0.02 measured — any real covariate gives the flat-1e6
    // null table), so the score is a SIMULATED model of known skill:
    // 10× the outcome count plus deterministic id-noise — the chart
    // must recover the skill as top-decile lift ≫ 10⁶ decaying to 10⁶.
    // Conversion = ≥ 9 post-cut purchases (~28% base rate). Exact
    // cross-multiplied capture/lift ratios on decimal128; the ntile
    // assignment over the total (score desc, user) order is computed
    // DISTRIBUTED (r10): bucket-prefix exact global ranks + the
    // closed-form ntile arithmetic — no single-partition window
    // anywhere (pinned in PlanAuditSpec).
    // ------------------------------------------------------------------
    "q174_cumulative_gains" -> GraftQuery(
      build = (s, d) => {
        val units = events(s, d)
          .groupBy(col("user_id"))
          .agg(coalesce(sum(when(expr(s"ts div 1000 >= $ExpCutUs") &&
            col("event_type") === "purchase", 1L)), lit(0L)).as("pp"))
          .select(col("user_id"),
            (col("pp") * 10 + col("user_id") % GainsNoiseMod).as("score"),
            (col("pp") >= GainsConvMin).as("converted"))
        StatsOps.cumulativeGains(units, "user_id", "score", "converted",
            GainsTiles)
          .orderBy("tile")
      },
      oracle = Some(s"""
        WITH pp AS (SELECT user_id,
            CAST(coalesce(sum(CASE WHEN epoch_us(ts) >= $ExpCutUs
              AND event_type = 'purchase' THEN 1 END), 0) AS BIGINT)
              AS pp
          FROM events GROUP BY user_id),
        units AS (SELECT user_id,
            pp * 10 + user_id % $GainsNoiseMod AS score,
            pp >= $GainsConvMin AS converted
          FROM pp),
        tiled AS (SELECT ntile($GainsTiles) OVER (ORDER BY score DESC,
              user_id) AS tile, converted
          FROM units),
        g AS (SELECT CAST(tile AS BIGINT) AS tile,
            CAST(count(*) AS BIGINT) AS n_units,
            CAST(coalesce(sum(CASE WHEN converted THEN 1 END), 0)
              AS BIGINT) AS n_conv
          FROM tiled GROUP BY tile),
        t AS (SELECT CAST(sum(n_units) AS BIGINT) AS t_units,
            CAST(sum(n_conv) AS BIGINT) AS t_conv FROM g),
        c AS (SELECT tile, n_units, n_conv,
            CAST(sum(n_units) OVER (ORDER BY tile
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_units,
            CAST(sum(n_conv) OVER (ORDER BY tile
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_conv
          FROM g)
        SELECT tile, n_units, n_conv, cum_units, cum_conv,
          CASE WHEN t_conv > 0
            THEN (1000000 * cum_conv) // t_conv END AS capture_ppm,
          CASE WHEN t_conv > 0 AND cum_units > 0
            THEN CAST((CAST(cum_conv AS HUGEINT) * t_units * 1000000) //
              (CAST(cum_units AS HUGEINT) * t_conv) AS BIGINT)
            END AS lift_ppm
        FROM c, t ORDER BY tile""")),

    // ------------------------------------------------------------------
    // q175 — per-source total-variation drift (StatsOps.tvDistance):
    // "which source's length profile drifted from the corpus" — TV is
    // the worst-case probability mass any event can differ by, the
    // mixing-dashboard complement to q104's χ² (which weights squared
    // deviations by expectation). Exact common-denominator form
    // Σ|n_si·N − n_i·N_s|·10⁶ div (2·N_s·N) on decimal128; absent
    // buckets still contribute their full marginal mass (dropping
    // them understates TV).
    // ------------------------------------------------------------------
    "q175_source_drift_tv" -> GraftQuery(
      build = (s, d) =>
        StatsOps.tvDistance(documents(s, d), "source",
          expr(s"n_chars div $TvBucketChars"))
          .withColumnRenamed("g", "source")
          .orderBy("source"),
      oracle = Some(s"""
        WITH cells AS (SELECT source AS g, n_chars // $TvBucketChars AS b,
            CAST(count(*) AS BIGINT) AS n_gb
          FROM documents GROUP BY 1, 2),
        gt AS (SELECT g, CAST(sum(n_gb) AS BIGINT) AS n_g
          FROM cells GROUP BY g),
        bt AS (SELECT b, CAST(sum(n_gb) AS BIGINT) AS n_b
          FROM cells GROUP BY b),
        nt AS (SELECT CAST(sum(n_gb) AS BIGINT) AS n FROM cells),
        grid AS (SELECT gt.g AS g, bt.b AS b, gt.n_g AS n_g, bt.n_b
              AS n_b, coalesce(c.n_gb, 0) AS n_gb
          FROM gt CROSS JOIN bt
          LEFT JOIN cells c ON c.g = gt.g AND c.b = bt.b)
        SELECT g AS source, max(n_g) AS n_rows,
          CAST((sum(abs(CAST(n_gb AS HUGEINT) * n -
              CAST(n_b AS HUGEINT) * n_g)) * 1000000) //
            (2 * CAST(max(n_g) AS HUGEINT) * max(n)) AS BIGINT)
            AS tv_ppm
        FROM grid, nt GROUP BY g ORDER BY source""")),

    // ------------------------------------------------------------------
    // q178 — peak-rate / burst detection (TemporalOps.peakRate): the
    // most events each type ever fired in ANY sliding 1-hour span, and
    // when — the rate-limit-sizing readout a tumbling bucket count
    // (q31) UNDERSTATES because a burst straddling a boundary splits
    // in two; the event-anchored RANGE frame sees it whole. Tied-t
    // peers share their frame count in both engines, and the projected
    // (key, peak, t) row is value-identical across tied argmax picks,
    // so no tie column is even needed.
    // ------------------------------------------------------------------
    "q178_burst_detection" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d).select(col("event_type").as("grp"),
          expr("ts div 1000").as("t_us"))
        TemporalOps.peakRate(ev, "grp", "t_us", BurstWindowUs)
          .orderBy("grp")
      },
      oracle = Some(s"""
        WITH e AS (SELECT event_type AS grp, epoch_us(ts) AS t_us
          FROM events),
        c AS (SELECT grp, t_us,
            CAST(count(*) OVER (PARTITION BY grp ORDER BY t_us
              RANGE BETWEEN CURRENT ROW AND $BurstWindowUs FOLLOWING)
              AS BIGINT) AS win_count
          FROM e),
        r AS (SELECT grp, t_us, win_count,
            row_number() OVER (PARTITION BY grp
              ORDER BY win_count DESC, t_us) AS rn
          FROM c)
        SELECT grp, win_count AS peak_count, t_us AS peak_t
        FROM r WHERE rn = 1 ORDER BY grp""")),

    // ------------------------------------------------------------------
    // q179 — approximate FD discovery (QualityAudit.fdDiscovery): rank
    // every ordered column pair by its g3 violation rate — the
    // profiling step that finds near-keys and derivable columns a
    // schema never wrote down (q121's FD check VERIFIES a given
    // dependency; this DISCOVERS them). The derived urgency band makes
    // priority→urgency hold EXACTLY (violation 0) while its converse
    // and every pairing with status/key-band is genuinely violated —
    // the ranked table separates design from dirt.
    // ------------------------------------------------------------------
    "q179_fd_discovery" -> GraftQuery(
      build = (s, d) => {
        val o = orders(s, d).select(
          col("o_orderpriority").as("priority"),
          when(substring(col("o_orderpriority"), 1, 1) <= "2", "high")
            .otherwise("low").as("urgency"),
          col("o_orderstatus").as("status"),
          (col("o_custkey") % 100).as("key_band"))
        graft.operators.QualityAudit
          .fdDiscovery(o, Seq("priority", "urgency", "status", "key_band"))
          .orderBy("determinant", "dependent")
      },
      oracle = Some {
        val cols = Seq("priority", "urgency", "status", "key_band")
        val pairSql = (for { a <- cols; b <- cols if a != b } yield
          s"""SELECT '$a' AS determinant, '$b' AS dependent,
              CAST(count(*) AS BIGINT) AS n_groups,
              CAST(sum(n_a) AS BIGINT) AS n,
              CAST(sum(mx) AS BIGINT) AS keep
            FROM (SELECT __a, CAST(sum(n_ab) AS BIGINT) AS n_a,
                CAST(max(n_ab) AS BIGINT) AS mx
              FROM (SELECT $a AS __a, $b AS __b,
                  CAST(count(*) AS BIGINT) AS n_ab
                FROM base GROUP BY 1, 2) GROUP BY __a)""")
          .mkString("\n          UNION ALL ")
        s"""
        WITH base AS (SELECT o_orderpriority AS priority,
            CASE WHEN substr(o_orderpriority, 1, 1) <= '2'
              THEN 'high' ELSE 'low' END AS urgency,
            o_orderstatus AS status, o_custkey % 100 AS key_band
          FROM orders),
        p AS ($pairSql)
        SELECT determinant, dependent, n_groups,
          (1000000 * (n - keep)) // n AS violation_ppm,
          (1000000 * (n - keep)) // n = 0 AS holds_exactly
        FROM p ORDER BY determinant, dependent"""
      }),

    // ------------------------------------------------------------------
    // q180 — weighted sampling WITHOUT replacement (CorpusAssembly
    // .weightedSampleNoReplacement): Efraimidis–Spirakis A-ES, the
    // sampling mode the assembly stack lacked (q89 is per-row rates,
    // q74/q168 draw uniformly within strata): k customers per market
    // segment with inclusion odds ∝ positive account balance. The key
    // −log2(u)/w is computed on a DEFINED integer lattice — u from the
    // q74 md5 hash, log2 in Q20 fixed point via the native Log2Q20
    // expression's 31-bit shift-square algorithm, ratio in Q36 — so
    // BOTH engines produce the identical sample, not just the same
    // sample SIZE (the oracle replays the lattice with a 20-step
    // recursive CTE on plain BIGINTs). Negative/zero balances dropped
    // (no inclusion probability); WindowGroupLimit prunes to k per
    // segment map-side.
    // ------------------------------------------------------------------
    "q180_aes_weighted_sample" -> GraftQuery(
      build = (s, d) => {
        val base = customer(s, d).select(
          col("c_mktsegment").as("stratum"), col("c_custkey"),
          cents(col("c_acctbal")).as("w"))
        graft.operators.CorpusAssembly.weightedSampleNoReplacement(
            base, "stratum", "c_custkey", "w", AesK)
          .orderBy("stratum", "rk")
      },
      oracle = Some(s"""
        WITH RECURSIVE base AS (SELECT c_mktsegment AS stratum, c_custkey,
            CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) AS w
          FROM customer),
        pos AS (SELECT * FROM base WHERE w > 0),
        h AS (SELECT stratum, c_custkey, w,
            CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) + 1 AS m
          FROM pos),
        n0 AS (SELECT stratum, c_custkey, w, m,
            length(bin(m)) - 1 AS hb FROM h),
        mant AS (SELECT stratum, c_custkey, w, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM n0),
        lg AS (
          SELECT stratum, c_custkey, w, hb, x, 0 AS i,
            CAST(0 AS BIGINT) AS frac
          FROM mant
          UNION ALL
          SELECT stratum, c_custkey, w, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            i + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lg WHERE i < 20),
        keyed AS (SELECT stratum, c_custkey, w,
            CAST((((60 << 20) - ((hb << 20) + frac)) << 36) // w
              AS BIGINT) AS aes_key
          FROM lg WHERE i = 20),
        r AS (SELECT stratum, c_custkey, w, aes_key,
            CAST(row_number() OVER (PARTITION BY stratum
              ORDER BY aes_key, c_custkey) AS BIGINT) AS rk
          FROM keyed)
        SELECT stratum, rk, c_custkey, w, aes_key
        FROM r WHERE rk <= $AesK ORDER BY stratum, rk""")),

    // recursive-CTE note for q180: `lg` is LINEAR recursion (the
    // recursive term references lg once), so no MATERIALIZED guard is
    // needed — each of the 20 steps runs once per row, exactly like the
    // native expression's loop.

    // ------------------------------------------------------------------
    // q183 — Cohen's κ inter-annotator agreement (StatsOps.cohenKappa):
    // the label-quality gate for annotated training data — raw
    // agreement overstates quality under label skew (two raters
    // stamping the majority class agree by luck); κ subtracts the exact
    // chance floor p_e = Σ r_k·c_k / n². Fixture: annotator A bands
    // event value into $100 buckets; B misfiles every 7th event one
    // band up and ABSTAINS (null label — a real category, null-safe end
    // to end) on every 13th. Exact integer κ in floor ppm (κ can be
    // negative → total floorDiv + oracle pmod identity); one
    // confusion-matrix aggregate is the only pass over facts.
    // ------------------------------------------------------------------
    "q183_cohen_kappa" -> GraftQuery(
      build = (s, d) => {
        val lab = events(s, d).select(col("event_type").as("grp"),
            col("event_id"),
            least(TemporalOps.floorDiv(cents(col("value")),
              lit(KappaBandCents)), lit(KappaMaxBand)).as("a"))
          .withColumn("b",
            when(col("event_id") % 13 === 0, lit(null).cast("long"))
              .when(col("event_id") % 7 === 0,
                least(col("a") + 1L, lit(KappaMaxBand)))
              .otherwise(col("a")))
        StatsOps.cohenKappa(lab, "grp", "a", "b")
          .orderBy("g")
      },
      oracle = Some(s"""
        WITH lab AS (SELECT event_type AS g, event_id,
            least(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // $KappaBandCents, $KappaMaxBand) AS a
          FROM events),
        l2 AS (SELECT g, event_id, a,
            CASE WHEN event_id % 13 = 0 THEN NULL
              WHEN event_id % 7 = 0 THEN least(a + 1, $KappaMaxBand)
              ELSE a END AS b
          FROM lab),
        cells AS (SELECT g, a, b, CAST(count(*) AS BIGINT) AS n_ab
          FROM l2 GROUP BY 1, 2, 3),
        tot AS (SELECT g, CAST(sum(n_ab) AS BIGINT) AS n,
            CAST(coalesce(sum(CASE WHEN a IS NOT DISTINCT FROM b
              THEN n_ab END), 0) AS BIGINT) AS agree
          FROM cells GROUP BY g),
        ra AS (SELECT g, a AS k, CAST(sum(n_ab) AS BIGINT) AS r_k
          FROM cells GROUP BY 1, 2),
        cb AS (SELECT g, b AS k, CAST(sum(n_ab) AS BIGINT) AS c_k
          FROM cells GROUP BY 1, 2),
        pe AS (SELECT ra.g AS g,
            sum(CAST(r_k AS HUGEINT) * c_k) AS pe
          FROM ra JOIN cb ON ra.g = cb.g
            AND ra.k IS NOT DISTINCT FROM cb.k
          GROUP BY 1),
        j AS (SELECT t.g AS g, n, agree,
            coalesce(pe, 0) AS pe,
            (CAST(n AS HUGEINT) * agree - coalesce(pe, 0)) * 1000000
              AS num,
            CAST(n AS HUGEINT) * n - coalesce(pe, 0) AS den
          FROM tot t LEFT JOIN pe ON t.g = pe.g)
        SELECT g, n, agree,
          CASE WHEN den <> 0 THEN
            CAST((num - ((num % den + den) % den)) // den AS BIGINT)
            END AS kappa_ppm
        FROM j ORDER BY g""")),

    // ------------------------------------------------------------------
    // q184 — group-aware train/val/test split (CorpusAssembly
    // .groupSplit): row-random splitting LEAKS whenever rows share an
    // entity (q112's audit finds exactly this), so the split key is the
    // GROUP — every event inherits its user's deterministic md5 band
    // and no user can span splits BY CONSTRUCTION (shuffle-free
    // per-row hash; holds at any scale/partitioning/rerun). Readout:
    // per-split row and user counts — the 80/10/10 ppm fractions land
    // within hash tolerance; the spec asserts zero cross-split users.
    // ------------------------------------------------------------------
    "q184_group_split" -> GraftQuery(
      build = (s, d) => {
        graft.operators.CorpusAssembly
          .groupSplit(events(s, d).select(col("user_id"), col("event_id")),
            "user_id", SplitPpm)
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("split")
      },
      oracle = Some(s"""
        WITH b AS (SELECT user_id, event_id,
            CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000000 AS band
          FROM events),
        a AS (SELECT user_id, event_id,
            CASE WHEN band < 800000 THEN 'train'
              WHEN band < 900000 THEN 'val' ELSE 'test' END AS split
          FROM b)
        SELECT split, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM a GROUP BY split ORDER BY split""")),

    // ------------------------------------------------------------------
    // q195 — Mann–Whitney U rank-sum test (StatsOps.mannWhitneyU): the
    // nonparametric "did this cohort's distribution shift" readout —
    // order totals of URGENT vs LOW priority per order status, on
    // hundred-dollar bins (the tie correction is what makes a rank
    // test on binned data valid). The synthetic priorities carry no
    // natural price signal (the q174 lesson), so the fixture INJECTS a
    // +$60,000 urgent markup outside status 'O' — sized by a DuckDB
    // probe (totalprice ~ uniform(1k, 500k); for two same-range
    // uniforms offset by d, P(A>B)−½ ≈ d/R − d²/2R² ≈ 0.117 ⇒ z ≈
    // +29): the two shifted cells flag far outside any rejection band
    // (measured z ≈ +25.9/+29.3 at sf0.1) while the untouched 'O'
    // cell stays near the null (−0.26) — the test demonstrably
    // discriminates, not just hash-matches.
    // Only (cell, bin) count rows ever shuffle; z is the defined
    // integer lattice, hash-gated.
    // ------------------------------------------------------------------
    "q195_mann_whitney_u" -> GraftQuery(
      build = (s, d) => {
        val priced = orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .withColumn("bin",
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 " +
              "as bigint) div 1000000") +
              when(col("o_orderstatus") =!= "O" &&
                col("o_orderpriority") === "1-URGENT", 600L)
                .otherwise(0L))
        graft.operators.StatsOps.mannWhitneyU(priced, "o_orderstatus",
            "o_orderpriority", "1-URGENT", "5-LOW", "bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH pr AS (SELECT o_orderstatus AS cell,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                // 1000000 +
              CASE WHEN o_orderstatus <> 'O'
                AND o_orderpriority = '1-URGENT' THEN 600 ELSE 0 END
              AS v,
            o_orderpriority AS grp
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        vc AS (SELECT cell, v,
            sum(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN grp = '5-LOW' THEN 1 ELSE 0 END) AS b
          FROM pr GROUP BY cell, v),
        wv AS (SELECT cell, v, a, b,
            coalesce(sum(b) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS b_less
          FROM vc),
        ag AS (SELECT cell, sum(a) AS n_a, sum(b) AS n_b,
            sum(CAST(a AS HUGEINT) * (2 * b_less + b)) AS two_u,
            sum(CAST(a + b AS HUGEINT) * (a + b) * (a + b) - (a + b))
              AS tie_t
          FROM wv GROUP BY cell)
        SELECT cell, CAST(n_a AS BIGINT) AS n_a,
          CAST(n_b AS BIGINT) AS n_b,
          CAST(two_u AS BIGINT) AS two_u,
          CAST(tie_t AS BIGINT) AS tie_t,
          CASE WHEN n_a > 0 AND n_b > 0 AND
              CAST(n_a + n_b + 1 AS HUGEINT) * (n_a + n_b) *
                (n_a + n_b - 1) - tie_t > 0
            THEN CAST(CASE WHEN two_u - CAST(n_a AS HUGEINT) * n_b < 0
                THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                ((two_u - CAST(n_a AS HUGEINT) * n_b) *
                 (two_u - CAST(n_a AS HUGEINT) * n_b) * 3000000 *
                 (n_a + n_b) * (n_a + n_b - 1)) //
                (CAST(n_a AS HUGEINT) * n_b *
                 (CAST(n_a + n_b + 1 AS HUGEINT) * (n_a + n_b) *
                  (n_a + n_b - 1) - tie_t)) AS DOUBLE))) AS BIGINT)
              AS BIGINT) END AS z_milli
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q208 — Markov transition fingerprint (StatsOps.markovStationary):
    // empirical per-user transition matrix + the stationary
    // distribution under 16 defined ppm power steps. The generator
    // draws event types INDEPENDENTLY (probed uniform — the empirical
    // chain would be the uniform fixed point), so the fixture
    // constructs a deterministic trajectory with KNOWN dynamics both
    // engines replay: state = types[min(rank % 7, 4)] per user — a
    // 5-cycle with a 3-long dwell on the last state, whose exact
    // stationary law is (1,1,1,1,3)/7. The measured readout must land
    // there: pi_ppm ≈ 142857 on the four transit states, ≈ 428571 on
    // the dwell state, self_ppm ≈ 2/3·10⁶ on it alone — convergence
    // from the uniform start DEMONSTRATED, and truncation mass-leak
    // visible rather than renormalized away. One user-keyed lag
    // window is the corpus cost; the iteration is 16 broadcast joins
    // on the 5-state matrix; the oracle replays all 16 steps as
    // chained CTEs.
    // ------------------------------------------------------------------
    "q208_markov_stationary" -> GraftQuery(
      build = (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wSeq = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")
        val traj = events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("r", row_number().over(wSeq).cast("long") - 1)
          .withColumn("state",
            element_at(array(types.map(lit): _*),
              (least(col("r") % 7, lit(4L)) + 1).cast("int")))
        graft.operators.StatsOps.markovStationary(traj, "user_id",
            "ts", "event_id", "state", MarkovIters)
          .orderBy("state")
      },
      oracle = Some {
        val step = (k: Int) => s"""
          p$k AS (SELECT cur AS state,
              CAST(sum((CAST(pi_ppm AS HUGEINT) * t_ppm) // 1000000)
                AS BIGINT) AS pi_ppm
            FROM tmat JOIN p${k - 1} ON tmat.prev = p${k - 1}.state
            GROUP BY cur)"""
        s"""
        WITH seq AS (SELECT user_id, ts, event_id,
            row_number() OVER (PARTITION BY user_id
              ORDER BY ts, event_id) - 1 AS r
          FROM events),
        st AS (SELECT user_id, ts, event_id,
            (['click', 'error', 'purchase', 'signup', 'view'])
              [least(r % 7, 4) + 1] AS state
          FROM seq),
        pr AS (SELECT state AS cur,
            lag(state) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev
          FROM st),
        tr AS (SELECT prev, cur, count(*) AS n FROM pr
          WHERE prev IS NOT NULL GROUP BY 1, 2),
        ot AS (SELECT prev, CAST(sum(n) AS BIGINT) AS n_out FROM tr
          GROUP BY prev),
        tmat AS (SELECT tr.prev, tr.cur,
            CAST((CAST(n AS HUGEINT) * 1000000) // n_out AS BIGINT)
              AS t_ppm
          FROM tr JOIN ot ON tr.prev = ot.prev),
        sts AS (SELECT DISTINCT state FROM st),
        p0 AS (SELECT state,
            1000000 // (SELECT count(*) FROM sts) +
            CASE WHEN row_number() OVER (ORDER BY state) <=
              1000000 % (SELECT count(*) FROM sts) THEN 1 ELSE 0 END
              AS pi_ppm
          FROM sts),
        ${(1 to MarkovIters).map(step).mkString(",")}
        SELECT sts.state, coalesce(n_out, 0) AS n_out,
          coalesce(sf.t_ppm, 0) AS self_ppm,
          coalesce(p$MarkovIters.pi_ppm, 0) AS pi_ppm
        FROM sts
        LEFT JOIN ot ON sts.state = ot.prev
        LEFT JOIN (SELECT prev, t_ppm FROM tmat WHERE prev = cur) sf
          ON sts.state = sf.prev
        LEFT JOIN p$MarkovIters ON sts.state = p$MarkovIters.state
        ORDER BY sts.state"""
      }),

    // ------------------------------------------------------------------
    // q206 — expected calibration error (StatsOps.calibrationError):
    // the "when it says 70% is it right 70% of the time" deployment
    // gate. The synthetic events carry no predictable outcome (the
    // q174 lesson), so the fixture SIMULATES a perfectly calibrated
    // pseudo-model both engines replay: score = md5-uniform ppm, label
    // drawn by a second independent md5 stream at exactly that
    // probability — then evaluates it beside an 'overconfident' twin
    // (same labels, scores shifted +250k, capped): calibrated cohort
    // reads ECE at the ~4k-ppm sampling floor, the shifted twin ~190k
    // — the gate demonstrably catches miscalibration. One (cell, bin)
    // aggregate per cohort is the only corpus shuffle.
    // ------------------------------------------------------------------
    "q206_calibration_error" -> GraftQuery(
      build = (s, d) => {
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("event_id").cast("string"))) % 1000000L
        val base = events(s, d).select(col("event_id"))
          .withColumn("s", h("cal"))
          .withColumn("y", when(h("lab") < col("s"), 1L).otherwise(0L))
        val cal = base.select(lit("calibrated").as("cohort"),
          col("s"), col("y"))
        val over = base.select(lit("overconfident").as("cohort"),
          least(col("s") + 250000L, lit(999999L)).as("s"), col("y"))
        graft.operators.StatsOps.calibrationError(
            cal.unionByName(over), "cohort", "s", "y")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH sc AS (SELECT
            CAST(('0x' || substr(md5('cal' || CAST(event_id AS VARCHAR)),
              1, 15)) AS BIGINT) % 1000000 AS s,
            CAST(('0x' || substr(md5('lab' || CAST(event_id AS VARCHAR)),
              1, 15)) AS BIGINT) % 1000000 AS u
          FROM events),
        lab AS (SELECT s, CASE WHEN u < s THEN 1 ELSE 0 END AS y FROM sc),
        co AS (SELECT 'calibrated' AS cell, s, y FROM lab
          UNION ALL
          SELECT 'overconfident', least(s + 250000, 999999), y FROM lab),
        bins AS (SELECT cell, least(s // 100000, 9) AS bin,
            count(*) AS n_b,
            sum(CAST(s AS HUGEINT)) AS conf_sum,
            sum(CAST(y AS HUGEINT)) * 1000000 AS acc_sum
          FROM co GROUP BY 1, 2),
        gaps AS (SELECT cell, n_b, abs(acc_sum - conf_sum) AS gap
          FROM bins)
        SELECT cell, CAST(sum(n_b) AS BIGINT) AS n,
          CAST(count(*) AS BIGINT) AS n_bins,
          CAST(sum(gap) // sum(CAST(n_b AS HUGEINT)) AS BIGINT)
            AS ece_ppm,
          CAST(max(gap // CAST(n_b AS HUGEINT)) AS BIGINT) AS mce_ppm
        FROM gaps GROUP BY cell ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q205 — Kendall τ-b (StatsOps.kendallTauB): pairwise-concordance
    // association with full tie correction, on EXACTLY the q196 frame
    // (quantity vs binned price per return flag, with the injected
    // monotone tilt in flag 'R') so the three dependence legs tell one
    // story: 'R' reads τ ≈ +0.42 where ρ read +0.59 (τ < ρ is the
    // textbook relationship), untouched 'A'/'N' sit at the null. The
    // pairwise sum never materializes: two chained prefix windows on
    // the bounded dense grid compute every concordance count, and the
    // oracle replays the same double-prefix in SQL.
    // ------------------------------------------------------------------
    "q205_kendall_tau_b" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d).select(col("l_returnflag"),
          expr("cast(cast(l_quantity as decimal(18,4)) * 10000 " +
            "as bigint) div 10000").as("qty"),
          (expr("cast(cast(l_extendedprice as decimal(18,4)) * 10000 " +
            "as bigint) div 1000000") +
            when(col("l_returnflag") === "R",
              expr("cast(cast(l_quantity as decimal(18,4)) * 10000 " +
                "as bigint) div 10000") * 16L).otherwise(0L))
            .as("price_bin"))
        graft.operators.StatsOps.kendallTauB(li, "l_returnflag",
            "qty", "price_bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_returnflag AS cell,
            CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 10000 AS x,
            CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
              AS BIGINT) // 1000000 +
            CASE WHEN l_returnflag = 'R' THEN
              (CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
                AS BIGINT) // 10000) * 16 ELSE 0 END AS y
          FROM lineitem),
        cxy AS (SELECT cell, x, y, count(*) AS nxy
          FROM base GROUP BY 1, 2, 3),
        dx AS (SELECT DISTINCT cell, x FROM cxy),
        dy AS (SELECT DISTINCT cell, y FROM cxy),
        grid AS (SELECT dx.cell, dx.x, dy.y,
            coalesce(nxy, 0) AS nc
          FROM dx JOIN dy ON dx.cell = dy.cell
          LEFT JOIN cxy ON cxy.cell = dx.cell AND cxy.x = dx.x
            AND cxy.y = dy.y),
        h AS (SELECT cell, x, y, nc,
            coalesce(sum(nc) OVER (PARTITION BY cell, x ORDER BY y
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS hlt,
            coalesce(sum(nc) OVER (PARTITION BY cell, x ORDER BY y
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
              AS hgt
          FROM grid),
        g AS (SELECT cell, x, y, nc,
            coalesce(sum(hlt) OVER (PARTITION BY cell, y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS glt,
            coalesce(sum(hgt) OVER (PARTITION BY cell, y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS ggt
          FROM h),
        pr AS (SELECT cell, sum(CAST(nc AS HUGEINT)) AS n,
            sum(CAST(nc AS HUGEINT) * glt) AS conc,
            sum(CAST(nc AS HUGEINT) * ggt) AS disc
          FROM g GROUP BY cell),
        tx AS (SELECT cell,
            sum(CAST(nx AS HUGEINT) * (nx - 1)) // 2 AS tx
          FROM (SELECT cell, x, sum(nxy) AS nx FROM cxy GROUP BY 1, 2)
          GROUP BY cell),
        ty AS (SELECT cell,
            sum(CAST(ny AS HUGEINT) * (ny - 1)) // 2 AS ty
          FROM (SELECT cell, y, sum(nxy) AS ny FROM cxy GROUP BY 1, 2)
          GROUP BY cell)
        SELECT pr.cell, CAST(n AS BIGINT) AS n,
          CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
          CASE WHEN (n * (n - 1)) // 2 - tx > 0
              AND (n * (n - 1)) // 2 - ty > 0 THEN
            CAST(CASE WHEN conc - disc < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (((1000000 * abs(conc - disc)) //
                  ((n * (n - 1)) // 2 - tx)) * abs(conc - disc)) //
                  ((n * (n - 1)) // 2 - ty) AS DOUBLE))) AS BIGINT)
              AS BIGINT) END AS tau_milli
        FROM pr JOIN tx ON pr.cell = tx.cell
        JOIN ty ON pr.cell = ty.cell
        ORDER BY pr.cell""")),

    // ------------------------------------------------------------------
    // q204 — mutual information + marginal entropies on the Q20 lattice
    // (StatsOps.mutualInformation): the nominal-data dependence readout
    // correlation can't see. The generator draws status and priority
    // INDEPENDENTLY (probed uniform grid), so the fixture splits orders
    // into two cohorts: 'indep' (even keys, untouched — MI must sit at
    // the sampling-noise floor) and 'coupled' (odd keys, where every
    // third key's priority is overwritten by a status-determined value
    // — a partial functional coupling both engines replay). Expected:
    // coupled MI ≈ 0.5 bits ≫ indep ≈ 0.000x bits, with H(x)/H(y)
    // emitted for normalization. One (cell,x,y) aggregate is the only
    // corpus shuffle; the oracle replays the 20-step lattice over the
    // bounded distinct-argument spine.
    // ------------------------------------------------------------------
    "q204_mutual_information" -> GraftQuery(
      build = (s, d) => {
        val o = orders(s, d)
          .withColumn("cell",
            when(col("o_orderkey") % 2 === 0, "indep")
              .otherwise("coupled"))
          .withColumn("prio",
            when(col("o_orderkey") % 2 =!= 0 &&
                col("o_orderkey") % 3 === 0,
              when(col("o_orderstatus") === "F", "1-URGENT")
                .when(col("o_orderstatus") === "O", "5-LOW")
                .otherwise("3-MEDIUM"))
              .otherwise(col("o_orderpriority")))
        graft.operators.StatsOps.mutualInformation(o, "cell",
            "o_orderstatus", "prio")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH RECURSIVE base AS (SELECT
            CASE WHEN o_orderkey % 2 = 0 THEN 'indep'
              ELSE 'coupled' END AS cell,
            o_orderstatus AS x,
            CASE WHEN o_orderkey % 2 <> 0 AND o_orderkey % 3 = 0
              THEN CASE WHEN o_orderstatus = 'F' THEN '1-URGENT'
                WHEN o_orderstatus = 'O' THEN '5-LOW'
                ELSE '3-MEDIUM' END
              ELSE o_orderpriority END AS y
          FROM orders),
        cxy AS (SELECT cell, x, y, count(*) AS nxy
          FROM base GROUP BY 1, 2, 3),
        cx AS (SELECT cell, x, CAST(sum(nxy) AS BIGINT) AS nx
          FROM cxy GROUP BY 1, 2),
        cy AS (SELECT cell, y, CAST(sum(nxy) AS BIGINT) AS ny
          FROM cxy GROUP BY 1, 2),
        nc AS (SELECT cell, CAST(sum(nxy) AS BIGINT) AS nn
          FROM cxy GROUP BY 1),
        j AS (SELECT cxy.cell, nxy, nx, ny, nn
          FROM cxy
          JOIN cx ON cxy.cell = cx.cell AND cxy.x = cx.x
          JOIN cy ON cxy.cell = cy.cell AND cxy.y = cy.y
          JOIN nc ON cxy.cell = nc.cell),
        args AS (SELECT DISTINCT m FROM (
            SELECT nxy * nn AS m FROM j
            UNION ALL SELECT nx * ny FROM j
            UNION ALL SELECT nn FROM nc
            UNION ALL SELECT nx FROM cx
            UNION ALL SELECT ny FROM cy)),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM args),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lv AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        mic AS (SELECT j.cell, count(*) AS n_pairs,
            sum(CAST(nxy AS HUGEINT) * (la.l - lb.l)) AS mi_sum
          FROM j
          JOIN lv la ON la.m = nxy * nn
          JOIN lv lb ON lb.m = nx * ny
          GROUP BY j.cell),
        hx AS (SELECT cx.cell,
            sum(CAST(nx AS HUGEINT) * (ln.l - lx.l)) AS hx_sum
          FROM cx JOIN nc ON cx.cell = nc.cell
          JOIN lv ln ON ln.m = nn
          JOIN lv lx ON lx.m = nx
          GROUP BY cx.cell),
        hy AS (SELECT cy.cell,
            sum(CAST(ny AS HUGEINT) * (ln.l - ly.l)) AS hy_sum
          FROM cy JOIN nc ON cy.cell = nc.cell
          JOIN lv ln ON ln.m = nn
          JOIN lv ly ON ly.m = ny
          GROUP BY cy.cell)
        SELECT mic.cell, CAST(nn AS BIGINT) AS n,
          CAST(n_pairs AS BIGINT) AS n_pairs,
          CAST(mi_sum // CAST(nn AS HUGEINT) AS BIGINT) AS mi_q20,
          CAST(hx_sum // CAST(nn AS HUGEINT) AS BIGINT) AS hx_q20,
          CAST(hy_sum // CAST(nn AS HUGEINT) AS BIGINT) AS hy_q20
        FROM mic JOIN nc ON mic.cell = nc.cell
        JOIN hx ON mic.cell = hx.cell
        JOIN hy ON mic.cell = hy.cell
        ORDER BY mic.cell""")),

    // ------------------------------------------------------------------
    // q203 — median absolute deviation (StatsOps.madScale): the robust
    // scale readout, with stddev emitted SIDE-BY-SIDE so the fixture
    // reads the robustness gap directly: a 2% outlier cohort at
    // +100,000 hundred-dollar bins (o_orderkey % 50, outside status
    // 'O') drags std_units to ~14,000 while MAD stays at the clean
    // ~1,200-bin scale; the untouched 'O' cell shows the uniform
    // distribution's natural std ≈ 1.17·MAD (measured 1435/1227).
    // Medians are exact
    // counts-domain lower medians (prefix windows over distinct
    // values); std is the q98 decimal-co-moment lattice.
    // ------------------------------------------------------------------
    "q203_mad_scale" -> GraftQuery(
      build = (s, d) => {
        val priced = orders(s, d)
          .withColumn("bin",
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 " +
              "as bigint) div 1000000") +
              when(col("o_orderstatus") =!= "O" &&
                col("o_orderkey") % 50 === 0, 100000L).otherwise(0L))
        graft.operators.StatsOps.madScale(priced, "o_orderstatus", "bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH pr AS (SELECT o_orderstatus AS cell,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                // 1000000 +
              CASE WHEN o_orderstatus <> 'O' AND o_orderkey % 50 = 0
                THEN 100000 ELSE 0 END AS v
          FROM orders),
        vc AS (SELECT cell, v, count(*) AS cnt,
            sum(CAST(v AS HUGEINT)) AS sx_part,
            sum(CAST(v AS HUGEINT) * v) AS sxx_part
          FROM pr GROUP BY 1, 2),
        mc AS (SELECT cell, v,
            sum(cnt) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cnt) OVER (PARTITION BY cell) AS n
          FROM vc),
        med AS (SELECT cell, min(v) AS med, max(n) AS n FROM mc
          WHERE cum * 2 >= n GROUP BY cell),
        mo AS (SELECT cell, sum(cnt) AS n, sum(sx_part) AS sx,
            sum(sxx_part) AS sxx
          FROM vc GROUP BY cell),
        dv AS (SELECT vc.cell, abs(v - med) AS d, sum(cnt) AS cnt
          FROM vc JOIN med ON vc.cell = med.cell GROUP BY 1, 2),
        dc AS (SELECT cell, d,
            sum(cnt) OVER (PARTITION BY cell ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cnt) OVER (PARTITION BY cell) AS n
          FROM dv),
        mad AS (SELECT cell, min(d) AS mad FROM dc
          WHERE cum * 2 >= n GROUP BY cell)
        SELECT med.cell, CAST(med.n AS BIGINT) AS n, med, mad,
          CAST(floor(sqrt(CAST(
            (sxx * mo.n - sx * sx) // (CAST(mo.n AS HUGEINT) * mo.n)
            AS DOUBLE))) AS BIGINT) AS std_units
        FROM med JOIN mad ON med.cell = mad.cell
        JOIN mo ON med.cell = mo.cell
        ORDER BY med.cell""")),

    // ------------------------------------------------------------------
    // q198 — Jensen–Shannon divergence (StatsOps.jsDivergence): term-
    // distribution drift between even/odd document slices per language,
    // every log on the exact Q20 lattice. The synthetic corpus is
    // uniform over one 31-word vocabulary in EVERY slice (probed), so
    // the fixture injects drift deterministically: in the 'en' odd
    // slice, tokens at (doc_id·131 + i) % 4 == 0 remap to 'merge' —
    // a 25% mass spike both engines replay exactly. Expected story:
    // 'en' reads ≈ 0.09 bits (js_q20 ≈ 9e4), untouched 'de' sits at
    // the sampling-noise floor (≈ 3e2) — the divergence demonstrably
    // discriminates. The oracle replays the 20-step lattice with a
    // linear recursive CTE over the DISTINCT argument spine (3 args
    // per key — bounded by vocabulary, never corpus).
    // ------------------------------------------------------------------
    "q198_js_divergence" -> GraftQuery(
      build = (s, d) => {
        val toks = documents(s, d)
          .filter(col("lang").isin("en", "de"))
          .select(col("doc_id"), col("lang"),
            posexplode(split(lower(col("text")), "\\s+"))
              .as(Seq("pos0", "term0")))
        val sliced = toks.select(col("lang").as("cell"),
          when(col("doc_id") % 2 === 0, "A").otherwise("B").as("slice"),
          when(col("lang") === "en" && col("doc_id") % 2 =!= 0 &&
              (col("doc_id") * 131 + col("pos0") + 1) % 4 === 0,
            lit("merge")).otherwise(col("term0")).as("term"))
        graft.operators.StatsOps.jsDivergence(sliced, "cell", "slice",
            "A", "B", "term")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH RECURSIVE base AS (SELECT doc_id, lang,
            string_split_regex(lower(text), '\s+') AS t
          FROM documents WHERE lang IN ('en', 'de')),
        ti AS (SELECT doc_id, lang, t,
            unnest(range(1, len(t) + 1)) AS i
          FROM base),
        tok AS (SELECT lang AS cell,
            CASE WHEN doc_id % 2 = 0 THEN 'A' ELSE 'B' END AS slice,
            CASE WHEN lang = 'en' AND doc_id % 2 <> 0
                AND (doc_id * 131 + i) % 4 = 0
              THEN 'merge' ELSE t[i] END AS term
          FROM ti),
        kc AS (SELECT cell, term AS k,
            sum(CASE WHEN slice = 'A' THEN 1 ELSE 0 END) AS p,
            sum(CASE WHEN slice = 'B' THEN 1 ELSE 0 END) AS q
          FROM tok GROUP BY 1, 2),
        tt AS (SELECT cell, k, p, q,
            CAST(sum(p) OVER (PARTITION BY cell) AS BIGINT) AS tp,
            CAST(sum(q) OVER (PARTITION BY cell) AS BIGINT) AS tq
          FROM kc),
        args AS (SELECT DISTINCT m FROM (
            SELECT 2 * p * tq AS m FROM tt WHERE p > 0 AND tq > 0
            UNION ALL
            SELECT 2 * q * tp FROM tt WHERE q > 0 AND tp > 0
            UNION ALL
            SELECT p * tq + q * tp FROM tt
            WHERE (p > 0 AND tq > 0) OR (q > 0 AND tp > 0))),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM args),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lv AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        ct AS (SELECT tt.cell, tt.tp, tt.tq,
            CASE WHEN p > 0 AND tq > 0
              THEN CAST(p AS HUGEINT) * (la.l - lm.l) ELSE 0 END AS ca,
            CASE WHEN q > 0 AND tp > 0
              THEN CAST(q AS HUGEINT) * (lb.l - lm.l) ELSE 0 END AS cb
          FROM tt
          LEFT JOIN lv la ON la.m = 2 * p * tq
          LEFT JOIN lv lb ON lb.m = 2 * q * tp
          LEFT JOIN lv lm ON lm.m = p * tq + q * tp),
        ag AS (SELECT cell, max(tp) AS n_a, max(tq) AS n_b,
            count(*) AS n_keys, sum(ca) AS sa, sum(cb) AS sb
          FROM ct GROUP BY cell)
        SELECT cell, CAST(n_a AS BIGINT) AS n_a,
          CAST(n_b AS BIGINT) AS n_b, CAST(n_keys AS BIGINT) AS n_keys,
          CASE WHEN n_a > 0 AND n_b > 0 THEN
            CAST(sa // (2 * CAST(n_a AS HUGEINT)) +
                 sb // (2 * CAST(n_b AS HUGEINT)) AS BIGINT) END
            AS js_q20
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q197 — Kolmogorov–Smirnov two-sample statistic (StatsOps.ksTest):
    // the location readout q195's U integrates away — WHERE the CDF gap
    // peaks and how large it is, on the SAME injected fixture (the
    // +$60k urgent markup outside status 'O'), so the two tests tell
    // one verifiable story: shifted cells read d ≈ 117k ppm with the
    // peak inside the shifted band, the untouched 'O' cell stays at
    // the ~15k-ppm noise floor. The argmax is a deterministic
    // struct-max (lowest value attaining the max gap — no max_by tie
    // lottery), and d_ppm is the exact cross-multiplied integer
    // lattice, hash-gated.
    // ------------------------------------------------------------------
    "q197_ks_two_sample" -> GraftQuery(
      build = (s, d) => {
        val priced = orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .withColumn("bin",
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 " +
              "as bigint) div 1000000") +
              when(col("o_orderstatus") =!= "O" &&
                col("o_orderpriority") === "1-URGENT", 600L)
                .otherwise(0L))
        graft.operators.StatsOps.ksTest(priced, "o_orderstatus",
            "o_orderpriority", "1-URGENT", "5-LOW", "bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH pr AS (SELECT o_orderstatus AS cell,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                // 1000000 +
              CASE WHEN o_orderstatus <> 'O'
                AND o_orderpriority = '1-URGENT' THEN 600 ELSE 0 END
              AS v,
            o_orderpriority AS grp
          FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        vc AS (SELECT cell, v,
            sum(CASE WHEN grp = '1-URGENT' THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN grp = '5-LOW' THEN 1 ELSE 0 END) AS b
          FROM pr GROUP BY cell, v),
        wv AS (SELECT cell, v,
            sum(a) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS cum_a,
            sum(b) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS cum_b,
            sum(a) OVER (PARTITION BY cell) AS n_a,
            sum(b) OVER (PARTITION BY cell) AS n_b
          FROM vc),
        gp AS (SELECT cell, v, n_a, n_b,
            abs(CAST(cum_a AS HUGEINT) * n_b -
                CAST(cum_b AS HUGEINT) * n_a) AS gap
          FROM wv),
        mg AS (SELECT cell, max(n_a) AS n_a, max(n_b) AS n_b,
            max(gap) AS maxgap
          FROM gp GROUP BY cell)
        SELECT mg.cell, CAST(mg.n_a AS BIGINT) AS n_a,
          CAST(mg.n_b AS BIGINT) AS n_b,
          CASE WHEN mg.n_a > 0 AND mg.n_b > 0 THEN
            CAST((maxgap * 1000000) //
              (CAST(mg.n_a AS HUGEINT) * mg.n_b) AS BIGINT) END
            AS d_ppm,
          CASE WHEN mg.n_a > 0 AND mg.n_b > 0 THEN
            (SELECT min(v) FROM gp
              WHERE gp.cell = mg.cell AND gp.gap = mg.maxgap) END
            AS v_at_max
        FROM mg ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q196 — Spearman rank correlation (StatsOps.spearmanRho): monotone
    // association on integer-exact doubled average ranks — quantity vs
    // extended price per return flag, with price in hundred-dollar
    // bins so the drank lookup frame stays bounded and broadcastable.
    // The synthetic lineitem has NO natural qty→price coupling (DuckDB
    // probe: corr ≈ 0.001 — the generator draws them independently),
    // so the fixture INJECTS a monotone qty·16-bin tilt into flag 'R'
    // only, sized from the probed stds (qty σ≈14.4 bins·16 vs price
    // σ≈300 bins ⇒ ρ ≈ 0.6): 'R' must read mid-range positive while
    // untouched 'A'/'N' stay at the null — the operator demonstrably
    // separates a correlated cell from independent ones. The fact
    // shuffles once per value-count aggregate and never for the rank
    // join; ρ is the staged-division lattice, hash-gated to millirho.
    // ------------------------------------------------------------------
    "q196_spearman_rho" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d).select(col("l_returnflag"),
          expr("cast(cast(l_quantity as decimal(18,4)) * 10000 " +
            "as bigint) div 10000").as("qty"),
          (expr("cast(cast(l_extendedprice as decimal(18,4)) * 10000 " +
            "as bigint) div 1000000") +
            when(col("l_returnflag") === "R",
              expr("cast(cast(l_quantity as decimal(18,4)) * 10000 " +
                "as bigint) div 10000") * 16L).otherwise(0L))
            .as("price_bin"))
        graft.operators.StatsOps.spearmanRho(li, "l_returnflag",
            "qty", "price_bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_returnflag AS cell,
            CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 10000 AS x,
            CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
              AS BIGINT) // 1000000 +
            CASE WHEN l_returnflag = 'R' THEN
              (CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
                AS BIGINT) // 10000) * 16 ELSE 0 END AS y
          FROM lineitem),
        nx AS (SELECT cell, x, count(*) AS cnt FROM base GROUP BY 1, 2),
        dx AS (SELECT cell, x,
            2 * coalesce(sum(cnt) OVER (PARTITION BY cell ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) +
              cnt + 1 AS drx
          FROM nx),
        ny AS (SELECT cell, y, count(*) AS cnt FROM base GROUP BY 1, 2),
        dy AS (SELECT cell, y,
            2 * coalesce(sum(cnt) OVER (PARTITION BY cell ORDER BY y
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) +
              cnt + 1 AS dry
          FROM ny),
        nc AS (SELECT cell, count(*) AS n FROM base GROUP BY 1),
        u AS (SELECT base.cell, n,
            CAST(drx - n - 1 AS HUGEINT) AS ux,
            CAST(dry - n - 1 AS HUGEINT) AS uy
          FROM base
          JOIN dx ON base.cell = dx.cell AND base.x = dx.x
          JOIN dy ON base.cell = dy.cell AND base.y = dy.y
          JOIN nc ON base.cell = nc.cell),
        sm AS (SELECT cell, max(n) AS n, sum(ux * uy) AS num,
            sum(ux * ux) AS sxx, sum(uy * uy) AS syy
          FROM u GROUP BY cell)
        SELECT cell, CAST(n AS BIGINT) AS n,
          CASE WHEN sxx > 0 AND syy > 0 THEN
            CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (((1000000 * abs(num)) // sxx) * abs(num)) // syy
                AS DOUBLE))) AS BIGINT) AS BIGINT) END AS rho_milli
        FROM sm ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q209 — exact AUC-ROC (StatsOps.aucRoc): the binary-ranking
    // readout, tie-corrected, on the counts domain. The generator
    // draws priority independently of everything (probed corr ≈ 0), so
    // the fixture SIMULATES a score of known per-cell skill (the q173
    // CUPED discipline): label = priority ∈ {1-URGENT, 2-HIGH}, score =
    // (o_orderkey·2654435761) % 1000 noise + a label shift of 400 in
    // status 'O', 100 in 'F', 0 in 'P'. Closed-form expectation for a
    // uniform-noise shift s: AUC = 1 − (1−s/1000)²/2 → 0.82 / 0.5595 /
    // 0.50; measured 0.818 / 0.586 / 0.502 — the metric demonstrably
    // ORDERS the three known skill levels. Integer scores make tied
    // scores common, so the midrank correction is exercised, not
    // decorative. Window frame = distinct scores ≤ 1400 (the score
    // lattice), never rows.
    // ------------------------------------------------------------------
    "q209_auc_roc" -> GraftQuery(
      build = (s, d) => {
        val lab = when(col("o_orderpriority")
          .isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)
        val skill = when(col("o_orderstatus") === "O", 400L)
          .when(col("o_orderstatus") === "F", 100L).otherwise(0L)
        val scored = orders(s, d).select(
          col("o_orderstatus").as("cell"),
          ((col("o_orderkey") * 2654435761L) % 1000L +
            lab * skill).as("score"),
          lab.as("y"))
        StatsOps.aucRoc(scored, "cell", "score", "y").orderBy("cell")
      },
      oracle = Some("""
        WITH s AS (SELECT o_orderstatus AS cell,
            (o_orderkey * 2654435761) % 1000 +
              CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN
                CASE o_orderstatus WHEN 'O' THEN 400
                  WHEN 'F' THEN 100 ELSE 0 END
              ELSE 0 END AS score,
            CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
          FROM orders),
        sc AS (SELECT cell, score, sum(y) AS c1, sum(1 - y) AS c0
          FROM s GROUP BY 1, 2),
        cw AS (SELECT cell, c1, c0,
            coalesce(sum(c1 + c0) OVER (PARTITION BY cell ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
          FROM sc),
        ag AS (SELECT cell, CAST(sum(c1) AS BIGINT) AS n_pos,
            CAST(sum(c0) AS BIGINT) AS n_neg,
            sum(CAST(c1 AS HUGEINT) * (2 * cb + c1 + c0 + 1)) AS r2
          FROM cw GROUP BY 1),
        au AS (SELECT cell, n_pos, n_neg,
            CASE WHEN n_pos > 0 AND n_neg > 0 THEN
              CAST((1000000 * (r2 - CAST(n_pos AS HUGEINT) *
                (n_pos + 1))) //
                (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
            END AS auc_ppm
          FROM ag)
        SELECT cell, n_pos, n_neg, auc_ppm,
          auc_ppm * 2 - 1000000 AS gini_ppm
        FROM au ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q210 — population stability index (StatsOps.psiDrift): the
    // model-monitoring drift standard, joining q198 (JS) and q175 (TV)
    // with the industry readout, in exact Q20 log2 units. Slices are
    // event_id parity; bins are $50 value bands (bin = value_e4 div
    // 5·10⁵, clamped to 9) — bin derives from `value`, independent of
    // event_id, so the parity-modulus trap (round-11 memory) cannot
    // correlate the cells. Injection: in 'click' slice B a quarter of
    // rows ((event_id·131) % 4, odd multiplier) shift two bins up
    // before the clamp — click reads a real PSI while untouched cells
    // sit at the sampling-noise floor. Naturally one-sided bins at
    // sf0.001 (probed: 8 of them) exercise the exclusion path, and the
    // excluded probability mass is EMITTED (excl_a_ppm / excl_b_ppm),
    // not silently smoothed. The oracle replays the Q20 lattice over
    // the DISTINCT a·tb / b·ta argument spine (bin-bounded).
    // ------------------------------------------------------------------
    "q210_psi_drift" -> GraftQuery(
      build = (s, d) => {
        val bBase = least(expr("cast(cast(value as decimal(18,4)) * " +
          "10000 as bigint) div 500000"), lit(9L))
        val inj = when(col("event_type") === "click" &&
          col("event_id") % 2 === 1 &&
          (col("event_id") * 131) % 4 === 0, 2L).otherwise(0L)
        val sliced = events(s, d).select(
          col("event_type").as("cell"),
          when(col("event_id") % 2 === 0, "A").otherwise("B").as("sl"),
          least(bBase + inj, lit(9L)).as("bin"))
        StatsOps.psiDrift(sliced, "cell", "sl", "A", "B", "bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH RECURSIVE e AS (SELECT event_type AS cell,
            CASE WHEN event_id % 2 = 0 THEN 'A' ELSE 'B' END AS sl,
            least(least(CAST(CAST(value AS DECIMAL(18,4)) * 10000
                AS BIGINT) // 500000, 9) +
              CASE WHEN event_type = 'click' AND event_id % 2 = 1
                  AND (event_id * 131) % 4 = 0 THEN 2 ELSE 0 END,
              9) AS bin
          FROM events),
        kc AS (SELECT cell, bin,
            sum(CASE WHEN sl = 'A' THEN 1 ELSE 0 END) AS a,
            sum(CASE WHEN sl = 'B' THEN 1 ELSE 0 END) AS b
          FROM e GROUP BY 1, 2),
        tt AS (SELECT cell, bin, a, b,
            CAST(sum(a) OVER (PARTITION BY cell) AS BIGINT) AS ta,
            CAST(sum(b) OVER (PARTITION BY cell) AS BIGINT) AS tb
          FROM kc),
        args AS (SELECT DISTINCT m FROM (
            SELECT a * tb AS m FROM tt WHERE a > 0 AND b > 0
            UNION ALL
            SELECT b * ta FROM tt WHERE a > 0 AND b > 0)),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM args),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lut AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        tm AS (SELECT tt.cell, tt.a, tt.b, tt.ta, tt.tb,
            CASE WHEN a > 0 AND b > 0 THEN
              CAST(a * tb - b * ta AS HUGEINT) * (la.l - lb.l)
              ELSE 0 END AS term,
            CASE WHEN a > 0 AND b > 0 THEN 0 ELSE 1 END AS excl
          FROM tt
          LEFT JOIN lut la ON a > 0 AND b > 0 AND la.m = a * tb
          LEFT JOIN lut lb ON a > 0 AND b > 0 AND lb.m = b * ta),
        ag AS (SELECT cell, max(ta) AS n_a, max(tb) AS n_b,
            CAST(count(*) AS BIGINT) AS n_bins,
            CAST(sum(excl) AS BIGINT) AS n_excl,
            sum(CASE WHEN excl = 1 THEN a ELSE 0 END) AS xa,
            sum(CASE WHEN excl = 1 THEN b ELSE 0 END) AS xb,
            sum(term) AS num
          FROM tm GROUP BY cell)
        SELECT cell, n_a, n_b, n_bins, n_excl,
          CASE WHEN n_a > 0 AND n_b > 0 THEN
            CAST(num // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) END
            AS psi_q20,
          CASE WHEN n_a > 0 THEN
            CAST((1000000 * CAST(xa AS HUGEINT)) // n_a AS BIGINT) END
            AS excl_a_ppm,
          CASE WHEN n_b > 0 THEN
            CAST((1000000 * CAST(xb AS HUGEINT)) // n_b AS BIGINT) END
            AS excl_b_ppm
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q215 — k-anonymity / l-diversity audit (QualityAudit.kAnonymity):
    // the privacy gate on a data release — per market segment, the
    // ACHIEVED k (min quasi-identifier group size), risky group/row
    // counts under k = 6, risky row share, and minimum l-diversity of
    // the sensitive nation column. QI = (segment, $2500 balance band) —
    // probed 20 groups sized 4–17 at sf0.001 (risky rows exist) and
    // 53–108 at sf0.01 (none risky): the larger release at the same QI
    // legitimately reads SAFER, which is exactly the measurement; the
    // spec proves the discriminating direction on a constructed frame.
    // Negative balances band to 0 by shared truncation semantics
    // (Spark div and DuckDB // both truncate toward zero — round-10
    // memory, measured).
    // ------------------------------------------------------------------
    "q215_k_anonymity" -> GraftQuery(
      build = (s, d) => {
        val banded = customer(s, d).withColumn("band",
          expr("cast(cast(c_acctbal as decimal(18,4)) * 10000 " +
            "as bigint) div 25000000"))
        graft.operators.QualityAudit.kAnonymity(banded,
            Seq("c_mktsegment", "band"), "c_nationkey", k = 6,
            reportCol = "c_mktsegment")
          .orderBy("report")
      },
      oracle = Some("""
        WITH g AS (SELECT c_mktsegment AS seg,
            CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 25000000 AS band,
            CAST(count(*) AS BIGINT) AS n,
            CAST(count(DISTINCT c_nationkey) AS BIGINT) AS ldiv
          FROM customer GROUP BY 1, 2)
        SELECT seg AS report, CAST(sum(n) AS BIGINT) AS n_rows,
          CAST(count(*) AS BIGINT) AS n_groups,
          min(n) AS k_achieved,
          CAST(sum(CASE WHEN n < 6 THEN 1 ELSE 0 END) AS BIGINT)
            AS risky_groups,
          CAST(sum(CASE WHEN n < 6 THEN n ELSE 0 END) AS BIGINT)
            AS risky_rows,
          (1000000 * CAST(sum(CASE WHEN n < 6 THEN n ELSE 0 END)
            AS BIGINT)) // CAST(sum(n) AS BIGINT) AS risky_ppm,
          min(ldiv) AS min_l_div
        FROM g GROUP BY 1 ORDER BY report""")),

    // ------------------------------------------------------------------
    // q216 — Adamic–Adar link prediction (GraphOps.adamicAdar) on the
    // supplier–part affiliation graph: which supplier pairs share the
    // most NICHE parts (1/log-degree weighting — a shared commodity
    // part supplied by 50 suppliers says ~nothing, a shared 2-supplier
    // part says everything). Candidates come from the postings-join
    // discipline — equality self-join on the part key, degree-capped
    // at 64 (probed: max co-supply degree 52 at sf0.1, so the standard
    // fixture never trips the cap; quadratic hubs it would drop carry
    // ~zero AA weight, the algorithm's own argument) — never an
    // all-pairs scan on suppliers. Weights are 2⁴⁰ div log2_q20(deg)
    // on the native lattice; the oracle replays it over the DISTINCT
    // degree spine (≤ 63 values). Top-20 via TakeOrderedAndProject.
    // ------------------------------------------------------------------
    "q216_adamic_adar" -> GraftQuery(
      build = (s, d) =>
        graft.operators.GraphOps.adamicAdar(
          lineitem(s, d).select(col("l_suppkey"), col("l_partkey")),
          "l_suppkey", "l_partkey", topK = 20, degCap = 64L),
      oracle = Some(s"""
        WITH RECURSIVE e AS (SELECT DISTINCT l_partkey AS p,
            l_suppkey AS u FROM lineitem),
        deg AS (SELECT p, CAST(count(*) AS BIGINT) AS d FROM e
          GROUP BY 1 HAVING count(*) BETWEEN 2 AND 64),
        vals AS (SELECT DISTINCT d AS m FROM deg),
        m0 AS (SELECT m, length(bin(m)) - 1 AS hb FROM vals),
        mant AS (SELECT m, hb,
            CASE WHEN hb >= 30 THEN m >> (hb - 30)
              ELSE m << (30 - hb) END AS x
          FROM m0),
        lgx AS (
          SELECT m, hb, x, 0 AS it, CAST(0 AS BIGINT) AS frac FROM mant
          UNION ALL
          SELECT m, hb,
            CASE WHEN x * x >= 2305843009213693952 THEN (x * x) >> 31
              ELSE (x * x) >> 30 END,
            it + 1,
            frac * 2 + CASE WHEN x * x >= 2305843009213693952
              THEN 1 ELSE 0 END
          FROM lgx WHERE it < 20),
        lut AS (SELECT m, (hb << 20) + frac AS l FROM lgx WHERE it = 20),
        dw AS (SELECT p, ${1L << 40} // l AS w
          FROM deg JOIN lut ON deg.d = lut.m),
        pr AS (SELECT a.u AS u1, b.u AS u2, w
          FROM e a JOIN e b ON a.p = b.p AND a.u < b.u
          JOIN dw ON a.p = dw.p),
        ag AS (SELECT u1, u2, CAST(count(*) AS BIGINT) AS common_parts,
            CAST(sum(w) AS BIGINT) AS aa_q20
          FROM pr GROUP BY 1, 2)
        SELECT u1, u2, common_parts, aa_q20 FROM ag
        ORDER BY aa_q20 DESC, u1, u2 LIMIT 20""")),

    // ------------------------------------------------------------------
    // q220 — Welch's two-sample t (StatsOps.welchT): the parametric
    // mean-difference leg completing the inferential family. Values
    // are $100 price bins (≤ 5·10³ lattice — the documented envelope);
    // the generator draws priority independent of price (probed ≈ 0
    // everywhere), so the fixture injects a +50-bin mean shift into
    // the high-priority group of status 'O' only: 'O' reads t ≈ +9.1,
    // untouched 'F'/'P' sit inside the ±2 null band (measured −0.09,
    // +1.57 — real sampling noise, honestly reported). The t itself is the
    // defined staged sqrt lattice — hash-gated, not approximated.
    // ------------------------------------------------------------------
    "q220_welch_t" -> GraftQuery(
      build = (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        val scored = orders(s, d).select(
          col("o_orderstatus").as("cell"),
          when(hi, "A").otherwise("B").as("grp"),
          (expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 " +
            "as bigint) div 1000000") +
            when(col("o_orderstatus") === "O" && hi, 150L).otherwise(0L))
            .as("v"))
        StatsOps.welchT(scored, "cell", "grp", "A", "B", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH s AS (SELECT o_orderstatus AS cell,
            CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS ia,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                // 1000000 +
              CASE WHEN o_orderstatus = 'O' AND o_orderpriority IN
                ('1-URGENT', '2-HIGH') THEN 150 ELSE 0 END AS v
          FROM orders),
        ag AS (SELECT cell, CAST(sum(ia) AS BIGINT) AS n1,
            CAST(sum(1 - ia) AS BIGINT) AS n2,
            sum(CAST(v AS HUGEINT) * ia) AS sx1,
            sum(CAST(v AS HUGEINT) * (1 - ia)) AS sx2,
            sum(CAST(v AS HUGEINT) * v * ia) AS sxx1,
            sum(CAST(v AS HUGEINT) * v * (1 - ia)) AS sxx2
          FROM s GROUP BY 1),
        c AS (SELECT cell, n1, n2, sx1 * n2 - sx2 * n1 AS d,
            (n1 * sxx1 - sx1 * sx1) * n2 * n2 * (n2 - 1) +
              (n2 * sxx2 - sx2 * sx2) * n1 * n1 * (n1 - 1) AS e
          FROM ag)
        SELECT cell, n1 AS n_a, n2 AS n_b,
          CASE WHEN n1 >= 2 AND n2 >= 2 AND e > 0 AND
              ((1000000 * d * d * (n1 - 1)) // e) * (n2 - 1) <
                9007199254740992
            THEN CAST(CASE WHEN d < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(((1000000 * d * d * (n1 - 1)) // e) *
                (n2 - 1) AS DOUBLE))) AS BIGINT) AS BIGINT)
          END AS t_milli
        FROM c ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q245 — Benford first-digit profile (QualityAudit.benfordProfile)
    // over order totals in cents, per priority class. The synthetic
    // totals are range-clamped so the profile is deliberately FAR from
    // Benford (digits 1-4 carry ~10x the mass of 5-9, probed at all
    // scales) — the operator's readout is the deviation itself, and a
    // strongly non-Benford fixture exercises the dense-spine/dev path
    // harder than a conforming one. All 9 digits emit per cell; the
    // expected-ppm constants are public in both engines.
    // ------------------------------------------------------------------
    "q245_benford_profile" -> GraftQuery(
      build = (s, d) => {
        val amounts = orders(s, d).select(
          col("o_orderpriority").as("prio"),
          cents(col("o_totalprice")).as("amt"))
        graft.operators.QualityAudit.benfordProfile(amounts, "prio", "amt")
          .orderBy("cell", "digit")
      },
      oracle = Some("""
        WITH v AS (SELECT o_orderpriority AS cell,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              AS amt FROM orders),
        dg AS (SELECT cell,
            CAST(substring(CAST(amt AS VARCHAR), 1, 1) AS INTEGER)
              AS digit, CAST(count(*) AS BIGINT) AS n_d
          FROM v WHERE amt > 0 GROUP BY 1, 2),
        t AS (SELECT cell, CAST(sum(n_d) AS BIGINT) AS n
          FROM dg GROUP BY 1),
        e AS (SELECT * FROM (VALUES (1, 301029), (2, 176091),
            (3, 124938), (4, 96910), (5, 79181), (6, 66946),
            (7, 57991), (8, 51152), (9, 45757)) AS e(digit, exp_ppm)),
        sp AS (SELECT t.cell, t.n, e.digit,
            CAST(e.exp_ppm AS BIGINT) AS exp_ppm FROM t CROSS JOIN e)
        SELECT sp.cell, sp.digit, sp.n,
          COALESCE(dg.n_d, 0) AS n_d,
          (1000000 * COALESCE(dg.n_d, 0)) // sp.n AS obs_ppm,
          sp.exp_ppm,
          abs((1000000 * COALESCE(dg.n_d, 0)) // sp.n - sp.exp_ppm)
            AS dev_ppm
        FROM sp LEFT JOIN dg ON dg.cell = sp.cell AND
          dg.digit = sp.digit
        ORDER BY sp.cell, sp.digit""")),

    // ------------------------------------------------------------------
    // q246 — t-closeness (QualityAudit.tCloseness) on customer account
    // balances binned 8-wide, classes = market segments, with an
    // INJECTED +2-bin shift on BUILDING (the generator draws balance
    // independent of segment — probed natural EMD ≤ 86k ppm at every
    // scale, shifted BUILDING 139-199k ppm, so tPpm = 120000 splits
    // breach/clean identically at sf0.001/0.01/0.1). Bins clamp AFTER
    // the shift so no injected row leaves the [0,8) domain.
    // ------------------------------------------------------------------
    "q246_t_closeness" -> GraftQuery(
      build = (s, d) => {
        val binned = customer(s, d).select(
          col("c_mktsegment").as("seg"),
          least(greatest(cents(col("c_acctbal")), lit(0L))
              .divide(lit(12500000L)).cast("long") +
              when(col("c_mktsegment") === "BUILDING", 2L).otherwise(0L),
            lit(7L)).as("bin"))
        graft.operators.QualityAudit.tCloseness(binned, "seg", "bin",
            nBins = 8, tPpm = 120000L)
          .orderBy("cls")
      },
      oracle = Some("""
        WITH b AS (SELECT c_mktsegment AS cls,
            least(greatest(CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000
                AS BIGINT), 0) // 12500000 +
              CASE WHEN c_mktsegment = 'BUILDING' THEN 2 ELSE 0 END,
              7) AS bin FROM customer),
        cb AS (SELECT cls, bin, CAST(count(*) AS BIGINT) AS c
          FROM b GROUP BY 1, 2),
        spine AS (SELECT cls, nc, g.b FROM (SELECT cls,
            CAST(sum(c) AS BIGINT) AS nc FROM cb GROUP BY 1)
          CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) g),
        dense AS (SELECT s.cls, s.nc, s.b, COALESCE(cb.c, 0) AS c
          FROM spine s LEFT JOIN cb ON cb.cls = s.cls AND cb.bin = s.b),
        cc AS (SELECT cls, nc, b, sum(c) OVER (PARTITION BY cls
            ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum_c FROM dense),
        gg AS (SELECT b, sum(c) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED
            PRECEDING AND CURRENT ROW) AS cum_g
          FROM (SELECT b, sum(c) AS c FROM dense GROUP BY 1)),
        nt AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM cb),
        r AS (SELECT cls, max(cc.nc) AS n,
            CAST((1000000 * sum(abs(CAST(cum_c AS HUGEINT) * nn -
              CAST(cum_g AS HUGEINT) * nc))) //
              (7 * max(CAST(nc AS HUGEINT)) * max(CAST(nn AS HUGEINT)))
              AS BIGINT) AS emd_ppm
          FROM cc JOIN gg USING (b) CROSS JOIN nt GROUP BY cls)
        SELECT cls, n, emd_ppm,
          CAST(CASE WHEN emd_ppm > 120000 THEN 1 ELSE 0 END AS INTEGER)
            AS breach
        FROM r ORDER BY cls""")),

    // ------------------------------------------------------------------
    // q247 — Mann-Kendall trend test (StatsOps.mannKendall) on daily
    // event volumes per type: 30 unique days per cell (uniqueness is
    // the aggregate's own guarantee, satisfying the operator's loud
    // probe), dense grid ≤ 30x27 cells (probed). The engine computes
    // S = C - D via the contingency-grid double-prefix; the oracle is
    // INDEPENDENTLY formulated as the direct pairwise sum over day
    // pairs (tractable at oracle scale, 435 pairs/cell) with the
    // tie-corrected variance lattice replayed term-by-term.
    // ------------------------------------------------------------------
    "q247_mann_kendall" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .select(col("event_type").as("et"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("et"), col("day"))
          .agg(count(lit(1)).as("v"))
        StatsOps.mannKendall(daily, "et", "day", "v").orderBy("cell")
      },
      oracle = Some("""
        WITH d AS (SELECT event_type AS cell,
            epoch_us(ts) // 86400000000 AS t,
            CAST(count(*) AS BIGINT) AS v FROM events GROUP BY 1, 2),
        p AS (SELECT a.cell, CAST(sum(CASE WHEN b.v > a.v THEN 1
            WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
          FROM d a JOIN d b ON a.cell = b.cell AND b.t > a.t
          GROUP BY 1),
        nn AS (SELECT cell, CAST(count(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
        ties AS (SELECT cell, COALESCE(sum(CAST(c AS HUGEINT) *
            (c - 1) * (2 * c + 5)), 0) AS tcub
          FROM (SELECT cell, v, CAST(count(*) AS BIGINT) AS c
            FROM d GROUP BY 1, 2) GROUP BY 1),
        z AS (SELECT nn.cell, nn.n, p.s,
            CAST(nn.n AS HUGEINT) * (nn.n - 1) * (nn.n * 2 + 5) -
              ties.tcub AS den
          FROM nn JOIN p ON p.cell = nn.cell
          JOIN ties ON ties.cell = nn.cell)
        SELECT cell, n, s,
          CASE WHEN den > 0 AND s = 0 THEN 0
            WHEN den > 0 AND
              (18000000 * CAST(abs(s) - 1 AS HUGEINT) * (abs(s) - 1))
                // den < 9007199254740992
            THEN CAST(CASE WHEN s < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST((18000000 *
                CAST(abs(s) - 1 AS HUGEINT) * (abs(s) - 1)) // den
                AS DOUBLE))) AS BIGINT) AS BIGINT)
          END AS z_milli
        FROM z ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q248 — Nelson-Aalen cumulative hazard (StatsOps.nelsonAalen) on
    // per-(user, day) session "lifetimes": duration = events that day,
    // event = the session converted (any purchase), censored otherwise
    // — probed mixed flags (~30% convert) and durations 1..10 at every
    // scale. Cells split weekday/weekend from the epoch-day lattice
    // ((day+4) mod 7, Sunday = 0 — day counts are positive so both
    // engines' % agree). The users-active-all-30-days fixture fact
    // rules out calendar-span lifetimes (probed: every user spans
    // 26-29 of 30 days), hence the session-grain subject.
    // ------------------------------------------------------------------
    "q248_nelson_aalen" -> GraftQuery(
      build = (s, d) => {
        val sess = events(s, d)
          .select(col("user_id").as("uid"),
            expr("ts div 86400000000000").as("day"),
            col("event_type").as("et"))
          .groupBy(col("uid"), col("day"))
          .agg(count(lit(1)).as("dur"),
            max(when(col("et") === "purchase", 1L).otherwise(0L))
              .as("ev"))
          .withColumn("cellc",
            when(expr("(day + 4) % 7").isin(0L, 6L), "we")
              .otherwise("wd"))
        StatsOps.nelsonAalen(sess, "cellc", "dur", "ev")
          .orderBy("cell", "t")
      },
      oracle = Some("""
        WITH sess AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS dur,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS ev FROM events GROUP BY 1, 2),
        c AS (SELECT CASE WHEN (day + 4) % 7 IN (0, 6) THEN 'we'
              ELSE 'wd' END AS cell, dur AS t,
            CAST(count(*) AS BIGINT) AS n_at,
            CAST(sum(ev) AS BIGINT) AS d FROM sess GROUP BY 1, 2),
        r AS (SELECT cell, t, d, CAST(sum(n_at) OVER (PARTITION BY cell
            ORDER BY t ROWS BETWEEN CURRENT ROW AND UNBOUNDED
            FOLLOWING) AS BIGINT) AS n_risk FROM c),
        h AS (SELECT cell, t, n_risk, d,
            CAST((1000000 * d) // n_risk AS BIGINT) AS h_inc_ppm FROM r),
        z AS (SELECT cell, t, n_risk, d, h_inc_ppm,
            CAST(sum(CASE WHEN d > 0 THEN h_inc_ppm ELSE 0 END) OVER (
              PARTITION BY cell ORDER BY t ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT) AS h_cum_ppm FROM h)
        SELECT cell, t, n_risk, d, h_inc_ppm, h_cum_ppm
        FROM z WHERE d > 0 ORDER BY cell, t""")),

    // ------------------------------------------------------------------
    // q249 — per-source Gini concentration of character mass over
    // documents (StatsOps.giniConcentrationByCell): "is one source's
    // token budget dominated by a few giant documents". 20 sources,
    // partitioned rank windows (a cell's rows only), decimal128 i*x
    // numerator; the oracle replays the identical rank lattice (the
    // doc_id tiebreak is provably value-invariant, so both engines'
    // row_number agree on the statistic even where they disagree on
    // tie order).
    // ------------------------------------------------------------------
    "q249_gini_by_cell" -> GraftQuery(
      build = (s, d) =>
        StatsOps.giniConcentrationByCell(
            documents(s, d).select(col("source"), col("doc_id"),
              col("n_chars")),
            "source", "doc_id", "n_chars")
          .orderBy("cell"),
      oracle = Some("""
        WITH r AS (SELECT source AS cell, n_chars AS x,
            row_number() OVER (PARTITION BY source
              ORDER BY n_chars, doc_id) AS i
          FROM documents WHERE n_chars IS NOT NULL),
        a AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(x) AS BIGINT) AS total,
            sum(CAST(x AS HUGEINT) * i) AS ix FROM r GROUP BY 1)
        SELECT cell, n, total,
          CASE WHEN n > 1 AND total > 0 THEN
            CAST((1000000 * (2 * ix - CAST(n + 1 AS HUGEINT) * total))
              // (CAST(n AS HUGEINT) * total) AS BIGINT)
          END AS gini_ppm
        FROM a ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q250 — log-rank test (StatsOps.logRank) closing the survival
    // family: q120 KM draws the curves, q248 Nelson-Aalen the hazard,
    // this says whether the A/B difference is signal. Same session-
    // grain subjects as q248 (dur = events per (user, day), event =
    // converted), groups = weekday vs weekend sessions, cells = three
    // user bands (modulus 3 — co-prime with the weekly cycle; the
    // even-modulus fixture trap). The sum-of-floors e/v lattice
    // replays term-by-term in the oracle's window formulation.
    // ------------------------------------------------------------------
    "q250_log_rank" -> GraftQuery(
      build = (s, d) => {
        val sess = events(s, d)
          .select(col("user_id").as("uid"),
            expr("ts div 86400000000000").as("day"),
            col("event_type").as("et"))
          .groupBy(col("uid"), col("day"))
          .agg(count(lit(1)).as("dur"),
            max(when(col("et") === "purchase", 1L).otherwise(0L))
              .as("ev"))
          .select(concat(lit("u"), pmod(col("uid"), lit(3))).as("band"),
            when(expr("(day + 4) % 7").isin(0L, 6L), "we")
              .otherwise("wd").as("grp"),
            col("dur"), col("ev"))
        StatsOps.logRank(sess, "band", "grp", "wd", "we", "dur", "ev")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH sess AS (SELECT user_id,
            epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS dur,
            max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS ev FROM events GROUP BY 1, 2),
        s AS (SELECT 'u' || CAST(user_id % 3 AS VARCHAR) AS cell,
            CASE WHEN (day + 4) % 7 IN (0, 6) THEN 0 ELSE 1 END AS ia,
            dur AS t, ev FROM sess),
        bt AS (SELECT cell, t, CAST(sum(ia) AS BIGINT) AS na_at,
            CAST(sum(1 - ia) AS BIGINT) AS nb_at,
            CAST(sum(ia * ev) AS BIGINT) AS da,
            CAST(sum((1 - ia) * ev) AS BIGINT) AS db
          FROM s GROUP BY 1, 2),
        r AS (SELECT cell, t, na_at, nb_at, da, db,
            CAST(sum(na_at) OVER w AS BIGINT) AS na_risk,
            CAST(sum(nb_at) OVER w AS BIGINT) AS nb_risk
          FROM bt WINDOW w AS (PARTITION BY cell ORDER BY t ROWS
            BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        term AS (SELECT cell, na_at, nb_at, da, d, n, na_risk, nb_risk,
            CASE WHEN d > 0 THEN (1000000 * d * na_risk) // n
              ELSE 0 END AS e_ppm,
            CASE WHEN d > 0 AND n > 1 THEN
              (CAST(1000000000000 AS HUGEINT) * d * na_risk * nb_risk *
                (n - d)) // (CAST(n AS HUGEINT) * n * (n - 1))
              ELSE 0 END AS v12
          FROM (SELECT *, da + db AS d, na_risk + nb_risk AS n FROM r)),
        agg AS (SELECT cell, CAST(sum(na_at) AS BIGINT) AS n_a,
            CAST(sum(nb_at) AS BIGINT) AS n_b,
            CAST(sum(da) AS BIGINT) AS d_a,
            sum(CAST(e_ppm AS HUGEINT)) AS e_sum,
            sum(CAST(v12 AS HUGEINT)) AS v_sum
          FROM term GROUP BY 1),
        fin AS (SELECT cell, n_a, n_b, d_a,
            CAST(1000000 AS HUGEINT) * d_a - e_sum AS delta,
            e_sum, v_sum FROM agg)
        SELECT cell, n_a, n_b, d_a, CAST(e_sum AS BIGINT) AS e_a_ppm,
          CASE WHEN v_sum > 0 AND (1000000 * abs(delta) * abs(delta))
              // v_sum < 9007199254740992
            THEN CAST(CASE WHEN delta < 0 THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST((1000000 * abs(delta) * abs(delta))
                // v_sum AS DOUBLE))) AS BIGINT) AS BIGINT)
          END AS z_milli
        FROM fin ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q251 — Theil-Sen robust slope (StatsOps.theilSen), q247's trend-
    // MAGNITUDE companion on the same daily frame: median pairwise
    // slope over (day, volume) per type, with a +3/day ramp injected
    // on signup (the generator draws volumes flat — probed; the
    // injection makes the gated slope read the planted magnitude while
    // the other four cells read noise around zero). 30 points = 435
    // pairs per cell; the slope lattice truncates toward zero
    // identically in Spark div and DuckDB //.
    // ------------------------------------------------------------------
    "q251_theil_sen" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .select(col("event_type").as("et"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("et"), col("day"))
          .agg(count(lit(1)).as("v0"))
          .select(col("et"), col("day"),
            (col("v0") + when(col("et") === "signup",
              (col("day") - 19723L) * 3L).otherwise(0L)).as("v"))
        StatsOps.theilSen(daily, "et", "day", "v").orderBy("cell")
      },
      oracle = Some("""
        WITH d AS (SELECT event_type AS cell,
            epoch_us(ts) // 86400000000 AS t,
            CAST(count(*) AS BIGINT) AS v0 FROM events GROUP BY 1, 2),
        dd AS (SELECT cell, t, v0 + CASE WHEN cell = 'signup'
            THEN (t - 19723) * 3 ELSE 0 END AS v FROM d),
        p AS (SELECT a.cell AS cell,
            (1000 * (b.v - a.v)) // (b.t - a.t) AS s
          FROM dd a JOIN dd b ON a.cell = b.cell AND a.t < b.t),
        r AS (SELECT cell, s,
            row_number() OVER (PARTITION BY cell ORDER BY s) AS r,
            count(*) OVER (PARTITION BY cell) AS np FROM p)
        SELECT cell, CAST(np AS BIGINT) AS n_pairs,
          CAST(s AS BIGINT) AS slope_milli
        FROM r WHERE r = (np + 1) // 2 ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q252 — CUSUM changepoint monitor (StatsOps.cusum) on daily
    // average event value (e-4 units) per type: a +50-unit level SHIFT
    // injected on click and a -40-unit DROP on error, both from day
    // 19743 — probed: 7-9 upper alarms on click, 7-8 lower alarms on
    // error, ZERO false alarms on the three clean cells at every
    // scale (k_up 700000 / k_dn 300000 sit ~1 sf0.001-sigma outside
    // the flat daily mean of ~500000). The sequential recursion runs
    // distributed via the exact prefix-min identity - two shared-
    // exchange windows, no fold.
    // ------------------------------------------------------------------
    "q252_cusum" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type").as("et"),
            expr("ts div 86400000000000").as("day"),
            expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)")
              .as("c"))
          .groupBy(col("et"), col("day"))
          .agg(expr("sum(c) div count(1)").as("a"))
          .select(col("et"), col("day"),
            (col("a") +
              when(col("et") === "click" && col("day") >= 19743L,
                500000L).otherwise(0L) -
              when(col("et") === "error" && col("day") >= 19743L,
                400000L).otherwise(0L)).as("v"))
        StatsOps.cusum(daily, "et", "day", "v",
            kUp = 700000L, hUp = 600000L, kDn = 300000L, hDn = 600000L)
          .orderBy("cell", "t")
      },
      oracle = Some("""
        WITH d AS (SELECT event_type AS cell,
            epoch_us(ts) // 86400000000 AS t,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) // count(*) AS a
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        v AS (SELECT cell, t, a +
            CASE WHEN cell = 'click' AND t >= 19743 THEN 500000
              ELSE 0 END -
            CASE WHEN cell = 'error' AND t >= 19743 THEN 400000
              ELSE 0 END AS v FROM d),
        p AS (SELECT cell, t, v,
            CAST(sum(v - 700000) OVER wp AS BIGINT) AS p_up,
            CAST(sum(300000 - v) OVER wp AS BIGINT) AS p_dn
          FROM v WINDOW wp AS (PARTITION BY cell ORDER BY t ROWS
            BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        s AS (SELECT cell, t, v,
            p_up - least(0, CAST(min(p_up) OVER wp AS BIGINT)) AS s_up,
            p_dn - least(0, CAST(min(p_dn) OVER wp AS BIGINT)) AS s_dn
          FROM p WINDOW wp AS (PARTITION BY cell ORDER BY t ROWS
            BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT cell, t, v, s_up,
          CAST(CASE WHEN s_up > 600000 THEN 1 ELSE 0 END AS INTEGER)
            AS alarm_up,
          s_dn,
          CAST(CASE WHEN s_dn > 600000 THEN 1 ELSE 0 END AS INTEGER)
            AS alarm_dn
        FROM s ORDER BY cell, t""")),

    // ------------------------------------------------------------------
    // q253 — Benjamini–Hochberg FDR control (StatsOps.bhFdr) over TWO
    // independent families, each demonstrating a different contract:
    //  - 'dow_share' (m = 35): the REAL statistic — does event type
    //    et's weekday mix match the pooled corpus's (the generator's
    //    dow is NOT uniform, probed ~±20%, so the pooled share is the
    //    only honest null)? p is the distribution-free Chebyshev bound
    //    p = min(1, n·g·(T−g)/num²) with num = o·T − n·g — one integer
    //    division, no sqrt/erf, both engines exact. The fixture drops
    //    every even-id weekend 'purchase' row: those cells rank first
    //    (p ~ 2·10⁴ ppm at sf0.01) but Chebyshev's slack correctly
    //    HOLDS the 5% step-up line — the family reads zero
    //    discoveries, the honest readout for a conservative bound.
    //  - 'planted' (m = 35, same test ids): the q206 pseudo-model
    //    discipline — md5-uniform p-values with the 7 purchase tests
    //    planted in [0, 1400) ppm, far inside the rank-k thresholds
    //    (α·i/m ≈ 1429·i), the 28 nulls uniform on [0, 10⁶). The
    //    step-up boundary provably discovers exactly the planted
    //    seven at EVERY sf — discrimination demonstrated, and the
    //    two families prove per-family isolation in one gated result.
    // ------------------------------------------------------------------
    "q253_bh_fdr" -> GraftQuery(
      build = (s, d) => {
        val base = events(s, d)
          .select(col("event_type").as("et"), col("event_id"),
            expr("((ts div 86400000000000) + 4) % 7").as("dow"))
          .filter(!(col("et") === "purchase" &&
            col("dow").isin(0L, 6L) && col("event_id") % 2 === 0))
        val o = base.groupBy(col("et"), col("dow"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint(true)
        val t = o.groupBy(col("et")).agg(sum(col("o")).as("n"))
        val g = o.groupBy(col("dow")).agg(sum(col("o")).as("gd"))
        val tot = o.agg(sum(col("o")).as("tot"))
        val real = o.join(t, Seq("et")).join(g, Seq("dow"))
          .crossJoin(broadcast(tot))
          .withColumn("num", expr(
            "cast(o as decimal(38,0)) * tot - cast(n as decimal(38,0)) * gd"))
          .select(lit("dow_share").as("fam"),
            concat(col("et"), lit("_"), col("dow")).as("test"),
            when(col("num") === 0, 1000000L)
              .otherwise(least(lit(1000000L), expr(
                """cast((1000000 * cast(n as decimal(38,0)) * gd *
                     (tot - gd)) div (num * num) as bigint)""")))
              .as("p_ppm"))
        val planted = o
          .select(lit("planted").as("fam"),
            concat(col("et"), lit("_"), col("dow")).as("test"),
            col("et"))
          .withColumn("h", graft.operators.TextDedup.hash64(
            concat(lit("bh"), col("test"))))
          .select(col("fam"), col("test"),
            when(col("et") === "purchase", col("h") % 1400L)
              .otherwise(col("h") % 1000000L).as("p_ppm"))
        StatsOps.bhFdr(real.unionByName(planted), "fam", "test",
            "p_ppm", 50000L)
          .orderBy("cell", "rnk")
      },
      oracle = Some("""
        WITH base AS (SELECT event_type AS et, event_id,
            ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow FROM events),
        f AS (SELECT * FROM base WHERE NOT (et = 'purchase'
          AND dow IN (0, 6) AND event_id % 2 = 0)),
        o AS (SELECT et, dow, CAST(count(*) AS BIGINT) AS o
          FROM f GROUP BY 1, 2),
        t AS (SELECT et, CAST(sum(o) AS BIGINT) AS n FROM o GROUP BY 1),
        g AS (SELECT dow, CAST(sum(o) AS BIGINT) AS gd
          FROM o GROUP BY 1),
        nn AS (SELECT CAST(sum(o) AS BIGINT) AS tot FROM o),
        realf AS (SELECT 'dow_share' AS cell,
            et || '_' || dow AS test,
            CASE WHEN CAST(o.o AS HUGEINT) * nn.tot -
                CAST(t.n AS HUGEINT) * g.gd = 0 THEN 1000000
              ELSE least(1000000,
                CAST((1000000 * CAST(t.n AS HUGEINT) * g.gd *
                    (nn.tot - g.gd)) //
                  ((CAST(o.o AS HUGEINT) * nn.tot -
                      CAST(t.n AS HUGEINT) * g.gd) *
                   (CAST(o.o AS HUGEINT) * nn.tot -
                      CAST(t.n AS HUGEINT) * g.gd))
                  AS BIGINT)) END AS p_ppm
          FROM o JOIN t USING (et) JOIN g USING (dow), nn),
        plant AS (SELECT 'planted' AS cell, et || '_' || dow AS test,
            CASE WHEN et = 'purchase'
              THEN CAST(('0x' || substr(md5('bh' || et || '_' || dow),
                1, 15)) AS BIGINT) % 1400
              ELSE CAST(('0x' || substr(md5('bh' || et || '_' || dow),
                1, 15)) AS BIGINT) % 1000000 END AS p_ppm
          FROM o),
        p AS (SELECT * FROM realf UNION ALL SELECT * FROM plant),
        r AS (SELECT cell, test, p_ppm,
            row_number() OVER (PARTITION BY cell
              ORDER BY p_ppm, test) AS rnk,
            count(*) OVER (PARTITION BY cell) AS m FROM p),
        k AS (SELECT cell, max(CASE WHEN CAST(p_ppm AS HUGEINT) * m <=
              50000 * CAST(rnk AS HUGEINT) THEN rnk ELSE 0 END) AS kstar
          FROM r GROUP BY 1),
        a AS (SELECT r.cell, r.test, r.p_ppm, r.rnk, r.m,
            CAST(min(least(1000000,
              (CAST(p_ppm AS HUGEINT) * m) // rnk)) OVER (
                PARTITION BY r.cell ORDER BY rnk ROWS BETWEEN CURRENT
                ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS p_adj_ppm,
            k.kstar
          FROM r JOIN k ON r.cell = k.cell)
        SELECT cell, test, p_ppm, CAST(rnk AS BIGINT) AS rnk,
          CAST(m AS BIGINT) AS m, p_adj_ppm,
          CAST(CASE WHEN rnk <= kstar THEN 1 ELSE 0 END AS INTEGER)
            AS discovery
        FROM a ORDER BY cell, rnk""")),

    // ------------------------------------------------------------------
    // q254 — r×c χ² independence + Cramér's V (StatsOps
    // .chiSquareIndependence): "is order status associated with
    // priority, per region" — the 3×5 generalization q103's 2×2 can't
    // express, effect size included. The star joins (orders→customer→
    // nation→region) are the operator's real scan path; the synthetic
    // columns are independent by construction (probed V ≈ 0), so the
    // fixture INJECTS dependence both engines replay: in ASIA every
    // 'F' order's priority is overwritten to '1-URGENT', welding one
    // status row of the grid to one priority column — ASIA reads
    // chi2 » 0 / V ≈ 0.45 while the other four regions sit at the
    // null — the test discriminates, not just hash-matches.
    // ------------------------------------------------------------------
    "q254_chi_square_rxc" -> GraftQuery(
      build = (s, d) => {
        val j = orders(s, d)
          .select(col("o_custkey"), col("o_orderstatus"),
            col("o_orderpriority"))
          .join(customer(s, d).select(col("c_custkey"),
            col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(nation(s, d).select(col("n_nationkey"),
            col("n_regionkey")),
            col("c_nationkey") === col("n_nationkey"))
          .join(region(s, d).select(col("r_regionkey"), col("r_name")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("r_name").as("reg"),
            col("o_orderstatus").as("st"),
            when(col("r_name") === "ASIA" &&
              col("o_orderstatus") === "F", "1-URGENT")
              .otherwise(col("o_orderpriority")).as("pr"))
        StatsOps.chiSquareIndependence(j, "reg", "st", "pr")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH j AS (SELECT r_name AS cell, o_orderstatus AS x,
            CASE WHEN r_name = 'ASIA' AND o_orderstatus = 'F'
              THEN '1-URGENT' ELSE o_orderpriority END AS y
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey),
        cxy AS (SELECT cell, x, y, CAST(count(*) AS BIGINT) AS o
          FROM j GROUP BY 1, 2, 3),
        rx AS (SELECT cell, x, CAST(sum(o) AS BIGINT) AS rt
          FROM cxy GROUP BY 1, 2),
        cy AS (SELECT cell, y, CAST(sum(o) AS BIGINT) AS ct
          FROM cxy GROUP BY 1, 2),
        nn AS (SELECT cell, CAST(sum(o) AS BIGINT) AS n,
            CAST(count(DISTINCT x) AS BIGINT) AS r,
            CAST(count(DISTINCT y) AS BIGINT) AS c
          FROM cxy GROUP BY 1),
        tm AS (SELECT cxy.cell,
            CAST((1000 * CAST(nn.n AS HUGEINT) * cxy.o * cxy.o) //
              (CAST(rx.rt AS HUGEINT) * cy.ct) AS BIGINT) AS term
          FROM cxy
          JOIN rx ON cxy.cell = rx.cell AND cxy.x = rx.x
          JOIN cy ON cxy.cell = cy.cell AND cxy.y = cy.y
          JOIN nn ON cxy.cell = nn.cell),
        ag AS (SELECT tm.cell, greatest(0,
            CAST(sum(CAST(term AS HUGEINT)) AS BIGINT) -
              1000 * max(nn.n)) AS chi2_milli
          FROM tm JOIN nn ON tm.cell = nn.cell GROUP BY 1)
        SELECT ag.cell, nn.n, nn.r, nn.c,
          (nn.r - 1) * (nn.c - 1) AS dof, ag.chi2_milli,
          CASE WHEN (nn.r - 1) * (nn.c - 1) > 0 AND
              (1000 * CAST(ag.chi2_milli AS HUGEINT)) //
                (CAST(nn.n AS HUGEINT) * least(nn.r - 1, nn.c - 1))
                < 9007199254740992
            THEN CAST(floor(sqrt(CAST(
              (1000 * CAST(ag.chi2_milli AS HUGEINT)) //
                (CAST(nn.n AS HUGEINT) * least(nn.r - 1, nn.c - 1))
              AS DOUBLE))) AS BIGINT) END AS v_milli
        FROM ag JOIN nn ON ag.cell = nn.cell ORDER BY ag.cell""")),

    // ------------------------------------------------------------------
    // q255 — isotonic calibration / PAV (StatsOps.isotonicCalibration)
    // on the q206 pseudo-model geometry: md5-uniform scores binned to
    // deciles, labels drawn by an independent md5 stream — but at the
    // NON-MONOTONE per-bin rates IsoThresh (‰), so the raw reliability
    // curve provably dips at bins 2/4/6/8 (bins run 0–9) and PAV has real
    // violators to pool (a calibrated fixture would make the minimax a
    // no-op). fitted_ppm must be non-decreasing per cell — readable in
    // the gated output, asserted as a property in the spec. The 'cal'
    // cohort keeps labels at the bin's own rate for contrast.
    // ------------------------------------------------------------------
    "q255_isotonic_pav" -> GraftQuery(
      build = (s, d) => {
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("event_id").cast("string"))) % 1000000L
        val base = events(s, d).select(col("event_id"))
          .withColumn("s0", h("cal"))
          .withColumn("bin", expr("s0 div 100000"))
          .withColumn("u", h("lab"))
        val warped = base.select(lit("warped").as("cohort"), col("bin"),
          when(col("u") < isoThreshExpr(col("bin")) * 1000L, 1L)
            .otherwise(0L).as("y"))
        val cal = base.select(lit("calibrated").as("cohort"), col("bin"),
          when(col("u") < col("bin") * 100000L + 50000L, 1L)
            .otherwise(0L).as("y"))
        StatsOps.isotonicCalibration(warped.unionByName(cal),
            "cohort", "bin", "y")
          .orderBy("cell", "bin")
      },
      oracle = Some(s"""
        WITH sc AS (SELECT
            CAST(('0x' || substr(md5('cal' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 // 100000 AS bin,
            CAST(('0x' || substr(md5('lab' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 AS u
          FROM events),
        co AS (SELECT 'warped' AS cell, bin,
            CASE WHEN u < ($IsoThreshSql) * 1000 THEN 1 ELSE 0 END AS y
          FROM sc
          UNION ALL
          SELECT 'calibrated', bin,
            CASE WHEN u < bin * 100000 + 50000 THEN 1 ELSE 0 END
          FROM sc),
        bins AS (SELECT cell, bin, CAST(count(*) AS BIGINT) AS w,
            CAST(sum(y) AS BIGINT) AS s FROM co GROUP BY 1, 2),
        idx AS (SELECT cell, bin, w, s,
            row_number() OVER (PARTITION BY cell ORDER BY bin) AS i,
            CAST(sum(w) OVER wc AS BIGINT) AS cw,
            CAST(sum(s) OVER wc AS BIGINT) AS cs
          FROM bins WINDOW wc AS (PARTITION BY cell ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        pr AS (SELECT lo.cell, lo.i AS j, hi.i AS k,
            CAST((1000000 * CAST(hi.cs - (lo.cs - lo.s) AS HUGEINT)) //
              (hi.cw - (lo.cw - lo.w)) AS BIGINT) AS f
          FROM idx lo JOIN idx hi
            ON lo.cell = hi.cell AND lo.i <= hi.i),
        g AS (SELECT cell, j, k,
            CAST(min(f) OVER (PARTITION BY cell, j ORDER BY k
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS BIGINT) AS g
          FROM pr),
        fit AS (SELECT cell, k AS i, max(g) AS fitted_ppm
          FROM g GROUP BY 1, 2)
        SELECT idx.cell, idx.bin, idx.w AS n, idx.s AS pos,
          (1000000 * idx.s) // idx.w AS raw_ppm, fit.fitted_ppm
        FROM idx JOIN fit ON idx.cell = fit.cell AND idx.i = fit.i
        ORDER BY idx.cell, idx.bin""")),

    // ------------------------------------------------------------------
    // q256 — Brier-score decomposition (StatsOps.brierDecomposition)
    // on the same pseudo-model pair: both cohorts STATE the decile
    // midpoint as their forecast; 'calibrated' draws labels at exactly
    // that rate (REL ≈ the sampling floor, RES = the midpoint spread),
    // 'warped' draws at the IsoThresh rates (REL reads the injected
    // miscalibration that q255's PAV removes — the two queries tell
    // one story). The Murphy identity REL − RES + UNC is emitted as
    // brier_ppm_sq, READ not asserted.
    // ------------------------------------------------------------------
    "q256_brier_decomposition" -> GraftQuery(
      build = (s, d) => {
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("event_id").cast("string"))) % 1000000L
        val base = events(s, d).select(col("event_id"))
          .withColumn("s0", h("cal"))
          .withColumn("bin", expr("s0 div 100000"))
          .withColumn("u", h("lab"))
          .withColumn("p", col("bin") * 100000L + 50000L)
        val warped = base.select(lit("warped").as("cohort"), col("bin"),
          col("p"),
          when(col("u") < isoThreshExpr(col("bin")) * 1000L, 1L)
            .otherwise(0L).as("y"))
        val cal = base.select(lit("calibrated").as("cohort"), col("bin"),
          col("p"),
          when(col("u") < col("p"), 1L).otherwise(0L).as("y"))
        StatsOps.brierDecomposition(warped.unionByName(cal),
            "cohort", "bin", "p", "y")
          .orderBy("cell")
      },
      oracle = Some(s"""
        WITH sc AS (SELECT
            CAST(('0x' || substr(md5('cal' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 // 100000 AS bin,
            CAST(('0x' || substr(md5('lab' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 AS u
          FROM events),
        wp AS (SELECT bin, bin * 100000 + 50000 AS p, u FROM sc),
        co AS (SELECT 'warped' AS cell, bin, p,
            CASE WHEN u < ($IsoThreshSql) * 1000 THEN 1 ELSE 0 END AS y
          FROM wp
          UNION ALL
          SELECT 'calibrated', bin, p,
            CASE WHEN u < p THEN 1 ELSE 0 END FROM wp),
        bins AS (SELECT cell, bin, p, CAST(count(*) AS BIGINT) AS w,
            CAST(sum(y) AS BIGINT) AS s FROM co GROUP BY 1, 2, 3),
        base AS (SELECT cell, CAST(sum(w) AS BIGINT) AS nw,
            CAST(sum(s) AS BIGINT) AS ns,
            (1000000 * CAST(sum(s) AS BIGINT)) //
              CAST(sum(w) AS BIGINT) AS base_ppm
          FROM bins GROUP BY 1),
        terms AS (SELECT bins.cell, bins.w,
            (CAST(bins.p AS HUGEINT) * bins.w - 1000000 * bins.s) *
              (CAST(bins.p AS HUGEINT) * bins.w - 1000000 * bins.s)
              // bins.w AS rel_t,
            (1000000 * CAST(bins.s AS HUGEINT) -
              base.base_ppm * bins.w) *
              (1000000 * CAST(bins.s AS HUGEINT) -
                base.base_ppm * bins.w) // bins.w AS res_t
          FROM bins JOIN base ON bins.cell = base.cell),
        ag AS (SELECT terms.cell,
            CAST(sum(rel_t) // max(base.nw) AS BIGINT) AS rel_ppm_sq,
            CAST(sum(res_t) // max(base.nw) AS BIGINT) AS res_ppm_sq
          FROM terms JOIN base ON terms.cell = base.cell GROUP BY 1)
        SELECT base.cell, base.nw AS n, base.base_ppm, ag.rel_ppm_sq,
          ag.res_ppm_sq,
          CAST(CAST(base.base_ppm AS HUGEINT) *
            (1000000 - base.base_ppm) AS BIGINT) AS unc_ppm_sq,
          ag.rel_ppm_sq - ag.res_ppm_sq +
            CAST(CAST(base.base_ppm AS HUGEINT) *
              (1000000 - base.base_ppm) AS BIGINT) AS brier_ppm_sq
        FROM base JOIN ag ON base.cell = ag.cell
        ORDER BY base.cell""")),

    // ------------------------------------------------------------------
    // q258 — Kruskal–Wallis k-sample rank test (StatsOps.kruskalWallis):
    // the omnibus "did ANY event type's value distribution shift" gate
    // per day-of-week cell, on the exact doubled-midrank lattice. The
    // fixture warps ONE stratum — Saturday purchases shifted +50 units
    // (5000 cents) — so the dow=6 cell reads H ≈ 233 at sf0.01 while
    // the other six sit under the χ²₄ 5% line (≈ 9.5); duplicate cents
    // put real mass in tie_t (READ > 0 every cell) even where the
    // floored corrected statistic coincides with the raw one.
    // Only (cell, grp, value) count rows ever shuffle.
    // ------------------------------------------------------------------
    "q258_kruskal_wallis" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .withColumn("dow", expr("((ts div 86400000000000) + 4) % 7"))
          .withColumn("cents",
            expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)" +
              " div 100") +
              when(col("event_type") === "purchase" && col("dow") === 6L,
                5000L).otherwise(0L))
        graft.operators.StatsOps.kruskalWallis(ev, "dow", "event_type",
            "cents")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH ev AS (SELECT
            ((epoch_us(ts) // 86400000000) + 4) % 7 AS cell,
            event_type AS grp,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) // 100 +
              CASE WHEN event_type = 'purchase'
                AND ((epoch_us(ts) // 86400000000) + 4) % 7 = 6
                THEN 5000 ELSE 0 END AS v
          FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        gvc AS (SELECT cell, grp, v, CAST(count(*) AS BIGINT) AS cnt
          FROM ev GROUP BY 1, 2, 3),
        cv AS (SELECT cell, v, CAST(sum(cnt) AS BIGINT) AS t,
            coalesce(sum(sum(cnt)) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cb
          FROM gvc GROUP BY cell, v),
        gs AS (SELECT gvc.cell, gvc.grp,
            CAST(sum(cnt) AS BIGINT) AS ni,
            sum(CAST(cnt AS HUGEINT) * (2 * cb + t + 1)) AS s2
          FROM gvc JOIN cv ON gvc.cell = cv.cell AND gvc.v = cv.v
          GROUP BY 1, 2),
        ties AS (SELECT cell,
            sum(CAST(t AS HUGEINT) * t * t - t) AS tie_t
          FROM cv GROUP BY 1),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(ni) AS BIGINT) AS n,
            sum((3000 * s2 * s2) // ni) AS hs
          FROM gs GROUP BY 1)
        SELECT ag.cell, ag.k, ag.n, ag.k - 1 AS dof,
          CAST(ties.tie_t AS BIGINT) AS tie_t,
          greatest(0, CAST(hs // (CAST(n AS HUGEINT) * (n + 1)) -
            3000 * (n + 1) AS BIGINT)) AS h_milli,
          CASE WHEN CAST(n AS HUGEINT) * n * n - n - ties.tie_t > 0
            THEN CAST((CAST(greatest(0,
                CAST(hs // (CAST(n AS HUGEINT) * (n + 1)) -
                  3000 * (n + 1) AS BIGINT)) AS HUGEINT) *
                (CAST(n AS HUGEINT) * n * n - n)) //
              (CAST(n AS HUGEINT) * n * n - n - ties.tie_t) AS BIGINT)
            END AS h_tie_milli
        FROM ag JOIN ties ON ag.cell = ties.cell
        ORDER BY ag.cell""")),

    // ------------------------------------------------------------------
    // q259 — Cliff's delta ordinal effect size (StatsOps.cliffsDelta):
    // how strongly BUILDING customers' balances dominate MACHINERY's,
    // per nation-bucket cell — the sample-size-free companion q195's z
    // lacks. gt + lt + ties = n_a·n_b is emitted to be READ (the
    // pair-accounting identity). The fixture warps bucket 0's BUILDING
    // balances +5000 units (~45% of the balance range): that cell
    // reads δ ≈ +0.79 'large' at sf0.01, the other four 'negligible'
    // — the readout discriminates, not just hash-matches (at sf0.001
    // the ~6-per-group cells are noisier, as δ honestly is). Sign is
    // applied AFTER the
    // magnitude floor so Spark's truncating div and DuckDB's flooring
    // // agree on negative deltas.
    // ------------------------------------------------------------------
    "q259_cliffs_delta" -> GraftQuery(
      build = (s, d) => {
        val cu = customer(s, d)
          .withColumn("bucket", col("c_nationkey").cast("long") % 5)
          .withColumn("cents",
            expr("cast(cast(c_acctbal as decimal(18,4)) * 10000 " +
              "as bigint) div 100") +
              when(col("c_mktsegment") === "BUILDING" &&
                col("c_nationkey") % 5 === 0, 500000L).otherwise(0L))
        graft.operators.StatsOps.cliffsDelta(cu, "bucket",
            "c_mktsegment", "BUILDING", "MACHINERY", "cents")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH cu AS (SELECT CAST(c_nationkey % 5 AS BIGINT) AS cell,
            c_mktsegment AS grp,
            CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 100 +
              CASE WHEN c_mktsegment = 'BUILDING'
                AND c_nationkey % 5 = 0 THEN 500000 ELSE 0 END AS v
          FROM customer
          WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
            AND c_acctbal IS NOT NULL),
        vc AS (SELECT cell, v,
            CAST(sum(CASE WHEN grp = 'BUILDING' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
            CAST(sum(CASE WHEN grp = 'MACHINERY' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
          FROM cu GROUP BY 1, 2),
        wv AS (SELECT cell, v, a, b,
            coalesce(sum(b) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS b_less,
            sum(b) OVER (PARTITION BY cell) AS nb
          FROM vc),
        ag AS (SELECT cell, CAST(sum(a) AS BIGINT) AS n_a,
            CAST(max(nb) AS BIGINT) AS n_b,
            sum(CAST(a AS HUGEINT) * b_less) AS gt_d,
            sum(CAST(a AS HUGEINT) * (nb - b_less - b)) AS lt_d,
            sum(CAST(a AS HUGEINT) * b) AS ties_d
          FROM wv GROUP BY 1),
        de AS (SELECT cell, n_a, n_b,
            CAST(gt_d AS BIGINT) AS gt, CAST(lt_d AS BIGINT) AS lt,
            CAST(ties_d AS BIGINT) AS ties,
            CASE WHEN n_a > 0 AND n_b > 0 THEN
              CAST(CASE WHEN gt_d < lt_d THEN -1 ELSE 1 END *
                ((1000000 * abs(gt_d - lt_d)) //
                  (CAST(n_a AS HUGEINT) * n_b)) AS BIGINT) END
              AS delta_ppm
          FROM ag)
        SELECT cell, n_a, n_b, gt, lt, ties, delta_ppm,
          CASE WHEN delta_ppm IS NULL THEN NULL
            WHEN abs(delta_ppm) < 147000 THEN 'negligible'
            WHEN abs(delta_ppm) < 330000 THEN 'small'
            WHEN abs(delta_ppm) < 474000 THEN 'medium'
            ELSE 'large' END AS magnitude
        FROM de ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q260 — Brown–Forsythe variance-homogeneity test (StatsOps
    // .brownForsythe): did one user-shard's DISPERSION blow out, per
    // event type group — the spread-reading companion to q258's shift
    // test, on |v − group-median| deviations (exact lower medians, the
    // q203 rule). The fixture doubles shard 2's 'error' values: the
    // location tests barely move (median doubles but so does the
    // order), while the deviation mass in that group blows out and
    // shard 2's F reads far above shards 0/1 — variance sensitivity
    // demonstrated where a shift test would be blind.
    // ------------------------------------------------------------------
    "q260_brown_forsythe" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .withColumn("shard", col("user_id") % 3)
          .withColumn("cents",
            expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)" +
              " div 100") *
              when(col("event_type") === "error" &&
                col("user_id") % 3 === 2, 2L).otherwise(1L))
        graft.operators.StatsOps.brownForsythe(ev, "shard",
            "event_type", "cents")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH ev AS (SELECT user_id % 3 AS cell, event_type AS grp,
            (CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 100) *
              CASE WHEN event_type = 'error' AND user_id % 3 = 2
                THEN 2 ELSE 1 END AS v
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL),
        gvc AS (SELECT cell, grp, v, CAST(count(*) AS BIGINT) AS cnt
          FROM ev GROUP BY 1, 2, 3),
        cum AS (SELECT cell, grp, v, cnt,
            sum(cnt) OVER (PARTITION BY cell, grp ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(cnt) OVER (PARTITION BY cell, grp) AS nw
          FROM gvc),
        med AS (SELECT cell, grp, min(v) AS med FROM cum
          WHERE cum * 2 >= nw GROUP BY 1, 2),
        gm AS (SELECT gvc.cell, gvc.grp,
            CAST(sum(cnt) AS BIGINT) AS ni,
            sum(CAST(cnt AS HUGEINT) * abs(v - med)) AS zi,
            sum(CAST(cnt AS HUGEINT) * abs(v - med) * abs(v - med))
              AS z2i
          FROM gvc JOIN med
            ON gvc.cell = med.cell AND gvc.grp = med.grp
          GROUP BY 1, 2),
        tot AS (SELECT cell, CAST(sum(ni) AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS k, sum(zi) AS zt
          FROM gm GROUP BY 1),
        terms AS (SELECT gm.cell,
            (1000 * (CAST(tot.n AS HUGEINT) * zi - ni * tot.zt) *
              (CAST(tot.n AS HUGEINT) * zi - ni * tot.zt)) //
              (CAST(ni AS HUGEINT) * tot.n * tot.n) AS ssb_t,
            (1000 * (CAST(ni AS HUGEINT) * z2i - zi * zi)) // ni
              AS ssw_t
          FROM gm JOIN tot ON gm.cell = tot.cell),
        ag AS (SELECT terms.cell, max(tot.n) AS n, max(tot.k) AS k,
            sum(ssb_t) AS ssb, sum(ssw_t) AS ssw
          FROM terms JOIN tot ON terms.cell = tot.cell GROUP BY 1)
        SELECT cell, CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
          CAST(ssb AS BIGINT) AS ssb_milli,
          CAST(ssw AS BIGINT) AS ssw_milli,
          CASE WHEN k > 1 AND ssw > 0
            THEN CAST((1000 * (n - k) * ssb) //
              (CAST(k - 1 AS HUGEINT) * ssw) AS BIGINT) END AS f_milli
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q265 — Wald SPRT, Bernoulli (StatsOps.sprtBernoulli): offline
    // evaluation of the SEQUENTIAL test over each event type's
    // recorded conversion stream — "when would the experiment have
    // stopped, and with which call". Design H₀ p=0.30 vs H₁ p=0.40 at
    // α=β=5%; success thresholds are engineered per the quantile
    // probe so BOTH calls occur in the gated result: purchase converts
    // at ~50% (value ≥ its median, 34) → accept H₁; every other type
    // converts at ~20% (value ≥ its ~80th pct, 82) → accept H₀ — each
    // decided in tens-to-hundreds of trials where the fixed-n tests
    // read the full corpus. The walk constants are the SHARED Q20
    // lattice literals (SprtA/B/Up/Lo); (ts, event_id) is the total
    // trial order, so "first crossing" is defined identically in both
    // engines. One cell-keyed window exchange touches facts.
    // ------------------------------------------------------------------
    "q265_sprt_sequential" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .withColumn("succ",
            (col("value") >=
              when(col("event_type") === "purchase", 34.0)
                .otherwise(82.0)).cast("int"))
        graft.operators.StatsOps.sprtBernoulli(ev, "event_type", "ts",
            "event_id", "succ", SprtP0, SprtP1)
          .orderBy("cell")
      },
      oracle = Some(s"""
        WITH base AS (SELECT event_type AS cell, epoch_us(ts) AS o1,
            event_id AS o2,
            CASE WHEN value >= (CASE WHEN event_type = 'purchase'
              THEN 34.0 ELSE 82.0 END) THEN 1 ELSE 0 END AS succ
          FROM events WHERE value IS NOT NULL),
        walk AS (SELECT cell, succ,
            CAST(row_number() OVER (PARTITION BY cell
              ORDER BY o1, o2) AS BIGINT) AS t,
            CAST(sum(succ) OVER (PARTITION BY cell ORDER BY o1, o2
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS s_t
          FROM base),
        lw AS (SELECT cell, t, s_t,
            s_t * $SprtA + (t - s_t) * $SprtB AS llr
          FROM walk),
        cross1 AS (SELECT cell, t, s_t, llr,
            row_number() OVER (PARTITION BY cell ORDER BY t) AS rnk
          FROM lw WHERE llr >= $SprtUp OR llr <= $SprtLo),
        dec AS (SELECT cell, t, s_t, llr FROM cross1 WHERE rnk = 1),
        tot AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(succ) AS BIGINT) AS s
          FROM base GROUP BY 1)
        SELECT tot.cell, tot.n, tot.s,
          CASE WHEN dec.llr IS NULL THEN 'continue'
            WHEN dec.llr >= $SprtUp THEN 'h1' ELSE 'h0' END AS decision,
          dec.t AS n_dec, dec.s_t AS s_dec, dec.llr AS llr_dec_q20,
          CAST($SprtUp AS BIGINT) AS bound_q20
        FROM tot LEFT JOIN dec ON tot.cell = dec.cell
        ORDER BY tot.cell""")),

    // ------------------------------------------------------------------
    // q266 — Jonckheere–Terpstra ordered trend (StatsOps
    // .jonckheereTerpstra): does order value shift MONOTONICALLY with
    // priority tier, per status cell — the dose-response question
    // q258's omnibus can't ask. Build side rides the SHARED
    // contingencyPairs grid double-prefix (JT = kendallTauB's
    // concordant count with x = tier ordinal); the oracle is
    // INDEPENDENTLY formulated as the direct pairwise product sum over
    // the (tier, bin) count frame (the q247 discipline), so the two
    // engines prove the identity, not the code. Fixture warps cell 'F'
    // by +1000 bins per tier step (a fifth of the ~5000-bin spread —
    // probed: the raw data itself carries a mild natural trend,
    // 514–534k ppm in every cell): F reads jt_ppm ≈ 0.81·10⁶ vs the
    // others' honest natural imbalance, so MAGNITUDE separates the
    // planted dose-response from background, as it should.
    // ------------------------------------------------------------------
    "q266_jonckheere_trend" -> GraftQuery(
      build = (s, d) => {
        val pr = orders(s, d)
          .withColumn("xord",
            expr("cast(substr(o_orderpriority, 1, 1) as long)"))
          .withColumn("bin",
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 " +
              "as bigint) div 1000000") +
              when(col("o_orderstatus") === "F", col("xord") * 1000L)
                .otherwise(0L))
        graft.operators.StatsOps.jonckheereTerpstra(pr,
            "o_orderstatus", "xord", "bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH pr AS (SELECT o_orderstatus AS cell,
            CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS x,
            CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 1000000 +
              CASE WHEN o_orderstatus = 'F'
                THEN 1000 * CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
                ELSE 0 END AS y
          FROM orders),
        c AS (SELECT cell, x, y, CAST(count(*) AS HUGEINT) AS n
          FROM pr GROUP BY 1, 2, 3),
        cells AS (SELECT cell, CAST(count(DISTINCT x) AS BIGINT) AS k,
            CAST(sum(n) AS BIGINT) AS n
          FROM c GROUP BY 1),
        conc AS (SELECT a.cell, sum(a.n * b.n) AS cc
          FROM c a JOIN c b ON a.cell = b.cell AND a.x < b.x
            AND a.y < b.y GROUP BY 1),
        tie AS (SELECT a.cell, sum(a.n * b.n) AS tt
          FROM c a JOIN c b ON a.cell = b.cell AND a.x < b.x
            AND a.y = b.y GROUP BY 1),
        mp AS (SELECT a.cell, sum(a.n * b.n) AS m
          FROM c a JOIN c b ON a.cell = b.cell AND a.x < b.x
          GROUP BY 1),
        ag AS (SELECT cells.cell, cells.k, cells.n,
            CAST(2 * coalesce(conc.cc, 0) + coalesce(tie.tt, 0)
              AS BIGINT) AS jt2,
            CAST(2 * coalesce(mp.m, 0) AS BIGINT) AS max_pairs2
          FROM cells
          LEFT JOIN conc ON cells.cell = conc.cell
          LEFT JOIN tie ON cells.cell = tie.cell
          LEFT JOIN mp ON cells.cell = mp.cell)
        SELECT cell, k, n, jt2, max_pairs2,
          CASE WHEN max_pairs2 > 0 THEN
            CAST((1000000 * CAST(jt2 AS HUGEINT)) // max_pairs2
              AS BIGINT) END AS jt_ppm,
          CASE WHEN max_pairs2 = 0 THEN NULL
            WHEN (1000000 * CAST(jt2 AS HUGEINT)) // max_pairs2 > 500000
              THEN 'increasing'
            WHEN (1000000 * CAST(jt2 AS HUGEINT)) // max_pairs2 < 500000
              THEN 'decreasing'
            ELSE 'flat' END AS trend
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q267 — Friedman blocked-rank test (StatsOps.friedman): the
    // repeated-measures complement of q258's KW — per customer-bucket
    // block, the five order priorities' spend totals ranked WITHIN the
    // block, so between-customer spend variation (which would drown
    // the effect in KW) cancels. The fixture warps cell 0's URGENT
    // totals +300 ($100k-bucket units): cell 0 reads Q far beyond the
    // χ²₄ 5% line, cells 1/2 sit near it. Coarse $100k value buckets
    // put real mass in tie_t; at sf0.001 (~2.5 orders per block-
    // priority) incomplete blocks genuinely occur and are counted in
    // n_dropped, not silently interpolated.
    // ------------------------------------------------------------------
    "q267_friedman" -> GraftQuery(
      build = (s, d) => {
        val bg = orders(s, d)
          .select(expr("o_custkey % 3").as("cell"),
            expr("(o_custkey div 3) % 40").as("block"),
            col("o_orderpriority").as("grp"),
            expr("cast(cast(o_totalprice as decimal(18,4)) * 10000 " +
              "as bigint)").as("cents"))
          .groupBy("cell", "block", "grp")
          .agg(expr("cast(sum(cents) as bigint) div 1000000000")
            .as("v0"))
          .withColumn("v", col("v0") +
            when(col("cell") === 0L && col("grp") === "1-URGENT", 300L)
              .otherwise(0L))
        graft.operators.StatsOps.friedman(bg, "cell", "block", "grp",
            "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH bg AS (SELECT o_custkey % 3 AS cell,
            (o_custkey // 3) % 40 AS block, o_orderpriority AS grp,
            sum(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
              AS BIGINT)) // 1000000000 +
              CASE WHEN o_custkey % 3 = 0 AND o_orderpriority = '1-URGENT'
                THEN 300 ELSE 0 END AS v
          FROM orders GROUP BY 1, 2, 3),
        kc AS (SELECT cell, CAST(count(DISTINCT grp) AS BIGINT) AS k
          FROM bg GROUP BY 1),
        bs AS (SELECT bg.cell, bg.block, count(*) AS nb,
            count(DISTINCT bg.grp) AS gb, max(kc.k) AS k
          FROM bg JOIN kc ON bg.cell = kc.cell GROUP BY 1, 2),
        drp AS (SELECT cell,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 0 ELSE 1 END)
              AS BIGINT) AS n_dropped,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_blocks
          FROM bs GROUP BY 1),
        kept AS (SELECT bg.cell, bg.block, bg.grp, bg.v FROM bg
          JOIN bs ON bg.cell = bs.cell AND bg.block = bs.block
          WHERE bs.nb = bs.k AND bs.gb = bs.k),
        bv AS (SELECT cell, block, v, CAST(count(*) AS BIGINT) AS t,
            coalesce(sum(count(*)) OVER (PARTITION BY cell, block
              ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
              1 PRECEDING), 0) AS cb
          FROM kept GROUP BY 1, 2, 3),
        r2 AS (SELECT kept.cell, kept.grp,
            sum(CAST(2 * bv.cb + bv.t + 1 AS HUGEINT)) AS r2j
          FROM kept JOIN bv ON kept.cell = bv.cell
            AND kept.block = bv.block AND kept.v = bv.v
          GROUP BY 1, 2),
        ties AS (SELECT cell, sum(CAST(t AS HUGEINT) * t * t - t)
            AS tie_t
          FROM bv GROUP BY 1),
        ra AS (SELECT cell, CAST(count(*) AS BIGINT) AS k,
            sum(r2j * r2j) AS ss
          FROM r2 GROUP BY 1),
        qm AS (SELECT drp.cell, ra.k, drp.n_blocks, drp.n_dropped,
            CAST(ties.tie_t AS BIGINT) AS tie_t,
            CASE WHEN drp.n_blocks > 0 THEN greatest(0,
              CAST((3000 * ra.ss) // (CAST(drp.n_blocks AS HUGEINT) *
                  ra.k * (ra.k + 1)) -
                3000 * drp.n_blocks * (ra.k + 1) AS BIGINT)) END
              AS q_milli,
            CAST(drp.n_blocks AS HUGEINT) * ra.k *
              (CAST(ra.k AS HUGEINT) * ra.k - 1) AS tden
          FROM drp
          LEFT JOIN ra ON drp.cell = ra.cell
          LEFT JOIN ties ON drp.cell = ties.cell)
        SELECT cell, k, n_blocks, n_dropped, tie_t, q_milli,
          CASE WHEN q_milli IS NOT NULL AND tden - tie_t > 0 THEN
            CAST((CAST(q_milli AS HUGEINT) * tden) // (tden - tie_t)
              AS BIGINT) END AS q_tie_milli
        FROM qm ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q268 — Wilcoxon signed-rank test (StatsOps.wilcoxonSignedRank):
    // the PAIRED complement of q195's MWU, per event-type cell, on
    // planted before/after pairs — after = before + hash noise in
    // {−2..2} (+3 extra for clicks). The click cell reads a strong
    // negative z (d = before − after centers on −3); the other four
    // sit near 0 on symmetric noise; noise = 0 pairs land in n_zero
    // (~20% of every cell — the zero-drop path is exercised, counted,
    // and read).
    // ------------------------------------------------------------------
    "q268_wilcoxon_signed_rank" -> GraftQuery(
      build = (s, d) => {
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("event_id").cast("string"))) % 1000000L
        val pr = events(s, d)
          .withColumn("a",
            expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)" +
              " div 100"))
          .withColumn("b", col("a") + (h("wsr") % 5L) - 2L +
            when(col("event_type") === "click", 3L).otherwise(0L))
        graft.operators.StatsOps.wilcoxonSignedRank(pr, "event_type",
            "a", "b")
          .withColumnRenamed("cell", "etype")
          .orderBy("etype")
      },
      oracle = Some("""
        WITH pr AS (SELECT event_type AS cell,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) // 100
              AS a,
            (CAST(('0x' || substr(md5('wsr' || CAST(event_id AS
              VARCHAR)), 1, 15)) AS BIGINT) % 1000000) % 5 - 2 +
              CASE WHEN event_type = 'click' THEN 3 ELSE 0 END AS shft
          FROM events WHERE value IS NOT NULL),
        dd AS (SELECT cell, -shft AS d FROM pr),
        zs AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_zero
          FROM dd GROUP BY 1),
        vc AS (SELECT cell, abs(d) AS ad, CAST(count(*) AS BIGINT) AS t,
            CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS pos
          FROM dd WHERE d <> 0 GROUP BY 1, 2),
        wv AS (SELECT cell, ad, t, pos,
            coalesce(sum(t) OVER (PARTITION BY cell ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cb
          FROM vc),
        ag AS (SELECT cell, CAST(sum(t) AS BIGINT) AS n,
            sum(CAST(pos AS HUGEINT) * (2 * cb + t + 1)) AS s2_plus,
            sum(CAST(t AS HUGEINT) * t * t - t) AS tie_t
          FROM wv GROUP BY 1),
        st AS (SELECT zs.cell, zs.n_pairs, zs.n_zero,
            coalesce(ag.n, 0) AS n,
            CAST(ag.s2_plus AS BIGINT) AS s2_plus,
            CAST(ag.tie_t AS BIGINT) AS tie_t,
            2 * ag.s2_plus - CAST(ag.n AS HUGEINT) * (ag.n + 1)
              AS num4,
            2 * CAST(ag.n AS HUGEINT) * (ag.n + 1) * (2 * ag.n + 1) -
              ag.tie_t AS den
          FROM zs LEFT JOIN ag ON zs.cell = ag.cell),
        rd AS (SELECT st.*, CASE WHEN den > 0 THEN
            (3000000 * num4 * num4) // den END AS rad FROM st)
        SELECT cell AS etype, n_pairs, n_zero, n, s2_plus, tie_t,
          CASE WHEN rad IS NOT NULL AND rad < 9007199254740992 THEN
            CAST(sign(num4) AS BIGINT) *
              CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) END
            AS z_milli
        FROM rd ORDER BY etype""")),

    // ------------------------------------------------------------------
    // q269 — McNemar paired-binary test (StatsOps.mcnemar): did the
    // "after" model change answers for the better — per event-type
    // cell, planted paired bits where the null cells flip 1→0 at 5%
    // of the 60% positive mass and 0→1 at 7.5% of the 40% negative
    // mass (discordance balanced in expectation — sampled χ² reads
    // 0.3–5.4 at sf0.01, hash noise honestly included) while purchase
    // flips 0→1 at 30% (c ≫ b, χ² ≈ 79, twenty times the χ²₁ 5% line).
    // Both the raw and the Edwards continuity-corrected statistic are
    // emitted so the correction's bite at these counts is READ.
    // ------------------------------------------------------------------
    "q269_mcnemar" -> GraftQuery(
      build = (s, d) => {
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("event_id").cast("string"))) % 1000000L
        val pr = events(s, d)
          .withColumn("x", when(h("mcx") < 600000L, 1L).otherwise(0L))
          .withColumn("hy", h("mcy"))
          .withColumn("y",
            when(col("x") === 1L,
              when(col("hy") < 50000L, 0L).otherwise(1L))
              .otherwise(when(col("hy") <
                when(col("event_type") === "purchase", 300000L)
                  .otherwise(75000L), 1L).otherwise(0L)))
        graft.operators.StatsOps.mcnemar(pr, "event_type", "x", "y")
          .withColumnRenamed("cell", "etype")
          .orderBy("etype")
      },
      oracle = Some("""
        WITH pr AS (SELECT event_type AS cell,
            CASE WHEN CAST(('0x' || substr(md5('mcx' ||
                CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                % 1000000 < 600000 THEN 1 ELSE 0 END AS x,
            CAST(('0x' || substr(md5('mcy' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 AS hy
          FROM events),
        xy AS (SELECT cell, x,
            CASE WHEN x = 1 THEN
                CASE WHEN hy < 50000 THEN 0 ELSE 1 END
              ELSE CASE WHEN hy < CASE WHEN cell = 'purchase'
                THEN 300000 ELSE 75000 END THEN 1 ELSE 0 END END AS y
          FROM pr),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_both,
            CAST(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_neither,
            CAST(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
            CAST(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c
          FROM xy GROUP BY 1)
        SELECT cell AS etype, n_pairs, n_both, n_neither, b, c,
          CASE WHEN b + c > 0 THEN
            CAST((1000 * CAST(b - c AS HUGEINT) * (b - c)) // (b + c)
              AS BIGINT) END AS chi2_milli,
          CASE WHEN b + c > 0 THEN
            CAST((1000 * CAST(greatest(abs(b - c) - 1, 0) AS HUGEINT) *
              greatest(abs(b - c) - 1, 0)) // (b + c) AS BIGINT) END
            AS chi2_cc_milli
        FROM ag ORDER BY etype""")),

    // ------------------------------------------------------------------
    // q270 — Cochran–Armitage trend test (StatsOps.cochranArmitage):
    // is the success rate MONOTONE in the ordered price bucket — the
    // 2×k trend question q254's omnibus χ² cannot answer (it ignores
    // level order). Success bits are hash-planted at 30% + 10% per
    // bucket for status O (a real rising trend, z ≫ 0) and flat 50%
    // for F/P (z near 0, either sign). Scores are the bucket ordinals
    // 0..4 (the q98 small-ordinal discipline keeps the decimal128
    // envelope at any N).
    // ------------------------------------------------------------------
    "q270_cochran_armitage" -> GraftQuery(
      build = (s, d) => {
        val h = graft.operators.TextDedup.hash64(
          concat(lit("ca"), col("o_orderkey").cast("string"))) % 1000L
        val pr = orders(s, d)
          .withColumn("score",
            least(expr("cast(cast(o_totalprice as decimal(18,4)) * " +
              "10000 as bigint) div 1000000000"), lit(4L)))
          .withColumn("succ",
            when(h < when(col("o_orderstatus") === "O",
              lit(300L) + col("score") * 100L).otherwise(500L), 1L)
              .otherwise(0L))
        graft.operators.StatsOps.cochranArmitage(pr, "o_orderstatus",
            "score", "succ")
          .withColumnRenamed("cell", "status")
          .orderBy("status")
      },
      oracle = Some("""
        WITH pr AS (SELECT o_orderstatus AS cell,
            least(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000
              AS BIGINT) // 1000000000, 4) AS s,
            CASE WHEN CAST(('0x' || substr(md5('ca' ||
                CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                % 1000 <
              CASE WHEN o_orderstatus = 'O' THEN 300 +
                100 * least(CAST(CAST(o_totalprice AS DECIMAL(18,4)) *
                  10000 AS BIGINT) // 1000000000, 4)
                ELSE 500 END
              THEN 1 ELSE 0 END AS succ
          FROM orders),
        lv AS (SELECT cell, s, CAST(count(*) AS BIGINT) AS ni,
            CAST(sum(succ) AS BIGINT) AS ri
          FROM pr GROUP BY 1, 2),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS k_levels,
            CAST(sum(ni) AS BIGINT) AS n, CAST(sum(ri) AS BIGINT) AS r,
            sum(CAST(s AS HUGEINT) * ni) AS sn,
            sum(CAST(s AS HUGEINT) * s * ni) AS s2n,
            sum(CAST(s AS HUGEINT) * ri) AS sr
          FROM lv GROUP BY 1),
        tn AS (SELECT cell, k_levels, n, r,
            sr * n - sn * r AS t_num,
            CAST(r AS HUGEINT) * (n - r) * (s2n * n - sn * sn) AS den
          FROM ag),
        rd AS (SELECT tn.*, CASE WHEN den > 0 THEN
            (1000000 * n * t_num * t_num) // den END AS rad FROM tn)
        SELECT cell AS status, k_levels, n, r,
          CAST(t_num AS BIGINT) AS t_num,
          CASE WHEN rad IS NOT NULL AND rad < 9007199254740992 THEN
            CAST(sign(t_num) AS BIGINT) *
              CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) END
            AS z_milli
        FROM rd ORDER BY status""")),

    // ------------------------------------------------------------------
    // q271 — Fleiss' kappa (StatsOps.fleissKappa): 3-annotator
    // agreement per source — the k-rater generalization of q183's
    // two-rater Cohen κ. Three hash-stream raters label each document
    // with its length quartile, corrupted to a random category at 6%
    // (even-numbered sources) or 40% (odd): even sources read κ near
    // 0.9, odd near 0.3 — the readout GRADES agreement rather than
    // hash-matching it. Docs with doc_id % 17 = 0 lose rater 3: the
    // incomplete-panel rows land in n_dropped (counted, never
    // interpolated).
    // ------------------------------------------------------------------
    "q271_fleiss_kappa" -> GraftQuery(
      build = (s, d) => {
        val base = documents(s, d)
          .select(col("doc_id"), col("source"),
            least(expr("n_chars div 150"), lit(3L)).as("truecat"),
            expr("cast(substring(source, 4, 10) as bigint)")
              .as("srcnum"))
          .select(col("*"), explode(expr("array(1L, 2L, 3L)")).as("r"))
          .filter(!(col("r") === 3L && col("doc_id") % 17 === 0))
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("r").cast("string"), lit("_"),
            col("doc_id").cast("string"))) % 1000L
        val rated = base
          .withColumn("noise",
            when(col("srcnum") % 2 === 0, 60L).otherwise(400L))
          .withColumn("cat",
            when(h("flk") < col("noise"), h("flc") % 4L)
              .otherwise(col("truecat")))
        graft.operators.StatsOps.fleissKappa(rated, "source",
            "doc_id", "cat", 3)
          .withColumnRenamed("cell", "source")
          .orderBy("source")
      },
      oracle = Some("""
        WITH docs AS (SELECT doc_id, source,
            least(n_chars // 150, 3) AS truecat,
            CAST(substring(source, 4) AS BIGINT) AS srcnum
          FROM documents),
        rt AS (SELECT doc_id, source, truecat, srcnum, r
          FROM docs, (SELECT unnest([1, 2, 3]) AS r)
          WHERE NOT (r = 3 AND doc_id % 17 = 0)),
        lab AS (SELECT source AS cell, doc_id AS item,
            CASE WHEN CAST(('0x' || substr(md5('flk' ||
                CAST(r AS VARCHAR) || '_' ||
                CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 <
              CASE WHEN srcnum % 2 = 0 THEN 60 ELSE 400 END
              THEN CAST(('0x' || substr(md5('flc' ||
                CAST(r AS VARCHAR) || '_' ||
                CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 4
              ELSE truecat END AS cat
          FROM rt),
        ic AS (SELECT cell, item, cat, CAST(count(*) AS BIGINT) AS nij
          FROM lab GROUP BY 1, 2, 3),
        it AS (SELECT cell, item, sum(nij) AS nr FROM ic GROUP BY 1, 2),
        drp AS (SELECT cell,
            CAST(sum(CASE WHEN nr = 3 THEN 0 ELSE 1 END) AS BIGINT)
              AS n_dropped,
            CAST(sum(CASE WHEN nr = 3 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_items
          FROM it GROUP BY 1),
        kept AS (SELECT ic.cell, ic.item, ic.cat, ic.nij FROM ic
          JOIN it ON ic.cell = it.cell AND ic.item = it.item
          WHERE it.nr = 3),
        mg AS (SELECT cell, sum(CAST(cj AS HUGEINT) * cj) AS c2 FROM
          (SELECT cell, cat, CAST(sum(nij) AS BIGINT) AS cj
           FROM kept GROUP BY 1, 2) GROUP BY 1),
        sq AS (SELECT cell, sum(CAST(nij AS HUGEINT) * nij) AS s2
          FROM kept GROUP BY 1),
        km AS (SELECT drp.cell, drp.n_items, drp.n_dropped,
            CAST(drp.n_items AS HUGEINT) * 3 AS nn, sq.s2, mg.c2
          FROM drp
          LEFT JOIN sq ON drp.cell = sq.cell
          LEFT JOIN mg ON drp.cell = mg.cell),
        kk AS (SELECT cell, n_items, n_dropped,
            CASE WHEN n_items > 0 THEN
              CAST((1000000 * (s2 - nn)) // (nn * 2) AS BIGINT) END
              AS p_bar_ppm,
            CASE WHEN n_items > 0 THEN
              CAST((1000000 * c2) // (nn * nn) AS BIGINT) END
              AS p_e_ppm,
            CASE WHEN n_items > 0 THEN
              CAST(n_items AS HUGEINT) * 3 * (s2 - nn) - c2 * 2 END
              AS knum,
            CASE WHEN n_items > 0 THEN (nn * nn - c2) * 2 END AS kden
          FROM km)
        SELECT cell AS source, n_items, CAST(3 AS BIGINT) AS n_raters,
          n_dropped, p_bar_ppm, p_e_ppm,
          CASE WHEN kden IS NOT NULL AND kden > 0 THEN
            CAST(CASE WHEN knum < 0 THEN -1 ELSE 1 END *
              ((1000000 * abs(knum)) // kden) AS BIGINT) END
            AS kappa_ppm
        FROM kk ORDER BY source""")),

    // ------------------------------------------------------------------
    // q272 — Dunn's post-hoc pairwise test (StatsOps.dunnTest) on
    // q258's exact fixture: KW's omnibus verdict said dow=6 shifted —
    // Dunn names the pairs, from the SAME cell-wide rank frame with
    // pooled variance (not pairwise MWU re-ranks). The four
    // purchase-vs-other pairs in dow=6 read |z| far beyond the
    // Bonferroni 5% line for 10 comparisons (≈ 2.81); every other
    // pair in every cell sits inside it. The two-stage radicand floor
    // is mirrored verbatim so the engines walk one lattice.
    // ------------------------------------------------------------------
    "q272_dunn_posthoc" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .withColumn("dow", expr("((ts div 86400000000000) + 4) % 7"))
          .withColumn("cents",
            expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)" +
              " div 100") +
              when(col("event_type") === "purchase" && col("dow") === 6L,
                5000L).otherwise(0L))
        graft.operators.StatsOps.dunnTest(ev, "dow", "event_type",
            "cents")
          .orderBy("cell", "grp_a", "grp_b")
      },
      oracle = Some("""
        WITH ev AS (SELECT
            ((epoch_us(ts) // 86400000000) + 4) % 7 AS cell,
            event_type AS grp,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) // 100 +
              CASE WHEN event_type = 'purchase'
                AND ((epoch_us(ts) // 86400000000) + 4) % 7 = 6
                THEN 5000 ELSE 0 END AS v
          FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL),
        gvc AS (SELECT cell, grp, v, CAST(count(*) AS BIGINT) AS cnt
          FROM ev GROUP BY 1, 2, 3),
        cv AS (SELECT cell, v, CAST(sum(cnt) AS BIGINT) AS t,
            coalesce(sum(sum(cnt)) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS cb
          FROM gvc GROUP BY cell, v),
        gs AS (SELECT gvc.cell, gvc.grp, CAST(sum(cnt) AS BIGINT) AS ni,
            sum(CAST(cnt AS HUGEINT) * (2 * cb + t + 1)) AS r2
          FROM gvc JOIN cv ON gvc.cell = cv.cell AND gvc.v = cv.v
          GROUP BY 1, 2),
        ct AS (SELECT cell, CAST(sum(t) AS BIGINT) AS nn,
            sum(CAST(t AS HUGEINT) * t * t - t) AS tie_t
          FROM cv GROUP BY 1),
        pr AS (SELECT a.cell, a.grp AS grp_a, b.grp AS grp_b,
            a.ni AS n_a, b.ni AS n_b,
            a.r2 * b.ni - b.r2 * a.ni AS d
          FROM gs a JOIN gs b ON a.cell = b.cell AND a.grp < b.grp),
        wd AS (SELECT pr.*, ct.nn,
            CAST(ct.nn AS HUGEINT) *
              (CAST(ct.nn AS HUGEINT) * ct.nn - 1) - ct.tie_t AS den2
          FROM pr JOIN ct ON pr.cell = ct.cell),
        rd AS (SELECT cell, grp_a, grp_b, n_a, n_b, d,
            CASE WHEN den2 > 0 AND n_a > 0 AND n_b > 0 THEN
              ((3000000 * CAST(nn - 1 AS HUGEINT) * abs(d)) //
                (CAST(n_a AS HUGEINT) * n_b * (n_a + n_b))) *
                abs(d) // den2 END AS rad
          FROM wd)
        SELECT cell, grp_a, grp_b, n_a, n_b,
          CAST(sign(d) AS BIGINT) AS d_sign,
          CASE WHEN rad IS NOT NULL AND rad < 9007199254740992 THEN
            CAST(sign(d) AS BIGINT) *
              CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) END
            AS z_milli
        FROM rd ORDER BY cell, grp_a, grp_b""")),

    // ------------------------------------------------------------------
    // q273 — Mantel–Haenszel pooled odds ratio with Simpson flag
    // (StatsOps.mantelHaenszel): the confounding audit — per event
    // type, exposure and outcome are hash-planted with a stratum
    // confounder (stratum 0: 80% exposed, 70% base rate; stratum 1:
    // 20% exposed, 20% base rate). For purchase the within-stratum
    // exposure effect is NEGATIVE (−5 points) yet the crude OR reads
    // ≈ 2.9 because exposure concentrates where the base rate is high
    // — the planted Simpson reversal flips the flag; the other four
    // cells carry a +10-point effect and agree in both readouts.
    // ------------------------------------------------------------------
    "q273_mantel_haenszel" -> GraftQuery(
      build = (s, d) => {
        val h = (tag: String) => graft.operators.TextDedup.hash64(
          concat(lit(tag), col("event_id").cast("string"))) % 1000000L
        val pr = events(s, d)
          .withColumn("st", when(h("mhs") < 500000L, 0L).otherwise(1L))
          .withColumn("e",
            when(h("mhe") < when(col("st") === 0L, 800000L)
              .otherwise(200000L), 1L).otherwise(0L))
          .withColumn("rate",
            when(col("st") === 0L, 700000L).otherwise(200000L) +
              col("e") * when(col("event_type") === "purchase",
                -50000L).otherwise(100000L))
          .withColumn("o", when(h("mho") < col("rate"), 1L)
            .otherwise(0L))
        graft.operators.StatsOps.mantelHaenszel(pr, "event_type", "st",
            "e", "o")
          .withColumnRenamed("cell", "etype")
          .orderBy("etype")
      },
      oracle = Some("""
        WITH hx AS (SELECT event_type AS cell,
            CASE WHEN CAST(('0x' || substr(md5('mhs' ||
                CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
                % 1000000 < 500000 THEN 0 ELSE 1 END AS st,
            CAST(('0x' || substr(md5('mhe' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 AS he,
            CAST(('0x' || substr(md5('mho' ||
              CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
              % 1000000 AS ho
          FROM events),
        eo AS (SELECT cell, st,
            CASE WHEN he < CASE WHEN st = 0 THEN 800000 ELSE 200000 END
              THEN 1 ELSE 0 END AS e, ho
          FROM hx),
        xy AS (SELECT cell, st, e,
            CASE WHEN ho < (CASE WHEN st = 0 THEN 700000 ELSE 200000
              END) + e * (CASE WHEN cell = 'purchase' THEN -50000
              ELSE 100000 END) THEN 1 ELSE 0 END AS o
          FROM eo),
        tb AS (SELECT cell, st,
            CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
            CAST(sum(CASE WHEN e = 1 AND o = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS b,
            CAST(sum(CASE WHEN e = 0 AND o = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c,
            CAST(sum(CASE WHEN e = 0 AND o = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS d
          FROM xy GROUP BY 1, 2),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_strata,
            CAST(sum(a + b + c + d) AS BIGINT) AS n,
            CAST(sum(a) AS BIGINT) AS aa, CAST(sum(b) AS BIGINT) AS bb,
            CAST(sum(c) AS BIGINT) AS cc, CAST(sum(d) AS BIGINT) AS dd,
            sum((1000000 * CAST(a AS HUGEINT) * d) // (a + b + c + d))
              AS r6,
            sum((1000000 * CAST(b AS HUGEINT) * c) // (a + b + c + d))
              AS s6
          FROM tb GROUP BY 1),
        orr AS (SELECT cell, n_strata, n,
            CASE WHEN CAST(bb AS HUGEINT) * cc > 0 THEN
              CAST((1000000 * CAST(aa AS HUGEINT) * dd) //
                (CAST(bb AS HUGEINT) * cc) AS BIGINT) END
              AS or_crude_ppm,
            CASE WHEN s6 > 0 THEN
              CAST((1000000 * r6) // s6 AS BIGINT) END AS or_mh_ppm
          FROM ag)
        SELECT cell AS etype, n_strata, n, or_crude_ppm, or_mh_ppm,
          CASE WHEN or_crude_ppm IS NOT NULL AND or_mh_ppm IS NOT NULL
            THEN (or_crude_ppm > 1000000 AND or_mh_ppm < 1000000) OR
              (or_crude_ppm < 1000000 AND or_mh_ppm > 1000000) END
            AS simpson_flip
        FROM orr ORDER BY etype""")),

    // ------------------------------------------------------------------
    // q274 — restricted mean survival time (StatsOps.rmst) on q120's
    // exact cohort geometry: the scalar the KM curve (q120) and the
    // log-rank verdict (q250) both stop short of — average survived
    // hours within the first RmstTauH = 1000, the area under the
    // already-floored KM lattice (the q120 recurrence IS the input,
    // so the integral is exact, not re-estimated). Driven from
    // subject totals: an all-censored cohort would read the full
    // τ·10⁶ rather than vanish.
    // ------------------------------------------------------------------
    "q274_rmst" -> GraftQuery(
      build = (s, d) => {
        val subj = events(s, d)
          .select(col("user_id"), expr("ts div 1000").as("t_us"))
          .groupBy("user_id")
          .agg(min("t_us").as("first_us"), max("t_us").as("last_us"))
          .select(
            (col("user_id") % KmCohortMod).as("cohort"),
            expr(s"(last_us - first_us) div $KmHourUs").as("dur_h"),
            when(col("last_us") < KmStudyEndUs - KmChurnHorizonUs, 1L)
              .otherwise(0L).as("ev"))
        graft.operators.StatsOps.rmst(subj, "cohort", "dur_h", "ev",
            RmstTauH)
          .orderBy("cohort")
      },
      oracle = Some(s"""
        WITH RECURSIVE subj AS (
          SELECT user_id % $KmCohortMod AS cohort,
            (max(epoch_us(ts)) - min(epoch_us(ts))) // $KmHourUs AS t,
            CASE WHEN max(epoch_us(ts)) < ${KmStudyEndUs - KmChurnHorizonUs}
              THEN 1 ELSE 0 END AS ev
          FROM events GROUP BY user_id),
        byd AS (SELECT cohort, t, count(*) AS n_all, sum(ev) AS d
          FROM subj GROUP BY cohort, t),
        r0 AS (SELECT cohort, t, d,
            sum(n_all) OVER (PARTITION BY cohort) -
              coalesce(sum(n_all) OVER (PARTITION BY cohort ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
          FROM byd),
        deaths AS (SELECT cohort, t, r, d,
            row_number() OVER (PARTITION BY cohort ORDER BY t) AS rk
          FROM r0 WHERE d > 0),
        km(cohort, rk, t, r, d, s) AS (
          SELECT cohort, rk, t, r, d, (1000000 * (r - d)) // r
          FROM deaths WHERE rk = 1
          UNION ALL
          SELECT x.cohort, x.rk, x.t, x.r, x.d, (km.s * (x.r - x.d)) // x.r
          FROM km JOIN deaths x
            ON x.cohort = km.cohort AND x.rk = km.rk + 1),
        seg AS (SELECT cohort, t, s,
            coalesce(lead(t) OVER (PARTITION BY cohort ORDER BY t),
              $RmstTauH) AS next_t
          FROM km),
        sa AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_steps,
            min(t) AS first_t,
            sum(CAST(s AS HUGEINT) * greatest(0,
              least(next_t, $RmstTauH) - least(t, $RmstTauH))) AS tail
          FROM seg GROUP BY 1),
        tot AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_subjects,
            CAST(sum(ev) AS BIGINT) AS n_events
          FROM subj GROUP BY 1)
        SELECT tot.cohort, CAST($RmstTauH AS BIGINT) AS tau,
          n_subjects, n_events,
          coalesce(sa.n_steps, 0) AS n_steps,
          CAST(1000000 * least(coalesce(sa.first_t, $RmstTauH),
            $RmstTauH) + coalesce(sa.tail, 0) AS BIGINT) AS rmst_ppm
        FROM tot LEFT JOIN sa ON tot.cohort = sa.cohort
        ORDER BY tot.cohort""")),

    // ------------------------------------------------------------------
    // q276 — Wilson score intervals (StatsOps.wilsonInterval): the
    // success-rate confidence band per (event type × $250 value band)
    // cell for the "value ≥ $50" success bit. The upper band is
    // DEGENERATE by construction (every $250+ value is ≥ $50 — rate
    // exactly 1), which is precisely the case the Wald band collapses
    // on and Wilson handles: hi clamps at 10⁶, lo stays honestly
    // below it. The 19600/38416 constants are z = 1.96 on the 10⁴
    // lattice, interpolated identically into both engines.
    // ------------------------------------------------------------------
    "q276_wilson_interval" -> GraftQuery(
      build = (s, d) => {
        val pr = events(s, d)
          .withColumn("cents",
            expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)"))
          .withColumn("cell",
            concat(col("event_type"), lit("_"),
              least(expr("cents div 2500000"), lit(1L))
                .cast("string")))
          .withColumn("succ",
            when(col("cents") >= 500000L, 1L).otherwise(0L))
        graft.operators.StatsOps.wilsonInterval(pr, "cell", "succ")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH pr AS (SELECT event_type || '_' ||
            CAST(least(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT) // 2500000, 1) AS VARCHAR) AS cell,
            CASE WHEN CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT) >= 500000 THEN 1 ELSE 0 END AS succ
          FROM events WHERE value IS NOT NULL),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(succ) AS BIGINT) AS r
          FROM pr GROUP BY 1),
        wi AS (SELECT cell, n, r,
            CAST(n AS HUGEINT) * 10000 + 38416 AS n4
          FROM ag),
        cc AS (SELECT cell, n, r, n4,
            CAST((1000000 * (10000 * CAST(r AS HUGEINT) + 19208)) // n4
              AS BIGINT) AS center_ppm,
            (1000000000000 * 38416 *
              (40000 * CAST(r AS HUGEINT) * (n - r) + 38416 * n)) //
              (4 * CAST(n AS HUGEINT) * n4 * n4) AS rad
          FROM wi),
        hh AS (SELECT cell, n, r, center_ppm,
            CASE WHEN rad < 9007199254740992 THEN
              CAST(floor(sqrt(CAST(rad AS DOUBLE))) AS BIGINT) END
              AS half_ppm
          FROM cc)
        SELECT cell, n, r, (1000000 * r) // n AS p_ppm, center_ppm,
          CASE WHEN half_ppm IS NOT NULL THEN
            CASE WHEN r = 0 THEN 0
              ELSE greatest(0, center_ppm - half_ppm) END END AS lo_ppm,
          CASE WHEN half_ppm IS NOT NULL THEN
            CASE WHEN r = n THEN 1000000
              ELSE least(1000000, center_ppm + half_ppm) END END
            AS hi_ppm
        FROM hh ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q277 — Mood's median test (StatsOps.moodsMedian): the outlier-
    // immune k-sample location gate — per line-number cell, does each
    // return flag put the expected mass above the pooled quantity
    // median. Cell 0's 'A' quantities are shifted +15 (half the
    // domain): cell 0 reads χ² far past the χ²₂ 5% line (≈ 5.99),
    // cells 1/2 sit near 0. Integer quantities 1..50 make the pooled
    // median genuinely tie-heavy — the mass AT the median counts as
    // not-above, the convention both engines spell identically.
    // ------------------------------------------------------------------
    "q277_moods_median" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d)
          .select(expr("cast(l_linenumber % 3 as bigint)").as("cell"),
            col("l_returnflag").as("grp"),
            (col("l_quantity").cast("long") +
              when(expr("l_linenumber % 3 = 0") &&
                col("l_returnflag") === "A", 15L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.moodsMedian(li, "cell", "grp", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH li AS (SELECT CAST(l_linenumber % 3 AS BIGINT) AS cell,
            l_returnflag AS grp,
            CAST(l_quantity AS BIGINT) +
              CASE WHEN l_linenumber % 3 = 0 AND l_returnflag = 'A'
                THEN 15 ELSE 0 END AS v
          FROM lineitem
          WHERE l_returnflag IS NOT NULL AND l_quantity IS NOT NULL),
        gvc AS (SELECT cell, grp, v, CAST(count(*) AS BIGINT) AS cnt
          FROM li GROUP BY 1, 2, 3),
        cva AS (SELECT cell, v, CAST(sum(cnt) AS BIGINT) AS t,
            sum(sum(cnt)) OVER (PARTITION BY cell ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            sum(sum(cnt)) OVER (PARTITION BY cell) AS ntot
          FROM gvc GROUP BY cell, v),
        med AS (SELECT cell, min(v) AS med FROM cva
          WHERE cum * 2 >= ntot GROUP BY 1),
        gr AS (SELECT gvc.cell, gvc.grp, max(med.med) AS med,
            CAST(sum(cnt) AS BIGINT) AS ni,
            CAST(sum(CASE WHEN gvc.v > med.med THEN cnt ELSE 0 END)
              AS BIGINT) AS ai
          FROM gvc JOIN med ON gvc.cell = med.cell GROUP BY 1, 2),
        tot AS (SELECT cell, CAST(count(*) AS BIGINT) AS k,
            CAST(sum(ni) AS BIGINT) AS nn,
            CAST(sum(ai) AS BIGINT) AS atot
          FROM gr GROUP BY 1),
        tm AS (SELECT gr.cell, gr.med, tot.k, tot.nn, tot.atot,
            CASE WHEN atot > 0 AND atot < nn THEN
              (1000 * (CAST(ai AS HUGEINT) * nn -
                  CAST(ni AS HUGEINT) * atot) *
                (CAST(ai AS HUGEINT) * nn -
                  CAST(ni AS HUGEINT) * atot)) //
                (CAST(nn AS HUGEINT) * ni * atot) +
              (1000 * (CAST(ni - ai AS HUGEINT) * nn -
                  CAST(ni AS HUGEINT) * (nn - atot)) *
                (CAST(ni - ai AS HUGEINT) * nn -
                  CAST(ni AS HUGEINT) * (nn - atot))) //
                (CAST(nn AS HUGEINT) * ni * (nn - atot)) END AS term
          FROM gr JOIN tot ON gr.cell = tot.cell)
        SELECT cell, max(k) AS k, max(nn) AS n, max(med) AS med,
          max(atot) AS n_above, CAST(sum(term) AS BIGINT) AS chi2_milli,
          max(k) - 1 AS dof
        FROM tm GROUP BY cell ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q278 — Cochran's Q (StatsOps.cochranQ): k-treatment matched
    // binary test, the McNemar (q269) generalization. Blocks = orders,
    // treatments = line numbers 1..3, outcome = quantity > 25; orders
    // with fewer than 3 lines drop AND count (the Friedman complete-
    // block discipline exercised on real data — most orders are
    // incomplete, so n_dropped dominates n_blocks). Cell 0 plants +20
    // quantity on treatment 3: its Q reads far past the χ²₂ 5% line;
    // cells 1/2 sit at noise.
    // ------------------------------------------------------------------
    "q278_cochran_q" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d)
          .filter(col("l_linenumber") <= 3)
          .select(expr("l_orderkey % 3").as("cell"),
            col("l_orderkey").as("block"),
            col("l_linenumber").cast("long").as("grp"),
            when(col("l_quantity").cast("long") +
              when(expr("l_orderkey % 3 = 0") && col("l_linenumber") === 3,
                20L).otherwise(0L) > 25L, 1L).otherwise(0L).as("y"))
        graft.operators.StatsOps.cochranQ(li, "cell", "block", "grp",
            "y")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_orderkey % 3 AS cell,
            l_orderkey AS block, CAST(l_linenumber AS BIGINT) AS grp,
            CASE WHEN CAST(l_quantity AS BIGINT) +
                CASE WHEN l_orderkey % 3 = 0 AND l_linenumber = 3
                  THEN 20 ELSE 0 END > 25 THEN 1 ELSE 0 END AS y
          FROM lineitem WHERE l_linenumber <= 3),
        kc AS (SELECT cell, CAST(count(DISTINCT grp) AS BIGINT) AS k
          FROM base GROUP BY 1),
        bs AS (SELECT base.cell, base.block, count(*) AS nb,
            count(DISTINCT grp) AS gb, CAST(sum(y) AS BIGINT) AS lsum,
            max(kc.k) AS k
          FROM base JOIN kc ON base.cell = kc.cell GROUP BY 1, 2),
        pc AS (SELECT cell, max(k) AS k,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 0 ELSE 1 END)
              AS BIGINT) AS n_dropped,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_blocks,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN lsum ELSE 0 END)
              AS BIGINT) AS n_succ,
            sum(CASE WHEN nb = k AND gb = k
              THEN CAST(lsum AS HUGEINT) * lsum ELSE 0 END) AS sum_l2
          FROM bs GROUP BY 1),
        gj AS (SELECT base.cell, base.grp,
            CAST(sum(base.y) AS HUGEINT) AS gjs
          FROM base JOIN bs ON bs.cell = base.cell
            AND bs.block = base.block
          WHERE bs.nb = bs.k AND bs.gb = bs.k
          GROUP BY 1, 2),
        g2 AS (SELECT cell, sum(gjs * gjs) AS sum_g2 FROM gj
          GROUP BY 1)
        SELECT pc.cell, pc.k, pc.n_blocks, pc.n_dropped, pc.n_succ,
          CASE WHEN pc.n_blocks > 0
              AND CAST(pc.k AS HUGEINT) * pc.n_succ - pc.sum_l2 > 0
            THEN CAST((1000 * (pc.k - 1) *
                (CAST(pc.k AS HUGEINT) * g2.sum_g2 -
                 CAST(pc.n_succ AS HUGEINT) * pc.n_succ)) //
              (CAST(pc.k AS HUGEINT) * pc.n_succ - pc.sum_l2)
              AS BIGINT) END AS q_milli,
          pc.k - 1 AS dof
        FROM pc LEFT JOIN g2 ON g2.cell = pc.cell
        ORDER BY pc.cell""")),

    // ------------------------------------------------------------------
    // q279 — Wald–Wolfowitz runs test (StatsOps.runsTest): is the
    // per-type flag sequence exchangeable over event order. The click
    // cell's flag is planted as (event_id div 64) % 2 — 64-long runs,
    // z_milli strongly negative (far fewer runs than exchangeable);
    // the other four flag on value ≥ 50 (cents lattice), reading near
    // 0. The operator counts runs HIERARCHICALLY (4096-wide order
    // buckets, within-bucket windows + a bounded boundary pass — the
    // bucketPrefixOffsets discipline); the oracle counts them with one
    // flat lag window — two independent decompositions, one integer
    // answer.
    // ------------------------------------------------------------------
    "q279_runs_test" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .select(col("event_type").as("cell"), col("event_id").as("o"),
            when(col("event_type") === "click",
              (expr("(event_id div 64) % 2") === 0L).cast("long"))
              .otherwise(when(col("value").isNotNull,
                (cents(col("value")) >= 500000L).cast("long")))
              .as("b"))
        graft.operators.StatsOps.runsTest(ev, "cell", "o", "b", 4096L)
          .orderBy("cell")
      },
      oracle = Some("""
        WITH f AS (SELECT event_type AS cell, event_id AS o,
            CASE WHEN event_type = 'click' THEN
                CASE WHEN (event_id // 64) % 2 = 0 THEN 1 ELSE 0 END
              WHEN value IS NOT NULL THEN
                CASE WHEN CAST(CAST(value AS DECIMAL(18,4)) * 10000
                  AS BIGINT) >= 500000 THEN 1 ELSE 0 END
              END AS b
          FROM events WHERE event_id IS NOT NULL),
        fb AS (SELECT cell, o, b FROM f WHERE b IS NOT NULL),
        r AS (SELECT cell, b,
            CASE WHEN lag(b) OVER (PARTITION BY cell ORDER BY o)
                IS NULL THEN 0
              WHEN lag(b) OVER (PARTITION BY cell ORDER BY o) <> b
                THEN 1 ELSE 0 END AS chg
          FROM fb),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS n,
            CAST(sum(b) AS BIGINT) AS n1,
            CAST(sum(chg) + 1 AS BIGINT) AS r_runs
          FROM r GROUP BY 1),
        z AS (SELECT cell, n, n1, n - n1 AS n0, r_runs,
            2 * CAST(n1 AS HUGEINT) * (n - n1) AS m2,
            CAST(r_runs AS HUGEINT) * n - n -
              2 * CAST(n1 AS HUGEINT) * (n - n1) AS dnum
          FROM ag)
        SELECT cell, n, n1, n0, r_runs,
          CASE WHEN n > 1 AND m2 > n THEN
            CAST(CASE WHEN dnum < 0 THEN -1
                WHEN dnum = 0 THEN 0 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                least((((1000000 * abs(dnum)) // m2) *
                    abs(dnum) * (n - 1)) // (m2 - n),
                  1000000000000)
                AS DOUBLE))) AS BIGINT) AS BIGINT) END AS z_milli
        FROM z ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q280 — Page's L trend test (StatsOps.pageTrend): the ORDERED
    // alternative Friedman (q267) can't see. Blocks = users, ordered
    // treatments = event_id % 4 quarters, value = spend cents rollup;
    // cell 0 (even users) plants +10⁷·ordinal — a dose response larger
    // than any block's natural spend spread, so every cell-0 block
    // ranks the quarters monotonically and z_milli pins at the m-block
    // maximum, while cell 1 sits at noise. A user missing a quarter
    // drops AND counts.
    // ------------------------------------------------------------------
    "q280_page_trend" -> GraftQuery(
      build = (s, d) => {
        val pre = events(s, d)
          .filter(col("value").isNotNull)
          .groupBy(expr("user_id % 2").as("cell"),
            col("user_id").as("block"),
            expr("cast(event_id % 4 as bigint)").as("ord"))
          .agg(sum(cents(col("value"))).as("sc"))
          .select(col("cell"), col("block"), col("ord"),
            (col("sc") + when(col("cell") === 0L,
              col("ord") * 10000000L).otherwise(0L)).as("v"))
        graft.operators.StatsOps.pageTrend(pre, "cell", "block", "ord",
            "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH bg AS (SELECT user_id % 2 AS cell, user_id AS block,
            CAST(event_id % 4 AS BIGINT) AS ord,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) +
              CASE WHEN user_id % 2 = 0 THEN (event_id % 4) * 10000000
                ELSE 0 END AS v
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2, event_id % 4),
        kc AS (SELECT cell, CAST(count(DISTINCT ord) AS BIGINT) AS k
          FROM bg GROUP BY 1),
        bs AS (SELECT bg.cell, bg.block, count(*) AS nb,
            count(DISTINCT bg.ord) AS gb, max(kc.k) AS k
          FROM bg JOIN kc ON bg.cell = kc.cell GROUP BY 1, 2),
        drp AS (SELECT cell,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 0 ELSE 1 END)
              AS BIGINT) AS n_dropped,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_blocks
          FROM bs GROUP BY 1),
        kept AS (SELECT bg.cell, bg.block, bg.ord, bg.v FROM bg
          JOIN bs ON bg.cell = bs.cell AND bg.block = bs.block
          WHERE bs.nb = bs.k AND bs.gb = bs.k),
        bv AS (SELECT cell, block, v, CAST(count(*) AS BIGINT) AS t,
            coalesce(sum(count(*)) OVER (PARTITION BY cell, block
              ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
              1 PRECEDING), 0) AS cb
          FROM kept GROUP BY 1, 2, 3),
        r2 AS (SELECT kept.cell, kept.ord,
            sum(CAST(2 * bv.cb + bv.t + 1 AS HUGEINT)) AS r2j
          FROM kept JOIN bv ON kept.cell = bv.cell
            AND kept.block = bv.block AND kept.v = bv.v
          GROUP BY 1, 2),
        lr AS (SELECT cell, ord, r2j,
            CAST(row_number() OVER (PARTITION BY cell ORDER BY ord)
              AS HUGEINT) AS j
          FROM r2),
        la AS (SELECT cell, CAST(count(*) AS BIGINT) AS k,
            sum(j * r2j) AS l2
          FROM lr GROUP BY 1),
        fin AS (SELECT drp.cell, la.k, drp.n_blocks, drp.n_dropped,
            la.l2,
            (CAST(drp.n_blocks AS HUGEINT) * la.k * (la.k + 1) *
              (la.k + 1)) // 2 AS e2
          FROM drp LEFT JOIN la ON drp.cell = la.cell)
        SELECT cell, k, n_blocks, n_dropped,
          CAST(l2 AS BIGINT) AS l2, CAST(e2 AS BIGINT) AS e2,
          CASE WHEN n_blocks > 0 AND k >= 3 THEN
            CAST(CASE WHEN l2 - e2 < 0 THEN -1
                WHEN l2 - e2 = 0 THEN 0 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (36000000 * (l2 - e2) * (l2 - e2)) //
                (CAST(n_blocks AS HUGEINT) * k * k * (k + 1) *
                 (CAST(k AS HUGEINT) * k - 1)) AS DOUBLE)))
                AS BIGINT) AS BIGINT) END AS z_milli
        FROM fin ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q281 — Kendall's W (StatsOps.kendallW): panel concordance over
    // raters = orders, objects = line numbers 1..3, score = quantity.
    // Cell 0 plants +60·linenumber — gaps larger than the 1..50
    // quantity noise, so every complete order ranks the objects
    // identically and W reads 1000 exactly; cell 1's natural
    // quantities read the noise floor. Incomplete orders drop AND
    // count; the q267 identity Q = m·(k−1)·W is pinned in the spec.
    // ------------------------------------------------------------------
    "q281_kendall_w" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d)
          .filter(col("l_linenumber") <= 3)
          .select(expr("l_orderkey % 2").as("cell"),
            col("l_orderkey").as("block"),
            col("l_linenumber").cast("long").as("grp"),
            (col("l_quantity").cast("long") +
              when(expr("l_orderkey % 2 = 0"),
                col("l_linenumber").cast("long") * 60L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.kendallW(li, "cell", "block", "grp",
            "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH bg AS (SELECT l_orderkey % 2 AS cell, l_orderkey AS block,
            CAST(l_linenumber AS BIGINT) AS grp,
            CAST(l_quantity AS BIGINT) +
              CASE WHEN l_orderkey % 2 = 0 THEN l_linenumber * 60
                ELSE 0 END AS v
          FROM lineitem WHERE l_linenumber <= 3),
        kc AS (SELECT cell, CAST(count(DISTINCT grp) AS BIGINT) AS k
          FROM bg GROUP BY 1),
        bs AS (SELECT bg.cell, bg.block, count(*) AS nb,
            count(DISTINCT bg.grp) AS gb, max(kc.k) AS k
          FROM bg JOIN kc ON bg.cell = kc.cell GROUP BY 1, 2),
        drp AS (SELECT cell,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 0 ELSE 1 END)
              AS BIGINT) AS n_dropped,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_blocks
          FROM bs GROUP BY 1),
        kept AS (SELECT bg.cell, bg.block, bg.grp, bg.v FROM bg
          JOIN bs ON bg.cell = bs.cell AND bg.block = bs.block
          WHERE bs.nb = bs.k AND bs.gb = bs.k),
        bv AS (SELECT cell, block, v, CAST(count(*) AS BIGINT) AS t,
            coalesce(sum(count(*)) OVER (PARTITION BY cell, block
              ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
              1 PRECEDING), 0) AS cb
          FROM kept GROUP BY 1, 2, 3),
        r2 AS (SELECT kept.cell, kept.grp,
            sum(CAST(2 * bv.cb + bv.t + 1 AS HUGEINT)) AS r2j
          FROM kept JOIN bv ON kept.cell = bv.cell
            AND kept.block = bv.block AND kept.v = bv.v
          GROUP BY 1, 2),
        ties AS (SELECT cell, sum(CAST(t AS HUGEINT) * t * t - t)
            AS tie_t
          FROM bv GROUP BY 1),
        ra AS (SELECT cell, CAST(count(*) AS BIGINT) AS k,
            sum(r2j * r2j) AS ss
          FROM r2 GROUP BY 1),
        fin AS (SELECT drp.cell, ra.k, drp.n_blocks, drp.n_dropped,
            CAST(ties.tie_t AS BIGINT) AS tie_t,
            ra.ss - CAST(ra.k AS HUGEINT) *
              (CAST(drp.n_blocks AS HUGEINT) * drp.n_blocks) *
              ((ra.k + 1) * (ra.k + 1)) AS s2,
            CAST(drp.n_blocks AS HUGEINT) * drp.n_blocks * ra.k *
              (CAST(ra.k AS HUGEINT) * ra.k - 1) AS den0,
            ties.tie_t AS tt
          FROM drp
          LEFT JOIN ra ON drp.cell = ra.cell
          LEFT JOIN ties ON drp.cell = ties.cell)
        SELECT cell, k, n_blocks, n_dropped, tie_t,
          CASE WHEN n_blocks > 0 AND k >= 2 AND den0 > 0 THEN
            CAST((3000 * s2) // den0 AS BIGINT) END AS w_milli,
          CASE WHEN n_blocks > 0 AND k >= 2
              AND den0 - CAST(n_blocks AS HUGEINT) * tt > 0 THEN
            CAST((3000 * s2) //
              (den0 - CAST(n_blocks AS HUGEINT) * tt) AS BIGINT) END
            AS w_tie_milli
        FROM fin ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q282 — ordinal association pair (StatsOps.ordinalAssociation):
    // Goodman–Kruskal γ and both Somers' D asymmetries off the q205
    // contingency grid (quantity buckets × price bins per return
    // flag) — the tie-blind and tie-conditioned readouts of the SAME
    // concordance counts τ-b folds into one number. The q205 plant is
    // replayed (flag 'R' couples the price bin to quantity): 'R' reads
    // all three strongly positive with γ ≥ D_yx > D_xy (each D pays
    // for the tie mass on its conditioning margin; γ pays for
    // neither); A/N sit at the independence floor.
    // ------------------------------------------------------------------
    "q282_ordinal_assoc" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d).select(col("l_returnflag"),
          expr("cast(cast(l_quantity as decimal(18,4)) * 10000 " +
            "as bigint) div 100000").as("qty_bin"),
          (expr("cast(cast(l_extendedprice as decimal(18,4)) * 10000 " +
            "as bigint) div 1000000") +
            when(col("l_returnflag") === "R",
              expr("cast(cast(l_quantity as decimal(18,4)) * 10000 " +
                "as bigint) div 100000") * 160L).otherwise(0L))
            .as("price_bin"))
        graft.operators.StatsOps.ordinalAssociation(li, "l_returnflag",
            "qty_bin", "price_bin")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_returnflag AS cell,
            CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
              // 100000 AS x,
            CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000
              AS BIGINT) // 1000000 +
            CASE WHEN l_returnflag = 'R' THEN
              (CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000
                AS BIGINT) // 100000) * 160 ELSE 0 END AS y
          FROM lineitem),
        cxy AS (SELECT cell, x, y, count(*) AS nxy
          FROM base GROUP BY 1, 2, 3),
        dx AS (SELECT DISTINCT cell, x FROM cxy),
        dy AS (SELECT DISTINCT cell, y FROM cxy),
        grid AS (SELECT dx.cell, dx.x, dy.y,
            coalesce(nxy, 0) AS nc
          FROM dx JOIN dy ON dx.cell = dy.cell
          LEFT JOIN cxy ON cxy.cell = dx.cell AND cxy.x = dx.x
            AND cxy.y = dy.y),
        h AS (SELECT cell, x, y, nc,
            coalesce(sum(nc) OVER (PARTITION BY cell, x ORDER BY y
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS hlt,
            coalesce(sum(nc) OVER (PARTITION BY cell, x ORDER BY y
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
              AS hgt
          FROM grid),
        g AS (SELECT cell, x, y, nc,
            coalesce(sum(hlt) OVER (PARTITION BY cell, y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS glt,
            coalesce(sum(hgt) OVER (PARTITION BY cell, y ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS ggt
          FROM h),
        pr AS (SELECT cell, sum(CAST(nc AS HUGEINT)) AS n,
            sum(CAST(nc AS HUGEINT) * glt) AS conc,
            sum(CAST(nc AS HUGEINT) * ggt) AS disc
          FROM g GROUP BY cell),
        tx AS (SELECT cell,
            sum(CAST(nx AS HUGEINT) * (nx - 1)) // 2 AS tx
          FROM (SELECT cell, x, sum(nxy) AS nx FROM cxy GROUP BY 1, 2)
          GROUP BY cell),
        ty AS (SELECT cell,
            sum(CAST(ny AS HUGEINT) * (ny - 1)) // 2 AS ty
          FROM (SELECT cell, y, sum(nxy) AS ny FROM cxy GROUP BY 1, 2)
          GROUP BY cell),
        fin AS (SELECT pr.cell, pr.n, pr.conc, pr.disc,
            pr.conc - pr.disc AS num,
            (pr.n * (pr.n - 1)) // 2 AS n0, tx.tx, ty.ty
          FROM pr JOIN tx ON pr.cell = tx.cell
          JOIN ty ON pr.cell = ty.cell)
        SELECT cell, CAST(n AS BIGINT) AS n,
          CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
          CASE WHEN conc + disc > 0 THEN
            CAST(CASE WHEN num < 0 THEN -1 WHEN num = 0 THEN 0
                ELSE 1 END *
              CAST((1000 * abs(num)) // (conc + disc) AS BIGINT)
              AS BIGINT) END AS gamma_milli,
          CASE WHEN n0 - tx > 0 THEN
            CAST(CASE WHEN num < 0 THEN -1 WHEN num = 0 THEN 0
                ELSE 1 END *
              CAST((1000 * abs(num)) // (n0 - tx) AS BIGINT)
              AS BIGINT) END AS d_yx_milli,
          CASE WHEN n0 - ty > 0 THEN
            CAST(CASE WHEN num < 0 THEN -1 WHEN num = 0 THEN 0
                ELSE 1 END *
              CAST((1000 * abs(num)) // (n0 - ty) AS BIGINT)
              AS BIGINT) END AS d_xy_milli
        FROM fin ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q283 — Ljung–Box portmanteau test (StatsOps.ljungBox): is the
    // per-type daily-revenue series white noise across the first 3
    // autocorrelations — the q150 ACF family's omnibus readout, on the
    // same centered-by-n lattice (c_t = n·y_t − Σy: exact centering
    // with no division). Per-stage floors are the statistic's spelled
    // definition; both engines replay them identically.
    // ------------------------------------------------------------------
    "q283_ljung_box" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("period"))
          .agg(sum(cents(col("value"))).as("vc"))
          .select(col("grp"), col("period"),
            expr("vc div 10000").as("v"))
        graft.operators.StatsOps.ljungBox(daily, "grp", "period", "v",
            3)
          .orderBy("cell")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS period,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) // 10000 AS v
          FROM events GROUP BY 1, 2),
        st AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(v AS HUGEINT)) AS sv
          FROM daily GROUP BY 1),
        c AS (SELECT daily.grp, daily.period,
            CAST(daily.v AS HUGEINT) * st.n - st.sv AS c, st.n
          FROM daily JOIN st ON daily.grp = st.grp),
        led AS (SELECT grp, n, c,
            lead(c, 1) OVER w AS c1, lead(c, 2) OVER w AS c2,
            lead(c, 3) OVER w AS c3
          FROM c WINDOW w AS (PARTITION BY grp ORDER BY period)),
        agg AS (SELECT grp, max(n) AS n, sum(c * c) AS d,
            sum(CASE WHEN c1 IS NOT NULL THEN c * c1 ELSE 0 END) AS nk1,
            sum(CASE WHEN c2 IS NOT NULL THEN c * c2 ELSE 0 END) AS nk2,
            sum(CASE WHEN c3 IS NOT NULL THEN c * c3 ELSE 0 END) AS nk3
          FROM led GROUP BY 1),
        t AS (SELECT grp, n, d,
            (CASE WHEN n > 1 AND d > 0 THEN
              (((1000000 * abs(nk1)) // d) * ((1000000 * abs(nk1)) // d))
                // (n - 1) ELSE 0 END) +
            (CASE WHEN n > 2 AND d > 0 THEN
              (((1000000 * abs(nk2)) // d) * ((1000000 * abs(nk2)) // d))
                // (n - 2) ELSE 0 END) +
            (CASE WHEN n > 3 AND d > 0 THEN
              (((1000000 * abs(nk3)) // d) * ((1000000 * abs(nk3)) // d))
                // (n - 3) ELSE 0 END) AS tsum
          FROM agg)
        SELECT grp AS cell, CAST(n AS BIGINT) AS n,
          CAST(3 AS BIGINT) AS max_lag,
          CASE WHEN d > 0 AND n > 4 THEN
            CAST((n * (n + 2) * tsum) // 1000000000 AS BIGINT) END
            AS lb_milli
        FROM t ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q284 — Durbin–Watson (StatsOps.durbinWatson): first-order serial
    // correlation in the residuals of each type's daily-revenue-on-
    // time least-squares line — the q98 linear-fit family's diagnostic
    // on the exact milli-residual lattice (n·S0·e_t is an exact
    // integer before the one defined floor). DW ≈ 2000 ⇒ residuals
    // look iid; the generator's daily series are near-iid so every
    // cell reads near 2000, and the EXACTNESS is what's gated.
    // ------------------------------------------------------------------
    "q284_durbin_watson" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("period"))
          .agg(sum(cents(col("value"))).as("vc"))
          .select(col("grp"), col("period"),
            expr("vc div 10000").as("v"))
        graft.operators.StatsOps.durbinWatson(daily, "grp", "period",
            "v")
          .orderBy("cell")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS period,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) // 10000 AS v
          FROM events GROUP BY 1, 2),
        st AS (SELECT grp, CAST(count(*) AS HUGEINT) AS n,
            sum(CAST(period AS HUGEINT)) AS sx,
            sum(CAST(v AS HUGEINT)) AS sy,
            sum(CAST(period AS HUGEINT) * period) AS sxx,
            sum(CAST(period AS HUGEINT) * v) AS sxy
          FROM daily GROUP BY 1),
        s01 AS (SELECT grp, n, sx, sy,
            n * sxx - sx * sx AS s0, n * sxy - sx * sy AS s1
          FROM st),
        resid AS (SELECT daily.grp, daily.period, s01.n,
            s01.n * s01.s0 * daily.v - s01.s0 * s01.sy +
              s01.s1 * s01.sx - s01.n * s01.s1 * daily.period AS rnum,
            s01.n * s01.s0 AS rden
          FROM daily JOIN s01 ON daily.grp = s01.grp
          WHERE s01.s0 > 0),
        e AS (SELECT grp, period, n,
            CASE WHEN rnum < 0 THEN -1 WHEN rnum = 0 THEN 0 ELSE 1 END
              * ((1000 * abs(rnum)) // rden) AS e
          FROM resid),
        lagd AS (SELECT grp, n, e,
            lag(e) OVER (PARTITION BY grp ORDER BY period) AS ep
          FROM e)
        SELECT grp AS cell, CAST(max(n) AS BIGINT) AS n,
          CASE WHEN sum(e * e) > 0 THEN
            CAST((1000 * sum(CASE WHEN ep IS NOT NULL
                THEN (e - ep) * (e - ep) ELSE 0 END)) // sum(e * e)
              AS BIGINT) END AS dw_milli
        FROM lagd GROUP BY grp ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q285 — Hampel outlier audit (StatsOps.hampelOutliers): robust
    // |v − median| > 3·MAD flags per event type on the cents lattice.
    // The generator's value tail is heavy, so each cell reads a real
    // ~12% tail mass at 3 MAD — the honest readout of THIS
    // distribution (a Gaussian would read ~0.3%); the planted +10⁷ on
    // every 97th event rides far beyond any natural value and
    // guarantees a ≥10309 ppm floor, against medians the outliers
    // cannot drag (the property a z-score gate lacks). Both medians
    // are the exact lower median on count-aggregated frames; one
    // corpus aggregate serves all three passes.
    // ------------------------------------------------------------------
    "q285_hampel_outliers" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type").as("cell"),
            (cents(col("value")) +
              when(expr("event_id % 97 = 0"), 10000000L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.hampelOutliers(ev, "cell", "v", 3)
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT event_type AS cell,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) +
              CASE WHEN event_id % 97 = 0 THEN 10000000 ELSE 0 END AS v
          FROM events WHERE value IS NOT NULL),
        gvc AS (SELECT cell, v, CAST(count(*) AS BIGINT) AS cnt
          FROM base GROUP BY 1, 2),
        m1 AS (SELECT cell, min(v) AS med FROM (
            SELECT cell, v,
              sum(cnt) OVER (PARTITION BY cell ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(cnt) OVER (PARTITION BY cell) AS ntot
            FROM gvc) WHERE cum * 2 >= ntot GROUP BY 1),
        dev AS (SELECT gvc.cell, abs(gvc.v - m1.med) AS dv,
            CAST(sum(cnt) AS BIGINT) AS cnt
          FROM gvc JOIN m1 ON gvc.cell = m1.cell GROUP BY 1, 2),
        m2 AS (SELECT cell, min(dv) AS mad FROM (
            SELECT cell, dv,
              sum(cnt) OVER (PARTITION BY cell ORDER BY dv
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(cnt) OVER (PARTITION BY cell) AS ntot
            FROM dev) WHERE cum * 2 >= ntot GROUP BY 1)
        SELECT gvc.cell, CAST(sum(cnt) AS BIGINT) AS n,
          max(m1.med) AS med, max(m2.mad) AS mad,
          CAST(sum(CASE WHEN abs(gvc.v - m1.med) > 3 * m2.mad
            THEN cnt ELSE 0 END) AS BIGINT) AS n_out,
          CAST((1000000 * CAST(sum(CASE WHEN abs(gvc.v - m1.med) >
              3 * m2.mad THEN cnt ELSE 0 END) AS HUGEINT)) //
            sum(cnt) AS BIGINT) AS out_ppm
        FROM gvc
        JOIN m1 ON gvc.cell = m1.cell
        JOIN m2 ON gvc.cell = m2.cell
        GROUP BY 1 ORDER BY 1""")),

    // ------------------------------------------------------------------
    // q286 — Cramér–von Mises two-sample (StatsOps.cramerVonMises):
    // the whole-distribution complement of q197's KS — every quantile
    // weighted, not just the worst gap. Even vs odd users per event
    // type on the cents lattice; signup's odd users are planted +2·10⁵
    // cents (a broad shift KS sees once but CvM integrates): signup
    // reads t_ppm ≫ the other cells' H₀ floor (≈ 1/(6N)).
    // ------------------------------------------------------------------
    "q286_cramer_von_mises" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type").as("cell"),
            expr("user_id % 2").as("grp"),
            (cents(col("value")) +
              when(col("event_type") === "signup" &&
                expr("user_id % 2 = 1"), 200000L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.cramerVonMises(ev, "cell", "grp", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT event_type AS cell,
            CAST(user_id % 2 AS VARCHAR) AS grp,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) +
              CASE WHEN event_type = 'signup' AND user_id % 2 = 1
                THEN 200000 ELSE 0 END AS v
          FROM events WHERE value IS NOT NULL),
        ga AS (SELECT cell, min(grp) AS ga FROM base GROUP BY 1),
        gvc AS (SELECT base.cell, v,
            CAST(sum(CASE WHEN grp = ga THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN grp <> ga THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
          FROM base JOIN ga ON base.cell = ga.cell GROUP BY 1, 2),
        cm AS (SELECT cell, v, ca, cb,
            sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
            sum(ca) OVER (PARTITION BY cell) AS m,
            sum(cb) OVER (PARTITION BY cell) AS n
          FROM gvc WINDOW w AS (PARTITION BY cell ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        ag AS (SELECT cell, max(m) AS m, max(n) AS n,
            sum(CAST(ca + cb AS HUGEINT) *
              (CAST(cuma AS HUGEINT) * n - CAST(cumb AS HUGEINT) * m) *
              (CAST(cuma AS HUGEINT) * n - CAST(cumb AS HUGEINT) * m))
              AS s
          FROM cm GROUP BY 1)
        SELECT cell, CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n,
          CASE WHEN m > 0 AND n > 0 THEN
            CAST((1000000 * s) //
              (CAST(m + n AS HUGEINT) * (m + n) * m * n) AS BIGINT)
            END AS t_ppm
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q287 — Anderson–Darling two-sample (StatsOps.andersonDarling2):
    // the TAIL-sensitive member of the q197/q286 family — the
    // 1/(H(1−H)) weight makes tail discrepancies count most, where a
    // heavy-tailed corpus hides its trouble. Odd vs even line numbers
    // per return flag on quantities; flag 'R' odd lines planted +15:
    // 'R' reads ad_milli far above A/N's H₀ noise.
    // ------------------------------------------------------------------
    "q287_anderson_darling" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_returnflag").as("cell"),
            expr("l_linenumber % 2").as("grp"),
            (col("l_quantity").cast("long") +
              when(col("l_returnflag") === "R" &&
                expr("l_linenumber % 2 = 1"), 15L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.andersonDarling2(li, "cell", "grp",
            "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_returnflag AS cell,
            CAST(l_linenumber % 2 AS VARCHAR) AS grp,
            CAST(l_quantity AS BIGINT) +
              CASE WHEN l_returnflag = 'R' AND l_linenumber % 2 = 1
                THEN 15 ELSE 0 END AS v
          FROM lineitem),
        ga AS (SELECT cell, min(grp) AS ga FROM base GROUP BY 1),
        gvc AS (SELECT base.cell, v,
            CAST(sum(CASE WHEN grp = ga THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN grp <> ga THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
          FROM base JOIN ga ON base.cell = ga.cell GROUP BY 1, 2),
        cm AS (SELECT cell, v, ca, cb,
            sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
            sum(ca) OVER (PARTITION BY cell) AS m,
            sum(cb) OVER (PARTITION BY cell) AS n
          FROM gvc WINDOW w AS (PARTITION BY cell ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        dd AS (SELECT cell, m, n, ca, cb, cuma, cumb,
            abs(CAST(m + n AS HUGEINT) * cuma -
                CAST(m AS HUGEINT) * (cuma + cumb)) AS dj
          FROM cm),
        t AS (SELECT cell, m, n,
            CASE WHEN cuma + cumb < m + n THEN
              ((1000000 * CAST(ca + cb AS HUGEINT) * dj) //
               (CAST(cuma + cumb AS HUGEINT) * (m + n - cuma - cumb)))
                * dj
              ELSE 0 END AS term
          FROM dd),
        ag AS (SELECT cell, max(m) AS m, max(n) AS n, sum(term) AS s
          FROM t GROUP BY 1)
        SELECT cell, CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n,
          CASE WHEN m > 0 AND n > 0 THEN
            CAST((CAST(m + n AS HUGEINT) * s) //
              (CAST(m AS HUGEINT) * n * (m + n) * 1000) AS BIGINT)
            END AS ad_milli
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q288 — Ansari–Bradley scale test (StatsOps.ansariBradley): same
    // center, different SPREAD — the dispersion alternative the
    // location tests are blind to. Odd users' click values are planted
    // 4× the deviation around the cents grand center (equal medians,
    // one side 4× wider): the wide odd sample scores LOW from both
    // ends inward, so group A (even users, the narrow side) scores
    // high and click reads z_milli strongly POSITIVE (+26205 at
    // sf0.01) while other cells sit at noise. The z uses the exact
    // permutation moments of the realized score multiset — tie-exact,
    // no tabulated constants.
    // ------------------------------------------------------------------
    "q288_ansari_bradley" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type").as("cell"),
            expr("user_id % 2").as("grp"),
            when(col("event_type") === "click" &&
              expr("user_id % 2 = 1"),
              cents(col("value")) * 4L - 1050000L)
              .otherwise(cents(col("value"))).as("v"))
        graft.operators.StatsOps.ansariBradley(ev, "cell", "grp", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT event_type AS cell,
            CAST(user_id % 2 AS VARCHAR) AS grp,
            CASE WHEN event_type = 'click' AND user_id % 2 = 1 THEN
              CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) * 4
                - 1050000
              ELSE CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)
              END AS v
          FROM events WHERE value IS NOT NULL),
        ga AS (SELECT cell, min(grp) AS ga FROM base GROUP BY 1),
        gvc AS (SELECT base.cell, v,
            CAST(sum(CASE WHEN grp = ga THEN 1 ELSE 0 END) AS BIGINT)
              AS ca,
            CAST(sum(CASE WHEN grp <> ga THEN 1 ELSE 0 END) AS BIGINT)
              AS cb
          FROM base JOIN ga ON base.cell = ga.cell GROUP BY 1, 2),
        cm AS (SELECT cell, v, ca, cb,
            sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb,
            sum(ca) OVER (PARTITION BY cell) AS m,
            sum(cb) OVER (PARTITION BY cell) AS n
          FROM gvc WINDOW w AS (PARTITION BY cell ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        sc AS (SELECT cell, m, n, m + n AS nt, ca, cb,
            (cuma + cumb - ca - cb) * 2 + (ca + cb) + 1 AS r2
          FROM cm),
        s2f AS (SELECT cell, m, n, nt, ca, cb,
            least(r2, (nt + 1) * 2 - r2) AS s2 FROM sc),
        ag AS (SELECT cell, max(m) AS m, max(n) AS n, max(nt) AS nt,
            sum(CAST(s2 AS HUGEINT) * ca) AS ab2,
            sum(CAST(s2 AS HUGEINT) * (ca + cb)) AS s1,
            sum(CAST(s2 AS HUGEINT) * s2 * (ca + cb)) AS s2sum
          FROM s2f GROUP BY 1),
        z AS (SELECT cell, m, n, ab2,
            CAST(nt AS HUGEINT) * ab2 - CAST(m AS HUGEINT) * s1
              AS znum,
            CAST(nt AS HUGEINT) * s2sum - s1 * s1 AS vvar,
            nt
          FROM ag)
        SELECT cell, CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n,
          CAST(ab2 AS BIGINT) AS ab2,
          CASE WHEN m > 0 AND n > 0 AND vvar > 0 THEN
            CAST(CASE WHEN znum < 0 THEN -1 WHEN znum = 0 THEN 0
                ELSE 1 END *
              CAST(floor(sqrt(CAST(
                ((((1000000 * abs(znum)) //
                    (CAST(m AS HUGEINT) * n)) * abs(znum))
                  // vvar) * (nt - 1)
                AS DOUBLE))) AS BIGINT) AS BIGINT) END AS z_milli
        FROM z ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q289 — Cronbach's α (StatsOps.cronbachAlpha): do the k item
    // scores measure ONE underlying thing — the scale-construction
    // gate before item scores are averaged into "the" quality score.
    // Subjects = users, items = event_id % 3 score rollups; cell 0
    // plants a shared per-user component on every item (inter-item
    // correlation → α = 618); cell 1's natural panel reads the
    // shared-activity floor (α = 243 — per-user event counts already
    // correlate the item sums; the plant nearly triples it, the
    // separation that matters). Incomplete panels drop AND count.
    // ------------------------------------------------------------------
    "q289_cronbach_alpha" -> GraftQuery(
      build = (s, d) => {
        val pre = events(s, d)
          .filter(col("value").isNotNull)
          .groupBy(expr("user_id % 2").as("cell"),
            col("user_id").as("subj"),
            expr("cast(event_id % 3 as bigint)").as("item"))
          .agg(sum(cents(col("value"))).as("sc"))
          .select(col("cell"), col("subj"), col("item"),
            (col("sc") + when(col("cell") === 0L,
              (col("subj") % 1000L) * 50000L).otherwise(0L)).as("v"))
        graft.operators.StatsOps.cronbachAlpha(pre, "cell", "subj",
            "item", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH bg AS (SELECT user_id % 2 AS cell, user_id AS subj,
            CAST(event_id % 3 AS BIGINT) AS item,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) +
              CASE WHEN user_id % 2 = 0 THEN (user_id % 1000) * 50000
                ELSE 0 END AS v
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2, event_id % 3),
        kc AS (SELECT cell, CAST(count(DISTINCT item) AS BIGINT) AS k
          FROM bg GROUP BY 1),
        ss AS (SELECT bg.cell, bg.subj, count(*) AS nb,
            count(DISTINCT item) AS gb, max(kc.k) AS k,
            CAST(sum(v) AS BIGINT) AS tot
          FROM bg JOIN kc ON bg.cell = kc.cell GROUP BY 1, 2),
        drp AS (SELECT cell, max(k) AS k,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 0 ELSE 1 END)
              AS BIGINT) AS n_dropped,
            CAST(sum(CASE WHEN nb = k AND gb = k THEN 1 ELSE 0 END)
              AS BIGINT) AS n_subjects,
            sum(CASE WHEN nb = k AND gb = k
              THEN CAST(tot AS HUGEINT) ELSE 0 END) AS st,
            sum(CASE WHEN nb = k AND gb = k
              THEN CAST(tot AS HUGEINT) * tot ELSE 0 END) AS stt
          FROM ss GROUP BY 1),
        dt AS (SELECT cell, k, n_dropped, n_subjects,
            n_subjects * stt - st * st AS dtot FROM drp),
        items AS (SELECT bg.cell, bg.item,
            CAST(count(*) AS HUGEINT) AS ni,
            sum(CAST(bg.v AS HUGEINT)) AS si,
            sum(CAST(bg.v AS HUGEINT) * bg.v) AS sii
          FROM bg JOIN ss ON bg.cell = ss.cell AND bg.subj = ss.subj
          WHERE ss.nb = ss.k AND ss.gb = ss.k
          GROUP BY 1, 2),
        di AS (SELECT cell, sum(ni * sii - si * si) AS ditems
          FROM items GROUP BY 1)
        SELECT dt.cell, dt.k, dt.n_subjects, dt.n_dropped,
          CASE WHEN dt.n_subjects > 0 AND dt.k >= 2 AND dt.dtot > 0
            THEN CAST(
              CASE WHEN dt.dtot - di.ditems < 0 THEN -1
                WHEN dt.dtot - di.ditems = 0 THEN 0 ELSE 1 END *
              ((1000 * dt.k * abs(dt.dtot - di.ditems)) //
                ((dt.k - 1) * dt.dtot)) AS BIGINT) END AS alpha_milli
        FROM dt LEFT JOIN di ON dt.cell = di.cell
        ORDER BY dt.cell""")),

    // ------------------------------------------------------------------
    // q290 — Hodges–Lehmann shift (StatsOps.hodgesLehmann): the
    // robust EFFECT SIZE the two-sample tests only gate — the median
    // of all m·n pairwise differences, in the column's own units,
    // computed from the two value-count frames (never materializing
    // pairs; the grid guard applies). Flag 'A' odd lines planted +7
    // quantity: 'A' reads hl_shift −7 exactly (A − B orientation,
    // group "0" is A); N/R read 0.
    // ------------------------------------------------------------------
    "q290_hodges_lehmann" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_returnflag").as("cell"),
            expr("l_linenumber % 2").as("grp"),
            (col("l_quantity").cast("long") +
              when(col("l_returnflag") === "A" &&
                expr("l_linenumber % 2 = 1"), 7L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.hodgesLehmann(li, "cell", "grp", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_returnflag AS cell,
            CAST(l_linenumber % 2 AS VARCHAR) AS grp,
            CAST(l_quantity AS BIGINT) +
              CASE WHEN l_returnflag = 'A' AND l_linenumber % 2 = 1
                THEN 7 ELSE 0 END AS v
          FROM lineitem),
        ga AS (SELECT cell, min(grp) AS ga FROM base GROUP BY 1),
        gvc AS (SELECT base.cell, grp = ga AS isa, v,
            CAST(count(*) AS BIGINT) AS cnt
          FROM base JOIN ga ON base.cell = ga.cell GROUP BY 1, 2, 3),
        da AS (SELECT cell, v AS va, cnt AS cna FROM gvc WHERE isa),
        db AS (SELECT cell, v AS vb, cnt AS cnb FROM gvc
          WHERE NOT isa),
        diffs AS (SELECT da.cell, va - vb AS d,
            CAST(sum(CAST(cna AS HUGEINT) * cnb) AS BIGINT) AS w
          FROM da JOIN db ON da.cell = db.cell GROUP BY 1, 2),
        med AS (SELECT cell, min(d) AS hl_shift,
            CAST(max(ntot) AS BIGINT) AS n_pairs FROM (
            SELECT cell, d,
              sum(w) OVER (PARTITION BY cell ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum,
              sum(w) OVER (PARTITION BY cell) AS ntot
            FROM diffs) WHERE cum * 2 >= ntot GROUP BY 1),
        tot AS (SELECT cell,
            CAST(sum(CASE WHEN isa THEN cnt ELSE 0 END) AS BIGINT)
              AS m,
            CAST(sum(CASE WHEN NOT isa THEN cnt ELSE 0 END) AS BIGINT)
              AS n
          FROM gvc GROUP BY 1)
        SELECT tot.cell, tot.m, tot.n, med.n_pairs, med.hl_shift
        FROM tot LEFT JOIN med ON tot.cell = med.cell
        ORDER BY tot.cell""")),

    // ------------------------------------------------------------------
    // q291 — sign test (StatsOps.signTest): the assumption-free paired
    // gate, here in its one-sample-median form — is each type's value
    // distribution centered at the hypothesized 35.00 (cents 350000)?
    // The error cell is planted +40000, pushing its mass above the
    // hypothesis: it alone reads past the 5% line (z = 3164 at
    // sf0.01) while the other four straddle zero inside ±2 — the
    // generator's actual median sits near the hypothesis. Exact ties
    // with the hypothesis land in n_zero — dropped AND counted.
    // ------------------------------------------------------------------
    "q291_sign_test" -> GraftQuery(
      build = (s, d) => {
        val ev = events(s, d)
          .filter(col("value").isNotNull)
          .select(col("event_type").as("cell"),
            (cents(col("value")) +
              when(col("event_type") === "error", 40000L)
                .otherwise(0L)).as("a"),
            lit(350000L).as("b"))
        graft.operators.StatsOps.signTest(ev, "cell", "a", "b")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT event_type AS cell,
            CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) +
              CASE WHEN event_type = 'error' THEN 40000 ELSE 0 END
              - 350000 AS d
          FROM events WHERE value IS NOT NULL),
        ag AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_pos,
            CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_neg,
            CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_zero
          FROM base GROUP BY 1)
        SELECT cell, n_pairs, n_pos, n_neg, n_zero,
          CASE WHEN n_pos + n_neg = 0 THEN NULL
            WHEN abs(n_pos - n_neg) <= 1 THEN 0
            ELSE CAST(CASE WHEN n_pos < n_neg THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (1000000 * (abs(n_pos - n_neg) - 1) *
                  (abs(n_pos - n_neg) - 1)) // (n_pos + n_neg)
                AS DOUBLE))) AS BIGINT) AS BIGINT) END AS z_milli
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q292 — Cox–Stuart trend test (StatsOps.coxStuart): pair each
    // first-half day with its second-half counterpart and sign-test
    // later − earlier — the O(n) distribution-free drift gate
    // complementing q247's all-pairs Mann–Kendall. The view cell's
    // daily revenue is planted a +50-per-day linear drift (≈ 750
    // between paired days, comparable to the daily noise): it reads
    // 13/2 increasing pairs, z = 2581 — the only cell past the 5%
    // line; the others read 5–8 of 15 either way, |z| ≤ 1.1. 30
    // daily periods → 15 pairs, middle day dropped if odd.
    // ------------------------------------------------------------------
    "q292_cox_stuart" -> GraftQuery(
      build = (s, d) => {
        val daily = events(s, d)
          .groupBy(col("event_type").as("grp"),
            expr(s"(ts div 1000) div $DayUs").as("period"))
          .agg(sum(cents(col("value"))).as("vc"))
          .select(col("grp"), col("period"),
            (expr("vc div 10000") +
              when(col("grp") === "view",
                (col("period") - 20000L) * 50L).otherwise(0L)).as("v"))
        graft.operators.StatsOps.coxStuart(daily, "grp", "period", "v")
          .orderBy("cell")
      },
      oracle = Some(s"""
        WITH daily AS (SELECT event_type AS grp,
            epoch_us(ts) // $DayUs AS period,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000
              AS BIGINT)) AS BIGINT) // 10000 +
              CASE WHEN event_type = 'view'
                THEN (epoch_us(ts) // $DayUs - 20000) * 50 ELSE 0 END
              AS v
          FROM events GROUP BY 1, 2),
        idx AS (SELECT grp, period, v,
            CAST(row_number() OVER (PARTITION BY grp ORDER BY period)
              AS BIGINT) AS rn,
            CAST(count(*) OVER (PARTITION BY grp) AS BIGINT) AS n
          FROM daily),
        firsth AS (SELECT grp, rn AS i, v AS va, n FROM idx
          WHERE rn <= n // 2),
        secondh AS (SELECT grp, rn - (n - n // 2) AS i, v AS vb
          FROM idx WHERE rn > n - n // 2),
        paired AS (SELECT firsth.grp AS cell, firsth.n,
            vb - va AS d
          FROM firsth JOIN secondh ON firsth.grp = secondh.grp
            AND firsth.i = secondh.i),
        ag AS (SELECT cell, max(n) AS n,
            CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_pos,
            CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_neg,
            CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_zero
          FROM paired GROUP BY 1)
        SELECT cell, n, n_pairs, n_pos, n_neg, n_zero,
          CASE WHEN n_pos + n_neg = 0 THEN NULL
            WHEN abs(n_pos - n_neg) <= 1 THEN 0
            ELSE CAST(CASE WHEN n_pos < n_neg THEN -1 ELSE 1 END *
              CAST(floor(sqrt(CAST(
                (1000000 * (abs(n_pos - n_neg) - 1) *
                  (abs(n_pos - n_neg) - 1)) // (n_pos + n_neg)
                AS DOUBLE))) AS BIGINT) AS BIGINT) END AS z_milli
        FROM ag ORDER BY cell""")),

    // ------------------------------------------------------------------
    // q293 — standardized effect sizes (StatsOps.effectSizes): Cohen's
    // d, Hedges' g and Glass's Δ per return flag over the q287 group
    // split — the "how big, in noise units" companion q220's Welch t
    // only gates. Flag 'N' odd lines planted +10 quantity ⇒ d ≈
    // −10/14.4 ≈ −0.69 (A = even lines, orientation A − B); A/R read
    // the independence floor; g shrinks d by the exact rational
    // (4df−4)/(4df−1).
    // ------------------------------------------------------------------
    "q293_effect_sizes" -> GraftQuery(
      build = (s, d) => {
        val li = lineitem(s, d)
          .select(col("l_returnflag").as("cell"),
            expr("l_linenumber % 2").as("grp"),
            (col("l_quantity").cast("long") +
              when(col("l_returnflag") === "N" &&
                expr("l_linenumber % 2 = 1"), 10L).otherwise(0L))
              .as("v"))
        graft.operators.StatsOps.effectSizes(li, "cell", "grp", "v")
          .orderBy("cell")
      },
      oracle = Some("""
        WITH base AS (SELECT l_returnflag AS cell,
            CAST(l_linenumber % 2 AS VARCHAR) AS grp,
            CAST(l_quantity AS BIGINT) +
              CASE WHEN l_returnflag = 'N' AND l_linenumber % 2 = 1
                THEN 10 ELSE 0 END AS v
          FROM lineitem),
        ga AS (SELECT cell, min(grp) AS ga FROM base GROUP BY 1),
        st AS (SELECT base.cell,
            CAST(sum(CASE WHEN grp = ga THEN 1 ELSE 0 END) AS BIGINT)
              AS n1,
            CAST(sum(CASE WHEN grp <> ga THEN 1 ELSE 0 END) AS BIGINT)
              AS n2,
            sum(CASE WHEN grp = ga THEN CAST(v AS HUGEINT)
              ELSE 0 END) AS s1,
            sum(CASE WHEN grp <> ga THEN CAST(v AS HUGEINT)
              ELSE 0 END) AS s2,
            sum(CASE WHEN grp = ga THEN CAST(v AS HUGEINT) * v
              ELSE 0 END) AS q1,
            sum(CASE WHEN grp <> ga THEN CAST(v AS HUGEINT) * v
              ELSE 0 END) AS q2
          FROM base JOIN ga ON base.cell = ga.cell GROUP BY 1),
        dd AS (SELECT cell, n1, n2,
            CAST(n2 AS HUGEINT) * s1 - CAST(n1 AS HUGEINT) * s2
              AS dl,
            CAST(n1 AS HUGEINT) * q1 - s1 * s1 AS d1,
            CAST(n2 AS HUGEINT) * q2 - s2 * s2 AS d2
          FROM st),
        pp AS (SELECT cell, n1, n2, dl, d1, d2,
            CAST(n2 AS HUGEINT) * d1 + CAST(n1 AS HUGEINT) * d2
              AS pool
          FROM dd),
        fin AS (SELECT cell, n1, n2,
            CASE WHEN n1 > 0 AND n2 > 0 AND n1 + n2 > 2 AND pool > 0
              THEN CAST(CASE WHEN dl < 0 THEN -1 WHEN dl = 0 THEN 0
                  ELSE 1 END *
                CAST(floor(sqrt(CAST(
                  least(((((1000000 * abs(dl)) //
                      (CAST(n1 AS HUGEINT) * n2)) *
                    (abs(dl) * (n1 + n2 - 2))) // pool),
                    1000000000000)
                  AS DOUBLE))) AS BIGINT) AS BIGINT) END AS d_milli,
            CASE WHEN n1 > 0 AND n2 > 1 AND d2 > 0 THEN
              CAST(CASE WHEN dl < 0 THEN -1 WHEN dl = 0 THEN 0
                  ELSE 1 END *
                CAST(floor(sqrt(CAST(
                  least(((((1000000 * abs(dl)) //
                      (CAST(n1 AS HUGEINT) * n1 * n2)) *
                    (abs(dl) * (n2 - 1))) // d2),
                    1000000000000)
                  AS DOUBLE))) AS BIGINT) AS BIGINT) END
              AS glass_milli
          FROM pp)
        SELECT cell, n1, n2, d_milli,
          CASE WHEN d_milli IS NOT NULL THEN
            CAST(CASE WHEN d_milli < 0 THEN -1 WHEN d_milli = 0 THEN 0
                ELSE 1 END *
              ((abs(d_milli) * (4 * (n1 + n2 - 2) - 4)) //
                (4 * (n1 + n2 - 2) - 1)) AS BIGINT) END AS g_milli,
          glass_milli
        FROM fin ORDER BY cell""")),
  )
}
