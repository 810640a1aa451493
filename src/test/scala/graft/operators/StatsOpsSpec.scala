package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class StatsOpsSpec extends SparkSuite {
  import spark.implicits._

  test("histogram: width boundaries land right, edges clamp into end buckets") {
    // lo=0 width=10 buckets=3: -5→0(clamp), 0→0, 9→0, 10→1, 29→2, 35→2(clamp)
    val df = Seq(-5L, 0L, 9L, 10L, 29L, 35L).toDF("v")
    val out = StatsOps.histogram(df, col("v"), 0L, 10L, 3)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == Seq((0L, 3L, -5L, 9L), (1L, 1L, 10L, 10L), (2L, 2L, 29L, 35L)))
  }

  test("zscoreFlags: flags exactly the rows with |x - mean| > k·σ, " +
      "integer form agrees with the float definition") {
    // group of 10: nine at 100, one at 1000 — mean 190, σ = √72900 = 270;
    // k=2 → threshold 540: only the 1000 row (|810|) flags
    val df = ((1 to 9).map(i => (i.toLong, "a", 100L)) :+ (10L, "a", 1000L))
      .toDF("id", "g", "v")
    val out = StatsOps.zscoreFlags(df, "g", "v", 2)
      .filter(col("is_outlier")).select("id").as[Long].collect().toSeq
    assert(out == Seq(10L))
  }

  test("zscoreFlags: null-group rows survive as their own group (the " +
      "flag join is null-safe; plain equality silently dropped them)") {
    val df = ((1 to 9).map(i => (i.toLong, Option("a"), 100L)) ++
      Seq((10L, Option.empty[String], 5L), (11L, Option.empty[String], 5L)))
      .toDF("id", "g", "v")
    val out = StatsOps.zscoreFlags(df, "g", "v", 2)
    assert(out.count() === 11L, "every input row must come back")
    // the null group is constant -> not outliers, but PRESENT and flagged false
    val nullRows = out.filter(col("g").isNull)
      .select("id", "is_outlier").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(nullRows === Set((10L, false), (11L, false)))
  }

  test("zscoreFlags: a constant group (zero variance) flags nothing") {
    val df = (1 to 5).map(i => (i.toLong, "a", 7L)).toDF("id", "g", "v")
    val out = StatsOps.zscoreFlags(df, "g", "v", 3)
      .filter(col("is_outlier")).count()
    assert(out == 0L)
  }

  test("zscoreFlags broadcasts the stats side (fact table never shuffles " +
      "for the flag join)") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 3}", i.toLong))
      .toDF("id", "g", "v")
    val plan = StatsOps.zscoreFlags(df, "g", "v", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("profile: per-column stats from one pass, nulls counted, " +
      "canonical ord stringified") {
    val df = Seq(
      (Some("x"), Some(10L)), (Some("y"), None), (None, Some(30L)),
      (Some("x"), Some(10L)))
      .toDF("s", "n")
    val out = StatsOps.profile(df, Seq(
      StatsOps.ProfileCol("s", col("s")),
      StatsOps.ProfileCol("n", col("n"))))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toSeq
    assert(out == Seq(
      ("n", 4L, 1L, 2L, "10", "30"),
      ("s", 4L, 1L, 2L, "x", "y")))
  }

  test("profile never Expands rows or sorts them (the multi-distinct " +
      "formulation does both — see StatsOps.profile scaladoc)") {
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("a", "b")
    val plan = StatsOps.profile(df, Seq(
      StatsOps.ProfileCol("a", col("a")),
      StatsOps.ProfileCol("b", col("b"))))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // a standalone Sort node renders "Sort [" — none may appear
    assert(!plan.contains("Sort ["), plan)
    // SortAggregate is legitimate ONLY keyless: string min/max buffers
    // are not UnsafeRow-mutable so the global (key=[]) aggregate
    // degrades to SortAggregate, but with no grouping key it imposes no
    // child ordering and sorts nothing (see profile's scaladoc). A
    // KEYED SortAggregate would mean full row sorts — the regression
    // this spec exists to catch.
    val keyedSortAggs = "SortAggregate\\(key=\\[[^\\]]".r.findAllIn(plan).toList
    assert(keyedSortAggs.isEmpty, s"keyed SortAggregate in plan: $plan")
  }

  test("robustStats: median and MAD on known data, interpolated halves " +
      "exact, outliers counted at |x - med| > k·MAD") {
    // group a: 1..9 plus spike 1000 → sorted deviations from med=5.5
    // give MAD=2.5; k=3 → threshold 7.5: only the spike (994.5) flags
    val df = ((1L to 9L).map(v => ("a", v)) :+ ("a", 1000L)).toDF("g", "v")
    val r = StatsOps.robustStats(df, "g", "v", 3).collect()(0)
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Double]("med") == 5.5)
    assert(r.getAs[Double]("mad") == 2.5)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("robustStats: the spike that masks itself from a z-test still " +
      "flags under MAD (the robustness point)") {
    // 12 points at 100 plus one at 5000: σ ≈ 1306, z of the spike ≈ 3.6
    // but z-threshold k=4 misses it; MAD = 0 path guarded by taking
    // values with real spread: use 90..101 so MAD > 0
    val vals = (90L to 101L).map(v => ("a", v)) :+ ("a", 5000L)
    val df = vals.toDF("g", "v")
    val zOut = StatsOps.zscoreFlags(df, "g", "v", 4)
      .filter(col("is_outlier")).count()
    val rOut = StatsOps.robustStats(df, "g", "v", 4)
      .collect()(0).getAs[Long]("n_outliers")
    assert(zOut == 0L, "z-test at k=4 should be masked by its own spike")
    assert(rOut == 1L, "MAD test must still flag the spike")
  }

  test("robustStats: constant group has MAD 0 and flags nothing") {
    val df = (1 to 5).map(_ => ("a", 7L)).toDF("g", "v")
    val r = StatsOps.robustStats(df, "g", "v", 3).collect()(0)
    assert(r.getAs[Double]("mad") == 0.0 && r.getAs[Long]("n_outliers") == 0L)
  }

  test("linearFit: recovers an exact line (slope 3, intercept 7) with " +
      "corr_milli 1000 from sufficient statistics") {
    val df = (1L to 10L).map(x => ("a", x, 3 * x + 7)).toDF("g", "x", "y")
    val r = StatsOps.linearFit(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("slope_milli") == 3000L)
    assert(r.getAs[Long]("intercept_milli") == 7000L)
    assert(r.getAs[Long]("corr_milli") == 1000L)
  }

  test("linearFit: negative slope floors correctly (pmod identity, not " +
      "truncation) and corr_milli is negative") {
    // n=3, sx=7, sy=19, sxx=21, sxy=32 → cov = 96−133 = −37,
    // varx = 63−49 = 14 → slope = −37/14 ≈ −2.642857: floor milli is
    // −2643 (truncation toward zero would give −2642)
    val df = Seq(("a", 1L, 10L), ("a", 2L, 7L), ("a", 4L, 2L))
      .toDF("g", "x", "y")
    val r = StatsOps.linearFit(df, "g", "x", "y").collect()(0)
    assert(r.getAs[Long]("slope_milli") == -2643L)
    assert(r.getAs[Long]("corr_milli") < 0L)
  }

  test("linearFit: constant x (degenerate) yields null slope/intercept/" +
      "corr, never a division error") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 9L)).toDF("g", "x", "y")
    val r = StatsOps.linearFit(df, "g", "x", "y").collect()(0)
    assert(r.isNullAt(r.fieldIndex("slope_milli")))
    assert(r.isNullAt(r.fieldIndex("corr_milli")))
  }

  test("linearFit: exact on a longer series regardless of partitioning " +
      "(decimal sums are order-independent)") {
    val all = (1L to 50L).map(x => ("a", x, 5 * x + 11)).toDF("g", "x", "y")
    val direct = StatsOps.linearFit(all.repartition(7), "g", "x", "y")
      .collect()(0)
    assert(direct.getAs[Long]("slope_milli") == 5000L &&
      direct.getAs[Long]("intercept_milli") == 11000L)
    assert(direct.getAs[Long]("corr_milli") == 1000L)
  }

  test("equiDepthHistogram: near-equal bucket counts, contiguous value " +
      "ranges, remainder rows in the leading tiles") {
    val df = (1L to 21L).map(v => ("a", v, v)).toDF("g", "v", "id")
    val out = StatsOps.equiDepthHistogram(df, "g", "v", "id", 4)
      .orderBy("tile").collect()
      .map(r => (r.getAs[Long]("tile"), r.getAs[Long]("n"),
        r.getAs[Long]("lo_v"), r.getAs[Long]("hi_v"))).toSeq
    // 21 rows / 4 tiles: 6,5,5,5 (SQL ntile remainder-first)
    assert(out == Seq((1L, 6L, 1L, 6L), (2L, 5L, 7L, 11L),
      (3L, 5L, 12L, 16L), (4L, 5L, 17L, 21L)))
  }

  test("chiSquare2x2: perfect association maxes the statistic at N, " +
      "perfect independence zeroes it") {
    // 10 rows where a == b exactly: chi2 = N = 10 → 10,000,000 micro
    val dep = ((1 to 5).map(_ => ("g", true, true)) ++
      (1 to 5).map(_ => ("g", false, false))).toDF("grp", "a", "b")
    val r1 = StatsOps.chiSquare2x2(dep, "grp", col("a"), col("b")).collect()(0)
    assert(r1.getAs[Long]("chi2_micro") == 10000000L)
    assert(r1.getAs[Int]("significant_05") == 1)
    // balanced 2x2 (equal cells): d = 0 → chi2 = 0, not significant
    val ind = Seq(("g", true, true), ("g", true, false),
      ("g", false, true), ("g", false, false)).toDF("grp", "a", "b")
    val r2 = StatsOps.chiSquare2x2(ind, "grp", col("a"), col("b")).collect()(0)
    assert(r2.getAs[Long]("chi2_micro") == 0L)
    assert(r2.getAs[Int]("significant_05") == 0)
  }

  test("chiSquare2x2: hand-computed statistic floors exactly") {
    // n11=3 n12=1 n21=1 n22=3: d=8, N=8, den=4·4·4·4=256
    // chi2 = 8·64/256 = 2.0 exactly → 2,000,000 micro, not significant
    val df = (Seq.fill(3)(("g", true, true)) ++ Seq(("g", true, false)) ++
      Seq(("g", false, true)) ++ Seq.fill(3)(("g", false, false)))
      .toDF("grp", "a", "b")
    val r = StatsOps.chiSquare2x2(df, "grp", col("a"), col("b")).collect()(0)
    assert((r.getAs[Long]("n11"), r.getAs[Long]("n12"),
      r.getAs[Long]("n21"), r.getAs[Long]("n22")) == (3L, 1L, 1L, 3L))
    assert(r.getAs[Long]("chi2_micro") == 2000000L)
    assert(r.getAs[Int]("significant_05") == 0)
  }

  test("chiSquare2x2: a degenerate margin (everyone converted) yields " +
      "null statistic, never a division error") {
    val df = Seq(("g", true, true), ("g", false, true)).toDF("grp", "a", "b")
    val r = StatsOps.chiSquare2x2(df, "grp", col("a"), col("b")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2_micro")))
    assert(r.isNullAt(r.fieldIndex("significant_05")))
  }

  test("histogramDriftChi2: identical snapshots score zero in every " +
      "bucket; a shifted snapshot scores positive") {
    val a = (1L to 100L).map(v => v % 40).toDF("v")
    val same = StatsOps.histogramDriftChi2(a, a, col("v"), 0L, 10L, 4)
      .collect()
    assert(same.forall(_.getAs[Long]("chi2_term_micro") == 0L))
    // shift every value up one bucket: strong drift, every bucket moves
    val b = (1L to 100L).map(v => (v % 40) + 10).toDF("v")
    val drift = StatsOps.histogramDriftChi2(a, b, col("v"), 0L, 10L, 8)
      .collect()
    assert(drift.map(r => Option(r.getAs[java.lang.Long]("chi2_term_micro"))
      .map(_.toLong).getOrElse(0L)).sum > 0L)
  }

  test("histogramDriftChi2: buckets empty on one side count zero; a " +
      "hand case floors exactly") {
    // before: 4 rows in bucket 0; after: 4 rows in bucket 1
    // term_0: (4·4 − 0·4)²/(4·4·4) = 4.0 → 4,000,000; term_1 symmetric
    val a = Seq(1L, 2L, 3L, 4L).toDF("v")
    val b = Seq(11L, 12L, 13L, 14L).toDF("v")
    val out = StatsOps.histogramDriftChi2(a, b, col("v"), 0L, 10L, 2)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_before"),
        r.getAs[Long]("n_after"), r.getAs[Long]("chi2_term_micro"))).toSeq
    assert(out == Seq((0L, 4L, 0L, 4000000L), (1L, 0L, 4L, 4000000L)))
  }

  test("histogramDriftChi2: exact past the long-denominator overflow " +
      "point (n1·n2·bucket_total > 2^63 — the case long arithmetic " +
      "silently wrapped)") {
    // 2.1M rows per snapshot, fully separated buckets: the denominator
    // n1·n2·(o1+o2) = 2.1e6³ ≈ 9.3e18 exceeds Long.MaxValue, and each
    // bucket's exact term collapses to 10⁶·N = 2.1e12 micro-units
    val n = 2100000L
    val a = spark.range(n).selectExpr("1L as v")
    val b = spark.range(n).selectExpr("11L as v")
    val out = StatsOps.histogramDriftChi2(a, b, col("v"), 0L, 10L, 2)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("chi2_term_micro")))
      .toSeq
    assert(out == Seq((0L, 1000000L * n), (1L, 1000000L * n)))
  }

  test("equiDepthHistogram: buckets are per-group and value ranges " +
      "never overlap within a group") {
    val df = ((1L to 16L).map(v => ("a", v * 10, v)) ++
      (1L to 8L).map(v => ("b", v, v + 100))).toDF("g", "v", "id")
    val rows = StatsOps.equiDepthHistogram(df, "g", "v", "id", 4)
      .orderBy("g", "tile").collect()
    val byG = rows.groupBy(_.getAs[String]("g"))
    assert(byG("a").length == 4 && byG("b").length == 4)
    for (grp <- byG.values; Array(a, b) <- grp.sliding(2))
      assert(a.getAs[Long]("hi_v") < b.getAs[Long]("lo_v"))
  }

  test("robustStats: groups are independent and the stats joins " +
      "broadcast (fact rows never shuffle for the flag join)") {
    val df = ((1L to 5L).map(v => ("a", v)) ++ (10L to 14L).map(v => ("b", v)))
      .toDF("g", "v")
    val out = StatsOps.robustStats(df, "g", "v", 3)
    val rows = out.orderBy("g").collect()
    assert(rows.map(_.getAs[Double]("med")).toSeq == Seq(3.0, 12.0))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("clusterPurity: hand-computed purity and gini, majority tie " +
    "breaks to the SMALLEST label") {
    // c1: labels 1×3, 2×1 → n=4, top=(1,3), purity=750000,
    //     gini = 1e6 - (9+1)*1e6/16 = 1e6 - 625000 = 375000
    // c2: labels 5×2, 3×2 → tie on count → top_label=3 (smallest),
    //     purity=500000, gini = 1e6 - 8e6/16 = 500000
    // c3: single label → purity 1e6, gini 0
    val df = Seq(
      ("c1", 1), ("c1", 1), ("c1", 1), ("c1", 2),
      ("c2", 5), ("c2", 5), ("c2", 3), ("c2", 3),
      ("c3", 9)
    ).toDF("cl", "lbl")
    val got = StatsOps.clusterPurity(df, "cl", "lbl").orderBy("cluster")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      ("c1", 4L, 2L, 1, 3L, 750000L, 375000L),
      ("c2", 4L, 2L, 3, 2L, 500000L, 500000L),
      ("c3", 1L, 1L, 9, 1L, 1000000L, 0L)))
  }

  test("clusterPurity: gini survives counts whose squared sum wraps a " +
    "long times the ppm scale (decimal path)") {
    // one cluster, one label, 4e9 rows — simulated by feeding the
    // aggregate the same shape via many rows is infeasible in a unit
    // test; instead verify the decimal expressions directly on a
    // pre-aggregated (cluster, label, cnt) frame routed through the
    // same arithmetic: purity/gini of a single 4e9-count label must be
    // exactly (1e6, 0), not an overflow artifact.
    val big = 4000000000L
    val df = spark.range(1).select(lit("c").as("cl"), lit(7).as("lbl"))
    // exercise the public path on a small frame, then the arithmetic
    // identity on the big count via SQL (same expression text as the
    // operator's select)
    val small = StatsOps.clusterPurity(df, "cl", "lbl").collect()(0)
    assert(small.getLong(5) === 1000000L && small.getLong(6) === 0L)
    val r = spark.sql(
      s"""SELECT (cast($big as decimal(38,0)) * $big * 1000000)
            div (cast($big as decimal(38,0)) * $big) AS one_m""")
      .collect()(0)
    assert(r.getLong(0) === 1000000L)
  }

  test("rfmSegments: quartile tiles on a hand-built roster, tile 1 best " +
      "on every axis") {
    val day = 86400000L
    // entity k: last day 100-(k-1), k tx of amount 10k each (k=4..1 best→worst)
    val tx = (1 to 4).flatMap { k =>
      (1 to 5 - k).map(i => ("A", k.toLong, (101 - k) * day, (5 - k) * 10L))
    }.toDF("seg", "id", "t", "amt")
    val got = StatsOps.rfmSegments(tx, "seg", "id", "t", "amt", 4, 100 * day)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got(1L) === ((0L, 4L, 160L, 111L)))
    assert(got(2L) === ((1L, 3L, 90L, 222L)))
    assert(got(3L) === ((2L, 2L, 40L, 333L)))
    assert(got(4L) === ((3L, 1L, 10L, 444L)))
  }

  test("rfmSegments: full metric ties break by entity id and the result " +
      "is partitioning-invariant; segments tile independently") {
    val tx = Seq(("A", 1L, 1000L, 50L), ("A", 2L, 1000L, 50L),
      ("B", 9L, 2000L, 10L), ("B", 8L, 2000L, 10L))
      .toDF("seg", "id", "t", "amt")
    def run(df: org.apache.spark.sql.DataFrame) =
      StatsOps.rfmSegments(df, "seg", "id", "t", "amt", 2, 2000L)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(5)).toMap
    val a = run(tx.repartition(7))
    val b = run(tx.coalesce(1))
    assert(a === b)
    // identical metrics: the id order decides tile 1 vs 2, per segment
    assert(a(("A", 1L)) === 111L && a(("A", 2L)) === 222L)
    assert(a(("B", 8L)) === 111L && a(("B", 9L)) === 222L)
  }

  test("kmSurvival: the textbook curve — censored subjects leave the " +
      "risk set without counting as churn") {
    // durations (event): 1(d), 2(d), 3(c), 4(d), 5(c) → steps at 1,2,4:
    // S = 1e6·4/5 = 800000, ·3/4 = 600000, ·1/2 = 300000
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 0L),
      ("a", 4L, 1L), ("a", 5L, 0L)).toDF("g", "dur", "ev")
    val got = StatsOps.kmSurvival(df, "g", "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === Seq((1L, 5L, 1L, 800000L), (2L, 4L, 1L, 600000L),
      (4L, 2L, 1L, 300000L)))
  }

  test("kmSurvival floors at EVERY step (sequential lattice), handles " +
      "tied deaths, and a censored-only cohort emits no curve") {
    // cohort a: deaths at 1 and 2 among 3 → 666666 then 333333 (the
    // end-floored float product would give 333333.33→ same here, but
    // 666666·1/2 vs 1e6·2/3·1/2 differ in the last digit: per-step
    // flooring is the DEFINED semantics both engines share).
    // cohort b: two deaths tied at t=1 → one step, d=2.
    // cohort c: all censored → no rows.
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 0L),
      ("b", 1L, 1L), ("b", 1L, 1L), ("b", 2L, 0L),
      ("c", 9L, 0L)).toDF("g", "dur", "ev")
    val got = StatsOps.kmSurvival(df, "g", "dur", "ev")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === Set(("a", 1L, 3L, 1L, 666666L), ("a", 2L, 2L, 1L, 333333L),
      ("b", 1L, 3L, 2L, 333333L)))
  }

  test("kmSurvival is partitioning-invariant and zero-duration deaths " +
      "step at t=0 above the fold seed sentinel") {
    val rows = Seq(("a", 0L, 1L), ("a", 5L, 1L), ("a", 7L, 0L),
      ("a", 5L, 0L), ("a", 2L, 1L))
    def run(df: org.apache.spark.sql.DataFrame) =
      StatsOps.kmSurvival(df, "g", "dur", "ev").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val a = run(rows.toDF("g", "dur", "ev").repartition(7))
    val b = run(rows.toDF("g", "dur", "ev").coalesce(1))
    assert(a === b)
    // n=5: t=0 r=5 d=1 → 800000; t=2 r=4 d=1 → 600000; t=5 r=3 d=1 → 400000
    assert(a === Set((0L, 5L, 1L, 800000L), (2L, 4L, 1L, 600000L),
      (5L, 3L, 1L, 400000L)))
  }

  test("rfmSegments plans the three quartile windows on one segment " +
      "exchange over the aggregated frame (two hash exchanges total)") {
    val tx = Seq(("A", 1L, 1000L, 50L), ("A", 2L, 2000L, 60L))
      .toDF("seg", "id", "t", "amt")
    val plan = StatsOps.rfmSegments(tx, "seg", "id", "t", "amt", 4, 2000L)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 2, plan)
  }

  test("weightedMedian: lower weighted median by the exact halving " +
      "test, repeated values pool their weight") {
    val df = Seq(
      ("a", 10L, 1L), ("a", 20L, 1L), ("a", 30L, 2L), // tot 4: cum 1,2,4
      ("b", 5L, 3L), ("b", 7L, 1L),                   // tot 4: cum 3,4
      ("c", 9L, 2L), ("c", 9L, 2L), ("c", 100L, 1L))  // 9 pools to w=4 of 5
      .toDF("g", "v", "w")
    val out = StatsOps.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // a: first cum with 2·cum ≥ 4 is v=20 (cum 2); b: v=5 (2·3 ≥ 4)
    assert(out == Map("a" -> ((20L, 4L)), "b" -> ((5L, 4L)),
      "c" -> ((9L, 5L))))
  }

  test("weightedMedian: zero-weight values cannot move the median; an " +
      "all-zero group disappears; unit weights degrade to the row median") {
    val df = Seq(
      ("a", 1L, 0L), ("a", 2L, 1L), ("a", 3L, 1L), ("a", 4L, 1L),
      ("z", 1L, 0L), ("z", 2L, 0L))
      .toDF("g", "v", "w")
    val out = StatsOps.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 3L)) // rows 2,3,4 → lower median 3; no "z"
  }

  test("weightedMedian: NULL values and non-positive weights are gated " +
      "out up front (the documented row gate; keeps both engines off " +
      "the NULLS FIRST/LAST cliff)") {
    val df = Seq(
      ("a", Option(2L), 1L), ("a", None, 100L), ("a", Option(4L), 1L),
      ("a", Option(6L), -50L), ("a", Option(8L), 1L))
      .toDF("g", "v", "w")
    val out = StatsOps.weightedMedian(df, "g", "v", "w")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // survivors: 2, 4, 8 at weight 1 → lower median 4, total 3
    assert(out == Map("a" -> ((4L, 3L))))
  }

  test("weightedMedian compresses before windowing (the window sees the " +
      "value domain, not the rows) and is partitioning-invariant; the " +
      "two-level bucket decomposition matches the single-walk reference " +
      "at every bucket width") {
    val rows = (1L to 400L).map(i => (s"g${i % 2}", (i * 31L) % 20L, i % 5L))
    val df = rows.toDF("g", "v", "w")
    def run(d: org.apache.spark.sql.DataFrame, width: Long) =
      StatsOps.weightedMedian(d, "g", "v", "w", width).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df.repartition(8), 4L) === run(df.coalesce(1), 4L))
    // driver-side reference: lower weighted median per group
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.filter(_._2 > 0).sortBy(_._1)
      val tot = byV.map(_._2).sum
      val med = byV.scanLeft((0L, 0L)) { case ((_, c), (v, w)) => (v, c + w) }
        .drop(1).find { case (_, c) => 2 * c >= tot }.get._1
      (g, med, tot)
    }.toSet
    // widths exercising: 1 (bucket≡value), interior boundaries, one-bucket
    for (width <- Seq(1L, 3L, 4L, 7L, 1L << 40))
      assert(run(df, width) === want, s"width=$width")
    val plan = StatsOps.weightedMedian(df, "g", "v", "w", 4L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    // the bucket table joins back by broadcast — data never shuffles
    // for the median-bucket probe
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("giniConcentration: perfect equality scores 0, full concentration " +
      "scores (n-1)/n, tie order cannot move the statistic") {
    val df = Seq(
      ("eq", 1L, 10L), ("eq", 2L, 10L), ("eq", 3L, 10L), ("eq", 4L, 10L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L), ("one", 4L, 40L),
      ("tie", 1L, 5L), ("tie", 2L, 5L), ("tie", 3L, 10L),
      ("zero", 1L, 0L), ("zero", 2L, 0L))
      .toDF("g", "id", "x")
    val out = StatsOps.giniConcentration(df, "g", "x", "id")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out("eq") == Some(0L))
    assert(out("one") == Some(750000L)) // (n-1)/n = 3/4
    // tie: ranks (1,2) on the two 5s in either order: S = 5+10+30 = 45
    // G = (2*45 - 4*20)/(3*20) = 10/60 → 166666 ppm
    assert(out("tie") == Some(166666L))
    assert(out("zero") == None) // zero total: null, not a crash
  }

  test("giniConcentration matches a driver-side reference on a skewed " +
      "roster and overflows nothing at cent-scale magnitudes") {
    val rows = (1L to 300L).map(i => ("n" + i % 3, i, (i * i) % 97L * 100000000L))
    val df = rows.toDF("g", "id", "x")
    val got = StatsOps.giniConcentration(df, "g", "x", "id")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val want = rows.groupBy(_._1).map { case (g, rs) =>
      val xs = rs.sortBy(r => (r._3, r._2)).map(_._3)
      val n = xs.length.toLong
      val t = BigInt(xs.sum)
      val s = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      g -> ((BigInt(1000000) * (2 * s - (n + 1) * t)) / (n * t)).toLong
    }
    assert(got === want)
  }

  test("paretoFrontier2D: strict dominance only — equal points both " +
      "kept, equal-x worse-y and equal-y costlier-x dropped") {
    val df = Seq(
      (1L, 0L, 1L),  // cheapest: on frontier regardless of y
      (2L, 1L, 5L), (3L, 1L, 5L), // exact duplicates: incomparable, BOTH kept
      (4L, 1L, 4L),  // equal-x, smaller y: dominated by id 2/3
      (5L, 2L, 5L),  // equal-y, higher x: dominated by id 2/3
      (6L, 2L, 6L),  // pays more, gets more: frontier
      (7L, 3L, 6L))  // equal-y, higher x than id 6: dominated
      .toDF("id", "x", "y")
    val got = StatsOps.paretoFrontier2D(df, "x", "y", 10L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("paretoFrontier2D agrees with the O(n²) dominance filter on a " +
      "pseudo-random cloud (multi-bucket prune exercised)") {
    val pts = (1L to 500L).map { i =>
      (i, (i * 7919L) % 1000L, (i * 104729L) % 1000L)
    }
    val df = pts.toDF("id", "x", "y")
    // brute force: drop any point some other point strictly dominates
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 >= y && (x2 < x || y2 > y)
      }
    }.map(_._1).toSet
    // width 100 → 10 buckets, so the pre-prune path genuinely runs
    val got = StatsOps.paretoFrontier2D(df, "x", "y", 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("paretoFrontier2D pre-prune leaves only near-frontier rows for " +
      "the single-partition exact pass") {
    // pay-more-get-more staircase: every row IS on the frontier — prune
    // must keep all; then a dominated tail must vanish before the sort
    val frontier = (1L to 50L).map(i => (i, i * 10L, i))
    val noise = (51L to 300L).map(i => (i, i * 10L, 10L)) // all dominated
    val df = (frontier ++ noise).toDF("id", "x", "y")
    val got = StatsOps.paretoFrontier2D(df, "x", "y", 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == frontier.map(_._1).toSet)
  }

  test("paretoFrontier2D: the prune table joins back by broadcast — " +
      "the data never shuffles for the prune") {
    val df = (1L to 100L).map(i => (i, i, i)).toDF("id", "x", "y")
    val plan = StatsOps.paretoFrontier2D(df, "x", "y", 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  // ------------------------------------------------------- proration

  test("prorateLargestRemainder: shares sum EXACTLY to the total per " +
      "group and match the sequential Hamilton reference") {
    val rows = for (g <- 1L to 3L; i <- 1L to 20L) yield
      (g, i, (g * 7919L + i * 104729L) % 500L + 1L)
    val total = 1000003L // deliberately not divisible by anything
    val df = rows.toDF("g", "id", "w")
    val got = StatsOps.prorateLargestRemainder(df, "g", "id", "w", total)
      .select("g", "id", "alloc").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (g <- 1L to 3L) {
      val mine = rows.filter(_._1 == g)
      val w = mine.map(r => r._2 -> r._3).toMap
      val bigW = w.values.sum
      val base = w.view.mapValues(wi => total * wi / bigW).toMap
      val rem = w.map { case (id, wi) => id -> (total * wi % bigW) }
      val extras = rem.toSeq.sortBy { case (id, r) => (-r, id) }
        .take((total - base.values.sum).toInt).map(_._1).toSet
      for ((id, b) <- base)
        assert(got((g, id)) == b + (if (extras(id)) 1L else 0L),
          s"g=$g id=$id")
      assert(mine.map(r => got((g, r._2))).sum == total, s"g=$g sum")
    }
  }

  test("prorateLargestRemainder: the textbook rounding case splits by " +
      "remainder rank with id tie-break") {
    val df = Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 1L))
      .toDF("g", "id", "w")
    val got = StatsOps.prorateLargestRemainder(df, "g", "id", "w", 10L)
      .select("id", "alloc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10 over equal thirds: floors 3,3,3; remainder 1 → lowest id wins
    assert(got == Map(1L -> 4L, 2L -> 3L, 3L -> 3L))
  }

  // ---------------------------------------------------- rolling beta

  test("rollingBeta: a series vs itself is exactly 1e6 ppm, vs its " +
      "negation exactly -1e6, and null when the reference is flat") {
    val buckets = (1L to 30L).map(i => (1L, i, (i * 17L) % 23L))
      .toDF("k", "h", "m")
    val self = StatsOps.rollingBeta(
      buckets.withColumn("x", col("m")), "k", "h", "x", "m", 5)
    val anti = StatsOps.rollingBeta(
      buckets.withColumn("x", -col("m")), "k", "h", "x", "m", 5)
    val flat = StatsOps.rollingBeta(
      (1L to 10L).map(i => (1L, i, i, 4L)).toDF("k", "h", "x", "m"),
      "k", "h", "x", "m", 5)
    // windows with var_num = 0 (first row, or 5 equal m values) are null
    assert(self.filter(col("var_num") =!= 0L)
      .select("beta_ppm").collect().forall(_.getLong(0) == 1000000L))
    assert(anti.filter(col("var_num") =!= 0L)
      .select("beta_ppm").collect().forall(_.getLong(0) == -1000000L))
    assert(flat.select("beta_ppm").collect().forall(_.isNullAt(0)))
  }

  // ------------------------------------------- period over period

  test("periodOverPeriod: first period and zero-predecessor yield null " +
      "change; drops and gains sign-split exactly") {
    val df = Seq((1L, 1L, 100L), (1L, 2L, 150L), (1L, 3L, 0L),
      (1L, 4L, 40L), (2L, 1L, 7L))
      .toDF("g", "p", "v")
    val got = StatsOps.periodOverPeriod(df, "g", "p", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(5)) None else Some(r.getLong(5)))).toMap
    assert(got((1L, 1L)).isEmpty)       // no predecessor
    assert(got((1L, 2L)).contains(500000L))   // +50%
    assert(got((1L, 3L)).contains(-1000000L)) // -100%
    assert(got((1L, 4L)).isEmpty)       // prev = 0 → undefined, not fake
    assert(got((2L, 1L)).isEmpty)
  }

  // ------------------------------------------------ audience overlap

  test("audienceOverlap counts pair intersections exactly, without " +
      "emitting empty pairs, and dedups repeated memberships") {
    val rows = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"), // dup membership must not count
      (2L, "a"), (2L, "c"),
      (3L, "a"), (3L, "b"), (3L, "c"),
      (4L, "d")) // lone category: no pair rows at all
    val df = rows.toDF("u", "cat")
    val got = StatsOps.audienceOverlap(df, "u", "cat")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == Map(
      ("a", "b") -> ((3L, 2L, 2L, 666666L)),
      ("a", "c") -> ((3L, 2L, 2L, 666666L)),
      ("b", "c") -> ((2L, 2L, 1L, 333333L))))
  }

  // -------------------------------------------- serial correlation (ACF)

  test("lagCorrelation: a linear ramp is perfectly lag-correlated at " +
      "every lag; an alternating series flips sign by lag parity") {
    val ramp = (1L to 8L).zipWithIndex.map { case (v, t) =>
      ("ramp", t.toLong, v) }
    val alt = (0 until 8).map(t =>
      ("alt", t.toLong, if (t % 2 == 0) 10L else -10L))
    val df = (ramp ++ alt).toDF("grp", "t", "v")
    val got = StatsOps.lagCorrelation(df, "grp", "t", "t", "v", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3))
      .toMap
    assert(got(("ramp", 1L)) === 1000L)
    assert(got(("ramp", 2L)) === 1000L)
    assert(got(("alt", 1L)) === -1000L)
    assert(got(("alt", 2L)) === 1000L)
  }

  test("lagCorrelation: constant windows and too-short series emit " +
      "null acf, never a division error") {
    val df = (Seq(("c", 0L, 5L), ("c", 1L, 5L), ("c", 2L, 5L)) ++
      Seq(("s", 0L, 1L), ("s", 1L, 2L))).toDF("grp", "t", "v")
    val rows = StatsOps.lagCorrelation(df, "grp", "t", "t", "v", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.isNullAt(3))).toMap
    // constant: pairs exist but zero variance ⇒ null
    assert(rows(("c", 1L)) == ((2L, true)))
    // 2-point series at lag 1: a single pair has zero variance ⇒ null;
    // lag 2 emits NO row at all (no pairs survive the lead filter)
    assert(rows(("s", 1L)) == ((1L, true)))
    assert(!rows.contains(("s", 2L)))
  }

  test("lagCorrelation: the lag-1 pair set re-centers per lag (edge " +
      "rows drop from the x side, not zero-filled)") {
    // 3 points: pairs at lag 1 are (1,10),(10,2) — n=2 exactly
    val df = Seq(("g", 0L, 1L), ("g", 1L, 10L), ("g", 2L, 2L))
      .toDF("grp", "t", "v")
    val r = StatsOps.lagCorrelation(df, "grp", "t", "t", "v", 1)
      .collect()(0)
    assert(r.getLong(2) == 2L)
  }

  // -------------------------------------------- trimmed / winsorized

  test("trimmedStats: one huge outlier drags the raw mean but not the " +
      "trimmed or winsorized one") {
    // 10 values: 1..9 and 1000. n=10, r_lo=1, r_hi=9: trim keeps
    // ranks 2..9 (2..9 ⇒ values 2..9, mean 5); winsor clamps to
    // [v(2)=2, v(9)=9]: sum = 2+2..9+9 = 55, mean 5; raw mean 104.
    val df = ((1L to 9L) :+ 1000L).zipWithIndex
      .map { case (v, i) => ("g", v, i.toLong) }.toDF("grp", "v", "tie")
    val r = StatsOps.trimmedStats(df, "grp", "v", "tie", 10, 90)
      .collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((10L, 8L, 2L, 9L)))
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((5L, 5L, 104L)))
  }

  // -------------------------------------------- target encoding

  test("targetEncoding: the LOO mean excludes the row's own label; " +
      "singletons null LOO but shrink fully to the global mean") {
    // cat a: targets 10, 20, 30 (Σ=60); cat b: single 100.
    // global mean = floor(160/4) = 40.
    val df = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 3L, 30L),
      ("b", 4L, 100L)).toDF("cat", "id", "t")
    val got = StatsOps.targetEncoding(df, "cat", "t", "id", 10)
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4))).toMap
    assert(got(1L) == ((Some(25L),
      (60L - 10L + 10L * 40L) / 12L)))  // (50+400)/12 = 37
    assert(got(2L)._1 == Some(20L))
    assert(got(3L)._1 == Some(15L))
    // singleton: LOO undefined; smoothed = (0 + 400)/10 = global mean
    assert(got(4L) == ((None, 40L)))
  }

  test("targetEncoding floors negative means (pmod identity)") {
    val df = Seq(("a", 1L, -7L), ("a", 2L, -4L)).toDF("cat", "id", "t")
    val loo = StatsOps.targetEncoding(df, "cat", "t", "id", 1)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(loo(1L) == -4L && loo(2L) == -7L)
  }

  // -------------------------------------------- lead-lag correlation

  test("leadLagCorrelation: y shifted one period after x peaks at " +
      "lag +1 with corr 1; holes drop pairs instead of zero-filling") {
    // x ramps 1..8 on days 0..7; y = x delayed by 1 (y_t = t), with
    // day 4 REMOVED from y: at lag 1 the pair set loses one entry.
    val df = (0L to 7L).filter(_ != 4L).map(d => (d, d + 1, d))
      .toDF("day", "x", "y")
    val got = StatsOps.leadLagCorrelation(df, "day", "x", "y", 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // day 4 missing entirely ⇒ lag 0 keeps 7 pairs; lag ±1 lose the
    // pairs straddling the hole (t=3→4 and t=7→8 / mirror): 5 each
    assert(got(0L)._1 == 7L)
    assert(got(1L)._1 == 5L)
    assert(got(-1L)._1 == 5L)
    // a linear shift correlates perfectly at EVERY lag of a ramp; the
    // load-bearing claims are the exact pair counts above and that
    // correlation is exactly 1 (integer-exact co-moments)
    assert(got(1L)._2 === 1000L)
    assert(got(-1L)._2 === 1000L)
  }

  // -------------------------------------------- CUPED

  test("cupedAdjust: a perfectly predictive covariate collapses " +
      "variance to ~0 while arm means stay unbiased") {
    // y = 10·x exactly; arms balanced. θ_milli = 10000; y_adj =
    // 1000·y − 10000·(x − x̄) is CONSTANT ⇒ var_ratio 0.
    val df = Seq((0L, 1L, 10L), (0L, 3L, 30L), (1L, 2L, 20L),
      (1L, 4L, 40L)).toDF("arm", "x", "y")
    val got = StatsOps.cupedAdjust(df, "arm", "x", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]))).toMap
    // θ = 10 in milli = 10000; x̄ = floor(10/4) = 2; every adjusted
    // value is exactly 20000 milli
    assert(got(0L) == ((10000L, 20L, 20000L, Some(0L))))
    assert(got(1L) == ((10000L, 30L, 20000L, Some(0L))))
    // both adjusted means equal (no true treatment effect) — the
    // variance went to zero WITHOUT inventing an arm difference
  }

  test("cupedAdjust: zero-variance covariate degrades to the raw " +
      "test (theta 0), never an error") {
    val df = Seq((0L, 5L, 10L), (1L, 5L, 30L)).toDF("arm", "x", "y")
    val got = StatsOps.cupedAdjust(df, "arm", "x", "y")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(0L) == ((0L, 10L, 10000L)))
    assert(got(1L) == ((0L, 30L, 30000L)))
  }

  // -------------------------------------------- cumulative gains

  test("cumulativeGains: a perfect score concentrates capture in the " +
      "head; the last tile always reads lift 10^6") {
    // 10 units, 2 converters with the top scores, 5 tiles of 2
    val df = (1L to 10L).map(i =>
      (i, 100L - i, i <= 2)).toDF("id", "score", "conv")
    val got = StatsOps.cumulativeGains(df, "id", "score", "conv", 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // tile 1 = both converters: capture 1e6, lift = (2·10)/(2·2) = 5×
    assert(got(1L) == ((2L, 2L, 1000000L, 5000000L)))
    assert(got(3L) == ((0L, 2L, 1000000L, 1666666L)))
    assert(got(5L)._4 == 1000000L)
  }

  // -------------------------------------------- total variation

  test("tvDistance: identical mixes read 0; a disjoint-bucket source " +
      "reads its full off-profile mass; absent buckets count") {
    // sources A and B identical over buckets {0,1}; source C entirely
    // in bucket 2 (which only C occupies).
    val df = (Seq.fill(4)(("A", 0L)) ++ Seq.fill(4)(("A", 100L)) ++
      Seq.fill(2)(("B", 0L)) ++ Seq.fill(2)(("B", 100L)) ++
      Seq.fill(4)(("C", 250L))).toDF("src", "n_chars")
    val got = StatsOps.tvDistance(df, "src", expr("n_chars div 100"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // N=16; marginals: b0=6, b1=6, b2=4. A (n=8): cells 4/4/0:
    // |4·16−6·8|+|4·16−6·8|+|0−4·8| = 16+16+32 = 64 → 64e6/(2·8·16)
    // = 250000. C (n=4): |0−6·4|·2 + |4·16−4·4| = 24+24+48 = 96 →
    // 96e6/(2·4·16) = 750000 (C is 75% off-profile).
    assert(got("A") == 250000L)
    assert(got("B") == 250000L)
    assert(got("C") == 750000L)
  }

  // -------------------------------------------- ABC/XYZ

  test("abcXyz: cumulative-share classes include the boundary item; " +
      "steady demand reads X, erratic Z; zero revenue classes C/Z " +
      "with null cv2") {
    // revenues: big=800 (cum 80% ⇒ A, boundary INCLUSIVE), mid=150
    // (cum 95% ⇒ B boundary), tail=50 (C), dead=0.
    // big's demand is constant (cv²=0 ⇒ X); mid swings 0/150 across
    // 2 buckets... use values 50,100 (cv² = (2·12500−22500)/22500 =
    // 111111 ppm ⇒ X at 300k); tail erratic: 1, 49 ⇒ cv² =
    // (2·2402−2500)/2500 = 921600 ⇒ Z.
    val rows = Seq(
      ("big", 1L, 400L), ("big", 2L, 400L),
      ("mid", 1L, 50L), ("mid", 2L, 100L),
      ("tail", 1L, 1L), ("tail", 2L, 49L),
      ("dead", 1L, 0L))
    val df = rows.toDF("item", "m", "v")
    val got = StatsOps.abcXyz(df, "item", "v", 800000L, 950000L,
        300000L, 450000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getString(4), r.getString(5)))
      .toMap
    assert(got("big") == ((800L, 800000L, "A", "X")))
    assert(got("mid") == ((150L, 950000L, "B", "X")))
    assert(got("tail") == ((50L, 1000000L, "C", "Z")))
    assert(got("dead") == ((0L, 1000000L, "C", "Z")))
  }

  test("the q157+q78 composition: dividing out the seasonal index " +
      "absorbs a weekday amplification a raw z-test would flag") {
    // 14 days, base 100; dow-0 days amplified ×3 (days 4, 11).
    val df = (0L until 14L).map(d =>
      ("g", d, if ((d + 3) % 7 == 0) 300L else 100L)).toDF("g", "day", "v")
    val idx = TemporalOps.seasonalIndex(df, "g", "day", "v")
      .select(col("g").as("ig"), col("dow"), col("index_ppm"))
    val adj = df.join(idx, df("g") === col("ig") &&
        ((col("day") + 3) % 7) === col("dow"))
      .select(col("g"), col("day"),
        expr("(v * 1000000L) div index_ppm").as("adj"))
    // raw flags at k=1 catch the amplified days; adjusted flags none
    val raw = StatsOps.zscoreFlags(df, "g", "v", 1)
      .filter(col("is_outlier")).count()
    val cooked = StatsOps.zscoreFlags(adj, "g", "adj", 1)
      .filter(col("is_outlier")).count()
    assert(raw == 2L, s"raw z-test must flag the amplified days, got $raw")
    assert(cooked == 0L,
      s"deseasonalized series must be flat, got $cooked flags")
  }

  // -------------------------------------------- Q-Q comparison

  test("qqCompare: quartiles localize a tail-only divergence a summary " +
      "statistic averages away") {
    // A = 1..8; B equals A except the top quartile is 10× — the two
    // distributions agree at q1/q2 and diverge only at q3.
    val a = (1L to 8L).map(v => ("A", v * 10, v))
    val b = Seq(1L, 2L, 3L, 4L, 5L, 6L, 70L, 80L).map(v => ("B", v + 100, v))
    val df = (a ++ b).toDF("grp", "id", "v")
    val got = StatsOps.qqCompare(df, "grp", "v", "id", "A", "B", 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((2L, 2L, 0L)))
    assert(got(2L) == ((4L, 4L, 0L)))
    assert(got(3L) == ((6L, 6L, 0L)))
    // deciles would show it; quartile 3 picks rank 6 = value 6 on both
    // sides — so re-run at tiles=8 to expose the tail
    val t8 = StatsOps.qqCompare(df, "grp", "v", "id", "A", "B", 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(t8(7L) == ((7L, 70L)))  // 7th octile: A=7, B=70
  }

  // -------------------------------------------- feature scaling

  test("featureScaling: min-max and CDF transforms floor exactly; ties " +
      "share one CDF value via rank(); degenerate groups null out") {
    val df = (Seq(("g", 1L, 0L), ("g", 2L, 100L), ("g", 3L, 100L),
      ("g", 4L, 400L)) ++ Seq(("const", 9L, 7L), ("const", 10L, 7L)))
      .toDF("grp", "id", "v")
    val got = StatsOps.featureScaling(df, "grp", "v", "id")
      .collect().map(r => r.getLong(1) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(got(1L) == ((Some(0L), Some(0L))))
    // ties at 100: minmax = 1e6·100/400 = 250000; rank 2 for BOTH ⇒
    // cdf = 1e6·1/3 = 333333
    assert(got(2L) == ((Some(250000L), Some(333333L))))
    assert(got(3L) == ((Some(250000L), Some(333333L))))
    assert(got(4L) == ((Some(1000000L), Some(1000000L))))
    // constant group: no range (minmax null); every row is rank 1 so
    // the quantile transform collapses to 0 — defined, not null
    assert(got(9L) == ((None, Some(0L))))
    assert(got(10L) == ((None, Some(0L))))
  }

  test("trimmedStats: groups smaller than the trim window emit null " +
      "means, never a division error; negative values floor correctly") {
    val df = (Seq(("tiny", 5L, 0L)) ++
      Seq(("neg", -7L, 0L), ("neg", -4L, 1L), ("neg", 0L, 2L)))
      .toDF("grp", "v", "tie")
    val rows = StatsOps.trimmedStats(df, "grp", "v", "tie", 10, 90)
      .collect().map(r => r.getString(0) -> r).toMap
    // tiny: n=1, r_lo=0, r_hi=0 ⇒ no trimmed rows, no hi bound
    val t = rows("tiny")
    assert(t.getLong(2) == 0L && t.isNullAt(5) && t.isNullAt(6))
    // raw mean of a single row is the value itself
    assert(t.getLong(7) == 5L)
    // neg: raw mean floor((-11)/3) = -4 (trunc would give -3)
    assert(rows("neg").getLong(7) == -4L)
  }

  test("cohenKappa: perfect agreement 1e6; constant raters null; " +
      "systematic disagreement lands below raw agreement; null labels " +
      "are a category; matches naive BigInt reference on random frames") {
    import spark.implicits._
    val perfect = Seq(("g", 1L, 1L), ("g", 2L, 2L), ("g", 1L, 1L))
      .toDF("grp", "a", "b")
    assert(StatsOps.cohenKappa(perfect, "grp", "a", "b")
      .head().getLong(3) === 1000000L)
    val constant = (1 to 10).map(_ => ("g", 1L, 1L)).toDF("grp", "a", "b")
    assert(StatsOps.cohenKappa(constant, "grp", "a", "b")
      .head().isNullAt(3))
    // anti-correlated raters: kappa strictly negative
    val anti = Seq(("g", 1L, 2L), ("g", 2L, 1L), ("g", 1L, 2L),
      ("g", 2L, 1L)).toDF("grp", "a", "b")
    assert(StatsOps.cohenKappa(anti, "grp", "a", "b")
      .head().getLong(3) < 0L)
    // randomized differential vs a naive BigInt reference
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 50 + rnd.nextInt(50)).map { _ =>
        ("g" + rnd.nextInt(2),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3).toLong),
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3).toLong))
      }
      val df = rows.toDF("grp", "a", "b")
      val got = StatsOps.cohenKappa(df, "grp", "a", "b")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val n = BigInt(rs.size)
        val agree = BigInt(rs.count(r => r._2 == r._3))
        val labels = (rs.map(_._2) ++ rs.map(_._3)).distinct
        val pe = labels.map { k =>
          BigInt(rs.count(_._2 == k)) * BigInt(rs.count(_._3 == k))
        }.sum
        val den = n * n - pe
        val kappa = if (den == 0) None else {
          val num = (n * agree - pe) * 1000000
          // floor division on BigInt (BigInt / truncates)
          val q = num / den
          Some((if (num % den != 0 && (num < 0) != (den < 0)) q - 1 else q)
            .toLong)
        }
        g -> ((n.toLong, agree.toLong, kappa))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("mannWhitneyU: separated samples hit the +/- extremes; all-tied " +
      "cell and single-sample cell emit null z; ties feed the exact " +
      "tie term; matches naive BigInt reference on random frames") {
    import spark.implicits._
    def mw(df: org.apache.spark.sql.DataFrame) =
      StatsOps.mannWhitneyU(df, "cell", "grp", "A", "B", "v")
    // A entirely above B: two_u = 2*n1*n2, z strongly positive;
    // mirrored cell lands symmetric negative.
    val sep = ((1 to 20).map(i => ("up", "A", 100L + i)) ++
      (1 to 20).map(i => ("up", "B", i.toLong)) ++
      (1 to 20).map(i => ("dn", "B", 100L + i)) ++
      (1 to 20).map(i => ("dn", "A", i.toLong))).toDF("cell", "grp", "v")
    val bySep = mw(sep).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(bySep("up").getLong(3) === 2L * 20 * 20)
    assert(bySep("dn").getLong(3) === 0L)
    assert(bySep("up").getLong(5) > 5000L)
    assert(bySep("up").getLong(5) === -bySep("dn").getLong(5))
    // all-tied cell: variance term zero -> null z, tie_t = t^3 - t
    val tied = (1 to 6).map(i => ("g", if (i % 2 == 0) "A" else "B", 7L))
      .toDF("cell", "grp", "v")
    val tr = mw(tied).head()
    assert(tr.isNullAt(5) && tr.getLong(4) === 6L * 6 * 6 - 6)
    // only one group present -> n_b = 0 -> null z, not an error
    val solo = (1 to 5).map(i => ("g", "A", i.toLong))
      .toDF("cell", "grp", "v")
    val sr = mw(solo).head()
    assert(sr.getLong(2) === 0L && sr.isNullAt(5))
    // randomized differential vs a naive BigInt replay of the lattice
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(100 + seed)
      val rows = (1 to 60 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2),
          if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(8).toLong)
      }
      val got = mw(rows.toDF("cell", "grp", "v")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            Option(r.get(5)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val counts = rs.groupBy(_._3).map { case (v, g) =>
          (v, BigInt(g.count(_._2 == "A")), BigInt(g.count(_._2 == "B")))
        }.toSeq.sortBy(_._1)
        val nA = counts.map(_._2).sum
        val nB = counts.map(_._3).sum
        val n = nA + nB
        var bLess = BigInt(0); var twoU = BigInt(0); var tieT = BigInt(0)
        counts.foreach { case (_, a, b) =>
          twoU += a * (2 * bLess + b)
          val t = a + b
          tieT += t * t * t - t
          bLess += b
        }
        val varTerm = (n + 1) * n * (n - 1) - tieT
        val z = if (nA > 0 && nB > 0 && varTerm > 0) {
          val num = twoU - nA * nB
          val rad = (num * num * 3000000 * n * (n - 1)) /
            (nA * nB * varTerm)
          Some(num.signum * math.floor(math.sqrt(rad.toDouble)).toLong)
        } else None
        c -> ((nA.toLong, nB.toLong, twoU.toLong, tieT.toLong, z))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("markovStationary: two-state chain converges to the exact " +
      "q/(p+q) law; deterministic cycle is uniform; truncation leak " +
      "stays within iters ppm; matches naive ppm-lattice replay") {
    import spark.implicits._
    def mk(rows: Seq[(Long, Long, String)], iters: Int = 16) =
      StatsOps.markovStationary(
        rows.zipWithIndex.map { case ((u, t, st), i) =>
          (u, t, i.toLong, st) }.toDF("u", "t", "tie", "state"),
        "u", "t", "tie", "state", iters)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // asymmetric 2-state chain built from an explicit trajectory:
    // a->b always, b->b twice then b->a (p=1, q=1/3) -> pi = (1/4, 3/4);
    // ends ON a cycle boundary so the truncated tail doesn't bias q
    val traj = (0 until 97).map { i =>
      (1L, i.toLong, if (i % 4 == 0) "a" else "b")
    }
    val two = mk(traj)
    assert(math.abs(two("a")._3 - 250000L) < 100L, two("a"))
    assert(math.abs(two("b")._3 - 750000L) < 100L, two("b"))
    assert(two("b")._2 === 666666L && two("a")._2 === 0L)
    // deterministic 3-cycle: uniform stationary, zero self-loops;
    // pi0 remainder (1e6 mod 3 = 1) goes to the lexicographically
    // first state and washes through the cycle
    val cyc = (0 until 90).map(i =>
      (1L, i.toLong, Seq("x", "y", "z")(i % 3)))
    val three = mk(cyc)
    three.values.foreach { case (_, self, pi) =>
      assert(self === 0L && math.abs(pi - 333333L) <= 2L)
    }
    // mass conservation: total leak bounded by iters * states ppm
    assert(math.abs(three.values.map(_._3).sum - 1000000L) <= 16L * 3)
    // naive replay of the SAME lattice on a random trajectory
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(1000 + seed)
      val states = Vector("s0", "s1", "s2")
      val rows = (0 until 200).map(i =>
        ((i % 4).toLong, i.toLong, states(rnd.nextInt(3))))
      val got = mk(rows)
      // naive: transitions per user by (t, tie) order
      val byU = rows.zipWithIndex.map { case ((u, t, st), i) =>
        (u, t, i.toLong, st) }.groupBy(_._1)
      val pairs = byU.values.flatMap { g =>
        val s = g.sortBy(r => (r._2, r._3)).map(_._4)
        s.zip(s.tail).map { case (p, c) => (p, c) }
      }.toSeq
      val nOut = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val t = pairs.groupBy(identity).map { case ((p, c), g) =>
        (p, c) -> BigInt(g.size) * 1000000 / nOut(p) }
      val allS = rows.map(_._3).distinct.sorted
      var pi = allS.zipWithIndex.map { case (s, i) =>
        s -> (BigInt(1000000 / allS.size) +
          (if (i < 1000000 % allS.size) 1 else 0))
      }.toMap
      for (_ <- 1 to 16)
        pi = allS.map { j =>
          j -> allS.map(i =>
            pi(i) * t.getOrElse((i, j), BigInt(0)) / 1000000).sum
        }.toMap
      allS.foreach { s =>
        val (gn, gself, gpi) = got(s)
        assert(gn === nOut.getOrElse(s, 0L), s"n_out $s")
        assert(gself === t.getOrElse((s, s), BigInt(0)).toLong, s"self $s")
        assert(gpi === pi(s).toLong, s"pi $s seed=$seed")
      }
    }
  }

  test("calibrationError: perfectly matched bin reads 0; a constant " +
      "shift reads as its own ppm; score 999999 clamps into the last " +
      "bin; matches naive BigInt reference on random frames") {
    import spark.implicits._
    def ece(df: org.apache.spark.sql.DataFrame) =
      StatsOps.calibrationError(df, "cell", "s", "y", 10)
    // in-bin exact match: two rows at 250000 ppm, one positive of two
    // -> conf_sum = 500000, acc_sum = 1000000... deliberately NOT 0;
    // build the true zero: scores 0 with labels 0
    val zero = (1 to 8).map(_ => ("g", 0L, 0L)).toDF("cell", "s", "y")
    val zr = ece(zero).head()
    assert(zr.getLong(3) === 0L && zr.getLong(4) === 0L)
    // pure shift: all scores 700000, all labels 0 -> ECE = 700000
    val shift = (1 to 5).map(_ => ("g", 700000L, 0L)).toDF("cell", "s", "y")
    assert(ece(shift).head().getLong(3) === 700000L)
    // clamp: 999999 lands in bin 9, not a phantom bin 10
    val edge = Seq(("g", 999999L, 1L)).toDF("cell", "s", "y")
    assert(ece(edge).head().getLong(2) === 1L)
    // randomized differential
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(900 + seed)
      val rows = (1 to 40 + rnd.nextInt(80)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(1000000).toLong,
          rnd.nextInt(2).toLong)
      }
      val got = ece(rows.toDF("cell", "s", "y")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val bins = rs.groupBy(r => math.min(r._2 / 100000, 9L))
        val gaps = bins.toSeq.map { case (_, g) =>
          val conf = g.map(r => BigInt(r._2)).sum
          val acc = BigInt(g.map(_._3).sum) * 1000000
          (g.size, (acc - conf).abs)
        }
        val n = BigInt(rs.size)
        c -> ((rs.size.toLong, bins.size.toLong,
          (gaps.map(_._2).sum / n).toLong,
          gaps.map { case (nb, g) => g / nb }.max.toLong))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("kendallTauB: an unbinned input trips the in-plan grid guard " +
      "LOUDLY; the same frame passes under the default cap") {
    import spark.implicits._
    // 5 distinct x times 5 distinct y = 25 grid cells in one cell
    val df = (1 to 5).map(i => ("c", i.toLong, (i * 7).toLong))
      .toDF("cell", "x", "y")
    val e = intercept[IllegalArgumentException] {
      StatsOps.kendallTauB(df, "cell", "x", "y", maxGridCells = 10L)
    }
    assert(e.getMessage.contains("bin"), e.getMessage)
    assert(StatsOps.kendallTauB(df, "cell", "x", "y").count() === 1L)
  }

  test("kendallTauB: perfect monotone hits +/-1000 without ties; " +
      "constant column nulls; tie-heavy frames match the O(n^2) " +
      "definition pair-for-pair on random frames") {
    import spark.implicits._
    def tau(df: org.apache.spark.sql.DataFrame) =
      StatsOps.kendallTauB(df, "cell", "x", "y")
    val mono = ((1 to 9).map(i => ("inc", i.toLong, i * 3L)) ++
      (1 to 9).map(i => ("dec", i.toLong, -i * 2L)))
      .toDF("cell", "x", "y")
    val byMono = tau(mono).collect().map(r => r.getString(0) -> r).toMap
    assert(byMono("inc").getLong(4) === 1000L)
    assert(byMono("dec").getLong(4) === -1000L)
    // all pairs concordant: conc = n(n-1)/2, disc = 0
    assert(byMono("inc").getLong(2) === 36L &&
      byMono("inc").getLong(3) === 0L)
    val const = (1 to 6).map(i => ("g", 4L, i.toLong)).toDF("cell", "x", "y")
    assert(tau(const).head().isNullAt(4))
    // randomized differential vs the naive O(n^2) pair scan
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(800 + seed)
      val rows = (1 to 30 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(5).toLong, rnd.nextInt(4).toLong)
      }
      val got = tau(rows.toDF("cell", "x", "y")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val v = rs.map(r => (r._2, r._3)).toIndexedSeq
        val n = v.size
        var conc = BigInt(0); var disc = BigInt(0)
        for (i <- 0 until n; j <- i + 1 until n) {
          val s = (v(i)._1 - v(j)._1).sign * (v(i)._2 - v(j)._2).sign
          if (s > 0) conc += 1 else if (s < 0) disc += 1
        }
        val n0 = BigInt(n) * (n - 1) / 2
        val tx = v.groupBy(_._1).values
          .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
        val ty = v.groupBy(_._2).values
          .map(g => BigInt(g.size) * (g.size - 1) / 2).sum
        val t = if (n0 - tx > 0 && n0 - ty > 0) {
          val num = conc - disc
          val rad = ((BigInt(1000000) * num.abs / (n0 - tx)) * num.abs) /
            (n0 - ty)
          Some(num.signum * math.floor(math.sqrt(rad.toDouble)).toLong)
        } else None
        c -> ((n.toLong, conc.toLong, disc.toLong, t))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("mutualInformation: functional coupling reads MI = H(y); " +
      "constant x reads EXACTLY 0 (lattice terms coincide); MI <= " +
      "min(Hx, Hy) up to lattice slack; matches naive lattice replay " +
      "on random frames") {
    import spark.implicits._
    def mi(df: org.apache.spark.sql.DataFrame) =
      StatsOps.mutualInformation(df, "cell", "x", "y")
    // y = f(x) bijectively: MI = H(x) = H(y) exactly (same lattice sums)
    val func = (1 to 40).map(i => ("g", (i % 4).toString, (i % 4) * 10))
      .toDF("cell", "x", "y")
    val fr = mi(func).head()
    assert(fr.getLong(3) === fr.getLong(4) && fr.getLong(4) === fr.getLong(5))
    // constant x: nx = N and nxy = ny term-by-term -> MI exactly 0
    val const = (1 to 30).map(i => ("g", "k", i % 5)).toDF("cell", "x", "y")
    val cr = mi(const).head()
    assert(cr.getLong(3) === 0L && cr.getLong(4) === 0L)
    // randomized differential vs a naive replay of the SAME lattice
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(700 + seed)
      val rows = (1 to 50 + rnd.nextInt(100)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(4).toString, rnd.nextInt(3))
      }
      val got = mi(rows.toDF("cell", "x", "y")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5)))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val nn = BigInt(rs.size)
        val xy = rs.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
        val nx = rs.groupBy(_._2).view.mapValues(_.size).toMap
        val ny = rs.groupBy(_._3).view.mapValues(_.size).toMap
        def L(m: BigInt) = BigInt(graft.functions.FixedLog.log2q20(m.toLong))
        val miS = xy.map { case ((x, y), n) =>
          BigInt(n) * (L(n * nn) - L(BigInt(nx(x)) * ny(y))) }.sum
        val hxS = nx.values.map(n => BigInt(n) * (L(nn) - L(n))).sum
        val hyS = ny.values.map(n => BigInt(n) * (L(nn) - L(n))).sum
        c -> ((nn.toLong, xy.size.toLong, (miS / nn).toLong,
          (hxS / nn).toLong, (hyS / nn).toLong))
      }
      assert(got === want, s"seed=$seed")
      // information bound, up to per-term lattice slack
      got.values.foreach { case (_, pairs, m, hx, hy) =>
        assert(m <= math.min(hx, hy) + pairs * 4)
      }
    }
  }

  test("madScale: exact lower medians on tie-heavy frames; constant " +
      "cell reads mad = 0, std = 0; a planted outlier moves std but " +
      "NOT mad; matches naive BigInt reference on random frames") {
    import spark.implicits._
    def mad(df: org.apache.spark.sql.DataFrame) =
      StatsOps.madScale(df, "cell", "v")
    // hand case: values 1..5 -> med 3, deviations {2,1,0,1,2} -> mad 1
    val five = (1 to 5).map(i => ("g", i.toLong)).toDF("cell", "v")
    val fr = mad(five).head()
    assert(fr.getLong(2) === 3L && fr.getLong(3) === 1L)
    // constant cell: all mass on one value
    val const = (1 to 7).map(_ => ("g", 9L)).toDF("cell", "v")
    val cr = mad(const).head()
    assert(cr.getLong(3) === 0L && cr.getLong(4) === 0L)
    // robustness: one wild outlier leaves med/mad unchanged, explodes std
    val clean = (1 to 99).map(i => ("g", (i % 11).toLong))
    val dirty = clean :+ (("g", 1000000L))
    val rc = mad(clean.toDF("cell", "v")).head()
    val rd = mad(dirty.toDF("cell", "v")).head()
    assert(rd.getLong(2) === rc.getLong(2) && rd.getLong(3) === rc.getLong(3))
    assert(rd.getLong(4) > rc.getLong(4) * 100)
    // randomized differential vs a naive BigInt reference
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(600 + seed)
      val rows = (1 to 30 + rnd.nextInt(80)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(20).toLong - 5)
      }
      val got = mad(rows.toDF("cell", "v")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val vs = rs.map(_._2)
        val n = vs.size
        def lowerMed(xs: Seq[Long]): Long = {
          val sorted = xs.sorted
          // smallest value whose inclusive cumulative count doubles to
          // >= n: index ceil(n/2) - 1 in the sorted multiset
          sorted((xs.size + 1) / 2 - 1)
        }
        val m = lowerMed(vs)
        val md = lowerMed(vs.map(x => (x - m).abs))
        val sx = vs.map(BigInt(_)).sum
        val sxx = vs.map(x => BigInt(x) * x).sum
        val rad = (sxx * n - sx * sx) / (BigInt(n) * n)
        val std = math.floor(math.sqrt(rad.toDouble)).toLong
        c -> ((n.toLong, m, md, std))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("jsDivergence: identical slices read EXACTLY 0; disjoint " +
      "supports read exactly 2^20 (one bit); empty slice nulls; " +
      "matches naive lattice replay on random frames") {
    import spark.implicits._
    def js(df: org.apache.spark.sql.DataFrame) =
      StatsOps.jsDivergence(df, "cell", "grp", "A", "B", "k")
    // identical distributions: 2pQ = pQ+qP per key, lattice cancels
    val same = ((1 to 30).map(i => ("g", "A", "k" + i % 3)) ++
      (1 to 30).map(i => ("g", "B", "k" + i % 3))).toDF("cell", "grp", "k")
    assert(js(same).head().getLong(4) === 0L)
    // disjoint vocabularies: every key one-sided, L(2x)-L(x) = 2^20
    // exactly (the lattice is shift-exact), so js = 2^20
    val disj = ((1 to 10).map(i => ("g", "A", "a" + i % 2)) ++
      (1 to 10).map(i => ("g", "B", "b" + i % 2))).toDF("cell", "grp", "k")
    assert(js(disj).head().getLong(4) === (1L << 20))
    // one empty slice: KL against nothing is undefined, not 0
    val solo = (1 to 5).map(i => ("g", "A", "k" + i)).toDF("cell", "grp", "k")
    assert(js(solo).head().isNullAt(4))
    // randomized differential vs a naive replay of the SAME lattice
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(400 + seed)
      val rows = (1 to 60 + rnd.nextInt(90)).map { _ =>
        ("c" + rnd.nextInt(2),
          if (rnd.nextBoolean()) "A" else "B",
          "k" + rnd.nextInt(5))
      }
      val got = js(rows.toDF("cell", "grp", "k")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            Option(r.get(4)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val keys = rs.map(_._3).distinct
        val tp = BigInt(rs.count(_._2 == "A"))
        val tq = BigInt(rs.count(_._2 == "B"))
        var sa = BigInt(0); var sb = BigInt(0)
        keys.foreach { k =>
          val p = BigInt(rs.count(r => r._2 == "A" && r._3 == k))
          val q = BigInt(rs.count(r => r._2 == "B" && r._3 == k))
          val mix = p * tq + q * tp
          if (p > 0 && tq > 0)
            sa += p * (graft.functions.FixedLog.log2q20((2 * p * tq).toLong)
              - graft.functions.FixedLog.log2q20(mix.toLong))
          if (q > 0 && tp > 0)
            sb += q * (graft.functions.FixedLog.log2q20((2 * q * tp).toLong)
              - graft.functions.FixedLog.log2q20(mix.toLong))
        }
        // truncation toward zero, the cross-engine div contract
        def tz(n: BigInt, d: BigInt): BigInt = n / d
        val r = if (tp > 0 && tq > 0)
          Some((tz(sa, 2 * tp) + tz(sb, 2 * tq)).toLong) else None
        c -> ((tp.toLong, tq.toLong, keys.size.toLong, r))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("ksTest: disjoint samples hit d_ppm = 1e6 at the boundary; " +
      "identical samples read 0; argmax tie resolves to the LOWEST " +
      "value; single-sample cell nulls; matches naive BigInt " +
      "reference on random frames") {
    import spark.implicits._
    def ks(df: org.apache.spark.sql.DataFrame) =
      StatsOps.ksTest(df, "cell", "grp", "A", "B", "v")
    // disjoint supports: CDF gap peaks at 1 exactly at A's max value
    val disj = ((1 to 10).map(i => ("g", "A", i.toLong)) ++
      (1 to 10).map(i => ("g", "B", 100L + i))).toDF("cell", "grp", "v")
    val dr = ks(disj).head()
    assert(dr.getLong(3) === 1000000L && dr.getLong(4) === 10L)
    // identical samples: every prefix gap is 0; argmax tie across ALL
    // values resolves to the lowest one
    val same = ((1 to 5).map(i => ("g", "A", i.toLong)) ++
      (1 to 5).map(i => ("g", "B", i.toLong))).toDF("cell", "grp", "v")
    val sr = ks(same).head()
    assert(sr.getLong(3) === 0L && sr.getLong(4) === 1L)
    // one-sided cell: no B sample -> null d_ppm and v_at_max
    val solo = (1 to 4).map(i => ("g", "A", i.toLong))
      .toDF("cell", "grp", "v")
    val so = ks(solo).head()
    assert(so.isNullAt(3) && so.isNullAt(4))
    // randomized differential vs a naive BigInt sweep
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(300 + seed)
      val rows = (1 to 50 + rnd.nextInt(80)).map { _ =>
        ("c" + rnd.nextInt(2),
          if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(9).toLong)
      }
      val got = ks(rows.toDF("cell", "grp", "v")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val nA = BigInt(rs.count(_._2 == "A"))
        val nB = BigInt(rs.count(_._2 == "B"))
        val vals = rs.map(_._3).distinct.sorted
        var cumA = BigInt(0); var cumB = BigInt(0)
        val gaps = vals.map { v =>
          cumA += rs.count(r => r._2 == "A" && r._3 == v)
          cumB += rs.count(r => r._2 == "B" && r._3 == v)
          v -> (cumA * nB - cumB * nA).abs
        }
        val res = if (nA > 0 && nB > 0) {
          val mg = gaps.map(_._2).max
          Some(((mg * 1000000) / (nA * nB)).toLong ->
            gaps.filter(_._2 == mg).map(_._1).min)
        } else None
        c -> ((nA.toLong, nB.toLong, res.map(_._1), res.map(_._2)))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("spearmanRho: perfect monotone hits +/-1000; constant column " +
      "nulls; tie-heavy frames use exact doubled ranks; matches naive " +
      "BigInt reference on random frames") {
    import spark.implicits._
    def rho(df: org.apache.spark.sql.DataFrame) =
      StatsOps.spearmanRho(df, "cell", "x", "y")
    val mono = ((1 to 12).map(i => ("inc", i.toLong, i * 7L)) ++
      (1 to 12).map(i => ("dec", i.toLong, -3L * i)))
      .toDF("cell", "x", "y")
    val byMono = rho(mono).collect().map(r => r.getString(0) -> r).toMap
    assert(byMono("inc").getLong(2) === 1000L)
    assert(byMono("dec").getLong(2) === -1000L)
    // constant x: zero rank variance -> null, never a division error
    val const = (1 to 8).map(i => ("g", 5L, i.toLong)).toDF("cell", "x", "y")
    assert(rho(const).head().isNullAt(2))
    // randomized differential vs naive doubled-rank BigInt reference
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(200 + seed)
      val rows = (1 to 40 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(6).toLong, rnd.nextInt(6).toLong)
      }
      val got = rho(rows.toDF("cell", "x", "y")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val n = BigInt(rs.size)
        def dr(vs: Seq[Long]): Map[Long, BigInt] =
          vs.distinct.map { v =>
            v -> (BigInt(2) * vs.count(_ < v) + vs.count(_ == v) + 1)
          }.toMap
        val drx = dr(rs.map(_._2)); val dry = dr(rs.map(_._3))
        var num = BigInt(0); var dx = BigInt(0); var dy = BigInt(0)
        rs.foreach { case (_, x, y) =>
          val ux = drx(x) - n - 1; val uy = dry(y) - n - 1
          num += ux * uy; dx += ux * ux; dy += uy * uy
        }
        val r = if (dx > 0 && dy > 0) {
          val rad = ((BigInt(1000000) * num.abs / dx) * num.abs) / dy
          Some(num.signum * math.floor(math.sqrt(rad.toDouble)).toLong)
        } else None
        c -> ((n.toLong, r))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("aucRoc: separated samples hit 1e6/0; an all-tied score reads " +
      "exactly 500000 (midrank); one-class cells emit null; matches " +
      "naive pairwise BigInt reference on random tie-heavy frames") {
    import spark.implicits._
    def auc(df: org.apache.spark.sql.DataFrame) =
      StatsOps.aucRoc(df, "cell", "s", "y")
    // positives strictly above negatives -> AUC 1, gini 1; mirrored -> 0
    val sep = ((1 to 15).map(i => ("up", 100L + i, 1L)) ++
      (1 to 15).map(i => ("up", i.toLong, 0L)) ++
      (1 to 15).map(i => ("dn", 100L + i, 0L)) ++
      (1 to 15).map(i => ("dn", i.toLong, 1L))).toDF("cell", "s", "y")
    val bySep = auc(sep).collect().map(r => r.getString(0) -> r).toMap
    assert(bySep("up").getLong(3) === 1000000L)
    assert(bySep("up").getLong(4) === 1000000L)
    assert(bySep("dn").getLong(3) === 0L)
    assert(bySep("dn").getLong(4) === -1000000L)
    // every score tied: each positive-negative pair counts half
    val tied = (1 to 8).map(i => ("g", 7L, (i % 2).toLong))
      .toDF("cell", "s", "y")
    assert(auc(tied).head().getLong(3) === 500000L)
    // one class only -> null AUC, not a division error
    val solo = (1 to 5).map(i => ("g", i.toLong, 1L)).toDF("cell", "s", "y")
    assert(auc(solo).head().isNullAt(3))
    // randomized differential vs the O(n^2) pairwise definition:
    // AUC = (wins + ties/2) / (n1*n0), exact in BigInt ppm
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(300 + seed)
      val rows = (1 to 50 + rnd.nextInt(70)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(6).toLong,
          if (rnd.nextBoolean()) 1L else 0L)
      }
      val got = auc(rows.toDF("cell", "s", "y")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val pos = rs.filter(_._3 == 1L).map(_._2)
        val neg = rs.filter(_._3 == 0L).map(_._2)
        val a = if (pos.nonEmpty && neg.nonEmpty) {
          var twice = BigInt(0) // 2*wins + ties
          for (p <- pos; n <- neg) {
            if (p > n) twice += 2 else if (p == n) twice += 1
          }
          Some((BigInt(1000000) * twice /
            (BigInt(2) * pos.size * neg.size)).toLong)
        } else None
        c -> ((pos.size.toLong, neg.size.toLong, a))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("welchT: a pure mean shift reads the closed-form t; both-" +
      "constant cells and single-sample groups emit null; sign tracks " +
      "direction; matches naive BigInt staged-lattice replay") {
    import spark.implicits._
    def wt(df: org.apache.spark.sql.DataFrame) =
      StatsOps.welchT(df, "cell", "grp", "A", "B", "v")
    // A = {0,2} x 8, B = {10,12} x 8: m diff -10, s^2 = 16/15 each
    // t = -10 / sqrt(2*(16/15)/16) = -10/sqrt(2/15) -> t^2 = 750
    val shifted = ((1 to 16).map(i => ("g", "A", (i % 2 * 2).toLong)) ++
      (1 to 16).map(i => ("g", "B", (10 + i % 2 * 2).toLong)))
      .toDF("cell", "grp", "v")
    val sr = wt(shifted).head()
    val tm = sr.getLong(3)
    assert(tm < 0 && math.abs(tm + math.sqrt(750).toLong * 1000 / 1) <
      30000, s"t_milli $tm") // ~ -27386 with lattice quantization
    // both groups constant -> E = 0 -> null
    val const = ((1 to 5).map(_ => ("g", "A", 3L)) ++
      (1 to 5).map(_ => ("g", "B", 9L))).toDF("cell", "grp", "v")
    assert(wt(const).head().isNullAt(3))
    // n = 1 in one group -> null (variance undefined)
    val solo = (("g", "A", 1L) +: (1 to 5).map(_ => ("g", "B", 2L)))
      .toDF("cell", "grp", "v")
    assert(wt(solo).head().isNullAt(3))
    // randomized differential vs naive BigInt staged replay
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(700 + seed)
      val rows = (1 to 40 + rnd.nextInt(80)).map { _ =>
        ("c" + rnd.nextInt(2), if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(40).toLong)
      }
      val got = wt(rows.toDF("cell", "grp", "v")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val a = rs.filter(_._2 == "A").map(r => BigInt(r._3))
        val b = rs.filter(_._2 == "B").map(r => BigInt(r._3))
        val (n1, n2) = (BigInt(a.size), BigInt(b.size))
        val (sx1, sx2) = (a.sum, b.sum)
        val (sxx1, sxx2) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
        val d = sx1 * n2 - sx2 * n1
        val e = (n1 * sxx1 - sx1 * sx1) * n2 * n2 * (n2 - 1) +
          (n2 * sxx2 - sx2 * sx2) * n1 * n1 * (n1 - 1)
        val t = if (n1 >= 2 && n2 >= 2 && e > 0) {
          val rad = ((BigInt(1000000) * d * d * (n1 - 1)) / e) * (n2 - 1)
          if (rad < BigInt(9007199254740992L))
            Some(d.signum * math.floor(math.sqrt(rad.toDouble)).toLong)
          else None
        } else None
        c -> ((n1.toLong, n2.toLong, t))
      }
      assert(got === want, s"seed=$seed")
    }
  }

  test("psiDrift: identical slices read exactly 0; disjoint slices " +
      "read 0 core PSI with ALL mass excluded (the clamp is honest); " +
      "a known shift reads positive; matches naive lattice replay") {
    import spark.implicits._
    def psi(df: org.apache.spark.sql.DataFrame) =
      StatsOps.psiDrift(df, "cell", "sl", "A", "B", "bin")
    // identical bin distributions -> every term is lg(x) - lg(x) = 0
    val same = (1 to 40).map(i => ("g", if (i % 2 == 0) "A" else "B",
      (i % 5).toLong)).toDF("cell", "sl", "bin")
    val sr = psi(same).head()
    assert(sr.getLong(5) === 0L && sr.getLong(4) === 0L)
    // disjoint bins: no core bin -> psi 0, 1e6 ppm excluded both sides
    val disj = ((1 to 10).map(i => ("g", "A", (i % 3).toLong)) ++
      (1 to 10).map(i => ("g", "B", 10L + i % 3))).toDF("cell", "sl", "bin")
    val dr = psi(disj).head()
    assert(dr.getLong(5) === 0L)
    assert(dr.getLong(6) === 1000000L && dr.getLong(7) === 1000000L)
    // a mass shift in one cell reads strictly positive PSI there
    val shift = ((1 to 30).map(i => ("g", "A", (i % 3).toLong)) ++
      (1 to 30).map(i => ("g", "B", (i % 3 + (if (i % 3 == 0) 1 else 0))
        .toLong))).toDF("cell", "sl", "bin")
    assert(psi(shift).head().getLong(5) > 0L)
    // randomized differential vs a naive BigInt + FixedLog replay
    import graft.functions.FixedLog
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(400 + seed)
      val rows = (1 to 60 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(6).toLong)
      }
      val got = psi(rows.toDF("cell", "sl", "bin")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(4),
            Option(r.get(5)).map(_.asInstanceOf[Long]))))
        .toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val bins = rs.map(_._3).distinct
        val ta = BigInt(rs.count(_._2 == "A"))
        val tb = BigInt(rs.count(_._2 == "B"))
        var num = BigInt(0); var nExcl = 0L
        bins.foreach { bn =>
          val a = BigInt(rs.count(r => r._2 == "A" && r._3 == bn))
          val b = BigInt(rs.count(r => r._2 == "B" && r._3 == bn))
          if (a > 0 && b > 0)
            num += (a * tb - b * ta) *
              (FixedLog.log2q20((a * tb).toLong) -
                FixedLog.log2q20((b * ta).toLong))
          else nExcl += 1
        }
        val p = if (ta > 0 && tb > 0) Some((num / (ta * tb)).toLong)
          else None
        c -> ((ta.toLong, tb.toLong, nExcl, p))
      }
      assert(got === want, s"seed=$seed")
    }
  }
}
