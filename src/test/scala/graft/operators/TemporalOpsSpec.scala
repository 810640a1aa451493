package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class TemporalOpsSpec extends SparkSuite {
  import spark.implicits._

  test("floorDiv floors (Spark div and DuckDB // both truncate)") {
    val out = Seq((-7L, 3L), (7L, 3L), (-6L, 3L), (0L, 3L), (-1L, 3L))
      .toDF("a", "b")
      .select(TemporalOps.floorDiv(col("a"), col("b")).as("fd"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(-3L, 2L, -2L, 0L, -1L))
  }

  test("floorDiv is exact past 2^52 (epoch-nanosecond dividends — the " +
      "double-mediated form mis-bucketed these)") {
    // values straddling bucket boundaries in a range where doubles have
    // 128 ns granularity
    val step = 3600L * 1000000000L
    val cases = Seq(
      1700000000000000000L, 1700000000000000001L,
      1699999999999999999L, Long.MaxValue - 1, -1700000000000000001L)
    val out = cases.map(a => (a, step)).toDF("a", "b")
      .select(col("a"), TemporalOps.floorDiv(col("a"), col("b")).as("fd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cases.foreach { a =>
      assert(out(a) == Math.floorDiv(a, step),
        s"floorDiv($a, $step): got ${out(a)}, want ${Math.floorDiv(a, step)}")
    }
  }

  test("gapFillInterpolate: hourly grid inside a gap, exact integer lerp") {
    // one key, fixes at t=1800 (v=100) and t=9000 (v=460): grid hours
    // 3600 and 7200 fall inside; lerp is exact (slope 0.05/s)
    val df = Seq((1L, 1800L, 1L, 100L), (1L, 9000L, 2L, 460L))
      .toDF("k", "t", "id", "v")
    val out = TemporalOps.gapFillInterpolate(df, "k", "t", "id", "v", 3600L, 86400L)
      .orderBy("grid_t").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // v(3600) = 100 + (360*1800)/7200 = 190; v(7200) = 100 + 360*5400/7200 = 370
    assert(out == Seq((3600L, 190L), (7200L, 370L)))
  }

  test("gapFillInterpolate: descending series floors like the oracle") {
    // v drops 100 → 3 over (0, 7200]: grid 3600 lerps to 100 + floor(-97*3600/7200)
    // = 100 + floor(-48.5) = 100 - 49 = 51 (truncation would give 52)
    val df = Seq((1L, 1L, 1L, 100L), (1L, 7200L, 2L, 3L)).toDF("k", "t", "id", "v")
    val out = TemporalOps.gapFillInterpolate(df, "k", "t", "id", "v", 3600L, 86400L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((3600L, 51L)))
  }

  test("gapFillInterpolate: gaps over the cap are left open, " +
      "grid-aligned fixes do not re-emit themselves") {
    val df = Seq(
      (1L, 3600L, 1L, 0L), (1L, 10800L, 2L, 100L), // 2h gap: emits 7200 only
      (2L, 0L, 3L, 0L), (2L, 200000L, 4L, 1L)      // 55h gap: over 48h cap
    ).toDF("k", "t", "id", "v")
    val out = TemporalOps.gapFillInterpolate(df, "k", "t", "id", "v",
      3600L, 48L * 3600L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 7200L)))
  }

  test("gapFillInterpolate: duplicate timestamps anchor on the last row " +
      "in tiebreak order") {
    val df = Seq((1L, 0L, 1L, 10L), (1L, 0L, 2L, 50L), (1L, 7200L, 3L, 50L))
      .toDF("k", "t", "id", "v")
    val out = TemporalOps.gapFillInterpolate(df, "k", "t", "id", "v", 3600L, 86400L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // the (t=0,id=2,v=50) row anchors → flat series, v(3600)=50
    assert(out == Seq((3600L, 50L)))
  }

  test("gapFillInterpolate generates rows, never joins a calendar " +
      "(single keyed window + generate in the plan)") {
    val df = Seq((1L, 0L, 1L, 0L), (1L, 7200L, 2L, 72L)).toDF("k", "t", "id", "v")
    val plan = TemporalOps.gapFillInterpolate(df, "k", "t", "id", "v", 3600L, 86400L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("locfFill: carries the last non-null forward per key, leaves the " +
      "prefix before the first observation null") {
    val df = Seq(
      (1L, 10L, 1L, Option.empty[Long]), // before first obs → stays null
      (1L, 20L, 2L, Option(5L)),
      (1L, 30L, 3L, Option.empty[Long]), // carried 5
      (1L, 40L, 4L, Option(9L)),
      (1L, 50L, 5L, Option.empty[Long]), // carried 9
      (2L, 10L, 6L, Option.empty[Long])) // other key: no bleed-over
      .toDF("k", "t", "id", "v")
    val out = TemporalOps.locfFill(df, "k", "t", "id", "v")
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(out == Seq(
      (1L, 10L, None), (1L, 20L, Some(5L)), (1L, 30L, Some(5L)),
      (1L, 40L, Some(9L)), (1L, 50L, Some(9L)), (2L, 10L, None)))
  }

  test("locfFill: observed rows keep their own value (fill is a new " +
      "column; v itself untouched) and ties break on the tie column") {
    val df = Seq(
      (1L, 10L, 1L, Option(3L)),
      (1L, 10L, 2L, Option.empty[Long])) // same t: id-order decides
      .toDF("k", "t", "id", "v")
    val out = TemporalOps.locfFill(df, "k", "t", "id", "v")
      .orderBy("id").collect()
    assert(out(0).getLong(3) == 3L && out(0).getLong(4) == 3L)
    assert(out(1).isNullAt(3) && out(1).getLong(4) == 3L)
  }

  test("locfFill plans one keyed window, no join and no extra exchange") {
    val df = Seq((1L, 10L, 1L, Option(3L))).toDF("k", "t", "id", "v")
    val plan = TemporalOps.locfFill(df, "k", "t", "id", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("resampleOhlc: open/close follow the composite (t, tie) order, " +
      "bucket boundaries are exact") {
    val df = Seq(
      // bucket 0 [0, 100): ties at t=5 resolve by id
      (1L, 5L, 2L, 20L), (1L, 5L, 1L, 10L), (1L, 99L, 3L, 5L),
      // t=100 is the NEXT bucket's first instant
      (1L, 100L, 4L, 77L),
      (2L, 42L, 5L, 1L)).toDF("k", "t", "id", "v")
    val out = TemporalOps.resampleOhlc(df, "k", "t", "id", "v", 100L)
      .orderBy("k", "bucket_t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("n"),
        r.getAs[Long]("open"), r.getAs[Long]("high"), r.getAs[Long]("low"),
        r.getAs[Long]("close"), r.getAs[Long]("total"))).toSeq
    assert(out == Seq(
      (1L, 0L, 3L, 10L, 20L, 5L, 5L, 35L),
      (1L, 100L, 1L, 77L, 77L, 77L, 77L, 77L),
      (2L, 0L, 1L, 1L, 1L, 1L, 1L, 1L)))
  }

  test("resampleOhlc: negative timestamps bucket by FLOOR (the epoch-" +
      "before-zero edge truncation gets wrong)") {
    val df = Seq((1L, -1L, 1L, 9L)).toDF("k", "t", "id", "v")
    val r = TemporalOps.resampleOhlc(df, "k", "t", "id", "v", 100L)
      .collect()(0)
    assert(r.getAs[Long]("bucket_t") == -100L)
  }

  test("resampleOhlc is one aggregate — no window, no join, no per-key " +
      "sort in the plan") {
    val df = Seq((1L, 5L, 1L, 10L)).toDF("k", "t", "id", "v")
    val plan = TemporalOps.resampleOhlc(df, "k", "t", "id", "v", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Aggregate"), plan)
  }

  test("cohortRetention: triangle counts and ppm on a hand-built roster") {
    // bucket = 10 us. u1 first in bucket 0, back in 1 and 3 (twice — must
    // dedup); u2 first in 0, never back; u3 first in 1, back in 2.
    val ev = Seq(
      ("u1", 1L), ("u1", 12L), ("u1", 31L), ("u1", 39L),
      ("u2", 5L),
      ("u3", 11L), ("u3", 25L)
    ).toDF("uid", "t_us")
    val got = TemporalOps.cohortRetention(ev, "uid", "t_us", 10L)
      .orderBy("cohort_bucket", "bucket_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 0L, 2L, 1000000L), // u1+u2 census
      (0L, 1L, 1L, 500000L),  // u1 back in week 1
      (0L, 3L, 1L, 500000L),  // u1 back in week 3 (two events, one user)
      (1L, 0L, 1L, 1000000L), // u3 census
      (1L, 1L, 1L, 1000000L)))
  }

  test("cohortRetention: offset-0 row always exists and bounds every " +
    "later offset (retained_ppm ≤ 1e6)") {
    val ev = graft.queries.Tables.events(spark, sf("0.001"))
      .select(col("user_id").as("uid"), expr("ts div 1000").as("t_us"))
    val rows = TemporalOps.cohortRetention(ev, "uid", "t_us",
      7L * 86400L * 1000000L).collect()
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (c, rs) =>
      assert(rs.exists(_.getLong(1) == 0L), s"cohort $c missing census row")
      rs.foreach(r => assert(r.getLong(3) <= 1000000L,
        s"cohort $c offset ${r.getLong(1)} ppm ${r.getLong(3)} > 1e6"))
    }
  }

  test("coalesceIntervals: overlap and touch merge, strict gap splits; " +
      "containment does not extend the island") {
    // key 1: [0,10] + [10,20] touch → one island; [25,30] gapped;
    // [26,27] contained. key 2: untouched singleton.
    val df = Seq((1L, 0L, 10L), (1L, 10L, 20L), (1L, 25L, 30L),
      (1L, 26L, 27L), (2L, 5L, 6L)).toDF("k", "s", "e")
    val out = TemporalOps.coalesceIntervals(df, "k", "s", "e")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSet
    assert(out === Set((1L, 0L, 20L, 20L, 2L), (1L, 25L, 30L, 5L, 2L),
      (2L, 5L, 6L, 1L, 1L)))
  }

  test("coalesceIntervals: an earlier long interval swallows later short " +
      "ones (running-max, not lag-previous, semantics)") {
    // [0,100] then [5,10], [20,30], [40,41]: lag-based islanding would
    // split at 20 (20 > previous end 10); running max 100 keeps one.
    val df = Seq((1L, 0L, 100L), (1L, 5L, 10L), (1L, 20L, 30L),
      (1L, 40L, 41L)).toDF("k", "s", "e")
    val out = TemporalOps.coalesceIntervals(df, "k", "s", "e").collect()
    assert(out.length == 1)
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(5)) ==
      ((0L, 100L, 4L)))
  }

  test("coalesceIntervals drops degenerate intervals and is " +
      "partitioning-invariant (exact-tie duplicates included)") {
    val rows = Seq((1L, 3L, 8L), (1L, 3L, 8L), (1L, 8L, 12L),
      (1L, 50L, 40L), (1L, 20L, 25L)) // (50,40) inverted → dropped
    val a = TemporalOps.coalesceIntervals(
      rows.toDF("k", "s", "e").repartition(7), "k", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val b = TemporalOps.coalesceIntervals(
      rows.toDF("k", "s", "e").coalesce(1), "k", "s", "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(a === b)
    assert(a === Set((1L, 3L, 12L, 9L, 3L), (2L, 20L, 25L, 5L, 1L)))
  }

  test("timeWeightedAvg weighs by holding time, drops the last segment, " +
      "truncates toward zero") {
    // key 1: v=10 holds 10us, v=30 holds 10us → twa 20; final obs dropped.
    // key 2: v=7 holds 3us, v=1 holds 1us → (21+1)/4 = 5 (trunc of 5.5).
    val df = Seq((1L, 0L, 1L, 10L), (1L, 10L, 2L, 30L), (1L, 20L, 3L, 99L),
      (2L, 0L, 1L, 7L), (2L, 3L, 2L, 1L), (2L, 4L, 3L, 0L))
      .toDF("k", "t", "tie", "v")
    val got = TemporalOps.timeWeightedAvg(df, "k", "t", "tie", "v")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> ((20L, 20L, 2L)), 2L -> ((5L, 4L, 2L))))
  }

  test("timeWeightedAvg drops single-observation and zero-span keys " +
      "instead of emitting a 0/0 average") {
    val df = Seq((1L, 5L, 1L, 42L), // single obs: no segment
      (2L, 7L, 1L, 10L), (2L, 7L, 2L, 20L)) // all tied: span 0
      .toDF("k", "t", "tie", "v")
    assert(TemporalOps.timeWeightedAvg(df, "k", "t", "tie", "v").count() === 0)
  }

  test("timeWeightedAvg: negative values stay cross-engine exact " +
      "(truncation toward zero, matching DuckDB //)") {
    // (-10*3 + -1*1) / 4 = -31/4 → trunc -7 (floor would give -8).
    val df = Seq((1L, 0L, 1L, -10L), (1L, 3L, 2L, -1L), (1L, 4L, 3L, 0L))
      .toDF("k", "t", "tie", "v")
    val got = TemporalOps.timeWeightedAvg(df, "k", "t", "tie", "v").collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((-7L, 4L, 2L)))
  }

  test("timeWeightedAvg plans one exchange: lead window and aggregate " +
      "share the key partitioning") {
    val df = Seq((1L, 0L, 1L, 10L), (1L, 5L, 2L, 20L)).toDF("k", "t", "tie", "v")
    val plan = TemporalOps.timeWeightedAvg(df, "k", "t", "tie", "v")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1, plan)
  }

  test("transitionMatrix: adjacent pairs count, the last event of each " +
      "key emits nothing, ppm floors against the from-state total") {
    // user 1: a→b→a→c; user 2: b→a. Transitions: a→b, b→a(×2), a→c.
    val df = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "a"),
      (1L, 40L, 4L, "c"), (2L, 5L, 1L, "b"), (2L, 6L, 2L, "a"))
      .toDF("k", "t", "tie", "st")
    val got = TemporalOps.transitionMatrix(df, "k", "t", "tie", "st")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("a", "b") -> ((1L, 2L, 500000L)),
      ("a", "c") -> ((1L, 2L, 500000L)),
      ("b", "a") -> ((2L, 2L, 1000000L))))
  }

  test("transitionMatrix: exact-time ties order by the tie column " +
      "(deterministic under any partitioning) and per-from ppm sums " +
      "to at most 1e6") {
    val df = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 10L, 3L, "c"),
      (2L, 10L, 1L, "a"), (2L, 10L, 2L, "c"))
      .toDF("k", "t", "tie", "st")
    def run(d: org.apache.spark.sql.DataFrame) =
      TemporalOps.transitionMatrix(d, "k", "t", "tie", "st").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val a = run(df.repartition(5))
    assert(a === run(df.coalesce(1)))
    assert(a === Set(("a", "b", 1L), ("b", "c", 1L), ("a", "c", 1L)))
    val sums = TemporalOps.transitionMatrix(df, "k", "t", "tie", "st")
      .groupBy("from_state").sum("prob_ppm").collect()
      .map(_.getLong(1))
    assert(sums.forall(_ <= 1000000L))
  }

  test("coalesceIntervals plans one exchange: both windows and the " +
      "rollup share the key partitioning") {
    val df = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val plan = TemporalOps.coalesceIntervals(df, "k", "s", "e")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("attribution: touches split at each conversion, all three credit " +
      "models, trailing touches unattributed") {
    // one user: view(1) click(2) BUY(3) signup(4) BUY(5) error(6)
    // BUY@3 funds {view, click}: first=view, last=click, 500000 ppm each
    // BUY@5 funds {signup}: first=last=signup, 1000000 ppm
    // error(6) trails the last conversion: zero credit, channel absent
    val df = Seq(
      (1L, 1L, 1L, "view"), (1L, 2L, 2L, "click"), (1L, 3L, 3L, "buy"),
      (1L, 4L, 4L, "signup"), (1L, 5L, 5L, "buy"), (1L, 6L, 6L, "error"))
      .toDF("u", "t", "id", "ch")
    val out = TemporalOps.attribution(df, "u", "t", "id", "ch", "buy")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out == Map(
      "view" -> ((1L, 1L, 0L, 500000L)),
      "click" -> ((1L, 0L, 1L, 500000L)),
      "signup" -> ((1L, 1L, 1L, 1000000L))))
  }

  test("attribution: a user with no conversion credits nothing; linear " +
      "ppm floors (remainder documented, never rounds up)") {
    val df = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "a"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "buy"),
      (2L, 1L, 5L, "a"), (2L, 2L, 6L, "a")) // user 2: never converts
      .toDF("u", "t", "id", "ch")
    val out = TemporalOps.attribution(df, "u", "t", "id", "ch", "buy")
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // floor(1e6/3)=333333 per touch — 999999 total, 1 ppm floor loss
    assert(out == Map("a" -> 999999L))
  }

  test("attribution: a NULL channel row is a TOUCH under channel null " +
      "(the oracle's CASE null→0), never a silently dropped row") {
    val df = Seq((1L, 1L, 1L, Option("a")), (1L, 2L, 2L, None),
      (1L, 3L, 3L, Option("buy"))).toDF("u", "t", "id", "ch")
    val out = TemporalOps.attribution(df, "u", "t", "id", "ch", "buy")
      .collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(4)))
      .toMap
    // two touches share the conversion: 500000 ppm each, one of them NULL
    assert(out == Map(Some("a") -> ((1L, 500000L)),
      None -> ((1L, 500000L))))
  }

  test("attribution is partitioning-independent") {
    val df = (1L to 200L).map { i =>
      val u = i % 7
      val ch = if (i % 5 == 0) "buy" else s"c${i % 3}"
      (u, i, i, ch)
    }.toDF("u", "t", "id", "ch")
    def run(d: org.apache.spark.sql.DataFrame) =
      TemporalOps.attribution(d, "u", "t", "id", "ch", "buy").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    assert(run(df.repartition(7)) === run(df.coalesce(1)))
  }

  test("clampedBalance matches the sequential fold (reflection identity)") {
    // deterministic pseudo-random walk per key, checked against the
    // direct b_i = max(0, b_{i-1} + x_i) recurrence on the driver
    val rows = for (k <- 1L to 5L; i <- 1L to 40L) yield {
      val amt = ((k * 7919L + i * 104729L) % 2001L) - 1000L // [-1000, 1000]
      (k, i, i, amt)
    }
    val df = rows.toDF("k", "t", "id", "amt")
    val got = TemporalOps.clampedBalance(df, "k", "t", "id", "amt")
      .select("k", "t", "balance", "clamped").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    for (k <- 1L to 5L) {
      var b = 0L
      for (i <- 1L to 40L) {
        val amt = ((k * 7919L + i * 104729L) % 2001L) - 1000L
        val clamps = b + amt < 0L
        b = math.max(0L, b + amt)
        assert(got((k, i)) == ((b, clamps)), s"k=$k i=$i")
      }
    }
  }

  test("clampedBalance: clamp flag marks exactly the floor-binding " +
      "steps; first-row clamp works (lag default 0)") {
    val df = Seq((1L, 1L, 1L, -5L), (1L, 2L, 2L, 3L),
      (1L, 3L, 3L, -10L), (1L, 4L, 4L, 4L)).toDF("k", "t", "id", "amt")
    val out = TemporalOps.clampedBalance(df, "k", "t", "id", "amt")
      .orderBy("t").select("balance", "clamped").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(out == Seq((0L, true), (3L, false), (0L, true), (4L, false)))
  }

  test("clampedBalance plans one exchange — no join, no sequential " +
      "driver loop") {
    val df = Seq((1L, 1L, 1L, 1L)).toDF("k", "t", "id", "amt")
    val plan = TemporalOps.clampedBalance(df, "k", "t", "id", "amt")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 <= 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  // ---------------------------------------------------------------- FIFO

  /** Sequential unit-rank FIFO reference: two-pointer walk over the
    * time-ordered lots and demands of one key. */
  private def fifoRef(lots: Seq[(Long, Long)], demands: Seq[(Long, Long)])
      : Seq[(Long, Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var li = 0; var di = 0
    var lrem = if (lots.nonEmpty) lots.head._2 else 0L
    var drem = if (demands.nonEmpty) demands.head._2 else 0L
    while (li < lots.length && di < demands.length) {
      val m = math.min(lrem, drem)
      if (m > 0) out += ((lots(li)._1, demands(di)._1, m))
      lrem -= m; drem -= m
      if (lrem == 0) { li += 1; if (li < lots.length) lrem = lots(li)._2 }
      if (drem == 0) { di += 1; if (di < demands.length) drem = demands(di)._2 }
    }
    out.toSeq
  }

  test("fifoMatch equals the sequential two-pointer FIFO on a " +
      "pseudo-random multi-key ledger") {
    val rows = for (k <- 1L to 4L; i <- 1L to 40L) yield
      (k, i, i, (k * 7919L + i * 104729L) % 97L + 1L, i % 2 == 0)
    val df = rows.toDF("k", "t", "id", "qty", "is_lot")
    val got = TemporalOps.fifoMatch(df, "k", "t", "id", "qty", "is_lot")
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5)))
      .toSet
    val want = (1L to 4L).flatMap { k =>
      val mine = rows.filter(_._1 == k)
      val lots = mine.filter(_._5).map(r => (r._3, r._4))
      val ds = mine.filter(!_._5).map(r => (r._3, r._4))
      fifoRef(lots, ds).map { case (lt, dt, q) => (k, lt, dt, q) }
    }.toSet
    assert(got == want)
  }

  test("fifoMatch conserves quantity: matched total = min(supply, " +
      "demand) per key; per-key match count < lots + demands") {
    val rows = for (k <- 1L to 3L; i <- 1L to 50L) yield
      (k, i, i, (k * 31L + i * 17L) % 40L + 1L, i % 3 == 0)
    val df = rows.toDF("k", "t", "id", "qty", "is_lot")
    val perKey = TemporalOps
      .fifoMatch(df, "k", "t", "id", "qty", "is_lot")
      .groupBy("k")
      .agg(sum("matched_qty").as("mq"), count(lit(1)).as("nm"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    for (k <- 1L to 3L) {
      val mine = rows.filter(_._1 == k)
      val supply = mine.filter(_._5).map(_._4).sum
      val demand = mine.filter(!_._5).map(_._4).sum
      val (mq, nm) = perKey(k)
      assert(mq == math.min(supply, demand), s"k=$k")
      assert(nm < mine.length, s"k=$k staircase bound violated")
    }
  }

  // -------------------------------------------------------- cadence

  test("cadenceProfile picks exact discrete order statistics and " +
      "reports 0 ppm for a metronome") {
    // key 1: gaps are the multiset {1..100} (arrival at cumulative
    // sums) → p25 = 25, p50 = 50, p75 = 75; key 2: constant gap 7
    val arrivals1 = (1L to 100L).scanLeft(0L)(_ + _)
    val rows = arrivals1.zipWithIndex.map { case (t, i) =>
      (1L, t, i.toLong) } ++
      (0L to 20L).map(i => (2L, i * 7L, 1000L + i))
    val df = rows.toDF("k", "t", "id")
    val got = TemporalOps.cadenceProfile(df, "k", "t", "id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(6))).toMap
    assert(got(1L) == ((100L, 25L, 50L, 75L, 1000000L)))
    assert(got(2L) == ((20L, 7L, 7L, 7L, 0L)))
  }

  // ---------------------------------------------------------- funnel

  test("funnelWithin honors the per-stage gap and greedy-earliest " +
      "anchoring") {
    val gap = 10L
    val rows = Seq(
      // u1: full conversion inside both windows
      (1L, 0L, "signup"), (1L, 5L, "click"), (1L, 12L, "purchase"),
      // u2: click misses the window → stage 1 even though a purchase
      // exists later
      (2L, 0L, "signup"), (2L, 11L, "click"), (2L, 12L, "purchase"),
      // u3: GREEDY anchor — earliest click at t=1 opens (1, 11]; the
      // purchase at 20 is only inside the LATER click's window and
      // must NOT count
      (3L, 0L, "signup"), (3L, 1L, "click"), (3L, 10L, "click"),
      (3L, 20L, "purchase"),
      // u4: purchase exactly at the inclusive boundary
      (4L, 0L, "signup"), (4L, 10L, "click"), (4L, 20L, "purchase"),
      // u5: no signup → absent from output entirely
      (5L, 0L, "click"), (5L, 1L, "purchase"))
    val df = rows.toDF("u", "t", "et")
    val got = TemporalOps.funnelWithin(df, "u", "t", "et",
        Seq("signup", "click", "purchase"), gap)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  // -------------------------------------------------- session paths

  test("sessionPaths: gap rule splits sessions, paths keep time order, " +
      "frequencies count sessions not events, top-k order is total") {
    val gap = 10L
    val rows = Seq(
      // u1: [a, b] then (gap) [a, b] — path a>b twice
      (1L, 0L, 1L, "a"), (1L, 5L, 2L, "b"),
      (1L, 100L, 3L, "a"), (1L, 105L, 4L, "b"),
      // u2: one session [b, a] (order by time, not arrival)
      (2L, 50L, 6L, "a"), (2L, 45L, 5L, "b"),
      // u3: singleton
      (3L, 0L, 7L, "c"))
    val df = rows.toDF("u", "t", "id", "et")
    val got = TemporalOps.sessionPaths(df, "u", "t", "id", "et", gap, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a>b", 2L), ("b>a", 1L), ("c", 1L)))
  }

  // -------------------------------------------- tie-order contract

  test("clampedBalance under duplicate (t, tie) keys lands on SOME " +
      "sequential tie permutation (documented nondeterminism contract)") {
    // one key, three rows tied at (t=1, tie=1) with non-commuting
    // amounts under the clamp, plus an anchor after the tie group
    val tied = Seq(-5L, 3L, -4L)
    val df = (tied.map(a => (1L, 1L, 1L, a)) :+ (1L, 2L, 2L, 2L))
      .toDF("k", "t", "id", "amt")
    val finalBal = TemporalOps.clampedBalance(df, "k", "t", "id", "amt")
      .orderBy(col("t").desc).select("balance").limit(1)
      .collect()(0).getLong(0)
    val admissible = tied.permutations.map { perm =>
      (perm :+ 2L).foldLeft(0L)((b, a) => math.max(0L, b + a))
    }.toSet
    assert(admissible.contains(finalBal),
      s"$finalBal not reachable by any tie order ($admissible)")
  }

  // -------------------------------------------- seasonal-naive backtest

  test("seasonalNaiveBacktest: holes evaluate nothing, WAPE and signed " +
      "bias floor exactly") {
    // group g, season 2: periods 0..4 with period 3 missing.
    //   eval points: p2 (f=v0=10, a=30) and p4 (f=v2=30, a=20);
    //   p3 absent ⇒ neither evaluates NOR serves as a base for p5.
    // sum_abs_err = 20+10 = 30, sum_actual = 50, wape = 600000;
    // signed err = (10-30)+(30-20) = -10 ⇒ bias = floor(-1e7/50) =
    // -200000 exactly (also exercises the negative floorDiv branch).
    val df = Seq((0L, 10L), (1L, 99L), (2L, 30L), (4L, 20L))
      .map { case (p, v) => ("g", p, v) }.toDF("grp", "p", "v")
    val r = TemporalOps.seasonalNaiveBacktest(df, "grp", "p", "v", 2)
      .collect()
    assert(r.length == 1)
    val row = r(0)
    assert((row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5)) == ((2L, 30L, 50L, 600000L, -200000L)))
  }

  test("seasonalNaiveBacktest: zero actuals null the ppm columns " +
      "instead of dividing") {
    val df = Seq(("g", 0L, 0L), ("g", 1L, 0L)).toDF("grp", "p", "v")
    val r = TemporalOps.seasonalNaiveBacktest(df, "grp", "p", "v", 1)
      .collect()(0)
    assert(r.getLong(1) == 1L && r.isNullAt(4) && r.isNullAt(5))
  }

  // -------------------------------------------- rolling distinct actives

  test("rollingActiveUsers: WAU counts a user once across overlapping " +
      "activity, DAU/stickiness exact") {
    // u1 active days 1,2; u2 active day 2; u3 active day 9 (isolated).
    // W=3: day1 dau=1 wau=1; day2 dau=2 wau=2 (u1 NOT double-counted
    // via both day1 and day2 coverage); day9 dau=1 wau=1. Days 3,4
    // (covered but inactive) do not emit.
    val df = Seq((1L, 1L), (1L, 2L), (1L, 2L), (2L, 2L), (3L, 9L))
      .toDF("u", "d")
    val got = TemporalOps.rollingActiveUsers(df, "u", "d", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((1L, 1L, 1000000L)),
      2L -> ((2L, 2L, 1000000L)),
      9L -> ((1L, 1L, 1000000L))))
  }

  test("rollingActiveUsers: a churned-then-returned user still counts " +
      "in WAU for days inside the window after last activity") {
    // u1 active day 1 only; u2 active days 1 and 3. Day 3 (W=3): u1's
    // day-1 activity is 2 days old ⇒ still in window ⇒ wau=2, dau=1.
    val df = Seq((1L, 1L), (2L, 1L), (2L, 3L)).toDF("u", "d")
    val day3 = TemporalOps.rollingActiveUsers(df, "u", "d", 3)
      .filter(col("day") === 3L).collect()(0)
    assert((day3.getLong(1), day3.getLong(2), day3.getLong(3)) ==
      ((1L, 2L, 500000L)))
  }

  // -------------------------------------------- growth accounting

  test("growthAccounting: new/retained/resurrected/churned satisfy the " +
      "accounting identities; churn past the data edge never emits") {
    // u1: days 1,2,4 (retained day 2, churn at 3, resurrected day 4)
    // u2: day 1 only (churn at 2)
    // u3: day 4 only (new at the last period — no churn at 5: edge)
    val df = Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 1L), (3L, 4L))
      .toDF("u", "p")
    val rows = TemporalOps.growthAccounting(df, "u", "p")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(rows(1L) == ((2L, 0L, 0L, 0L)))       // u1, u2 new
    assert(rows(2L) == ((0L, 1L, 0L, 1L)))       // u1 retained, u2 churned
    assert(rows(3L) == ((0L, 0L, 0L, 1L)))       // u1 churned (gap day)
    assert(rows(4L) == ((1L, 0L, 1L, 0L)))       // u3 new, u1 resurrected
    assert(!rows.contains(5L), "no churn past max observed period")
    // identity: actives(p) = new + retained + resurrected
    assert(rows(1L)._1 + rows(1L)._2 + rows(1L)._3 == 2L)
    assert(rows(4L)._1 + rows(4L)._2 + rows(4L)._3 == 2L)
  }

  test("growthAccounting: quick ratio floors and nulls on zero churn") {
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (1L, 2L)).toDF("u", "p")
    val rows = TemporalOps.growthAccounting(df, "u", "p")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
      .toMap
    assert(rows(1L) == ((0L, None)))  // nobody churned into period 1
    // period 2: u2,u3 churn (2), 0 new + 0 resurrected ⇒ ratio 0
    assert(rows(2L) == ((2L, Some(0L))))
  }

  // -------------------------------------------- session exit rates

  test("sessionExitRates: bounce = single-event session; enter/exit " +
      "flags come from the gap sessionization") {
    val gap = 100L
    // u1: [a(t0) b(t50)] then [b(t500)] — session 1 enters a exits b,
    // session 2 bounces on b. u2: [c(t0)] — bounce on c.
    val df = Seq(
      (1L, 0L, 1L, "a"), (1L, 50L, 2L, "b"), (1L, 500L, 3L, "b"),
      (2L, 0L, 4L, "c")).toDF("u", "t", "id", "et")
    val got = TemporalOps.sessionExitRates(df, "u", "t", "id", "et", gap)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got("a") == ((1L, 1L, 0L, 0L, 0L)))
    // b: contained in 2 sessions, enters 1 (the bounce), exits 2,
    // bounces 1, exit rate 1e6
    assert(got("b") == ((2L, 1L, 2L, 1L, 1000000L)))
    assert(got("c") == ((1L, 1L, 1L, 1L, 1000000L)))
  }

  // -------------------------------------------- peak rate / bursts

  test("peakRate: a burst straddling a bucket boundary is seen whole; " +
      "the window edge is inclusive; earliest argmax wins") {
    // key a: events at t = 55, 65, 75, 120 with window 60: anchored at
    // 55 the frame [55,115] holds 3; a 60-tumbling bucket split (0-59 /
    // 60-119) would report max 2. Anchored at 65: [65,125] holds 3 too
    // (inclusive 120 boundary at t=60+65? 125 ≥ 120 ⇒ 3): ties at 3 ⇒
    // the EARLIEST anchor (55) is reported.
    val df = Seq(("a", 55L), ("a", 65L), ("a", 75L), ("a", 120L),
      ("b", 0L)).toDF("k", "t")
    val got = TemporalOps.peakRate(df, "k", "t", 60L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(got("a") == ((3L, 55L)))
    assert(got("b") == ((1L, 0L)))
    // the inclusive edge: at window 20 the frame anchored at 55 holds
    // {55, 65, 75} — 75 sits EXACTLY on the edge (an exclusive frame
    // would peak at 2)
    val tight = TemporalOps.peakRate(df.filter($"k" === "a"), "k", "t", 20L)
      .collect()(0)
    assert((tight.getLong(1), tight.getLong(2)) == ((3L, 55L)))
  }

  // -------------------------------------------- funnel stage latency

  test("funnelStageLatency: delays come from the greedy-earliest " +
      "anchors; non-transitioning users are absent, not zero") {
    // u1: a@0 → b@10 → c@30 (delays 10, 20)
    // u2: a@0 → b@50 (no c): transition 1 delay 50, absent from 2
    // u3: b@5 only (never entered): absent everywhere
    // u4: a@0 → b@200 beyond gap 100: absent from transition 1
    val ev = Seq(
      (1L, 0L, "a"), (1L, 10L, "b"), (1L, 30L, "c"),
      (2L, 0L, "a"), (2L, 50L, "b"),
      (3L, 5L, "b"),
      (4L, 0L, "a"), (4L, 200L, "b")).toDF("u", "t", "et")
    val got = TemporalOps.funnelStageLatency(ev, "u", "t", "et",
        Seq("a", "b", "c"), 100L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(5))).toMap
    // transition 1 (a→b): delays {10, 50}: n=2, p50=10, max=50
    assert(got(1L) == ((2L, 10L, 50L)))
    // transition 2 (b→c): only u1: n=1, p50=20, max=20
    assert(got(2L) == ((1L, 20L, 20L)))
  }

  // -------------------------------------------- rolling median

  test("rollingMedian: lower median over the trailing window; an " +
      "outlier bucket moves it at most one rank; warm-up sizes emit") {
    val df = Seq(("g", 1L, 10L), ("g", 2L, 20L), ("g", 3L, 9000L),
      ("g", 4L, 30L), ("g", 5L, 40L)).toDF("k", "b", "v")
    val got = TemporalOps.rollingMedian(df, "k", "b", "v", 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got(1L) == ((1L, 10L)))      // warm-up n=1
    assert(got(2L) == ((2L, 10L)))      // lower median of {10,20}
    assert(got(3L) == ((3L, 20L)))      // outlier enters, median holds
    assert(got(4L) == ((3L, 30L)))      // {20,9000,30} → 30
    assert(got(5L) == ((3L, 40L)))      // outlier leaves
  }

  // -------------------------------------------- seasonal index

  test("seasonalIndex: a flat series indexes 10^6 on every observed " +
      "weekday; a doubled weekday reads above, the rest below") {
    // 14 consecutive days, value 100/day except day-of-week 0 doubled.
    // dow of day d is (d+3)%7; days 4 and 11 are dow 0.
    val flat = (0L until 14L).map(d => ("flat", d, 100L))
    val bump = (0L until 14L).map(d =>
      ("bump", d, if ((d + 3) % 7 == 0) 200L else 100L))
    val df = (flat ++ bump).toDF("g", "day", "v")
    val got = TemporalOps.seasonalIndex(df, "g", "day", "v")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(4))
      .toMap
    (0L to 6L).foreach(dw => assert(got(("flat", dw)) == 1000000L))
    // bump: mean = (2·200 + 12·100)/14 = 1600/14; dow0 index =
    // 200·14e6/1600 = 1750000; others = 100·14·1e6/1600 = 875000
    assert(got(("bump", 0L)) == 1750000L)
    (1L to 6L).foreach(dw => assert(got(("bump", dw)) == 875000L))
  }
}
