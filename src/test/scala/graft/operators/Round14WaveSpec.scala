package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand fixtures for the round-14 stats wave (q267–q277): every
 * statistic below is derived on paper from the operator's documented
 * lattice — doubled mid-ranks, per-term floors, guarded integer
 * square roots — so a lattice drift in either engine direction is a
 * spec failure, not an oracle coincidence.
 */
class Round14WaveSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // friedman (q267)
  // ------------------------------------------------------------------

  test("friedman: perfect within-block ordering reads the classic " +
      "Q = n(k-1)... = 6.0 at n=3, k=3; incomplete blocks drop and " +
      "count; an all-incomplete cell still emits its row") {
    val rows =
      // cell c: 3 complete blocks, A < B < C in every block -> Q = 6
      (for (b <- 1 to 3) yield Seq(
        ("c", b.toLong, "A", 1L), ("c", b.toLong, "B", 2L),
        ("c", b.toLong, "C", 3L))).flatten ++
      // plus one incomplete block (missing C) -> dropped, Q unchanged
      Seq(("c", 9L, "A", 1L), ("c", 9L, "B", 2L)) ++
      // cell e: groups A,B exist cell-wide but every block holds only
      // A -> all blocks incomplete -> n_blocks 0, null stats
      Seq(("e", 1L, "A", 1L), ("e", 1L, "B", 2L), ("e", 2L, "A", 1L),
        ("e", 3L, "A", 1L))
    val got = StatsOps.friedman(rows.toDF("cell", "block", "grp", "v"),
        "cell", "block", "grp", "v")
      .orderBy("cell").collect()
    val c = got(0)
    assert(c.getString(0) === "c")
    assert(c.getLong(1) === 3L)       // k
    assert(c.getLong(2) === 3L)       // n_blocks (block 9 dropped)
    assert(c.getLong(3) === 1L)       // n_dropped
    assert(c.getLong(4) === 0L)       // tie_t
    assert(c.getLong(5) === 6000L)    // q_milli
    assert(c.getLong(6) === 6000L)    // q_tie_milli (no ties)
    val e = got(1)
    assert(e.getString(0) === "e")
    // block (e,1) holds A and B -> complete iff k=2... it IS complete
    // (nb=2, gb=2=k); blocks 2,3 are incomplete
    assert(e.getLong(2) === 1L && e.getLong(3) === 2L)
  }

  test("friedman: a cell whose every block is incomplete emits " +
      "(n_blocks=0, null statistics) rather than vanishing") {
    val rows = Seq(
      ("z", 1L, "A", 1L), ("z", 2L, "A", 2L), // only A ever rated...
      ("z", 1L, "B", 5L))                     // ...except B once
    // k = 2; block 1 complete, block 2 incomplete -> tweak: make both
    // incomplete by a second cell-wide group C that no block has
    val withC = rows ++ Seq(("z", 3L, "C", 1L))
    // now k = 3: block 1 has {A,B}, block 2 {A}, block 3 {C} - all
    // incomplete
    val got = StatsOps.friedman(withC.toDF("cell", "block", "grp", "v"),
        "cell", "block", "grp", "v").collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getLong(2) === 0L && r.getLong(3) === 3L)
    assert(r.isNullAt(5) && r.isNullAt(6))
  }

  // ------------------------------------------------------------------
  // wilcoxonSignedRank (q268)
  // ------------------------------------------------------------------

  test("wilcoxonSignedRank: hand lattice — diffs (+1,+2,+3,-1,0,0) " +
      "give W+ = 8.5 on average ranks, z_milli = 1288") {
    // a - b = d: encode pairs directly
    val pairs = Seq((11L, 10L), (12L, 10L), (13L, 10L), (9L, 10L),
      (10L, 10L), (10L, 10L)).map { case (a, b) => ("c", a, b) }
    val got = StatsOps.wilcoxonSignedRank(
        pairs.toDF("cell", "a", "b"), "cell", "a", "b")
      .collect()(0)
    assert(got.getLong(1) === 6L)    // n_pairs
    assert(got.getLong(2) === 2L)    // n_zero
    assert(got.getLong(3) === 4L)    // n
    assert(got.getLong(4) === 17L)   // s2_plus (doubled W+ = 2*8.5)
    assert(got.getLong(5) === 6L)    // tie_t ((2^3-2) at |d|=1)
    // num4 = 14, den = 2*4*5*9 - 6 = 354, rad = 3e6*196//354 =
    // 1661016, isqrt = 1288 (float z = 1.2888)
    assert(got.getLong(6) === 1288L)
  }

  test("wilcoxonSignedRank: an all-zero-diff cell emits n=0 with " +
      "null z rather than vanishing") {
    val got = StatsOps.wilcoxonSignedRank(
        Seq(("c", 5L, 5L), ("c", 7L, 7L)).toDF("cell", "a", "b"),
        "cell", "a", "b").collect()(0)
    assert(got.getLong(1) === 2L && got.getLong(2) === 2L)
    assert(got.getLong(3) === 0L)
    assert(got.isNullAt(6))
  }

  // ------------------------------------------------------------------
  // mcnemar (q269)
  // ------------------------------------------------------------------

  test("mcnemar: b=6, c=2 reads chi2 = (6-2)^2/8 = 2.0 and " +
      "cc = (4-1)^2/8 = 1.125; concordant-only cells read null") {
    val rows = Seq.fill(6)(("c", 1L, 0L)) ++ Seq.fill(2)(("c", 0L, 1L)) ++
      Seq.fill(5)(("c", 1L, 1L)) ++ Seq.fill(3)(("c", 0L, 0L)) ++
      Seq.fill(4)(("k", 1L, 1L))
    val got = StatsOps.mcnemar(rows.toDF("cell", "x", "y"), "cell",
        "x", "y")
      .orderBy("cell").collect()
    val c = got(0)
    assert((c.getLong(1), c.getLong(2), c.getLong(3)) === ((16L, 5L, 3L)))
    assert((c.getLong(4), c.getLong(5)) === ((6L, 2L)))
    assert(c.getLong(6) === 2000L)
    assert(c.getLong(7) === 1125L)
    val k = got(1)
    assert(k.isNullAt(6) && k.isNullAt(7)) // b+c = 0: undefined
  }

  // ------------------------------------------------------------------
  // cochranArmitage (q270)
  // ------------------------------------------------------------------

  test("cochranArmitage: 2/10 at score 0 vs 8/10 at score 1 reads " +
      "z_milli = 2683 (z^2 = 7.2 exact); a flat table reads z = 0") {
    val rows = (Seq.fill(2)(("c", 0L, 1L)) ++ Seq.fill(8)(("c", 0L, 0L)) ++
      Seq.fill(8)(("c", 1L, 1L)) ++ Seq.fill(2)(("c", 1L, 0L))) ++
      (Seq.fill(5)(("f", 0L, 1L)) ++ Seq.fill(5)(("f", 0L, 0L)) ++
        Seq.fill(5)(("f", 1L, 1L)) ++ Seq.fill(5)(("f", 1L, 0L)))
    val got = StatsOps.cochranArmitage(rows.toDF("cell", "s", "succ"),
        "cell", "s", "succ")
      .orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(4) === 60L)     // t_num
    assert(c.getLong(5) === 2683L)   // z_milli
    val f = got(1)
    assert(f.getLong(4) === 0L && f.getLong(5) === 0L)
  }

  // ------------------------------------------------------------------
  // fleissKappa (q271)
  // ------------------------------------------------------------------

  test("fleissKappa: hand 4-item 3-rater panel reads the exact " +
      "rational kappa 0.625; incomplete items drop and count") {
    val rows = Seq(
      ("c", 1L, "x"), ("c", 1L, "x"), ("c", 1L, "x"),
      ("c", 2L, "x"), ("c", 2L, "x"), ("c", 2L, "x"),
      ("c", 3L, "y"), ("c", 3L, "y"), ("c", 3L, "y"),
      ("c", 4L, "x"), ("c", 4L, "x"), ("c", 4L, "y"),
      ("c", 5L, "x"), ("c", 5L, "y")) // 2 ratings -> dropped
    val got = StatsOps.fleissKappa(rows.toDF("cell", "item", "cat"),
        "cell", "item", "cat", 3).collect()(0)
    assert(got.getLong(1) === 4L)       // n_items
    assert(got.getLong(3) === 1L)       // n_dropped
    assert(got.getLong(4) === 833333L)  // p_bar = 20/24
    assert(got.getLong(5) === 555555L)  // p_e = 80/144
    assert(got.getLong(6) === 625000L)  // kappa = 80/128 exactly
  }

  test("fleissKappa: perfect agreement over 2+ categories reads " +
      "exactly 10^6; a single-category panel reads null (P_e = 1)") {
    val perfect = Seq(("c", 1L, "x"), ("c", 1L, "x"), ("c", 1L, "x"),
      ("c", 2L, "y"), ("c", 2L, "y"), ("c", 2L, "y"))
    val g1 = StatsOps.fleissKappa(perfect.toDF("cell", "item", "cat"),
      "cell", "item", "cat", 3).collect()(0)
    assert(g1.getLong(6) === 1000000L)
    val onecat = Seq(("c", 1L, "x"), ("c", 1L, "x"), ("c", 1L, "x"),
      ("c", 2L, "x"), ("c", 2L, "x"), ("c", 2L, "x"))
    val g2 = StatsOps.fleissKappa(onecat.toDF("cell", "item", "cat"),
      "cell", "item", "cat", 3).collect()(0)
    assert(g2.isNullAt(6))
  }

  // ------------------------------------------------------------------
  // dunnTest (q272)
  // ------------------------------------------------------------------

  test("dunnTest: three separated pairs on distinct values match the " +
      "pooled-variance z (A vs B: -1.069, A vs C: -2.138) with the " +
      "two-stage radicand floor") {
    val rows = Seq(("c", "A", 1L), ("c", "A", 2L), ("c", "B", 3L),
      ("c", "B", 4L), ("c", "C", 5L), ("c", "C", 6L))
    val got = StatsOps.dunnTest(rows.toDF("cell", "grp", "v"), "cell",
        "grp", "v")
      .orderBy("grp_a", "grp_b").collect()
    val ab = got(0); val ac = got(1); val bc = got(2)
    assert((ab.getString(1), ab.getString(2)) === (("A", "B")))
    assert(ab.getLong(5) === -1L)        // d_sign: A ranks lower
    assert(ab.getLong(6) === -1069L)     // z = -2/sqrt(3.5)
    assert(ac.getLong(6) === -2138L)     // z = -4/sqrt(3.5)
    assert(bc.getLong(6) === -1069L)
  }

  test("dunnTest: identical groups read z = 0 with d_sign 0") {
    val rows = Seq(("c", "A", 1L), ("c", "A", 2L), ("c", "B", 1L),
      ("c", "B", 2L))
    val got = StatsOps.dunnTest(rows.toDF("cell", "grp", "v"), "cell",
      "grp", "v").collect()(0)
    assert(got.getLong(5) === 0L && got.getLong(6) === 0L)
  }

  // ------------------------------------------------------------------
  // mantelHaenszel (q273)
  // ------------------------------------------------------------------

  test("mantelHaenszel: the hand Simpson fixture — both strata OR " +
      "0.75, crude OR 1.53 — reads or_mh_ppm 750000, flip = true") {
    def stratum(cell: String, st: Long, a: Int, b: Int, c: Int,
        d: Int) =
      Seq.fill(a)((cell, st, 1L, 1L)) ++ Seq.fill(b)((cell, st, 1L, 0L)) ++
        Seq.fill(c)((cell, st, 0L, 1L)) ++ Seq.fill(d)((cell, st, 0L, 0L))
    val rows = stratum("c", 0L, 6, 4, 2, 1) ++ stratum("c", 1L, 1, 4, 2, 6)
    val got = StatsOps.mantelHaenszel(rows.toDF("cell", "st", "e", "o"),
        "cell", "st", "e", "o").collect()(0)
    assert(got.getLong(1) === 2L && got.getLong(2) === 26L)
    assert(got.getLong(3) === 1531250L)  // crude 49/32
    assert(got.getLong(4) === 750000L)   // MH: both strata at 0.75
    assert(got.getBoolean(5))
  }

  test("mantelHaenszel: a zero-discordance stratum product nulls the " +
      "OR it starves rather than reading infinity") {
    // b = 0 everywhere -> crude B*C = 0 -> crude null; s6 = 0 -> MH
    // null; flip null
    val rows = Seq.fill(3)(("c", 0L, 1L, 1L)) ++
      Seq.fill(3)(("c", 0L, 0L, 0L))
    val got = StatsOps.mantelHaenszel(rows.toDF("cell", "st", "e", "o"),
      "cell", "st", "e", "o").collect()(0)
    assert(got.isNullAt(3) && got.isNullAt(4) && got.isNullAt(5))
  }

  // ------------------------------------------------------------------
  // rmst (q274)
  // ------------------------------------------------------------------

  test("rmst: hand KM walk — deaths at 2 and 4 of 3 subjects, tau=5 " +
      "— integrates to 3666665 ppm-units; an all-censored cohort " +
      "reads the full tau") {
    val subj = Seq(("a", 2L, 1L), ("a", 4L, 1L), ("a", 6L, 0L),
      ("b", 3L, 0L), ("b", 7L, 0L))
    val got = StatsOps.rmst(subj.toDF("cohort", "dur", "ev"), "cohort",
        "dur", "ev", tau = 5L)
      .orderBy("cohort").collect()
    val a = got(0)
    // S: 10^6*2/3 = 666666 at t=2; *1/2 = 333333 at t=4
    // area = 2*10^6 + 2*666666 + 1*333333 = 3666665
    assert(a.getLong(4) === 2L)          // n_steps
    assert(a.getLong(5) === 3666665L)
    val b = got(1)
    assert(b.getLong(4) === 0L)
    assert(b.getLong(5) === 5000000L)    // tau * 10^6
  }

  test("rmst: steps at or beyond tau contribute nothing (the " +
      "restriction is a true truncation)") {
    val subj = Seq(("a", 2L, 1L), ("a", 9L, 1L), ("a", 9L, 0L))
    val got = StatsOps.rmst(subj.toDF("cohort", "dur", "ev"), "cohort",
      "dur", "ev", tau = 5L).collect()(0)
    // S = 666666 from t=2; the t=9 death is beyond tau
    // area = 2*10^6 + 666666*(5-2) = 3999998
    assert(got.getLong(5) === 3999998L)
  }

  // ------------------------------------------------------------------
  // vocabRichness (q275)
  // ------------------------------------------------------------------

  test("vocabRichness: hand corpora pin Good-Turing, Chao1 (both " +
      "branches) and Yule's K on the integer lattice") {
    val docs = Seq(
      ("s1", "a a b c"), ("s1", "a d"),    // N=6 V=4 N1=3 N2=0 S2=12
      ("s2", "a a b b c"))                 // N=5 V=3 N1=1 N2=2 S2=9
    val got = TextAnalysis.vocabRichness(docs.toDF("src", "text"),
        "src", "text")
      .orderBy("g").collect()
    val s1 = got(0)
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3), s1.getLong(4))
      === ((6L, 4L, 3L, 0L)))
    assert(s1.getLong(5) === 500000L)     // missing mass 3/6
    assert(s1.getLong(7) === 7L)          // chao1: V + 3*2/2 (N2=0 arm)
    assert(s1.getLong(8) === 3L)
    assert(s1.getLong(9) === 1666666L)    // yule 10^7*6/36
    val s2 = got(1)
    assert(s2.getLong(5) === 200000L)
    assert(s2.getLong(7) === 3L)          // V + 1//(2*2) = 3 + 0
    assert(s2.getLong(9) === 1600000L)    // 10^7*4/25
  }

  // ------------------------------------------------------------------
  // wilsonInterval (q276)
  // ------------------------------------------------------------------

  test("wilsonInterval: matches the float Wilson band within 2 ppm " +
      "and clamps honestly at the extremes") {
    val rows = Seq.fill(4)(("all1", 1L)) ++ Seq.fill(6)(("none", 0L)) ++
      (Seq.fill(30)(("mix", 1L)) ++ Seq.fill(70)(("mix", 0L)))
    val got = StatsOps.wilsonInterval(rows.toDF("cell", "succ"),
        "cell", "succ")
      .orderBy("cell").collect()
      .map(r => r.getString(0) -> r).toMap
    def wilson(r: Long, n: Long): (Double, Double, Double) = {
      val z = 1.96; val p = r.toDouble / n
      val den = n + z * z
      val c = (r + z * z / 2) / den
      val h = z * math.sqrt(r * (n - r).toDouble / n + z * z / 4) / den
      (c, math.max(0, c - h), math.min(1, c + h))
    }
    for ((cell, r, n) <- Seq(("all1", 4L, 4L), ("none", 0L, 6L),
        ("mix", 30L, 100L))) {
      val (c, lo, hi) = wilson(r, n)
      val row = got(cell)
      assert(math.abs(row.getLong(4) - c * 1e6) <= 2,
        s"$cell center: ${row.getLong(4)} vs ${c * 1e6}")
      assert(math.abs(row.getLong(5) - lo * 1e6) <= 2,
        s"$cell lo: ${row.getLong(5)} vs ${lo * 1e6}")
      assert(math.abs(row.getLong(6) - hi * 1e6) <= 2,
        s"$cell hi: ${row.getLong(6)} vs ${hi * 1e6}")
    }
    // the degenerate edges the Wald band gets wrong
    assert(got("all1").getLong(3) === 1000000L)  // p_ppm exact 1
    assert(got("all1").getLong(6) === 1000000L)  // hi clamped
    assert(got("all1").getLong(5) < 1000000L)    // lo honestly below
    assert(got("none").getLong(5) === 0L)        // lo clamped
    assert(got("none").getLong(6) > 0L)          // hi honestly above
  }

  // ------------------------------------------------------------------
  // moodsMedian (q277)
  // ------------------------------------------------------------------

  test("moodsMedian: fully separated groups around the pooled median " +
      "read the exact 2x2 chi-square (6.0 at n=6); mass AT the " +
      "median counts as not-above") {
    val rows = Seq(("c", "A", 1L), ("c", "A", 2L), ("c", "A", 3L),
      ("c", "B", 4L), ("c", "B", 5L), ("c", "B", 6L))
    val got = StatsOps.moodsMedian(rows.toDF("cell", "grp", "v"),
        "cell", "grp", "v").collect()(0)
    assert(got.getLong(3) === 3L)      // lower median
    assert(got.getLong(4) === 3L)      // n_above (4,5,6)
    assert(got.getLong(5) === 6000L)   // chi2 exact
    assert(got.getLong(6) === 1L)      // dof
  }

  test("moodsMedian: a median at the domain top empties the above " +
      "row and nulls the statistic (undefined, not infinite)") {
    val rows = Seq(("c", "A", 5L), ("c", "A", 5L), ("c", "B", 5L))
    val got = StatsOps.moodsMedian(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").collect()(0)
    assert(got.getLong(4) === 0L)
    assert(got.isNullAt(5))
  }
}
