package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand fixtures for the round-14 second wave (q278–q285): every
 * expected value below is derived on paper from the operator's
 * documented lattice (per-term floors, sign·isqrt, doubled mid-ranks,
 * lower medians), so a lattice drift in either engine direction is a
 * spec failure, not an oracle coincidence.
 */
class Round14WaveBSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // cochranQ (q278)
  // ------------------------------------------------------------------

  test("cochranQ: textbook 4-block 3-treatment panel reads the exact " +
      "rational 8/3; incomplete blocks drop and count; zero " +
      "discordance reads null") {
    // G = (3,3,1), N = 7, ΣG² = 19, L = (2,1,3,1), ΣL² = 15
    // Q = 2·(3·19 − 49)/(3·7 − 15) = 8/3 → 2666 milli
    val rows = Seq(
      ("c", 1L, "t1", 1L), ("c", 1L, "t2", 1L), ("c", 1L, "t3", 0L),
      ("c", 2L, "t1", 1L), ("c", 2L, "t2", 0L), ("c", 2L, "t3", 0L),
      ("c", 3L, "t1", 1L), ("c", 3L, "t2", 1L), ("c", 3L, "t3", 1L),
      ("c", 4L, "t1", 0L), ("c", 4L, "t2", 1L), ("c", 4L, "t3", 0L),
      // incomplete block (missing t3) → dropped, statistics unchanged
      ("c", 9L, "t1", 1L), ("c", 9L, "t2", 1L),
      // cell z: every block all-1 → kN − ΣL² = 0 → null Q
      ("z", 1L, "t1", 1L), ("z", 1L, "t2", 1L),
      ("z", 2L, "t1", 1L), ("z", 2L, "t2", 1L))
    val got = StatsOps.cochranQ(rows.toDF("cell", "block", "grp", "y"),
        "cell", "block", "grp", "y")
      .orderBy("cell").collect()
    val c = got(0)
    assert(c.getString(0) === "c")
    assert(c.getLong(1) === 3L)       // k
    assert(c.getLong(2) === 4L)       // n_blocks
    assert(c.getLong(3) === 1L)       // n_dropped
    assert(c.getLong(4) === 7L)       // n_succ
    assert(c.getLong(5) === 2666L)    // q_milli = ⌊8000/3⌋
    assert(c.getLong(6) === 2L)       // dof
    val z = got(1)
    assert(z.getString(0) === "z")
    assert(z.getLong(2) === 2L && z.isNullAt(5))
  }

  // ------------------------------------------------------------------
  // runsTest (q279)
  // ------------------------------------------------------------------

  test("runsTest: hand sequence 0,0,1,1,0 reads R=3 and " +
      "z_milli = −⌊√(16·10⁶/84)⌋ = −436; too-thin class reads null") {
    val rows = Seq(
      ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 1L), ("c", 4L, 1L),
      ("c", 5L, 0L),
      // cell z: one 1 in five → 2n₁n₀ = 8 > n = 5... use all-zeros
      // so m2 = 0 ≤ n → null z
      ("z", 1L, 0L), ("z", 2L, 0L), ("z", 3L, 0L))
    val got = StatsOps.runsTest(rows.toDF("cell", "o", "b"),
        "cell", "o", "b").orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(1) === 5L && c.getLong(2) === 2L &&
      c.getLong(3) === 3L)
    assert(c.getLong(4) === 3L)       // r_runs
    // dnum = 15 − 5 − 12 = −2; z² = 4·4/(12·7); 16e6 div 84 = 190476
    // isqrt = 436, sign −
    assert(c.getLong(5) === -436L)
    val z = got(1)
    assert(z.getLong(4) === 1L && z.isNullAt(5))
  }

  test("runsTest: the hierarchical bucket decomposition equals the " +
      "flat count — boundary transitions across buckets included") {
    // 2 runs of length 3 then alternation: 0,0,0,1,1,1,0,1,0,1
    val bits = Seq(0L, 0L, 0L, 1L, 1L, 1L, 0L, 1L, 0L, 1L)
    val rows = bits.zipWithIndex.map { case (b, i) => ("c", i.toLong, b) }
    val flat = StatsOps.runsTest(rows.toDF("cell", "o", "b"),
      "cell", "o", "b", bucketWidth = 1000000L).collect()(0)
    val bucketed = StatsOps.runsTest(rows.toDF("cell", "o", "b"),
      "cell", "o", "b", bucketWidth = 3L).collect()(0)
    // hand count: runs = 000 | 111 | 0 | 1 | 0 | 1 → 6
    assert(flat.getLong(4) === 6L)
    assert(bucketed.getLong(4) === 6L)
    assert(flat.getLong(5) === bucketed.getLong(5))
  }

  // ------------------------------------------------------------------
  // pageTrend (q280) + kendallW (q281)
  // ------------------------------------------------------------------

  private val perfectPanel = Seq(
    // 2 blocks, 3 ordered treatments, v = ordinal → perfect trend
    ("c", 1L, 1L, 1L), ("c", 1L, 2L, 2L), ("c", 1L, 3L, 3L),
    ("c", 2L, 1L, 1L), ("c", 2L, 2L, 2L), ("c", 2L, 3L, 3L))

  test("pageTrend: perfect monotone panel reads the classic z = 2 " +
      "exactly (L=28, E=24, Var=4 doubled to the 2·lattice)") {
    val got = StatsOps.pageTrend(perfectPanel.toDF("cell", "block",
        "ord", "v"), "cell", "block", "ord", "v").collect()(0)
    assert(got.getLong(1) === 3L)     // k
    assert(got.getLong(2) === 2L)     // n_blocks
    assert(got.getLong(4) === 56L)    // L2 = 1·4 + 2·8 + 3·12
    assert(got.getLong(5) === 48L)    // E2 = 2·3·16/2
    assert(got.getLong(6) === 2000L)  // z_milli
  }

  test("pageTrend: the ordinal VALUE order drives j, not its " +
      "lexicographic shadow — ordinals 2,10,100 rank 1,2,3") {
    // same perfect panel with ordinals whose string order (10,100,2)
    // differs from numeric order (2,10,100)
    val rows = Seq(
      ("c", 1L, 2L, 1L), ("c", 1L, 10L, 2L), ("c", 1L, 100L, 3L),
      ("c", 2L, 2L, 1L), ("c", 2L, 10L, 2L), ("c", 2L, 100L, 3L))
    val got = StatsOps.pageTrend(rows.toDF("cell", "block", "ord", "v"),
      "cell", "block", "ord", "v").collect()(0)
    assert(got.getLong(4) === 56L && got.getLong(6) === 2000L)
  }

  test("kendallW: perfect agreement reads exactly 1000 and pins the " +
      "Friedman identity Q = m·(k−1)·W; an all-ties panel reads " +
      "W = 0 with null tie-corrected W") {
    val df = perfectPanel.toDF("cell", "block", "grp", "v")
    val w = StatsOps.kendallW(df, "cell", "block", "grp", "v")
      .collect()(0)
    assert(w.getLong(1) === 3L && w.getLong(2) === 2L)
    assert(w.getLong(5) === 1000L)    // w_milli
    assert(w.getLong(6) === 1000L)    // w_tie_milli (no ties)
    val q = StatsOps.friedman(df, "cell", "block", "grp", "v")
      .collect()(0)
    // Q = m(k−1)W: 2·2·1000 milli = 4000 milli
    assert(q.getLong(5) === 4000L)
    val allTies = Seq(
      ("t", 1L, "a", 5L), ("t", 1L, "b", 5L), ("t", 1L, "c", 5L),
      ("t", 2L, "a", 7L), ("t", 2L, "b", 7L), ("t", 2L, "c", 7L))
    val wt = StatsOps.kendallW(allTies.toDF("cell", "block", "grp", "v"),
      "cell", "block", "grp", "v").collect()(0)
    assert(wt.getLong(4) === 48L)     // tie_t = 2 blocks · (27−3)
    assert(wt.getLong(5) === 0L)      // S2 = 0
    assert(wt.isNullAt(6))            // den0 − m·T = 96 − 96 = 0
  }

  // ------------------------------------------------------------------
  // ordinalAssociation (q282)
  // ------------------------------------------------------------------

  test("ordinalAssociation: hand 2×2-plus-one grid — γ stays 1000 " +
      "while both Somers' D pay their conditioning tie mass (666)") {
    // counts: (0,0)×2, (1,1)×2, (0,1)×1 → C = 4, D = 0, n = 5
    // n0 = 10, T_x = C(3,2)+C(2,2) = 4, T_y = 1+3 = 4
    val rows = Seq(
      ("c", 0L, 0L), ("c", 0L, 0L), ("c", 1L, 1L), ("c", 1L, 1L),
      ("c", 0L, 1L))
    val got = StatsOps.ordinalAssociation(rows.toDF("cell", "x", "y"),
      "cell", "x", "y").collect()(0)
    assert(got.getLong(1) === 5L)
    assert(got.getLong(2) === 4L && got.getLong(3) === 0L)
    assert(got.getLong(4) === 1000L)  // gamma
    assert(got.getLong(5) === 666L)   // d_yx = ⌊4000/6⌋
    assert(got.getLong(6) === 666L)   // d_xy
  }

  test("ordinalAssociation: a constant margin nulls its D and γ " +
      "(C + D = 0), never divides by zero") {
    val rows = Seq(("c", 1L, 1L), ("c", 1L, 2L), ("c", 1L, 3L))
    val got = StatsOps.ordinalAssociation(rows.toDF("cell", "x", "y"),
      "cell", "x", "y").collect()(0)
    assert(got.isNullAt(4))           // no ordering pairs at all
    assert(got.isNullAt(5))           // x constant → n0 = T_x
    assert(got.getLong(6) === 0L)     // y orders freely, num = 0
  }

  // ------------------------------------------------------------------
  // ljungBox (q283)
  // ------------------------------------------------------------------

  test("ljungBox: an alternating series reads the hand-folded " +
      "portmanteau; a constant series reads null") {
    val vs = Seq(1L, -1L, 1L, -1L, 1L, -1L)
    val rows = vs.zipWithIndex.map { case (v, i) =>
      ("a", i.toLong, v) } ++
      (0 until 6).map(i => ("k", i.toLong, 7L))
    val got = StatsOps.ljungBox(rows.toDF("cell", "o", "v"),
        "cell", "o", "v", 3)
      .orderBy("cell").collect()
    // hand fold on the c = 6v lattice (S = 0): D = 216,
    // N₁ = −180, N₂ = 144, N₃ = −108
    val d = BigInt(216)
    def term(nk: Long, nmk: Int): BigInt = {
      val r = (BigInt(1000000) * BigInt(nk).abs) / d
      r * r / nmk
    }
    val tsum = term(-180, 5) + term(144, 4) + term(-108, 3)
    val expect = (BigInt(6) * 8 * tsum / BigInt(1000000000)).toLong
    val a = got(0)
    assert(a.getString(0) === "a" && a.getLong(1) === 6L)
    assert(a.getLong(3) === expect)
    assert(a.getLong(3) > 7815L)      // alternation ≫ the χ²₃ 5% line
    val k = got(1)
    assert(k.getString(0) === "k" && k.isNullAt(3))
  }

  // ------------------------------------------------------------------
  // durbinWatson (q284)
  // ------------------------------------------------------------------

  test("durbinWatson: alternating residuals read the hand value 3400; " +
      "a perfect line (zero residual mass) reads null") {
    // x = 1..4, y = 0,1,0,1: S0 = 20, S1 = 4, scaled residuals
    // n·S0·e = 80y − 16x → e_milli = −200, 600, −600, 200
    // Σd² = 2,720,000; Σe² = 800,000 → dw = 3400
    val rows = Seq(("c", 1L, 0L), ("c", 2L, 1L), ("c", 3L, 0L),
      ("c", 4L, 1L),
      // perfect line y = 2x → null
      ("p", 1L, 2L), ("p", 2L, 4L), ("p", 3L, 6L))
    val got = StatsOps.durbinWatson(rows.toDF("cell", "x", "y"),
      "cell", "x", "y").orderBy("cell").collect()
    assert(got(0).getString(0) === "c" && got(0).getLong(2) === 3400L)
    assert(got(1).getString(0) === "p" && got(1).isNullAt(2))
  }

  // ------------------------------------------------------------------
  // hampelOutliers (q285)
  // ------------------------------------------------------------------

  test("hampelOutliers: lower medians by hand — {1,2,3,4,5,100} reads " +
      "med 3, MAD 1, one flag; a zero-MAD cell flags any deviation") {
    val rows = Seq(1L, 2L, 3L, 4L, 5L, 100L).map(("c", _)) ++
      (Seq.fill(10)(1L) :+ 100L).map(("z", _))
    val got = StatsOps.hampelOutliers(rows.toDF("cell", "v"),
      "cell", "v").orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(1) === 6L && c.getLong(2) === 3L &&
      c.getLong(3) === 1L)
    assert(c.getLong(4) === 1L)       // only 100 beyond 3·1
    assert(c.getLong(5) === 166666L)
    val z = got(1)
    assert(z.getLong(2) === 1L && z.getLong(3) === 0L)
    assert(z.getLong(4) === 1L)       // mad 0 → any deviation flags
    assert(z.getLong(5) === 90909L)
  }
}
