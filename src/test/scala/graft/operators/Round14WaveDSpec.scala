package graft.operators

import graft.SparkSuite

/**
 * Hand fixtures for the round-14 fourth wave (q291–q293): the
 * assumption-free paired/trend gates and the standardized effect
 * panel — every expected value derived on paper from the documented
 * lattices (continuity-corrected sign z, Cox–Stuart half pairing,
 * staged-floor d/g/Δ).
 */
class Round14WaveDSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // signTest (q291)
  // ------------------------------------------------------------------

  test("signTest: 5 pos / 1 neg / 2 zero reads z = ⌊√(9·10⁶/6)⌋ = " +
      "1224; |p−q| ≤ 1 reads exactly 0; an all-zero cell reads null") {
    val rows =
      Seq.fill(5)(("c", 7L, 3L)) ++ Seq(("c", 1L, 3L)) ++
        Seq.fill(2)(("c", 3L, 3L)) ++
      Seq(("b", 5L, 3L), ("b", 1L, 3L)) ++           // p = q = 1 → 0
      Seq.fill(3)(("z", 3L, 3L))                     // all zero → null
    val got = StatsOps.signTest(rows.toDF("cell", "a", "b"),
      "cell", "a", "b").orderBy("cell").collect()
    val b = got(0)
    assert(b.getString(0) === "b" && b.getLong(5) === 0L)
    val c = got(1)
    assert(c.getLong(1) === 8L)       // n_pairs
    assert(c.getLong(2) === 5L && c.getLong(3) === 1L &&
      c.getLong(4) === 2L)
    assert(c.getLong(5) === 1224L)
    val z = got(2)
    assert(z.getLong(4) === 3L && z.isNullAt(5))
  }

  // ------------------------------------------------------------------
  // coxStuart (q292)
  // ------------------------------------------------------------------

  test("coxStuart: a strictly increasing 7-point series pairs " +
      "(1,5)(2,6)(3,7) dropping the middle, reads z = " +
      "⌊√(4·10⁶/3)⌋ = 1154; a flat series reads all-zero pairs null") {
    val rows = (1 to 7).map(i => ("c", i.toLong, i.toLong * 10L)) ++
      (1 to 6).map(i => ("f", i.toLong, 42L))
    val got = StatsOps.coxStuart(rows.toDF("cell", "o", "v"),
      "cell", "o", "v").orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(1) === 7L)       // n
    assert(c.getLong(2) === 3L)       // n_pairs (middle dropped)
    assert(c.getLong(3) === 3L && c.getLong(4) === 0L)
    assert(c.getLong(6) === 1154L)
    val f = got(1)
    assert(f.getLong(5) === 3L && f.isNullAt(6))  // all ties → null
  }

  test("coxStuart: order column drives the pairing, not arrival " +
      "order — a shuffled decreasing series reads the negative z") {
    val rows = Seq(("c", 3L, 50L), ("c", 1L, 70L), ("c", 4L, 40L),
      ("c", 2L, 60L), ("c", 6L, 20L), ("c", 5L, 30L))
    val got = StatsOps.coxStuart(rows.toDF("cell", "o", "v"),
      "cell", "o", "v").collect()(0)
    assert(got.getLong(2) === 3L && got.getLong(4) === 3L)
    assert(got.getLong(6) === -1154L)
  }

  // ------------------------------------------------------------------
  // effectSizes (q293)
  // ------------------------------------------------------------------

  test("effectSizes: A={2,4,6} vs B={1,3,5} reads the exact d = 0.5 " +
      "(500 milli), g = 500·12/15 = 400, Glass Δ = 499 on the " +
      "staged-floor lattice; zero pooled variance reads null") {
    val rows = Seq(("c", "a", 2L), ("c", "a", 4L), ("c", "a", 6L),
      ("c", "b", 1L), ("c", "b", 3L), ("c", "b", 5L),
      ("k", "a", 5L), ("k", "a", 5L), ("k", "b", 5L), ("k", "b", 5L))
    val got = StatsOps.effectSizes(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(1) === 3L && c.getLong(2) === 3L)
    assert(c.getLong(3) === 500L)     // d
    assert(c.getLong(4) === 400L)     // g = d·(4df−4)/(4df−1), df=4
    assert(c.getLong(5) === 499L)     // Glass (floor residue vs 500)
    val k = got(1)
    assert(k.isNullAt(3) && k.isNullAt(4) && k.isNullAt(5))
  }

  test("two-sample operators fail LOUDLY on a 3-group cell instead " +
      "of silently lumping non-minimum groups into sample B (r14 " +
      "advice: the twoSampleCums contract was documented but " +
      "unenforced)") {
    val rows = Seq(("c", "a", 1L), ("c", "b", 2L), ("c", "c", 3L),
      ("k", "a", 1L), ("k", "b", 2L))
    val df = rows.toDF("cell", "grp", "v")
    for (op <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
        StatsOps.effectSizes(_, "cell", "grp", "v"),
        StatsOps.hodgesLehmann(_, "cell", "grp", "v"),
        StatsOps.cramerVonMises(_, "cell", "grp", "v"),
        StatsOps.andersonDarling2(_, "cell", "grp", "v"),
        StatsOps.ansariBradley(_, "cell", "grp", "v"))) {
      val e = intercept[IllegalArgumentException] { op(df) }
      assert(e.getMessage.contains("distinct groups"))
    }
    // exactly-2-group frames still build fine
    assert(StatsOps.effectSizes(rows.filter(_._1 == "k")
      .toDF("cell", "grp", "v"), "cell", "grp", "v").count() === 1L)
  }

  test("effectSizes: the radicand saturates at d = 1000 SD instead " +
      "of crossing the 2^53 double-precision line") {
    // two far-apart near-constant groups: unclamped d ≈ 346k SD
    val rows = Seq(("c", "a", 0L), ("c", "a", 1L), ("c", "a", 0L),
      ("c", "b", 1000000L), ("c", "b", 1000001L), ("c", "b", 1000000L))
    val got = StatsOps.effectSizes(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").collect()(0)
    assert(got.getLong(3) === -1000000L)  // saturated, sign preserved
  }
}
