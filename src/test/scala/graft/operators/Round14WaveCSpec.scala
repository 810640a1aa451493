package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand fixtures for the round-14 third wave (q286–q290): two-sample
 * distribution tests on the exact count lattice, panel reliability,
 * and the pairwise-difference shift estimator — every expected value
 * derived on paper from the operators' documented formulas.
 */
class Round14WaveCSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // cramerVonMises (q286)
  // ------------------------------------------------------------------

  test("cramerVonMises: A={1,2} vs B={1,3} reads the hand value " +
      "t_ppm = 10⁶·4/(16·4) = 62500; identical samples read 0; an " +
      "empty side reads null") {
    val rows = Seq(
      ("c", "a", 1L), ("c", "a", 2L), ("c", "b", 1L), ("c", "b", 3L),
      ("i", "a", 5L), ("i", "a", 6L), ("i", "b", 5L), ("i", "b", 6L),
      ("e", "a", 1L), ("e", "a", 2L))
    val got = StatsOps.cramerVonMises(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").orderBy("cell").collect()
    val c = got.find(_.getString(0) == "c").get
    assert(c.getLong(1) === 2L && c.getLong(2) === 2L)
    assert(c.getLong(3) === 62500L)
    val i = got.find(_.getString(0) == "i").get
    assert(i.getLong(3) === 0L)
    val e = got.find(_.getString(0) == "e").get
    assert(e.isNullAt(3))
  }

  // ------------------------------------------------------------------
  // andersonDarling2 (q287)
  // ------------------------------------------------------------------

  test("andersonDarling2: A={1,2} vs B={1,3} reads the exact " +
      "A² = 1/3 (333 milli) — one non-zero tail term floored per the " +
      "spelled lattice") {
    val rows = Seq(
      ("c", "a", 1L), ("c", "a", 2L), ("c", "b", 1L), ("c", "b", 3L))
    val got = StatsOps.andersonDarling2(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").collect()(0)
    // only v=2 contributes: d = |4·2−2·3| = 2, staged term =
    // ⌊10⁶·1·2/(3·1)⌋·2 = 1333332; ad_milli = ⌊4·1333332/16000⌋ = 333
    assert(got.getLong(1) === 2L && got.getLong(2) === 2L)
    assert(got.getLong(3) === 333L)
  }

  test("andersonDarling2 vs cramerVonMises: a pure TAIL discrepancy " +
      "moves AD proportionally more than CvM") {
    // same center mass, A owns the extreme tail point
    val tail = (1 to 40).flatMap(i =>
      Seq(("t", "a", i.toLong), ("t", "b", i.toLong))) ++
      Seq(("t", "a", 1000L), ("t", "b", 41L))
    // same-size broad middle shift for comparison
    val mid = (1 to 40).flatMap(i =>
      Seq(("m", "a", i.toLong), ("m", "b", i.toLong + 1L))) ++
      Seq(("m", "a", 41L), ("m", "b", 1L))
    val df = (tail ++ mid).toDF("cell", "grp", "v")
    val ad = StatsOps.andersonDarling2(df, "cell", "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val cvm = StatsOps.cramerVonMises(df, "cell", "grp", "v")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // the tail cell's AD/CvM ratio exceeds the mid cell's: the
    // 1/(H(1−H)) weight is doing its job
    assert(ad("t").toDouble / cvm("t").max(1L) >
      ad("m").toDouble / cvm("m").max(1L))
  }

  // ------------------------------------------------------------------
  // ansariBradley (q288)
  // ------------------------------------------------------------------

  test("ansariBradley: A={1,4} (wide) vs B={2,3} (narrow) reads " +
      "AB2 = 4 and z_milli = −⌊√(3·10⁶)⌋ = −1732; constant pooled " +
      "sample reads null") {
    val rows = Seq(
      ("c", "a", 1L), ("c", "a", 4L), ("c", "b", 2L), ("c", "b", 3L),
      ("k", "a", 7L), ("k", "a", 7L), ("k", "b", 7L))
    val got = StatsOps.ansariBradley(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(1) === 2L && c.getLong(2) === 2L)
    assert(c.getLong(3) === 4L)       // ab2 on the doubled lattice
    assert(c.getLong(4) === -1732L)
    val k = got(1)
    assert(k.isNullAt(4))             // score variance 0
  }

  // ------------------------------------------------------------------
  // cronbachAlpha (q289)
  // ------------------------------------------------------------------

  test("cronbachAlpha: two identical items read exactly 1000; a " +
      "constant total (perfect anti-correlation) reads null; " +
      "incomplete subjects drop and count") {
    val rows = Seq(
      // cell c: item1 = item2 = x → α = 1
      ("c", 1L, "i1", 1L), ("c", 1L, "i2", 1L),
      ("c", 2L, "i1", 2L), ("c", 2L, "i2", 2L),
      ("c", 3L, "i1", 3L), ("c", 3L, "i2", 3L),
      // plus an incomplete subject → dropped, α unchanged
      ("c", 9L, "i1", 5L),
      // cell z: item2 = −item1 → every total 0 → D_t = 0 → null
      ("z", 1L, "i1", 1L), ("z", 1L, "i2", -1L),
      ("z", 2L, "i1", 2L), ("z", 2L, "i2", -2L),
      ("z", 3L, "i1", 3L), ("z", 3L, "i2", -3L))
    val got = StatsOps.cronbachAlpha(rows.toDF("cell", "subj", "item",
        "v"), "cell", "subj", "item", "v")
      .orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(1) === 2L)       // k
    assert(c.getLong(2) === 3L)       // n_subjects
    assert(c.getLong(3) === 1L)       // n_dropped
    assert(c.getLong(4) === 1000L)    // α
    val z = got(1)
    assert(z.getLong(2) === 3L && z.isNullAt(4))
  }

  // ------------------------------------------------------------------
  // hodgesLehmann (q290)
  // ------------------------------------------------------------------

  test("hodgesLehmann: an exact planted shift is recovered exactly, " +
      "oriented A − B with A the lexicographically smaller group") {
    val base = Seq(3L, 8L, 1L, 12L, 5L)
    val rows = base.map(("c", "a", _)) ++
      base.map(v => ("c", "b", v + 7L)) ++
      // hand case: A={1,2}, B={0} → diffs {1,2}, lower median 1
      Seq(("h", "a", 1L), ("h", "a", 2L), ("h", "b", 0L))
    val got = StatsOps.hodgesLehmann(rows.toDF("cell", "grp", "v"),
      "cell", "grp", "v").orderBy("cell").collect()
    val c = got(0)
    assert(c.getLong(3) === 25L)      // n_pairs = 5·5
    assert(c.getLong(4) === -7L)      // A − B = −shift
    val h = got(1)
    assert(h.getLong(3) === 2L && h.getLong(4) === 1L)
  }

  test("hodgesLehmann: the grid guard fails loudly on an unbinned " +
      "caller instead of building the diff monster") {
    val rows = (1 to 3000).map(i => ("c", if (i % 2 == 0) "a" else "b",
      i.toLong))
    val ex = intercept[IllegalArgumentException] {
      StatsOps.hodgesLehmann(rows.toDF("cell", "grp", "v"),
        "cell", "grp", "v", maxGridCells = 1000L).collect()
    }
    assert(ex.getMessage.contains("bin the inputs first"))
  }
}
