package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand lattices, guard paths and seeded invariances for the third
 * round-13 wave: Kruskal–Wallis (q258), Cliff's delta (q259) and
 * Brown–Forsythe (q260). Every expected number below is computed by
 * hand from the operator's defining lattice — the specs pin the
 * semantics, the registry oracles pin the cross-engine match.
 */
class Round13WaveCSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // kruskalWallis
  // ------------------------------------------------------------------

  test("kruskalWallis: textbook tie-free lattice — singleton groups " +
      "{1},{2},{3} give H = 2.000 exactly") {
    // doubled midranks 2, 4, 6; hs = 3000*(4+16+36) = 168000;
    // 168000 div 12 = 14000; - 3000*4 = 2000
    val t = Seq(("c", "a", 1L), ("c", "b", 2L), ("c", "g", 3L))
      .toDF("cell", "grp", "v")
    val r = StatsOps.kruskalWallis(t, "cell", "grp", "v").collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("h_milli") === 2000L)
    assert(r.head.getAs[Long]("h_tie_milli") === 2000L) // tie_t = 0
    assert(r.head.getAs[Long]("k") === 3L)
    assert(r.head.getAs[Long]("dof") === 2L)
  }

  test("kruskalWallis: tied lattice by hand — A={1,2}, B={2,3} gives " +
      "H = 1.350 raw, 1.500 tie-corrected") {
    // doubled midranks: v=1 -> 2, v=2 (t=2, cb=1) -> 5, v=3 -> 8
    // s2_A = 7, s2_B = 13; hs = 3000*(49+169) div 2... per-group:
    // (3000*49) div 2 = 73500, (3000*169) div 2 = 253500 -> 327000
    // 327000 div 20 = 16350; - 15000 = 1350
    // T = 6, N^3-N = 60: 1350*60 div 54 = 1500
    val t = Seq(("c", "A", 1L), ("c", "A", 2L), ("c", "B", 2L),
      ("c", "B", 3L)).toDF("cell", "grp", "v")
    val r = StatsOps.kruskalWallis(t, "cell", "grp", "v").collect()
    assert(r.head.getAs[Long]("h_milli") === 1350L)
    assert(r.head.getAs[Long]("h_tie_milli") === 1500L)
    assert(r.head.getAs[Long]("tie_t") === 6L)
  }

  test("kruskalWallis: guard paths — an all-tied cell nulls the " +
      "correction; a single-group cell reads exactly 0") {
    val t = Seq(("tied", "A", 5L), ("tied", "B", 5L), ("tied", "B", 5L),
      ("solo", "A", 1L), ("solo", "A", 2L), ("solo", "A", 9L))
      .toDF("cell", "grp", "v")
    val r = StatsOps.kruskalWallis(t, "cell", "grp", "v")
      .collect().map(x => x.getAs[String]("cell") -> x).toMap
    assert(r("tied").getAs[Long]("h_milli") === 0L)
    assert(r("tied").isNullAt(r("tied").fieldIndex("h_tie_milli")))
    assert(r("solo").getAs[Long]("h_milli") === 0L)
    assert(r("solo").getAs[Long]("dof") === 0L)
  }

  test("kruskalWallis: rank invariance (seeded) — shifting every value " +
      "by a constant and scaling by a positive constant preserve H") {
    for (seed <- 1 to 3) {
      val rnd = new Random(13300 + seed)
      val base = (1 to 60).map { i =>
        ("c", s"g${i % 4}", rnd.nextInt(20).toLong)
      }
      def h(rows: Seq[(String, String, Long)]): (Long, Any) = {
        val r = StatsOps.kruskalWallis(rows.toDF("cell", "grp", "v"),
          "cell", "grp", "v").collect().head
        (r.getAs[Long]("h_milli"),
          if (r.isNullAt(r.fieldIndex("h_tie_milli"))) null
          else r.getAs[Long]("h_tie_milli"))
      }
      val h0 = h(base)
      assert(h(base.map { case (c, g, v) => (c, g, v + 1000L) }) === h0)
      assert(h(base.map { case (c, g, v) => (c, g, v * 7L) }) === h0)
    }
  }

  // ------------------------------------------------------------------
  // cliffsDelta
  // ------------------------------------------------------------------

  test("cliffsDelta: hand pairs — A={1,3}, B={2,3} gives " +
      "delta = -0.25 'small' and the pair identity holds") {
    val t = Seq(("c", "A", 1L), ("c", "A", 3L), ("c", "B", 2L),
      ("c", "B", 3L)).toDF("cell", "grp", "v")
    val r = StatsOps.cliffsDelta(t, "cell", "grp", "A", "B", "v")
      .collect().head
    assert(r.getAs[Long]("gt") === 1L)
    assert(r.getAs[Long]("lt") === 2L)
    assert(r.getAs[Long]("ties") === 1L)
    assert(r.getAs[Long]("gt") + r.getAs[Long]("lt") +
      r.getAs[Long]("ties") ===
      r.getAs[Long]("n_a") * r.getAs[Long]("n_b"))
    assert(r.getAs[Long]("delta_ppm") === -250000L)
    assert(r.getAs[String]("magnitude") === "small")
  }

  test("cliffsDelta: full dominance reads +1.0 'large'; an empty B " +
      "group nulls delta and magnitude") {
    val t = Seq(("dom", "A", 10L), ("dom", "A", 20L), ("dom", "B", 1L),
      ("dom", "B", 2L), ("solo", "A", 5L)).toDF("cell", "grp", "v")
    val r = StatsOps.cliffsDelta(t, "cell", "grp", "A", "B", "v")
      .collect().map(x => x.getAs[String]("cell") -> x).toMap
    assert(r("dom").getAs[Long]("delta_ppm") === 1000000L)
    assert(r("dom").getAs[String]("magnitude") === "large")
    assert(r("solo").getAs[Long]("n_b") === 0L)
    assert(r("solo").isNullAt(r("solo").fieldIndex("delta_ppm")))
    assert(r("solo").isNullAt(r("solo").fieldIndex("magnitude")))
  }

  test("cliffsDelta: antisymmetry (seeded) — swapping the group roles " +
      "negates delta exactly, and the identity always holds") {
    for (seed <- 1 to 3) {
      val rnd = new Random(13310 + seed)
      val rows = (1 to 80).map { _ =>
        ("c", if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(15).toLong)
      }
      val ab = StatsOps.cliffsDelta(rows.toDF("cell", "grp", "v"),
        "cell", "grp", "A", "B", "v").collect().head
      val ba = StatsOps.cliffsDelta(rows.toDF("cell", "grp", "v"),
        "cell", "grp", "B", "A", "v").collect().head
      assert(ab.getAs[Long]("delta_ppm") === -ba.getAs[Long]("delta_ppm"))
      assert(ab.getAs[Long]("gt") === ba.getAs[Long]("lt"))
      assert(ab.getAs[Long]("gt") + ab.getAs[Long]("lt") +
        ab.getAs[Long]("ties") ===
        ab.getAs[Long]("n_a") * ab.getAs[Long]("n_b"))
    }
  }

  // ------------------------------------------------------------------
  // brownForsythe
  // ------------------------------------------------------------------

  test("brownForsythe: hand lattice — A={0,2}, B={10,14} gives " +
      "F = 0.200 (ssb 1000, ssw 10000)") {
    // medians 0 (lower of {0,2}) and 10; z_A={0,2}, z_B={0,4}
    // ssb_t: A = 1000*(4*2-2*6)^2/(2*16) = 500, B same = 500
    // ssw_t: A = 1000*(2*4-4)/2 = 2000, B = 1000*(2*16-16)/2 = 8000
    // f = (1000*2*1000) div (1*10000) = 200
    val t = Seq(("c", "A", 0L), ("c", "A", 2L), ("c", "B", 10L),
      ("c", "B", 14L)).toDF("cell", "grp", "v")
    val r = StatsOps.brownForsythe(t, "cell", "grp", "v").collect().head
    assert(r.getAs[Long]("ssb_milli") === 1000L)
    assert(r.getAs[Long]("ssw_milli") === 10000L)
    assert(r.getAs[Long]("f_milli") === 200L)
  }

  test("brownForsythe: guard paths — deviation-constant groups null F " +
      "(never infinity); a single-group cell nulls F") {
    // both groups constant -> every z = 0 -> ssw = 0 -> F undefined
    val t = Seq(("flat", "A", 5L), ("flat", "A", 5L), ("flat", "B", 9L),
      ("flat", "B", 9L), ("solo", "A", 1L), ("solo", "A", 4L))
      .toDF("cell", "grp", "v")
    val r = StatsOps.brownForsythe(t, "cell", "grp", "v")
      .collect().map(x => x.getAs[String]("cell") -> x).toMap
    assert(r("flat").getAs[Long]("ssw_milli") === 0L)
    assert(r("flat").isNullAt(r("flat").fieldIndex("f_milli")))
    assert(r("solo").getAs[Long]("k") === 1L)
    assert(r("solo").isNullAt(r("solo").fieldIndex("f_milli")))
  }

  test("brownForsythe: location invariance (seeded) — adding a " +
      "constant to ONE group's values leaves F unchanged (its median " +
      "absorbs the shift); inflating its spread raises F") {
    for (seed <- 1 to 3) {
      val rnd = new Random(13320 + seed)
      val base = (1 to 90).map { i =>
        ("c", s"g${i % 3}", (rnd.nextInt(40) + 10).toLong)
      }
      def f(rows: Seq[(String, String, Long)]): Long = {
        val r = StatsOps.brownForsythe(rows.toDF("cell", "grp", "v"),
          "cell", "grp", "v").collect().head
        r.getAs[Long]("f_milli")
      }
      val f0 = f(base)
      val shifted = base.map { case (c, g, v) =>
        (c, g, if (g == "g1") v + 500L else v)
      }
      assert(f(shifted) === f0)
      val inflated = base.map { case (c, g, v) =>
        (c, g, if (g == "g1") v * 9L else v)
      }
      assert(f(inflated) > f0)
    }
  }
}
