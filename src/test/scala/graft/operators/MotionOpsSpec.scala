package graft.operators

import graft.SparkSuite

class MotionOpsSpec extends SparkSuite {
  import spark.implicits._

  // (vehicle, t_us, x_mm, y_mm, tie)
  private def pts = Seq(
    ("v1", 1000000L, 0L, 0L, 1L),
    ("v1", 2000000L, 3000L, 4000L, 2L),   // L1 7000 mm over 1 s
    ("v1", 3000000L, 500000L, 4000L, 3L), // 497000 mm jump over 1 s
    ("v2", 1000000L, 10L, 10L, 1L))       // single fix: no steps
    .toDF("veh", "t_us", "x_mm", "y_mm", "tie")

  test("motionSummary: distances, max speed, jump count per vehicle") {
    val out = MotionOps.motionSummary(pts, "veh", "t_us", "x_mm", "y_mm",
      "tie", jumpMm = 100000L)
      .orderBy("veh").collect()
    val v1 = out(0)
    assert(v1.getLong(1) == 3)                // n_fixes
    assert(v1.getLong(2) == 7000L + 497000L)  // total L1 distance
    assert(v1.getLong(3) == 497000L)          // max speed mm/s (1 s steps)
    assert(v1.getLong(4) == 1)                // one jump over the threshold
    val v2 = out(1)
    assert(v2.getLong(1) == 1 && v2.getLong(2) == 0 && v2.getLong(4) == 0)
    assert(v2.isNullAt(3)) // no timed step ⇒ no speed
  }

  test("motionSummary: non-positive time deltas excluded from speed, kept as fixes") {
    val dup = Seq(
      ("v1", 1000000L, 0L, 0L, 1L),
      ("v1", 1000000L, 9000L, 0L, 2L), // same timestamp: no speed sample
      ("v1", 2000000L, 10000L, 0L, 3L))
      .toDF("veh", "t_us", "x_mm", "y_mm", "tie")
    val out = MotionOps.motionSummary(dup, "veh", "t_us", "x_mm", "y_mm",
      "tie", jumpMm = 100000L).collect().head
    assert(out.getLong(1) == 3)
    assert(out.getLong(2) == 9000L + 1000L)
    assert(out.getLong(3) == 1000L) // only the 1 s step contributes speed
  }

  // ------------------------------------------------------ dwell episodes

  test("dwellEpisodes: two dwells split by one big step; durations and " +
      "longest are exact; the bridging fix belongs to the NEXT episode") {
    // v1: fixes at t=0..5 s; steps (L1): 10, 10, 900(break), 10, 10.
    // Episodes: fixes {0,1,2} (dur 2 s) and {3,4,5} (dur 2 s).
    val pts = Seq(
      (0L, 0L, 0L), (1L, 10L, 0L), (2L, 20L, 0L),
      (3L, 920L, 0L), (4L, 930L, 0L), (5L, 940L, 0L))
      .zipWithIndex.map { case ((t, x, y), i) =>
        ("v1", t * 1000000L, x, y, i.toLong) }
      .toDF("veh", "t_us", "x_mm", "y_mm", "tie")
    val out = MotionOps.dwellEpisodes(pts, "veh", "t_us", "x_mm", "y_mm",
      "tie", maxStepMm = 100L, minFixes = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 4000000L, 2000000L)))
  }

  test("dwellEpisodes: runs shorter than minFixes emit nothing — a " +
      "vehicle always in motion is honestly absent") {
    val pts = Seq(
      ("still", 0L, 0L, 0L, 0L), ("still", 1000000L, 10L, 0L, 1L),
      ("mover", 0L, 0L, 0L, 0L), ("mover", 1000000L, 5000L, 0L, 1L),
      ("mover", 2000000L, 10000L, 0L, 2L))
      .toDF("veh", "t_us", "x_mm", "y_mm", "tie")
    // "still" dwells but only 2 fixes (< minFixes=3); "mover" never dwells
    assert(MotionOps.dwellEpisodes(pts, "veh", "t_us", "x_mm", "y_mm",
      "tie", maxStepMm = 100L, minFixes = 3).isEmpty)
    // at minFixes=2 the still pair qualifies with its 1 s duration
    val got = MotionOps.dwellEpisodes(pts, "veh", "t_us", "x_mm", "y_mm",
      "tie", maxStepMm = 100L, minFixes = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("still" -> 1000000L))
  }
}
