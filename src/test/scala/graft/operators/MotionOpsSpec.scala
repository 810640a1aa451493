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
}
