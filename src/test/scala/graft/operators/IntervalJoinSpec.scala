package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class IntervalJoinSpec extends SparkSuite {
  import spark.implicits._

  private def a = Seq(
    // (aid, key, start, end)
    (1L, "k", 0L, 10L), (2L, "k", 25L, 40L), (3L, "k", 100L, 200L),
    (4L, "other", 0L, 1000L)
  ).toDF("aid", "ka", "a_s", "a_e")

  private def b = Seq(
    (10L, "k", 5L, 8L),     // inside a1
    (11L, "k", 10L, 20L),   // touches a1's end (inclusive) only
    (12L, "k", 41L, 50L),   // just misses a2
    (13L, "k", 30L, 150L),  // spans a2 AND a3 — two pairs
    (14L, "zzz", 0L, 999L)  // key matches nothing
  ).toDF("bid", "kb", "b_s", "b_e")

  private def pairs(binSize: Long) =
    IntervalJoin.overlapJoin(a, b, Seq("ka" -> "kb"),
      "a_s", "a_e", "b_s", "b_e", binSize)
      .select("aid", "bid").orderBy("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private val expected = Seq((1L, 10L), (1L, 11L), (2L, 13L), (3L, 13L))

  test("overlap pairs: inclusive endpoints, multi-bin spans, " +
      "disjoint and wrong-key rows excluded") {
    assert(pairs(16L) == expected)
  }

  test("keyless (global-timeline) overlap join is legal: bin equality " +
      "alone keys the join") {
    val got = IntervalJoin.overlapJoin(a, b, Seq.empty,
      "a_s", "a_e", "b_s", "b_e", 16L)
      .select("aid", "bid").orderBy("aid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // pure time overlap, keys ignored — includes the cross-key overlaps
    val want = for {
      (aid, _, as_, ae) <- Seq((1L, "", 0L, 10L), (2L, "", 25L, 40L),
        (3L, "", 100L, 200L), (4L, "", 0L, 1000L))
      (bid, _, bs, be) <- Seq((10L, "", 5L, 8L), (11L, "", 10L, 20L),
        (12L, "", 41L, 50L), (13L, "", 30L, 150L), (14L, "", 0L, 999L))
      if as_ <= be && bs <= ae
    } yield (aid, bid)
    assert(got == want.sorted)
  }

  test("every pair emits exactly once regardless of bin size " +
      "(first-common-bin rule, no dedup shuffle)") {
    for (bin <- Seq(1L, 3L, 7L, 64L, 1000L))
      assert(pairs(bin) == expected, s"binSize=$bin")
  }

  test("the plan is an equality hash join, not a nested loop") {
    val plan = IntervalJoin.overlapJoin(a, b, Seq("ka" -> "kb"),
      "a_s", "a_e", "b_s", "b_e", 16L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("degenerate inputs: empty side, zero-length (point) intervals") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Long, Long)].toDF("bid", "kb", "b_s", "b_e")
    assert(IntervalJoin.overlapJoin(a, empty, Seq("ka" -> "kb"),
      "a_s", "a_e", "b_s", "b_e", 16L).count() == 0)
    // point interval [t, t] overlaps exactly the intervals containing t
    val pt = Seq((20L, "k", 5L, 5L), (21L, "k", 24L, 24L)).toDF("bid", "kb", "b_s", "b_e")
    val out = IntervalJoin.overlapJoin(a, pt, Seq("ka" -> "kb"),
      "a_s", "a_e", "b_s", "b_e", 16L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 20L))) // t=5 inside a1; t=24 inside nothing
  }
}
