package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSuite

/**
 * Property tests for the gap-fill lerp (SURVEY §5 discipline): on
 * generated irregular series the interpolation must stay inside the
 * endpoint envelope, hit only grid instants strictly inside sub-cap
 * gaps, and be exactly reproducible under repartitioning.
 */
class TemporalOpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private val Step = 10L
  private val Cap = 100L

  /** Generated per-key series: ascending times, arbitrary values. */
  private def series(seed: Long): Seq[(Long, Long, Long, Long)] = {
    val g = for {
      k <- Gen.chooseNum(1L, 3L)
      t <- Gen.chooseNum(0L, 400L)
      v <- Gen.chooseNum(-1000L, 1000L)
    } yield (k, t, v)
    (0 until 120).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .zipWithIndex
      .map { case ((k, t, v), i) => (k, t, i.toLong, v) }
  }

  test("property: interpolated values stay inside the endpoint envelope " +
      "and land only on interior grid instants of sub-cap gaps") {
    val rows = series(7L)
    val df = rows.toDF("k", "t", "tie", "v")
    val out = TemporalOps.gapFillInterpolate(df, "k", "t", "tie", "v", Step, Cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // reference pairs: per key, consecutive in (t, tie) order
    val byKey = rows.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._2, r._3)).toVector)
    for ((k, gt, vi) <- out) {
      assert(gt % Step == 0, s"off-grid instant $gt")
      val pairs = byKey(k).zip(byKey(k).tail)
      val host = pairs.find { case (a, b) => a._2 < gt && gt < b._2 }
      assert(host.isDefined, s"grid instant $gt outside every gap for key $k")
      val (a, b) = host.get
      assert(b._2 - a._2 <= Cap, s"gap over cap emitted at $gt")
      val lo = math.min(a._4, b._4); val hi = math.max(a._4, b._4)
      assert(vi >= lo && vi <= hi, s"lerp $vi outside [$lo, $hi] at $gt")
      // exact floor-lerp against the pair that anchors the gap: among
      // duplicate-time rows the LAST in (t, tie) order anchors
      val anchor = byKey(k).filter(r => r._2 == a._2).maxBy(_._3)
      val expect = anchor._4 + Math.floorDiv(
        (b._4 - anchor._4) * (gt - anchor._2), b._2 - anchor._2)
      assert(vi == expect, s"lerp $vi != $expect at ($k, $gt)")
    }
  }

  test("property: the output is identical under repartitioning") {
    val df = series(99L).toDF("k", "t", "tie", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      TemporalOps.gapFillInterpolate(d, "k", "t", "tie", "v", Step, Cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df.repartition(1)) == run(df.repartition(7)))
  }

  test("ewmaSmooth under duplicate (t, tie) keys stays deterministic: " +
      "ties fall back to value order because the fold sorts the whole " +
      "(t, tie, x) struct") {
    import spark.implicits._
    // three rows fully tied on (t, tie) with distinct values, then an
    // anchor; sorted by (t, tie, x) the values run 3, 6, 9, 4 →
    // e = 3, (3+6)/2 = 4, (4+9)/2 = 6, (6+4)/2 = 5
    val df = Seq((1L, 1L, 1L, 9L), (1L, 1L, 1L, 3L), (1L, 1L, 1L, 6L),
      (1L, 2L, 2L, 4L)).toDF("k", "t", "id", "x")
    def run(d: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      TemporalOps.ewmaSmooth(d, "k", "t", "id", "x")
        .select("x", "e").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    val want = Seq((3L, 3L), (4L, 5L), (6L, 4L), (9L, 6L))
    assert(run(df.repartition(5)) == want)
    assert(run(df.coalesce(1)) == want)
  }
}
