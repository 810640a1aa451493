package graft.operators

import graft.SparkSuite

class CoverageOpsSpec extends SparkSuite {
  import spark.implicits._

  test("greedyMaxCoverage picks by MARGINAL coverage — the second pick " +
      "is not the second-biggest set when it overlaps the first") {
    // A covers {1,2,3,4}; B covers {1,2,3} (big but redundant);
    // C covers {5,6} (small but novel). Greedy: A, then C (marginal 2
    // beats B's 0... B's marginal is 0 — all covered), then B at 0 is
    // dropped from the aggregate (no uncovered rows) so only a set
    // with genuine marginal can be picked third: D covers {4,7}.
    val df = (Seq(1L, 2L, 3L, 4L).map(("A", _)) ++
      Seq(1L, 2L, 3L).map(("B", _)) ++
      Seq(5L, 6L).map(("C", _)) ++
      Seq(4L, 7L).map(("D", _))).toDF("s", "e")
    val got = CoverageOps.greedyMaxCoverage(df, "s", "e", 3)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "A", 4L, 4L), (2L, "C", 2L, 6L),
      (3L, "D", 1L, 7L)))
  }

  test("greedyMaxCoverage: duplicates dedup (set semantics), ties break " +
      "by set id, exhaustion stops early") {
    // X and Y both cover {1,2} (X listed twice): tie at marginal 2 →
    // X by id; then Y's marginal is 0 and NOTHING is uncovered ⇒ the
    // run exhausts after one pick even with k = 3.
    val df = Seq(("X", 1L), ("X", 1L), ("X", 2L), ("Y", 1L), ("Y", 2L))
      .toDF("s", "e")
    val got = CoverageOps.greedyMaxCoverage(df, "s", "e", 3).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getLong(2)) == (("X", 2L)))
  }
}
