package graft.operators

import graft.SparkSuite

class StringSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def df = Seq(
    (1L, "kitten"),  // vs 2: substitution (sitten)
    (2L, "sitten"),
    (3L, "kitte"),   // vs 1: deletion
    (4L, "kittens"), // vs 1: insertion
    (5L, "kitten"),  // vs 1: equal
    (6L, "mitten"),  // vs 1/2: substitution
    (7L, "bolero")   // far from everything
  ).toDF("id", "s")

  test("finds substitution, insertion, deletion and equality pairs; " +
      "excludes distance >= 2") {
    val out = StringSimilarity.editDistanceOnePairs(df, "id", "s")
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 5L), (2L, 6L),
      (3L, 5L),
      (4L, 5L),
      (5L, 6L)))
    // NOT present: (2,3) sitten/kitte = 2, (3,4) kitte/kittens = 2,
    // (2,4) = 2, (3,6)/(4,6) = 2, anything with 7
  }

  test("false candidates sharing a variant at distance 2 are reranked away") {
    // "ab" and "cb" share variant "b" (delete first char each side) at
    // distance 1 — kept; "abc" and "cbc"? distance 1 too. Use "axb" vs
    // "ayc": share nothing. True distance-2 sharing a variant: "ax" and
    // "ya" share variant "a"; levenshtein(ax, ya) = 2 — must be gone.
    val d2 = Seq((1L, "ax"), (2L, "ya")).toDF("id", "s")
    assert(StringSimilarity.editDistanceOnePairs(d2, "id", "s").count() == 0)
  }

  test("the candidate join is an equality join on variants, never a " +
      "cartesian levenshtein sweep") {
    val plan = StringSimilarity.editDistanceOnePairs(df, "id", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("degenerate strings: empty, single char, and identical singletons") {
    val d = Seq((1L, ""), (2L, "a"), (3L, "b"), (4L, ""), (5L, "ab"))
      .toDF("id", "s")
    val out = StringSimilarity.editDistanceOnePairs(d, "id", "s")
      .select("id_a", "id_b").orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // ""≡"" (ed 0); ""~"a"/"b" (insertion); "a"~"b" (substitution);
    // "a"~"ab" and "b"~"ab"? "b"/"ab": delete 'a' from "ab" -> "b" (ed 1)
    assert(out == Seq(
      (1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (2L, 5L),
      (3L, 4L), (3L, 5L)))
  }

  test("blockedLinkage: candidates only within blocks, threshold gates, " +
      "best match per left picked by (score desc, right id)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val left = Seq(
      (1L, "b1", "anna"), (2L, "b1", "bert"), (3L, "b2", "carl"))
      .toDF("l_id", "blk", "l_name")
    val right = Seq(
      (11L, "b1", "anna"),  // exact match for 1
      (12L, "b1", "anja"),  // distance-2 noise in the same block
      (13L, "b2", "bert"),  // exact name but WRONG block → never a cand
      (14L, "b2", "carl"), (15L, "b2", "carl")) // tie → lower id wins
      .toDF("r_id", "blk", "r_name")
    val score = when(col("l_name") === col("r_name"), 100L)
      .when(levenshtein(col("l_name"), col("r_name")) <= 1, 60L)
      .otherwise(0L)
    val got = StringSimilarity.blockedLinkage(left, right, "l_id", "r_id",
        "blk", score, minScore = 60L)
      .select("l_id", "r_id", "score").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 2's only same-block candidates (anna/anja) score 0 → no row
    assert(got == Map(1L -> ((11L, 100L)), 3L -> ((14L, 100L))))
  }
}
