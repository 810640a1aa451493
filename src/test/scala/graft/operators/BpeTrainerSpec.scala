package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BpeTrainer unit gates — the q86/q91 oracle covers the cross-engine
  * bit-for-bit contract at corpus scale; these specs cover the failure
  * modes the gate corpus doesn't exercise: words that FULLY merge into
  * one token mid-training (ADVICE r7: unguarded `sequence(1, 0)` +
  * `element_at(t, 0)` throws), and merge counts far beyond the gate's 3
  * rounds (plan-depth growth without lineage checkpointing). */
class BpeTrainerSpec extends SparkSuite {
  import spark.implicits._

  test("pairCounts drops fully-merged single-token entries instead of throwing") {
    // |ab| (1 token, the post-merge shape) + |a||b||c| (3 tokens)
    val v = Seq(("|ab|", 5L), ("|a||b||c|", 2L)).toDF("s", "cnt")
    val pairs = BpeTrainer.pairCounts(v)
      .orderBy("pair").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(pairs.toSeq == Seq(("a b", 2L), ("b c", 2L)))
  }

  test("training survives a word collapsing to one token and stops when no pairs remain") {
    // 'ab' fully merges in round 1; round 2's pair count must see an
    // empty vocabulary contribution (not an array-index error) and the
    // trainer must stop early with the single learned rule
    val words = Seq.fill(5)("ab").toDF("w")
    val out = BpeTrainer.train(spark, words, "w", 10, 3, 5).collect()
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      == Seq((1, "a b", 5L)))
  }

  test("a realistic corpora mix: collapsed words drop out, longer words keep training") {
    // 'the' collapses after (h,e) then (t,he) — ties broken weight desc,
    // pair asc, so round 1 picks "h e" over "t h" (both weight 13);
    // 'there' keeps training (the ADVICE scenario: a 3-char word
    // collapses before the final round)
    val words = (Seq.fill(10)("the") ++ Seq.fill(3)("there")).toDF("w")
    val rules = BpeTrainer.train(spark, words, "w", 10, 3, 0)
      .filter(col("step") <= 3)
      .orderBy("step").collect().map(_.getString(1))
    assert(rules.toSeq == Seq("h e", "t he", "r e"))
  }

  /** Deterministic pseudo-random 10-char words — diverse enough that 50
    * distinct merge rules exist. */
  private def toyWords = (0 until 100).map { i =>
    (0 until 10).map(j => ('a' + ((i * 7 + j * 3 + i * j) % 26)).toChar).mkString
  }

  test("50-merge training completes with bounded lineage and matches the uncheckpointed prefix") {
    val words = toyWords.toDF("w")
    // 50 rounds cross the CheckpointEvery=20 boundary twice; without the
    // localCheckpoint the plan re-applies k regex layers at round k and
    // the lineage deepens per rule
    val r50 = BpeTrainer.train(spark, words, "w", 100, 50, 0)
      .filter(col("step") <= 50).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(r50.length == 50, "toy vocab must support all 50 merges")
    // checkpointing is a pure lineage operation: the first rounds must
    // choose exactly what a short (never-checkpointed) run chooses
    val r3 = BpeTrainer.train(spark, words, "w", 100, 3, 0)
      .filter(col("step") <= 3).orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(r50.take(3).toSeq == r3.toSeq)
  }

  test("regex metacharacters in words train correctly; structural chars are dropped") {
    // '.' would wildcard-match without Pattern.quote; '$'/'\\' would be
    // group references in the replacement without quoteReplacement
    val words = (Seq.fill(3)("a.c") ++ Seq.fill(2)("x$z")).toDF("w")
    val rules = BpeTrainer.train(spark, words, "w", 10, 4, 0)
      .filter(col("step") <= 4).orderBy("step").collect().map(_.getString(1))
    // ". c" < "a ." and "$ z" < "x $" (tie-break pair asc at equal weight)
    assert(rules.toSeq == Seq(". c", "a .c", "$ z", "x $z"))
    // words carrying the structural chars never enter the vocabulary
    val structural = (Seq("a|b", "a b") ++ Seq.fill(2)("ok")).toDF("w")
    val v = BpeTrainer.vocab(structural, "w", 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(v == Seq(("|o||k|", 2L)))
  }

  test("landRules/readRules round-trips the trained model artifact") {
    val words = (Seq.fill(4)("abc") ++ Seq.fill(2)("abd")).toDF("w")
    val dir = java.nio.file.Files.createTempDirectory("bpe_rules_").toString
    BpeTrainer.landRules(spark, words, "w", 10, 2, 3, dir)
    val direct = BpeTrainer.train(spark, words, "w", 10, 2, 3)
      .orderBy("step", "pair").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val landed = BpeTrainer.readRules(spark, dir)
      .orderBy("step", "pair").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(landed.toSeq == direct.toSeq)
  }
}
