package graft.operators

import graft.SparkSuite
import graft.functions.FixedLog.log2q20

/**
 * Hand fixtures for the unigram-LM tokenizer (q294/q295): the Viterbi
 * arg-min order derived case by case, and a 3-word training corpus
 * whose whole EM chain — seeds, E-step segmentations, prune, add-one
 * re-score, final usage — is worked on paper (costs spelled through
 * the defining [[graft.functions.FixedLog.log2q20]] lattice).
 */
class UnigramLMSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def pieces(ps: (String, Long)*) =
    ps.toSeq.toDF("piece", "pcost")

  test("viterbi picks the cheaper segmentation: ab(5) beats a(10)+b(10)") {
    val got = UnigramLM.viterbi(Seq("ab").toDF("word"),
      pieces("a" -> 10L, "b" -> 10L, "ab" -> 5L)).collect()(0)
    assert(got.getString(0) === "ab" && got.getLong(1) === 5L &&
      got.getLong(2) === 1L && got.getString(3) === "|ab")
  }

  test("viterbi cost tie breaks on FEWER pieces: a(5)+b(5) vs ab(10) " +
      "reads |ab") {
    val got = UnigramLM.viterbi(Seq("ab").toDF("word"),
      pieces("a" -> 5L, "b" -> 5L, "ab" -> 10L)).collect()(0)
    assert(got.getLong(1) === 10L && got.getLong(2) === 1L &&
      got.getString(3) === "|ab")
  }

  test("viterbi (cost, np) tie breaks on the SEG string: |ab|c < |a|bc " +
      "because '|' sorts above lowercase letters") {
    val got = UnigramLM.viterbi(Seq("abc").toDF("word"),
      pieces("a" -> 5L, "c" -> 5L, "ab" -> 7L, "bc" -> 7L)).collect()(0)
    assert(got.getLong(1) === 12L && got.getLong(2) === 2L &&
      got.getString(3) === "|ab|c")
  }

  test("viterbi drops words containing a character no piece covers") {
    val got = UnigramLM.viterbi(Seq("ab", "xz").toDF("word"),
      pieces("a" -> 5L, "b" -> 5L)).collect()
    assert(got.length === 1 && got(0).getString(0) === "ab")
  }

  test("train: the aab/ab corpus reproduces the hand-derived EM chain " +
      "end to end (seeds, usage, add-one costs, final usage)") {
    // stream: aab ×2, ab ×1 → chars a=5 b=3; vocab aab(2) ab(1);
    // substrings aa=2 ab=2+1=3 aab=2; T0=15.
    // E1: c0(a)=L15−L5, c0(b)=c0(ab)=L15−L3, c0(aa)=c0(aab)=L15−L2;
    //   aab: |aab (≈2.91) beats |a|ab (≈3.90), |aa|b (≈5.23),
    //   |a|a|b (≈5.49) → usage aab=2; ab: |ab (≈2.32) beats |a|b → ab=1
    // prune keeps chars a,b (usage 0) + multi aab=2, ab=1; b=u+1 →
    //   a=1 b=1 aab=3 ab=2, T1=7 → cost1 = L7−L(b)
    // E2 re-reads the same segmentations → usage_final = usage_em.
    val stream = (Seq.fill(2)("aab") ++ Seq("ab")).toDF("w")
    val got = UnigramLM.train(spark, stream, "w", 200, 150, 80)
      .orderBy("piece").collect()
    val l7 = log2q20(7L)
    val expect = Map(
      "a"   -> (1L, 5L, 0L, 0L, l7 - log2q20(1L)),
      "aab" -> (3L, 2L, 2L, 2L, l7 - log2q20(3L)),
      "ab"  -> (2L, 3L, 1L, 1L, l7 - log2q20(2L)),
      "b"   -> (1L, 3L, 0L, 0L, l7 - log2q20(1L)))
    assert(got.length === 4)
    got.foreach { r =>
      val (plen, seedW, uEm, uFin, cost) = expect(r.getString(0))
      assert(r.getLong(1) === plen, r.getString(0))
      assert(r.getLong(2) === seedW, r.getString(0))
      assert(r.getLong(3) === uEm, r.getString(0))
      assert(r.getLong(4) === uFin, r.getString(0))
      assert(r.getLong(5) === cost, r.getString(0))
    }
  }

  test("train: nKeep caps the multi-char survivors but never the " +
      "single-char coverage set") {
    val stream = (Seq.fill(3)("aab") ++ Seq.fill(2)("ab")).toDF("w")
    val got = UnigramLM.train(spark, stream, "w", 200, 150, 1)
      .collect()
    val chars = got.filter(_.getLong(1) === 1L).map(_.getString(0)).sorted
    assert(chars.toSeq === Seq("a", "b"))
    assert(got.count(_.getLong(1) >= 2L) === 1)
  }

  test("encodeStats aggregates the per-word Viterbi back onto the " +
      "occurrence stream per document") {
    val stream = (Seq.fill(2)("aab") ++ Seq("ab")).toDF("w")
    val model = UnigramLM.train(spark, stream, "w", 200, 150, 80)
    val docs = Seq((1L, "aab"), (1L, "ab"), (2L, "aab"))
      .toDF("doc_id", "w")
    val got = UnigramLM.encodeStats(docs, "doc_id", "w", model)
      .orderBy("doc_id").collect()
    val cAab = log2q20(7L) - log2q20(3L)
    val cAb = log2q20(7L) - log2q20(2L)
    val d1 = got(0)
    assert(d1.getLong(0) === 1L && d1.getLong(1) === 2L &&
      d1.getLong(2) === 5L && d1.getLong(3) === 2L &&
      d1.getLong(4) === cAab + cAb)
    val d2 = got(1)
    assert(d2.getLong(1) === 1L && d2.getLong(2) === 3L &&
      d2.getLong(3) === 1L && d2.getLong(4) === cAab)
  }

  test("encodeStats inner-joins away words outside the model alphabet " +
      "(documented drop semantics)") {
    val stream = Seq("aab").toDF("w")
    val model = UnigramLM.train(spark, stream, "w", 200, 150, 80)
    val docs = Seq((1L, "aab"), (1L, "zzz"), (3L, "zzz"))
      .toDF("doc_id", "w")
    val got = UnigramLM.encodeStats(docs, "doc_id", "w", model)
      .orderBy("doc_id").collect()
    assert(got.length === 1)           // doc 3 (all out-of-alphabet) gone
    assert(got(0).getLong(0) === 1L && got(0).getLong(1) === 1L)
  }
}
