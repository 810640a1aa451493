package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand fixtures for the fourth round-13 wave: the perplexity-gated
 * corpus filter (q261) and DSIR importance selection (q262). The LM
 * here is CONSTRUCTED directly as the (level, g, cnt) artifact frame —
 * no training pass — so every score below is hand-derivable from the
 * stupid-backoff rules, and the gates' quartile arithmetic is pinned
 * on lattices small enough to enumerate.
 */
class Round13WaveDSpec extends SparkSuite {
  import spark.implicits._

  /** A hand LM over the two-word world {a, b}: trigram "a a a" (cnt 4)
    * with context bigram "a a" (cnt 8), bigram "a b" (cnt 2) with
    * unigram context a (cnt 10), unigram b (cnt 5), N = 20.
    * Scores: "a a a"-occurrence = 10⁶·4/8 = 500000 (rule 3);
    * "? a b" = 2·10⁶·2/(5·10) = 80000 (rule 2, when "? a b" ∉ LM₃);
    * "? ? b" = 4·10⁶·5/(25·20) = 40000 (rule 1); unseen = 0. */
  private def handLm = Seq(
    (3, "a a a", 4L), (2, "a a", 8L), (2, "a b", 2L),
    (1, "a", 10L), (1, "b", 5L), (0, "", 20L))
    .toDF("level", "g", "cnt")

  // ------------------------------------------------------------------
  // perplexityGate
  // ------------------------------------------------------------------

  test("perplexityGate: hand quartile — 4 distinct scores per source " +
      "cut at the lowest, short docs counted but never scored") {
    // "a a a a" -> 2 tri-occurrences, both rule 3 -> mean 500000
    // "a a a"   -> 1 occurrence, rule 3 -> 500000... need distinct
    // scores: craft via mixing rules.
    // s1: "a a a a a" -> 3 occ all 500000 -> mean 500000
    // s2: "c a b c" -> occ (c,a,b): g3 unseen, g2c="a b" hit with
    //     g1p=a -> 80000; occ (a,b,c): g2c="b c" unseen, g1c=c unseen
    //     -> 0 -> mean 40000
    // s3: "c c b" -> occ (c,c,b): rule 1 on b -> 40000 -> mean 40000
    // s4: "c c c" -> 0
    // source X docs: s1, s2, s3, s4 -> scores 500000, 40000, 40000, 0
    // quartile: 4*cum >= n=4 at the FIRST value asc (0, cum 1) ->
    // thr = 0 -> everything kept
    // source Y docs: s1, s1, s2, s4 + one short doc "a" ->
    // scores 500000, 500000, 40000, 0; thr: value 0 cum 1, 4 >= 4 ->
    // thr 0 -> all 4 kept; n_docs = 5, n_scored = 4
    val docs = Seq(
      ("X", 1L, "a a a a a"), ("X", 2L, "c a b c"), ("X", 3L, "c c b"),
      ("X", 4L, "c c c"), ("Y", 5L, "a a a a a"), ("Y", 6L, "a a a a a"),
      ("Y", 7L, "c a b c"), ("Y", 8L, "c c c"), ("Y", 9L, "a"))
      .toDF("src", "id", "text")
    val r = TextAnalysis.perplexityGate(docs, "id", "text", "src",
      handLm).collect().map(x => x.getAs[String]("source") -> x).toMap
    assert(r("X").getAs[Long]("n_docs") === 4L)
    assert(r("X").getAs[Long]("n_scored") === 4L)
    assert(r("X").getAs[Long]("thr_ppm") === 0L)
    assert(r("X").getAs[Long]("n_kept") === 4L)
    assert(r("Y").getAs[Long]("n_docs") === 5L)
    assert(r("Y").getAs[Long]("n_scored") === 4L)
    assert(r("Y").getAs[Long]("kept_permille") === 1000L)
    assert(r("Y").isNullAt(r("Y").fieldIndex("mean_dropped_ppm")))
  }

  test("perplexityGate: a genuinely cutting quartile — 8 docs, the " +
      "two worst dropped, and the separation reads " +
      "mean_kept > thr > mean_dropped") {
    // 8 scored docs in one source: 2x mean 0, 6x mean 500000.
    // counts frame asc: (0, cum 2): 4*2 = 8 >= 8 -> thr = 0?? The
    // lower-quartile rule KEEPS docs at the threshold, so an all-or-
    // nothing score split keeps everything. Use three bands instead:
    // 2x 0, 2x 40000, 4x 500000 -> n=8; (0, cum 2): 8 >= 8 -> thr 0.
    // The rule is min s with 4*cum >= n -> 0 again. To actually cut,
    // the bottom band must hold UNDER a quarter: 1x 0, 7x 500000 ->
    // (0, cum 1): 4 < 8; (500000, cum 8): 32 >= 8 -> thr 500000,
    // the one zero-score doc drops.
    val docs = (1L to 7L).map(i => ("S", i, "a a a a a")) :+
      (("S", 8L, "c c c"))
    val r = TextAnalysis.perplexityGate(docs.toDF("src", "id", "text"),
      "id", "text", "src", handLm).collect().head
    assert(r.getAs[Long]("thr_ppm") === 500000L)
    assert(r.getAs[Long]("n_kept") === 7L)
    assert(r.getAs[Long]("kept_permille") === 875L)
    assert(r.getAs[Long]("mean_kept_ppm") === 500000L)
    assert(r.getAs[Long]("mean_dropped_ppm") === 0L)
    assert(r.getAs[Long]("mean_kept_ppm") > r.getAs[Long]("thr_ppm") - 1)
    assert(r.getAs[Long]("mean_dropped_ppm") < r.getAs[Long]("thr_ppm"))
  }

  // ------------------------------------------------------------------
  // dsirSelect
  // ------------------------------------------------------------------

  test("dsirSelect: hand weights — target-matching docs clear the " +
      "upper-quartile line, the identity lm gives w = 10^6 everywhere") {
    // target LM = handLm; raw LM = unigram-only world where ONLY c is
    // known: "a a a a a" scores 0 raw, 500000 target ->
    // w = 10^6 * 500001 / 1 = 500001000000
    // "c c c c" (3 occ, rule 1 on c: 4*10^6*9/(25*9) = 160000 raw;
    // target 0) -> w = 10^6 * 1 / 160001 = 6
    val rawLm = Seq((1, "c", 9L), (0, "", 9L)).toDF("level", "g", "cnt")
    val docs = Seq((1L, "a a a a a"), (2L, "a a a a a"),
      (3L, "c c c c"), (4L, "c c c c")).toDF("id", "text")
    val r = TextAnalysis.dsirSelect(docs, "id", "text", handLm, rawLm)
      .collect().map(x => x.getAs[Long]("doc") -> x).toMap
    assert(r(1L).getAs[Long]("w_ppm") === 500001000000L)
    assert(r(3L).getAs[Long]("w_ppm") === 6L)
    // weights {6, 6, 500001000000, 500001000000}: upper quartile =
    // min w with 4*cum >= 3*4 -> (6, cum 2): 8 < 12;
    // (5e11, cum 4): 16 >= 12 -> thr = 5e11 -> the two target docs
    assert(r.values.map(_.getAs[Long]("thr_ppm")).toSet ===
      Set(500001000000L))
    assert(r(1L).getAs[Int]("sel") === 1)
    assert(r(2L).getAs[Int]("sel") === 1)
    assert(r(3L).getAs[Int]("sel") === 0)
    assert(r(4L).getAs[Int]("sel") === 0)
    // identity: same LM on both sides -> every w exactly 10^6, every
    // doc at the threshold -> all selected (the >= rule)
    val id = TextAnalysis.dsirSelect(docs, "id", "text", handLm, handLm)
      .collect()
    assert(id.forall(_.getAs[Long]("w_ppm") === 1000000L))
    assert(id.forall(_.getAs[Int]("sel") === 1))
  }

  test("dsirSelect: bucket decomposition is invariant to nBuckets — " +
      "1, 7 and 256 buckets give identical thresholds and selections") {
    val rawLm = Seq((1, "c", 9L), (1, "a", 3L), (0, "", 12L))
      .toDF("level", "g", "cnt")
    val docs = (1L to 12L).map { i =>
      (i, if (i % 3 == 0) "c c c c" else if (i % 3 == 1) "a a a a a"
        else "c a b c")
    }.toDF("id", "text")
    val runs = Seq(1, 7, 256).map { nb =>
      TextAnalysis.dsirSelect(docs, "id", "text", handLm, rawLm, nb)
        .orderBy("doc")
        .select("doc", "w_ppm", "thr_ppm", "sel")
        .collect().map(_.toSeq).toSeq
    }
    assert(runs(0) === runs(1))
    assert(runs(0) === runs(2))
  }
}
