package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unit checks of the text-analysis expressions beyond the oracle gate
  * (q27-q30), including branches the synthetic corpus never hits (real
  * CJK text, empty strings, punctuation-heavy docs). */
class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(text).toDF("text").select(c).head()

  test("predictedLang: stopword argmax with priority ties; CJK gate; und fallback") {
    assert(one("the cat and the dog", TextAnalysis.predictedLang($"text")).getString(0) === "en")
    assert(one("der hund und die katze ist", TextAnalysis.predictedLang($"text")).getString(0) === "de")
    assert(one("le chat est dans la maison", TextAnalysis.predictedLang($"text")).getString(0) === "fr")
    assert(one("el perro y los gatos es", TextAnalysis.predictedLang($"text")).getString(0) === "es")
    assert(one("你好世界 这是中文文本 完全没有空格词", TextAnalysis.predictedLang($"text")).getString(0) === "zh")
    assert(one("xyzzy plugh qwerty", TextAnalysis.predictedLang($"text")).getString(0) === "und")
    // tie between en and de resolves to en (priority order)
    assert(one("the der", TextAnalysis.predictedLang($"text")).getString(0) === "en")
  }

  test("quality features: ratios and bounds on a crafted doc") {
    val df = Seq((1L, "the quick brown fox, it jumps; over 42 dogs!"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").head()
    assert(r.getAs[Long]("n_tokens") === 9L)
    assert(r.getAs[Double]("punct_ratio") > 0.0)
    assert(r.getAs[Double]("digit_ratio") > 0.0)
    val score = r.getAs[Double]("quality_score")
    assert(score > 0.0 && score <= 1.0)
  }

  test("token counts: whitespace vs wordpiece vs BPE estimate") {
    assert(one("hello world", TextAnalysis.wsTokenCount($"text")).getLong(0) === 2L)
    assert(one("hello, world! x-2", TextAnalysis.wordpieceCount($"text")).getLong(0) === 4L)
    assert(Seq(10L).toDF("n").select(TextAnalysis.bpeEstimate($"n")).head().getLong(0) === 3L)
  }

  test("rolling fingerprint: known value, order-sensitivity, empty-string guard") {
    // "ab" -> ((0*31+97)%P*31+98)%P = 97*31+98 = 3105
    assert(one("ab", TextAnalysis.rollingFingerprint($"text")).getLong(0) === 3105L)
    val fAb = one("ab", TextAnalysis.rollingFingerprint($"text")).getLong(0)
    val fBa = one("ba", TextAnalysis.rollingFingerprint($"text")).getLong(0)
    assert(fAb !== fBa)
    assert(one("", TextAnalysis.rollingFingerprint($"text")).getLong(0) === 0L)
  }

  test("repetition metrics: known bigram counts; repeated phrase flagged, varied text not") {
    val rep = Seq.fill(20)("spam ham").mkString(" ")      // "spam ham spam ham ..."
    val varied = "one two three four five six seven eight nine ten"
    val df = Seq((1L, rep), (2L, varied)).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // 40 tokens -> 39 bigrams: 20× "spam ham" + 19× "ham spam"
    assert(m(0).getAs[Long]("n_grams") === 39L)
    assert(m(0).getAs[Long]("n_distinct_grams") === 2L)
    assert(m(0).getAs[Double]("top_gram_fraction") === 20.0 / 39.0)
    // varied text: every bigram unique
    assert(m(1).getAs[Long]("n_grams") === 9L)
    assert(m(1).getAs[Double]("dup_gram_fraction") === 0.0)
    assert(m(1).getAs[Double]("top_gram_fraction") === 1.0 / 9.0)
  }

  test("bpePairFrequencies: corpus-weighted character pairs over the distinct vocab") {
    // words: "the"×3 (one via casefold), "then"×1, "a" dropped (<2 chars)
    val df = Seq((1L, "the THE a"), (2L, "the then!")).toDF("doc_id", "text")
    val pairs = TextAnalysis.bpePairFrequencies(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "the"×3 contributes th,he; "then"×1 contributes th,he,en
    assert(pairs === Map("th" -> 4L, "he" -> 4L, "en" -> 1L))
  }

  test("trainBigramLm: top-K by (count desc, bigram asc), occurrences " +
    "not distinct-per-doc, single-token docs contribute nothing") {
    val df = Seq(
      (1L, "a b a b"),   // bigrams: "a b","b a","a b"
      (2L, "a b c"),     // "a b","b c"
      (3L, "solo")       // no bigrams — filtered, no fallback unigram
    ).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(df.select(col("text")), "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts: "a b"=3, "b a"=1, "b c"=1 → top-2 = "a b", then tie
    // broken by gram asc → "b a"
    assert(lm.toSeq === Seq(("a b", 3L), ("b a", 1L)))
  }

  test("bigramUnseenScore: ppm of occurrences outside the model; " +
    "scoring corpus may differ from the training corpus") {
    val train = Seq("a b a b", "a b c").toDF("text")
    val lm = TextAnalysis.trainBigramLm(train, "text", 2) // {"a b","b a"}
    val score = Seq(
      (10L, "a b c"),    // "a b" seen, "b c" unseen → 500000
      (11L, "x y"),      // "x y" unseen → 1000000
      (12L, "a b a b"),  // "a b","b a","a b" all seen → 0
      (13L, "one")       // no bigrams — absent from output
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bigramUnseenScore(score, "doc_id", "text", lm)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (10L, 2L, 1L, 500000L),
      (11L, 1L, 1L, 1000000L),
      (12L, 3L, 0L, 0L)))
  }

  test("collocationLift: hand-computed lift, count floor, and the " +
    "(lift desc, gram asc) top-K order") {
    // corpus: "x y" always adjacent (perfect collocation), "a"/"b"
    // frequent but never adjacent to each other twice.
    // docs (each ≥2 tokens): tokens N = 12.
    //   d1: "x y a b"  d2: "x y b a"  d3: "x y a b"
    // counts: x=3 y=3 a=3 b=3; bigrams: "x y"=3, "y a"=2, "a b"=2,
    //   "y b"=1, "b a"=1
    // minCount=2 drops the hapax pairs. lifts (N=12):
    //   "x y": 3*12e6/(3*3)  = 4_000_000
    //   "y a": 2*12e6/(3*3)  = 2_666_666 (floor)
    //   "a b": 2*12e6/(3*3)  = 2_666_666 — tie broken by gram asc
    val docs = Seq("x y a b", "x y b a", "x y a b").toDF("text")
    val got = TextAnalysis.collocationLift(docs, "text", minCount = 2, topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("x y", 4000000L), ("a b", 2666666L), ("y a", 2666666L)))
  }

  test("bigramUnseenScore plan: the model joins broadcast, never shuffled") {
    val train = Seq("a b").toDF("text")
    val lm = TextAnalysis.trainBigramLm(train, "text", 10)
    val plan = TextAnalysis.bigramUnseenScore(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // ------------------------------------------------ boilerplate blocks

  test("boilerplateBlocks: a banner block repeating across a source's " +
      "docs flags; the same block in ANOTHER source does not; partial " +
      "tails are content; a doc repeating its banner loses both copies") {
    // 2-word blocks, minDf 2. srcA docs share banner "x y"; doc 3
    // repeats it; srcB's single doc has the same words but no second
    // doc to corroborate — stays content.
    val docs = Seq(
      (1L, "A", "x y a b c"),      // blocks: [x y][a b], tail c
      (2L, "A", "x y d e"),        // blocks: [x y][d e]
      (3L, "A", "x y x y f"),      // blocks: [x y][x y], tail f
      (4L, "B", "x y g h"))        // same banner, different source
      .toDF("id", "src", "text")
    val got = TextAnalysis
      .boilerplateBlocks(docs, "id", "src", "text", 2, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got(1L) == ((5L, 2L, 1L, 500000L, 3L)))
    assert(got(2L) == ((4L, 2L, 1L, 500000L, 2L)))
    // doc 3: BOTH banner occurrences removed
    assert(got(3L) == ((5L, 2L, 2L, 1000000L, 1L)))
    // srcB: no corroboration ⇒ nothing flagged
    assert(got(4L) == ((4L, 2L, 0L, 0L, 4L)))
  }

  test("boilerplateBlocks: a doc shorter than one block emits zero " +
      "blocks and keeps all its words as content") {
    val docs = Seq((1L, "A", "solo"), (2L, "A", "a b c d"),
      (3L, "A", "a b e f")).toDF("id", "src", "text")
    val got = TextAnalysis
      .boilerplateBlocks(docs, "id", "src", "text", 2, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))).toMap
    assert(got(1L) == ((1L, 0L, 0L, 1L)))
    assert(got(2L)._3 == 1L) // shared [a b] flags for the real docs
  }

  test("zipfSlope discriminates: a constructed Zipfian corpus fits " +
      "slope ~ -1000, a uniform vocabulary exactly 0, a 1-term group " +
      "null") {
    import spark.implicits._
    // letters-only term names: the tokenizer splits on [^A-Za-z]+, so a
    // digit suffix would collapse every term to one token
    def t(prefix: String, r: Int) = s"$prefix${('a' + r - 1).toChar}"
    // zipf: term r appears floor(1000/r) times, r = 1..20
    val zipf = (1 to 20).map(r => ("zipf", (s"${t("term", r)} " * (1000 / r)).trim))
    // uniform: 20 terms, 50 occurrences each -> y constant -> slope 0
    val uni = (1 to 20).map(r => ("uni", (s"${t("word", r)} " * 50).trim))
    val single = Seq(("one", "lonely lonely lonely"))
    val got = TextAnalysis.zipfSlope(
        (zipf ++ uni ++ single).toDF("lang", "text"), "lang", "text",
        topK = 20)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    val zs = got("zipf")._2.get
    assert(zs <= -900L && zs >= -1100L, s"zipf slope $zs")
    assert(got("uni") === ((20L, Some(0L))))
    assert(got("one") === ((1L, None)))
  }

  test("heapsSlope: linear vocabulary growth reads beta ~ 1000, a " +
      "saturated corpus reads 0, and the directions order; short docs " +
      "contribute no grams (the descending-sequence guard)") {
    import spark.implicits._
    // linear: every doc introduces 5 brand-new bigram types (6 unique
    // tokens per doc, no token reuse across docs) -> V grows ~ N
    val linear = (0L until 64L).map { d =>
      ("lin", d, (0 to 5).map(k => s"w${d}x$k").mkString(" "))
    }
    // saturated: all docs identical -> V constant after doc 0
    val sat = (0L until 64L).map(d => ("sat", d, "a b c d e f"))
    val out = TextAnalysis.heapsSlope(
        (linear ++ sat).toDF("g", "ord", "text"), "g", "ord", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
    val lin = out("lin")._2.get
    assert(lin >= 900L && lin <= 1100L, s"linear slope $lin")
    val st = out("sat")._2.get
    assert(st >= 0L && st <= 50L, s"saturated slope $st")
    assert(lin > st)
    // a 1-token doc yields zero bigrams, never a reversed sequence
    val short = Seq(("s", 0L, "only"), ("s", 1L, "a b")).toDF("g", "ord", "text")
    val sr = TextAnalysis.heapsSlope(short, "g", "ord", "text").collect()
    assert(sr.length === 1) // points exist (V=N=1 at late checkpoints)
  }

  test("hapaxProfile: exact spectrum counts on a constructed frame; " +
      "a fully-repeated corpus reads zero hapax; bigram mode counts " +
      "gram types") {
    import spark.implicits._
    // unigram: tokens a a b c -> N=4 V=3 hapax=2 (b,c) dis=1 (a); plus
    // d d -> dis=1 in its own group
    val docs = Seq(("g1", "a a b c"), ("g2", "d d")).toDF("g", "text")
    val got = TextAnalysis.hapaxProfile(docs, "g", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got("g1") === ((4L, 3L, 2L, 1L, 750000L, 666666L)))
    assert(got("g2") === ((2L, 1L, 0L, 1L, 500000L, 0L)))
    // repeated corpus: every type frequent -> hapax 0
    val rep = Seq(("r", ("x y " * 10).trim)).toDF("g", "text")
    assert(TextAnalysis.hapaxProfile(rep, "g", "text")
      .head().getLong(3) === 0L)
    // bigram mode: "a b a b a" -> grams (a b)(b a)(a b)(b a) wait:
    // positions: a b, b a, a b, b a -> V=2, all freq 2 -> hapax 0 dis 2
    val bg = TextAnalysis.hapaxProfile(
      Seq(("g", "a b a b a")).toDF("g", "text"), "g", "text", gramN = 2)
      .head()
    assert((bg.getLong(1), bg.getLong(2), bg.getLong(3), bg.getLong(4))
      === ((4L, 2L, 0L, 2L)))
  }

  test("gramNovelty: the reference row reads 0; a disjoint source " +
      "reads 1e6; a half-overlapping source reads exact counts both " +
      "by type and by occurrence") {
    import spark.implicits._
    val docs = Seq(
      ("ref", "a b c d"),        // ref bigrams: {a b, b c, c d}
      ("dis", "x y z w"),        // disjoint: {x y, y z, z w}
      // half: "a b" (seen) once, "p q" (novel) three times
      ("half", "a b"), ("half", "p q"), ("half", "p q"), ("half", "p q"))
      .toDF("src", "text")
    val got = TextAnalysis.gramNovelty(docs, "src", "text", "ref")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(got("ref")._5 === 0L && got("ref")._6 === 0L)
    assert(got("dis")._5 === 1000000L && got("dis")._6 === 1000000L)
    // half: 2 distinct (1 novel), 4 occurrences (3 novel)
    assert(got("half") === ((2L, 1L, 4L, 3L, 500000L, 750000L)))
  }
}
