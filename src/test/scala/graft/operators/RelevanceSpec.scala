package graft.operators

import graft.SparkSuite

class RelevanceSpec extends SparkSuite {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark join spark window"),
    (2L, "join join join filter"),
    (3L, "spark spark spark spark spark"),
    (4L, "window scan sort"),
    (5L, "ab x y")) // tokens under minTermLen drop out entirely
    .toDF("doc_id", "text")

  test("invertedIndex: df/tf totals and capped sorted postings") {
    val ix = Relevance.invertedIndex(docs, "doc_id", "text",
      postingCap = 2, minDf = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getSeq[Long](3))).sortBy(_._1)
    // spark: docs 1 (tf 2) and 3 (tf 5); join: docs 1 (1) and 2 (3);
    // window: docs 1 and 4 (1 each)
    assert(ix.toSeq == Seq(
      ("join", 2L, 4L, Seq(1L, 2L)),
      ("spark", 2L, 7L, Seq(1L, 3L)),
      ("window", 2L, 2L, Seq(1L, 4L))))
  }

  test("invertedIndex: posting cap truncates, never reorders") {
    val many = (1L to 10L).map(i => (i, "common")).toDF("doc_id", "text")
    val ix = Relevance.invertedIndex(many, "doc_id", "text",
      postingCap = 3, minDf = 2).collect()
    assert(ix.length == 1)
    assert(ix.head.getSeq[Long](3) == Seq(1L, 2L, 3L))
  }

  test("bm25TopK: higher tf ranks higher at equal length; all-integer scores") {
    val d = Seq(
      (1L, "spark spark spark scan"),
      (2L, "spark scan sort merge"),
      (3L, "scan sort merge agg")).toDF("doc_id", "text")
    val out = Relevance.bm25TopK(d, "doc_id", "text", Seq("spark"), k = 5)
      .orderBy("rnk").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L)) // doc 3 has no hit
    assert(out(0).getLong(4) > out(1).getLong(4)) // tf=3 beats tf=1
  }

  test("bm25TopK: rarer term gets the larger idf contribution") {
    val d = (1L to 9L).map(i => (i, "common common filler"))
      .toDF("doc_id", "text")
      .union(Seq((10L, "rare common filler")).toDF("doc_id", "text"))
    val out = Relevance.bm25TopK(d, "doc_id", "text",
      Seq("rare", "common"), k = 1)
      .collect().map(r => (r.getString(0), r.getLong(4))).toMap
    assert(out("rare") > out("common"))
  }

  test("tfidfCosinePairs: identical docs score cosine 1 (dot = both " +
      "norms); disjoint docs emit no pair at all") {
    val d = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val out = Relevance.tfidfCosinePairs(d, "doc_id", "text",
      dfCapPermille = 1000L, idfScale = 100L, tauBp = 90).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 2L)
    assert(r.getAs[Double]("dot") == r.getAs[Double]("n2a") &&
      r.getAs[Double]("n2a") == r.getAs[Double]("n2b"))
    assert(r.getAs[Long]("n_shared") == 3L)
  }

  test("tfidfCosinePairs: the df cap drops stopword-ish terms from the " +
      "candidate join — docs sharing ONLY a capped term never pair") {
    val docs = ((1L to 8L).map(i => (i, s"stop uniq$i filler$i")) :+
      (9L, "stop other nine")).toDF("doc_id", "text")
    // 'stop' has df 9 > 60% of N = 5.4: with it capped away no two
    // docs share a term, so zero pairs survive candidate generation
    val out = Relevance.tfidfCosinePairs(docs, "doc_id", "text",
      dfCapPermille = 600L, idfScale = 100L, tauBp = 0).collect()
    assert(out.isEmpty)
  }

  test("tfidfCosinePairs: the integer cross-multiplied threshold " +
      "classifies the hand-computed cosine exactly") {
    // d1 = "aaa bbb", d2 = "aaa ccc": idf(aaa) = 100, idf(bbb|ccc) = 200
    // → w = (100, 200) each, dot = 100², n2 = 50000 → cos = 0.2 exactly
    val d = Seq((1L, "aaa bbb"), (2L, "aaa ccc")).toDF("doc_id", "text")
    def pairs(tau: Int) = Relevance.tfidfCosinePairs(
      d, "doc_id", "text", dfCapPermille = 1000L, idfScale = 100L, tauBp = tau)
    assert(pairs(21).collect().isEmpty, "cos 0.2 must fail τ = 0.21")
    val hit = pairs(20).collect() // cos² = 0.04 = τ² exactly: ≥ keeps it
    assert(hit.length == 1 && hit(0).getAs[Double]("dot") == 10000.0 &&
      hit(0).getAs[Double]("n2a") == 50000.0)
  }

  test("tfidfCosinePairs: pair orientation is always doc_a < doc_b, " +
      "each pair once") {
    val d = Seq((5L, "xxx yyy zzz"), (2L, "xxx yyy zzz"), (9L, "xxx yyy zzz"))
      .toDF("doc_id", "text")
    val out = Relevance.tfidfCosinePairs(d, "doc_id", "text",
      dfCapPermille = 1000L, idfScale = 100L, tauBp = 50)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(out.toSet == Set((2L, 5L), (2L, 9L), (5L, 9L)))
    assert(out.length == 3, "each unordered pair exactly once")
  }

  test("phraseSearch counts exact adjacencies — overlapping repeats " +
      "count each position, short words are NOT dropped, non-adjacent " +
      "co-occurrence scores zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "big cat big cat sat"),     // "big cat" ×2
      (2L, "big dog and cat"),          // co-occur, never adjacent
      (3L, "a a a a"),                  // "a a" ×3 (overlap) + 1-char tokens
      (4L, "Big CAT"),                  // case-folded match ×1
      (5L, "bigcat"))                   // no token boundary → no match
      .toDF("doc_id", "text")
    val got = Relevance.phraseSearch(docs, "doc_id", "text",
        Seq(("big", "cat"), ("a", "a")), k = 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      ("big cat", 1L) -> ((2L, 1L)),
      ("big cat", 4L) -> ((1L, 2L)),
      ("a a", 3L) -> ((3L, 1L))))
  }

  test("rrfFuse: consensus docs outrank single-list docs; contributions " +
      "are exact integer floors; n_lists counts surfacing rankers") {
    import spark.implicits._
    val a = Seq(("q", 10L, 1L), ("q", 11L, 2L), ("q", 12L, 3L))
      .toDF("term", "doc_id", "rnk")
    val b = Seq(("q", 11L, 1L), ("q", 13L, 2L), ("q", 10L, 3L))
      .toDF("term", "doc_id", "rnk")
    val got = Relevance.rrfFuse(a, b, "term", "doc_id", k = 10)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def c(r: Long) = 1000000000L / (60L + r)
    // doc 10: ranks 1+3; doc 11: ranks 2+1; docs 12/13 single-list
    assert(got(10L) == ((c(1) + c(3), 2L, 2L)))
    assert(got(11L) == ((c(2) + c(1), 2L, 1L)))
    assert(got(12L) == ((c(3), 1L, 4L)))
    assert(got(13L) == ((c(2), 1L, 3L)))
    // both consensus docs beat both single-list docs
    assert(Set(got(10L)._3, got(11L)._3) == Set(1L, 2L))
  }

  test("ndcgAtK: the ideal ordering scores exactly 1e6 ppm, a misordered " +
      "ranking strictly less, and empty truth yields null — with the " +
      "hand-computed Q20 discount") {
    import graft.functions.FixedLog
    val truth = Seq(("q", 1L, 3L), ("q", 2L, 2L), ("q", 3L, 1L),
      ("z", 9L, 1L))
      .toDF("term", "doc_id", "grade")
    def ranked(ids: Seq[Long], term: String = "q") =
      ids.zipWithIndex.map { case (d, i) => (term, d, (i + 1).toLong) }
        .toDF("term", "doc_id", "rnk")
    def ndcg(df: org.apache.spark.sql.DataFrame) =
      Relevance.ndcgAtK(df, truth, "term", "doc_id", k = 3)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3), Option(r.get(4))))).toMap
    // ideal order 1,2,3 (grades 3,2,1): dcg == idcg -> exactly 1e6
    val ideal = ndcg(ranked(Seq(1L, 2L, 3L)))("q")
    assert(ideal._1 === ideal._2 && ideal._3.contains(1000000L))
    // hand-check the numerator on the defining lattice
    val expected = Seq((3L, 2L), (2L, 3L), (1L, 4L)).map { case (g, m) =>
      g * Relevance.NdcgScale / FixedLog.log2q20(m)
    }.sum
    assert(ideal._2 === expected)
    // worst order 3,2,1 scores strictly below ideal; ranked docs with
    // no truth row contribute grade 0
    val rev = ndcg(ranked(Seq(3L, 2L, 1L)))("q")
    assert(rev._1 < rev._2 && rev._3.exists(_.asInstanceOf[Long] < 1000000L))
    // a query whose ranking has no graded truth at all: null ndcg, not 0
    val none = ndcg(ranked(Seq(7L, 8L), term = "x"))("x")
    assert(none._2 === 0L && none._3.isEmpty)
    // a query present in TRUTH but absent from the ranker's output (the
    // worst-case ranker failure) surfaces as ndcg 0, not a missing row
    val truthOnly = ndcg(ranked(Seq(1L)))("z")
    assert(truthOnly._1 === 0L && truthOnly._2 > 0L &&
      truthOnly._3.contains(0L))
  }

  test("rboOverlap: identical lists hit the exact lattice maximum; " +
      "disjoint lists and single-sided queries read 0; a rank-1 " +
      "disagreement costs more than a rank-k one (top-weightedness); " +
      "matches a naive per-depth reference on random rankings") {
    import spark.implicits._
    val k = 10
    val p = Relevance.RboPQ20
    def lists(rows: Seq[(String, Long, Long)]) = rows.toDF("q", "doc", "rnk")
    def rbo(a: Seq[(String, Long, Long)], b: Seq[(String, Long, Long)]) =
      Relevance.rboOverlap(lists(a), lists(b), "q", "doc", k)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val ident = (1L to k).map(i => ("q", i, i))
    // identical lists: every depth agrees fully, mass = sum over items
    // of S(rank) -> the closed lattice value
    val sTab = Relevance.rboSuffixMass(k, p).toMap
    val maxMass = (1 to k).map(i => sTab(i.toLong)).sum
    val wantMax = (((1L << 20) - p) * maxMass) / p
    assert(rbo(ident, ident)("q")._4 === wantMax)
    // RBO_min at k=10, p=0.9 caps at 1 - p^10 ~ 0.651 (the residual
    // tail weight is unobserved at finite depth, by definition)
    assert(wantMax > 600000L && wantMax < 700000L)
    // disjoint lists: zero overlap at every depth
    val other = (1L to k).map(i => ("q", 100 + i, i))
    assert(rbo(ident, other)("q") === ((10L, 10L, 0L, 0L)))
    // single-sided query: 0, not null (valid empty intersection)
    val gotSolo = rbo(ident, other.map { case (_, d2, r) => ("z", d2, r) })
    assert(gotSolo("q") === ((10L, 0L, 0L, 0L)))
    assert(gotSolo("z") === ((0L, 10L, 0L, 0L)))
    // top-weightedness: swapping OUT the rank-1 item hurts more than
    // swapping out the rank-k item
    def swapped(rank: Long) =
      ident.map { case (q, d, r) => if (r == rank) (q, 999L, r) else (q, d, r) }
    val hurt1 = rbo(ident, swapped(1))("q")._4
    val hurtK = rbo(ident, swapped(k))("q")._4
    assert(hurt1 < hurtK && hurtK < wantMax)
    // randomized differential vs the naive per-depth definition
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(500 + seed)
      def mk(q: String) = {
        val docs = rnd.shuffle((1L to 20L).toList).take(k)
        docs.zipWithIndex.map { case (d, i) => (q, d, i + 1L) }
      }
      val a = mk("q1") ++ mk("q2"); val b = mk("q1") ++ mk("q2")
      val got = rbo(a, b)
      for (q <- Seq("q1", "q2")) {
        val av = a.filter(_._1 == q).map(r => r._2 -> r._3).toMap
        val bv = b.filter(_._1 == q).map(r => r._2 -> r._3).toMap
        // naive: pows lattice, X_d at each depth, sum P(d)//d * X_d...
        // via the same per-item S(m) identity computed FROM the naive
        // per-depth X_d values
        val pows = Iterator.iterate(p)(x => (x * p) >> 20).take(k).toVector
        var mass = BigInt(0)
        for (d <- 1 to k) {
          val xd = av.keySet.filter(av(_) <= d)
            .intersect(bv.keySet.filter(bv(_) <= d)).size
          mass += BigInt(pows(d - 1) / d) * xd
        }
        val want = ((BigInt((1L << 20) - p) * mass) / BigInt(p)).toLong
        assert(got(q)._4 === want, s"seed=$seed q=$q")
      }
    }
  }

  test("prAtK: perfect ranking reads P=R=AP=1e6; no relevant docs " +
      "null recall/AP; the lcm trick is exact vs a rational-arithmetic " +
      "naive AP on random rankings") {
    val k = 10
    def pr(ranked: Seq[(String, Long, Long)], truth: Seq[(String, Long)]) =
      Relevance.prAtK(ranked.toDF("q", "doc", "rnk"),
          truth.toDF("q", "doc"), "q", "doc", k)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4),
            Option(r.get(5)).map(_.asInstanceOf[Long]),
            Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    // exactly the k relevant docs, ranked: everything reads 1e6
    val ranked = (1 to k).map(i => ("q", i.toLong, i.toLong))
    val perfect = pr(ranked, (1 to k).map(i => ("q", i.toLong)))
    assert(perfect("q") === ((10L, 10L, 10L,
      1000000L, Some(1000000L), Some(1000000L))))
    // no relevant docs at all: precision 0, recall/AP null (no division)
    val barren = pr(ranked, Seq(("other", 1L)))
    assert(barren("q") === ((10L, 0L, 0L, 0L, None, None)))
    // randomized differential: AP@k vs exact rational arithmetic
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(600 + seed)
      val docs = rnd.shuffle((1L to 30L).toList).take(k)
      val rk = docs.zipWithIndex.map { case (d, i) => ("q", d, i + 1L) }
      val rel = (1L to 30L).filter(_ => rnd.nextBoolean()).toSet
      val got = pr(rk, rel.toSeq.map(("q", _)))
      // rational AP: sum over relevant ranks of cumRel/i, over min(R,k),
      // floored to ppm at the very end only
      var cum = 0L
      var num = BigInt(0); var den = BigInt(1)
      rk.sortBy(_._3).foreach { case (_, d, i) =>
        if (rel(d)) {
          cum += 1
          // num/den += cum/i
          num = num * i + den * cum * BigInt(1000000)
          den = den * i
        }
      }
      val want = if (rel.nonEmpty)
        Some((num / (den * BigInt(math.min(rel.size, k)))).toLong)
      else None
      assert(got("q")._6 === want, s"seed=$seed")
      assert(got("q")._4 === 1000000L * cum / k, s"seed=$seed p@k")
    }
  }
}
