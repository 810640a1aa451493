package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/**
 * Semantic properties of the dedup operators beyond the hash-level oracle
 * gate (q22-q24): seeded duplicates are provably found, and the LSH plan
 * generates candidates via an equality join — never a cartesian product.
 */
class TextDedupSpec extends SparkSuite {
  import spark.implicits._

  test("exactDupGroups collapses identical content to one representative") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z")).toDF("doc_id", "text")
    val groups = TextDedup.exactDupGroups(df, "text", "doc_id")
      .orderBy("rep_id").collect()
    assert(groups.length === 2)
    assert(groups.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("minhash: identical docs have est_sim 1.0; seeded near-dups are all found") {
    val docs = Tables.documents(spark, sf("0.01")).select(col("doc_id"), col("text"))
    val mut = docs.filter(col("doc_id") % 20 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" zz qq")).as("text"))
    val pairs = TextDedup.minhashCandidatePairs(docs.union(mut), "text", "doc_id")
    val seeded = pairs.filter(col("doc_b") === col("doc_a") + 100000)
    // every 20th doc was mutated: all 25 seeded pairs must surface as candidates
    assert(seeded.count() === 25)
    // appended 2 tokens on ~100+ token docs: exact bigram jaccard stays high
    assert(seeded.filter(col("jaccard") < 0.8).count() === 0)
    // a doc is trivially a near-duplicate of itself
    val self = TextDedup.minhashCandidatePairs(
      docs.union(docs.select(col("doc_id") + 100000 as "doc_id", col("text"))),
      "text", "doc_id")
      .filter(col("doc_b") === col("doc_a") + 100000)
    assert(self.filter(col("est_sim") =!= 1.0).count() === 0)
  }

  test("maxBandBucket cap drops hot-bucket pairs and accounts for them") {
    // 30 copies of one boilerplate doc -> every band bucket it occupies is
    // hot; 2 distinct near-dup docs stay under the cap
    val boiler = (1L to 30L).map(i => (i, "the same boilerplate page text over and over"))
    val longDoc = (1 to 30).map(i => s"tok$i").mkString(" ")
    val real = Seq((100L, longDoc + " zeta"), (200L, longDoc + " eta"))
    val df = (boiler ++ real).toDF("doc_id", "text")
    val uncapped = TextDedup.minhashCandidatePairs(df, "text", "doc_id",
      maxBandBucket = 10000)
    // 30 identical docs alone produce C(30,2)=435 pairs
    assert(uncapped.filter(col("doc_a") <= 30).count() === 435)
    val capped = TextDedup.minhashCandidatePairs(df, "text", "doc_id",
      maxBandBucket = 10)
    // hot boilerplate buckets dropped; the under-cap pair survives
    assert(capped.filter(col("doc_a") <= 30).count() === 0)
    assert(capped.filter(col("doc_a") === 100 && col("doc_b") === 200).count() === 1)
    // drop accounting: the diagnostic frame reports every hot bucket
    val texts = df.select(col("doc_id"), col("text"))
    val hot = TextDedup.bandBucketSizes(
      TextDedup.bandRows(TextDedup.signatures(texts, 3)))
      .filter(col("bucket_size") > 10)
    assert(hot.count() === TextDedup.Bands) // all 4 boilerplate band buckets
    assert(hot.agg(max(col("bucket_size"))).head.getLong(0) === 30L)
  }

  test("column-form and aggregate-form MinHash signatures agree on the corpus") {
    val texts = Tables.documents(spark, sf()).select(col("doc_id"), col("text"))
    val viaAgg = TextDedup.signatures(texts, 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaCols = texts
      .select(col("doc_id"), TextDedup.shingleHashes(col("text"), 3).as("hv"))
      .select(col("doc_id"), TextDedup.signatureFromHashes(col("hv")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaAgg.nonEmpty)
    assert(viaAgg === viaCols)
  }

  test("LSH candidate generation plan contains no cartesian product") {
    val docs = Tables.documents(spark, sf("0.01")).select(col("doc_id"), col("text"))
    val plan = TextDedup.minhashCandidatePairs(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("decontamination finds every leaked benchmark doc; boilerplate shingles are capped") {
    val docs = Tables.documents(spark, sf("0.01")).select(col("doc_id"), col("text"))
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val leaked = bench.select((col("doc_id") + 200000).as("doc_id"),
      concat(col("text"), lit(" zz zz")).as("text"))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0).union(leaked)
    val hits = TextDedup.contaminationPairs(corpus, bench, "text", "doc_id")
      .collect()
    // every leaked doc is caught against exactly its source, ratio ≫ noise
    val leakedHits = hits.filter(_.getAs[Long]("doc_id") >= 200000)
    assert(leakedHits.length === bench.count())
    assert(leakedHits.forall(r =>
      r.getAs[Long]("bench_id") === r.getAs[Long]("doc_id") - 200000))
    assert(leakedHits.forall(_.getAs[Double]("overlap_ratio") > 0.8))
    // a shingle present in MORE docs than the cap contributes nothing:
    // stamp a shared phrase on every corpus doc and on one bench doc —
    // with the cap at 10 the stamped trigrams must not create pairs
    val stamped = corpus.select(col("doc_id"),
      concat(lit("aa bb cc dd "), col("text")).as("text"))
    val benchStamped = bench.limit(1).select(col("doc_id"),
      lit("aa bb cc dd").as("text"))
    val capped = TextDedup.contaminationPairs(stamped, benchStamped,
      "text", "doc_id", maxShingleDf = 10, minShared = 1).collect()
    assert(capped.isEmpty, s"capped boilerplate still paired: ${capped.toSeq}")
  }

  test("simhash: fingerprint is stable under duplication and differs across docs") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "one two three four five")).toDF("doc_id", "text")
    val fp = TextDedup.simhashFingerprint(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(fp(0).getLong(1) === fp(1).getLong(1))
    assert(fp(0).getLong(1) !== fp(2).getLong(1))
    assert(fp(0).getLong(2) === 4L) // n_tokens
  }

  test("simhash near-dup: exact copies always pair at hamming 0; mutants pair small") {
    val docs = Tables.documents(spark, sf("0.001")).select(col("doc_id"), col("text"))
    // exact copies share every block — the pigeonhole guarantee is total,
    // so EVERY copy pair must surface, at distance exactly 0
    val copies = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000).as("doc_id"), col("text"))
    val copyPairs = TextDedup.simhashNearDupPairs(
      docs.union(copies), "text", "doc_id")
      .filter(col("doc_b") === col("doc_a") + 500000).collect()
    assert(copyPairs.length === copies.count())
    assert(copyPairs.forall(_.getAs[Long]("hamming") === 0L))
    // one appended token flips only near-zero bit sums: most single-token
    // mutants stay within the hamming<=3 window (guaranteed recall there)
    val mut = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(col("text"), lit(" qq")).as("text"))
    val nMut = mut.count()
    val mutFound = TextDedup.simhashNearDupPairs(
      docs.union(mut), "text", "doc_id")
      .filter(col("doc_b") === col("doc_a") + 500000).count()
    assert(mutFound >= nMut / 2,
      s"only $mutFound of $nMut single-token mutants found at hamming<=3")
  }

  test("simhash near-dup: hot block buckets are capped away before pairing") {
    // 5 identical docs: every block bucket has size 5 > cap 4, so the cap
    // must drop all of them and no pair may form
    val same = (1L to 5L).map(i => (i, "common boilerplate page text here"))
      .toDF("doc_id", "text")
    val pairs = TextDedup.simhashNearDupPairs(same, "text", "doc_id",
      maxBlockBucket = 4)
    assert(pairs.count() === 0)
    // with the cap above the bucket size all C(5,2) pairs surface
    val uncapped = TextDedup.simhashNearDupPairs(same, "text", "doc_id",
      maxBlockBucket = 5)
    assert(uncapped.count() === 10)
  }

  test("jaccardPrefixJoin: exact duplicates surface at J = 1; disjoint " +
      "docs never pair") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "aa bb cc dd ee ff"),
      (3L, "zz yy xx ww vv uu")).toDF("doc_id", "text")
    val out = TextDedup.jaccardPrefixJoin(docs, "doc_id", "text", 900L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_a") == 1L &&
      out(0).getAs[Long]("doc_b") == 2L &&
      out(0).getAs[Long]("jaccard_pm") == 1000L)
  }

  test("jaccardPrefixJoin is COMPLETE: agrees exactly with the brute-" +
      "force all-pairs Jaccard on a corpus of overlapping documents") {
    // deterministic word soup with heavy overlap so near-threshold pairs
    // exist in both directions of the cut
    val vocab = Vector("ape", "bat", "cat", "dog", "eel", "fox", "gnu",
      "hen", "ibex", "jay")
    val docs = (0 until 24).map { i =>
      val words = (0 until 8).map(k => vocab((i * 7 + k * 3) % 10))
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
    val tauPm = 500L
    val fast = TextDedup.jaccardPrefixJoin(docs, "doc_id", "text",
        tauPm, shingleN = 2)
      .select("doc_a", "doc_b", "jaccard_pm").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = docs.as("x").join(docs.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        (TextDedup.ngramJaccard(col("x.text"), col("y.text"), 2) * 1000)
          .as("j1000"))
      .filter(col("j1000") >= tauPm)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.floor(r.getDouble(2) + 1e-9).toLong)).toSet
    assert(fast.map(p => (p._1, p._2)) == brute.map(p => (p._1, p._2)),
      s"prefix join disagrees with brute force:\nfast=$fast\nbrute=$brute")
    assert(fast.nonEmpty, "fixture must produce at least one passing pair")
  }

  test("jaccardPrefixJoin: the threshold is inclusive (a pair exactly " +
      "at τ is kept) and integer cross-multiplied") {
    // sets of 5 bigrams sharing 4: J = 4/6 = 0.666…; τ = 666 keeps,
    // τ = 667 drops
    val docs = Seq(
      (1L, "aa bb cc dd ee ff"), // bigrams: aa-bb bb-cc cc-dd dd-ee ee-ff
      (2L, "aa bb cc dd ee zz")) // shares 4 of its 5
      .toDF("doc_id", "text")
    def run(tau: Long) = TextDedup.jaccardPrefixJoin(
      docs, "doc_id", "text", tau, shingleN = 2).collect()
    assert(run(666L).length == 1 && run(666L)(0).getAs[Long]("jaccard_pm") == 666L)
    assert(run(667L).isEmpty)
  }

  test("dupNgramCoverage: exact copies score 1e6 ppm, a unique doc 0, " +
    "partial overlap the hand-computed fraction") {
    // 2-grams. d1/d2 identical (all grams df≥2 → 1e6). d3 shares its
    // first gram with nothing, overlaps d4 on "cc dd" only.
    val docs = Seq(
      (1L, "aa bb cc"),   // grams: "aa bb","bb cc"
      (2L, "aa bb cc"),
      (3L, "zz cc dd"),   // "zz cc","cc dd" — "cc dd" also in d4
      (4L, "cc dd ee")    // "cc dd","dd ee"
    ).toDF("doc_id", "text")
    val got = TextDedup.dupNgramCoverage(docs, "doc_id", "text",
        shingleN = 2, flagPpm = 600000L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 1000000L, 1L),
      (2L, 2L, 2L, 1000000L, 1L),
      (3L, 2L, 1L, 500000L, 0L),
      (4L, 2L, 1L, 500000L, 0L)))
  }

  test("dupNgramCoverage: repeated gram INSIDE one doc does not count " +
    "as duplicated (distinct-per-doc before the frequency window)") {
    val docs = Seq((1L, "aa bb aa bb"), (2L, "zz qq")).toDF("doc_id", "text")
    // d1 grams distinct: "aa bb","bb aa" — each df=1 → 0 ppm
    val got = TextDedup.dupNgramCoverage(docs, "doc_id", "text", 2, 500000L)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(3)).toSeq === Seq(0L, 0L))
  }

  test("containmentJoin: a contiguous excerpt surfaces DIRECTED with " +
      "containment 1000; the big side never reads as contained; " +
      "sub-threshold overlap is dropped") {
    import spark.implicits._
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = "gamma delta epsilon zeta eta theta iota kappa"
    val partial = "alpha beta gamma UNRELATED WORDS HERE NOW okay fine"
    val docs = Seq((1L, big), (2L, excerpt), (3L, partial))
      .toDF("doc_id", "text")
    val got = TextDedup.containmentJoin(docs, "doc_id", "text",
        tauPm = 800, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(5)).toMap
    // excerpt (2) contained in big (1), exactly, directed
    assert(got((2L, 1L)) === 1000L)
    assert(!got.contains((1L, 2L)), "container must not read as contained")
    // partial shares only 1 of its 7 trigrams with big: dropped at 0.8
    assert(!got.contains((3L, 1L)) && !got.contains((1L, 3L)))
    assert(got.size === 1)
  }

  test("containmentJoin: the corpus-relative df cap bounds boilerplate " +
      "B-side posting fan-out") {
    // 30 hosts all embedding one template + a template-only doc: the
    // template doc's RAREST grams are still in every host, so its prefix
    // would join O(corpus)-long postings
    val template = "alpha beta gamma delta epsilon zeta"
    val docs = ((1L to 30L).map(i =>
      (i, s"$template filler${i}a filler${i}b filler${i}c")) :+
      ((100L, template))).toDF("doc_id", "text")
    // cap off (1000 permille = df <= N, vacuous): the template doc joins
    // every host -> the unbounded fan-out the cap exists to prevent
    val uncapped = TextDedup.containmentJoin(docs, "doc_id", "text",
      tauPm = 800, shingleN = 3, dfCapPermille = 1000)
    assert(uncapped.filter(col("doc_a") === 100).count() === 30)
    // default 10%-of-corpus cap: template grams (df = 31 of 31 docs)
    // drop from the joined postings -> candidates bounded
    val capped = TextDedup.containmentJoin(docs, "doc_id", "text",
      tauPm = 800, shingleN = 3)
    assert(capped.filter(col("doc_a") === 100).count() === 0)
    // hosts never read as contained in each other either way (4 of 7
    // grams shared = 571 permille < 800)
    assert(capped.count() === 0)
  }

  test("winnowing: density (no w-window unfingerprinted) and locality " +
      "(a shared run always yields a shared hash); short docs " +
      "fingerprint once") {
    val shared = (1 to 20).map(i => s"sh$i").mkString(" ")
    val a = (1 to 15).map(i => s"a$i").mkString(" ") + " " + shared + " " +
      (1 to 7).map(i => s"az$i").mkString(" ")
    val b = (1 to 9).map(i => s"b$i").mkString(" ") + " " + shared
    val df = Seq((1L, a), (2L, b), (3L, "xx yy")).toDF("doc_id", "text")
    val rows = TextDedup.winnowingFingerprints(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // density: first fingerprint within the first window, gaps <= w,
    // last fingerprint inside the final window
    for ((d, maxp) <- Seq((1L, 40L), (2L, 27L))) {
      val ps = rows.filter(_._1 == d).map(_._2).sorted.toSeq
      assert(ps.head <= 4 && ps.last >= maxp - 3, s"doc $d edges: $ps")
      assert(ps.sliding(2).forall(w => w.length < 2 || w(1) - w(0) <= 4),
        s"doc $d gaps: $ps")
    }
    // locality: the 20-token shared run (>= w + n - 1 = 6) must yield
    // >= 1 identical fingerprint HASH in both docs despite different
    // positions and surroundings
    val ha = rows.filter(_._1 == 1L).map(_._3).toSet
    val hb = rows.filter(_._1 == 2L).map(_._3).toSet
    assert((ha intersect hb).nonEmpty, "shared run produced no shared hash")
    // short doc (< n tokens): its whole token sequence is the one gram,
    // selected at position 1
    assert(rows.filter(_._1 == 3L).map(t => (t._2)).toSeq === Seq(1L))
  }

  private def spanRows(docs: Seq[(Long, String)], n: Int = 3) =
    TextDedup.removeDuplicateSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("removeDuplicateSpans: overlapping gram extents merge into ONE " +
      "maximal span; clean docs pass through normalized") {
    val got = spanRows(Seq(
      1L -> "a b c d e f g h",
      2L -> "a b c d e x y z",
      3L -> "Unique Tokens Only Here Never Repeated"))
    // docs 1/2 share trigrams at positions 1..3 -> extents [1,3],[2,4],
    // [3,5] overlap -> one merged span covering tokens 1-5, NOT three
    assert(got(1L) === ((8L, 5L, 1L, "f g h")))
    assert(got(2L) === ((8L, 5L, 1L, "x y z")))
    // untouched doc: zero spans, kept_text is the normalized (lowercased,
    // single-spaced) text
    assert(got(3L) === ((6L, 0L, 0L, "unique tokens only here never repeated")))
  }

  test("removeDuplicateSpans: a WITHIN-doc repeat is a duplicate (suffix-" +
      "array semantics); separated runs stay two spans") {
    // "p q r s" repeats inside doc 1 with a unique separator between the
    // copies: both occurrences excise, the separator survives, 2 spans
    val got = spanRows(Seq(1L -> "p q r s uniq1 p q r s"))
    assert(got(1L) === ((9L, 8L, 2L, "uniq1")))
  }

  test("removeDuplicateSpans: abutting runs merge; a fully-duplicated doc " +
      "comes back empty with one span") {
    val got = spanRows(Seq(
      1L -> "a1 a2 a3 b1 b2 b3",
      2L -> "a1 a2 a3 zz b1 b2 b3",
      3L -> "m n o p",
      4L -> "m n o p"))
    // doc 1: flagged extents [1,3] (shared head) and [4,6] (shared tail)
    // ABUT -> one island, whole doc removed
    assert(got(1L) === ((6L, 6L, 1L, "")))
    // doc 2: same two shared runs but separated by zz -> two spans
    assert(got(2L) === ((7L, 6L, 2L, "zz")))
    // exact copies: everything removed as one span each
    assert(got(3L) === ((4L, 4L, 1L, "")))
    assert(got(4L) === ((4L, 4L, 1L, "")))
  }

  test("removeDuplicateSpans: short docs (< n tokens) dedup on their whole " +
      "token sequence") {
    val got = spanRows(Seq(1L -> "xx yy", 2L -> "xx yy", 3L -> "qq ww"))
    assert(got(1L) === ((2L, 2L, 1L, "")))
    assert(got(2L) === ((2L, 2L, 1L, "")))
    assert(got(3L) === ((2L, 0L, 0L, "qq ww")))
  }

  test("cdcChunks: chunks tile each doc exactly; min-size clamp holds " +
      "for all but the forced tail; identical docs chunk identically; " +
      "boundaries RE-SYNC after an insertion (the CDC property); " +
      "matches a naive sequential fold on random corpora") {
    import spark.implicits._
    val w = 3; val div = 4; val minLen = 2
    def run(docs: Seq[(Long, String)]) =
      TextDedup.cdcChunks(docs.toDF("doc_id", "text"), "doc_id", "text",
        w, div, minLen)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    val rnd = new scala.util.Random(77)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    def mkDoc(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = mkDoc(60)
    val inserted = {
      val t = base.split(" ").toVector
      (t.take(5) :+ "zz").++(t.drop(5)).mkString(" ")
    }
    val docs = Seq((1L, base), (2L, base), (3L, inserted)) ++
      (4L to 15L).map(i => (i, mkDoc(8 + rnd.nextInt(70))))
    val got = run(docs)
    // tiling: chunks are contiguous from 1 to nt, no gaps or overlaps
    docs.foreach { case (id, text) =>
      val nt = text.split("\\s+").length
      val ch = got(id)
      assert(ch.head._2 === 1L)
      assert(ch.map(_._3).sum === nt.toLong, s"doc $id coverage")
      ch.sliding(2).foreach {
        case Seq(a, b) => assert(b._2 === a._2 + a._3); case _ =>
      }
      // min-size: every chunk but the last is >= minLen
      ch.dropRight(1).foreach(c => assert(c._3 >= minLen))
    }
    // determinism: identical docs produce identical chunk sequences
    assert(got(1L).map(t => (t._2, t._3, t._4)) ===
      got(2L).map(t => (t._2, t._3, t._4)))
    // CDC re-sync: after the early insertion, the SUFFIX chunk hashes
    // reappear (fixed-size chunking would lose every later chunk)
    val baseH = got(1L).map(_._4).toSet
    val shared = got(3L).count(c => baseH.contains(c._4))
    assert(shared >= got(3L).size / 2,
      s"only $shared/${got(3L).size} chunks re-synced")
    // naive sequential reference on every doc
    docs.foreach { case (id, text) =>
      val t = text.toLowerCase.split("\\s+")
      val nt = t.length
      def h64(s: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        java.lang.Long.parseLong(
          md.digest(s.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(15), 16)
      }
      val cands = (w to nt).filter(i =>
        h64(t.slice(i - w, i).mkString(" ")) % div == 0)
      var last = 0L; val kept = scala.collection.mutable.ArrayBuffer[Long]()
      cands.foreach { c =>
        if (c - last >= minLen) { kept += c.toLong; last = c.toLong }
      }
      if (kept.isEmpty || kept.last != nt.toLong) kept += nt.toLong
      val want = (Seq(0L) ++ kept).sliding(2).map {
        case Seq(a, b) =>
          (b - a, h64(t.slice(a.toInt, b.toInt).mkString(" ")))
      }.toSeq
      assert(got(id).map(c => (c._3, c._4)) === want, s"doc $id")
    }
  }

  test("minhashCalibration: exact copies land in the m=16 bucket at " +
      "jaccard 1e6 with zero bias; the table's candidate set matches " +
      "minhashCandidatePairs (shared generation)") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        explode(TextDedup.shingles(col("text"), 3)).as("s"))
      .select(col("doc_id"), TextDedup.hashMod(col("s")).as("h"))
    // a token-disjoint corpus (no cross-doc shingles -> no natural
    // candidates) plus exact copies: the ONLY bucket is m=16 and it
    // reads jaccard exactly 1e6, bias exactly 0
    val distinctDocs = (1 to 30).map(i =>
      (i.toLong, (0 to 9).map(k => s"w${i}x$k").mkString(" ")))
      .toDF("doc_id", "text")
    val withCopies = distinctDocs.union(distinctDocs
      .filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 500L).as("doc_id"), col("text")))
    val pure = TextDedup.minhashCalibration(rows(withCopies), withCopies)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(pure.keySet === Set(16L))
    assert(pure(16L) === ((10L, 1000000L, 1000000L, 0L)))
    // on the real corpus: bucket totals equal the UNFILTERED candidate
    // count of the pair operator on the same frame (shared
    // bandCandidatePairs — the sets cannot drift)
    val docs = Tables.documents(spark, sf("0.01"))
      .select(col("doc_id"), col("text"))
    val cal = TextDedup.minhashCalibration(rows(docs), docs)
      .collect().map(r => r.getLong(1)).sum
    val nPairs = TextDedup.minhashCandidatePairsFromHashRows(
      rows(docs), docs, minEstSim = 0.0).count()
    assert(cal === nPairs)
  }

  test("dedupRateManifest: within-source copies read as dup, cross-" +
      "source copies as shared, and a doc in both categories counts " +
      "in both; clean sources read zero") {
    import spark.implicits._
    // src a: h1 twice (within-source dup), h2 once also under src b
    // (cross-source), h3 clean; src b: h2 once (shared with a)
    val rows = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("c", 9L)).toDF("src", "ch")
    val got = TextDedup.dedupRateManifest(rows, "src", "ch")
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)))).toMap
    assert(got("a") === ((4L, 3L, 1L, 1L, 250000L, 250000L)))
    assert(got("b") === ((1L, 1L, 0L, 1L, 0L, 1000000L)))
    assert(got("c") === ((1L, 1L, 0L, 0L, 0L, 0L)))
    // a within-source duplicate that is ALSO mirrored counts in both
    val both = Seq(("a", 1L), ("a", 1L), ("m", 1L)).toDF("src", "ch")
    val gb = TextDedup.dedupRateManifest(both, "src", "ch")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(gb("a") === ((1L, 2L)))
  }

  test("dedupRateManifestFromCounts: an arbitrary split merged by " +
      "union + grouped sum equals the full recompute bit-for-bit " +
      "(counts commute — the q244 refresh invariant)") {
    val rnd = new scala.util.Random(12)
    val rows = (1 to 400).map { i =>
      (s"s${rnd.nextInt(5)}", rnd.nextInt(60).toLong, i)
    }
    val full = TextDedup.dedupRateManifest(
      rows.toDF("src", "ch", "i"), "src", "ch")
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    // split on an arbitrary predicate, aggregate each half, merge
    val (h1, h2) = rows.partition(_._3 % 3 != 0)
    def cnts(h: Seq[(String, Long, Int)]) =
      h.map(t => (t._1, t._2)).toDF("src", "ch")
        .groupBy("src", "ch").agg(count(lit(1)).as("cnt"))
    val merged = TextDedup.dedupRateManifestFromCounts(
      cnts(h1).unionByName(cnts(h2))
        .groupBy("src", "ch").agg(sum(col("cnt")).as("cnt")))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged === full)
  }

  private def attrib(docs: Seq[(Long, String)], capPm: Long) =
    TextDedup.spanAttribution(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, dfCapPermille = capPm)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("spanAttribution: disjoint shared runs attribute as separate " +
      "spans in doc_a's coordinates; the corpus-relative posting cap " +
      "drops boilerplate grams from the evidence") {
    val docs = Seq(
      1L -> "a b c d e k z1 z2 z3",
      2L -> "p q b c d r s t u",
      3L -> "a b c w w w z1 z2 z3",
      4L -> "b c d x1 x2 x3")
    // tight cap: max(4*100/1000, 2) = 2 — "b c d" (df 3) is capped
    // out, so every pair it alone witnessed disappears
    val tight = attrib(docs, capPm = 100L)
    assert(tight.keySet === Set((1L, 3L)))
    // "a b c" covers 1..3, "z1 z2 z3" covers 7..9: 6 tokens, 2 spans
    assert(tight((1L, 3L)) === ((2L, 6L, 2L)))
    // the production DEFAULT is 1 permille (r12/r13 verdicts: the
    // pair join is O(sum df^2), so the default must exclude hot
    // grams) — on this fixture it lands on the same floor-2 cap as
    // 100 permille
    val byDefault = TextDedup.spanAttribution(
        docs.toDF("doc_id", "text"), "doc_id", "text", shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(byDefault === tight)
    // permille 1000: cap = 4, "b c d" survives and witnesses 3 pairs
    val loose = attrib(docs, capPm = 1000L)
    assert(loose.keySet ===
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 4L)))
    assert(loose((1L, 3L)) === ((2L, 6L, 2L)))
    assert(loose((1L, 2L)) === ((1L, 3L, 1L)))
    // in doc_2's coordinates the same gram sits at 3..5 — still 3/1
    assert(loose((2L, 4L)) === ((1L, 3L, 1L)))
  }

  test("spanAttribution: overlapping shared gram extents merge into " +
      "one maximal span, and a within-doc repeat pairs once per twin") {
    // docs 10/11 share the 4-token run "a b c d" -> grams "a b c" and
    // "b c d" overlap into extents 1..4 = one span
    val got = attrib(Seq(
      10L -> "a b c d q1 q2 q3",
      11L -> "a b c d r1 r2 r3"), capPm = 1000L)
    assert(got((10L, 11L)) === ((2L, 4L, 1L)))
  }
}
