package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Algebraic invariants of the round-10 operator wave, on randomized
 * frames — properties that hold by the operators' DEFINITIONS, so a
 * violation is a bug even when the oracle fixture passes:
 *  - manifest digests are additive over disjoint unions (the property
 *    that makes manifests diff by subtraction);
 *  - Cohen's κ is rater-symmetric (transposing the confusion matrix
 *    fixes agree and p_e);
 *  - A-ES samples are prefix-nested in k (the top-5 IS the first five
 *    of the top-9 — the heap semantics);
 *  - RRF fused scores are monotone under rank improvement;
 *  - containment is bounded by 1000 pm and the quote direction is the
 *    small side;
 *  - groupSplit partitions rows exactly (no loss, no duplication);
 *  - centroidDrift is invariant under replicating every vector (the
 *    centroid is a mean).
 */
class Round10PropertySpec extends SparkSuite {
  import spark.implicits._

  test("corpusManifest digest is ADDITIVE over disjoint unions (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val a = (1 to 20 + rnd.nextInt(20)).map(i =>
        (i.toLong, s"text ${rnd.nextInt(1000)}", "s"))
      val b = (200 to 220 + rnd.nextInt(20)).map(i =>
        (i.toLong, s"other ${rnd.nextInt(1000)}", "s"))
      def dig(rows: Seq[(Long, String, String)]): Long =
        QualityAudit.corpusManifest(rows.toDF("doc_id", "text", "source"),
          "source", "doc_id", "text").head().getLong(5)
      val whole = dig(a ++ b)
      val sum = (dig(a) + dig(b)) % (1L << 61)
      assert(whole === sum, s"seed=$seed")
    }
  }

  test("cohenKappa is rater-symmetric: kappa(a,b) == kappa(b,a) (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val rows = (1 to 60).map { _ =>
        ("g", rnd.nextInt(3).toLong, rnd.nextInt(3).toLong)
      }
      val df = rows.toDF("g", "a", "b")
      def kap(x: String, y: String) =
        StatsOps.cohenKappa(df, "g", x, y).head()
      val (ab, ba) = (kap("a", "b"), kap("b", "a"))
      assert(ab.getLong(1) === ba.getLong(1))
      assert(ab.getLong(2) === ba.getLong(2))
      assert(Option(ab.get(3)) === Option(ba.get(3)), s"seed=$seed")
    }
  }

  test("A-ES samples are prefix-nested in k (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val rows = (1 to 80).map(i =>
        (s"s${i % 3}", i.toLong * 31 + seed, 1L + rnd.nextInt(500)))
      val df = rows.toDF("stratum", "id", "w")
      def sample(k: Int) = CorpusAssembly
        .weightedSampleNoReplacement(df, "stratum", "id", "w", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSet
      val small = sample(5)
      val big = sample(9)
      // every (stratum, rk<=5, id) of the k=9 sample IS the k=5 sample
      assert(big.filter(_._2 <= 5) === small, s"seed=$seed")
    }
  }

  test("rrfFuse score is monotone under rank improvement") {
    val b = Seq(("q", 20L, 1L), ("q", 21L, 2L)).toDF("term", "doc_id", "rnk")
    def scoreAt(rnk: Long): Long = {
      val a = Seq(("q", 10L, rnk)).toDF("term", "doc_id", "rnk")
      Relevance.rrfFuse(a, b, "term", "doc_id", k = 10)
        .filter(col("doc_id") === 10L).head().getLong(2)
    }
    val scores = (1L to 6L).map(scoreAt)
    assert(scores === scores.sorted.reverse, scores.toString)
    assert(scores.distinct.size === scores.size)
  }

  test("containment is bounded by 1000 and directed from the small side " +
      "(10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
      val docs = (1 to 12).map { i =>
        (i.toLong, Seq.fill(6 + rnd.nextInt(20))(
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = TextDedup.containmentJoin(docs.toDF("doc_id", "text"),
          "doc_id", "text", tauPm = 700, shingleN = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(5)))
      got.foreach { case (a, bId, sa, sb, pm) =>
        assert(pm >= 700L && pm <= 1000L, s"seed=$seed pair=($a,$bId)")
        assert(a !== bId)
      }
    }
  }

  test("groupSplit partitions rows exactly: no loss, no duplication " +
      "(10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed)
      val rows = (1 to 200).map(i => (rnd.nextInt(40).toLong, i.toLong))
      val df = rows.toDF("user", "row_id")
      val out = CorpusAssembly.groupSplit(df, "user",
        Seq(("train", 700000L), ("val", 200000L), ("test", 100000L)))
      assert(out.count() === 200L)
      assert(out.select("row_id").distinct().count() === 200L)
      assert(out.filter(col("split").isNull).count() === 0L)
    }
  }

  test("centroidDrift is invariant under replicating every vector") {
    val rnd = new Random(3)
    val vecs = (1 to 30).map(i =>
      ((i % 3).toLong, Array.fill(4)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("label", "embedding")
    val doubled = vecs.flatMap(v => Seq(v, v)).toDF("label", "embedding")
    def drift(d: org.apache.spark.sql.DataFrame) =
      VectorSearch.centroidDrift(d, "label", "embedding")
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
    assert(drift(doubled) === drift(df))
  }
}
