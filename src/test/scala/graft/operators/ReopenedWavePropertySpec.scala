package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Algebraic invariants of the round-11 reopened wave (q209–q225), on
 * randomized frames — properties that hold by the operators'
 * DEFINITIONS, so a violation is a bug even when the oracle fixture
 * passes:
 *  - AUC is invariant under strictly increasing affine score maps
 *    (ranks don't move) and label-ANTIsymmetric (flip y: a ↦ 1−a up
 *    to the shared floor);
 *  - PSI is slice-symmetric ((p−q) and log(p/q) negate together, so
 *    every term — and the exclusion bookkeeping — mirrors);
 *  - Welch t is group-antisymmetric (swap A/B: D negates, E is
 *    symmetric, the radicand is identical);
 *  - Adamic–Adar is edge-multiplicity-invariant (duplicate edges
 *    change nothing: the generation is over DISTINCT edges) and
 *    inert to degree-1 right nodes;
 *  - prAtK with the full candidate set as truth reads P = R = AP = 1;
 *  - mixturePlan under an uncapped budget plans exactly the floor
 *    targets, and planned never exceeds availability anywhere;
 *  - hapaxProfile counts are a partition: hapax + dis ≤ vocab and
 *    N ≥ V always; duplicating the corpus doubles N and dis-es the
 *    hapaxes (every count doubles: freq-1 types become freq-2).
 */
class ReopenedWavePropertySpec extends SparkSuite {
  import spark.implicits._

  test("aucRoc: invariant under increasing affine score maps; label " +
      "flip mirrors around 1/2 within floor slack") {
    for (seed <- 1 to 5) {
      val rnd = new Random(900 + seed)
      val rows = (1 to 60 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), rnd.nextInt(9).toLong,
          if (rnd.nextBoolean()) 1L else 0L)
      }
      def auc(f: Seq[(String, Long, Long)]) =
        StatsOps.aucRoc(f.toDF("cell", "s", "y"), "cell", "s", "y")
          .collect().map(r => r.getString(0) ->
            Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val base = auc(rows)
      val affine = auc(rows.map { case (c, s, y) => (c, 7 * s + 3, y) })
      assert(affine === base, s"seed=$seed affine")
      val flipped = auc(rows.map { case (c, s, y) => (c, s, 1 - y) })
      for ((c, a) <- base; if a.isDefined) {
        val sum = a.get + flipped(c).get
        assert(sum >= 999998L && sum <= 1000000L, s"seed=$seed flip $sum")
      }
    }
  }

  test("psiDrift: slice-symmetric including the exclusion bookkeeping") {
    for (seed <- 1 to 5) {
      val rnd = new Random(950 + seed)
      val rows = (1 to 60 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(6).toLong)
      }
      def psi(a: String, b: String) =
        StatsOps.psiDrift(rows.toDF("cell", "sl", "bin"), "cell", "sl",
            a, b, "bin")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(3), r.getLong(4),
              Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
      val ab = psi("A", "B"); val ba = psi("B", "A")
      // psi value, bin count, and exclusion count all mirror exactly
      assert(ab.view.mapValues(v => (v._1, v._2, v._3)).toMap ===
        ba.view.mapValues(v => (v._1, v._2, v._3)).toMap, s"seed=$seed")
    }
  }

  test("welchT: group swap negates t exactly") {
    for (seed <- 1 to 5) {
      val rnd = new Random(970 + seed)
      val rows = (1 to 50 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), if (rnd.nextBoolean()) "A" else "B",
          rnd.nextInt(30).toLong)
      }
      def t(a: String, b: String) =
        StatsOps.welchT(rows.toDF("cell", "grp", "v"), "cell", "grp",
            a, b, "v")
          .collect().map(r => r.getString(0) ->
            Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val ab = t("A", "B"); val ba = t("B", "A")
      for ((c, v) <- ab)
        assert(v.map(-_) === ba(c), s"seed=$seed cell=$c")
    }
  }

  test("adamicAdar: duplicate edges and degree-1 right nodes change " +
      "nothing") {
    val rnd = new Random(990)
    val edges = (1 to 120).map { _ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(12).toLong)
    }
    def aa(f: Seq[(Long, Long)]) =
      GraphOps.adamicAdar(f.toDF("u", "p"), "u", "p", 100, 64L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    val base = aa(edges)
    assert(aa(edges ++ edges.take(40)) === base, "duplicated edges")
    // fresh degree-1 parts attached to existing suppliers: inert
    val deg1 = (1 to 8).map(u => (u.toLong, 1000L + u))
    assert(aa(edges ++ deg1) === base, "degree-1 parts")
  }

  test("prAtK: the full candidate set as truth reads exactly 1e6 " +
      "across the board") {
    val ranked = (1 to 10).map(i => ("q", i.toLong, i.toLong))
    val got = Relevance.prAtK(ranked.toDF("q", "doc", "rnk"),
        ranked.map(r => (r._1, r._2)).toDF("q", "doc"), "q", "doc", 10)
      .head()
    assert(got.getLong(4) === 1000000L)
    assert(got.getLong(5) === 1000000L && got.getLong(6) === 1000000L)
  }

  test("mixturePlan: an uncapped budget plans the floor targets; " +
      "planned never exceeds availability") {
    for (seed <- 1 to 5) {
      val rnd = new Random(995 + seed)
      val rows = (1 to 6 + rnd.nextInt(6)).map { i =>
        (s"s$i", 100L + rnd.nextInt(500), 1L + rnd.nextInt(4))
      }
      val out = CorpusAssembly.mixturePlan(rows.toDF("src", "av", "w"),
          "src", "av", "w", 1, 10) // tiny budget: nothing caps
        .collect()
      val ws = rows.map(_._3).sum
      val t = rows.map(_._2).sum / 10
      for (r <- out) {
        val (av, tgt, planned) = (r.getLong(2), r.getLong(3), r.getLong(6))
        assert(planned <= av, s"seed=$seed planned>avail")
        assert(tgt === t * r.getLong(1) / ws, s"seed=$seed target")
        if (!r.getBoolean(4)) assert(planned >= tgt, s"seed=$seed floor")
      }
    }
  }

  test("hapaxProfile: spectrum identities hold; corpus duplication " +
      "turns every hapax into a dis legomenon") {
    val rnd = new Random(999)
    val docs = (1 to 12).map { i =>
      ("g", (1 to 6 + rnd.nextInt(8))
        .map(_ => s"w${rnd.nextInt(25)}").mkString(" "))
    }
    def prof(f: Seq[(String, String)]) =
      TextAnalysis.hapaxProfile(f.toDF("g", "text"), "g", "text")
        .head()
    val p = prof(docs)
    assert(p.getLong(3) + p.getLong(4) <= p.getLong(2))
    assert(p.getLong(1) >= p.getLong(2))
    val d = prof(docs ++ docs)
    assert(d.getLong(1) === 2 * p.getLong(1)) // tokens double
    assert(d.getLong(2) === p.getLong(2))     // vocabulary unchanged
    assert(d.getLong(3) === 0L)               // no frequency-1 remains
    assert(d.getLong(4) === p.getLong(3))     // old hapaxes are now dis
  }
}
