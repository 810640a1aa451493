package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Algebraic invariants of the round-11 operator wave, on randomized
 * frames — properties that hold by the operators' DEFINITIONS, so a
 * violation is a bug even when the oracle fixture passes:
 *  - Mann–Whitney U is group-ANTIsymmetric (swap A/B: 2U ↦ 2n₁n₂−2U,
 *    z flips sign exactly — the tie term is shared);
 *  - KS is group-symmetric (|F_A − F_B| doesn't care which is which);
 *  - JS divergence is slice-symmetric (its two KL terms swap);
 *  - Spearman ρ and Kendall τ-b are invariant under strictly
 *    increasing affine maps of either column (ranks don't move);
 *  - mutual information is argument-symmetric with H(x)/H(y)
 *    swapping, and bounded by each marginal entropy (+lattice slack);
 *  - RBO is ranker-symmetric (max(ra,rb) is);
 *  - MAD is translation-EQUIVARIANT in the median and INVARIANT in
 *    spread (mad and std don't move under v ↦ v+c);
 *  - cdcChunks is position-independent: a document's chunks depend
 *    only on its own text, never on what else is in the corpus;
 *  - markovStationary is label-equivariant (renaming states renames
 *    outputs, bit-for-bit).
 */
class Round11PropertySpec extends SparkSuite {
  import spark.implicits._

  private def randFrame(seed: Int, vals: Int = 8) = {
    val rnd = new Random(seed)
    (1 to 60 + rnd.nextInt(80)).map { _ =>
      ("c" + rnd.nextInt(2),
        if (rnd.nextBoolean()) "A" else "B",
        rnd.nextInt(vals).toLong)
    }
  }

  test("mannWhitneyU group-antisymmetry: swap A/B flips z, reflects 2U " +
      "(10 seeds)") {
    for (seed <- 1 to 10) {
      val df = randFrame(seed).toDF("cell", "grp", "v")
      def run(a: String, b: String) =
        StatsOps.mannWhitneyU(df, "cell", "grp", a, b, "v")
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
              Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
      val ab = run("A", "B"); val ba = run("B", "A")
      ab.keys.foreach { c =>
        val (na, nb, twoU, tie, z) = ab(c)
        val (nb2, na2, twoU2, tie2, z2) = ba(c)
        assert(na == na2 && nb == nb2 && tie == tie2)
        assert(twoU2 == 2 * na * nb - twoU, s"$c seed=$seed")
        assert(z.map(-_) == z2, s"$c seed=$seed")
      }
    }
  }

  test("ksTest group-symmetry: d_ppm and v_at_max identical under " +
      "A/B swap (10 seeds)") {
    for (seed <- 1 to 10) {
      val df = randFrame(seed + 50).toDF("cell", "grp", "v")
      def run(a: String, b: String) =
        StatsOps.ksTest(df, "cell", "grp", a, b, "v")
          .collect().map(r => r.getString(0) ->
            ((Option(r.get(3)), Option(r.get(4))))).toMap
      assert(run("A", "B") === run("B", "A"), s"seed=$seed")
    }
  }

  test("jsDivergence slice-symmetry (10 seeds)") {
    for (seed <- 1 to 10) {
      val df = randFrame(seed + 100, 5)
        .map { case (c, g, v) => (c, g, "k" + v) }.toDF("cell", "grp", "k")
      def run(a: String, b: String) =
        StatsOps.jsDivergence(df, "cell", "grp", a, b, "k")
          .collect().map(r => r.getString(0) ->
            Option(r.get(4)).map(_.asInstanceOf[Long])).toMap
      assert(run("A", "B") === run("B", "A"), s"seed=$seed")
    }
  }

  test("spearmanRho and kendallTauB invariant under strictly " +
      "increasing affine maps of either column (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed + 200)
      val rows = (1 to 40 + rnd.nextInt(60)).map { _ =>
        ("g", rnd.nextInt(6).toLong, rnd.nextInt(5).toLong)
      }
      val base = rows.toDF("cell", "x", "y")
      val mapped = rows.map { case (c, x, y) => (c, 7 * x + 3, 2 * y + 11) }
        .toDF("cell", "x", "y")
      def rho(df: org.apache.spark.sql.DataFrame) =
        StatsOps.spearmanRho(df, "cell", "x", "y").collect()
          .map(r => Option(r.get(2))).toSeq
      def tau(df: org.apache.spark.sql.DataFrame) =
        StatsOps.kendallTauB(df, "cell", "x", "y").collect()
          .map(r => Option(r.get(4))).toSeq
      assert(rho(base) === rho(mapped), s"rho seed=$seed")
      assert(tau(base) === tau(mapped), s"tau seed=$seed")
    }
  }

  test("mutualInformation argument-symmetry with swapped entropies; " +
      "MI bounded by min marginal entropy + lattice slack (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed + 300)
      val rows = (1 to 60 + rnd.nextInt(80)).map { _ =>
        ("g", rnd.nextInt(4).toString, rnd.nextInt(3).toString)
      }
      val xy = StatsOps.mutualInformation(
        rows.toDF("cell", "x", "y"), "cell", "x", "y").head()
      val yx = StatsOps.mutualInformation(
        rows.map { case (c, x, y) => (c, y, x) }.toDF("cell", "x", "y"),
        "cell", "x", "y").head()
      assert(xy.getLong(3) === yx.getLong(3), s"mi seed=$seed")
      assert(xy.getLong(4) === yx.getLong(5) &&
        xy.getLong(5) === yx.getLong(4), s"h seed=$seed")
      assert(xy.getLong(3) <=
        math.min(xy.getLong(4), xy.getLong(5)) + xy.getLong(2) * 4)
    }
  }

  test("rboOverlap ranker-symmetry (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed + 400)
      def mk() = rnd.shuffle((1L to 20L).toList).take(10)
        .zipWithIndex.map { case (d, i) => ("q", d, i + 1L) }
      val a = mk(); val b = mk()
      def run(x: Seq[(String, Long, Long)], y: Seq[(String, Long, Long)]) =
        Relevance.rboOverlap(x.toDF("q", "doc", "rnk"),
          y.toDF("q", "doc", "rnk"), "q", "doc", 10)
          .head().getLong(4)
      assert(run(a, b) === run(b, a), s"seed=$seed")
    }
  }

  test("madScale translation: v+c shifts med by c, fixes mad and std " +
      "(10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(seed + 500)
      val rows = (1 to 30 + rnd.nextInt(60)).map(_ =>
        ("g", rnd.nextInt(40).toLong))
      def run(shift: Long) =
        StatsOps.madScale(rows.map { case (c, v) => (c, v + shift) }
          .toDF("cell", "v"), "cell", "v").head()
      val base = run(0L); val moved = run(137L)
      assert(moved.getLong(2) === base.getLong(2) + 137L)
      assert(moved.getLong(3) === base.getLong(3))
      assert(moved.getLong(4) === base.getLong(4), s"seed=$seed")
    }
  }

  test("cdcChunks position-independence: a doc's chunks are identical " +
      "whether it stands alone or inside a corpus (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed + 600)
      val vocab = Vector("aa", "bb", "cc", "dd", "ee")
      def doc(n: Int) =
        Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val target = doc(50)
      val corpus = Seq((1L, target)) ++
        (2L to 8L).map(i => (i, doc(10 + rnd.nextInt(60))))
      def chunksOf(docs: Seq[(Long, String)]) =
        TextDedup.cdcChunks(docs.toDF("doc_id", "text"),
          "doc_id", "text", 3, 4, 2)
          .filter(col("doc_id") === 1L)
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1).toSeq
      assert(chunksOf(Seq((1L, target))) === chunksOf(corpus),
        s"seed=$seed")
    }
  }

  test("markovStationary label-equivariance: renaming states renames " +
      "outputs bit-for-bit (5 seeds)") {
    for (seed <- 1 to 5) {
      // 4 states: 1e6 % 4 = 0, so the pi0 largest-remainder term is
      // zero and equivariance is EXACT (with a remainder, the +1 ppm
      // lands by lexicographic rank, which renaming reorders)
      val rnd = new Random(seed + 700)
      val states = Vector("a", "b", "c", "d")
      val rows = (0 until 120).map(i =>
        ((i % 3).toLong, i.toLong, i.toLong, states(rnd.nextInt(4))))
      val ren = Map("a" -> "zz", "b" -> "mm", "c" -> "qq", "d" -> "ee")
      def run(rs: Seq[(Long, Long, Long, String)]) =
        StatsOps.markovStationary(rs.toDF("u", "t", "tie", "state"),
          "u", "t", "tie", "state", 8)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val base = run(rows)
      val renamed = run(rows.map { case (u, t, k, s) => (u, t, k, ren(s)) })
      base.foreach { case (s, v) =>
        assert(renamed(ren(s)) === v, s"state $s seed=$seed")
      }
    }
  }
}
