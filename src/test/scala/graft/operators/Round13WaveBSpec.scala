package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand lattices, guard paths and seeded properties for the second
 * round-13 wave: BH-FDR (q253), r×c χ²+Cramér's V (q254), isotonic
 * PAV calibration (q255), Brier decomposition (q256) and the
 * stupid-backoff trigram scorer (q257). Every expected number below is
 * computed by hand from the operator's defining lattice — the specs
 * pin the semantics, the registry oracles pin the cross-engine match.
 */
class Round13WaveBSpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // bhFdr
  // ------------------------------------------------------------------

  test("bhFdr: textbook step-up at alpha=5% — k* is the LAST passing " +
      "rank, so a failing middle rank is still discovered") {
    // thresholds alpha*i/m: 16666, 33333, 50000 ppm
    // flags: 9000 T, 39000 F, 41000 T -> kstar = 3 -> ALL discovered
    val t = Seq(("f", "t1", 9000L), ("f", "t2", 39000L),
      ("f", "t3", 41000L)).toDF("fam", "test", "p")
    val r = StatsOps.bhFdr(t, "fam", "test", "p", 50000L)
      .orderBy("rnk").collect()
    assert(r.map(_.getAs[Int]("discovery")).toSeq === Seq(1, 1, 1))
    // p_adj = reverse running min of floor(p*m/i): raw (27000, 58500,
    // 41000) -> adj (27000, 41000, 41000)
    assert(r.map(_.getAs[Long]("p_adj_ppm")).toSeq ===
      Seq(27000L, 41000L, 41000L))
  }

  test("bhFdr: boundary ranks discover exactly 1..k*; the null family " +
      "discovers nothing; families are independent") {
    val t = Seq(
      ("a", "t1", 1000L), ("a", "t2", 15000L), ("a", "t3", 29000L),
      ("a", "t4", 45000L), ("a", "t5", 900000L),
      ("b", "u1", 600000L), ("b", "u2", 700000L))
      .toDF("fam", "test", "p")
    val r = StatsOps.bhFdr(t, "fam", "test", "p", 50000L)
    // family a: thresholds 10000,20000,30000,40000,50000 ->
    // T,T,T,F,F -> kstar=3
    val a = r.filter(col("cell") === "a").orderBy("rnk").collect()
    assert(a.map(_.getAs[Int]("discovery")).toSeq === Seq(1, 1, 1, 0, 0))
    assert(a.map(_.getAs[Long]("m")).toSeq.forall(_ === 5L))
    val b = r.filter(col("cell") === "b").orderBy("rnk").collect()
    assert(b.map(_.getAs[Int]("discovery")).toSeq === Seq(0, 0))
  }

  test("bhFdr: p_adj is monotone non-decreasing in rank and capped " +
      "at 1e6 (seeded)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(13200 + seed)
      val t = (1 to 40).map(i =>
        ("f", s"t$i", rnd.nextInt(1000000).toLong)).toDF("fam", "test", "p")
      val adj = StatsOps.bhFdr(t, "fam", "test", "p", 50000L)
        .orderBy("rnk").collect().map(_.getAs[Long]("p_adj_ppm"))
      assert(adj.zip(adj.tail).forall { case (x, y) => x <= y })
      assert(adj.forall(a => a >= 0L && a <= 1000000L))
    }
  }

  // ------------------------------------------------------------------
  // chiSquareIndependence
  // ------------------------------------------------------------------

  test("chiSquareIndependence: perfect 2x2 association reads " +
      "chi2 = N (V = 1); uniform independence reads exactly 0") {
    val perfect = (Seq.fill(50)(("p", "x1", "y1")) ++
      Seq.fill(50)(("p", "x2", "y2"))).toDF("cell", "x", "y")
    val rp = StatsOps.chiSquareIndependence(perfect, "cell", "x", "y")
      .head()
    assert(rp.getAs[Long]("chi2_milli") === 100000L)
    assert(rp.getAs[Long]("v_milli") === 1000L)
    assert(rp.getAs[Long]("dof") === 1L)
    val indep = (Seq.fill(25)(("i", "x1", "y1")) ++
      Seq.fill(25)(("i", "x1", "y2")) ++
      Seq.fill(25)(("i", "x2", "y1")) ++
      Seq.fill(25)(("i", "x2", "y2"))).toDF("cell", "x", "y")
    val ri = StatsOps.chiSquareIndependence(indep, "cell", "x", "y")
      .head()
    assert(ri.getAs[Long]("chi2_milli") === 0L)
    assert(ri.getAs[Long]("v_milli") === 0L)
  }

  test("chiSquareIndependence: single-level cells emit dof = 0 and " +
      "null V; r and c count observed levels") {
    val one = Seq.fill(10)(("s", "only", "y1")).toDF("cell", "x", "y")
    val r = StatsOps.chiSquareIndependence(one, "cell", "x", "y").head()
    assert(r.getAs[Long]("dof") === 0L)
    assert(r.isNullAt(r.fieldIndex("v_milli")))
    val rect = (Seq.fill(4)(("r", "x1", "y1")) ++
      Seq.fill(4)(("r", "x2", "y2")) ++
      Seq.fill(4)(("r", "x3", "y3"))).toDF("cell", "x", "y")
    val rr = StatsOps.chiSquareIndependence(rect, "cell", "x", "y")
      .head()
    assert(rr.getAs[Long]("r") === 3L && rr.getAs[Long]("c") === 3L &&
      rr.getAs[Long]("dof") === 4L)
  }

  test("chiSquareIndependence: seeded differential vs a naive dense " +
      "BigInt replay of the per-term milli lattice") {
    for (seed <- 1 to 5) {
      val rnd = new Random(13254 + seed)
      val rows = (1 to 300).map { _ =>
        ("c", s"x${rnd.nextInt(4)}", s"y${rnd.nextInt(3)}")
      }
      val got = StatsOps.chiSquareIndependence(
        rows.toDF("cell", "x", "y"), "cell", "x", "y").head()
      val o = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = rows.size.toLong
      val rt = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ct = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val termSum = o.map { case ((_, x, y), c) =>
        (BigInt(1000) * n * c * c) / (BigInt(rt(x)) * ct(y))
      }.sum
      val chi2 = (termSum - BigInt(1000) * n).max(BigInt(0)).toLong
      assert(got.getAs[Long]("chi2_milli") === chi2, s"seed $seed")
      val d = math.min(rt.size, ct.size) - 1L
      val rad = (1000L * chi2) / (n * d)
      assert(got.getAs[Long]("v_milli") ===
        math.floor(math.sqrt(rad.toDouble)).toLong, s"seed $seed")
    }
  }

  // ------------------------------------------------------------------
  // isotonicCalibration
  // ------------------------------------------------------------------

  test("isotonicCalibration: the textbook dip pools — [0.8, 0.2, 0.5] " +
      "with equal weights fits [0.5, 0.5, 0.5]") {
    val rows = (Seq.fill(8)(("c", 1L, 1L)) ++ Seq.fill(2)(("c", 1L, 0L)) ++
      Seq.fill(2)(("c", 2L, 1L)) ++ Seq.fill(8)(("c", 2L, 0L)) ++
      Seq.fill(5)(("c", 3L, 1L)) ++ Seq.fill(5)(("c", 3L, 0L)))
      .toDF("cell", "bin", "y")
    val r = StatsOps.isotonicCalibration(rows, "cell", "bin", "y")
      .orderBy("bin").collect()
    assert(r.map(_.getAs[Long]("raw_ppm")).toSeq ===
      Seq(800000L, 200000L, 500000L))
    assert(r.map(_.getAs[Long]("fitted_ppm")).toSeq ===
      Seq(500000L, 500000L, 500000L))
  }

  test("isotonicCalibration: an already-monotone curve is a fixed " +
      "point (fitted = raw on the ppm lattice)") {
    val rows = (Seq.fill(1)(("c", 1L, 1L)) ++ Seq.fill(9)(("c", 1L, 0L)) ++
      Seq.fill(4)(("c", 2L, 1L)) ++ Seq.fill(6)(("c", 2L, 0L)) ++
      Seq.fill(9)(("c", 3L, 1L)) ++ Seq.fill(1)(("c", 3L, 0L)))
      .toDF("cell", "bin", "y")
    val r = StatsOps.isotonicCalibration(rows, "cell", "bin", "y")
      .orderBy("bin").collect()
    assert(r.map(x => x.getAs[Long]("fitted_ppm")).toSeq ===
      r.map(x => x.getAs[Long]("raw_ppm")).toSeq)
  }

  test("isotonicCalibration: fitted is non-decreasing per cell and " +
      "bounded by the raw extremes (seeded); the bin guard trips loud") {
    for (seed <- 1 to 5) {
      val rnd = new Random(13255 + seed)
      val rows = (1 to 500).map { _ =>
        val bin = rnd.nextInt(12).toLong
        ("c", bin, if (rnd.nextInt(1000) < 80 * (bin % 5) + 50) 1L else 0L)
      }.toDF("cell", "bin", "y")
      val r = StatsOps.isotonicCalibration(rows, "cell", "bin", "y")
        .orderBy("bin").collect()
      val fit = r.map(_.getAs[Long]("fitted_ppm"))
      assert(fit.zip(fit.tail).forall { case (a, b) => a <= b },
        s"seed $seed: ${fit.toSeq}")
      val raw = r.map(_.getAs[Long]("raw_ppm"))
      assert(fit.head >= raw.min - 1 && fit.last <= raw.max,
        s"seed $seed")
    }
    val wide = (1 to 300).map(i => ("c", i.toLong, 0L))
      .toDF("cell", "bin", "y")
    val e = intercept[IllegalArgumentException] {
      StatsOps.isotonicCalibration(wide, "cell", "bin", "y")
    }
    assert(e.getMessage.contains("maxBins"), e.getMessage)
  }

  // ------------------------------------------------------------------
  // brierDecomposition
  // ------------------------------------------------------------------

  test("brierDecomposition: a perfectly calibrated single bin reads " +
      "REL = 0, RES = 0, UNC = p(1-p); the Murphy identity column " +
      "sums the three") {
    val rows = (Seq.fill(5)(("c", 1L, 500000L, 1L)) ++
      Seq.fill(5)(("c", 1L, 500000L, 0L))).toDF("cell", "bin", "p", "y")
    val r = StatsOps.brierDecomposition(rows, "cell", "bin", "p", "y")
      .head()
    assert(r.getAs[Long]("rel_ppm_sq") === 0L)
    assert(r.getAs[Long]("res_ppm_sq") === 0L)
    assert(r.getAs[Long]("unc_ppm_sq") === 250000000000L)
    assert(r.getAs[Long]("brier_ppm_sq") === 250000000000L)
  }

  test("brierDecomposition: a confident wrong forecast is pure REL — " +
      "p=0.9 stated on an all-negative bin beside an all-positive " +
      "p=0.1 bin") {
    val rows = (Seq.fill(10)(("c", 1L, 900000L, 0L)) ++
      Seq.fill(10)(("c", 2L, 100000L, 1L))).toDF("cell", "bin", "p", "y")
    val r = StatsOps.brierDecomposition(rows, "cell", "bin", "p", "y")
      .head()
    // per bin: (p - o)^2 = 0.81 both sides -> REL = 0.81 in ppm^2
    assert(r.getAs[Long]("rel_ppm_sq") === 810000000000L)
    // o_b = 0 and 1 around base 0.5 -> RES = 0.25
    assert(r.getAs[Long]("res_ppm_sq") === 250000000000L)
    assert(r.getAs[Long]("unc_ppm_sq") === 250000000000L)
    assert(r.getAs[Long]("brier_ppm_sq") === 810000000000L)
  }

  // ------------------------------------------------------------------
  // trainBackoffLm / backoffScore
  // ------------------------------------------------------------------

  private def tinyLm() = {
    val docs = Seq((1L, "a b c a b c"), (2L, "a b d"))
      .toDF("doc_id", "text")
    val lm = TextAnalysis.trainBackoffLm(docs, "text", 2, 2, 3)
    (docs, lm)
  }

  test("trainBackoffLm: level tables cut at K by (cnt desc, gram asc) " +
      "with the level-0 total row") {
    val (_, lm) = tinyLm()
    val rows = lm.collect().map(r =>
      (r.getAs[Int]("level"), r.getAs[String]("g"), r.getAs[Long]("cnt")))
    assert(rows.filter(_._1 == 3).toSet ===
      Set((3, "a b c", 2L), (3, "a b d", 1L)))
    assert(rows.filter(_._1 == 2).toSet ===
      Set((2, "a b", 3L), (2, "b c", 2L)))
    assert(rows.filter(_._1 == 1).toSet ===
      Set((1, "a", 3L), (1, "b", 3L), (1, "c", 2L)))
    assert(rows.filter(_._1 == 0).toSeq === Seq((0, "", 9L)))
  }

  test("backoffScore: every rule branch lands its hand-computed ppm — " +
      "trigram hit, bigram backoff (2/5), unigram backoff (4/25), " +
      "unseen zero") {
    val (docs, lm) = tinyLm()
    val scored = TextAnalysis.backoffScore(docs, "doc_id", "text", lm)
      .orderBy("doc").collect()
    // doc 1 "a b c a b c": (a b c) rule3 1e6*2/3 = 666666 twice;
    // (b c a): g3 miss, "c a" not in lm2 -> rule1 on 'a': 4e6*3/225 =
    // 53333; (c a b): "a b" in lm2 and 'a' in lm1 -> rule2:
    // 2e6*3/(5*3) = 400000. mean = 1786665 div 4 = 446666.
    val d1 = scored(0)
    assert(d1.getAs[Long]("n_tri") === 4L)
    assert(d1.getAs[Long]("mean_score_ppm") === 446666L)
    assert((d1.getAs[Long]("n_rule3"), d1.getAs[Long]("n_rule2"),
      d1.getAs[Long]("n_rule1"), d1.getAs[Long]("n_unseen")) ===
      ((2L, 1L, 1L, 0L)))
    // doc 2 "a b d": one trigram, in lm3 with context "a b" ->
    // 1e6*1/3 = 333333
    val d2 = scored(1)
    assert(d2.getAs[Long]("n_tri") === 1L)
    assert(d2.getAs[Long]("mean_score_ppm") === 333333L)
    assert(d2.getAs[Long]("n_rule3") === 1L)
  }

  test("backoffScore: fully unseen text scores 0 with the whole mass " +
      "on n_unseen; <3-token docs emit no row") {
    val (_, lm) = tinyLm()
    val docs = Seq((1L, "x y z w"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.backoffScore(docs, "doc_id", "text", lm)
      .collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("doc") === 1L)
    assert(r(0).getAs[Long]("mean_score_ppm") === 0L)
    assert(r(0).getAs[Long]("n_unseen") === 2L)
  }
}
