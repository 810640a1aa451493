package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Guard paths and naive-reference differentials for the round-13
 * stats/privacy wave (the operators stranded as drafts in the r12
 * snapshot, now landed properly): Mann–Kendall trend, Nelson–Aalen
 * cumulative hazard, Benford per-cell profile, t-closeness, per-cell
 * Gini. Each operator gets (a) its loud-failure contract cases and
 * (b) a seeded differential against a naive Scala+BigInt replay of
 * the defining lattice — the r10 DifferentialFuzzSpec pattern that
 * keeps catching the classes fixtures can't.
 */
class Round13PropertySpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // Mann–Kendall
  // ------------------------------------------------------------------

  test("mannKendall: duplicated time points trip the loud probe; " +
      "aggregated times pass") {
    val dup = Seq(("c", 1L, 5L), ("c", 1L, 7L), ("c", 2L, 6L))
      .toDF("cell", "t", "v")
    val e = intercept[IllegalArgumentException] {
      StatsOps.mannKendall(dup, "cell", "t", "v")
    }
    assert(e.getMessage.contains("unique"), e.getMessage)
    val ok = Seq(("c", 1L, 5L), ("c", 2L, 7L), ("c", 3L, 6L))
      .toDF("cell", "t", "v")
    assert(StatsOps.mannKendall(ok, "cell", "t", "v").count() === 1L)
  }

  test("mannKendall: strictly increasing series maxes S at n(n-1)/2; " +
      "constant series (all tied) nulls via den = 0; S = 0 reads " +
      "exactly 0") {
    val inc = (1 to 12).map(i => ("up", i.toLong, i * 3L))
      .toDF("cell", "t", "v")
    val r = StatsOps.mannKendall(inc, "cell", "t", "v").head()
    assert(r.getLong(2) === 66L) // 12*11/2
    val const = (1 to 8).map(i => ("k", i.toLong, 9L)).toDF("cell", "t", "v")
    assert(StatsOps.mannKendall(const, "cell", "t", "v").head().isNullAt(3))
    // antisymmetric pair: v = (1,2) then (2,1) over 2 cells → per-cell
    // S = ±1; combined two-step up-down with equal counts gives S = 0
    val zero = Seq(("z", 1L, 5L), ("z", 2L, 8L), ("z", 3L, 5L))
      .toDF("cell", "t", "v")
    val rz = StatsOps.mannKendall(zero, "cell", "t", "v").head()
    assert(rz.getLong(2) === 0L && rz.getLong(3) === 0L)
  }

  test("mannKendall: seeded differential vs the naive pairwise " +
      "BigInt lattice") {
    for (seed <- 1 to 10) {
      val rnd = new Random(1300 + seed)
      val rows = for {
        c <- Seq("a", "b")
        t <- 1 to (10 + rnd.nextInt(20))
      } yield (c, t.toLong, rnd.nextInt(6).toLong)
      val got = StatsOps.mannKendall(rows.toDF("cell", "t", "v"),
          "cell", "t", "v").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val v = rs.sortBy(_._2).map(_._3).toIndexedSeq
        val n = v.size
        var s = BigInt(0)
        for (i <- 0 until n; j <- i + 1 until n)
          s += (v(j) - v(i)).sign
        val tcub = v.groupBy(identity).values
          .map(g => BigInt(g.size) * (g.size - 1) * (2 * g.size + 5)).sum
        val den = BigInt(n) * (n - 1) * (2 * n + 5) - tcub
        val z =
          if (den <= 0) None
          else if (s == 0) Some(0L)
          else {
            val rad = BigInt(18000000) * (s.abs - 1) * (s.abs - 1) / den
            if (rad < BigInt(2).pow(53))
              Some(s.signum * math.floor(math.sqrt(rad.toDouble)).toLong)
            else None
          }
        c -> ((n.toLong, s.toLong, z))
      }
      assert(got === want, s"seed $seed")
    }
  }

  // ------------------------------------------------------------------
  // Nelson–Aalen
  // ------------------------------------------------------------------

  test("nelsonAalen: censored-only durations feed the risk set but " +
      "never emit a row; the lattice is sum-of-floors") {
    // t=1: 2 events of 5 at risk  → inc = 400000
    // t=2: censored only          → no row, but was in t=1's risk set
    // t=3: 1 event of 2 at risk   → inc = 500000, cum = 900000
    val subj = Seq(("c", 1L, 1L), ("c", 1L, 1L), ("c", 1L, 0L),
      ("c", 2L, 0L), ("c", 3L, 1L), ("c", 3L, 0L))
      .toDF("cell", "dur", "ev")
    val rows = StatsOps.nelsonAalen(subj, "cell", "dur", "ev")
      .orderBy("t").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 3L))
    assert(rows.map(_.getLong(2)).toSeq === Seq(6L, 2L)) // risk sets
    assert(rows.map(_.getLong(4)).toSeq === Seq(333333L, 500000L))
    assert(rows.map(_.getLong(5)).toSeq === Seq(333333L, 833333L))
  }

  test("nelsonAalen: seeded differential vs a naive suffix-sum replay") {
    for (seed <- 1 to 10) {
      val rnd = new Random(4200 + seed)
      val subj = (1 to 60 + rnd.nextInt(60)).map { _ =>
        ("c" + rnd.nextInt(2), (1 + rnd.nextInt(8)).toLong,
          rnd.nextInt(2).toLong)
      }
      val got = StatsOps.nelsonAalen(subj.toDF("cell", "dur", "ev"),
          "cell", "dur", "ev")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
        .toMap
      val want = subj.groupBy(_._1).flatMap { case (c, rs) =>
        val byT = rs.groupBy(_._2).view
          .mapValues(g => (g.size.toLong, g.map(_._3).sum)).toMap
        val ts = byT.keys.toSeq.sorted
        var cum = 0L
        ts.flatMap { t =>
          val risk = ts.filter(_ >= t).map(byT(_)._1).sum
          val d = byT(t)._2
          val inc = 1000000L * d / risk
          if (d > 0) { cum += inc; Some((c, t) -> ((risk, d, inc, cum))) }
          else None
        }
      }
      assert(got === want, s"seed $seed")
    }
  }

  // ------------------------------------------------------------------
  // Benford profile
  // ------------------------------------------------------------------

  test("benfordProfile: all 9 digits emit per cell (absent digit = " +
      "0-count row at full expected deviation); nonpositive and null " +
      "values drop; obs_ppm floors to the cell total") {
    val df = Seq(("a", 11L), ("a", 12L), ("a", 95L), ("a", 0L),
      ("a", -7L), ("b", 21L)).toDF("cell", "v")
    val rows = QualityAudit.benfordProfile(df, "cell", "v")
      .orderBy("cell", "digit").collect()
    assert(rows.length === 18)
    val a = rows.filter(_.getString(0) == "a")
    assert(a.map(_.getInt(1)).toSeq === (1 to 9))
    assert(a.map(_.getLong(3)).toSeq ===
      Seq(2L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // digit 1: floor(2e6/3) = 666666; digit 9: floor(1e6/3) = 333333
    assert(a.head.getLong(4) === 666666L)
    assert(a(8).getLong(4) === 333333L)
    // absent digit 2 deviates by exactly the expected constant
    assert(a(1).getLong(6) === QualityAudit.BenfordPpm(1))
    val b = rows.filter(_.getString(0) == "b")
    assert(b.map(_.getLong(3)).sum === 1L && b.length === 9)
  }

  test("benfordProfile: a Benford-exact synthetic cell reads ~zero " +
      "deviation on every digit (count-truncation slack only — the 995-" +
      "row fixture floors each constant to 1/1000, so devs stay under " +
      "2000 ppm where the uniform-fixture signal is ~130000)") {
    // counts proportional to the Benford constants themselves
    val rows = QualityAudit.BenfordPpm.zipWithIndex.flatMap {
      case (ppm, i) =>
        Seq.fill((ppm / 1000L).toInt)(("c", (i + 1) * 100L))
    }
    val out = QualityAudit.benfordProfile(rows.toDF("cell", "v"),
      "cell", "v").collect()
    assert(out.forall(_.getLong(6) <= 2000L),
      out.map(r => (r.getInt(1), r.getLong(6))).mkString(","))
  }

  // ------------------------------------------------------------------
  // t-closeness
  // ------------------------------------------------------------------

  test("tCloseness: a class matching the global distribution reads " +
      "emd 0; a fully shifted class breaches; nBins contract is loud") {
    intercept[IllegalArgumentException] {
      QualityAudit.tCloseness(Seq(("a", 0L)).toDF("cls", "b"),
        "cls", "b", nBins = 1, tPpm = 1L)
    }
    // classes p/q identical (uniform over bins 0..3), class r all at
    // bin 3: r's prefix gaps are maximal for 3 of 4 bins
    val df = (for {
      c <- Seq("p", "q"); b <- 0 to 3; _ <- 1 to 5
    } yield (c, b.toLong)) ++ (1 to 20).map(_ => ("r", 3L))
    val out = QualityAudit.tCloseness(df.toDF("cls", "b"), "cls", "b",
        nBins = 4, tPpm = 200000L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getInt(3)))).toMap
    // p and q are mutually identical but the GLOBAL mix includes r,
    // so their emd is small-but-nonzero; r is far
    assert(out("p") === out("q"))
    assert(out("r")._1 > out("p")._1)
    assert(out("r")._2 === 1 && out("p")._2 === 0)
    // with r removed, p vs global(=p+q) is exactly zero
    val clean = QualityAudit.tCloseness(
        df.filter(_._1 != "r").toDF("cls", "b"), "cls", "b",
        nBins = 4, tPpm = 200000L)
      .collect()
    assert(clean.forall(r => r.getLong(2) === 0L && r.getInt(3) === 0))
  }

  test("tCloseness: seeded differential vs the naive prefix-gap " +
      "BigInt lattice") {
    for (seed <- 1 to 8) {
      val rnd = new Random(7700 + seed)
      val nBins = 3 + rnd.nextInt(4)
      val rows = (1 to 80 + rnd.nextInt(80)).map { _ =>
        ("c" + rnd.nextInt(3), rnd.nextInt(nBins).toLong)
      }
      val got = QualityAudit.tCloseness(rows.toDF("cls", "b"),
          "cls", "b", nBins, tPpm = 150000L)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
      val nTot = rows.size
      val gCum = (0 until nBins).scanLeft(0L) { (acc, b) =>
        acc + rows.count(_._2 == b) }.tail
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val nc = rs.size
        val cCum = (0 until nBins).scanLeft(0L) { (acc, b) =>
          acc + rs.count(_._2 == b) }.tail
        val gap = (0 until nBins).map(k =>
          (BigInt(cCum(k)) * nTot - BigInt(gCum(k)) * nc).abs).sum
        val emd = BigInt(1000000) * gap /
          (BigInt(nBins - 1) * nc * nTot)
        c -> ((nc.toLong, emd.toLong, if (emd > 150000) 1 else 0))
      }
      assert(got === want, s"seed $seed")
    }
  }

  // ------------------------------------------------------------------
  // per-cell Gini
  // ------------------------------------------------------------------

  test("giniConcentrationByCell: equal mass reads exactly 0; " +
      "single-row and zero-total cells read null; one-hot mass reads " +
      "(n-1)/n in ppm") {
    val df = (Seq.tabulate(5)(i => ("flat", i.toLong, 40L)) ++
      Seq(("solo", 0L, 7L)) ++
      Seq.tabulate(4)(i => ("zero", i.toLong, 0L)) ++
      (("hot", 0L, 100L) +: Seq.tabulate(3)(i =>
        ("hot", (i + 1).toLong, 0L))))
      .toDF("cell", "id", "v")
    val out = StatsOps.giniConcentrationByCell(df, "cell", "id", "v")
      .collect().map(r => r.getString(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(out("flat") === Some(0L))
    assert(out("solo") === None)
    assert(out("zero") === None)
    assert(out("hot") === Some(750000L)) // (4-1)/4
  }

  test("giniConcentrationByCell: seeded differential vs the naive " +
      "rank lattice; tie order provably cannot move the statistic") {
    for (seed <- 1 to 10) {
      val rnd = new Random(9100 + seed)
      val rows = (1 to 40 + rnd.nextInt(40)).map { i =>
        ("c" + rnd.nextInt(3), i.toLong, rnd.nextInt(5).toLong)
      }
      val got = StatsOps.giniConcentrationByCell(
          rows.toDF("cell", "id", "v"), "cell", "id", "v")
        .collect().map(r => r.getString(0) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val v = rs.sortBy(r => (r._3, r._2)).map(_._3).toIndexedSeq
        val n = v.size
        val total = v.map(BigInt(_)).sum
        val ix = v.zipWithIndex.map { case (x, i) =>
          BigInt(x) * (i + 1) }.sum
        c -> (if (n > 1 && total > 0)
          Some(((BigInt(1000000) * (2 * ix - BigInt(n + 1) * total)) /
            (BigInt(n) * total)).toLong)
        else None)
      }
      assert(got === want, s"seed $seed")
      // reversed tiebreak ids: statistic identical
      val rev = rows.map(r => (r._1, -r._2, r._3))
      val got2 = StatsOps.giniConcentrationByCell(
          rev.toDF("cell", "id", "v"), "cell", "id", "v")
        .collect().map(r => r.getString(0) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
      assert(got2 === got, s"seed $seed tiebreak")
    }
  }

  // ------------------------------------------------------------------
  // log-rank
  // ------------------------------------------------------------------

  test("logRank: twin-symmetric cohorts read exactly z = 0; no events " +
      "anywhere nulls via V = 0; a planted hazard gap signs z the " +
      "right way") {
    // every A subject has an identical B twin: nA = nB and dA = dB at
    // every time, so e_ppm_t = 10^6 * dA exactly and delta = 0
    val twins = (1 to 12).flatMap(i => Seq(
      ("c", "A", (i % 4 + 1).toLong, (i % 2).toLong),
      ("c", "B", (i % 4 + 1).toLong, (i % 2).toLong)))
      .toDF("cell", "grp", "dur", "ev")
    val t = StatsOps.logRank(twins, "cell", "grp", "A", "B", "dur", "ev")
      .head()
    assert(t.getLong(5) === 0L)
    val censored = Seq(("c", "A", 1L, 0L), ("c", "B", 2L, 0L))
      .toDF("cell", "grp", "dur", "ev")
    assert(StatsOps.logRank(censored, "cell", "grp", "A", "B",
      "dur", "ev").head().isNullAt(5))
    // A dies early and always, B survives long: O_A >> E_A, z > 0
    val gap = ((1 to 20).map(i => ("c", "A", 1L, 1L)) ++
      (1 to 20).map(i => ("c", "B", 9L, 1L)))
      .toDF("cell", "grp", "dur", "ev")
    assert(StatsOps.logRank(gap, "cell", "grp", "A", "B", "dur", "ev")
      .head().getLong(5) > 3000L)
  }

  test("logRank: seeded differential vs the naive sum-of-floors " +
      "BigInt lattice") {
    for (seed <- 1 to 10) {
      val rnd = new Random(5500 + seed)
      val rows = (1 to 80 + rnd.nextInt(80)).map { _ =>
        ("c" + rnd.nextInt(2), if (rnd.nextBoolean()) "A" else "B",
          (1 + rnd.nextInt(6)).toLong, rnd.nextInt(2).toLong)
      }
      val got = StatsOps.logRank(rows.toDF("cell", "grp", "dur", "ev"),
          "cell", "grp", "A", "B", "dur", "ev")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val ts = rs.map(_._3).distinct.sorted
        var eSum = BigInt(0); var vSum = BigInt(0)
        for (t <- ts) {
          val naR = rs.count(r => r._2 == "A" && r._3 >= t)
          val nbR = rs.count(r => r._2 == "B" && r._3 >= t)
          val dA = rs.count(r => r._2 == "A" && r._3 == t && r._4 == 1)
          val dB = rs.count(r => r._2 == "B" && r._3 == t && r._4 == 1)
          val d = dA + dB; val n = naR + nbR
          if (d > 0) {
            eSum += BigInt(1000000) * d * naR / n
            if (n > 1) vSum += BigInt("1000000000000") * d * naR * nbR *
              (n - d) / (BigInt(n) * n * (n - 1))
          }
        }
        val dA = rs.count(r => r._2 == "A" && r._4 == 1)
        val delta = BigInt(1000000) * dA - eSum
        val z = if (vSum > 0) {
          val rad = BigInt(1000000) * delta.abs * delta.abs / vSum
          if (rad < BigInt(2).pow(53))
            Some(delta.signum *
              math.floor(math.sqrt(rad.toDouble)).toLong)
          else None
        } else None
        c -> ((rs.count(_._2 == "A").toLong, rs.count(_._2 == "B").toLong,
          dA.toLong, eSum.toLong, z))
      }
      assert(got === want, s"seed $seed")
    }
  }

  // ------------------------------------------------------------------
  // Theil–Sen
  // ------------------------------------------------------------------

  test("theilSen: an exact line reads its slope exactly; <=29% " +
      "outliers cannot move the median; guards are loud") {
    val line = (1 to 15).map(i => ("c", i.toLong, 5L * i + 7))
      .toDF("cell", "t", "v")
    assert(StatsOps.theilSen(line, "cell", "t", "v")
      .head().getLong(2) === 5000L)
    val dirty = ((1 to 13).map(i => ("c", i.toLong, 5L * i + 7)) ++
      Seq(("c", 14L, 99999L), ("c", 15L, -99999L)))
      .toDF("cell", "t", "v")
    assert(StatsOps.theilSen(dirty, "cell", "t", "v")
      .head().getLong(2) === 5000L)
    intercept[IllegalArgumentException] {
      StatsOps.theilSen(Seq(("c", 1L, 1L), ("c", 1L, 2L))
        .toDF("cell", "t", "v"), "cell", "t", "v")
    }
    intercept[IllegalArgumentException] {
      StatsOps.theilSen(line, "cell", "t", "v", maxPairsPerCell = 10L)
    }
  }

  test("theilSen: seeded differential vs the naive pairwise lattice " +
      "(truncation toward zero, lower median)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(6600 + seed)
      val rows = for {
        c <- Seq("a", "b"); t <- 1 to (8 + rnd.nextInt(15))
      } yield (c, t.toLong, (rnd.nextInt(41) - 20).toLong)
      val got = StatsOps.theilSen(rows.toDF("cell", "t", "v"),
          "cell", "t", "v")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
      val want = rows.groupBy(_._1).map { case (c, rs) =>
        val pts = rs.sortBy(_._2)
        val slopes = (for {
          i <- pts.indices; j <- (i + 1) until pts.size
        } yield 1000L * (pts(j)._3 - pts(i)._3) /
          (pts(j)._2 - pts(i)._2)).sorted
        c -> ((slopes.size.toLong,
          slopes((slopes.size + 1) / 2 - 1)))
      }
      assert(got === want, s"seed $seed")
    }
  }

  // ------------------------------------------------------------------
  // CUSUM
  // ------------------------------------------------------------------

  test("cusum: the prefix-min identity equals the sequential " +
      "recursion on seeded series; alarms are strictly-above; " +
      "duplicate times are loud") {
    intercept[IllegalArgumentException] {
      StatsOps.cusum(Seq(("c", 1L, 1L), ("c", 1L, 2L))
        .toDF("cell", "t", "v"), "cell", "t", "v", 0L, 1L, 0L, 1L)
    }
    for (seed <- 1 to 10) {
      val rnd = new Random(8800 + seed)
      val kUp = rnd.nextInt(20).toLong; val hUp = 5L + rnd.nextInt(30)
      val kDn = -rnd.nextInt(20).toLong; val hDn = 5L + rnd.nextInt(30)
      val rows = for {
        c <- Seq("a", "b"); t <- 1 to (20 + rnd.nextInt(30))
      } yield (c, t.toLong, (rnd.nextInt(41) - 20).toLong)
      val got = StatsOps.cusum(rows.toDF("cell", "t", "v"),
          "cell", "t", "v", kUp, hUp, kDn, hDn)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(3), r.getInt(4), r.getLong(5), r.getInt(6))))
        .toMap
      val want = rows.groupBy(_._1).flatMap { case (c, rs) =>
        var up = 0L; var dn = 0L
        rs.sortBy(_._2).map { r =>
          up = math.max(0L, up + r._3 - kUp)
          dn = math.max(0L, dn + kDn - r._3)
          (c, r._2) -> ((up, if (up > hUp) 1 else 0,
            dn, if (dn > hDn) 1 else 0))
        }
      }
      assert(got === want, s"seed $seed")
    }
  }
}
