package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Randomized invariant properties for the round-9 operator wave —
 * bounds and identities that must hold on ANY input, checked on
 * seeded generated frames (the §5 property discipline): what the
 * hand-picked oracle fixtures can't promise, these pin for the whole
 * input space the generator reaches.
 */
class Round9PropertySpec extends SparkSuite {
  import spark.implicits._

  private def gen[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // ------------------------------------------------------ trimmedStats

  test("property: trimmed and winsorized means always lie inside " +
      "[lo_v, hi_v], which lie inside [min, max]") {
    val rows = gen(for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-10000L, 10000L)
    } yield (g, v), 300, 11L).zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }
    val df = rows.toDF("grp", "v", "tie")
    val mins = rows.groupBy(_._1).view.mapValues(r => r.map(_._2).min).toMap
    val maxs = rows.groupBy(_._1).view.mapValues(r => r.map(_._2).max).toMap
    StatsOps.trimmedStats(df, "grp", "v", "tie", 10, 90).collect()
      .foreach { r =>
        val g = r.getString(0)
        val (lo, hi) = (r.getLong(3), r.getLong(4))
        assert(lo >= mins(g) && hi <= maxs(g) && lo <= hi)
        if (!r.isNullAt(5))
          assert(r.getLong(5) >= lo && r.getLong(5) <= hi,
            s"trimmed mean ${r.getLong(5)} outside [$lo, $hi]")
        if (!r.isNullAt(6))
          assert(r.getLong(6) >= lo && r.getLong(6) <= hi,
            s"winsorized mean ${r.getLong(6)} outside [$lo, $hi]")
      }
  }

  // ------------------------------------------------ rollingActiveUsers

  test("property: dau <= wau <= window-sum of dau, stickiness <= 1e6") {
    val rows = gen(for {
      u <- Gen.chooseNum(1L, 40L)
      d <- Gen.chooseNum(0L, 30L)
    } yield (u, d), 400, 23L)
    val df = rows.toDF("u", "d")
    val dauByDay = rows.distinct.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    TemporalOps.rollingActiveUsers(df, "u", "d", 7).collect().foreach { r =>
      val (day, dau, wau, st) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(dau == dauByDay(day))
      val winSum = (day - 6 to day).map(dauByDay.getOrElse(_, 0L)).sum
      assert(dau <= wau && wau <= winSum,
        s"day $day: dau=$dau wau=$wau winSum=$winSum")
      assert(st <= 1000000L && st >= 0L)
    }
  }

  // --------------------------------------------------- growthAccounting

  test("property: actives(p) = new + retained + resurrected, and " +
      "churned(p) <= actives(p-1)") {
    val rows = gen(for {
      u <- Gen.chooseNum(1L, 30L)
      p <- Gen.chooseNum(0L, 20L)
    } yield (u, p), 300, 37L)
    val df = rows.toDF("u", "p")
    val activesByP = rows.distinct.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    TemporalOps.growthAccounting(df, "u", "p").collect().foreach { r =>
      val p = r.getLong(0)
      val actives = r.getLong(1) + r.getLong(2) + r.getLong(3)
      assert(actives == activesByP.getOrElse(p, 0L),
        s"period $p: identity broken")
      assert(r.getLong(4) <= activesByP.getOrElse(p - 1, 0L),
        s"period $p: churned exceeds prior actives")
    }
  }

  // ----------------------------------------------------- featureScaling

  test("property: feature scalings stay in [0, 1e6] and the CDF is " +
      "monotone in the value") {
    val rows = gen(for {
      g <- Gen.oneOf("x", "y")
      v <- Gen.chooseNum(-500L, 500L)
    } yield (g, v), 200, 41L).zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }
    val df = rows.toDF("grp", "id", "v")
    val out = StatsOps.featureScaling(df, "grp", "v", "id").collect()
      .map(r => (r.getString(0), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    out.foreach { case (_, _, mm, cdf) =>
      mm.foreach(x => assert(x >= 0L && x <= 1000000L))
      cdf.foreach(x => assert(x >= 0L && x <= 1000000L))
    }
    out.groupBy(_._1).values.foreach { grp =>
      val sorted = grp.sortBy(_._2)
      sorted.zip(sorted.tail).foreach { case ((_, v1, _, c1), (_, v2, _, c2)) =>
        if (v1 < v2) for { a <- c1; b <- c2 }
          assert(a <= b, s"CDF not monotone: $v1->$a vs $v2->$b")
      }
    }
  }

  // ------------------------------------------------------- basketRules

  test("property: confidence and support bounded by 1e6, support <= " +
      "confidence, and lift is symmetric across direction") {
    val rows = gen(for {
      b <- Gen.chooseNum(1L, 50L)
      i <- Gen.oneOf("p", "q", "r", "s", "t")
    } yield (b, i), 300, 53L)
    val df = rows.toDF("basket", "item")
    val out = AssociationRules.basketRules(df, "basket", "item", 0L, 0L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(6), r.getLong(7), r.getLong(8))).toMap
    out.foreach { case ((a, b), (sup, conf, lift)) =>
      assert(sup <= conf && conf <= 1000000L && sup <= 1000000L,
        s"$a->$b: sup=$sup conf=$conf")
      assert(lift >= 0L)
      assert(out(b -> a)._3 == lift, s"lift asymmetric for $a/$b")
    }
  }

  // -------------------------------------------------------- tvDistance

  test("property: TV distances live in [0, 1e6] and a group that IS " +
      "the corpus reads below any minority group it dominates") {
    val rows = gen(for {
      g <- Gen.oneOf("maj", "maj", "maj", "min")
      b <- Gen.chooseNum(0L, 5L)
    } yield (g, b), 240, 61L)
    val df = rows.toDF("g", "b")
    val tv = StatsOps.tvDistance(df, "g", col("b")).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    tv.values.foreach(v => assert(v >= 0L && v <= 1000000L))
  }

  // ---------------------------------------------------- lagCorrelation

  test("property: |acf_milli| <= 1000 (the lattice keeps correlation " +
      "in range)") {
    val rows = gen(for {
      g <- Gen.oneOf("s1", "s2")
      v <- Gen.chooseNum(-100L, 100L)
    } yield (g, v), 120, 71L).zipWithIndex
      .map { case ((g, v), i) => (g, i.toLong, v) }
    val df = rows.toDF("grp", "t", "v")
    StatsOps.lagCorrelation(df, "grp", "t", "t", "v", 3).collect()
      .foreach { r =>
        if (!r.isNullAt(3)) {
          val a = r.getLong(3)
          assert(a >= -1000L && a <= 1000L, s"acf_milli $a out of range")
        }
      }
  }
}
