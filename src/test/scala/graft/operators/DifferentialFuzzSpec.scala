package graft.operators

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Randomized differential fuzzing (r9 verdict #3): the per-query oracle
 * gate proves each operator on ONE driver-generated fixture, which
 * leaves the fixture-shaped-constant failure class open (the k-core
 * k=80→68 episode). Here every operator under test runs against an
 * INDEPENDENT naive reference — plain driver-side Scala collections +
 * BigInt, sharing no code with the distributed implementation — on 20
 * seeded random frames apiece, with adversarial shapes the fixtures
 * never produce: heavy key collisions, timestamp ties, negative values
 * and pre-1970 days, null channels/values where the contract admits
 * them, empty and single-row groups, N < tiles.
 *
 * Integer-division direction note: every ppm statistic under test is
 * defined on truncating division (Spark `div` / BigInt `/` both
 * truncate toward zero), so the references use BigInt `/` directly;
 * operators defined on FLOOR (floorDiv lattice) get Math.floorDiv in
 * the reference.
 */
class DifferentialFuzzSpec extends SparkSuite {
  import spark.implicits._

  private val Seeds = 1 to 20

  private def withSeed[A](seed: Int)(body: Random => A): A =
    body(new Random(seed))

  // --------------------------------------------------------------- locf
  test("locfFill == naive carry-forward (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 40 + rnd.nextInt(40)).map { i =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(6).toLong, i.toLong,
          if (rnd.nextInt(3) == 0) None else Some(rnd.nextInt(100).toLong))
      }
      val df = rows.toDF("k", "t", "tie", "v")
      val got = TemporalOps.locfFill(df, "k", "t", "tie", "v")
        .select("k", "t", "tie", "v_filled")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).sortBy(x => (x._1, x._2, x._3))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        var last: Option[Long] = None
        rs.sortBy(r => (r._2, r._3)).map { r =>
          if (r._4.isDefined) last = r._4
          (k, r._2, r._3, last)
        }
      }.sortBy(x => (x._1, x._2, x._3))
      assert(got.toSeq === want, s"seed=$seed")
    }
  }

  // --------------------------------------------------------------- fifo
  test("fifoMatch == naive greedy queue walk (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 30 + rnd.nextInt(30)).map { i =>
        (s"k${rnd.nextInt(3)}", rnd.nextInt(8).toLong, i.toLong,
          1L + rnd.nextInt(20), rnd.nextBoolean())
      }
      val df = rows.toDF("k", "t", "tie", "qty", "is_lot")
      val got = TemporalOps.fifoMatch(df, "k", "t", "tie", "qty", "is_lot")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(x => (x._1, x._2, x._3, x._4, x._5)).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val lots = rs.filter(_._5).sortBy(r => (r._2, r._3))
          .map(r => (r._2, r._3, r._4)).toBuffer
        val dem = rs.filterNot(_._5).sortBy(r => (r._2, r._3))
          .map(r => (r._2, r._3, r._4)).toBuffer
        val out = Seq.newBuilder[(String, Long, Long, Long, Long, Long)]
        var (li, di) = (0, 0)
        var (lrem, drem) = (0L, 0L)
        while (li < lots.size && di < dem.size) {
          if (lrem == 0L) lrem = lots(li)._3
          if (drem == 0L) drem = dem(di)._3
          val m = math.min(lrem, drem)
          out += ((k, lots(li)._1, lots(li)._2, dem(di)._1, dem(di)._2, m))
          lrem -= m; drem -= m
          if (lrem == 0L) li += 1
          if (drem == 0L) di += 1
        }
        out.result()
      }.sortBy(x => (x._1, x._2, x._3, x._4, x._5))
      assert(got === want, s"seed=$seed")
    }
  }

  // -------------------------------------------------------- attribution
  test("attribution == naive reverse-scan credit (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val states = Seq("ad", "email", "social", "conv", null)
      val rows = (1 to 40 + rnd.nextInt(40)).map { i =>
        (s"u${rnd.nextInt(5)}", rnd.nextInt(10).toLong, i.toLong,
          states(rnd.nextInt(states.size)))
      }
      val df = rows.toDF("k", "t", "tie", "state")
      val got = TemporalOps.attribution(df, "k", "t", "tie", "state", "conv")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1.getOrElse("")).toSeq
      val per = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val asc = rs.sortBy(r => (r._2, r._3))
        val isConv = asc.map(r => r._4 == "conv")
        val convGrp = isConv.scanRight(0) { (c, acc) =>
          acc + (if (c) 1 else 0)
        }.init
        val touches = asc.zip(convGrp).filter { case (r, g) =>
          r._4 != "conv" && g >= 1
        }
        touches.groupBy(_._2).toSeq.flatMap { case (_, grp) =>
          val n = grp.size
          grp.zipWithIndex.map { case ((r, _), i) =>
            (Option(r._4), i == 0, i == n - 1, 1000000L / n)
          }
        }
      }
      val want = per.groupBy(_._1).map { case (ch, rs) =>
        (ch, rs.size.toLong, rs.count(_._2).toLong, rs.count(_._3).toLong,
          rs.map(_._4).sum)
      }.toSeq.sortBy(_._1.getOrElse(""))
      assert(got === want, s"seed=$seed")
    }
  }

  // ---------------------------------------------------------- proration
  test("prorateLargestRemainder == naive exact apportionment (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val total = 100L + rnd.nextInt(10000)
      val rows = (1 to 20 + rnd.nextInt(30)).map { i =>
        (s"g${rnd.nextInt(3)}", i.toLong, 1L + rnd.nextInt(50))
      }
      val df = rows.toDF("g", "id", "w")
      val got = StatsOps.prorateLargestRemainder(df, "g", "id", "w", total)
        .select("g", "id", "alloc")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(x => (x._1, x._2)).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        val grpW = rs.map(_._3).sum
        val based = rs.map { r =>
          (r._2, total * r._3 / grpW, total * r._3 % grpW)
        }
        val extra = based.map(_._3).sum / grpW
        val ranked = based.sortBy(r => (-r._3, r._1)).zipWithIndex
        ranked.map { case ((id, base, _), i) =>
          (g, id, base + (if (i < extra) 1L else 0L))
        }
      }.sortBy(x => (x._1, x._2))
      assert(got === want, s"seed=$seed")
    }
  }

  // ---------------------------------------------------- weighted median
  test("weightedMedian == naive lower weighted median (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 30 + rnd.nextInt(40)).map { _ =>
        (s"g${rnd.nextInt(4)}",
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(40).toLong - 5),
          rnd.nextInt(8).toLong - 1)
      }
      val df = rows.toDF("g", "v", "w")
      val got = StatsOps.weightedMedian(df, "g", "v", "w")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val want = rows.collect { case (g, Some(v), w) if w > 0 => (g, v, w) }
        .groupBy(_._1).toSeq.map { case (g, rs) =>
        val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val tot = byV.map(_._2).sum
        var cum = 0L
        val med = byV.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
        (g, med, tot)
      }.sortBy(_._1)
      assert(got === want, s"seed=$seed")
    }
  }

  // --------------------------------------------------------------- ohlc
  test("resampleOhlc == naive bucket summary (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val step = 1L + rnd.nextInt(5)
      val rows = (1 to 40 + rnd.nextInt(40)).map { i =>
        (s"k${rnd.nextInt(3)}", rnd.nextInt(30).toLong - 10, i.toLong,
          rnd.nextInt(200).toLong - 50)
      }
      val df = rows.toDF("k", "t", "tie", "v")
      val got = TemporalOps.resampleOhlc(df, "k", "t", "tie", "v", step)
        .select("k", "bucket_t", "n", "open", "high", "low", "close", "total")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        .sortBy(x => (x._1, x._2)).toSeq
      val want = rows.groupBy(r => (r._1, Math.floorDiv(r._2, step) * step))
        .toSeq.map { case ((k, b), rs) =>
          val ord = rs.sortBy(r => (r._2, r._3))
          (k, b, rs.size.toLong, ord.head._4, rs.map(_._4).max,
            rs.map(_._4).min, ord.last._4, rs.map(_._4).sum)
        }.sortBy(x => (x._1, x._2))
      assert(got === want, s"seed=$seed")
    }
  }

  // ------------------------------------------------------------ islands
  test("coalesceIntervals == naive interval merge (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 30 + rnd.nextInt(30)).map { _ =>
        val s = rnd.nextInt(60).toLong
        (s"k${rnd.nextInt(3)}", s, s + rnd.nextInt(8) - 1)
      }
      val df = rows.toDF("k", "s", "e")
      val got = TemporalOps.coalesceIntervals(df, "k", "s", "e")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
        .sortBy(x => (x._1, x._2)).toSeq
      val want = rows.filter(r => r._3 >= r._2).groupBy(_._1).toSeq
        .flatMap { case (k, rs) =>
          val ord = rs.map(r => (r._2, r._3)).sortBy(identity)
          val islands = ord.foldLeft(Vector.empty[(Long, Long, Long)]) {
            case (acc, (s, e)) =>
              acc.lastOption match {
                case Some((is, ie, n)) if s <= ie =>
                  acc.init :+ ((is, math.max(ie, e), n + 1))
                case _ => acc :+ ((s, e, 1L))
              }
          }
          islands.zipWithIndex.map { case ((s, e, n), i) =>
            (k, (i + 1).toLong, s, e, e - s, n)
          }
        }.sortBy(x => (x._1, x._3))
      assert(got === want, s"seed=$seed")
    }
  }

  // ------------------------------------------------------------- zscore
  test("zscoreFlags == naive BigInt criterion (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val k = 2 + rnd.nextInt(2)
      val rows = (1 to 30 + rnd.nextInt(40)).map { i =>
        (if (rnd.nextInt(8) == 0) None else Some(s"g${rnd.nextInt(3)}"),
          i.toLong, rnd.nextInt(2000).toLong - 500)
      }
      val df = rows.toDF("g", "id", "v")
      val got = StatsOps.zscoreFlags(df, "g", "v", k)
        .select("g", "id", "v", "is_outlier")
        .collect().map(r => (Option(r.getString(0)), r.getLong(1),
          r.getLong(2), r.getBoolean(3)))
        .sortBy(x => (x._1.getOrElse(""), x._2)).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        val n = BigInt(rs.size)
        val s = rs.map(r => BigInt(r._3)).sum
        val ss = rs.map(r => BigInt(r._3) * r._3).sum
        rs.map { r =>
          val d = n * r._3 - s
          (g, r._2, r._3, d * d > BigInt(k.toLong * k) * (n * ss - s * s))
        }
      }.sortBy(x => (x._1.getOrElse(""), x._2))
      assert(got === want, s"seed=$seed")
    }
  }

  // ----------------------------------------------------- clampedBalance
  test("clampedBalance closed form == naive sequential fold (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 40 + rnd.nextInt(40)).map { i =>
        (s"a${rnd.nextInt(4)}", rnd.nextInt(10).toLong, i.toLong,
          rnd.nextInt(41).toLong - 20)
      }
      val df = rows.toDF("k", "t", "tie", "x")
      val got = TemporalOps.clampedBalance(df, "k", "t", "tie", "x")
        .select("k", "t", "tie", "balance", "clamped")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4)))
        .sortBy(x => (x._1, x._2, x._3)).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        var bal = 0L
        rs.sortBy(r => (r._2, r._3)).map { r =>
          val free = bal + r._4
          val clamped = free < 0L
          bal = math.max(0L, free)
          (k, r._2, r._3, bal, clamped)
        }
      }.sortBy(x => (x._1, x._2, x._3))
      assert(got === want, s"seed=$seed")
    }
  }

  // ---------------------------------------------- gains / ntile (r10 op)
  test("cumulativeGains bucket-prefix ntile == naive global sort (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val tiles = 2 + rnd.nextInt(6)
      val n = rnd.nextInt(80) // includes N < tiles and N == 0 shapes
      val rows = (1 to n).map { i =>
        (i.toLong, rnd.nextInt(12).toLong, rnd.nextBoolean())
      }
      val df = rows.toDF("id", "score", "conv")
      val got = StatsOps.cumulativeGains(df, "id", "score", "conv", tiles,
          nBuckets = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long]),
          Option(r.get(6)).map(v => BigInt(v.toString))))
        .sortBy(_._1).toSeq
      val ordered = rows.sortBy(r => (-r._2, r._1))
      val (q, rem) = (n / tiles, n % tiles)
      val tileOf = (r: Int) => // 1-based rank → ntile bucket
        if (r <= rem * (q + 1)) (r + q) / (q + 1)
        else rem + (r - rem * (q + 1) + q - 1) / q
      val byTile = ordered.zipWithIndex
        .map { case (r, i) => (tileOf(i + 1).toLong, r._3) }
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (t, rs) => (t, rs.size.toLong, rs.count(_._2).toLong) }
      val (tU, tC) = (BigInt(n), BigInt(byTile.map(_._3).sum))
      var (cumU, cumC) = (0L, 0L)
      val want = byTile.map { case (t, nu, nc) =>
        cumU += nu; cumC += nc
        val capture =
          if (tC > 0) Some((BigInt(1000000) * cumC / tC).toLong) else None
        val lift = if (tC > 0 && cumU > 0)
          Some(BigInt(cumC) * tU * 1000000 / (BigInt(cumU) * tC)) else None
        (t, nu, nc, cumU, cumC, capture, lift)
      }
      assert(got === want, s"seed=$seed tiles=$tiles n=$n")
    }
  }

  // ------------------------------------------------------ abcXyz (r10 op)
  test("abcXyz bucket-prefix cumsum == naive sorted cumsum (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 30 + rnd.nextInt(60)).map { _ =>
        (rnd.nextInt(25).toLong, rnd.nextInt(5000).toLong + 1)
      }
      val df = rows.toDF("item", "v")
      val got = StatsOps.abcXyz(df, "item", "v", 800000L, 950000L,
          250000L, 1000000L, nBuckets = 3)
        .select("item", "revenue", "cum_ppm", "cv2_ppm", "abc", "xyz")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getString(4),
          r.getString(5)))
        .sortBy(_._1).toSeq
      val per = rows.groupBy(_._1).toSeq.map { case (item, rs) =>
        val n = BigInt(rs.size)
        val sv = rs.map(r => BigInt(r._2)).sum
        val svv = rs.map(r => BigInt(r._2) * r._2).sum
        (item, n, sv, svv)
      }
      val tot = per.map(_._3).sum
      var cum = BigInt(0)
      val want = per.sortBy(p => (-p._3, p._1)).map { case (item, n, sv, svv) =>
        cum += sv
        val cumPpm = (cum * 1000000 / tot).toLong
        val cv2 = if (sv > 0) Some(((n * svv - sv * sv) * 1000000 / (sv * sv)).toLong)
          else None
        val abc = if (cumPpm <= 800000L) "A"
          else if (cumPpm <= 950000L) "B" else "C"
        val xyz = cv2 match {
          case None => "Z"
          case Some(c) if c <= 250000L => "X"
          case Some(c) if c <= 1000000L => "Y"
          case _ => "Z"
        }
        (item, sv.toLong, cumPpm, cv2, abc, xyz)
      }.sortBy(_._1)
      assert(got === want, s"seed=$seed")
    }
  }

  // ------------------------------------------------------ seasonal index
  test("seasonalIndex == naive ratio-of-ratios incl. pre-1970 days (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 30 + rnd.nextInt(40)).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.nextInt(60).toLong - 30,
          rnd.nextInt(900).toLong + 1)
      }.distinct
      val df = rows.toDF("g", "day", "v")
      val got = TemporalOps.seasonalIndex(df, "g", "day", "v")
        .select("g", "dow", "n_days", "sum_v", "index_ppm")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .sortBy(x => (x._1, x._2)).toSeq
      val want = rows.groupBy(r => (r._1, Math.floorMod(r._2 + 3, 7L)))
        .toSeq.map { case ((g, dow), rs) =>
          (g, dow, rs.size.toLong, rs.map(_._3).sum)
        }.groupBy(_._1).toSeq.flatMap { case (_, dows) =>
          val nAll = BigInt(dows.map(_._3).sum)
          val sumAll = BigInt(dows.map(_._4).sum)
          dows.map { case (g, dow, nd, sv) =>
            (g, dow, nd, sv,
              (BigInt(sv) * nAll * 1000000 / (BigInt(nd) * sumAll)).toLong)
          }
        }.sortBy(x => (x._1, x._2))
      assert(got === want, s"seed=$seed")
    }
  }

  // ---------------------------------------------------------- histogram
  test("histogram == naive clamped bucketing (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val (lo, width, buckets) = (-20L + rnd.nextInt(10), 1L + rnd.nextInt(9),
        2 + rnd.nextInt(10))
      val rows = (1 to 40 + rnd.nextInt(60)).map { _ =>
        Tuple1(rnd.nextInt(400).toLong - 150)
      }
      val df = rows.toDF("v")
      val got = StatsOps.histogram(df, col("v"), lo, width, buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sortBy(_._1).toSeq
      val want = rows.map(_._1).groupBy { v =>
        math.min(math.max(Math.floorDiv(v - lo, width), 0L), buckets - 1L)
      }.toSeq.map { case (b, vs) =>
        (b, vs.size.toLong, vs.min, vs.max)
      }.sortBy(_._1)
      assert(got === want, s"seed=$seed")
    }
  }

  // -------------------------------------------------------- rollingBeta
  test("rollingBeta == naive trailing-window co-moments (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val win = 2 + rnd.nextInt(4)
      val rows = (1 to 3).flatMap { k =>
        (1 to 10 + rnd.nextInt(20)).map { b =>
          (s"k$k", b.toLong, rnd.nextInt(200).toLong - 60,
            rnd.nextInt(200).toLong - 60)
        }
      }
      val df = rows.toDF("k", "b", "x", "m")
      val got = StatsOps.rollingBeta(df, "k", "b", "x", "m", win)
        .select("k", "b", "n", "cov_num", "var_num", "beta_ppm")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Long])))
        .sortBy(x => (x._1, x._2)).toSeq
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, rs) =>
        val ord = rs.sortBy(_._2)
        ord.indices.map { i =>
          val sl = ord.slice(math.max(0, i - win + 1), i + 1)
          val n = sl.size.toLong
          val (sx, sm) = (sl.map(_._3).sum, sl.map(_._4).sum)
          val sxm = sl.map(r => r._3 * r._4).sum
          val smm = sl.map(r => r._4 * r._4).sum
          val cov = n * sxm - sx * sm
          val vr = n * smm - sm * sm
          val beta = if (vr == 0L) None
            else if (cov < 0L) Some(-(1000000L * -cov / vr))
            else Some(1000000L * cov / vr)
          (k, ord(i)._2, n, cov, vr, beta)
        }
      }.sortBy(x => (x._1, x._2))
      assert(got === want, s"seed=$seed win=$win")
    }
  }

  // --------------------------------------------------------- tvDistance
  test("tvDistance == naive BigInt common-denominator form (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 60 + rnd.nextInt(80)).map { _ =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(6).toLong)
      }
      val df = rows.toDF("g", "b")
      val got = StatsOps.tvDistance(df, "g", col("b"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val cells = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bTot = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n = BigInt(rows.size)
      val want = rows.groupBy(_._1).toSeq.map { case (g, rs) =>
        val ng = BigInt(rs.size)
        val num = bTot.keys.toSeq.map { b =>
          (BigInt(cells.getOrElse((g, b), 0L)) * n -
            BigInt(bTot(b)) * ng).abs
        }.sum
        (g, rs.size.toLong, (num * 1000000 / (2 * ng * n)).toLong)
      }.sortBy(_._1)
      assert(got === want, s"seed=$seed")
    }
  }

  // ----------------------------------------------------------- qqCompare
  test("qqCompare == naive discrete order statistics (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val tiles = 2 + rnd.nextInt(8)
      val rows = (1 to 40 + rnd.nextInt(60)).map { i =>
        (if (rnd.nextBoolean()) "A" else "B", i.toLong,
          rnd.nextInt(300).toLong - 40)
      }
      val df = rows.toDF("g", "id", "v")
      val got = StatsOps.qqCompare(df, "g", "v", "id", "A", "B", tiles)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.asInstanceOf[Long]),
            Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long]))))
        .toMap
      def quantiles(grp: String): Map[Long, Long] = {
        val vs = rows.filter(_._1 == grp).sortBy(r => (r._3, r._2))
        val n = vs.size
        (1 until tiles).flatMap { q =>
          vs.zipWithIndex.find { case (_, i) => (i + 1) * tiles >= n * q }
            .map(p => q.toLong -> p._1._3)
        }.toMap
      }
      val (qa, qb) = (quantiles("A"), quantiles("B"))
      for (q <- 1L until tiles.toLong) {
        val (ga, gb, ratio) = got.getOrElse(q, (None, None, None))
        assert(ga === qa.get(q), s"seed=$seed q=$q A")
        assert(gb === qb.get(q), s"seed=$seed q=$q B")
        val wantRatio = for (a <- qa.get(q); b <- qb.get(q) if b > 0)
          yield (BigInt(1000000) * a / b).toLong
        assert(ratio === wantRatio, s"seed=$seed q=$q ratio")
      }
    }
  }

  // ----------------------------------------------------------- floorDiv
  test("floorDiv lattice == Math.floorDiv over signed operands (20 seeds)") {
    for (seed <- Seeds) withSeed(seed) { rnd =>
      val rows = (1 to 60).map { i =>
        (i.toLong, rnd.nextLong() % 100000L,
          { val d = rnd.nextLong() % 500L; if (d == 0L) 7L else d })
      }
      val df = rows.toDF("id", "a", "b")
      val got = df.select(col("id"),
          TemporalOps.floorDiv(col("a"), col("b")).as("fd"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      val want = rows.map(r => (r._1, Math.floorDiv(r._2, r._3))).sortBy(_._1)
      assert(got === want, s"seed=$seed")
    }
  }
}
