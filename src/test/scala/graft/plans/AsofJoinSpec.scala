package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.{AsofQueries, GraftQuery}

/**
 * The native AS-OF plan node: semantics on hand-built cases (inclusive
 * ties, unmatched lefts, key groups with no right rows, self-join
 * attribute dedup), agreement with the window-over-union composition
 * (q34) on the real events table, and the physical plan shape (the
 * custom exec node present; no window, no union).
 */
class AsofJoinSpec extends SparkSuite with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def trades = Seq(
    // (id, key, t)
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
    (4L, "b", 5L), (5L, "c", 50L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (key, t, px): b has no quotes at all; a has an exact-tie quote
    ("a", 10L, 100L), ("a", 15L, 101L), ("a", 25L, 102L),
    ("c", 60L, 300L)
  ).toDF("q_sym", "q_t", "px")

  test("semantics: inclusive tie, carry-forward, unmatched key and too-early left") {
    val out = AsofOps.asofJoin(trades, quotes,
        Seq("sym" -> "q_sym"), "t", "q_t")
      .select(col("trade_id"), col("px")).orderBy("trade_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq(
      1L -> 100L, // exact tie t=10 matches inclusively
      2L -> 101L, // carry-forward of t=15 quote
      3L -> 102L, // latest at-or-before t=30
      4L -> -1L,  // key with no right rows -> null
      5L -> -1L)) // right rows exist but all AFTER the left time -> null
  }

  test("NULL times never match: null-time lefts null-extend, null-time " +
      "rights are never candidates (both directions, DuckDB ASOF semantics)") {
    val lt = Seq((1L, "a", Some(20L)), (2L, "a", None), (3L, "a", Some(30L)))
      .toDF("trade_id", "sym", "t")
    val rt = Seq(("a", None, 99L), ("a", Some(15L), 101L), ("a", Some(25L), 102L))
      .toDF("q_sym", "q_t", "px")
    def run(dir: AsofDirection) =
      AsofOps.asofJoin(lt, rt, Seq("sym" -> "q_sym"), "t", "q_t", dir)
        .select(col("trade_id"), col("px")).orderBy("trade_id")
        .collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    // backward: t=20 -> 15-quote; null t -> none (never the null-time
    // quote, which nulls-first ordering offers as the 'earliest')
    assert(run(AsofBackward).toSeq === Seq(1L -> 101L, 2L -> -1L, 3L -> 102L))
    // forward: t=20 -> 25-quote; null t -> none; t=30 -> nothing ahead
    assert(run(AsofForward).toSeq === Seq(1L -> 102L, 2L -> -1L, 3L -> -1L))
    // with a tolerance set, a null-time left must not read a garbage 0
    val tol = AsofOps.asofJoin(lt, rt, Seq("sym" -> "q_sym"), "t", "q_t",
        AsofBackward, toleranceUs = Some(5L))
      .select(col("trade_id"), col("px")).orderBy("trade_id")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(tol.toSeq === Seq(1L -> 101L, 2L -> -1L, 3L -> 102L))
  }

  test("mixed-width key types are rejected at construction, not read as garbage") {
    val l = Seq((1, 10L)).toDF("k", "t") // IntegerType key
    val r = Seq((1L, 5L, 7L)).toDF("rk", "rt", "px") // LongType key
    val ex = intercept[IllegalArgumentException] {
      AsofOps.asofJoin(l, r, Seq("k" -> "rk"), "t", "rt")
    }
    assert(ex.getMessage.contains("agree in type"), ex.getMessage)
  }

  test("column resolution is case-insensitive and rejects ambiguity") {
    val out = AsofOps.asofJoin(trades, quotes,
        Seq("SYM" -> "Q_SYM"), "T", "Q_T")
      .select(col("trade_id"), col("px")).orderBy("trade_id").collect()
    assert(out.length === 5)
    // two right columns that both resolve 'q_t' case-insensitively:
    // binding the first silently would be the wrong-side trap
    val dup = quotes.select(col("q_sym"), col("q_t"),
      col("q_t").as("Q_T"), col("px"))
    val ex = intercept[IllegalArgumentException] {
      AsofOps.asofJoin(trades, dup, Seq("sym" -> "q_sym"), "t", "q_t")
    }
    assert(ex.getMessage.contains("ambiguous"), ex.getMessage)
  }

  test("among right rows tied on (key, time) the last in sort order wins") {
    val dupQuotes = Seq(("a", 10L, 1L), ("a", 10L, 2L), ("a", 10L, 3L))
      .toDF("q_sym", "q_t", "px")
    val out = AsofOps.asofJoin(trades.filter(col("trade_id") === 1), dupQuotes,
        Seq("sym" -> "q_sym"), "t", "q_t")
      .select(col("px")).collect()
    assert(out.length === 1)
    // ties are resolved by sort position (px ascending here because it is
    // the only differing column) — pre-aggregate for a semantic pick
    assert(out.head.getLong(0) === 3L)
  }

  test("self-join: colliding attribute ids are re-aliased, result is correct") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("id", "k", "t")
    val out = AsofOps.asofJoin(
        df, df.select(col("k").as("rk"), col("t").as("rt"), col("id").as("rid")),
        Seq("k" -> "rk"), "t", "rt")
      .select(col("id"), col("rid")).orderBy("id").collect()
    // each row as-of-matches itself (inclusive) or the later of the two
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (2L, 2L)))
  }

  test("native q65 and window-composition q34 agree row-for-row on real events") {
    val q34 = AsofQueries.all("q34_asof_join").build(spark, sf("0.001")).collect()
    val q65 = AsofQueries.all("q65_asof_join_native").build(spark, sf("0.001")).collect()
    assert(q65.length === q34.length)
    q34.zip(q65).foreach { case (a, b) => assert(a === b) }
  }

  test("plan shape: AsofJoinExec present; no window, union or cartesian anywhere") {
    val df = AsofQueries.all("q65_asof_join_native").build(spark, sf("0.001"))
    df.noop() // force planning through AQE
    val plan = df.queryExecution.executedPlan
    assert(collectFirst(plan) {
      case e: AsofJoinExec => e
    }.isDefined, s"no AsofJoinExec in:\n$plan")
    val banned = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.nodeName
      case u: org.apache.spark.sql.execution.UnionExec => u.nodeName
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c.nodeName
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b.nodeName
    }
    assert(banned.isEmpty, s"banned nodes in native as-of plan: $banned")
  }

  test("AsofFilterPushdown: left-only predicates reach the parquet scan; right-side stay above") {
    val e = graft.queries.Tables.events(spark, sf("0.001"))
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_type"))
    val leftDf = e.filter(col("event_type") =!= "signup")
    val rightDf = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("r_user_id"), col("ts_us").as("r_ts_us"),
        col("event_id").as("signup_event_id"))
    val joined = AsofOps.asofJoin(leftDf, rightDf,
      Seq("user_id" -> "r_user_id"), "ts_us", "r_ts_us")
    // left-side predicate: must sink below the custom node into the scan
    val filtered = joined.filter(col("user_id") < 100)
    filtered.noop()
    val scans = collect(filtered.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.exists(_.metadata.getOrElse("PushedFilters", "")
      .contains("LessThan(user_id,100)")),
      s"user_id<100 not pushed to any scan:\n${scans.map(_.metadata).mkString("\n")}")
    // the optimized plan keeps the custom node with the filter BELOW it
    val opt = filtered.queryExecution.optimizedPlan
    assert(opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.toString.contains("user_id")
          && f.find(_.isInstanceOf[AsofJoin]).isDefined => f
    }.isEmpty, "left-only filter stayed ABOVE AsofJoin")
    // right-side predicate: a match-result filter must NOT move below
    val rightFiltered = joined.filter(col("signup_event_id").isNotNull)
    val optR = rightFiltered.queryExecution.optimizedPlan
    assert(optR.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.find(_.isInstanceOf[AsofJoin]).isDefined => f
    }.isDefined, "right-side filter was pushed below AsofJoin (unsound)")
    // and the results agree with the equivalent filter on the composition
    val expect = AsofQueries.all("q34_asof_join").build(spark, sf("0.001"))
      .filter(col("user_id") < 100).count()
    assert(filtered.count() === expect)
  }

  test("forward direction: earliest at-or-after match, inclusive tie, " +
      "first-in-sort-order on tied right rows") {
    val out = AsofOps.asofJoin(trades, quotes,
        Seq("sym" -> "q_sym"), "t", "q_t", direction = AsofForward)
      .select(col("trade_id"), col("px")).orderBy("trade_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(out.toSeq === Seq(
      1L -> 100L, // exact tie t=10 matches inclusively
      2L -> 102L, // next future quote is t=25
      3L -> -1L,  // no quote at/after t=30 -> null
      4L -> -1L,  // key with no right rows -> null
      5L -> 300L)) // t=60 quote is ahead of the t=50 trade
    val dupQuotes = Seq(("a", 10L, 1L), ("a", 10L, 2L)).toDF("q_sym", "q_t", "px")
    val tied = AsofOps.asofJoin(trades.filter(col("trade_id") === 1), dupQuotes,
        Seq("sym" -> "q_sym"), "t", "q_t", direction = AsofForward)
      .select(col("px")).collect()
    assert(tied.map(_.getLong(0)).toSeq === Seq(1L)) // first in sort order
  }

  test("tolerance: an out-of-tolerance nearest neighbor emits nulls, " +
      "both directions") {
    // backward: trade t=30 matches quote t=25 (gap 5); tolerance 4 nulls it
    val back = AsofOps.asofJoin(trades, quotes,
        Seq("sym" -> "q_sym"), "t", "q_t", toleranceUs = Some(4L))
      .select(col("trade_id"), col("px")).orderBy("trade_id")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(back.toSeq === Seq(
      1L -> 100L, // gap 0 <= 4
      2L -> -1L,  // nearest past quote t=15, gap 5 > 4
      3L -> -1L,  // nearest past quote t=25, gap 5 > 4
      4L -> -1L, 5L -> -1L))
    // forward: trade t=50 vs quote t=60 (gap 10); tolerance 9 nulls it
    val fwd = AsofOps.asofJoin(trades.filter(col("trade_id") === 5), quotes,
        Seq("sym" -> "q_sym"), "t", "q_t",
        direction = AsofForward, toleranceUs = Some(9L))
      .select(col("px")).collect()
    assert(fwd.head.isNullAt(0))
  }

  test("tolerance on a non-integral time column is rejected at build") {
    val l = Seq(("a", "x")).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsofOps.asofJoin(l, l.select(col("k").as("rk"), col("t").as("rt")),
        Seq("k" -> "rk"), "t", "rt", toleranceUs = Some(1L))
    }
  }

  implicit class NoopWriter(df: org.apache.spark.sql.DataFrame) {
    def noop(): Unit = df.write.format("noop").mode("overwrite").save()
  }
}
