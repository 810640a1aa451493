package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Hand fixtures for the fifth round-13 wave: embedding-space benchmark
 * decontamination (q263) and the epoch/repeat planner (q264). Vectors
 * and plans are small enough to enumerate; every expected number is
 * derived by hand from the operator's defining arithmetic.
 */
class Round13WaveESpec extends SparkSuite {
  import spark.implicits._

  // ------------------------------------------------------------------
  // decontaminateByEmbedding
  // ------------------------------------------------------------------

  test("decontaminateByEmbedding: exact copies flag at cosine 1.0, " +
      "orthogonal vectors never flag, the argmax tie-break is by " +
      "bench id") {
    // bench: b1 = (1,0), b2 = (0,1). train: t10 = (2,0) (copy of b1
    // direction -> cos 1 vs b1, 0 vs b2), t11 = (0,3) (cos 1 vs b2),
    // t12 = (1,1) (cos ~0.707 vs both -> below tau, and WOULD tie).
    val bench = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val train = Seq((10L, Seq(2f, 0f)), (11L, Seq(0f, 3f)),
      (12L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val r = VectorSearch.decontaminateByEmbedding(train, bench,
      "vec_id", "embedding").collect()
      .map(x => x.getAs[Long]("train_id") -> x).toMap
    assert(r.keySet === Set(10L, 11L))
    assert(r(10L).getAs[Long]("bench_id") === 1L)
    assert(r(10L).getAs[Double]("cosine") === 1.0)
    assert(r(11L).getAs[Long]("bench_id") === 2L)
    // the sub-threshold tie case surfaces when tau admits it: at
    // tau = 0.5 doc 12 flags, attributed to bench 1 (the id tie-break
    // on an exact cosine tie)
    val loose = VectorSearch.decontaminateByEmbedding(train, bench,
      "vec_id", "embedding", tau = 0.5).collect()
      .map(x => x.getAs[Long]("train_id") -> x).toMap
    assert(loose(12L).getAs[Long]("bench_id") === 1L)
    assert(math.abs(loose(12L).getAs[Double]("cosine") -
      math.sqrt(0.5)) < 1e-12)
  }

  test("decontaminateByEmbedding: one row per contaminated train " +
      "vector even when it clears tau against SEVERAL bench items") {
    val bench = Seq((1L, Seq(1f, 0.01f)), (2L, Seq(1f, -0.01f)))
      .toDF("vec_id", "embedding")
    val train = Seq((10L, Seq(5f, 0f))).toDF("vec_id", "embedding")
    val r = VectorSearch.decontaminateByEmbedding(train, bench,
      "vec_id", "embedding").collect()
    assert(r.length === 1) // argmax row only, never one per bench hit
    assert(r.head.getAs[Long]("bench_id") === 1L) // cosine ties -> min id
  }

  // ------------------------------------------------------------------
  // epochPlan
  // ------------------------------------------------------------------

  test("epochPlan: hand plan — fractional epochs floor at milli, the " +
      "cap binds with visible unmet budget, zero-avail emits its full " +
      "target unmet") {
    // avail: A=1000 w=1, B=100 w=3, C=0 w=1. total=1100, ws=5,
    // budget 3x -> T=3300. targets: A=660, B=1980, C=660.
    // epochs: A = min(4000, 660000 div 1000) = 660 -> planned 660
    // B = min(4000, 1980000 div 100 = 19800) = 4000 -> planned 400,
    //   unmet 1580; C: avail 0 -> epochs 0, unmet 660.
    val avail = Seq(("A", 1000L, 1L), ("B", 100L, 3L), ("C", 0L, 1L))
      .toDF("src", "avail_tok", "w")
    val r = CorpusAssembly.epochPlan(avail, "src", "avail_tok", "w",
      budgetNum = 3, budgetDen = 1).collect()
      .map(x => x.getAs[String]("src") -> x).toMap
    assert(r("A").getAs[Long]("target_tok") === 660L)
    assert(r("A").getAs[Long]("epochs_milli") === 660L)
    assert(!r("A").getAs[Boolean]("at_cap"))
    assert(r("A").getAs[Long]("planned_tok") === 660L)
    assert(r("A").getAs[Long]("unmet_tok") === 0L)
    assert(r("B").getAs[Long]("epochs_milli") === 4000L)
    assert(r("B").getAs[Boolean]("at_cap"))
    assert(r("B").getAs[Long]("planned_tok") === 400L)
    assert(r("B").getAs[Long]("unmet_tok") === 1580L)
    assert(r("C").getAs[Long]("epochs_milli") === 0L)
    assert(r("C").getAs[Long]("planned_tok") === 0L)
    assert(r("C").getAs[Long]("unmet_tok") === 660L)
  }

  test("epochPlan: an under-budget plan degenerates to sub-1000-milli " +
      "epochs everywhere — mixturePlan's regime, never the cap") {
    val avail = Seq(("A", 1000L, 1L), ("B", 1000L, 1L))
      .toDF("src", "avail_tok", "w")
    val r = CorpusAssembly.epochPlan(avail, "src", "avail_tok", "w",
      budgetNum = 1, budgetDen = 2).collect()
    assert(r.forall(_.getAs[Long]("epochs_milli") === 500L))
    assert(r.forall(!_.getAs[Boolean]("at_cap")))
    assert(r.forall(_.getAs[Long]("unmet_tok") === 0L))
  }

  // ------------------------------------------------------------------
  // sprtBernoulli (q265)
  // ------------------------------------------------------------------

  private val Lq = graft.functions.FixedLog.log2q20 _

  test("sprtBernoulli: an all-success walk accepts H1 at exactly " +
      "ceil(up/a) trials; an all-failure walk accepts H0 at " +
      "ceil(|lo|/|b|); the first crossing latches even when the tail " +
      "would reverse it") {
    val a = Lq(400000L) - Lq(300000L)
    val b = Lq(600000L) - Lq(700000L)
    val up = Lq(950000L) - Lq(50000L)
    val tUp = ((up + a - 1) / a).toInt  // smallest t with t*a >= up
    val tLo = ((-(Lq(50000L) - Lq(950000L)) + (-b) - 1) / (-b)).toInt
    val rows =
      (1 to 40).map(t => ("win", t.toLong, 1L)) ++        // all success
      (1 to 40).map(t => ("lose", t.toLong, 0L)) ++       // all failure
      // crosses up at tUp, then 60 failures drag LLR far below lo —
      // the decision must still be the FIRST crossing
      ((1 to tUp).map(t => ("rev", t.toLong, 1L)) ++
        (1 to 60).map(t => ("rev", (tUp + t).toLong, 0L)))
    val r = StatsOps.sprtBernoulli(rows.toDF("cell", "ts", "succ")
        .withColumn("tie", col("ts")),
        "cell", "ts", "tie", "succ", 300000L, 400000L)
      .collect().map(x => x.getAs[String]("cell") -> x).toMap
    assert(r("win").getAs[String]("decision") === "h1")
    assert(r("win").getAs[Long]("n_dec") === tUp.toLong)
    assert(r("lose").getAs[String]("decision") === "h0")
    assert(r("lose").getAs[Long]("n_dec") === tLo.toLong)
    assert(r("rev").getAs[String]("decision") === "h1")
    assert(r("rev").getAs[Long]("n_dec") === tUp.toLong)
    assert(r("rev").getAs[Long]("llr_dec_q20") >=
      r("rev").getAs[Long]("bound_q20"))
  }

  test("sprtBernoulli: a boundary-hugging walk reads an honest " +
      "'continue' with null decision fields") {
    // repeat [1, 0, 0]: drift a + 2b per triple is slightly negative
    // but far from either boundary within 30 trials
    val rows = (0 until 30).map(t =>
      ("amb", (t + 1).toLong, if (t % 3 == 0) 1L else 0L))
    val r = StatsOps.sprtBernoulli(rows.toDF("cell", "ts", "succ")
        .withColumn("tie", col("ts")),
        "cell", "ts", "tie", "succ", 300000L, 400000L)
      .collect().head
    assert(r.getAs[String]("decision") === "continue")
    assert(r.isNullAt(r.fieldIndex("n_dec")))
    assert(r.isNullAt(r.fieldIndex("llr_dec_q20")))
    assert(r.getAs[Long]("n") === 30L)
  }

  // ------------------------------------------------------------------
  // jonckheereTerpstra (q266)
  // ------------------------------------------------------------------

  test("jonckheereTerpstra: hand pairs — a perfectly ordered ladder " +
      "reads jt_ppm = 10^6, a reversed one 0, value ties count half") {
    // up: g1={1,2}, g2={3,4}, g3={5}: every cross-group pair ordered
    // -> jt2 = 2*8 = 16, max = 16 -> 10^6
    // down: the mirror -> 0
    // tie: g1={5}, g2={5}: one cross pair, tied -> jt2 = 1, max 2
    val rows =
      Seq(("up", 1L, 1L), ("up", 1L, 2L), ("up", 2L, 3L),
        ("up", 2L, 4L), ("up", 3L, 5L),
        ("down", 1L, 5L), ("down", 1L, 4L), ("down", 2L, 3L),
        ("down", 2L, 2L), ("down", 3L, 1L),
        ("tie", 1L, 5L), ("tie", 2L, 5L))
    val r = StatsOps.jonckheereTerpstra(rows.toDF("cell", "g", "v"),
      "cell", "g", "v").collect()
      .map(x => x.getAs[String]("cell") -> x).toMap
    assert(r("up").getAs[Long]("jt_ppm") === 1000000L)
    assert(r("up").getAs[String]("trend") === "increasing")
    assert(r("up").getAs[Long]("max_pairs2") === 16L)
    assert(r("down").getAs[Long]("jt_ppm") === 0L)
    assert(r("down").getAs[String]("trend") === "decreasing")
    assert(r("tie").getAs[Long]("jt2") === 1L)
    assert(r("tie").getAs[Long]("jt_ppm") === 500000L)
    assert(r("tie").getAs[String]("trend") === "flat")
  }

  test("jonckheereTerpstra: a single-group cell nulls jt_ppm and " +
      "trend (no cross-group pair exists)") {
    val rows = Seq(("solo", 1L, 1L), ("solo", 1L, 9L))
    val r = StatsOps.jonckheereTerpstra(rows.toDF("cell", "g", "v"),
      "cell", "g", "v").collect().head
    assert(r.getAs[Long]("max_pairs2") === 0L)
    assert(r.isNullAt(r.fieldIndex("jt_ppm")))
    assert(r.isNullAt(r.fieldIndex("trend")))
  }

  test("jonckheereTerpstra: group-label REVERSAL maps jt2 to " +
      "max_pairs2 - jt2 exactly (seeded antisymmetry)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(13400 + seed)
      val rows = (1 to 60).map(_ =>
        ("c", (rnd.nextInt(4) + 1).toLong, rnd.nextInt(12).toLong))
      val fwd = StatsOps.jonckheereTerpstra(
        rows.toDF("cell", "g", "v"), "cell", "g", "v").collect().head
      val rev = StatsOps.jonckheereTerpstra(
        rows.map { case (c, g, v) => (c, 5L - g, v) }
          .toDF("cell", "g", "v"), "cell", "g", "v").collect().head
      assert(fwd.getAs[Long]("max_pairs2") ===
        rev.getAs[Long]("max_pairs2"))
      assert(fwd.getAs[Long]("jt2") + rev.getAs[Long]("jt2") ===
        fwd.getAs[Long]("max_pairs2"))
    }
  }
}
