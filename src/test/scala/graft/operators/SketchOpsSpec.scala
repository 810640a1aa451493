package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SketchOpsSpec extends SparkSuite {
  import spark.implicits._

  // 3 keys × overlapping value ranges; split point inside every key
  private def rows = (1L to 3000L).map(i => (i % 3, i % 700, i))
    .toDF("k", "v", "ord")

  test("incremental sketch state: merge(state(old), state(delta)) tracks " +
      "the unsplit sketch within the error envelope, counts exactly") {
    // NOT bit-equal by design: a single-stream sketch reads through the
    // HIP estimator, a unioned one through the composite estimator
    // (DataSketches documented behavior) — the merge contract is the
    // ~1.6% RSE envelope, not register equality
    val direct = SketchOps.estimate(
      SketchOps.sketchState(rows, Seq("k"), col("v")), Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val merged = SketchOps.estimate(
      SketchOps.mergeSketchStates(
        SketchOps.sketchState(rows.filter(col("ord") <= 1500), Seq("k"), col("v")),
        SketchOps.sketchState(rows.filter(col("ord") > 1500), Seq("k"), col("v")),
        Seq("k")),
      Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(merged.map(_._1) == direct.map(_._1))
    for (((k, dEst, dN), (_, mEst, mN)) <- direct.zip(merged)) {
      assert(mN == dN, s"key $k: counts must add exactly")
      assert(math.abs(mEst - dEst).toDouble / dEst <= 0.05,
        s"key $k: merged est $mEst vs direct $dEst")
    }
  }

  test("keys exclusive to one side pass through; counts add") {
    val a = SketchOps.sketchState(
      Seq((1L, 10L), (1L, 11L)).toDF("k", "v"), Seq("k"), col("v"))
    val b = SketchOps.sketchState(
      Seq((2L, 10L)).toDF("k", "v"), Seq("k"), col("v"))
    val out = SketchOps.estimate(
      SketchOps.mergeSketchStates(a, b, Seq("k")), Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("a re-tuned delta geometry (different lgK) merges into older state " +
      "(ADVICE r7: 2-arg hll_union was strict and would error)") {
    val state = SketchOps.sketchState(
      (1L to 400L).map(v => (1L, v)).toDF("k", "v"), Seq("k"), col("v"))
    val delta = SketchOps.sketchState(
      (301L to 600L).map(v => (1L, v)).toDF("k", "v"), Seq("k"), col("v"),
      lgK = SketchOps.DefaultLgK + 2)
    val out = SketchOps.estimate(
      SketchOps.mergeSketchStates(state, delta, Seq("k")), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.size == 1)
    val (k, est, n) = out.head
    assert(k == 1L && n == 700L)
    // union downgrades to the coarser K; still inside a loose envelope
    assert(math.abs(est - 600L).toDouble / 600.0 <= 0.05, s"est $est")
  }

  test("estimate stays within the published error envelope vs exact " +
      "(lgK=12 ⇒ ~1.6% RSE; assert 5%)") {
    val exact = rows.groupBy("k").agg(countDistinct("v").as("d"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val est = SketchOps.estimate(
      SketchOps.sketchState(rows, Seq("k"), col("v")), Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for ((k, d) <- exact) {
      val e = est(k)
      assert(math.abs(e - d).toDouble / d <= 0.05,
        s"key $k: est $e vs exact $d")
    }
  }
}
