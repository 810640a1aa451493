package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{SparkEntry, SparkSuite}

/**
 * Structural pins for the r14 statistics wave's shared spines (r14
 * verdict item #6): the [[graft.operators.StatsOps]] `twoSampleCums`
 * consumers (q286 CvM, q287 AD, q288 Ansari–Bradley) and the
 * `blockedRanks` consumers (q281 Kendall W, q282 γ/Somers' D), plus
 * the inline-spine pair q290/q293 — asserted with the
 * HeavyHeadPlanSpec listener mechanism so every executed segment
 * (including the r15 two-group guard probes, which run as their own
 * actions) is audited.
 *
 * Pinned per query: zero CartesianProduct / nested-loop joins
 * anywhere; a shuffle-exchange budget (measured at sf0.001 +
 * headroom); the events fact scan stays off the fat payload/props
 * columns; and the r14 verdict's WINDOW pin — every UNPARTITIONED
 * window (empty partitionSpec → one-partition execution) must sit
 * over an aggregated or checkpointed frame, never over a raw corpus
 * scan: structurally, no FileSourceScan may appear beneath an
 * empty-partitionSpec WindowExec. The test-log single-partition
 * WindowExec warnings are all ≤-buckets frames today; this makes that
 * a contract instead of an observation.
 */
class StatsSpinePlanSpec extends SparkSuite {

  /** Every node of the EXECUTED tree, descending through AQE wrappers
    * and query stages (plan.collect alone stops at them). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  private case class Audit(segments: Vector[(String, SparkPlan)]) {
    def plans: Vector[SparkPlan] = segments.map(_._2)
    def nodes: Seq[SparkPlan] = plans.flatMap(allNodes)
    def count(pred: String => Boolean): Int =
      plans.map(_.toString.split("== Initial Plan ==")(0)
        .linesIterator.count(l => pred(l))).sum
  }

  private def audit(name: String): Audit = {
    val seen = mutable.ArrayBuffer.empty[(String, SparkPlan)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        seen.synchronized { seen += ((funcName, qe.executedPlan)) }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      SparkEntry.queries(name)(spark, sf()).collect()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (System.nanoTime() < deadline &&
          !seen.synchronized(seen.exists(_._1 == "collect")))
        Thread.sleep(50)
      Audit(seen.synchronized(seen.toVector))
    } finally spark.listenerManager.unregister(listener)
  }

  private def exchanges(a: Audit): Int =
    a.count(l => l.contains("Exchange hashpartitioning") &&
      !l.contains("Reused"))

  /** The shared pin bundle: loop-free, exchange-budgeted, narrow fact
    * scans, and the unpartitioned-window-over-bounded-frame contract. */
  private def pinSpine(name: String, maxExchanges: Int,
      maxOneRowBroadcastLoops: Int = 0): Unit = {
    val a = audit(name)
    assert(a.count(_.contains("CartesianProduct")) == 0,
      s"$name plans a cartesian product")
    assert(a.count(_.contains("BroadcastNestedLoopJoin")) <=
      maxOneRowBroadcastLoops,
      s"$name grew a nested-loop join beyond its documented 1-row " +
        "broadcast allowance")
    val ex = exchanges(a)
    assert(ex <= maxExchanges,
      s"$name exchange budget blown: $ex > $maxExchanges")
    a.nodes.collect {
      case f: FileSourceScanExec
        if f.metadata.getOrElse("Location", "").contains("events.parquet") =>
          f.metadata.getOrElse("ReadSchema", "")
    }.foreach(rs =>
      assert(!rs.contains("payload") && !rs.contains("props"),
        s"$name events scan reads fat columns: $rs"))
    a.nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      val scans = allNodes(w.child).collect { case f: FileSourceScanExec => f }
      assert(scans.isEmpty,
        s"$name runs an UNPARTITIONED window directly over a corpus " +
          s"scan (single-partition execution at corpus scale): " +
          scans.map(_.metadata.getOrElse("Location", "?")).mkString(", "))
    }
  }

  test("q281 Kendall W: blockedRanks spine — one keyed corpus " +
      "exchange class, loop-free, unpartitioned windows only over " +
      "bounded frames") {
    pinSpine("q281_kendall_w", maxExchanges = 17)
  }

  test("q282 ordinal association: contingencyPairs + prefix windows " +
      "stay keyed and bounded") {
    pinSpine("q282_ordinal_assoc", maxExchanges = 16)
  }

  test("q286 Cramer-von Mises: twoSampleCums spine (+ two-group guard " +
      "probe) inside its exchange budget") {
    pinSpine("q286_cramer_von_mises", maxExchanges = 12)
  }

  test("q287 Anderson-Darling: same spine, same budget") {
    pinSpine("q287_anderson_darling", maxExchanges = 12)
  }

  test("q288 Ansari-Bradley: same spine, same budget") {
    pinSpine("q288_ansari_bradley", maxExchanges = 12)
  }

  test("q290 Hodges-Lehmann: value-count grid + guard probes stay " +
      "keyed; diff-grid windows run on the bounded diff frame") {
    pinSpine("q290_hodges_lehmann", maxExchanges = 14)
  }

  test("q293 effect sizes: one moment aggregate per group + guard " +
      "probe — the smallest spine in the family") {
    pinSpine("q293_effect_sizes", maxExchanges = 10)
  }

  test("q295 unigram encode: the expression-DP plans ZERO joins " +
      "beyond the occurrence join-back; loop-free within budget") {
    // the allowance covers the landed-model TRAIN pass (first access
    // in a fresh JVM): its two 1-row cost-total broadcasts are the
    // withCosts crossJoin(broadcast(total)) pattern, nothing else
    pinSpine("q295_unigram_encode", maxExchanges = 10,
      maxOneRowBroadcastLoops = 2)
  }
}
