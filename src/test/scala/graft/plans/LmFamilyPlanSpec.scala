package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.util.QueryExecutionListener

import graft.{SparkEntry, SparkSuite}

/**
 * Structural pins for the round-13 LM/vector family (q257 backoff
 * scoring, q261 fluency gate, q262 DSIR selection, q263 embedding
 * decontamination) — the new mid-weight head. The scale claims these
 * queries' scaladocs make are asserted on the EXECUTED plans (listener
 * capture, so checkpointed segments are audited too — the
 * HeavyHeadPlanSpec mechanism):
 *
 *  - the LM scoring pass joins the model by BROADCAST HASH (five
 *    equi-joins), never by shuffle — the model is the small side by
 *    construction;
 *  - the 1-row corpus-total nested-loop broadcasts documented in the
 *    PlanAuditSpec allowlist must EXIST (or the entries rot);
 *  - q262's global quartile runs with NO single-partition window in
 *    ANY executed segment — the bucketPrefixOffsets claim, made
 *    structural (its localCheckpoints truncate the final lineage, so
 *    only the listener sees the threshold segments);
 *  - fact scans stay narrow (documents text-side columns only;
 *    embeddings without label);
 *  - shuffle-exchange budgets bound the plan class.
 *
 * Each query runs once un-audited first so the landed LM artifacts
 * (train-once-per-process) don't leak training segments into the
 * scoring audit.
 */
class LmFamilyPlanSpec extends SparkSuite {

  private case class Audit(segments: Vector[(String, SparkPlan, SparkPlan)]) {
    def finalPlans: Vector[SparkPlan] = segments.map(_._3)
    def count(pred: String => Boolean): Int =
      finalPlans.map(_.toString.split("== Initial Plan ==")(0)
        .linesIterator.count(l => pred(l))).sum
    def windows: Vector[(String, Boolean)] = segments.flatMap {
      case (fn, sp, _) => sp.collect {
        case w: WindowExec => (fn, w.partitionSpec.nonEmpty)
        case w: WindowGroupLimitExec => (fn, w.partitionSpec.nonEmpty)
      }
    }
    def scanSchemas(table: String): Vector[String] =
      segments.map(_._2).flatMap(_.collect {
        case f: FileSourceScanExec
          if f.metadata.getOrElse("Location", "").contains(s"$table.parquet") =>
            f.metadata.getOrElse("ReadSchema", "")
      })
  }

  private def audit(name: String): Audit = {
    SparkEntry.queries(name)(spark, sf()).collect() // warm the landings
    val seen = mutable.ArrayBuffer.empty[(String, SparkPlan, SparkPlan)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        seen.synchronized {
          seen += ((funcName, qe.sparkPlan, qe.executedPlan))
        }
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

  test("q257 backoff scoring: five broadcast-hash LM joins, the 1-row " +
      "N nested-loop broadcast EXISTS, one rollup exchange, narrow " +
      "documents scan") {
    val a = audit("q257_backoff_lm_score")
    assert(a.count(_.contains("CartesianProduct")) == 0)
    assert(a.count(_.contains("BroadcastNestedLoopJoin")) > 0,
      "q257 lost its documented 1-row N broadcast")
    assert(a.count(_.contains("BroadcastHashJoin")) >= 5,
      "q257's LM joins are no longer broadcast-hash")
    val ex = exchanges(a)
    assert(ex <= 3, s"q257 exchange budget blown: $ex")
    a.scanSchemas("documents").foreach(rs =>
      assert(!rs.contains("lang") && !rs.contains("n_chars"),
        s"q257 documents scan reads fat columns: $rs"))
  }

  test("q261 fluency gate: the scoring pass plus source-keyed gate " +
      "windows only — every window partitioned, bounded exchanges") {
    val a = audit("q261_perplexity_gate")
    assert(a.count(_.contains("CartesianProduct")) == 0)
    assert(a.count(_.contains("BroadcastNestedLoopJoin")) > 0,
      "q261 lost its documented 1-row N broadcast")
    assert(a.windows.nonEmpty, "q261 lost its quartile windows")
    a.windows.foreach { case (fn, partitioned) =>
      assert(partitioned,
        s"q261 plans a single-partition window (in $fn segment)")
    }
    val ex = exchanges(a)
    assert(ex <= 10, s"q261 exchange budget blown: $ex")
    a.scanSchemas("documents").foreach(rs =>
      assert(!rs.contains("lang") && !rs.contains("n_chars"),
        s"q261 documents scan reads fat columns: $rs"))
  }

  test("q262 DSIR: two scoring passes and the bucket-decomposed " +
      "global quartile — NO single-partition window in ANY executed " +
      "segment, checkpoints included") {
    val a = audit("q262_dsir_selection")
    assert(a.count(_.contains("CartesianProduct")) == 0)
    assert(a.count(_.contains("BroadcastNestedLoopJoin")) > 0,
      "q262 lost its documented scalar broadcasts")
    assert(a.segments.exists(_._1 == "localCheckpoint"),
      "q262: expected checkpointed threshold segments")
    val wins = a.windows
    assert(wins.nonEmpty, "q262 lost its bucket-partitioned cumulative")
    wins.foreach { case (fn, partitioned) =>
      assert(partitioned,
        s"q262 plans a single-partition window (in $fn segment)")
    }
    val ex = exchanges(a)
    assert(ex <= 16, s"q262 exchange budget blown: $ex")
  }

  test("q263 embedding decontamination: the bench broadcast EXISTS, " +
      "one train-keyed argmax exchange, embeddings scan skips label") {
    val a = audit("q263_embedding_decontam")
    assert(a.count(_.contains("CartesianProduct")) == 0)
    assert(a.count(_.contains("BroadcastNestedLoopJoin")) > 0,
      "q263 lost its bounded benchmark broadcast")
    // r13 verdict advisory landed: the per-train argmax is a map-side-
    // combinable max(struct) hash aggregate, not a window — the
    // aggregate form shuffles one row per train id by construction
    assert(a.windows.isEmpty,
      "q263 argmax regressed from aggregate back to a window")
    val ex = exchanges(a)
    assert(ex <= 4, s"q263 exchange budget blown: $ex")
    a.scanSchemas("embeddings").foreach(rs =>
      assert(!rs.contains("label"),
        s"q263 embeddings scan reads label: $rs"))
  }
}
