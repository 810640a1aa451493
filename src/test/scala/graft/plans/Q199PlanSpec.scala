package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.{SparkEntry, SparkSuite}

/**
 * Plan invariants for the round-11 TPC-H-shape pair: the decorrelated
 * scalar-subquery join (q199, Q17 shape) and the collapsed
 * exists/not-exists (q200, Q21 shape). Both scaladocs make concrete
 * one-shuffle / pushdown claims; this spec is what keeps them true
 * through refactors.
 */
class Q199PlanSpec extends SparkSuite {

  test("q199: the size filter reaches the part scan and the dimension " +
      "broadcasts — no nested-loop anywhere") {
    val qe = SparkEntry.queries("q199_small_quantity_revenue")(spark, sf())
      .queryExecution
    val pf = qe.sparkPlan
      .collect { case f: FileSourceScanExec => f }
      .collectFirst {
        case f if f.metadata.getOrElse("Location", "").contains(
          "part.parquet") => f.metadata.getOrElse("PushedFilters", "")
      }.getOrElse(fail("no part scan"))
    assert(pf.contains("LessThanOrEqual(p_size,10)"), pf)
    val plan = qe.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q200: the fact pays ONE orderkey shuffle — AQE's runtime " +
      "stage reuse collapses the self-join's twin repartition, and " +
      "the pairs-ordStats join adds no exchange of its own") {
    val df = SparkEntry.queries("q200_waiting_supplier_lines")(
      spark, sf())
    df.collect() // materialize so the ADAPTIVE final plan is inspected
    // AdaptiveSparkPlan.toString prints Final Plan then Initial Plan;
    // only the final section reflects what actually ran.
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // In the final adaptive plan the second branch shows up as a
    // ReusedExchange (or a reused ShuffleQueryStage) rather than a
    // second materialized l_orderkey shuffle.
    val materialized = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(l_orderkey") &&
        !l.contains("Reused"))
    assert(materialized == 1,
      s"expected 1 materialized l_orderkey exchange, got " +
        s"$materialized:\n$plan")
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
