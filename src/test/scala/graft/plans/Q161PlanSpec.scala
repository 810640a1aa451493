package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.{SparkEntry, SparkSuite}

/**
 * q161 (the TPC-H Q5 shape) plan invariants: the deep star join's
 * selective predicates must reach their scans — the year slice as
 * timestamp bounds on orders (Catalyst simplifies the cast-to-date
 * comparison into pushable timestamp range filters — the property this
 * spec pins so a refactor to a non-pushable expression shape is loud),
 * the region constant on region — and the dimensions must broadcast.
 */
class Q161PlanSpec extends SparkSuite {

  private def scans = SparkEntry
    .queries("q161_local_supplier_revenue")(spark, sf())
    .queryExecution.sparkPlan
    .collect { case f: FileSourceScanExec => f }
    .map(s => s.metadata.getOrElse("Location", "") ->
      s.metadata.getOrElse("PushedFilters", ""))

  private def pushedFor(table: String): String =
    scans.collectFirst { case (loc, pf) if loc.contains(table) => pf }
      .getOrElse(fail(s"no scan for $table"))

  test("q161: the one-year slice reaches the orders scan as pushed " +
      "timestamp bounds (not a post-scan cast filter)") {
    val pf = pushedFor("orders.parquet")
    assert(pf.contains("GreaterThanOrEqual(o_orderdate,1996-01-01"), pf)
    assert(pf.contains("LessThan(o_orderdate,1997-01-01"), pf)
  }

  test("q161: the region constant reaches the region scan and the " +
      "dimensions broadcast") {
    assert(pushedFor("region.parquet").contains("EqualTo(r_name,ASIA)"))
    val plan = SparkEntry.queries("q161_local_supplier_revenue")(
      spark, sf()).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q178: both windows (RANGE-frame count + peak rank) share ONE " +
      "keyed Exchange — the scaladoc's one-shuffle claim, pinned") {
    val plan = SparkEntry.queries("q178_burst_detection")(spark, sf())
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val windows = "Window ".r.findAllIn(plan).length
    assert(windows == 2, s"expected 2 windows, got $windows:\n$plan")
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
