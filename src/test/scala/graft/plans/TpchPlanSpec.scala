package graft.plans

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.{SparkEntry, SparkSuite}

/**
 * Plan invariants for the round-12 TPC-H decorrelation wave
 * (q228–q242): every scaladoc scale claim that can regress silently is
 * pinned structurally — pushdown reaching the scan, column pruning,
 * dims broadcasting, the disjunctive join staying ONE equi-join, and
 * the Q11 scalar staying a deliberate 1-row nested-loop broadcast.
 */
class TpchPlanSpec extends SparkSuite {

  private def scans(name: String) =
    SparkEntry.queries(name)(spark, sf()).queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }

  private def scanMeta(name: String, table: String): Map[String, String] =
    scans(name).collectFirst {
      case f if f.metadata.getOrElse("Location", "")
        .contains(s"$table.parquet") => f.metadata
    }.getOrElse(fail(s"no $table scan in $name")).toMap

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf())
      .queryExecution.executedPlan.toString

  test("q228: the date bound pushes to the lineitem scan as a " +
      "timestamp filter and the projection prunes the join keys") {
    val meta = scanMeta("q228_pricing_summary_full", "lineitem")
    // Catalyst rewrites `cast(ts) <= date` into an exclusive bound on
    // the NEXT day's midnight — the Q161PlanSpec-pinned pushdown form
    assert(meta("PushedFilters").contains("LessThan(l_shipdate,2001-06-02"),
      meta("PushedFilters"))
    val rs = meta("ReadSchema")
    assert(!rs.contains("l_orderkey") && !rs.contains("l_partkey") &&
      !rs.contains("l_suppkey"), s"join keys not pruned: $rs")
    val p = plan("q228_pricing_summary_full")
    assert(!p.contains("Join"), s"Q1 grew a join:\n$p")
  }

  test("q229: every dimension broadcasts; the only corpus-sized " +
      "exchange is the (partkey, suppkey) supply aggregate") {
    val p = plan("q229_min_cost_supplier")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    val corpusExchanges = p.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning(l_partkey#") &&
        l.contains("l_suppkey#"))
    assert(corpusExchanges.nonEmpty, s"supply aggregate not keyed:\n$p")
  }

  test("q234: the returnflag filter pushes to the lineitem scan and " +
      "the customer scan reads only the four output-feeding columns") {
    val lm = scanMeta("q234_returned_item_losers", "lineitem")
    assert(lm("PushedFilters").contains("EqualTo(l_returnflag,R)"),
      lm("PushedFilters"))
    val cs = scanMeta("q234_returned_item_losers", "customer")("ReadSchema")
    assert(!cs.contains("c_mktsegment"), s"customer not pruned: $cs")
    assert(cs.contains("c_custkey") && cs.contains("c_name"), cs)
  }

  test("q235: the totals frame IS a deliberate 1-row nested-loop " +
      "broadcast (the allowlist entry cannot rot silently)") {
    val p = plan("q235_important_stock")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"q235 lost its scalar broadcast — drop the allowlist entry:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q239: the qualifying aggregate reads ONLY (l_orderkey, " +
      "l_quantity) from lineitem — the HAVING frame joins orders, " +
      "never the fact table") {
    val rs = scanMeta("q239_large_volume_customers", "lineitem")("ReadSchema")
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity"), rs)
    assert(!rs.contains("l_extendedprice") && !rs.contains("l_shipdate"),
      s"Q18 scan reads beyond the qualifying columns: $rs")
  }

  test("q240: the three-arm disjunction stays ONE equi-hash-join on " +
      "partkey with a residual filter — never three joins or a loop") {
    val p = plan("q240_disjunctive_revenue")
    val joins = p.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(joins == 1, s"expected exactly 1 hash join, got $joins:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q241: the part-name prefix pushes to the part scan as a " +
      "StringStartsWith and the year bounds reach the lineitem scan") {
    val pm = scanMeta("q241_excess_share_suppliers", "part")
    assert(pm("PushedFilters").contains("StringStartsWith(p_name,small)"),
      pm("PushedFilters"))
    val lm = scanMeta("q241_excess_share_suppliers", "lineitem")
    assert(lm("PushedFilters").contains("GreaterThanOrEqual(l_shipdate"),
      lm("PushedFilters"))
    assert(!plan("q241_excess_share_suppliers")
      .contains("BroadcastNestedLoopJoin"))
  }
}
