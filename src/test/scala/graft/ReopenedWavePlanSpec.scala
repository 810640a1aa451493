package graft

import org.apache.spark.sql.execution.FileSourceScanExec

import graft.SparkSuite

/**
 * Column-pruning proofs for the reopened-wave queries (the q02/q161
 * discipline): each representative query's parquet scans must read
 * ONLY the columns the plan needs — at 100 TB a scan that drags the
 * text/props payload for a 3-column aggregate is the difference
 * between a projection pass and reading the corpus twice.
 */
class ReopenedWavePlanSpec extends SparkSuite {

  private def sf() = "/root/testdata/sf0.001"

  private def scanFields(name: String): Seq[Set[String]] =
    SparkEntry.queries(name)(spark, sf())
      .queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec =>
        f.requiredSchema.fieldNames.toSet
      }

  test("q209 AUC reads only the three orders columns it scores on") {
    val scans = scanFields("q209_auc_roc")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.subsetOf(
        Set("o_orderkey", "o_orderstatus", "o_orderpriority")), s)
    }
  }

  test("q216 Adamic-Adar reads only the two lineitem edge columns") {
    val scans = scanFields("q216_adamic_adar")
    assert(scans.nonEmpty)
    scans.foreach(s =>
      assert(s.subsetOf(Set("l_partkey", "l_suppkey")), s))
  }

  test("q219 order-count distribution reads one customer column and " +
      "two orders columns") {
    val scans = scanFields("q219_order_count_distribution")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.subsetOf(Set("c_custkey")) ||
        s.subsetOf(Set("o_custkey", "o_orderpriority")), s)
    }
  }

  test("q224 hapax profile reads only (source, text) from documents") {
    val scans = scanFields("q224_hapax_profile")
    assert(scans.nonEmpty)
    scans.foreach(s => assert(s.subsetOf(Set("source", "text")), s))
  }

  test("q220 Welch reads only the three orders columns of its fixture") {
    val scans = scanFields("q220_welch_t")
    assert(scans.nonEmpty)
    scans.foreach { s =>
      assert(s.subsetOf(
        Set("o_totalprice", "o_orderstatus", "o_orderpriority")), s)
    }
  }
}
