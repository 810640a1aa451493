package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/**
 * Runtime bloom-filter join pruning — the 100 TB scale path for a
 * selective big-big join: Catalyst's InjectRuntimeFilter plants a
 * bloom-filter aggregate on the filtered (creation) side and a
 * `might_contain` probe above the probe-side SCAN, so most of the fact
 * table's rows die before the shuffle instead of after it. This spec
 * proves the engine's session shape actually triggers the rule — with
 * the conservative size thresholds tuned for the local fixture scale
 * (production leaves the 10 MB/10 GB defaults, where a 100 TB fact scan
 * qualifies by construction).
 */
class RuntimeFilterSpec extends SparkSuite {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a selective dimension filter injects a bloom probe on the fact scan") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture-scale thresholds: any parquet probe side qualifies,
      // the filtered creation side always fits
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: a broadcast join already prunes at the
      // probe and the rule correctly declines to double-filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.lineitem(spark, sf())
      val ord = Tables.orders(spark, sf())
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom probe injected:\n$optimized")
      assert(optimized.contains("bloom_filter_agg"),
        s"no bloom aggregate on the creation side:\n$optimized")
      // and the result is still correct vs the unfiltered-plan answer
      val expect = withoutBloom(li, ord)
      val got = joined.orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
      assert(got == expect)
    }
  }

  private def withoutBloom(li: org.apache.spark.sql.DataFrame,
      ord: org.apache.spark.sql.DataFrame) = {
    var out: Seq[(String, Double)] = null
    withConfs("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      out = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("q"))
        .orderBy("l_returnflag").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    out
  }
}
