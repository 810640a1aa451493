package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.Tables

/**
 * Bucketing as the co-located-join scale path (SURVEY §1.4: "co-locate
 * joins via bucketing or pre-partitioning"): two fact tables bucketed
 * on their join keys with matching bucket counts join with NO exchange
 * in the physical plan — at 100 TB that's the difference between a
 * metadata-only join setup and reshuffling both tables over the wire
 * for every join. The reference delegates this to TimescaleDB's
 * space-partitioning (init.sql:72); Spark's native equivalent is the
 * bucketed table.
 */
class BucketedJoinSpec extends SparkSuite {

  test("matching bucketed tables join without any shuffle exchange") {
    val li = Tables.lineitem(spark, sf("0.01")).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf("0.01")).select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_li_bucketed")
      ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_ord_bucketed")
      // force the shuffle-join path a big-big join would take
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.sparkPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and the join is correct: every lineitem row matches its order
      assert(joined.count() === li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
