package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * Parallel JDBC read against embedded Derby: stride partitioning with
 * probed bounds, value round-trip, and filter pushdown into the
 * database — the read-back half of the JdbcSinkSpec warehouse story.
 */
class JdbcReadSpec extends SparkSuite {
  import spark.implicits._

  private def createDb(name: String, nRows: Int): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().execute(
        "CREATE TABLE readings (veh BIGINT, route VARCHAR(16), spd DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO readings VALUES (?, ?, ?)")
      for (i <- 1 to nRows) {
        ps.setLong(1, i.toLong)
        ps.setString(2, s"route_${i % 7}")
        ps.setDouble(3, i * 0.5)
        ps.addBatch()
      }
      ps.executeBatch()
    } finally conn.close()
    url
  }

  test("bounds probes tight min/max; stride read uses the requested " +
      "parallelism and round-trips every row") {
    val url = createDb("jdbc_read", 1000)
    assert(JdbcRead.bounds(url, "readings", "veh") == (1L, 1000L))
    val df = JdbcRead.readPartitioned(spark, url, "readings", "veh", 8)
    // N slices = N concurrent cursors — the parallel-read point
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    val got = df.orderBy("veh").limit(3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, "route_1", 0.5), (2L, "route_2", 1.0),
      (3L, "route_3", 1.5)))
    // the max row must land in the last (exclusive-upper) slice
    assert(df.filter(col("veh") === 1000L).count() == 1)
  }

  test("filters push into the database scan (PushedFilters on the JDBC relation)") {
    val url = createDb("jdbc_read_push", 200)
    val df = JdbcRead.readPartitioned(spark, url, "readings", "veh", 4)
      .filter(col("route") === "route_3" && col("veh") > 100L)
      .select("veh", "spd")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("EqualTo(ROUTE,route_3)") || plan.contains("EqualTo(route,route_3)"),
      s"route filter not pushed:\n$plan")
    assert(df.count() == 15) // veh in 101..200 with veh % 7 == 3 (101, 108, ..., 199)
  }

  test("bounds refuses an empty table instead of striding over garbage") {
    val url = createDb("jdbc_read_empty", 0)
    intercept[IllegalArgumentException] {
      JdbcRead.bounds(url, "readings", "veh")
    }
  }
}
