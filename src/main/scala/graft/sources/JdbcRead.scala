package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Parallel JDBC READ — the missing half of the sink story: the
 * reference lands every row in a JDBC warehouse (TimescaleDB —
 * `QueueWriter.java:37-44` writes, `run/inspect_local_db.sh` reads it
 * back with psql), so the natural analytics path is Spark reading that
 * table back OUT. A naive `spark.read.jdbc(url, table)` is a
 * SINGLE-connection scan — one task pulls the whole table through one
 * cursor, the exact anti-pattern at any scale. The scale shape is
 * stride partitioning: N concurrent connections, each reading one
 * `WHERE col >= lo AND col < hi` slice, with Spark pushing filters
 * into each slice's WHERE clause (predicate pushdown is on by default
 * for JDBC and visible as PushedFilters in the scan node).
 *
 * Stride bounds come from a 1-row MIN/MAX probe over the partition
 * column ([[bounds]]) — guessed bounds are how stride reads silently
 * degenerate (all rows in one slice when the guess is stale). The
 * probe is one indexed aggregate on the database side.
 */
object JdbcRead {

  /** (min, max) of a numeric column via a 1-row JDBC probe — the tight
    * stride bounds for [[readPartitioned]]. Fails on an empty table
    * (no bounds to stride over; read it unpartitioned). */
  def bounds(url: String, table: String, column: String): (Long, Long) = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT MIN($column), MAX($column) FROM $table""")
      rs.next()
      val lo = rs.getLong(1)
      val hiIsNull = { val hi = rs.getLong(2); if (rs.wasNull()) None else Some(hi) }
      (lo, hiIsNull.getOrElse(
        throw new IllegalArgumentException(s"$table is empty: no stride bounds")))
    } finally conn.close()
  }

  /** Stride-partitioned parallel read of `table`: `numPartitions`
    * concurrent slices on `partitionColumn` between the PROBED min/max.
    * Filters/projections composed on the result push into each slice's
    * generated SQL (DSv1 JDBC pushdown). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, numPartitions: Int): DataFrame = {
    val (lo, hi) = bounds(url, table, partitionColumn)
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lo)
      // upperBound is exclusive in Spark's stride math; +1 keeps the
      // max row in the last slice
      .option("upperBound", hi + 1)
      .option("numPartitions", numPartitions)
      .load()
  }
}
