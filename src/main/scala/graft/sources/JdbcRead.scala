package graft.sources

import java.sql.DriverManager
import java.util.Properties

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
 * `WHERE` slice of the partition column (the first and last slices are
 * unbounded below/above, so no row escapes the bounds), with Spark
 * pushing filters into each slice's WHERE clause (predicate pushdown
 * is on by default for JDBC and visible as PushedFilters in the scan
 * node).
 *
 * Stride bounds come from a 1-row MIN/MAX probe over the partition
 * column ([[bounds]]) — guessed bounds are how stride reads silently
 * degenerate (all rows in one slice when the guess is stale). The
 * probe is one indexed aggregate on the database side.
 *
 * Credentials ride `connectionProps` (user/password/driver), same as
 * the sink side ([[graft.streaming.JdbcVehiclesSink]]) — never the URL
 * string, which leaks into logs and plans.
 *
 * Identifier quoting: `table` and `partitionColumn` pass through
 * VERBATIM, exactly like Spark's own `dbtable`/`partitionColumn`
 * options (which this builds on) — for reserved-word identifiers (the
 * vehicles schema's `long`/`start`, which the sink side always quotes)
 * pass the pre-quoted form, e.g. `"\"start\""`.
 */
object JdbcRead {

  private def toProperties(props: Map[String, String]): Properties = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** (min, max) of a numeric column via a 1-row JDBC probe — the tight
    * stride bounds for [[readPartitioned]]. Fails when no bounds exist
    * (empty table, or the column is all NULL); read such a table
    * unpartitioned. */
  def bounds(url: String, table: String, column: String,
      connectionProps: Map[String, String] = Map.empty): (Long, Long) = {
    val conn = DriverManager.getConnection(url, toProperties(connectionProps))
    try {
      val rs = conn.createStatement().executeQuery(
        s"""SELECT MIN($column), MAX($column) FROM $table""")
      rs.next()
      val lo = rs.getLong(1)
      val loNull = rs.wasNull()
      val hi = rs.getLong(2)
      val hiNull = rs.wasNull()
      if (loNull || hiNull)
        throw new IllegalArgumentException(
          s"$table has no stride bounds on $column (empty table or all-NULL column)")
      (lo, hi)
    } finally conn.close()
  }

  /** Stride-partitioned parallel read of `table`: `numPartitions`
    * concurrent slices on `partitionColumn` between the PROBED min/max.
    * Bounds shape the stride math only — Spark's first slice is
    * unbounded below and its last unbounded above, so the min and max
    * rows are always included. Filters/projections composed on the
    * result push into each slice's generated SQL (DSv1 JDBC
    * pushdown). */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, numPartitions: Int,
      connectionProps: Map[String, String] = Map.empty): DataFrame = {
    val (lo, hi) = bounds(url, table, partitionColumn, connectionProps)
    val reader = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lo)
      .option("upperBound", hi)
      .option("numPartitions", numPartitions)
    connectionProps.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
  }
}
