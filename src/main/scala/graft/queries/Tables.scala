package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loaders over the driver-generated parquet dirs (TESTDATA.md). */
object Tables {
  def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = tbl(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = tbl(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = tbl(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = tbl(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = tbl(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = tbl(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = tbl(s, d, "region")
  /**
   * events.parquet's `ts` precision is a DRIVER choice that has changed
   * across rounds: nanosecond parquet (read as LongType epoch nanos via
   * `spark.sql.legacy.parquet.nanosAsLong`, set by every entry point)
   * through round 7, microsecond parquet (read as TIMESTAMP_NTZ) from
   * round 8. Every registry query derives seconds/micros from epoch-NANOS
   * integer arithmetic (`ts div 1000` etc.), so this loader is the ONE
   * normalization point: whatever the file carries, `ts` leaves here as
   * a LongType of epoch nanos. The NTZ branch casts through the session
   * timestamp first — all entry points pin the session to UTC, so the
   * naive wall time IS the UTC instant, matching DuckDB's `epoch_us` on
   * the same naive value. Micros×1000 stays 10× inside Long.MaxValue.
   */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = tbl(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts",
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp")) *
          1000L)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")

  /** Dollars → integer 1e-4-dollar units ("cents" throughout the
    * registry) via the DECIMAL(18,4)-before-multiply determinism
    * discipline — the ONE definition the per-file copies referenced;
    * oracle twins spell the identical
    * `CAST(CAST(x AS DECIMAL(18,4)) * 10000 AS BIGINT)`. */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (c.cast("decimal(18,4)") * 10000).cast("long")
}

/**
 * One registered engine query: a Spark build function plus (when
 * SQL-expressible) the equivalent DuckDB oracle SQL over the same tables.
 *
 * Cross-engine determinism rules used throughout the registry:
 *  - double aggregates go through DECIMAL(18,4) operand casts — decimal
 *    summation is exact in both engines, and the final cast back to double
 *    of an identical decimal value is bit-identical;
 *  - every query ends in a total ORDER BY over emitted columns;
 *  - sub-second timestamps are emitted as epoch-second BIGINTs (the events
 *    table is nanosecond parquet, typed differently by the two engines).
 */
case class GraftQuery(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
