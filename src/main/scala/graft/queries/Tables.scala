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
   * events.parquet carries nanosecond timestamps, which Spark's parquet
   * reader rejects; `spark.sql.legacy.parquet.nanosAsLong` (set at session
   * construction by every entry point — SparkEntry.applySessionDefaults,
   * Bench, Verify, SparkSuite) reads `ts` as a LongType of epoch nanos
   * (queries derive seconds/micros from it with integer arithmetic).
   */
  def events(s: SparkSession, d: String): DataFrame = tbl(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = tbl(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = tbl(s, d, "embeddings")
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
