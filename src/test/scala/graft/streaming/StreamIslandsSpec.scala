package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.operators.TemporalOps
import graft.SparkSuite

/**
 * Stream ≡ batch proof for interval islanding: the dynamic-gap
 * session-window twin (`EventTimeOps.intervalIslands`) must emit, over a
 * replayed bounded stream, exactly the islands the batch operator
 * (`TemporalOps.coalesceIntervals`, q116) computes on the same rows —
 * including islands whose member intervals arrive in DIFFERENT
 * micro-batches (the session-state merge path) and the running-max case
 * where one long interval swallows later short ones (where a lag-based
 * stream formulation would split).
 */
class StreamIslandsSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s_us", LongType),
    StructField("e_us", LongType)))

  // Epoch base 2024-06-05T08:00:00Z in micros; intervals in seconds
  // offsets for readability.
  private val base = 1717574400000000L
  private def iv(k: Long, sS: Long, eS: Long): (Long, Long, Long) =
    (k, base + sS * 1000000L, base + eS * 1000000L)

  private def writeFile(dir: String, rows: Seq[(Long, Long, Long)]): Unit =
    rows.toDF("k", "s_us", "e_us")
      .coalesce(1).write.mode("append").json(dir)

  private def islandsStream(in: String): DataFrame =
    EventTimeOps.intervalIslands(
      spark.readStream.schema(schema).json(in)
        .select(col("k"), timestamp_micros(col("s_us")).as("s_ts"),
          col("e_us")),
      "k", "s_ts", "e_us", watermarkDelay = "0 seconds")

  private def runOnce(df: DataFrame, out: String, ckpt: String): Unit =
    df.writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
      .awaitTermination()

  test("streamed islands equal the batch operator's, with members " +
      "arriving across micro-batches and an early long interval " +
      "swallowing later short ones") {
    val in = tmp("isl_in_"); val out = tmp("isl_out_"); val ckpt = tmp("isl_ck_")
    // Batch 1: key 1 opens [0,100] (the swallower) and key 2 its first
    // span — both STARTS at offset 0, so the 0-second watermark stays
    // at base and every batch-2 interval (earliest start 5 s) is
    // admitted with seconds of margin, not by the +1 µs gap knife-edge.
    // Batch 2 adds key-1 members INSIDE the open session ([5,10],
    // [20,30]) plus a gapped island, and key 2's touch + overlap.
    val batch1 = Seq(iv(1, 0, 100), iv(2, 0, 10))
    val batch2 = Seq(iv(1, 5, 10), iv(1, 20, 30), iv(1, 200, 210),
      iv(2, 10, 20), iv(2, 15, 40),
      (3L, base, base - 1000000L)) // degenerate: dropped
    writeFile(in, batch1)
    runOnce(islandsStream(in), out, ckpt)
    writeFile(in, batch2)
    runOnce(islandsStream(in), out, ckpt)
    // sentinel far in the future pushes the watermark past every session
    writeFile(in, Seq(iv(99, 100000, 100001)))
    runOnce(islandsStream(in), out, ckpt)

    val streamed = spark.read.parquet(out)
      .filter(col("k") =!= 99L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val batch = TemporalOps.coalesceIntervals(
      (batch1 ++ batch2).toDF("k", "s_us", "e_us"), "k", "s_us", "e_us")
      .select("k", "island_start", "island_end", "covered", "n_intervals")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed === batch)
    // shape sanity: key 1 = one swallowed island + one gapped island
    assert(batch.count(_._1 == 1L) === 2)
    assert(batch.contains((1L, base, base + 100000000L, 100000000L, 3L)))
    assert(batch.contains((2L, base, base + 40000000L, 40000000L, 3L)))
  }

  test("open sessions do not emit until the watermark passes them " +
      "(append-mode discipline)") {
    val in = tmp("isl2_in_"); val out = tmp("isl2_out_"); val ckpt = tmp("isl2_ck_")
    writeFile(in, Seq(iv(1, 0, 60)))
    runOnce(islandsStream(in), out, ckpt)
    // watermark is at the only event's start; session [0, 61) not closed
    val emitted =
      try spark.read.parquet(out).count() catch { case _: Throwable => 0L }
    assert(emitted === 0L)
  }
}
