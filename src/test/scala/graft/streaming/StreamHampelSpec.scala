package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite
import graft.operators.StatsOps
import graft.queries.Tables

/**
 * Streaming twin of the q285 Hampel outlier audit (the 22nd twin):
 * the stream carries the batch operator's (cell, value)-count spine
 * as per-key MapState, so the final emitted summary per cell must be
 * bit-equal to the batch audit — median, MAD, exceedance count and
 * floor ppm — across checkpointed restarts whose chunk boundaries
 * split the planted every-97th spikes mid-series (the histogram is
 * exactly the state a naive per-batch recount would lose: a median
 * computed over one chunk's values is simply a different median).
 */
class StreamHampelSpec extends SparkSuite {

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** q285's exact value fixture over the real events table (spikes
    * planted on every 97th event id). */
  private def values: DataFrame =
    Tables.events(spark, sf())
      .filter(col("value").isNotNull)
      .select(col("event_type").as("k"), col("event_id").as("t"),
        (expr("cast(cast(value as decimal(18,4)) * 10000 as bigint)") +
          when(expr("event_id % 97 = 0"), 10000000L).otherwise(0L))
          .as("v"))

  test("streaming Hampel monitor ≡ batch audit bit-for-bit across " +
      "checkpointed restarts that split the planted spikes") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    // save + restore the shared-session provider in a finally block
    // (the other streaming specs' hygiene) — leaking RocksDB into
    // later suites sharing the session would silently change their
    // state-store behavior
    val prevProvider = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming." +
      "state.RocksDBStateStoreProvider")
    try {
    val in = tmp("hampel_in_"); val out = tmp("hampel_out_")
    val ck = tmp("hampel_ck_")
    val frame = values.localCheckpoint(true)
    // boundaries at 97 and 291 (= 3·97): each chunk edge lands ON or
    // AROUND a planted spike id, so spike neighborhoods straddle the
    // restarts
    def chunk(pred: org.apache.spark.sql.Column): Unit =
      frame.filter(pred).coalesce(1).write.mode("append").json(in)
    def runOnce(): Unit =
      StatefulOps.hampelStream(
          spark.readStream.schema("k STRING, t LONG, v LONG").json(in))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
        .awaitTermination()
    chunk(col("t") < 97L); runOnce()
    chunk(col("t") >= 97L && col("t") < 291L); runOnce()
    chunk(col("t") >= 291L); runOnce()

    val finals = spark.read.parquet(out).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))))
      .groupBy(_._1)
      .map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    val want = StatsOps.hampelOutliers(
        frame.toDF("cell", "o", "v"), "cell", "v", 3)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(finals.keySet === want.keySet)
    for ((k, (_, n, med, mad, nOut, outPpm)) <- finals) {
      val (wn, wmed, wmad, wnOut, wppm) = want(k)
      assert((n, med, mad, nOut, outPpm) ===
        ((wn, wmed, wmad, wnOut, wppm)), s"cell $k")
    }
    // the monitor actually monitors: the planted 10^7-cent spikes are
    // flagged in every cell
    assert(finals.values.forall(_._5 > 0L))
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
